"""``CREATE EXTERNAL TABLE`` dialect shim.

The reference extends ANSI SQL with one custom statement
(``/root/reference/src/dfparser.rs:38-55,101-208``)::

    CREATE EXTERNAL TABLE name (col TYPE, ...)
    STORED AS {CSV [WITH HEADER ROW | WITHOUT HEADER ROW] | NDJSON
               | PARQUET | ORC | FIXEDWIDTH WIDTHS 'w1,w2,...'}
    LOCATION 'path'

(ORC and FIXEDWIDTH are our extensions beyond the reference grammar —
ORC gets the same self-describing-schema treatment as parquet;
FIXEDWIDTH routes to the custom Python DataSource in
sources/pydatasource.py, the Spark analog of plugging a new
``trait DataSource`` implementation into the reference engine.)

In the reference the execution of this DDL is commented out
(``src/execution/context.rs:48-76``); here it is fully functional: we
parse the statement in Python and register the file with the
ExecutionContext (``spark.read`` + temp view) — no SQL parser is
written, everything else passes through to ``spark.sql``. For CSV the
reference grammar's header clause (``src/dfparser.rs:168-174``) is
honored, defaulting to *with* header row as the reference hard-codes
(``src/execution/datasource.rs:41`` — see SURVEY.md §7.9).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

_CREATE_RE = re.compile(
    r"^\s*CREATE\s+EXTERNAL\s+TABLE\s+(?P<name>[A-Za-z_][A-Za-z0-9_]*)\s*"
    r"(?:\((?P<cols>.*?)\)\s*)?"
    r"STORED\s+AS\s+(?P<format>CSV|NDJSON|PARQUET|ORC|FIXEDWIDTH|XML)\s*"
    r"(?P<header>WITH\s+HEADER\s+ROW|WITHOUT\s+HEADER\s+ROW)?\s*"
    r"(?:WIDTHS\s+'(?P<widths>[0-9, ]+)'\s*)?"
    r"(?:ROWTAG\s+'(?P<rowtag>[A-Za-z_][A-Za-z0-9_]*)'\s*)?"
    r"LOCATION\s+'(?P<location>[^']*)'\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)

_COL_RE = re.compile(
    r"^\s*(?P<name>[A-Za-z_][A-Za-z0-9_]*)\s+(?P<type>[A-Za-z]+(?:\s*\(\s*\d+(?:\s*,\s*\d+)?\s*\))?)\s*$"
)


@dataclass
class CreateExternalTable:
    """Parsed form of the DDL — mirrors the reference AST node
    ``DFASTNode::CreateExternalTable`` (``src/dfparser.rs:43-54``)."""

    name: str
    columns: list[tuple[str, str]] = field(default_factory=list)
    file_format: str = "CSV"
    header_row: bool = True
    location: str = ""
    #: FIXEDWIDTH only: column widths from the ``WIDTHS '6,12,8'``
    #: clause (our grammar extension for the custom Python
    #: DataSource — see sources/pydatasource.py)
    widths: str | None = None
    #: XML only: repeating-element name from ``ROWTAG 'row'``
    row_tag: str | None = None


def is_create_external_table(sql: str) -> bool:
    return bool(
        re.match(r"^\s*CREATE\s+EXTERNAL\s+TABLE\b", sql, re.IGNORECASE)
    )


def parse_create_external_table(sql: str) -> CreateExternalTable:
    m = _CREATE_RE.match(sql)
    if not m:
        raise ValueError(f"malformed CREATE EXTERNAL TABLE statement: {sql!r}")
    cols: list[tuple[str, str]] = []
    if m.group("cols"):
        for raw in _split_columns(m.group("cols")):
            cm = _COL_RE.match(raw)
            if not cm:
                raise ValueError(f"malformed column definition: {raw!r}")
            cols.append((cm.group("name"), cm.group("type")))
    header_clause = (m.group("header") or "").upper()
    fmt = m.group("format").upper()
    widths = m.group("widths")
    row_tag = m.group("rowtag")
    # format-clause cross-validation: the grammar is one regex, so a
    # clause that only makes sense for one format would otherwise
    # parse for any format and be silently ignored at scan time
    if widths is not None and fmt != "FIXEDWIDTH":
        raise ValueError(
            f"WIDTHS clause is only valid with STORED AS FIXEDWIDTH, "
            f"not {fmt}"
        )
    if row_tag is not None and fmt != "XML":
        raise ValueError(
            f"ROWTAG clause is only valid with STORED AS XML, not {fmt}"
        )
    if fmt == "FIXEDWIDTH":
        if not widths:
            raise ValueError(
                "STORED AS FIXEDWIDTH requires a WIDTHS '…' clause"
            )
        # fail at parse time, not with int('') deep inside the scan
        for tok in widths.replace(" ", "").split(","):
            if not tok.isdigit() or int(tok) <= 0:
                raise ValueError(
                    f"malformed WIDTHS clause {widths!r}: each width "
                    "must be a positive integer"
                )
    return CreateExternalTable(
        name=m.group("name"),
        columns=cols,
        file_format=fmt,
        header_row=not header_clause.startswith("WITHOUT"),
        location=m.group("location"),
        widths=widths.replace(" ", "") if widths else None,
        row_tag=row_tag,
    )


def _split_columns(cols: str) -> list[str]:
    """Split a column list on commas that are not inside parentheses
    (DECIMAL(10,2) must stay intact)."""
    out, depth, cur = [], 0, []
    for ch in cols:
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == "," and depth == 0:
            out.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    if cur and "".join(cur).strip():
        out.append("".join(cur))
    return [c for c in (c.strip() for c in out) if c]
