"""Interactive SQL console — parity with the reference's console binary
(``/root/reference/src/bin/console/main.rs``): a REPL (or ``--script
file.sql`` batch mode, ``main.rs:41-63``) that splits statements on
``;``, routes DDL and queries through the ExecutionContext, prints
results, and reports per-statement wall time (``main.rs:133,145-147``).

Usage:
    python -m datafusion_archive_spark.console [--script FILE]
        [--register-testdata SF_DIR] [-e STATEMENT] [--max-rows N]
"""

from __future__ import annotations

import argparse
import sys
import time

from datafusion_archive_spark.context import ExecutionContext
from datafusion_archive_spark.session import get_spark


def execute_statement(ctx: ExecutionContext, stmt: str, max_rows: int) -> None:
    t0 = time.time()
    df = ctx.sql(stmt)
    if df is None:  # DDL
        print(f"OK ({time.time() - t0:.3f}s)")
        return
    rows = df.limit(max_rows + 1).collect()
    header = df.columns
    print("\t".join(header))
    for r in rows[:max_rows]:
        print("\t".join("" if v is None else str(v) for v in r))
    suffix = " (truncated)" if len(rows) > max_rows else ""
    print(f"{min(len(rows), max_rows)} rows{suffix} ({time.time() - t0:.3f}s)")


def split_statements(text: str) -> list[str]:
    """Split a script on ';' statement terminators, quote-aware: a
    semicolon inside a single-quoted SQL string (``LOCATION 'a;b'``,
    ``WHERE s = ';'``) does not terminate the statement. Quotes escape
    by doubling (``''``), which this scanner handles for free — the
    second quote just re-enters the string state. ``--`` comment lines
    are stripped per-line, so a statement whose first line is a comment
    still runs."""
    stmts: list[str] = []
    buf: list[str] = []
    in_quote = False
    for ch in text:
        if ch == "'":
            in_quote = not in_quote
            buf.append(ch)
        elif ch == ";" and not in_quote:
            stmts.append("".join(buf))
            buf = []
        else:
            buf.append(ch)
    stmts.append("".join(buf))
    out = []
    for stmt in stmts:
        kept = "\n".join(
            ln for ln in stmt.splitlines() if not ln.lstrip().startswith("--")
        ).strip()
        if kept:
            out.append(kept)
    return out


def run_statements(ctx: ExecutionContext, text: str, max_rows: int) -> int:
    failures = 0
    for stmt in split_statements(text):
        try:
            execute_statement(ctx, stmt, max_rows)
        except Exception as e:  # report and continue, like a console should
            print(f"Error: {e}", file=sys.stderr)
            failures += 1
    return failures


def repl(ctx: ExecutionContext, max_rows: int) -> None:
    print("datafusion_archive_spark console — ';' terminates a statement, "
          "'quit;' exits")
    buf: list[str] = []
    while True:
        try:
            prompt = "sql> " if not buf else "...> "
            line = input(prompt)
        except EOFError:
            break
        buf.append(line)
        if ";" in line:
            text = "\n".join(buf)
            buf = []
            if text.strip().rstrip(";").lower() in ("quit", "exit"):
                break
            run_statements(ctx, text, max_rows)


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--script", help="run a .sql file instead of the REPL")
    ap.add_argument("-e", "--execute", help="run one statement and exit")
    ap.add_argument(
        "--register-testdata",
        metavar="SF_DIR",
        help="pre-register the TPC-H-ish parquet tables from SF_DIR",
    )
    ap.add_argument("--max-rows", type=int, default=20)
    args = ap.parse_args(argv)

    ctx = ExecutionContext(get_spark("console"))
    if args.register_testdata:
        ctx.register_testdata(args.register_testdata)

    if args.execute is not None:
        return 1 if run_statements(ctx, args.execute, args.max_rows) else 0
    if args.script:
        with open(args.script) as f:
            return 1 if run_statements(ctx, f.read(), args.max_rows) else 0
    repl(ctx, args.max_rows)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
