"""Physical-plan summary extraction (see package docstring)."""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame

_JOIN_KINDS = (
    "BroadcastHashJoin",
    "SortMergeJoin",
    "ShuffledHashJoin",
    "BroadcastNestedLoopJoin",
    "CartesianProduct",
)


@dataclass
class PlanSummary:
    """What matters about a physical plan at scale."""

    joins: list[str] = field(default_factory=list)
    n_hash_exchanges: int = 0
    n_scans: int = 0
    pushed_filters: list[str] = field(default_factory=list)
    partition_filters: list[str] = field(default_factory=list)
    read_schemas: list[str] = field(default_factory=list)
    has_codegen: bool = False
    raw: str = ""

    def scans_pruned_to(self, *columns: str) -> bool:
        """True if every scan reads only (a subset of) ``columns``."""
        want = set(columns)
        for rs in self.read_schemas:
            got = set(re.findall(r"(\w+):", rs))
            if not got <= want:
                return False
        return True


def plan_string(df: DataFrame, mode: str = "simple") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), mode
    )


def summarize(df: DataFrame) -> PlanSummary:
    # simple mode for tree shape (joins/exchanges); formatted mode for
    # scan details — simple truncates long attribute lists with "..."
    plan = plan_string(df, "simple")
    detail = plan_string(df, "formatted")
    # hash exchanges deduped by formatted node id (VERDICT r8 #5):
    # simple mode re-prints a cached subtree's whole plan at EVERY
    # InMemoryTableScan reference, so a 17-exchange plan with a
    # heavily fanned-out cached rollup counted as 172+. In formatted
    # mode every physical node is numbered once — the detail header
    # is "(N) Exchange" (the tree section prints "Exchange (N)", so
    # the id-prefixed pattern cannot double count) and the node's
    # Arguments line carries the partitioning kind. joins stay
    # counted from the simple string on purpose: it is the superset
    # that includes cached-subtree re-prints, so a CartesianProduct
    # hiding inside a cached branch still surfaces in `joins`.
    hash_exchange_ids = {
        nid
        for nid, args in re.findall(
            r"\((\d+)\) Exchange\n(?:[^\n]+\n)*?Arguments: ([^\n]*)",
            detail,
        )
        if "hashpartitioning" in args
    }
    # Parse-drift guard (ADVICE r10): the plan_scan gate now depends
    # on this count, and a silent regex miss (a future Spark changing
    # the detail-section layout or dropping the Arguments line) would
    # read as "0 exchanges" — a PASS. If simple mode shows hash
    # exchanges but the formatted parse found none, the parse is
    # broken: fail loudly instead of under-reporting.
    if not hash_exchange_ids and "Exchange hashpartitioning" in plan:
        raise RuntimeError(
            "plan-inspect parse drift: simple plan contains hash "
            "exchanges but the formatted-mode node-id parse found "
            "none — the explain layout changed; fix the regex in "
            "plans/inspect.py before trusting exchange counts"
        )
    return PlanSummary(
        joins=[j for j in re.findall("|".join(_JOIN_KINDS), plan)],
        n_hash_exchanges=len(hash_exchange_ids),
        # numbered tree nodes only: formatted mode prints each scan
        # twice (once in the tree, once in the detail section), so a
        # bare substring count reports 2x the real scan count
        n_scans=len(
            re.findall(r"\(\d+\) Scan (?:parquet|csv|json)", detail)
        ),
        pushed_filters=re.findall(r"PushedFilters: \[([^\]]*)\]", detail),
        partition_filters=re.findall(
            r"PartitionFilters: \[([^\]]*)\]", detail
        ),
        read_schemas=re.findall(r"ReadSchema: struct<([^>\n]*)>", detail),
        has_codegen="codegen id" in detail,
        raw=plan,
    )
