"""2-D skyline (Pareto frontier) as a two-phase distributed operator.

A point is on the skyline iff no other point dominates it — here
"dominates" means *x' <= x and y' >= y, strictly better in at least
one* (minimize x, maximize y). The classic OLAP use: "earliest order
at every price level you can't beat".

Scale design (the reason this is two-phase): a skyline needs a total
order, but a global sort-window is a single-partition bottleneck. The
superset property saves us — a point that is globally undominated is
undominated in ANY subset containing it, so a *local* skyline per
partition (any partitioning whatsoever) keeps every global-skyline
point while discarding the bulk of the data. Phase 1 therefore runs
the sort-window trick per hash bucket (parallel, each bucket a few
million points at 100 TB); phase 2 re-runs it globally over the
surviving points — skylines of real data are tiny (O(log^d n) for
random data), so the single-partition pass sees thousands of rows,
not billions.

The per-partition kernel is the sorted-sweep: order by (x asc,
y desc) over DISTINCT points; a point is dominated iff
max(y) over all *preceding* rows >= its own y (a preceding row has
x' < x, or x' = x with y' > y — either way dominance is strict in
one coordinate once duplicates are removed).

The reference has no skyline operator (its surface stops at batch
SQL scan/filter/project/agg — /root/reference/ROADMAP.md:36-56);
this belongs to the analytics extension surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _sweep(df: DataFrame, x: str, y: str, partition_cols) -> DataFrame:
    """Sorted-sweep skyline kernel over (optionally partitioned) rows."""
    w = (
        Window.partitionBy(*partition_cols)
        .orderBy(F.col(x).asc(), F.col(y).desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prev_max = F.max(F.col(y)).over(w)
    return (
        df.withColumn("_prev_max", prev_max)
        .filter(F.col("_prev_max").isNull() | (F.col("_prev_max") < F.col(y)))
        .drop("_prev_max")
    )


def skyline_2d(
    df: DataFrame,
    x: str,
    y: str,
    buckets: int = 64,
) -> DataFrame:
    """All distinct (x, y) points not dominated by any other point
    (minimize x, maximize y).

    ``buckets`` controls phase-1 parallelism; correctness is
    independent of the bucketing (superset property), so any value
    works — size it so each bucket's sort fits one task at the target
    scale.
    """
    pts = df.select(x, y).distinct()
    local = _sweep(
        pts.withColumn("_b", F.pmod(F.hash(F.col(x), F.col(y)), F.lit(buckets))),
        x,
        y,
        ["_b"],
    ).drop("_b")
    # phase 2: global pass over the (small) local-skyline union
    return _sweep(local, x, y, [])
