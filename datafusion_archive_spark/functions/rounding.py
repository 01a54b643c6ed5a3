"""Engine-portable decimal rounding.

Spark's ``round()`` converts a double to its shortest decimal
representation (BigDecimal) before HALF_UP rounding, while DuckDB
rounds the binary value — so a computed double whose shortest repr
ends in "…5" (e.g. 0.53875 stored as 0.538749999…) rounds UP in Spark
and DOWN in DuckDB. For derived small-rational values (ratios,
weighted scores) this bites in practice.

:func:`round_half_up` pins one formula — ``floor(x·10ⁿ + 0.5)/10ⁿ`` —
evaluated on the same IEEE double by both engines, making results
bit-identical. Use it (and its SQL twin) whenever the rounded quantity
is a ratio of small integers; plain ``round`` stays fine for sums/avgs
of messy doubles where exact decimal midpoints have ~zero probability.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def round_half_up(c: Column, digits: int = 4) -> Column:
    scale = 10**digits
    return F.floor(c * scale + F.lit(0.5)) / F.lit(float(scale))


def decimal_sum(expr: Column) -> Column:
    """Order-independent money sum: cast each term to DECIMAL(27,6)
    (exact — revenue terms are ≤6-decimal products of 2dp inputs, and
    1 ulp of a double is far below the 5e-7 rounding half-spacing, so
    both engines recover the same decimal), sum exactly, then return
    as double. Without this, a floating sum's last bits depend on
    partition/merge order, and ~1% of revenue-style group sums sit
    exactly on a .005 rounding midpoint where that instability (and
    Spark-vs-external round() semantics) flips the rounded cent.

    DuckDB twin: :func:`decimal_sum_sql`.
    """
    return F.sum(expr.cast("decimal(27,6)")).cast("double")


def decimal_sum_sql(expr: str) -> str:
    return f"CAST(sum(CAST({expr} AS DECIMAL(27,6))) AS DOUBLE)"


def round_half_up_sql(expr: str, digits: int = 4) -> str:
    """DuckDB twin of :func:`round_half_up`. The input is cast to
    DOUBLE first — a no-op for double columns, and it keeps DuckDB
    from binding decimal literals as DECIMAL(18,…) whose scaled
    multiplication overflows."""
    scale = 10**digits
    return f"floor(CAST({expr} AS DOUBLE) * {scale} + 0.5) / {scale}.0"
