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
    """Order-independent money sum, evaluated on the fast integer path.

    Semantics: sum over rows of the 6-decimal rounding of ``expr``,
    exactly (the per-term 6dp decimal is exact for revenue-style
    values — ≤6-decimal products of 2dp inputs, and 1 ulp of a double
    is far below the 5e-7 rounding half-spacing). Without this, a
    floating sum's last bits depend on partition/merge order, and ~1%
    of revenue-style group sums sit exactly on a .005 rounding
    midpoint where that instability (and Spark-vs-external round()
    semantics) flips the rounded cent.

    Implementation: each term becomes exact integer micros in a LONG
    (``round(x·10⁶)`` — exact for \\|x\\| < 2⁵³/10⁶ ≈ 9·10⁹, far above
    any per-row money value), split into whole-unit and sub-unit
    parts that are summed separately. Long sums stay in whole-stage
    codegen (a DECIMAL(27,6) buffer exceeds 18 digits → per-row
    BigDecimal, measured 6× slower), and neither part can overflow at
    warehouse scale: whole-unit sums fit ~9·10¹⁸ units and the
    sub-unit part adds < 10⁶ per row (overflow at ~9·10¹² rows per
    group — and Spark's ANSI mode would raise, not corrupt, beyond
    it). The two partial sums combine in decimal once per GROUP.

    DuckDB twin: :func:`decimal_sum_sql` (a plain decimal sum —
    value-identical because both sides compute the exact same
    per-term 6dp decimal).
    """
    micros = F.round(expr * 1_000_000).cast("long")
    lo = micros % 1_000_000
    hi = ((micros - lo) / 1_000_000).cast("long")
    return (
        (F.sum(hi).cast("decimal(32,0)") * 1_000_000 + F.sum(lo))
        / 1_000_000
    ).cast("double")


def decimal_sum_sql(expr: str) -> str:
    return f"CAST(sum(CAST({expr} AS DECIMAL(27,6))) AS DOUBLE)"


def round_half_up_sql(expr: str, digits: int = 4) -> str:
    """DuckDB twin of :func:`round_half_up`. The input is cast to
    DOUBLE first — a no-op for double columns, and it keeps DuckDB
    from binding decimal literals as DECIMAL(18,…) whose scaled
    multiplication overflows."""
    scale = 10**digits
    return f"floor(CAST({expr} AS DOUBLE) * {scale} + 0.5) / {scale}.0"
