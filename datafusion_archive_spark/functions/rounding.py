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


def round_half_up_sql(expr: str, digits: int = 4) -> str:
    """DuckDB twin of :func:`round_half_up`. The input is cast to
    DOUBLE first — a no-op for double columns, and it keeps DuckDB
    from binding decimal literals as DECIMAL(18,…) whose scaled
    multiplication overflows."""
    scale = 10**digits
    return f"floor(CAST({expr} AS DOUBLE) * {scale} + 0.5) / {scale}.0"
