"""Skew-handling join: key salting.

AQE's skew-join splitting (`spark.sql.adaptive.skewJoin.enabled`, on
by default in our session) handles most skew at runtime; explicit
salting remains the tool when one join key dominates so heavily that
even split sub-partitions overwhelm an executor (the classic
power-law "null-ish key" or hot-entity case at 100 TB).

Construction: the skewed (large) side gets a uniform random salt in
[0, factor); the small side is replicated ``factor`` times with an
exploded salt column; the join key becomes (key, salt). Row
multiplicity is unchanged — results are identical to the unsalted
join — but the hot key now spreads across ``factor`` shuffle
partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    skewed: DataFrame,
    small: DataFrame,
    on: str,
    how: str = "inner",
    factor: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Join ``skewed ⋈ small`` on column ``on`` with the hot-key load
    spread over ``factor`` sub-keys. ``how`` supports inner/left
    (right/full would need the salt on the other side)."""
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    salted_l = skewed.withColumn(
        "_salt", (F.rand(seed) * factor).cast("int")
    )
    salted_r = small.withColumn(
        "_salt",
        F.explode(F.array(*[F.lit(i) for i in range(factor)])),
    )
    out = salted_l.join(salted_r, [on, "_salt"], how)
    return out.drop("_salt")
