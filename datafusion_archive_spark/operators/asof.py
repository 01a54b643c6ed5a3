"""As-of (backward) join — an operator Spark lacks natively.

Semantics: for each left row, attach the most recent right row with the
same key whose timestamp is ≤ the left timestamp (ties: the latest
right row by the tiebreaker column).

Implementation is a composition of existing DataFrame ops (preference
(a) from the build rules): union the two sides tagged by origin, sort
within key by time, and carry the last-seen right values forward with
``last(..., ignorenulls=True)`` over an unbounded-preceding window.
One shuffle on the key — the same cost as a regular sort-merge join,
no per-group Python, no quadratic range join.

The window partition is the join key, so skew follows key skew; for a
hot key, pre-salting by coarse time bucket bounds partition size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    right_value_cols: list[str],
    suffix: str = "_asof",
) -> DataFrame:
    """Backward as-of join; right columns arrive as ``<col><suffix>``
    (NULL when no right row precedes the left row)."""
    l_tag = left.select(
        F.col(key),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_is_left"),
        *[F.col(c) for c in left.columns if c not in (key, left_ts)],
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"{c}{suffix}")
          for c in right_value_cols],
    )
    r_tag = right.select(
        F.col(key),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_is_left"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in left.columns if c not in (key, left_ts)],
        *[F.col(c).alias(f"{c}{suffix}") for c in right_value_cols],
    )
    merged = l_tag.unionByName(r_tag)
    # right rows sort before left rows at identical timestamps so a
    # same-instant right row is visible to the left row (<= semantics);
    # the value columns are a deterministic final tiebreaker — several
    # right rows sharing (key, ts) would otherwise carry whichever one
    # the shuffle happened to order last (the greatest value tuple wins)
    w = (
        Window.partitionBy(key)
        .orderBy(
            F.col("_ts"),
            F.col("_is_left"),
            *[F.col(f"{c}{suffix}") for c in right_value_cols],
        )
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = merged.select(
        key,
        "_ts",
        "_is_left",
        *[c for c in left.columns if c not in (key, left_ts)],
        *[
            F.last(f"{c}{suffix}", ignorenulls=True).over(w).alias(
                f"{c}{suffix}"
            )
            for c in right_value_cols
        ],
    )
    return (
        carried.filter(F.col("_is_left") == 1)
        .drop("_is_left")
        .withColumnRenamed("_ts", left_ts)
    )


def asof_join_forward(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    right_value_cols: list[str],
    suffix: str = "_asof",
) -> DataFrame:
    """Forward as-of join: for each left row, the EARLIEST right row
    with the same key whose timestamp is ≥ the left timestamp (a
    same-instant right row is visible). Right columns arrive as
    ``<col><suffix>`` (NULL when no right row follows).

    The mirror of :func:`asof_join`: identical union-and-carry
    construction with the window ordered descending, so ``last(...,
    ignorenulls=True)`` carries the nearest FUTURE right value
    backward. Same single shuffle on the key, same skew profile."""
    l_tag = left.select(
        F.col(key),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_is_left"),
        *[F.col(c) for c in left.columns if c not in (key, left_ts)],
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"{c}{suffix}")
          for c in right_value_cols],
    )
    r_tag = right.select(
        F.col(key),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_is_left"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in left.columns if c not in (key, left_ts)],
        *[F.col(c).alias(f"{c}{suffix}") for c in right_value_cols],
    )
    merged = l_tag.unionByName(r_tag)
    # descending time: right rows at the same instant sort first so a
    # same-instant right row is visible to the left row (>= semantics);
    # value columns break (key, ts) ties deterministically — matching
    # the backward join's contract, the greatest value tuple wins
    w = (
        Window.partitionBy(key)
        .orderBy(
            F.col("_ts").desc(),
            F.col("_is_left"),
            *[F.col(f"{c}{suffix}") for c in right_value_cols],
        )
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = merged.select(
        key,
        "_ts",
        "_is_left",
        *[c for c in left.columns if c not in (key, left_ts)],
        *[
            F.last(f"{c}{suffix}", ignorenulls=True).over(w).alias(
                f"{c}{suffix}"
            )
            for c in right_value_cols
        ],
    )
    return (
        carried.filter(F.col("_is_left") == 1)
        .drop("_is_left")
        .withColumnRenamed("_ts", left_ts)
    )
