"""Bounded range join — "left row ⋈ right rows within a time window"
without a quadratic inequality join.

Spark turns a raw ``l.ts - delta < r.ts AND r.ts <= l.ts`` predicate
(no equi-key, or a skewed one) into a broadcast-nested-loop or a
per-key cross product. The scalable formulation buckets both sides
into window-sized time buckets: a right row within ``(l.ts - Δ, l.ts]``
necessarily lands in the left row's bucket or the one before it, so
each left row joins exactly two buckets via a plain equi-join on
``(key, bucket)`` and the true predicate runs as a residual filter.
Shuffle cardinality is 2·|L| + |R| — linear, never |L|·|R|. Because
the buckets partition the time axis, a qualifying right row matches
through exactly one of the left row's two bucket probes, so the inner
result needs no dedup.

This is the standard band-join decomposition (used by time-series
stores for interval overlap); the reference engine has no join at all
(joins are roadmap `/root/reference/ROADMAP.md:33`), so this is
extension surface for the events stream.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _us(c: Column) -> Column:
    return F.unix_micros(c)


def range_join_recent(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    window_us: int,
    left_id: str | None = None,
) -> DataFrame:
    """Bounded range join: every left row, paired with each right row
    of the same ``key`` whose timestamp lies in
    ``(left.ts - window_us, left.ts]``.

    Inner semantics by default. Pass ``left_id`` (a unique left row
    id) for left-outer semantics: unmatched left rows come back with
    NULL right columns via an anti-join restore — no distinct over the
    match set, just one extra shuffle of the (small) matched-id list.

    Right columns whose names collide with left columns are suffixed
    ``_r``. The 2× bucket explode is on the probe (left) side; the
    right side stays one row each, so a high-fanout right stream never
    amplifies.
    """
    lb = left.withColumn(
        "_jb",
        F.explode(
            F.array(
                F.floor(_us(F.col(left_ts)) / F.lit(window_us)),
                F.floor(_us(F.col(left_ts)) / F.lit(window_us)) - 1,
            )
        ),
    )
    rename = {
        c: f"{c}_r" for c in right.columns if c in left.columns and c != key
    }
    r = right
    for old, new in rename.items():
        r = r.withColumnRenamed(old, new)
    r_ts = rename.get(right_ts, right_ts)
    right_cols = [rename.get(c, c) for c in right.columns if c != key]
    rb = r.withColumn("_jb", F.floor(_us(F.col(r_ts)) / F.lit(window_us)))

    in_range = (
        _us(F.col(r_ts)) > _us(F.col(left_ts)) - F.lit(window_us)
    ) & (_us(F.col(r_ts)) <= _us(F.col(left_ts)))
    matched = (
        lb.join(rb, [key, "_jb"], "inner").filter(in_range).drop("_jb")
    )
    if left_id is None:
        return matched
    unmatched = left.join(
        matched.select(left_id), [left_id], "left_anti"
    )
    for c in right_cols:
        unmatched = unmatched.withColumn(
            c, F.lit(None).cast(matched.schema[c].dataType)
        )
    return matched.unionByName(unmatched.select(*matched.columns))
