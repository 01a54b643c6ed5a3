"""Operator-shared utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame

#: DataFrames persisted by operator internals, awaiting release. The
#: operators in this package persist small intermediates (signatures,
#: normalized vectors) that outlive the returned lazy DataFrame, so
#: they cannot unpersist them themselves. ``cached()`` registers each
#: one here; harnesses (bench.py, tools/check_oracle.py) and each new
#: query invocation call :func:`release_caches` once the previous
#: result has been consumed, keeping a long session's cache footprint
#: bounded to one query's working set.
_ACTIVE_CACHES: list[DataFrame] = []


def cached(df: DataFrame) -> DataFrame:
    """Persist ``df`` and register it for scoped release.

    Operator-internal persists must go through this instead of bare
    ``.persist()`` so sessions that run many queries (the driver, the
    bench loop) don't accumulate dead cached RDDs for their lifetime.
    """
    if not df.is_cached:
        df = df.persist()
    _ACTIVE_CACHES.append(df)
    return df


def release_caches() -> None:
    """Unpersist every operator-internal cache registered since the
    last release. Safe to call at any point where no previously
    returned (still-lazy) DataFrame will be re-executed."""
    while _ACTIVE_CACHES:
        _ACTIVE_CACHES.pop().unpersist()


def spread(df: DataFrame, min_factor: int = 1) -> DataFrame:
    """Ensure compute-heavy per-row operators get cluster-wide
    parallelism.

    A small file scans as one partition, which serializes the whole
    operator on one core no matter how many are available — the
    classic "tiny input, heavy compute" trap (hashing/shingling every
    row costs far more than the scan). If the input already has at
    least defaultParallelism partitions (any real at-scale table
    does), this is a no-op; otherwise a round-robin repartition —
    cheap for small inputs by construction — spreads the rows.
    """
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism * min_factor
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)
