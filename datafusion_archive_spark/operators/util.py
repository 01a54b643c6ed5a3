"""Operator-shared utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


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
