"""Deterministic train/validation/test splitting.

A training-data pipeline needs splits that are (a) stable across runs
and engines — re-running the pipeline, or running it on a different
cluster, must put every document in the same split; (b) map-only — at
100 TB the assignment cannot afford a shuffle or a global sort; and
(c) content-independent — keyed on the document id, so editing a
document's text never migrates it between splits (which would leak
test data into training).

``random_split``-style sampling fails (a): Spark's sample is seeded
per-partition, so a repartition reshuffles the split. Hashing the id
gives all three properties: the assignment is a scan-side projection,
embarrassingly parallel, and reproducible in any engine with md5 (see
functions.text.hash64 — the same construction the dedup family uses).

No reference parity: the reference engine (a SQL query engine,
src/logicalplan.rs) has no sampling/splitting surface; this is part of
the LLM-pipeline extension family.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from datafusion_archive_spark.functions import text as TX

#: Buckets for the hash partition of the unit interval. 10_000 gives
#: 0.01% granularity — fine enough for any realistic split ratio.
_BUCKETS = 10_000


def split_column(
    id_col: Column, weights: Mapping[str, float], seed: int = 0
) -> Column:
    """A string column assigning each row to a named split.

    ``weights`` maps split name → fraction; fractions must sum to 1
    (±1e-9). Assignment: ``hash64(id || ':' || seed) mod 10000`` picks
    a bucket; cumulative weight boundaries carve the bucket range.
    Dict order defines the boundaries, so iterate a plain dict in
    insertion order ({'train': .8, 'val': .1, 'test': .1}).

    DuckDB twin (for ('train', .8), ('val', .1), ('test', .1)), with
    ``h`` = ``('0x' || substr(md5(id::VARCHAR || ':0'), 1, 15))::BIGINT
    % 10000``::

        CASE WHEN h < 8000 THEN 'train'
             WHEN h < 9000 THEN 'val' ELSE 'test' END
    """
    total = sum(weights.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split weights must sum to 1, got {total}")
    bucket = TX.hash64(id_col.cast("string"), seed) % _BUCKETS
    expr: Column | None = None
    cum = 0.0
    names = list(weights)
    for name in names[:-1]:
        cum += weights[name]
        cond = bucket < int(round(cum * _BUCKETS))
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    last = F.lit(names[-1])
    return last if expr is None else expr.otherwise(last)


def assign_splits(
    df: DataFrame,
    id_col: str = "doc_id",
    weights: Mapping[str, float] | None = None,
    seed: int = 0,
) -> DataFrame:
    """Attach a ``split`` column. Pure projection — no shuffle, no
    state; safe to apply at any point in a 100 TB pipeline."""
    weights = weights or {"train": 0.8, "val": 0.1, "test": 0.1}
    return df.withColumn("split", split_column(F.col(id_col), weights, seed))


def split_report(
    df: DataFrame,
    id_col: str = "doc_id",
    strata_col: str = "source",
    weights: Mapping[str, float] | None = None,
    seed: int = 0,
) -> DataFrame:
    """Per-stratum split sizes — the QA view over :func:`assign_splits`
    (one small hash-aggregate; the only shuffle, of (stratum, split)
    pairs)."""
    return (
        assign_splits(df, id_col, weights, seed)
        .groupBy(strata_col, "split")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )
