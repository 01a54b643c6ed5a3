"""Pipeline wave 30 (round 5, twenty-eighth wave): contrastive
training-pair mining over the embedding corpus.

- ``hard_negatives_topk`` — hard-negative mining: for each query
  vector (vec_id < 25), the 3 most cosine-similar corpus vectors
  with a DIFFERENT label. The pairs contrastive losses learn most
  from — similar in representation space, different in class.
- ``contrastive_random_negatives`` — the uniform-negative
  complement: 4 deterministic hash-drawn negatives per anchor
  (vec_id < 50), reproducible in any engine via the portable md5
  draw (self-collisions shift by one, mod n). Together the two
  queries are the positive/negative sampler of a contrastive
  training-data builder.

The reference has no arrays or hashing (``src/logicalplan.rs``).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from datafusion_archive_spark.functions import text as TX
from datafusion_archive_spark.queries.llm import (
    _COSINE_SQL,
    _NORM_VECS_SQL,
    _hash64_sql,
)
from datafusion_archive_spark.operators.util import load_table


def _t(spark, sf_dir, name):
    return load_table(spark, sf_dir, name)


_HN_QUERIES = 25
_HN_K = 3


def q_hard_negatives_topk(spark, sf):
    """Top-3 different-label cosine neighbors per query vector — the
    hard-negative miner.

    Scale: the query set (anchors) is broadcast against the
    L2-normalized corpus; the label filter rides the join condition,
    so same-label pairs never reach the ranking window (one Exchange
    on query_id over candidate rows only)."""
    e = _t(spark, sf, "embeddings")
    vd = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    norm = F.sqrt(
        F.aggregate(vd, F.lit(0.0), lambda a, x: a + x * x)
    )
    c = e.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("label").alias("n_label"),
        F.transform(vd, lambda x: x / norm).alias("cv"),
    )
    q = (
        e.filter(F.col("vec_id") < _HN_QUERIES)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("label").alias("q_label"),
            F.transform(vd, lambda x: x / norm).alias("qv"),
        )
    )
    scored = c.join(
        F.broadcast(q),
        (F.col("query_id") != F.col("neighbor_id"))
        & (F.col("q_label") != F.col("n_label")),
    ).select(
        "query_id",
        "neighbor_id",
        F.col("n_label").alias("neighbor_label"),
        F.round(
            F.aggregate(
                F.zip_with(F.col("qv"), F.col("cv"), lambda a, b: a * b),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ),
            6,
        ).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= _HN_K)
        .select("query_id", "neighbor_id", "neighbor_label", "cosine", "rank")
    )


_RN_ANCHORS = 50
_RN_K = 4


def q_contrastive_random_negatives(spark, sf):
    """4 deterministic uniform negatives per anchor: neg = hash64
    (anchor:slot) mod n; a self-collision shifts to (neg+1) mod n.
    Reproducible in any engine; ids are dense 0..n−1 in this corpus
    (asserted by the certified integrity audit pattern).

    Scale: map-only over the anchor × slot grid; n broadcasts."""
    e = _t(spark, sf, "embeddings")
    n = e.agg(F.count(F.lit(1)).alias("n"))
    anchors = e.filter(F.col("vec_id") < _RN_ANCHORS).select("vec_id")
    slots = spark.range(_RN_K).select(F.col("id").cast("int").alias("slot"))
    grid = anchors.crossJoin(F.broadcast(slots)).join(F.broadcast(n))
    draw = TX.hash64(
        F.concat_ws(":", F.col("vec_id"), F.col("slot"))
    ) % F.col("n")
    neg = F.when(draw == F.col("vec_id"), (draw + 1) % F.col("n")).otherwise(
        draw
    )
    return grid.select(
        F.col("vec_id").alias("anchor_id"),
        "slot",
        neg.cast("long").alias("negative_id"),
    )


QUERIES = {
    "hard_negatives_topk": q_hard_negatives_topk,
    "contrastive_random_negatives": q_contrastive_random_negatives,
}

ORACLES = {
    "hard_negatives_topk": f"""
        WITH c AS (
          SELECT e.vec_id, e.label, n.v
          FROM embeddings e
          JOIN ({_NORM_VECS_SQL}) n USING (vec_id)
        ),
        q AS (SELECT * FROM c WHERE vec_id < {_HN_QUERIES}),
        scored AS (
          SELECT q.vec_id AS query_id,
                 c.vec_id AS neighbor_id,
                 c.label AS neighbor_label,
                 {_COSINE_SQL.format(a='q.v', b='c.v')} AS cosine
          FROM q, c
          WHERE q.vec_id <> c.vec_id AND q.label <> c.label
        )
        SELECT query_id, neighbor_id, neighbor_label, cosine, rank
        FROM (
          SELECT *, CAST(row_number() OVER (
                   PARTITION BY query_id ORDER BY cosine DESC, neighbor_id
                 ) AS INTEGER) AS rank
          FROM scored
        ) t WHERE rank <= {_HN_K}
    """,
    "contrastive_random_negatives": f"""
        WITH n AS (SELECT count(*) AS n FROM embeddings),
        anchors AS (
          SELECT vec_id FROM embeddings WHERE vec_id < {_RN_ANCHORS}
        ),
        grid AS (
          SELECT a.vec_id, CAST(s.range AS INTEGER) AS slot, n.n
          FROM anchors a CROSS JOIN range(0, {_RN_K}) s CROSS JOIN n
        ),
        drawn AS (
          SELECT vec_id, slot, n,
                 {_hash64_sql("(vec_id || ':' || slot)", 0)} % n AS draw
          FROM grid
        )
        SELECT vec_id AS anchor_id, slot,
               CAST(CASE WHEN draw = vec_id THEN (draw + 1) % n
                         ELSE draw END AS BIGINT) AS negative_id
        FROM drawn
    """,
}
