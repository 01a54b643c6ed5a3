"""Pipeline wave 62 (round 5, sixtieth wave): centroid clustering and
experiment-assignment integrity.

- ``kmeans_lloyd`` — k-means over the embedding corpus with
  _KM_K clusters, deterministic init (cluster j starts at the
  centroid of the vec_id ≡ j (mod k) group — no RNG, reproducible
  in any engine), and _KM_ITERS exact Lloyd iterations: assign =
  argmin centroid distance (ties to the lower cluster id), update =
  per-cluster mean. Each iteration is one broadcast-centroids
  assignment pass + one regroup — the canonical distributed k-means;
  the oracle unrolls identical iterations as MATERIALIZED CTEs.
  Completes the clustering family (PCA / DBSCAN / silhouette).
- ``ab_srm_check`` — the sample-ratio-mismatch guardrail: the
  portable event-id hash splits purchases 50/50 by design; report
  the observed split, the χ²₁ GOF statistic against the design
  ratio, and its p-value (A&S polynomial via the normal square
  root). SRM is the first thing to check before reading ANY
  experiment — a biased assignment invalidates everything
  downstream.

The reference has no arrays or joins (``/root/reference/ROADMAP.md``).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from datafusion_archive_spark.functions import text as TX
from datafusion_archive_spark.queries.llm import _hash64_sql
from datafusion_archive_spark.queries.pipeline35 import (
    _norm_sf_expr,
    _norm_sf_sql,
)
from datafusion_archive_spark.queries.timeseries import load_events

from datafusion_archive_spark.operators.util import cached

_KM_K = 8
_KM_ITERS = 2
_DIM = 64
_SRM_SEED = 23  # same split the conformal wave certifies


def _cells(spark, sf):
    emb = spark.read.parquet(f"{sf}/embeddings.parquet")
    return emb.select(
        "vec_id", F.posexplode("embedding").alias("i", "x")
    ).select(
        "vec_id", "i", F.col("x").cast("double").alias("x")
    )


def q_kmeans_lloyd(spark, sf):
    """K-means: 2 exact Lloyd iterations, deterministic init."""
    cells = cached(_cells(spark, sf))
    assign = cells.select(
        "vec_id", (F.col("vec_id") % _KM_K).alias("k")
    ).distinct()
    for _ in range(_KM_ITERS):
        cents = (
            cells.join(assign, "vec_id")
            .groupBy("k", "i")
            .agg(F.avg("x").alias("c"))
        )
        d2 = (
            cells.join(
                F.broadcast(
                    cents.select(
                        F.col("k").alias("ck"), "i", "c"
                    )
                ),
                "i",
            )
            .groupBy("vec_id", "ck")
            .agg(
                F.sum(
                    F.pow(F.col("x") - F.col("c"), F.lit(2.0))
                ).alias("ss")
            )
        )
        w = Window.partitionBy("vec_id").orderBy("ss", "ck")
        assign = (
            d2.select(
                "vec_id",
                "ck",
                F.row_number().over(w).alias("rn"),
            )
            .filter(F.col("rn") == 1)
            .select("vec_id", F.col("ck").alias("k"))
        )
    cents = (
        cells.join(assign, "vec_id")
        .groupBy("k", "i")
        .agg(F.avg("x").alias("c"))
    )
    within = (
        cells.join(assign, "vec_id")
        .join(F.broadcast(cents), ["k", "i"])
        .groupBy("k")
        .agg(
            F.count_distinct("vec_id").alias("size"),
            F.round(
                F.sum(F.pow(F.col("x") - F.col("c"), F.lit(2.0))), 4
            ).alias("within_ss"),
        )
    )
    return within.orderBy("k")


def q_ab_srm_check(spark, sf):
    """Sample-ratio mismatch chi-square on the hash split."""
    ev = load_events(spark, sf).filter(
        F.col("event_type") == "purchase"
    )
    split = ev.select(
        (
            F.pmod(
                TX.hash64(F.col("event_id").cast("string"), _SRM_SEED),
                F.lit(2),
            )
            == 0
        )
        .cast("long")
        .alias("arm_a")
    )
    agg = split.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("arm_a").alias("n_a"),
    )
    n = F.col("n").cast("double")
    na = F.col("n_a").cast("double")
    chi2 = F.pow(na - n / 2.0, F.lit(2.0)) / (n / 2.0) + F.pow(
        (n - na) - n / 2.0, F.lit(2.0)
    ) / (n / 2.0)
    z = F.sqrt(chi2)
    return agg.select(
        F.col("n").alias("n_events"),
        F.col("n_a").alias("n_arm_a"),
        F.round(na / n, 6).alias("share_a"),
        F.round(chi2, 6).alias("chi2_srm"),
        F.round(2.0 * _norm_sf_expr(z), 8).alias("p_srm"),
    )


QUERIES = {
    "kmeans_lloyd": q_kmeans_lloyd,
    "ab_srm_check": q_ab_srm_check,
}


def _kmeans_oracle() -> str:
    parts = [
        f"""
        cells AS MATERIALIZED (
          SELECT vec_id, r.i AS i,
                 CAST(embedding[r.i] AS DOUBLE) AS x
          FROM embeddings, range(1, {_DIM} + 1) r(i)
        ),
        a0 AS MATERIALIZED (
          SELECT DISTINCT vec_id, vec_id % {_KM_K} AS k FROM cells
        )"""
    ]
    prev = "a0"
    for it in range(1, _KM_ITERS + 1):
        parts.append(
            f"""
        c{it} AS MATERIALIZED (
          SELECT a.k, t.i, avg(t.x) AS c
          FROM cells t JOIN {prev} a ON t.vec_id = a.vec_id
          GROUP BY 1, 2
        ),
        d{it} AS MATERIALIZED (
          SELECT t.vec_id, k.k AS ck,
                 sum((t.x - k.c) ** 2) AS ss
          FROM cells t JOIN c{it} k ON t.i = k.i
          GROUP BY 1, 2
        ),
        a{it} AS MATERIALIZED (
          SELECT vec_id, ck AS k FROM (
            SELECT vec_id, ck,
                   row_number() OVER (PARTITION BY vec_id
                     ORDER BY ss, ck) AS rn
            FROM d{it}
          ) WHERE rn = 1
        )"""
        )
        prev = f"a{it}"
    parts.append(
        f"""
        cf AS (
          SELECT a.k, t.i, avg(t.x) AS c
          FROM cells t JOIN {prev} a ON t.vec_id = a.vec_id
          GROUP BY 1, 2
        )
        SELECT a.k,
               count(DISTINCT t.vec_id) AS size,
               round(sum((t.x - f.c) ** 2), 4) AS within_ss
        FROM cells t
        JOIN {prev} a ON t.vec_id = a.vec_id
        JOIN cf f ON f.k = a.k AND f.i = t.i
        GROUP BY 1
        ORDER BY 1"""
    )
    return "WITH" + ",".join(parts)


ORACLES = {
    "kmeans_lloyd": _kmeans_oracle(),
    "ab_srm_check": f"""
        WITH split AS (
          SELECT CASE WHEN
            {_hash64_sql("CAST(event_id AS VARCHAR)", _SRM_SEED)}
              % 2 = 0 THEN 1 ELSE 0 END AS arm_a
          FROM events WHERE event_type = 'purchase'
        ),
        agg AS (
          SELECT count(*) AS n,
                 CAST(sum(arm_a) AS BIGINT) AS n_a
          FROM split
        )
        SELECT n AS n_events,
               n_a AS n_arm_a,
               round(CAST(n_a AS DOUBLE) / n, 6) AS share_a,
               round((n_a - n / 2.0) ** 2 / (n / 2.0)
                 + ((n - n_a) - n / 2.0) ** 2 / (n / 2.0), 6)
                 AS chi2_srm,
               round(2.0 * {_norm_sf_sql(
                   "sqrt((n_a - n / 2.0) ** 2 / (n / 2.0)"
                   " + ((n - n_a) - n / 2.0) ** 2 / (n / 2.0))"
               )}, 8) AS p_srm
        FROM agg
    """,
}
