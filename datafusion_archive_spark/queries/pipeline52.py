"""Pipeline wave 52 (round 5, fiftieth wave): retrieval evaluation
and conformal calibration — the measurement layer for the ANN and
quality families.

- ``retrieval_metrics_truncation`` — recall@10, MRR and nDCG@10 of a
  dimension-truncated retriever (cosine on the first 16 of 64 dims —
  the cheapest possible "approximate" index) against exact full-dim
  top-10, averaged over the first _N_QUERIES query vectors. This is
  the eval harness every ANN deployment needs: the approximate
  method changes, the metric queries don't. Scores use JVM-side
  ``aggregate(zip_with(...))`` dot products; ranking is one window
  per method; the metric algebra is joins on (query, ranked lists).
- ``conformal_interval_coverage`` — split conformal prediction on
  purchase values: calibration/test split by the portable 60-bit
  hash, point prediction = per-channel calibration mean, interval
  half-width = the ceil((n+1)(1−α))-th smallest absolute calibration
  residual (the finite-sample-valid quantile), reporting empirical
  test coverage vs the 90% nominal level. The distribution-free
  guarantee that score-based quality gates should ship with.

The reference has no arrays or window functions
(``/root/reference/ROADMAP.md``).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from datafusion_archive_spark.functions import text as TX
from datafusion_archive_spark.queries.llm import _hash64_sql
from datafusion_archive_spark.queries.timeseries import load_events
from datafusion_archive_spark.operators.util import cached

_N_QUERIES = 50
_TOPK = 10
_TRUNC = 16
_ALPHA = 0.1
_CONF_SEED = 23


def _norm_expr(col, dims):
    return F.sqrt(
        F.aggregate(
            F.transform(
                F.slice(col, 1, dims), lambda a: a.cast("double") * a
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def _pair_scores(spark, sf, dims_list):
    """(qid, cid, score{d}…) for every query×candidate pair and every
    truncation in ``dims_list`` — ONE pass over the cross join.

    Round 15 (guide §1.2 step 2 — per-task work): the old per-dims
    ``_scores`` recomputed BOTH vector norms inside the cross join —
    per PAIR instead of per row — and ran the whole join twice (once
    for the exact 64-dim ranking, once for the truncated one). Norms
    are now hoisted to the q/c sides before the join (identical
    expressions on identical slices ⇒ bit-identical values, so the
    ranking and every metric are unchanged), the pair loop computes
    only the dot products, and both truncations share one pass.
    ``spread`` keeps the candidate side from scanning as a single
    small-file task under the nested-loop join."""
    from datafusion_archive_spark.operators.util import spread

    emb = spark.read.parquet(f"{sf}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").alias("qv"),
        *[_norm_expr(F.col("embedding"), d).alias(f"nq{d}") for d in dims_list],
    )
    c = spread(emb).select(
        F.col("vec_id").alias("cid"),
        F.col("embedding").alias("cv"),
        *[_norm_expr(F.col("embedding"), d).alias(f"nc{d}") for d in dims_list],
    )

    def dot(dims):
        return F.aggregate(
            F.zip_with(
                F.slice("qv", 1, dims),
                F.slice("cv", 1, dims),
                lambda a, b: a.cast("double") * b,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    return (
        q.crossJoin(c)
        .filter(F.col("qid") != F.col("cid"))
        .select(
            "qid",
            "cid",
            *[
                (dot(d) / (F.col(f"nq{d}") * F.col(f"nc{d}"))).alias(
                    f"score{d}"
                )
                for d in dims_list
            ],
        )
    )


def q_retrieval_metrics_truncation(spark, sf):
    """Mean recall@10 / MRR / nDCG@10 of 16-dim vs 64-dim cosine."""
    # one shared scoring pass for both truncations (round 15); cached
    # because the exact and truncated rankings are separate window
    # sorts over the same pair table (and exact additionally feeds
    # the hit join and the query universe)
    pairs = cached(_pair_scores(spark, sf, [64, _TRUNC]))

    def _ranked(score_col, rank_name):
        w = Window.partitionBy("qid").orderBy(
            F.desc(score_col), F.col("cid")
        )
        return pairs.select(
            "qid", "cid", F.row_number().over(w).alias(rank_name)
        ).filter(F.col(rank_name) <= _TOPK)

    exact = _ranked("score64", "erank")
    approx = _ranked(f"score{_TRUNC}", "arank")
    hits = approx.join(exact, ["qid", "cid"])
    per_q = hits.groupBy("qid").agg(
        F.count(F.lit(1)).alias("n_hits"),
        (1.0 / F.min("arank")).alias("rr"),
        F.sum(1.0 / F.log2(F.col("arank") + 1)).alias("dcg"),
    )
    # queries can lose every exact-top-10 item: restore them at 0
    allq = exact.select("qid").distinct()
    idcg = sum(1.0 / __import__("math").log2(i + 1)
               for i in range(1, _TOPK + 1))
    filled = allq.join(per_q, "qid", "left").select(
        F.coalesce("n_hits", F.lit(0)).alias("n_hits"),
        F.coalesce("rr", F.lit(0.0)).alias("rr"),
        F.coalesce("dcg", F.lit(0.0)).alias("dcg"),
    )
    return filled.agg(
        F.count(F.lit(1)).alias("n_queries"),
        F.round(
            F.avg(F.col("n_hits").cast("double") / _TOPK), 6
        ).alias("recall_at_10"),
        F.round(F.avg("rr"), 6).alias("mrr"),
        F.round(F.avg(F.col("dcg") / idcg), 6).alias("ndcg_at_10"),
    )


def q_conformal_interval_coverage(spark, sf):
    """Split-conformal 90% interval coverage on purchase values."""
    ev = load_events(spark, sf).filter(
        F.col("event_type") == "purchase"
    )
    tagged = ev.select(
        F.col("props").alias("ch_src"),
        F.get_json_object("props", "$.k").cast("long").alias("ch"),
        F.col("value").alias("y"),
        (
            F.pmod(
                TX.hash64(F.col("event_id").cast("string"), _CONF_SEED),
                F.lit(2),
            )
            == 0
        ).alias("is_cal"),
    ).select((F.col("ch") % 5).alias("g"), "y", "is_cal")
    means = (
        tagged.filter("is_cal")
        .groupBy("g")
        .agg(F.avg("y").alias("mu"), F.count(F.lit(1)).alias("n_cal"))
    )
    cal_resid = cached(
        tagged.filter("is_cal")
        .join(F.broadcast(means), "g")
        .select(F.abs(F.col("y") - F.col("mu")).alias("r"))
    )
    # the ceil((n+1)(1-alpha))-th smallest residual, via the
    # distributed selection (operators/quantiles.py) — a global
    # row_number window here would sort every calibration residual
    # in one window partition
    import math as _math

    from datafusion_archive_spark.operators.quantiles import (
        exact_kth_smallest,
    )

    n_cal = cal_resid.count()
    k = min(n_cal, int(_math.ceil((n_cal + 1) * (1.0 - _ALPHA))))
    qhat = exact_kth_smallest(cal_resid, "r", k)
    test = tagged.filter(~F.col("is_cal")).join(F.broadcast(means), "g")
    return test.agg(
        F.count(F.lit(1)).alias("n_test"),
        F.round(F.lit(qhat), 4).alias("half_width"),
        F.round(
            F.avg(
                (F.abs(F.col("y") - F.col("mu")) <= F.lit(qhat))
                .cast("double")
            ),
            6,
        ).alias("coverage"),
    )


QUERIES = {
    "retrieval_metrics_truncation": q_retrieval_metrics_truncation,
    "conformal_interval_coverage": q_conformal_interval_coverage,
}

_SCORES_SQL = """
          SELECT q.vec_id AS qid, c.vec_id AS cid,
                 list_dot_product({qv}, {cv})
                   / (sqrt(list_dot_product({qv}, {qv}))
                      * sqrt(list_dot_product({cv}, {cv}))) AS score
          FROM embeddings q, embeddings c
          WHERE q.vec_id < {nq} AND q.vec_id != c.vec_id
"""


def _scores_sql(dims):
    cast = "list_transform({v}, x -> CAST(x AS DOUBLE))"
    qv = cast.format(v=f"q.embedding[1:{dims}]")
    cv = cast.format(v=f"c.embedding[1:{dims}]")
    return _SCORES_SQL.format(qv=qv, cv=cv, nq=_N_QUERIES)


ORACLES = {
    "retrieval_metrics_truncation": f"""
        WITH exact AS MATERIALIZED (
          SELECT qid, cid,
                 row_number() OVER (PARTITION BY qid
                   ORDER BY score DESC, cid) AS erank
          FROM ({_scores_sql(64)})
          QUALIFY erank <= {_TOPK}
        ),
        approx AS MATERIALIZED (
          SELECT qid, cid,
                 row_number() OVER (PARTITION BY qid
                   ORDER BY score DESC, cid) AS arank
          FROM ({_scores_sql(_TRUNC)})
          QUALIFY arank <= {_TOPK}
        ),
        hits AS (
          SELECT a.qid, a.arank
          FROM approx a JOIN exact e
            ON a.qid = e.qid AND a.cid = e.cid
        ),
        per_q AS (
          SELECT qid, count(*) AS n_hits,
                 1.0 / min(arank) AS rr,
                 sum(1.0 / log2(arank + 1)) AS dcg
          FROM hits GROUP BY 1
        ),
        idcg AS (
          SELECT sum(1.0 / log2(i + 1)) AS v
          FROM range(1, {_TOPK} + 1) r(i)
        ),
        filled AS (
          SELECT q.qid,
                 COALESCE(p.n_hits, 0) AS n_hits,
                 COALESCE(p.rr, 0.0) AS rr,
                 COALESCE(p.dcg, 0.0) AS dcg
          FROM (SELECT DISTINCT qid FROM exact) q
          LEFT JOIN per_q p ON q.qid = p.qid
        )
        SELECT count(*) AS n_queries,
               round(avg(CAST(n_hits AS DOUBLE) / {_TOPK}), 6)
                 AS recall_at_10,
               round(avg(rr), 6) AS mrr,
               round(avg(dcg / (SELECT v FROM idcg)), 6) AS ndcg_at_10
        FROM filled
    """,
    "conformal_interval_coverage": f"""
        WITH tagged AS (
          SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) % 5
                   AS g,
                 value AS y,
                 {_hash64_sql("CAST(event_id AS VARCHAR)", _CONF_SEED)}
                   % 2 = 0 AS is_cal
          FROM events
          WHERE event_type = 'purchase'
        ),
        means AS (
          SELECT g, avg(y) AS mu FROM tagged WHERE is_cal GROUP BY 1
        ),
        cal_resid AS (
          SELECT abs(t.y - m.mu) AS r
          FROM tagged t JOIN means m ON t.g = m.g
          WHERE t.is_cal
        ),
        ranked AS (
          SELECT r, row_number() OVER (ORDER BY r) AS rk,
                 count(*) OVER () AS n
          FROM cal_resid
        ),
        qhat AS (
          SELECT r AS qhat FROM ranked
          WHERE rk = LEAST(n, CAST(ceil((n + 1) * {1.0 - _ALPHA})
                                   AS BIGINT))
        )
        SELECT count(*) AS n_test,
               round(max(q.qhat), 4) AS half_width,
               round(avg(CASE WHEN abs(t.y - m.mu) <= q.qhat
                         THEN 1.0 ELSE 0.0 END), 6) AS coverage
        FROM tagged t
        JOIN means m ON t.g = m.g
        CROSS JOIN qhat q
        WHERE NOT t.is_cal
    """,
}
