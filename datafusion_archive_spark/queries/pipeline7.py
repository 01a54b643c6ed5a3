"""Pipeline wave 7 (round 5, fifth wave): class rebalancing, temporal
splits, windowed distinct counts, and share-shift analytics.

- ``class_rebalance`` — downsample every language to the minority
  class size with a deterministic hash ranking: the classifier-prep
  twin of the per-language sampler. The per-class rank is the same
  window shape as ``weighted_sample_per_lang`` (whose salted variant
  proves the skew escape hatch for this whole family).
- ``temporal_split_last_k`` — leakage-safe evaluation split: each
  user's last 2 events are the test set, everything earlier is train
  — the per-entity temporal split recommender/forecasting pipelines
  use (a random split would leak future behavior into training).
- ``events_hopping_distinct_users`` — COUNT(DISTINCT) per hopping
  window: the windowed-cardinality form the dashboard "active users"
  metric needs; completes hopping-window coverage beyond sums/counts.
- ``sales_share_shift`` — percent-of-total + year-over-year share
  delta per customer nation: the classic share-shift OLAP report
  (two-level aggregate, then two cheap windows over the
  nation×year grid).

The reference stops at single-block batch SQL
(``/root/reference/src/sqlplanner.rs``; roadmap
``/root/reference/ROADMAP.md:36-56``); these extend its analytics
surface along the training-data-pipeline mandate.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from datafusion_archive_spark.functions import text as TX
from datafusion_archive_spark.functions.rounding import (
    decimal_sum,
    decimal_sum_sql,
    round_half_up,
    round_half_up_sql,
)
from datafusion_archive_spark.queries.llm import _hash64_sql
from datafusion_archive_spark.queries.timeseries import load_events
from datafusion_archive_spark.operators.util import load_table


def _t(spark, sf_dir, name):
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# Class rebalancing
# ---------------------------------------------------------------------------

_REBALANCE_SEED = 23


def q_class_rebalance(spark, sf):
    """Downsample every language to the minority-language size, keeping
    the docs with the smallest deterministic hash (engine-portable
    md5-hash64, tie-broken by doc_id). Reported per language:
    before/after counts and the exact kept-id checksum, so the
    certified row pins WHICH docs survive, not just how many.

    Scale: the kept set is data-dependent (rank <= minority size), so
    neither the salted top-k nor a fixed-k trick applies — a dominant
    class used to concentrate its whole sort in one task. Since round
    8 the rank comes from :func:`operators.ranks.bucketed_group_rank`
    (widest sort: one (lang, hash-bucket) slice), whose per-group size
    column also supplies n_before, dropping the final join."""
    from datafusion_archive_spark.operators.ranks import bucketed_group_rank

    d = _t(spark, sf, "documents")
    minority = (
        d.groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n_before"))
        .agg(F.min("n_before").alias("n_target"))
    )
    u = TX.hash64(F.col("doc_id").cast("string"), _REBALANCE_SEED)
    ranked = bucketed_group_rank(
        d.select("lang", "doc_id", u.alias("_u")),
        ["lang"],
        "_u",
        tiebreak=["doc_id"],
        rank_col="_rk",
        n_col="_n_before",
    )
    kept = ranked.join(F.broadcast(minority)).filter(
        F.col("_rk") <= F.col("n_target")
    )
    return kept.groupBy("lang").agg(
        F.max("_n_before").alias("n_before"),
        F.count(F.lit(1)).alias("n_kept"),
        F.sum("doc_id").alias("kept_id_sum"),
    )


# ---------------------------------------------------------------------------
# Temporal split
# ---------------------------------------------------------------------------

_SPLIT_LAST_K = 2


def q_temporal_split_last_k(spark, sf):
    """Per-user temporal split: the last 2 events (by time) of every
    user are 'test', the rest 'train' — the leakage-safe split shape
    for sequential models. One Exchange on user_id for the recency
    rank, then a tiny (split × event_type) aggregate certifies both
    membership and sizes."""
    ev = load_events(spark, sf)
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        ev.withColumn("_rk", F.row_number().over(w))
        .withColumn(
            "split",
            F.when(F.col("_rk") <= _SPLIT_LAST_K, "test").otherwise("train"),
        )
        .groupBy("split", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
        )
    )


# ---------------------------------------------------------------------------
# Hopping-window distinct users
# ---------------------------------------------------------------------------


def q_events_hopping_distinct_users(spark, sf):
    """Exact COUNT(DISTINCT user_id) per 1-hour window hopping every
    30 minutes — the "active users" cardinality metric over
    overlapping windows. The expansion factor (window/slide = 2) is
    the inherent hopping cost; the distinct then shuffles (window,
    user) pairs once before the count. At extreme scale the KMV
    sketch row (events_distinct_kmv) is the bounded-error
    alternative; this row is the exact form."""
    ev = load_events(spark, sf)
    return (
        ev.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(F.countDistinct("user_id").alias("n_users"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias(
                "window_start"
            ),
            "n_users",
        )
    )


# ---------------------------------------------------------------------------
# Share-shift analytics
# ---------------------------------------------------------------------------


def q_sales_share_shift(spark, sf):
    """Percent-of-total and YoY share delta per customer nation: the
    classic share-shift report. Revenue aggregates once on
    (nation, year) with exact decimal partials; the share and its lag
    run over the tiny nation×year grid, so both windows are
    post-aggregate and effectively free. Nation/customer dims
    broadcast into the orders scan."""
    o = _t(spark, sf, "orders")
    c = _t(spark, sf, "customer")
    n = _t(spark, sf, "nation")
    rev = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("year"),
        )
        .agg(decimal_sum(F.col("o_totalprice")).alias("_rev"))
    )
    wy = Window.partitionBy("year")
    wn = Window.partitionBy("nation").orderBy("year")
    share = F.round(
        F.col("_rev").cast("double") / F.sum("_rev").over(wy).cast("double"),
        6,
    )
    return (
        rev.withColumn("share", share)
        .withColumn(
            "share_delta",
            F.round(F.col("share") - F.lag("share").over(wn), 6),
        )
        .select(
            "nation",
            "year",
            round_half_up(F.col("_rev"), 2).alias("revenue"),
            "share",
            "share_delta",
        )
    )


QUERIES = {
    "class_rebalance": q_class_rebalance,
    "temporal_split_last_k": q_temporal_split_last_k,
    "events_hopping_distinct_users": q_events_hopping_distinct_users,
    "sales_share_shift": q_sales_share_shift,
}

ORACLES = {
    "class_rebalance": f"""
        WITH ranked AS (
          SELECT lang, doc_id,
                 row_number() OVER (
                   PARTITION BY lang
                   ORDER BY {_hash64_sql("CAST(doc_id AS VARCHAR)",
                                         _REBALANCE_SEED)}, doc_id
                 ) AS rk
          FROM documents
        ),
        before AS (
          SELECT lang, count(*) AS n_before FROM documents GROUP BY lang
        ),
        tgt AS (SELECT min(n_before) AS n_target FROM before)
        SELECT r.lang,
               b.n_before,
               count(*) AS n_kept,
               CAST(sum(r.doc_id) AS BIGINT) AS kept_id_sum
        FROM ranked r CROSS JOIN tgt JOIN before b ON r.lang = b.lang
        WHERE r.rk <= tgt.n_target
        GROUP BY r.lang, b.n_before
    """,
    "temporal_split_last_k": f"""
        WITH ranked AS (
          SELECT event_type, user_id,
                 row_number() OVER (
                   PARTITION BY user_id ORDER BY ts DESC, event_id DESC
                 ) AS rk
          FROM events
        )
        SELECT CASE WHEN rk <= {_SPLIT_LAST_K} THEN 'test'
                    ELSE 'train' END AS split,
               event_type,
               count(*) AS n_events,
               CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
        FROM ranked
        GROUP BY 1, 2
    """,
    "events_hopping_distinct_users": """
        WITH ev AS (
          SELECT user_id, epoch_us(ts) // 1000000 AS sec FROM events
        ),
        wins AS (
          SELECT user_id,
                 unnest(generate_series(
                   make_timestamp((((sec - 3600) // 1800 + 1) * 1800)
                                  * 1000000),
                   make_timestamp(((sec // 1800) * 1800) * 1000000),
                   INTERVAL 30 MINUTE)) AS wstart
          FROM ev
        )
        SELECT strftime(wstart, '%Y-%m-%d %H:%M:%S') AS window_start,
               CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
        FROM wins GROUP BY 1
    """,
    "sales_share_shift": f"""
        WITH rev AS (
          SELECT n.n_name AS nation,
                 CAST(EXTRACT(year FROM o.o_orderdate) AS INTEGER)
                   AS year,
                 {decimal_sum_sql("o.o_totalprice")} AS drev
          FROM orders o
          JOIN customer c ON o.o_custkey = c.c_custkey
          JOIN nation n ON c.c_nationkey = n.n_nationkey
          GROUP BY 1, 2
        )
        , sh AS (
          SELECT nation, year, drev,
                 round(CAST(drev AS DOUBLE)
                       / CAST(sum(drev) OVER (PARTITION BY year)
                              AS DOUBLE), 6) AS share
          FROM rev
        )
        SELECT nation, year,
               {round_half_up_sql("drev", 2)} AS revenue,
               share,
               round(share - lag(share)
                       OVER (PARTITION BY nation ORDER BY year), 6)
                 AS share_delta
        FROM sh
    """,
}
