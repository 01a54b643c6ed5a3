"""Pipeline wave 6 (round 5, fourth wave): semantic dedup, Pareto
skyline, SCD2 history, time-decayed aggregation, shard manifests, and
rolling anomaly detection.

- ``semantic_dedup_clusters`` — SemDeDup-style cluster-scoped
  embedding dedup (operators.similarity.semantic_dedup): the
  corpus-wide quadratic kernel collapses to an equi-join on the
  cluster id, so the certified row proves the *within-cluster
  remove-if-earlier-similar* semantics on a corpus with planted
  near-dup twins.
- ``skyline_orders`` — 2-D Pareto frontier via the two-phase
  local→global sorted-sweep (operators.skyline): any-partitioning
  local skylines are a superset of the global one, so phase 1 is
  embarrassingly parallel and phase 2 sees only survivors.
- ``scd2_event_state`` — type-2 slowly-changing-dimension build:
  collapse each user's consecutive equal-state runs into
  [valid_from, valid_to) intervals with an is_current flag — the
  standard warehouse history shape, one Exchange (both windows and
  the run filter share the user_id partitioning).
- ``time_decay_agg`` — recency-weighted engagement: exponentially
  decayed sums (half-life 7 days) anchored at the corpus max
  timestamp; the anchor is a broadcast 1-row aggregate, never a
  driver collect.
- ``shard_manifest`` — deterministic hash-sharding of the corpus into
  16 output shards with per-shard doc/char totals and id bounds — the
  manifest a training-data writer publishes next to its shards;
  map-only + one 16-group aggregate.
- ``events_anomaly_zscore`` — per-entity rolling z-score anomaly
  flags (mean/stddev over the 20 preceding observations, |z| >= 2.5
  with >= 10 priors), aggregated to integer counts per event type.

The reference's surface stops at batch scan/filter/project/agg SQL
(``/root/reference/ROADMAP.md:36-56``); this family belongs to the
training-data-pipeline / analytics extension mandate.
"""

from __future__ import annotations

import math

from pyspark.sql import Window
from pyspark.sql import functions as F

from datafusion_archive_spark.functions import text as TX
from datafusion_archive_spark.operators import similarity, skyline
from datafusion_archive_spark.queries.llm import _hash64_sql
from datafusion_archive_spark.operators.util import load_table


def _t(spark, sf_dir, name):
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# Semantic dedup within embedding clusters
# ---------------------------------------------------------------------------

_SEMDEDUP_THRESHOLD = 0.9


def _planted_labeled(spark, sf):
    """Labeled corpus with planted near-duplicate twins: every
    vec_id % 20 == 0 gets a perturbed copy (0.9·v + 0.1·reverse(v),
    cosine ≈ 0.99) at id+100000 in the SAME cluster. Raw testdata
    vectors are uniform-random (no natural pair clears 0.9), so the
    planted twins are exactly what the operator must remove."""
    e = _t(spark, sf, "embeddings")
    vd = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    base = e.select("vec_id", "label", vd.alias("embedding"))
    pert = base.filter(F.col("vec_id") % 20 == 0).select(
        (F.col("vec_id") + 100000).alias("vec_id"),
        "label",
        F.zip_with(
            F.col("embedding"),
            F.reverse(F.col("embedding")),
            lambda a, b: a * F.lit(0.9) + b * F.lit(0.1),
        ).alias("embedding"),
    )
    return base.unionByName(pert)


def q_semantic_dedup_clusters(spark, sf):
    """Per-cluster dedup outcome: members / removed / kept counts.
    A vector is removed iff an earlier same-cluster member has cosine
    >= 0.9 — deterministic EXISTS semantics, no greedy chain."""
    res = similarity.semantic_dedup(
        _planted_labeled(spark, sf),
        threshold=_SEMDEDUP_THRESHOLD,
        cluster_col="label",
    )
    n_removed = F.sum(F.col("removed").cast("long")).alias("n_removed")
    return res.groupBy("label").agg(
        F.count("*").alias("n_members"),
        n_removed,
        (F.count("*") - F.sum(F.col("removed").cast("long"))).alias("n_kept"),
    )


_PLANTED_LABELED_SQL = """
          SELECT vec_id, label, embedding::DOUBLE[] AS e FROM embeddings
          UNION ALL
          SELECT vec_id + 100000 AS vec_id, label,
                 list_transform(list_zip(embedding::DOUBLE[],
                                         list_reverse(embedding::DOUBLE[])),
                   s -> s[1] * 0.9::DOUBLE + s[2] * 0.1::DOUBLE) AS e
          FROM embeddings WHERE vec_id % 20 = 0
"""


# ---------------------------------------------------------------------------
# Pareto skyline
# ---------------------------------------------------------------------------


def q_skyline_orders(spark, sf):
    """Earliest-and-priciest Pareto frontier of orders: all distinct
    (order_date, total_price) points with no point both earlier (<=)
    and pricier (>=), strictly better in one."""
    o = _t(spark, sf, "orders").select(
        F.col("o_orderdate").alias("order_date"),
        F.col("o_totalprice").alias("total_price"),
    )
    return skyline.skyline_2d(o, "order_date", "total_price")


# ---------------------------------------------------------------------------
# SCD2 history build
# ---------------------------------------------------------------------------


def q_scd2_event_state(spark, sf):
    """Collapse each user's event-type sequence into type-2 validity
    intervals: a row per run of consecutive equal states, valid from
    its first event to the next state change (NULL = still current).
    Single Exchange: the change-detection lag, the run filter, and the
    interval lead all share the user_id partitioning."""
    ev = _t(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("event_type").over(w)
    changes = (
        ev.withColumn("_chg", ~prev.eqNullSafe(F.col("event_type")))
        .filter(F.col("_chg"))
    )
    return changes.select(
        "user_id",
        "event_type",
        F.col("ts").alias("valid_from"),
        F.lead("ts").over(w).alias("valid_to"),
        F.lead("ts").over(w).isNull().alias("is_current"),
    )


# ---------------------------------------------------------------------------
# Time-decayed aggregation
# ---------------------------------------------------------------------------

_HALF_LIFE_DAYS = 7.0


def q_time_decay_agg(spark, sf):
    """Exponentially decayed engagement per event type (half-life 7
    days), anchored at max(ts). The anchor is a broadcast 1-row
    aggregate joined to the fact scan — no driver round-trip, no
    second pass. Epochs are compared as float64 seconds (identical
    micros→double conversion in both engines)."""
    ev = _t(spark, sf, "events")
    mx = ev.agg(F.max("ts").alias("_mx"))
    lam = math.log(2.0) / (_HALF_LIFE_DAYS * 86400.0)
    # NTZ timestamps don't cast to double; micros-since-epoch does the
    # same conversion DuckDB's epoch() performs (the TZ attachment is
    # identical on both operands, so the age difference is exact)
    micros = lambda c: F.unix_micros(c.cast("timestamp"))  # noqa: E731
    age = (micros(F.col("_mx")) - micros(F.col("ts"))) / F.lit(1e6)
    wgt = F.exp(F.lit(-lam) * age)
    return (
        ev.join(F.broadcast(mx))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum(wgt * F.col("value")), 4).alias("decayed_value"),
            F.round(F.sum(wgt), 4).alias("decayed_count"),
        )
    )


# ---------------------------------------------------------------------------
# Shard manifest
# ---------------------------------------------------------------------------

_N_SHARDS = 16


def q_shard_manifest(spark, sf):
    """Deterministic hash-shard assignment + the per-shard manifest a
    training-data writer publishes: doc counts, char totals, id
    bounds. Map-only scan + one 16-group aggregate; the shard id is
    the engine-portable md5-derived hash64 so any system (or the
    oracle) re-derives identical shards."""
    d = _t(spark, sf, "documents")
    shard = F.pmod(
        TX.hash64(F.col("doc_id").cast("string")), F.lit(_N_SHARDS)
    ).cast("int")
    return (
        d.withColumn("shard", shard)
        .groupBy("shard")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.min("doc_id").alias("min_doc_id"),
            F.max("doc_id").alias("max_doc_id"),
        )
    )


# ---------------------------------------------------------------------------
# Rolling z-score anomalies
# ---------------------------------------------------------------------------

_Z_WINDOW = 20
_Z_MIN_PRIORS = 10
_Z_THRESHOLD = 2.5


def q_events_anomaly_zscore(spark, sf):
    """Per-user rolling anomaly detection: each event's value is
    z-scored against the mean/stddev of its user's 20 *preceding*
    events (current row excluded — no self-contamination); events with
    >= 10 priors and |z| >= 2.5 are anomalies. Reported as integer
    counts per event type (float z stays internal, so the certified
    comparison is exact). One Exchange on user_id plus the tiny final
    per-type aggregate."""
    ev = _t(spark, sf, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-_Z_WINDOW, -1)
    )
    mean = F.avg("value").over(w)
    sd = F.stddev_samp("value").over(w)
    cnt = F.count("value").over(w)
    eligible = (cnt >= _Z_MIN_PRIORS) & sd.isNotNull() & (sd > 0)
    z = (F.col("value") - mean) / sd
    return (
        ev.select(
            "event_type",
            eligible.alias("_el"),
            (eligible & (F.abs(z) >= _Z_THRESHOLD)).alias("_an"),
        )
        .groupBy("event_type")
        .agg(
            F.sum(F.col("_el").cast("long")).alias("n_eligible"),
            F.sum(F.col("_an").cast("long")).alias("n_anomalies"),
        )
    )


QUERIES = {
    "semantic_dedup_clusters": q_semantic_dedup_clusters,
    "skyline_orders": q_skyline_orders,
    "scd2_event_state": q_scd2_event_state,
    "time_decay_agg": q_time_decay_agg,
    "shard_manifest": q_shard_manifest,
    "events_anomaly_zscore": q_events_anomaly_zscore,
}

ORACLES = {
    "semantic_dedup_clusters": f"""
        WITH planted AS ({_PLANTED_LABELED_SQL}),
        nv AS (
          SELECT vec_id, label,
                 list_transform(e, x -> x / sqrt(list_dot_product(e, e)))
                   AS v
          FROM planted
        ),
        dups AS (
          SELECT DISTINCT b.vec_id AS dup_id
          FROM nv a JOIN nv b
            ON a.label = b.label AND a.vec_id < b.vec_id
          WHERE round(list_dot_product(a.v, b.v), 6)
                  >= {_SEMDEDUP_THRESHOLD}
        )
        SELECT label,
               count(*) AS n_members,
               CAST(sum(CASE WHEN d.dup_id IS NOT NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_removed,
               CAST(count(*) - sum(CASE WHEN d.dup_id IS NOT NULL
                                        THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_kept
        FROM nv LEFT JOIN dups d ON nv.vec_id = d.dup_id
        GROUP BY label
    """,
    "skyline_orders": """
        -- the NOT EXISTS dominance spec is the arbiter, but checked
        -- only against the sorted-sweep candidate set: the sweep's
        -- removals are sound by construction (a preceding row in
        -- (date ASC, price DESC) order with running-max price >= own
        -- price strictly dominates after DISTINCT), so sky is always
        -- a superset of the true skyline and exclusions stay exact —
        -- O(n * |skyline|), not the n^2 self-anti-join that cost the
        -- r10 sf0.1 sweep 56 s
        WITH p AS (
          SELECT DISTINCT o_orderdate AS order_date,
                          o_totalprice AS total_price
          FROM orders
        ),
        s AS (
          SELECT order_date, total_price,
                 max(total_price) OVER (
                   ORDER BY order_date ASC, total_price DESC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                 ) AS pm
          FROM p
        ),
        sky AS (
          SELECT order_date, total_price FROM s
          WHERE pm IS NULL OR pm < total_price
        )
        SELECT order_date, total_price
        FROM p b
        WHERE NOT EXISTS (
          SELECT 1 FROM sky a
          WHERE a.order_date <= b.order_date
            AND a.total_price >= b.total_price
            AND (a.order_date < b.order_date
                 OR a.total_price > b.total_price)
        )
    """,
    "scd2_event_state": """
        WITH m AS (
          SELECT user_id, event_type, ts, event_id,
                 lag(event_type) OVER
                   (PARTITION BY user_id ORDER BY ts, event_id) AS prev
          FROM events
        ),
        c AS (
          SELECT user_id, event_type, ts, event_id
          FROM m
          WHERE prev IS DISTINCT FROM event_type
        )
        SELECT user_id, event_type, ts AS valid_from,
               lead(ts) OVER
                 (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to,
               lead(ts) OVER
                 (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                 AS is_current
        FROM c
    """,
    "time_decay_agg": f"""
        WITH mx AS (SELECT max(ts) AS mxts FROM events)
        SELECT event_type,
               count(*) AS n_events,
               round(sum(exp(-{math.log(2.0) / (_HALF_LIFE_DAYS * 86400.0)!r}
                             * (epoch(mxts) - epoch(ts))) * value), 4)
                 AS decayed_value,
               round(sum(exp(-{math.log(2.0) / (_HALF_LIFE_DAYS * 86400.0)!r}
                             * (epoch(mxts) - epoch(ts)))), 4)
                 AS decayed_count
        FROM events CROSS JOIN mx
        GROUP BY event_type
    """,
    "shard_manifest": f"""
        WITH s AS (
          SELECT CAST({_hash64_sql("CAST(doc_id AS VARCHAR)", 0)}
                        % {_N_SHARDS} AS INTEGER) AS shard,
                 doc_id, n_chars
          FROM documents
        )
        SELECT shard,
               count(*) AS n_docs,
               CAST(sum(n_chars) AS BIGINT) AS total_chars,
               min(doc_id) AS min_doc_id,
               max(doc_id) AS max_doc_id
        FROM s
        GROUP BY shard
    """,
    "events_anomaly_zscore": f"""
        WITH w AS (
          SELECT event_type, value,
                 avg(value) OVER fr AS mean_v,
                 stddev_samp(value) OVER fr AS sd_v,
                 count(value) OVER fr AS cnt_v
          FROM events
          WINDOW fr AS (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS BETWEEN {_Z_WINDOW} PRECEDING
                                 AND 1 PRECEDING)
        )
        SELECT event_type,
               CAST(sum(CASE WHEN cnt_v >= {_Z_MIN_PRIORS}
                              AND sd_v IS NOT NULL AND sd_v > 0
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_eligible,
               CAST(sum(CASE WHEN cnt_v >= {_Z_MIN_PRIORS}
                              AND sd_v IS NOT NULL AND sd_v > 0
                              AND abs((value - mean_v) / sd_v)
                                    >= {_Z_THRESHOLD}
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_anomalies
        FROM w
        GROUP BY event_type
    """,
}
