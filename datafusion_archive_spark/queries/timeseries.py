"""Event/time-series queries over the ``events`` table: tumbling-window
aggregation, gap sessionization, and the as-of join — the batch twins
of the streaming operators in :mod:`datafusion_archive_spark.streaming`
(a completed stream must equal the batch computation over the same
rows, which is exactly what the oracle checks).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from datafusion_archive_spark.functions.rounding import (
    decimal_sum,
    round_half_up,
)
from datafusion_archive_spark.operators.asof import asof_join
from datafusion_archive_spark.operators.range_join import range_join_recent
from datafusion_archive_spark.operators.sketch import kmv_distinct, kmv_sql
from datafusion_archive_spark.streaming.events import (
    multi_resolution_rollup,
    sessionize_batch,
    windowed_event_counts,
)
from datafusion_archive_spark.operators.util import cached, load_table


def _t(spark, sf_dir, name):
    return load_table(spark, sf_dir, name)


def load_events(spark, sf_dir):
    """Normalize the events table's ``ts`` to session-local TIMESTAMP
    regardless of how the parquet writer encoded it:

    - TIMESTAMP(NANOS): Spark has no native type — read nanos as long
      (``spark.sql.legacy.parquet.nanosAsLong``, set defensively in
      case the session wasn't built by our factory) and truncate to µs.
    - timestamp[us] without timezone annotation: Spark 4 infers
      TIMESTAMP_NTZ, which time functions like ``unix_micros`` reject —
      cast to TIMESTAMP (exact under the session's UTC timezone, same
      values the DuckDB oracle sees).
    """
    import pyspark.sql.types as T

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # The NTZ→TIMESTAMP cast below is value-exact only under UTC; set it
    # defensively (like nanosAsLong) for sessions not built by our factory,
    # so unix_micros arithmetic can't diverge from the oracle across DST.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = _t(spark, sf_dir, "events")
    ts_type = df.schema["ts"].dataType
    if isinstance(ts_type, T.LongType):
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif isinstance(ts_type, T.TimestampNTZType):
        df = df.withColumn("ts", F.col("ts").cast(T.TimestampType()))
    return df


def q_time_bucket(spark, sf):
    """Tumbling 1-hour window aggregation (epoch-aligned, so the
    DuckDB oracle is date_trunc('hour'))."""
    return windowed_event_counts(load_events(spark, sf), "1 hour")


def q_sessionize(spark, sf):
    """Gap-based sessionization (30-minute gap)."""
    return sessionize_batch(load_events(spark, sf), gap_minutes=30)


def q_asof_join(spark, sf):
    """As-of join: each purchase event picks up the most recent
    preceding click's value for the same user. Clicks are pre-reduced
    to one row per (user, ts) so ordering is unique and the result
    deterministic."""
    ev = load_events(spark, sf)
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id"
    )
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("click_value"))
    )
    joined = asof_join(
        purchases,
        clicks,
        key="user_id",
        left_ts="ts",
        right_ts="ts",
        right_value_cols=["click_value"],
        suffix="",
    )
    return joined.select(
        "event_id",
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("ts_s"),
        "click_value",
    )


def q_range_join(spark, sf):
    """Bounded range join: for each purchase, the count and value-sum
    of the same user's clicks in the preceding hour. The band-join
    decomposition keeps the shuffle linear (see operators.range_join);
    left-outer restore keeps click-less purchases at zero."""
    ev = load_events(spark, sf)
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "value"
    )
    j = range_join_recent(
        purchases,
        clicks,
        key="user_id",
        left_ts="ts",
        right_ts="ts",
        window_us=3_600_000_000,
        left_id="event_id",
    )
    return j.groupBy("event_id", "user_id").agg(
        F.count("ts_r").alias("n_clicks"),
        F.coalesce(
            round_half_up(decimal_sum(F.col("value")), 2), F.lit(0.0)
        ).alias("sum_click_value"),
    )


def q_attribution_join(spark, sf):
    """Batch twin of the stream-stream attribution join
    (streaming.events.attribution_join_stream): click ⋈ purchase per
    user within a 60-minute conversion window. tests/test_streaming.py
    asserts the completed stream produces this exact pair set."""
    from datafusion_archive_spark.streaming.events import (
        attribution_join_batch,
    )

    return attribution_join_batch(
        load_events(spark, sf), within_minutes=60
    )


def q_multi_rollup(spark, sf):
    """Hypertable-style hour+day rollup in one pass; the day level
    re-aggregates the hourly partials, not the raw table."""
    return multi_resolution_rollup(load_events(spark, sf), ("hour", "day"))


def q_hopping_window(spark, sf):
    """Hopping (sliding) window aggregation: 1-hour windows every 30
    minutes, so each event lands in exactly two overlapping buckets.
    Spark expands the row into its windows before one hash aggregate —
    the expansion factor (window/slide) is the inherent cost of
    hopping windows and is constant per row at any scale. Completes
    the window-kind coverage: tumbling (``events_time_bucket``),
    session (``events_sessionize``), hopping (this)."""
    return windowed_event_counts(
        load_events(spark, sf), "1 hour", slide="30 minutes"
    )


def q_cohort_retention(spark, sf):
    """Cohort retention matrix: users bucketed by first-activity week
    (the cohort), counted in every subsequent week they return — the
    standard growth-analytics rollup. Two hash aggregates on user_id
    (the week set is derived per user) + one join; the cohort table is
    one row per user, so at scale the join side to broadcast/shuffle
    is O(users), never O(events). Week offsets are integer arithmetic
    on epoch seconds (both engines Monday-truncate ISO weeks)."""
    ev = load_events(spark, sf)
    weeks = ev.select(
        "user_id", F.date_trunc("week", F.col("ts")).alias("week")
    ).distinct()
    cohorts = weeks.groupBy("user_id").agg(F.min("week").alias("cohort"))
    joined = weeks.join(cohorts, "user_id")
    return (
        joined.select(
            F.date_format("cohort", "yyyy-MM-dd").alias("cohort_week"),
            (
                (
                    F.expr("unix_micros(week) div 1000000")
                    - F.expr("unix_micros(cohort) div 1000000")
                )
                / 604800
            )
            .cast("int")
            .alias("week_offset"),
            "user_id",
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.count_distinct("user_id").alias("n_users"))
    )


def q_events_funnel(spark, sf):
    """Ordered funnel: click → view-after-click → purchase-after-view
    per user, counted per stage. Each stage is a conditional min over
    the previous stage's timestamp — three aggregates on user_id that
    all reuse one hash partitioning, then a 3-row stage rollup. The
    sequential-constraint joins are per-user scalars (O(users)), not
    event-by-event pairings."""
    ev = load_events(spark, sf).select("user_id", "event_type", "ts")
    # s1/s2 cached: each feeds both the next stage's constraint join
    # and the final union — uncached, stage k would recompute every
    # earlier stage's scan+aggregate (O(users) rows pinned, not events)
    s1 = cached(
        ev.filter(F.col("event_type") == "click").groupBy("user_id").agg(
            F.min("ts").alias("t1")
        )
    )
    s2 = cached(
        ev.filter(F.col("event_type") == "view")
        .join(s1, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    s3 = (
        ev.filter(F.col("event_type") == "purchase")
        .join(s2, "user_id")
        .filter(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    return (
        s1.select(F.lit(1).alias("stage"), F.lit("click").alias("name"), "user_id")
        .unionByName(
            s2.select(
                F.lit(2).alias("stage"), F.lit("view_after_click").alias("name"),
                "user_id",
            )
        )
        .unionByName(
            s3.select(
                F.lit(3).alias("stage"),
                F.lit("purchase_after_view").alias("name"),
                "user_id",
            )
        )
        .groupBy("stage", "name")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


def q_distinct_kmv(spark, sf):
    """KMV distinct-user sketch per event type — approximate, yet
    exactly reproduced by the DuckDB oracle (md5-derived hashes make
    every intermediate engine-portable; see operators.sketch)."""
    return kmv_distinct(load_events(spark, sf), "event_type", "user_id")


QUERIES = {
    "events_time_bucket": q_time_bucket,
    "events_sessionize": q_sessionize,
    "events_asof_join": q_asof_join,
    "events_range_join": q_range_join,
    "events_multi_rollup": q_multi_rollup,
    "events_distinct_kmv": q_distinct_kmv,
    "events_attribution_join": q_attribution_join,
    "events_hopping_window": q_hopping_window,
    "cohort_retention": q_cohort_retention,
    "events_funnel": q_events_funnel,
}

ORACLES = {
    "cohort_retention": """
        WITH weeks AS (
          SELECT DISTINCT user_id, date_trunc('week', ts) AS week
          FROM events
        ),
        cohorts AS (
          SELECT user_id, min(week) AS cohort FROM weeks GROUP BY 1
        )
        SELECT strftime(c.cohort, '%Y-%m-%d') AS cohort_week,
               CAST((epoch(w.week) - epoch(c.cohort)) / 604800 AS INTEGER)
                 AS week_offset,
               count(DISTINCT w.user_id) AS n_users
        FROM weeks w JOIN cohorts c ON w.user_id = c.user_id
        GROUP BY 1, 2
    """,
    "events_funnel": """
        WITH s1 AS (
          SELECT user_id, min(ts) AS t1 FROM events
          WHERE event_type = 'click' GROUP BY 1
        ),
        s2 AS (
          SELECT e.user_id, min(e.ts) AS t2
          FROM events e JOIN s1 ON e.user_id = s1.user_id
          WHERE e.event_type = 'view' AND e.ts > s1.t1
          GROUP BY 1
        ),
        s3 AS (
          SELECT e.user_id, min(e.ts) AS t3
          FROM events e JOIN s2 ON e.user_id = s2.user_id
          WHERE e.event_type = 'purchase' AND e.ts > s2.t2
          GROUP BY 1
        )
        SELECT stage, name, count(*) AS n_users FROM (
          SELECT 1 AS stage, 'click' AS name, user_id FROM s1
          UNION ALL
          SELECT 2, 'view_after_click', user_id FROM s2
          UNION ALL
          SELECT 3, 'purchase_after_view', user_id FROM s3
        ) GROUP BY 1, 2
    """,
    # Hopping windows: an event at integer-second epoch `sec` belongs
    # to every 30-min-aligned start s with s <= ts < s + 1h, i.e.
    # s in [((sec-3600)//1800 + 1)*1800, (sec//1800)*1800] — exactly
    # Spark's window(ts, '1 hour', '30 minutes') membership.
    "events_hopping_window": """
        WITH ev AS (
          SELECT event_type, value, epoch_us(ts) // 1000000 AS sec
          FROM events
        ),
        wins AS (
          SELECT event_type, value,
                 unnest(generate_series(
                   make_timestamp((((sec - 3600) // 1800 + 1) * 1800)
                                  * 1000000),
                   make_timestamp(((sec // 1800) * 1800) * 1000000),
                   INTERVAL 30 MINUTE)) AS wstart
          FROM ev
        )
        SELECT strftime(wstart, '%Y-%m-%d %H:%M:%S') AS window_start,
               event_type,
               count(*) AS n_events,
               floor(CAST(sum(CAST(value AS DECIMAL(27,6))) AS DOUBLE)
                     * 100 + 0.5) / 100.0 AS sum_value
        FROM wins GROUP BY 1, 2
    """,
    "events_time_bucket": """
        SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S')
                 AS window_start,
               event_type,
               count(*) AS n_events,
               floor(CAST(sum(CAST(value AS DECIMAL(27,6))) AS DOUBLE)
                     * 100 + 0.5) / 100.0 AS sum_value
        FROM events GROUP BY 1, 2
    """,
    "events_sessionize": """
        WITH g AS (
          SELECT user_id, event_id,
                 CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                        OR epoch_us(ts) - lag(epoch_us(ts)) OVER w
                           > 30 * 60 * 1000000
                      THEN 1 ELSE 0 END AS new_session,
                 ts
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ),
        s AS (
          SELECT user_id,
                 sum(new_session) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                 ) AS session_id
          FROM g
        ),
        per_session AS (
          SELECT user_id, session_id, count(*) AS n_events
          FROM s GROUP BY 1, 2
        )
        SELECT user_id,
               CAST(max(session_id) AS BIGINT) AS n_sessions,
               max(n_events) AS max_session_events
        FROM per_session GROUP BY user_id
    """,
    "events_asof_join": """
        WITH clicks AS (
          SELECT user_id, ts, max(value) AS click_value
          FROM events WHERE event_type = 'click' GROUP BY 1, 2
        ),
        purchases AS (
          SELECT user_id, ts, event_id
          FROM events WHERE event_type = 'purchase'
        ),
        merged AS (
          SELECT user_id, ts, 1 AS is_left, event_id,
                 NULL::DOUBLE AS click_value FROM purchases
          UNION ALL
          SELECT user_id, ts, 0 AS is_left, NULL AS event_id,
                 click_value FROM clicks
        ),
        carried AS (
          SELECT user_id, ts, is_left, event_id,
                 last_value(click_value IGNORE NULLS) OVER (
                   PARTITION BY user_id ORDER BY ts, is_left
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                 ) AS click_value
          FROM merged
        )
        SELECT event_id, user_id,
               strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS ts_s,
               click_value
        FROM carried WHERE is_left = 1
    """,
    "events_range_join": """
        WITH purchases AS (
          SELECT event_id, user_id, ts FROM events
          WHERE event_type = 'purchase'
        ),
        clicks AS (
          SELECT user_id, ts, value FROM events WHERE event_type = 'click'
        )
        SELECT p.event_id, p.user_id,
               count(c.ts) AS n_clicks,
               coalesce(
                 floor(CAST(sum(CAST(c.value AS DECIMAL(27,6))) AS DOUBLE)
                       * 100 + 0.5) / 100.0,
                 0.0) AS sum_click_value
        FROM purchases p
        LEFT JOIN clicks c
          ON p.user_id = c.user_id
         AND c.ts > p.ts - INTERVAL 1 HOUR
         AND c.ts <= p.ts
        GROUP BY 1, 2
    """,
    "events_multi_rollup": """
        WITH hourly AS (
          SELECT date_trunc('hour', ts) AS bucket,
                 event_type AS key,
                 count(*) AS n_events,
                 sum(CAST(value AS DECIMAL(27,6))) AS sum_dec
          FROM events GROUP BY 1, 2
        ),
        daily AS (
          SELECT date_trunc('day', bucket) AS bucket, key,
                 CAST(sum(n_events) AS BIGINT) AS n_events,
                 sum(sum_dec) AS sum_dec
          FROM hourly GROUP BY 1, 2
        )
        SELECT 'hour' AS resolution,
               strftime(bucket, '%Y-%m-%d %H:%M:%S') AS bucket_start,
               key, n_events,
               floor(CAST(sum_dec AS DOUBLE) * 100 + 0.5) / 100.0
                 AS sum_value
        FROM hourly
        UNION ALL
        SELECT 'day',
               strftime(bucket, '%Y-%m-%d %H:%M:%S'),
               key, n_events,
               floor(CAST(sum_dec AS DOUBLE) * 100 + 0.5) / 100.0
        FROM daily
    """,
    "events_distinct_kmv": kmv_sql("events", "event_type", "user_id"),
    "events_attribution_join": """
        WITH lo AS (
          SELECT user_id, event_id AS click_id, epoch_us(ts) AS click_us
          FROM events WHERE event_type = 'click'
        ),
        hi AS (
          SELECT user_id, event_id AS purchase_id, epoch_us(ts) AS p_us
          FROM events WHERE event_type = 'purchase'
        )
        SELECT lo.user_id, click_id, purchase_id
        FROM lo JOIN hi ON lo.user_id = hi.user_id
         AND p_us >= click_us
         AND p_us <= click_us + 3600000000
    """,
}
