"""Pipeline wave 25 (round 5, twenty-third wave): behavioral
composites over the event stream.

- ``anyorder_funnel_1h`` — users who performed click, view, AND
  purchase all inside SOME one-hour span, in any order (the
  unordered counterpart of the strictly-ordered ``events_funnel``),
  with each user's earliest qualifying window start. Built as a
  bounded band self-join anchored at each event — the range-join
  decomposition, never a global window.
- ``session_abandonment_rate`` — sessions (30-minute gap
  sessionization, identical to the certified ``events_sessionize``)
  that contain a click but no purchase: the cart-abandonment KPI,
  per user-base one-row summary.

The reference has no windows, joins, or sessionization
(``/root/reference/ROADMAP.md``).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from datafusion_archive_spark.queries.timeseries import load_events

_FUNNEL_TYPES = ("click", "view", "purchase")
_FUNNEL_SPAN_US = 3_600_000_000  # 1 hour


def q_anyorder_funnel_1h(spark, sf):
    """Per user: the earliest event timestamp t such that all three
    funnel types occur in [t, t+1h] (any order). Only qualifying
    users appear.

    Scale: the anchor×candidate self-join is banded by the 1-hour
    span AND keyed on user_id — per-user work is (events within an
    hour)², the bounded range-join cost, with the distinct-type count
    collapsing map-side."""
    e = load_events(spark, sf).filter(
        F.col("event_type").isin(*_FUNNEL_TYPES)
    ).select("user_id", F.unix_micros("ts").alias("us"), "event_type", "ts")
    anchors = e.select(
        "user_id", F.col("us").alias("a_us"), F.col("ts").alias("a_ts")
    )
    cand = e.select("user_id", "us", "event_type")
    joined = anchors.join(
        cand,
        ["user_id"],
    ).filter(
        (F.col("us") >= F.col("a_us"))
        & (F.col("us") < F.col("a_us") + _FUNNEL_SPAN_US)
    )
    complete = (
        joined.groupBy("user_id", "a_us", "a_ts")
        .agg(F.count_distinct("event_type").alias("n_types"))
        .filter(F.col("n_types") == len(_FUNNEL_TYPES))
    )
    return complete.groupBy("user_id").agg(
        F.date_format(F.min("a_ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").alias(
            "first_window_start"
        )
    )


def q_session_abandonment_rate(spark, sf):
    """Cart abandonment over 30-minute-gap sessions: sessions with a
    click but no purchase ÷ sessions with a click. One row:
    n_sessions, n_click_sessions, n_abandoned, abandonment_rate.

    Scale: the same single user Exchange as the certified
    sessionization; per-session flags collapse map-side."""
    e = load_events(spark, sf)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts"))
    gap_us = 30 * 60 * 1_000_000
    sessioned = (
        e.select("user_id", "ts", "event_id", "event_type")
        .withColumn("gap", us - F.lag(us).over(w))
        .withColumn(
            "new_session",
            F.when(F.col("gap").isNull() | (F.col("gap") > gap_us), 1)
            .otherwise(0),
        )
        .withColumn(
            "session_id",
            F.sum("new_session").over(
                w.rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
    )
    per = sessioned.groupBy("user_id", "session_id").agg(
        F.max(
            F.when(F.col("event_type") == "click", 1).otherwise(0)
        ).alias("has_click"),
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("has_purchase"),
    )
    return per.agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.sum("has_click").alias("n_click_sessions"),
        F.sum(
            F.when(
                (F.col("has_click") == 1) & (F.col("has_purchase") == 0), 1
            ).otherwise(0)
        ).alias("n_abandoned"),
        F.round(
            F.sum(
                F.when(
                    (F.col("has_click") == 1) & (F.col("has_purchase") == 0),
                    1.0,
                ).otherwise(0.0)
            )
            / F.sum("has_click"),
            6,
        ).alias("abandonment_rate"),
    )


QUERIES = {
    "anyorder_funnel_1h": q_anyorder_funnel_1h,
    "session_abandonment_rate": q_session_abandonment_rate,
}

ORACLES = {
    "anyorder_funnel_1h": f"""
        WITH e AS (
          SELECT user_id, epoch_us(ts) AS us, event_type, ts
          FROM events
          WHERE event_type IN {str(tuple(_FUNNEL_TYPES))}
        ),
        complete AS (
          SELECT a.user_id, a.us AS a_us, a.ts AS a_ts
          FROM e a JOIN e c
            ON a.user_id = c.user_id
           AND c.us >= a.us AND c.us < a.us + {_FUNNEL_SPAN_US}
          GROUP BY 1, 2, 3
          HAVING count(DISTINCT c.event_type) = {len(_FUNNEL_TYPES)}
        )
        SELECT user_id,
               strftime(min(a_ts), '%Y-%m-%d %H:%M:%S.%f')
                 AS first_window_start
        FROM complete GROUP BY user_id
    """,
    "session_abandonment_rate": """
        WITH g AS (
          SELECT user_id, event_id, event_type, ts,
                 CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                        OR epoch_us(ts) - lag(epoch_us(ts)) OVER w
                           > 30 * 60 * 1000000
                      THEN 1 ELSE 0 END AS new_session
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ),
        s AS (
          SELECT user_id, event_type,
                 sum(new_session) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                 ) AS session_id
          FROM g
        ),
        per AS (
          SELECT user_id, session_id,
                 max(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                   AS has_click,
                 max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                   AS has_purchase
          FROM s GROUP BY 1, 2
        )
        SELECT count(*) AS n_sessions,
               CAST(sum(has_click) AS BIGINT) AS n_click_sessions,
               CAST(sum(CASE WHEN has_click = 1 AND has_purchase = 0
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_abandoned,
               round(sum(CASE WHEN has_click = 1 AND has_purchase = 0
                              THEN 1.0 ELSE 0.0 END)
                     / sum(has_click), 6) AS abandonment_rate
        FROM per
    """,
}
