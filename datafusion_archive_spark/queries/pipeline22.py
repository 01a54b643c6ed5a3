"""Pipeline wave 22 (round 5, twentieth wave): series risk metrics,
process memory, and conversion timing.

- ``max_drawdown_daily`` — maximum decline from the running peak of
  the daily-revenue series (the drawdown metric of monitoring and
  finance), with the trough day. Running max + argmax over the day
  grid.
- ``entropy_rate_transitions`` — the conditional entropy
  H(X_t | X_{t−1}) of the per-user event-type process vs the
  marginal entropy H(X_t): how much the previous event predicts the
  next (ratio < 1 ⇒ the process has memory). Built on the same
  lag-pair rollup as ``events_transitions``.
- ``conversion_time_percentiles`` — click→purchase conversion lag
  percentiles (p50/p90) via the backward as-of join: the
  time-to-convert product metric, composing the certified asof
  machinery.
- ``local_peaks_daily`` — local maxima of the daily revenue series
  (strictly above both neighbors AND 1.2× the series mean): the
  peak-detection pass behind alerting and campaign post-mortems.
- ``bollinger_breaches`` — days where revenue exits the 14-day
  trailing mean ± 2σ band (≥ 10 priors required): the classic
  volatility-envelope anomaly flag, exact in both engines because
  the trailing frame is identical integer row ranges.

All five collapse the fact scan to the daily/type grid before any
window. The reference has no windows or statistics
(``/root/reference/ROADMAP.md``).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from datafusion_archive_spark.functions.rounding import (
    decimal_sum,
    decimal_sum_sql,
    round_half_up,
    round_half_up_sql,
)
from datafusion_archive_spark.operators.asof import asof_join
from datafusion_archive_spark.queries.timeseries import load_events
from datafusion_archive_spark.operators.quantiles import exact_quantiles_cont
from datafusion_archive_spark.operators.util import cached, load_table


def _t(spark, sf_dir, name):
    return load_table(spark, sf_dir, name)


def _daily_revenue(spark, sf):
    o = _t(spark, sf, "orders")
    return o.groupBy(
        F.date_format(F.to_date("o_orderdate"), "yyyy-MM-dd").alias("day")
    ).agg(decimal_sum(F.col("o_totalprice")).cast("double").alias("rev"))


_DAILY_SQL = f"""
          SELECT strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d') AS day,
                 CAST({decimal_sum_sql("o_totalprice")} AS DOUBLE) AS rev
          FROM orders GROUP BY 1
"""


# ---------------------------------------------------------------------------
# Max drawdown
# ---------------------------------------------------------------------------


def q_max_drawdown_daily(spark, sf):
    """Maximum peak-to-trough decline of the daily revenue series:
    dd_t = (peak_t − rev_t)/peak_t with peak_t the running max; one
    row reports the worst day (ties → earliest), its drawdown, and
    the peak it fell from.

    Scale: running max + argmax over the DAY grid (the fact scan
    collapsed first) — thousands of rows for decades of data."""
    daily = _daily_revenue(spark, sf)
    w = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    dd = daily.withColumn("peak", F.max("rev").over(w)).withColumn(
        "drawdown", (F.col("peak") - F.col("rev")) / F.col("peak")
    )
    pick = Window.orderBy(F.desc("drawdown"), "day")
    return (
        dd.withColumn("rn", F.row_number().over(pick))
        .filter(F.col("rn") == 1)
        .select(
            F.col("day").alias("trough_day"),
            F.round("rev", 2).alias("trough_rev"),
            F.round("peak", 2).alias("peak_rev"),
            F.round("drawdown", 6).alias("max_drawdown"),
        )
    )


# ---------------------------------------------------------------------------
# Entropy rate
# ---------------------------------------------------------------------------


def q_entropy_rate_transitions(spark, sf):
    """Process-memory diagnostic over per-user event sequences:
    marginal entropy H(X) of next-event types vs conditional entropy
    H(X_t | X_{t−1}) from the transition rollup; memory_ratio =
    H_cond/H_marg (1 ⇒ memoryless). One row.

    Scale: one user Exchange for the lag; the entropy sums run over
    the |types|² transition cells. The transition rollup is cached —
    it fans out to four consumers (row/column marginals, total,
    join), and without the cache each branch would re-run the
    corpus-sized lag-window pipeline (4 scans + 4 user shuffles
    instead of 1, confirmed in the round-6 plan audit)."""
    e = load_events(spark, sf).select("user_id", "ts", "event_id", "event_type")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = cached(
        e.withColumn("prev", F.lag("event_type").over(w))
        .filter(F.col("prev").isNotNull())
        .groupBy("prev", "event_type")
        .agg(F.count(F.lit(1)).cast("double").alias("n"))
    )
    row_m = pairs.groupBy("prev").agg(F.sum("n").alias("nr"))
    col_m = pairs.groupBy("event_type").agg(F.sum("n").alias("nc"))
    tot = pairs.agg(F.sum("n").alias("nt"))
    joined = (
        pairs.join(F.broadcast(row_m), "prev")
        .join(F.broadcast(col_m), "event_type")
        .join(F.broadcast(tot))
    )
    pij = F.col("n") / F.col("nt")
    p_cond = F.col("n") / F.col("nr")
    pc = F.col("nc") / F.col("nt")
    agg = joined.agg(
        F.max("nt").cast("long").alias("n_transitions"),
        (-F.sum(pij * F.log(p_cond))).alias("_hc"),
        (-F.sum(pij * F.log(pc))).alias("_hm"),
    )
    return agg.select(
        "n_transitions",
        F.round("_hc", 6).alias("h_cond_nats"),
        F.round("_hm", 6).alias("h_marginal_nats"),
        F.round(F.col("_hc") / F.col("_hm"), 6).alias("memory_ratio"),
    )


# ---------------------------------------------------------------------------
# Conversion-time percentiles
# ---------------------------------------------------------------------------


def q_conversion_time_percentiles(spark, sf):
    """Click→purchase lag: each purchase takes the most recent
    preceding click (backward as-of, same user); report the count of
    converted purchases and the p50/p90 lag in seconds. One row.

    Scale: the asof union-carry costs one user Exchange; the lag
    percentiles come from the histogram-pruned search over the CACHED
    converted-lag set (round 7 — the global ``percentile`` aggregate
    funneled every converted purchase's lag through one task's
    buffer; the cache keeps the asof join from re-running per search
    pass and is released by the next query's build)."""
    ev = load_events(spark, sf)
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id"
    )
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.max(F.unix_micros("ts")).alias("click_us"))
    )
    joined = asof_join(
        purchases,
        clicks,
        key="user_id",
        left_ts="ts",
        right_ts="ts",
        right_value_cols=["click_us"],
        suffix="",
    ).filter(F.col("click_us").isNotNull())
    lags = cached(
        joined.select(
            ((F.unix_micros("ts") - F.col("click_us")) / 1e6).alias("lag_s")
        )
    )
    p50, p90 = exact_quantiles_cont(lags, "lag_s", [0.5, 0.9])
    return lags.agg(
        F.count(F.lit(1)).alias("n_converted"),
        round_half_up(F.lit(p50).cast("double"), 2).alias("p50_lag_s"),
        round_half_up(F.lit(p90).cast("double"), 2).alias("p90_lag_s"),
    )


# ---------------------------------------------------------------------------
# Local peaks
# ---------------------------------------------------------------------------

_PEAK_FACTOR = 1.2


def q_local_peaks_daily(spark, sf):
    """Days whose revenue strictly exceeds both neighbors AND 1.2×
    the series mean: prominent local maxima (the alerting/post-mortem
    peak list).

    Scale: lag/lead share one ordered window over the day grid; the
    mean broadcasts back."""
    daily = _daily_revenue(spark, sf)
    w = Window.orderBy("day")
    mean = daily.agg(F.avg("rev").alias("mu"))
    flagged = (
        daily.withColumn("prev", F.lag("rev").over(w))
        .withColumn("nxt", F.lead("rev").over(w))
        .join(F.broadcast(mean))
        .filter(
            (F.col("rev") > F.col("prev"))
            & (F.col("rev") > F.col("nxt"))
            & (F.col("rev") > _PEAK_FACTOR * F.col("mu"))
        )
    )
    return flagged.select(
        "day",
        F.round("rev", 2).alias("rev"),
        F.round(F.col("rev") / F.col("mu"), 4).alias("vs_mean"),
    )


# ---------------------------------------------------------------------------
# Bollinger breaches
# ---------------------------------------------------------------------------

_BOLL_WIN = 14
_BOLL_K = 2.0
_BOLL_MIN_PRIORS = 10


def q_bollinger_breaches(spark, sf):
    """Days where revenue exits the trailing 14-day mean ± 2σ band
    (the current day excluded from its own band; ≥ 10 priors
    required): the volatility-envelope anomaly flag. Output is the
    breach days with band edges and direction.

    Scale: one trailing ROWS frame over the day grid; both engines
    evaluate the identical integer frame, and half-up rounding pins
    the band edges."""
    daily = _daily_revenue(spark, sf)
    frame = (
        Window.orderBy("day").rowsBetween(-_BOLL_WIN, -1)
    )
    banded = (
        daily.withColumn("mu", F.avg("rev").over(frame))
        .withColumn("sd", F.stddev_samp("rev").over(frame))
        .withColumn("n_priors", F.count("rev").over(frame))
        .filter(F.col("n_priors") >= _BOLL_MIN_PRIORS)
        .withColumn("upper", F.col("mu") + _BOLL_K * F.col("sd"))
        .withColumn("lower", F.col("mu") - _BOLL_K * F.col("sd"))
        .filter(
            (F.col("rev") > F.col("upper")) | (F.col("rev") < F.col("lower"))
        )
    )
    return banded.select(
        "day",
        F.round("rev", 2).alias("rev"),
        round_half_up(F.col("upper"), 2).alias("upper"),
        round_half_up(F.col("lower"), 2).alias("lower"),
        F.when(F.col("rev") > F.col("upper"), "high")
        .otherwise("low")
        .alias("direction"),
    )


QUERIES = {
    "max_drawdown_daily": q_max_drawdown_daily,
    "entropy_rate_transitions": q_entropy_rate_transitions,
    "conversion_time_percentiles": q_conversion_time_percentiles,
    "local_peaks_daily": q_local_peaks_daily,
    "bollinger_breaches": q_bollinger_breaches,
}

ORACLES = {
    "max_drawdown_daily": f"""
        WITH daily AS ({_DAILY_SQL}),
        dd AS (
          SELECT day, rev,
                 max(rev) OVER (ORDER BY day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS peak
          FROM daily
        ),
        picked AS (
          SELECT *, (peak - rev) / peak AS drawdown,
                 row_number() OVER (
                   ORDER BY (peak - rev) / peak DESC, day) AS rn
          FROM dd
        )
        SELECT day AS trough_day,
               round(rev, 2) AS trough_rev,
               round(peak, 2) AS peak_rev,
               round(drawdown, 6) AS max_drawdown
        FROM picked WHERE rn = 1
    """,
    "entropy_rate_transitions": """
        WITH seq AS (
          SELECT event_type,
                 lag(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id) AS prev
          FROM events
        ),
        pairs AS (
          SELECT prev, event_type, CAST(count(*) AS DOUBLE) AS n
          FROM seq WHERE prev IS NOT NULL GROUP BY 1, 2
        ),
        rm AS (SELECT prev, sum(n) AS nr FROM pairs GROUP BY 1),
        cm AS (SELECT event_type, sum(n) AS nc FROM pairs GROUP BY 1),
        tot AS (SELECT sum(n) AS nt FROM pairs),
        agg AS (
          SELECT max(nt) AS nt,
                 -sum((n / nt) * ln(n / nr)) AS hc,
                 -sum((n / nt) * ln(nc / nt)) AS hm
          FROM pairs
          JOIN rm USING (prev)
          JOIN cm USING (event_type)
          CROSS JOIN tot
        )
        SELECT CAST(nt AS BIGINT) AS n_transitions,
               round(hc, 6) AS h_cond_nats,
               round(hm, 6) AS h_marginal_nats,
               round(hc / hm, 6) AS memory_ratio
        FROM agg
    """,
    "conversion_time_percentiles": f"""
        WITH clicks AS (
          SELECT user_id, ts, max(epoch_us(ts)) AS click_us
          FROM events WHERE event_type = 'click' GROUP BY 1, 2
        ),
        purchases AS (
          SELECT user_id, ts, event_id
          FROM events WHERE event_type = 'purchase'
        ),
        merged AS (
          SELECT user_id, ts, 1 AS is_left, event_id,
                 NULL::BIGINT AS click_us FROM purchases
          UNION ALL
          SELECT user_id, ts, 0 AS is_left, NULL AS event_id,
                 click_us FROM clicks
        ),
        carried AS (
          SELECT user_id, ts, is_left, event_id,
                 last_value(click_us IGNORE NULLS) OVER (
                   PARTITION BY user_id ORDER BY ts, is_left
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                 ) AS click_us
          FROM merged
        ),
        lags AS (
          SELECT (epoch_us(ts) - click_us) / 1e6 AS lag_s
          FROM carried WHERE is_left = 1 AND click_us IS NOT NULL
        )
        SELECT count(*) AS n_converted,
               {round_half_up_sql("quantile_cont(lag_s, 0.5)", 2)}
                 AS p50_lag_s,
               {round_half_up_sql("quantile_cont(lag_s, 0.9)", 2)}
                 AS p90_lag_s
        FROM lags
    """,
    "local_peaks_daily": f"""
        WITH daily AS ({_DAILY_SQL}),
        m AS (SELECT avg(rev) AS mu FROM daily),
        nbr AS (
          SELECT day, rev,
                 lag(rev) OVER (ORDER BY day) AS prev,
                 lead(rev) OVER (ORDER BY day) AS nxt
          FROM daily
        )
        SELECT day,
               round(rev, 2) AS rev,
               round(rev / mu, 4) AS vs_mean
        FROM nbr CROSS JOIN m
        WHERE rev > prev AND rev > nxt AND rev > {_PEAK_FACTOR} * mu
    """,
    "bollinger_breaches": f"""
        WITH daily AS ({_DAILY_SQL}),
        banded AS (
          SELECT day, rev,
                 avg(rev) OVER w AS mu,
                 stddev_samp(rev) OVER w AS sd,
                 count(rev) OVER w AS n_priors
          FROM daily
          WINDOW w AS (ORDER BY day
                       ROWS BETWEEN {_BOLL_WIN} PRECEDING AND 1 PRECEDING)
        )
        SELECT day,
               round(rev, 2) AS rev,
               {round_half_up_sql(f"(mu + {_BOLL_K} * sd)", 2)} AS upper,
               {round_half_up_sql(f"(mu - {_BOLL_K} * sd)", 2)} AS lower,
               CASE WHEN rev > mu + {_BOLL_K} * sd THEN 'high'
                    ELSE 'low' END AS direction
        FROM banded
        WHERE n_priors >= {_BOLL_MIN_PRIORS}
          AND (rev > mu + {_BOLL_K} * sd OR rev < mu - {_BOLL_K} * sd)
    """,
}
