"""Pipeline wave 32 (round 5, thirtieth wave): forecasting backtests
and active-user engagement ratios.

- ``double_smoothing_forecast`` — Brown's double exponential
  smoothing over daily revenue with bounded 14-day kernels
  (forecast₊₁ = 2·S₁ − S₂, trend-aware), backtested one-step-ahead:
  per-day forecast vs actual plus the overall MAE/MAPE row would be
  derivable — here the per-day table (the artifact a forecasting
  job materializes). Finite kernels make the recursion a band
  self-join: no sequential state, identical in any engine.
- ``active_users_stickiness`` — per day: DAU, trailing-7-day WAU,
  trailing-28-day MAU, and the DAU/MAU stickiness ratio — the
  engagement dashboard staple, computed EXACTLY from the (user, day)
  activity grid with band joins (never approximate sliding
  distincts).

The reference has no windows or date arithmetic
(``/root/reference/ROADMAP.md``).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from datafusion_archive_spark.functions.rounding import (
    decimal_sum,
    decimal_sum_sql,
)
from datafusion_archive_spark.queries.timeseries import load_events
from datafusion_archive_spark.operators.util import cached, load_table


def _t(spark, sf_dir, name):
    return load_table(spark, sf_dir, name)


_DS_ALPHA = 0.3
_DS_SPAN = 14
_DS_EPOCH = "1992-01-01"


def q_double_smoothing_forecast(spark, sf):
    """One-step-ahead Brown double-smoothing backtest on daily
    revenue: S₁ = EWMA(x), S₂ = EWMA(S₁) (both bounded 14-day
    kernels), forecast for day t uses S₁/S₂ up to t−1:
    f_t = 2·S₁(t−1) − S₂(t−1). Output per day (where a forecast
    exists): actual, forecast, abs error.

    Scale: the day grid is the whole working set; each smoothing pass
    is an EXPLODE-TO-EQUI-JOIN band kernel — every source day fans
    out to the ≤14 target days it contributes to (map-side, bounded
    14×|days|), and the weighted fold is a hash aggregate on the
    target day. No non-equi join anywhere, so the plan is hash
    joins/aggregates instead of the nested-loop/cartesian a range
    self-join degenerates to (the round-7 no-cartesian window guard
    caught exactly that)."""
    o = _t(spark, sf, "orders")
    daily = o.groupBy(
        F.datediff(
            F.to_date("o_orderdate"), F.lit(_DS_EPOCH).cast("date")
        ).alias("day")
    ).agg(decimal_sum(F.col("o_totalprice")).cast("double").alias("rev"))
    # cached: the day grid feeds both smoothing kernels, the grid
    # filter, and the backtest join — uncached, the fact rollup
    # re-runs per branch
    daily = cached(daily)

    def ewma(src, valcol: str, out: str):
        """Bounded-kernel EWMA: source day j contributes weight
        (1-α)^(t-j) to every target day t in [j, j+span); the fold
        normalizes by the weights of the days actually present."""
        contrib = src.select(
            F.col("day").alias("sday"), F.col(valcol).alias("v")
        ).select(
            F.explode(
                F.sequence(F.col("sday"), F.col("sday") + _DS_SPAN - 1)
            ).alias("day"),
            "sday",
            "v",
        )
        w = F.pow(F.lit(1.0 - _DS_ALPHA), F.col("day") - F.col("sday"))
        return contrib.groupBy("day").agg(
            (F.sum(w * F.col("v")) / F.sum(w)).alias(out)
        )

    # the fan-out also creates phantom target days absent from the
    # grid (gaps); S₁ must be restricted to REAL days before S₂
    # smooths it, or the phantom partial windows would leak into S₂
    s1 = ewma(daily, "rev", "s1").join(daily.select("day"), "day")
    s1 = cached(s1)
    s2 = ewma(s1, "s1", "s2")
    state = s1.join(s2, "day").select(
        (F.col("day") + 1).alias("day"),
        (2 * F.col("s1") - F.col("s2")).alias("forecast"),
    )
    return daily.join(state, "day").select(
        "day",
        F.round("rev", 2).alias("actual"),
        F.round("forecast", 2).alias("forecast"),
        F.round(F.abs(F.col("rev") - F.col("forecast")), 2).alias(
            "abs_err"
        ),
    )


_AU_EPOCH = "2024-01-01"


def q_active_users_stickiness(spark, sf):
    """Per activity day: DAU, trailing-7d WAU, trailing-28d MAU, and
    DAU/MAU stickiness — exact sliding distinct counts from the
    (user, day) activity grid.

    Scale: events collapse to distinct (user, day) first; each
    trailing-distinct is a band join of the day grid against the
    activity grid counting users whose activity day falls in the
    window — linear in |activity| × window/grid-step, the standard
    exact formulation (sketch variants are the documented approx
    path)."""
    e = load_events(spark, sf)
    act = e.select(
        "user_id",
        F.datediff(
            F.to_date("ts"), F.lit(_AU_EPOCH).cast("date")
        ).alias("day"),
    ).distinct()
    # cached: the activity grid feeds the day list, both trailing
    # band joins, and the DAU rollup
    act = cached(act)
    days = act.select("day").distinct()

    def trailing(width, name):
        a = act.alias("a")
        d = days.alias("d")
        return (
            d.join(
                a,
                (F.col("a.day") <= F.col("d.day"))
                & (F.col("a.day") > F.col("d.day") - width),
            )
            .groupBy(F.col("d.day").alias("day"))
            .agg(F.count_distinct("a.user_id").alias(name))
        )

    dau = act.groupBy("day").agg(F.count_distinct("user_id").alias("dau"))
    wau = trailing(7, "wau")
    mau = trailing(28, "mau")
    return (
        dau.join(wau, "day")
        .join(mau, "day")
        .select(
            "day",
            "dau",
            "wau",
            "mau",
            F.round(F.col("dau") / F.col("mau"), 6).alias("stickiness"),
        )
    )


QUERIES = {
    "double_smoothing_forecast": q_double_smoothing_forecast,
    "active_users_stickiness": q_active_users_stickiness,
}

ORACLES = {
    "double_smoothing_forecast": f"""
        WITH daily AS (
          SELECT date_diff('day', DATE '{_DS_EPOCH}',
                           CAST(o_orderdate AS DATE)) AS day,
                 CAST({decimal_sum_sql("o_totalprice")} AS DOUBLE) AS rev
          FROM orders GROUP BY 1
        ),
        s1 AS (
          SELECT d1.day,
                 sum(power({1.0 - _DS_ALPHA}, d1.day - d2.day) * d2.rev)
                 / sum(power({1.0 - _DS_ALPHA}, d1.day - d2.day)) AS s1
          FROM daily d1 JOIN daily d2
            ON d2.day <= d1.day AND d2.day > d1.day - {_DS_SPAN}
          GROUP BY d1.day
        ),
        s2 AS (
          SELECT e1.day,
                 sum(power({1.0 - _DS_ALPHA}, e1.day - e2.day) * e2.s1)
                 / sum(power({1.0 - _DS_ALPHA}, e1.day - e2.day)) AS s2
          FROM s1 e1 JOIN s1 e2
            ON e2.day <= e1.day AND e2.day > e1.day - {_DS_SPAN}
          GROUP BY e1.day
        ),
        state AS (
          SELECT s1.day + 1 AS day, 2 * s1.s1 - s2.s2 AS forecast
          FROM s1 JOIN s2 USING (day)
        )
        SELECT d.day, round(d.rev, 2) AS actual,
               round(st.forecast, 2) AS forecast,
               round(abs(d.rev - st.forecast), 2) AS abs_err
        FROM daily d JOIN state st USING (day)
    """,
    "active_users_stickiness": f"""
        WITH act AS (
          SELECT DISTINCT user_id,
                 date_diff('day', DATE '{_AU_EPOCH}', CAST(ts AS DATE))
                   AS day
          FROM events
        ),
        days AS (SELECT DISTINCT day FROM act),
        dau AS (
          SELECT day, count(DISTINCT user_id) AS dau FROM act GROUP BY 1
        ),
        wau AS (
          SELECT d.day, count(DISTINCT a.user_id) AS wau
          FROM days d JOIN act a
            ON a.day <= d.day AND a.day > d.day - 7
          GROUP BY d.day
        ),
        mau AS (
          SELECT d.day, count(DISTINCT a.user_id) AS mau
          FROM days d JOIN act a
            ON a.day <= d.day AND a.day > d.day - 28
          GROUP BY d.day
        )
        SELECT day, dau, wau, mau,
               round(dau / CAST(mau AS DOUBLE), 6) AS stickiness
        FROM dau JOIN wau USING (day) JOIN mau USING (day)
    """,
}
