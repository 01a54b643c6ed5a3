"""Pipeline wave 58 (round 5, fifty-sixth wave): serial-correlation
diagnostics and lead-lag discovery.

- ``ar1_durbin_watson`` — detrend daily revenue with the closed-form
  OLS line, then the two standard serial-correlation readouts on the
  residuals: the Durbin–Watson statistic Σ(e_t−e_{t−1})²/Σe_t²
  (≈2(1−ρ)) and the AR(1) coefficient φ̂ = Σe_te_{t−1}/Σe²_{t−1}.
  The regression-residual autocorrelation check that decides whether
  OLS standard errors (``regression_aggs``) can be trusted.
- ``ccf_leadlag`` — the cross-correlation function between daily
  order count and daily average order value at lags −_MAX_LAG..+
  _MAX_LAG: one join of the day grid against itself shifted by each
  lag (a 15-row lag grid broadcast against the aggregated days —
  never the fact table), corr per lag. ACF (``acf_daily_counts``)
  finds self-structure; CCF finds which series LEADS.

The reference has no window functions (``/root/reference/ROADMAP.md``).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

_MAX_LAG = 7


def _daily(spark, sf):
    return (
        spark.read.parquet(f"{sf}/orders.parquet")
        .groupBy(F.col("o_orderdate").alias("d"))
        .agg(
            F.count(F.lit(1)).cast("double").alias("x"),
            F.avg(F.col("o_totalprice").cast("double")).alias("y"),
        )
    )


def q_ar1_durbin_watson(spark, sf):
    """DW + AR(1) on linear-detrended daily revenue."""
    daily = (
        spark.read.parquet(f"{sf}/orders.parquet")
        .groupBy(F.col("o_orderdate").alias("d"))
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("y")
        )
    )
    seq = daily.select(
        "d",
        "y",
        (F.row_number().over(Window.orderBy("d")) - 1)
        .cast("double")
        .alias("t"),
    )
    w_all = Window.partitionBy()
    fit = seq.select(
        "d",
        "y",
        "t",
        (
            F.covar_samp("t", "y").over(w_all)
            / F.var_samp("t").over(w_all)
        ).alias("b"),
        F.avg("y").over(w_all).alias("my"),
        F.avg("t").over(w_all).alias("mt"),
    ).select(
        "d",
        (
            F.col("y")
            - (F.col("my") + F.col("b") * (F.col("t") - F.col("mt")))
        ).alias("e"),
        F.col("b").alias("slope"),
    )
    w_ord = Window.orderBy("d")
    lagged = fit.select(
        "e", "slope", F.lag("e").over(w_ord).alias("ep")
    )
    return lagged.agg(
        F.count(F.lit(1)).alias("n_days"),
        F.round(F.first("slope"), 4).alias("trend_slope"),
        F.round(
            F.sum(
                F.pow(F.col("e") - F.col("ep"), F.lit(2.0))
            )
            / F.sum(F.col("e") * F.col("e")),
            6,
        ).alias("durbin_watson"),
        F.round(
            F.sum(F.col("e") * F.col("ep"))
            / F.sum(F.col("ep") * F.col("ep")),
            6,
        ).alias("phi_ar1"),
    )


def q_ccf_leadlag(spark, sf):
    """CCF(order count, avg value) at lags -7..7."""
    daily = _daily(spark, sf)
    lags = spark.range(-_MAX_LAG, _MAX_LAG + 1).select(
        F.col("id").cast("int").alias("lag")
    )
    a = daily.select(F.col("d").alias("da"), F.col("x").alias("xa"))
    b = daily.select(F.col("d").alias("db"), F.col("y").alias("yb"))
    pairs = (
        a.crossJoin(F.broadcast(lags))
        .join(
            b,
            F.col("db") == F.date_add(F.col("da"), F.col("lag")),
        )
    )
    return (
        pairs.groupBy("lag")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.round(F.corr("xa", "yb"), 6).alias("ccf"),
        )
        .orderBy("lag")
    )


QUERIES = {
    "ar1_durbin_watson": q_ar1_durbin_watson,
    "ccf_leadlag": q_ccf_leadlag,
}

ORACLES = {
    "ar1_durbin_watson": """
        WITH daily AS (
          SELECT o_orderdate AS d,
                 CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
                      AS DOUBLE) AS y
          FROM orders GROUP BY 1
        ),
        seq AS (
          SELECT d, y,
                 CAST(row_number() OVER (ORDER BY d) - 1 AS DOUBLE)
                   AS t
          FROM daily
        ),
        fit AS (
          SELECT d,
                 y - (avg(y) OVER ()
                   + (covar_samp(t, y) OVER () / var_samp(t) OVER ())
                     * (t - avg(t) OVER ())) AS e,
                 covar_samp(t, y) OVER () / var_samp(t) OVER ()
                   AS slope
          FROM seq
        ),
        lagged AS (
          SELECT e, slope, lag(e) OVER (ORDER BY d) AS ep FROM fit
        )
        SELECT count(*) AS n_days,
               round(max(slope), 4) AS trend_slope,
               round(sum((e - ep) ** 2) / sum(e * e), 6)
                 AS durbin_watson,
               round(sum(e * ep) / sum(ep * ep), 6) AS phi_ar1
        FROM lagged
    """,
    "ccf_leadlag": f"""
        WITH daily AS (
          SELECT o_orderdate AS d,
                 CAST(count(*) AS DOUBLE) AS x,
                 avg(CAST(o_totalprice AS DOUBLE)) AS y
          FROM orders GROUP BY 1
        ),
        lags AS (
          SELECT unnest(range(-{_MAX_LAG}, {_MAX_LAG} + 1)) AS lag
        ),
        pairs AS (
          SELECT l.lag, a.x AS xa, b.y AS yb
          FROM daily a
          CROSS JOIN lags l
          JOIN daily b ON b.d = a.d + to_days(CAST(l.lag AS INTEGER))
        )
        SELECT CAST(lag AS INTEGER) AS lag,
               count(*) AS n_pairs,
               round(corr(xa, yb), 6) AS ccf
        FROM pairs
        GROUP BY 1
        ORDER BY 1
    """,
}
