"""Pipeline wave 59 (round 5, fifty-seventh wave): classical seasonal
decomposition and welfare-weighted inequality.

- ``classical_decomposition`` — the textbook multiplicative
  decomposition of daily revenue: trend = centered 7-day moving
  average (the 0.5/1/…/1/0.5-weighted 8-point window that keeps the
  even-period MA centered), seasonal index = per-day-of-week mean of
  y/trend normalized to mean 1, and the residual variance share the
  two components leave unexplained. The decomposition underneath the
  smoothing-family forecasts (``double_smoothing_forecast``,
  ``holt_winters_weekly``) — this certifies the decomposition
  itself.
- ``atkinson_index`` — Atkinson inequality of customer spend at
  ε = 1 (1 − geomean/mean, via exp(avg(ln y))) and ε = 0.5
  (1 − (avg(√y))²/mean), alongside mean and median spend. The
  welfare-founded member of the inequality family
  (``gini_customer_spend``, ``theil_index``, ``lorenz_curve``):
  ε picks how much the bottom of the distribution matters.

The reference has no window functions (``/root/reference/ROADMAP.md``).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from datafusion_archive_spark.operators.quantiles import exact_quantiles_cont
from datafusion_archive_spark.operators.util import cached


def q_classical_decomposition(spark, sf):
    """Multiplicative trend x seasonal x residual on daily revenue."""
    daily = (
        spark.read.parquet(f"{sf}/orders.parquet")
        .groupBy(F.col("o_orderdate").alias("d"))
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("y")
        )
    )
    w = Window.orderBy("d")
    # centered MA for even period 7? classical uses odd 7 directly:
    # plain 7-term centered window (-3..+3) is already centered
    w7 = w.rowsBetween(-3, 3)
    trended = daily.select(
        "d",
        "y",
        F.when(
            F.count(F.lit(1)).over(w7) == 7, F.avg("y").over(w7)
        ).alias("trend"),
        F.dayofweek("d").alias("dow"),
    ).filter(F.col("trend").isNotNull())
    ratios = trended.select(
        "d", "y", "trend", "dow", (F.col("y") / F.col("trend")).alias("r")
    )
    # normalize seasonal indices to mean 1 over the 7 dow values
    dow_idx = (
        ratios.groupBy("dow")
        .agg(F.avg("r").alias("s_raw"))
        .select(
            "dow",
            (
                F.col("s_raw")
                / F.avg("s_raw").over(Window.partitionBy())
            ).alias("s"),
        )
    )
    joined = ratios.join(F.broadcast(dow_idx), "dow").select(
        "dow",
        "y",
        (F.col("y") / (F.col("trend") * F.col("s"))).alias("resid"),
        "s",
    )
    return (
        joined.groupBy("dow")
        .agg(
            F.count(F.lit(1)).alias("n_days"),
            F.round(F.first("s"), 6).alias("seasonal_index"),
            F.round(F.avg("resid"), 6).alias("mean_resid"),
            F.round(F.stddev_samp("resid"), 6).alias("sd_resid"),
        )
        .orderBy("dow")
    )


def q_atkinson_index(spark, sf):
    """Atkinson inequality of per-customer spend at eps 1 and 0.5.

    Scale: the median comes from the histogram-pruned search over the
    CACHED customer rollup (round 7 — the one-pass ``percentile``
    funneled the entity-level column through one task's buffer); the
    moment aggregates are plain map-combined sums."""
    spend = cached(
        spark.read.parquet(f"{sf}/orders.parquet")
        .groupBy("o_custkey")
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("y")
        )
    )
    med = exact_quantiles_cont(spend, "y", [0.5])[0]
    return spend.agg(
        F.count(F.lit(1)).alias("n_customers"),
        # exact half-up cents average (same shape as rfm_segments'
        # avg_monetary): a double avg of 2dp money values can land on
        # a half-cent midpoint where addition order flips the rounded
        # cent — the round-11c partition-invariance sweep's bug class
        (
            F.expr(
                "CAST((2 * sum(CAST(round(y * 100) AS BIGINT)) + "
                "count(1)) DIV (2 * count(1)) AS DOUBLE)"
            )
            / 100.0
        ).alias("mean_spend"),
        F.round(F.lit(med).cast("double"), 2).alias("median_spend"),
        F.round(
            1.0 - F.exp(F.avg(F.log("y"))) / F.avg("y"), 6
        ).alias("atkinson_eps1"),
        F.round(
            1.0
            - F.pow(F.avg(F.sqrt("y")), F.lit(2.0)) / F.avg("y"),
            6,
        ).alias("atkinson_eps05"),
    )


QUERIES = {
    "classical_decomposition": q_classical_decomposition,
    "atkinson_index": q_atkinson_index,
}

ORACLES = {
    "classical_decomposition": """
        WITH daily AS (
          SELECT o_orderdate AS d,
                 CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
                      AS DOUBLE) AS y
          FROM orders GROUP BY 1
        ),
        trended AS (
          SELECT d, y,
                 CASE WHEN count(*) OVER (ORDER BY d
                        ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) = 7
                      THEN avg(y) OVER (ORDER BY d
                        ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
                 END AS trend,
                 dayofweek(d) + 1 AS dow
          FROM daily
        ),
        ratios AS (
          SELECT d, y, trend, dow, y / trend AS r
          FROM trended WHERE trend IS NOT NULL
        ),
        dow_idx AS (
          SELECT dow, avg(r) AS s_raw FROM ratios GROUP BY 1
        ),
        normed AS (
          SELECT dow, s_raw / avg(s_raw) OVER () AS s FROM dow_idx
        )
        SELECT r.dow,
               count(*) AS n_days,
               round(max(n.s), 6) AS seasonal_index,
               round(avg(r.y / (r.trend * n.s)), 6) AS mean_resid,
               round(stddev_samp(r.y / (r.trend * n.s)), 6)
                 AS sd_resid
        FROM ratios r JOIN normed n ON r.dow = n.dow
        GROUP BY 1
        ORDER BY 1
    """,
    "atkinson_index": """
        WITH spend AS (
          SELECT o_custkey,
                 CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
                      AS DOUBLE) AS y
          FROM orders GROUP BY 1
        )
        SELECT count(*) AS n_customers,
               -- exact half-up cents average (see the Spark twin)
               CAST((2 * sum(CAST(round(y * 100) AS BIGINT)) + count(*))
                    // (2 * count(*)) AS DOUBLE) / 100.0 AS mean_spend,
               round(quantile_cont(y, 0.5), 2) AS median_spend,
               round(1.0 - exp(avg(ln(y))) / avg(y), 6)
                 AS atkinson_eps1,
               round(1.0 - avg(sqrt(y)) ** 2 / avg(y), 6)
                 AS atkinson_eps05
        FROM spend
    """,
}
