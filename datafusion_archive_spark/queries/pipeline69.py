"""Pipeline wave 69 (round 5, sixty-seventh wave): downside-risk
measures on the daily revenue return series — the finance-risk
complement of the drawdown/Bollinger family.

Returns: r_t = y_t/y_{t−1} − 1 over daily revenue.

- ``var_expected_shortfall`` — historical VaR at 95% and 99% (the
  loss quantile of −r) and the corresponding expected shortfall
  (CVaR: mean loss BEYOND the VaR cut) — ES is the coherent measure
  regulators moved to precisely because VaR ignores how bad the
  tail is once crossed; both straight from exact percentiles +
  conditional means.
- ``sortino_downside_risk`` — mean return over downside deviation
  √(E[min(r,0)²]) (the Sortino denominator penalizes only losses,
  unlike the symmetric Sharpe), plus the gain/loss-day counts and
  the omega ratio Σgains/Σ|losses| at target 0.

The reference has no window functions (``/root/reference/ROADMAP.md``).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F


def _returns(spark, sf):
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
    return daily.select(
        (F.col("y") / F.lag("y").over(w) - 1.0).alias("r")
    ).filter(F.col("r").isNotNull())


def q_var_expected_shortfall(spark, sf):
    """Historical VaR and ES at 95% / 99% on daily returns."""
    rets = _returns(spark, sf)
    w_all = Window.partitionBy()
    with_var = rets.select(
        "r",
        F.percentile(-F.col("r"), F.lit(0.95)).over(w_all).alias(
            "var95"
        ),
        F.percentile(-F.col("r"), F.lit(0.99)).over(w_all).alias(
            "var99"
        ),
    )
    return with_var.agg(
        F.count(F.lit(1)).alias("n_days"),
        F.round(F.first("var95"), 6).alias("var_95"),
        F.round(
            F.avg(F.when(-F.col("r") >= F.col("var95"), -F.col("r"))),
            6,
        ).alias("es_95"),
        F.round(F.first("var99"), 6).alias("var_99"),
        F.round(
            F.avg(F.when(-F.col("r") >= F.col("var99"), -F.col("r"))),
            6,
        ).alias("es_99"),
    )


def q_sortino_downside_risk(spark, sf):
    """Sortino ratio, downside deviation, omega ratio at target 0."""
    rets = _returns(spark, sf)
    down = F.least(F.col("r"), F.lit(0.0))
    return rets.agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum((F.col("r") > 0).cast("long")).alias("n_gain_days"),
        F.sum((F.col("r") < 0).cast("long")).alias("n_loss_days"),
        F.round(F.avg("r"), 6).alias("mean_return"),
        F.round(
            F.sqrt(F.avg(down * down)), 6
        ).alias("downside_dev"),
        F.round(
            F.avg("r") / F.sqrt(F.avg(down * down)), 6
        ).alias("sortino"),
        F.round(
            F.sum(F.when(F.col("r") > 0, F.col("r")).otherwise(0.0))
            / -F.sum(
                F.when(F.col("r") < 0, F.col("r")).otherwise(0.0)
            ),
            6,
        ).alias("omega"),
    )


QUERIES = {
    "var_expected_shortfall": q_var_expected_shortfall,
    "sortino_downside_risk": q_sortino_downside_risk,
}

_RET_SQL = """
        daily AS (
          SELECT o_orderdate AS d,
                 CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
                      AS DOUBLE) AS y
          FROM orders GROUP BY 1
        ),
        rets AS (
          SELECT y / lag(y) OVER (ORDER BY d) - 1.0 AS r
          FROM daily
          QUALIFY r IS NOT NULL
        )
"""

ORACLES = {
    "var_expected_shortfall": f"""
        WITH {_RET_SQL},
        v AS (
          SELECT quantile_cont(-r, 0.95) AS var95,
                 quantile_cont(-r, 0.99) AS var99
          FROM rets
        )
        SELECT count(*) AS n_days,
               round(max(v.var95), 6) AS var_95,
               round(avg(CASE WHEN -t.r >= v.var95 THEN -t.r END), 6)
                 AS es_95,
               round(max(v.var99), 6) AS var_99,
               round(avg(CASE WHEN -t.r >= v.var99 THEN -t.r END), 6)
                 AS es_99
        FROM rets t CROSS JOIN v
    """,
    "sortino_downside_risk": f"""
        WITH {_RET_SQL}
        SELECT count(*) AS n_days,
               CAST(sum(CASE WHEN r > 0 THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_gain_days,
               CAST(sum(CASE WHEN r < 0 THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_loss_days,
               round(avg(r), 6) AS mean_return,
               round(sqrt(avg(LEAST(r, 0.0) ** 2)), 6)
                 AS downside_dev,
               round(avg(r) / sqrt(avg(LEAST(r, 0.0) ** 2)), 6)
                 AS sortino,
               round(sum(CASE WHEN r > 0 THEN r ELSE 0.0 END)
                 / -sum(CASE WHEN r < 0 THEN r ELSE 0.0 END), 6)
                 AS omega
        FROM rets
    """,
}
