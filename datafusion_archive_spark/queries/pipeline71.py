"""Pipeline wave 71 (round 5, sixty-ninth wave): sequential drift
detection and moment-based normality testing.

- ``page_hinkley_drift`` — the Page–Hinkley sequential drift
  detector replayed over the daily-revenue return series:
  m_t = Σ_{i≤t}(x_i − x̄_i − δ) with x̄_i the RUNNING mean, the
  detector statistic PH_t = m_t − min_{i≤t} m_i, the alarm day
  (first PH_t > λ, if any) and the max excursion. Every piece is a
  cumulative window — the batch twin of the streaming drift monitor
  (CUSUM's one-sided cousin, robust to slow mean creep).
- ``jarque_bera_normality`` — JB = n/6·(S² + K²/4) from exact
  skewness and excess kurtosis of daily returns, with the two-sided
  p-value via the χ²₂ closed form exp(−JB/2). The moments screen
  that justifies (or vetoes) every z-based test in the suite.

The reference has no window functions (``/root/reference/ROADMAP.md``).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

_PH_DELTA = 0.001
_PH_LAMBDA = 0.25


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
        "d", (F.col("y") / F.lag("y").over(w) - 1.0).alias("x")
    ).filter(F.col("x").isNotNull())


def q_page_hinkley_drift(spark, sf):
    """Page–Hinkley replay: alarm day, max excursion."""
    rets = _returns(spark, sf)
    w_run = Window.orderBy("d").rowsBetween(
        Window.unboundedPreceding, 0
    )
    with_mean = rets.select(
        "d",
        "x",
        F.avg("x").over(w_run).alias("rmean"),
    )
    m = with_mean.select(
        "d",
        F.sum(
            F.col("x") - F.col("rmean") - F.lit(_PH_DELTA)
        )
        .over(w_run)
        .alias("m_t"),
    )
    ph = m.select(
        "d",
        (F.col("m_t") - F.min("m_t").over(w_run)).alias("ph_t"),
    )
    w_all = Window.partitionBy()
    flagged = ph.select(
        "d",
        "ph_t",
        F.min(
            F.when(F.col("ph_t") > _PH_LAMBDA, F.col("d"))
        )
        .over(w_all)
        .alias("alarm_d"),
    )
    return flagged.agg(
        F.count(F.lit(1)).alias("n_days"),
        F.round(F.max("ph_t"), 6).alias("max_ph"),
        F.sum(
            (F.col("ph_t") > _PH_LAMBDA).cast("long")
        ).alias("n_days_over"),
        F.first("alarm_d").alias("first_alarm_day"),
    )


def q_jarque_bera_normality(spark, sf):
    """JB statistic + chi2_2 p-value on daily returns."""
    # explicit central moments: Spark's skewness/kurtosis builtins
    # use g1/g2 while DuckDB's apply sample bias corrections — raw
    # moment sums are the only formulation identical in both engines
    rets = _returns(spark, sf)
    w_all = Window.partitionBy()
    centered = rets.select(
        (F.col("x") - F.avg("x").over(w_all)).alias("c")
    )
    moments = centered.agg(
        F.count(F.lit(1)).alias("n"),
        F.avg(F.pow("c", F.lit(2.0))).alias("m2"),
        F.avg(F.pow("c", F.lit(3.0))).alias("m3"),
        F.avg(F.pow("c", F.lit(4.0))).alias("m4"),
    )
    agg = moments.select(
        "n",
        (F.col("m3") / F.pow("m2", F.lit(1.5))).alias("s"),
        (F.col("m4") / F.pow("m2", F.lit(2.0)) - 3.0).alias("k"),
    )
    jb = (
        agg.select(
            "n",
            "s",
            "k",
            (
                F.col("n").cast("double")
                / 6.0
                * (
                    F.col("s") * F.col("s")
                    + F.col("k") * F.col("k") / 4.0
                )
            ).alias("jb"),
        )
    )
    return jb.select(
        F.col("n").alias("n_days"),
        F.round("s", 6).alias("skewness"),
        F.round("k", 6).alias("excess_kurtosis"),
        F.round("jb", 4).alias("jb_stat"),
        F.round(F.exp(-F.col("jb") / 2.0), 8).alias("p_chi2_2"),
    )


QUERIES = {
    "page_hinkley_drift": q_page_hinkley_drift,
    "jarque_bera_normality": q_jarque_bera_normality,
}

_RET_SQL = """
        daily AS (
          SELECT o_orderdate AS d,
                 CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
                      AS DOUBLE) AS y
          FROM orders GROUP BY 1
        ),
        rets AS (
          SELECT d, y / lag(y) OVER (ORDER BY d) - 1.0 AS x
          FROM daily
          QUALIFY x IS NOT NULL
        )
"""

ORACLES = {
    "page_hinkley_drift": f"""
        WITH {_RET_SQL},
        wm AS (
          SELECT d, x,
                 avg(x) OVER (ORDER BY d
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS rmean
          FROM rets
        ),
        m AS (
          SELECT d,
                 sum(x - rmean - {_PH_DELTA}) OVER (ORDER BY d
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS m_t
          FROM wm
        ),
        ph AS (
          SELECT d,
                 m_t - min(m_t) OVER (ORDER BY d
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS ph_t
          FROM m
        )
        SELECT count(*) AS n_days,
               round(max(ph_t), 6) AS max_ph,
               CAST(sum(CASE WHEN ph_t > {_PH_LAMBDA}
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_days_over,
               min(CASE WHEN ph_t > {_PH_LAMBDA} THEN d END)
                 AS first_alarm_day
        FROM ph
    """,
    "jarque_bera_normality": f"""
        WITH {_RET_SQL},
        centered AS (
          SELECT x - avg(x) OVER () AS c FROM rets
        ),
        moments AS (
          SELECT count(*) AS n, avg(c ** 2) AS m2,
                 avg(c ** 3) AS m3, avg(c ** 4) AS m4
          FROM centered
        ),
        agg AS (
          SELECT n, m3 / m2 ** 1.5 AS s, m4 / m2 ** 2 - 3.0 AS k
          FROM moments
        )
        SELECT n AS n_days,
               round(s, 6) AS skewness,
               round(k, 6) AS excess_kurtosis,
               round(CAST(n AS DOUBLE) / 6.0
                 * (s * s + k * k / 4.0), 4) AS jb_stat,
               round(exp(-(CAST(n AS DOUBLE) / 6.0
                 * (s * s + k * k / 4.0)) / 2.0), 8) AS p_chi2_2
        FROM agg
    """,
}
