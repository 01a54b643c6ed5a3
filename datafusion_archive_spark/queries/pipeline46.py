"""Pipeline wave 46 (round 5, forty-fourth wave): spectral analysis
and a nonparametric randomness test on the daily revenue series.

- ``periodogram_dft`` — the discrete-Fourier periodogram at integer
  frequencies k = 1.._MAX_K: P(k) = (Σ y·cos(2πkt/n))² +
  (Σ y·sin(2πkt/n))², reported for the top-_TOP_K frequencies with
  the implied period n/k in days (power reported at 0.1 precision —
  cross-engine float-summation drift over thousands of mean-centered
  terms is ~1e-5 relative, so fine rounding would be false
  precision). The whole transform is one
  cross join of the (mean-centered) day grid against the frequency
  grid followed by a trig aggregate — ~n·K rows, all codegen'd
  JVM trig, no FFT library; complements the lag-domain
  ``acf_daily_counts``.
- ``runs_test_random`` — the Wald–Wolfowitz runs test on the
  above/below-median sign sequence: observed runs R vs
  μ = 2n₁n₂/n + 1, σ² = (μ−1)(μ−2)/(n−1), z = (R−μ)/σ. A pure
  lag-window computation; the classic screen for residual serial
  structure that a mean/variance summary cannot see.

The reference has no trig functions or windows
(``/root/reference/ROADMAP.md``).
"""

from __future__ import annotations

import math

from pyspark.sql import Window
from pyspark.sql import functions as F

_MAX_K = 120
_TOP_K = 5


def _daily(spark, sf):
    return (
        spark.read.parquet(f"{sf}/orders.parquet")
        .groupBy(F.col("o_orderdate").alias("d"))
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("rev")
        )
    )


def q_periodogram_dft(spark, sf):
    """Top-5 spectral peaks of mean-centered daily revenue."""
    w_all = Window.partitionBy()
    daily = _daily(spark, sf).select(
        (F.row_number().over(Window.orderBy("d")) - 1).alias("t"),
        (F.col("rev") - F.avg("rev").over(w_all)).alias("y"),
        F.count(F.lit(1)).over(w_all).alias("n"),
    )
    ks = spark.range(1, _MAX_K + 1).select(F.col("id").alias("k"))
    two_pi = 2.0 * math.pi
    terms = daily.crossJoin(F.broadcast(ks)).select(
        "k",
        "n",
        (
            F.col("y")
            * F.cos(
                F.lit(two_pi)
                * F.col("k")
                * F.col("t")
                / F.col("n").cast("double")
            )
        ).alias("c"),
        (
            F.col("y")
            * F.sin(
                F.lit(two_pi)
                * F.col("k")
                * F.col("t")
                / F.col("n").cast("double")
            )
        ).alias("s"),
    )
    power = terms.groupBy("k").agg(
        F.first("n").alias("n"),
        (
            F.pow(F.sum("c"), F.lit(2.0))
            + F.pow(F.sum("s"), F.lit(2.0))
        ).alias("p"),
    )
    return (
        power.select(
            "k",
            F.round(F.col("n").cast("double") / F.col("k"), 2).alias(
                "period_days"
            ),
            F.round(F.col("p") / 1.0e12, 1).alias("power_e12"),
        )
        .orderBy(F.desc("power_e12"), "k")
        .limit(_TOP_K)
    )


def q_runs_test_random(spark, sf):
    """Wald–Wolfowitz runs test vs the median revenue level."""
    w_all = Window.partitionBy()
    daily = _daily(spark, sf).select(
        "d",
        "rev",
        F.percentile("rev", F.lit(0.5)).over(w_all).alias("med"),
    ).filter(F.col("rev") != F.col("med"))
    signed = daily.select(
        "d", (F.col("rev") > F.col("med")).cast("int").alias("sgn")
    )
    w_ord = Window.orderBy("d")
    runs = signed.select(
        "sgn",
        F.when(
            F.lag("sgn").over(w_ord).isNull()
            | (F.lag("sgn").over(w_ord) != F.col("sgn")),
            1,
        )
        .otherwise(0)
        .alias("new_run"),
    )
    agg = runs.agg(
        F.sum("new_run").alias("r"),
        F.sum("sgn").alias("n1"),
        F.sum(F.lit(1) - F.col("sgn")).alias("n2"),
    )
    n1 = F.col("n1").cast("double")
    n2 = F.col("n2").cast("double")
    n = n1 + n2
    mu = 2.0 * n1 * n2 / n + 1.0
    var = (mu - 1.0) * (mu - 2.0) / (n - 1.0)
    return agg.select(
        F.col("r").alias("n_runs"),
        "n1",
        "n2",
        F.round(mu, 4).alias("mu_runs"),
        F.round((F.col("r").cast("double") - mu) / F.sqrt(var), 6).alias(
            "z_runs"
        ),
    )


QUERIES = {
    "periodogram_dft": q_periodogram_dft,
    "runs_test_random": q_runs_test_random,
}

_DAILY_SQL = """
          SELECT o_orderdate AS d,
                 CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                   AS rev
          FROM orders GROUP BY 1
"""

ORACLES = {
    "periodogram_dft": f"""
        WITH daily AS ({_DAILY_SQL}),
        grid AS (
          SELECT row_number() OVER (ORDER BY d) - 1 AS t,
                 rev - avg(rev) OVER () AS y,
                 count(*) OVER () AS n
          FROM daily
        ),
        ks AS (SELECT unnest(range(1, {_MAX_K} + 1)) AS k),
        power AS (
          SELECT k, max(n) AS n,
                 sum(y * cos(2 * pi() * k * t / n)) ** 2
                 + sum(y * sin(2 * pi() * k * t / n)) ** 2 AS p
          FROM grid CROSS JOIN ks
          GROUP BY k
        )
        SELECT CAST(k AS BIGINT) AS k,
               round(CAST(n AS DOUBLE) / k, 2) AS period_days,
               round(p / 1.0e12, 1) AS power_e12
        FROM power
        ORDER BY power_e12 DESC, k
        LIMIT {_TOP_K}
    """,
    "runs_test_random": f"""
        WITH daily AS ({_DAILY_SQL}),
        med AS (
          SELECT d, rev, quantile_cont(rev, 0.5) OVER () AS med
          FROM daily
        ),
        signed AS (
          SELECT d, CASE WHEN rev > med THEN 1 ELSE 0 END AS sgn
          FROM med WHERE rev != med
        ),
        runs AS (
          SELECT sgn,
                 CASE WHEN lag(sgn) OVER (ORDER BY d) IS NULL
                        OR lag(sgn) OVER (ORDER BY d) != sgn
                      THEN 1 ELSE 0 END AS new_run
          FROM signed
        ),
        agg AS (
          SELECT CAST(sum(new_run) AS BIGINT) AS r,
                 CAST(sum(sgn) AS BIGINT) AS n1,
                 CAST(sum(1 - sgn) AS BIGINT) AS n2
          FROM runs
        )
        SELECT r AS n_runs, n1, n2,
               round(2.0 * n1 * n2 / (n1 + n2) + 1.0, 4) AS mu_runs,
               round((r - (2.0 * n1 * n2 / (n1 + n2) + 1.0))
                 / sqrt((2.0 * n1 * n2 / (n1 + n2))
                   * (2.0 * n1 * n2 / (n1 + n2) - 1.0)
                   / (n1 + n2 - 1.0)), 6) AS z_runs
        FROM agg
    """,
}
