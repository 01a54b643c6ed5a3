"""Pipeline wave 49 (round 5, forty-seventh wave): empirical-Bayes
shrinkage and CUPED variance reduction — the two workhorses of
ranking-by-rate and experiment sensitivity.

- ``eb_shrinkage_rates`` — beta-binomial empirical Bayes: fit a Beta
  prior to per-customer urgent-order rates by method of moments
  (K = m(1−m)/v − 1, α = mK, β = (1−m)K, K floored at 1 — MoM can
  go negative when observed dispersion is below binomial noise),
  then rank customers by the shrunken rate (y+α)/(n+K). This is THE
  fix for "top-rated item has 1 review": small-n rates shrink hard
  toward the prior, large-n rates barely move (monotone-in-n
  property asserted in tests).
- ``cuped_adjustment`` — CUPED: θ = cov(y_pre, y_post)/var(y_pre)
  over per-user purchase values split mid-month, reporting θ and
  the variance-reduction percentage 100·ρ². One user-keyed
  conditional aggregate plus covariance algebra — the standard way
  to cut A/B-test sample sizes with pre-period data.

The reference has no aggregates beyond MIN/MAX
(``/root/reference/ROADMAP.md``).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from datafusion_archive_spark.queries.timeseries import load_events

_EB_TOP = 10
_SPLIT = "2024-01-16"


def q_eb_shrinkage_rates(spark, sf):
    """Top customers by EB-shrunken urgent rate."""
    per = (
        spark.read.parquet(f"{sf}/orders.parquet")
        .groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                (F.col("o_orderpriority") == "1-URGENT").cast("long")
            ).alias("y"),
        )
        .withColumn("r", F.col("y").cast("double") / F.col("n"))
    )
    # round 8: the global moments broadcast from a plain aggregate —
    # the unpartitioned window form funneled the per-customer frame
    # (corpus-growing) into one task to compute two scalars
    moments = per.agg(
        F.avg("r").alias("_m"), F.var_samp("r").alias("_v")
    )
    m, v = F.col("_m"), F.col("_v")
    k = F.greatest(m * (1.0 - m) / v - 1.0, F.lit(1.0))
    primed = per.join(F.broadcast(moments)).select(
        "o_custkey",
        "n",
        "y",
        "r",
        (m * k).alias("alpha"),
        k.alias("kk"),
    )
    ranked = primed.select(
        F.col("o_custkey").alias("custkey"),
        "n",
        F.round("r", 6).alias("raw_rate"),
        F.round(
            (F.col("y") + F.col("alpha")) / (F.col("n") + F.col("kk")),
            6,
        ).alias("shrunk_rate"),
    )
    return ranked.orderBy(
        F.desc("shrunk_rate"), F.col("custkey")
    ).limit(_EB_TOP)


def q_cuped_adjustment(spark, sf):
    """CUPED theta and variance-reduction % from pre-period values."""
    ev = load_events(spark, sf)
    per_user = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(
            F.sum(
                F.when(
                    F.col("ts") < F.lit(_SPLIT).cast("timestamp"),
                    F.col("value"),
                ).otherwise(0.0)
            ).alias("pre"),
            F.sum(
                F.when(
                    F.col("ts") >= F.lit(_SPLIT).cast("timestamp"),
                    F.col("value"),
                ).otherwise(0.0)
            ).alias("post"),
        )
    )
    agg = per_user.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.covar_samp("pre", "post").alias("cov"),
        F.var_samp("pre").alias("var_pre"),
        F.var_samp("post").alias("var_post"),
    )
    theta = F.col("cov") / F.col("var_pre")
    rho2 = (
        F.col("cov")
        * F.col("cov")
        / (F.col("var_pre") * F.col("var_post"))
    )
    return agg.select(
        "n_users",
        F.round(theta, 6).alias("theta"),
        F.round(F.col("var_post"), 2).alias("var_post"),
        F.round(F.col("var_post") * (1.0 - rho2), 2).alias("var_cuped"),
        F.round(100.0 * rho2, 4).alias("variance_reduction_pct"),
    )


QUERIES = {
    "eb_shrinkage_rates": q_eb_shrinkage_rates,
    "cuped_adjustment": q_cuped_adjustment,
}

ORACLES = {
    "eb_shrinkage_rates": f"""
        WITH per AS (
          SELECT o_custkey, count(*) AS n,
                 CAST(sum(CASE WHEN o_orderpriority = '1-URGENT'
                          THEN 1 ELSE 0 END) AS BIGINT) AS y
          FROM orders GROUP BY 1
        ),
        rates AS (
          SELECT *, CAST(y AS DOUBLE) / n AS r FROM per
        ),
        prior AS (
          SELECT avg(r) AS m,
                 GREATEST(avg(r) * (1.0 - avg(r)) / var_samp(r) - 1.0,
                          1.0) AS kk
          FROM rates
        )
        SELECT r.o_custkey AS custkey,
               r.n,
               round(r.r, 6) AS raw_rate,
               round((r.y + p.m * p.kk) / (r.n + p.kk), 6)
                 AS shrunk_rate
        FROM rates r CROSS JOIN prior p
        ORDER BY shrunk_rate DESC, custkey
        LIMIT {_EB_TOP}
    """,
    "cuped_adjustment": f"""
        WITH per_user AS (
          SELECT user_id,
                 sum(CASE WHEN ts < TIMESTAMP '{_SPLIT} 00:00:00'
                     THEN value ELSE 0.0 END) AS pre,
                 sum(CASE WHEN ts >= TIMESTAMP '{_SPLIT} 00:00:00'
                     THEN value ELSE 0.0 END) AS post
          FROM events
          WHERE event_type = 'purchase'
          GROUP BY 1
        )
        SELECT count(*) AS n_users,
               round(covar_samp(pre, post) / var_samp(pre), 6) AS theta,
               round(var_samp(post), 2) AS var_post,
               round(var_samp(post) * (1.0
                 - covar_samp(pre, post) ** 2
                   / (var_samp(pre) * var_samp(post))), 2) AS var_cuped,
               round(100.0 * covar_samp(pre, post) ** 2
                 / (var_samp(pre) * var_samp(post)), 4)
                 AS variance_reduction_pct
        FROM per_user
    """,
}
