"""Pipeline wave 50 (round 5, forty-eighth wave): distributional
treatment effects and grouped regression.

- ``quantile_treatment_effects`` — QTE at the 9 deciles: the
  treated-vs-control gap of the purchase-value distribution
  (treatment = first-event-is-signup cohort, same cohort the DiD
  wave certifies), computed with exact interpolated percentiles per
  arm. Mean effects (``diff_in_diff``) can hide heterogeneity; the
  decile profile is the standard distributional readout.
- ``grouped_ols_elasticity`` — per-brand log-log OLS of quantity on
  unit price: slope = cov(ln p, ln q)/var(ln p) and R² per brand in
  ONE grouped aggregate pass (the closed-form sufficient statistics;
  no per-group iteration) — how grouped regression actually runs at
  scale: 10⁶ groups cost one shuffle, not 10⁶ model fits.

The reference has no joins or covariance aggregates
(``/root/reference/ROADMAP.md``).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from datafusion_archive_spark.operators.quantiles import exact_grouped_quantiles
from datafusion_archive_spark.operators.util import cached
from datafusion_archive_spark.queries.timeseries import load_events

_QS = [i / 10.0 for i in range(1, 10)]


def q_quantile_treatment_effects(spark, sf):
    """Decile-wise treated-minus-control purchase value gaps.

    Scale: the per-arm deciles come from the grouped histogram-pruned
    search (operators/quantiles — round 7: TWO groups over the
    purchase stream is the worst case for the grouped ``percentile``
    aggregate, which buffers half the facts in each finalizing
    task). The cached purchase projection keeps the treated-flag
    join from re-running per search pass."""
    ev = load_events(spark, sf)
    w_first = Window.partitionBy("user_id").orderBy("ts", "event_id")
    treated = (
        ev.select(
            "user_id",
            "event_type",
            F.row_number().over(w_first).alias("rn"),
        )
        .filter((F.col("rn") == 1) & (F.col("event_type") == "signup"))
        .select("user_id")
        .withColumn("treat", F.lit(1))
    )
    purchases = cached(
        ev.filter(F.col("event_type") == "purchase")
        .join(F.broadcast(treated), "user_id", "left")
        .select(
            F.coalesce("treat", F.lit(0)).alias("treat"),
            F.col("value").alias("y"),
        )
    )
    qs = exact_grouped_quantiles(purchases, "treat", "y", _QS)
    # an absent arm (tiny SF with no signups/purchases) yields the
    # empty report, matching the old inner join of the two arms
    rows = (
        [(q, qs[1][i], qs[0][i]) for i, q in enumerate(_QS)]
        if 0 in qs and 1 in qs
        else []
    )
    arms = spark.createDataFrame(
        rows, "quantile double, t double, c double"
    )
    return arms.select(
        "quantile",
        F.round("t", 4).alias("treated_q"),
        F.round("c", 4).alias("control_q"),
        F.round(F.col("t") - F.col("c"), 4).alias("qte"),
    ).orderBy("quantile")


def q_grouped_ols_elasticity(spark, sf):
    """Per-brand price elasticity of quantity (log-log OLS)."""
    li = spark.read.parquet(f"{sf}/lineitem.parquet")
    part = spark.read.parquet(f"{sf}/part.parquet")
    obs = li.join(
        F.broadcast(part.select("p_partkey", "p_brand")),
        li.l_partkey == F.col("p_partkey"),
    ).select(
        "p_brand",
        F.log(
            F.col("l_extendedprice").cast("double")
            / F.col("l_quantity").cast("double")
        ).alias("lx"),
        F.log(F.col("l_quantity").cast("double")).alias("ly"),
    )
    return (
        obs.groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(
                F.covar_samp("lx", "ly") / F.var_samp("lx"), 6
            ).alias("elasticity"),
            F.round(
                F.covar_samp("lx", "ly")
                * F.covar_samp("lx", "ly")
                / (F.var_samp("lx") * F.var_samp("ly")),
                6,
            ).alias("r2"),
        )
        .orderBy("p_brand")
    )


QUERIES = {
    "quantile_treatment_effects": q_quantile_treatment_effects,
    "grouped_ols_elasticity": q_grouped_ols_elasticity,
}

ORACLES = {
    "quantile_treatment_effects": f"""
        WITH firsts AS (
          SELECT user_id, event_type,
                 row_number() OVER (PARTITION BY user_id
                   ORDER BY ts, event_id) AS rn
          FROM events
        ),
        treated AS (
          SELECT user_id FROM firsts
          WHERE rn = 1 AND event_type = 'signup'
        ),
        purchases AS (
          SELECT CASE WHEN t.user_id IS NULL THEN 0 ELSE 1 END AS treat,
                 e.value AS y
          FROM events e LEFT JOIN treated t ON e.user_id = t.user_id
          WHERE e.event_type = 'purchase'
        ),
        lists AS (
          SELECT treat,
                 quantile_cont(y, [{", ".join(str(q) for q in _QS)}])
                   AS vs
          FROM purchases GROUP BY 1
        ),
        arms AS (
          SELECT l.treat, r.iq AS iq, l.vs[r.iq] AS v
          FROM lists l, range(1, 10) r(iq)
        )
        SELECT t.iq / 10.0 AS quantile,
               round(t.v, 4) AS treated_q,
               round(c.v, 4) AS control_q,
               round(t.v - c.v, 4) AS qte
        FROM arms t JOIN arms c ON t.iq = c.iq
        WHERE t.treat = 1 AND c.treat = 0
        ORDER BY quantile
    """,
    "grouped_ols_elasticity": """
        WITH obs AS (
          SELECT p.p_brand,
                 ln(CAST(l.l_extendedprice AS DOUBLE) / l.l_quantity)
                   AS lx,
                 ln(CAST(l.l_quantity AS DOUBLE)) AS ly
          FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        )
        SELECT p_brand,
               count(*) AS n,
               round(covar_samp(lx, ly) / var_samp(lx), 6)
                 AS elasticity,
               round(covar_samp(lx, ly) * covar_samp(lx, ly)
                 / (var_samp(lx) * var_samp(ly)), 6) AS r2
        FROM obs
        GROUP BY 1
        ORDER BY 1
    """,
}
