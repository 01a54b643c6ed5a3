"""Pipeline wave 56 (round 5, fifty-fourth wave): offline policy
evaluation and extreme-value tail fitting.

- ``ips_policy_eval`` — counterfactual policy value by inverse
  propensity scoring over the logged event stream: arms are the
  props-key mod-3 buckets, logged propensities are the empirical arm
  shares, the target policy deterministically plays the best
  overall arm, and the estimate is IPS = E[r·1{a=π}/p̂(a)] plus its
  self-normalized variant SNIPS (the ratio form that kills
  propensity variance). The standard replay evaluation for "what
  would the greedy policy have earned" without running it.
- ``gpd_pot_fit`` — peaks-over-threshold: fit a generalized Pareto
  to order-value excesses over the p99 threshold by method of
  moments (ξ̂ = (1 − m²/v)/2, β̂ = m(1−ξ̂) — from
  var/mean² = 1/(1−2ξ)), and report the implied once-per-_RET_N
  -orders return level u + β/ξ((λN)^ξ − 1). The parametric tail
  complement of the nonparametric ``hill_tail_index``.

The reference has no aggregates beyond MIN/MAX
(``/root/reference/ROADMAP.md``).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from datafusion_archive_spark.queries.timeseries import load_events
from datafusion_archive_spark.operators.util import cached

_ARMS = 3
_RET_N = 100_000


def q_ips_policy_eval(spark, sf):
    """IPS + SNIPS value of the play-the-best-arm policy."""
    ev = load_events(spark, sf).filter(
        F.col("event_type") == "purchase"
    )
    logged = ev.select(
        (
            F.get_json_object("props", "$.k").cast("long") % _ARMS
        ).alias("a"),
        F.col("value").alias("r"),
    )
    w_all = Window.partitionBy()
    arms = logged.groupBy("a").agg(
        F.count(F.lit(1)).alias("n"), F.avg("r").alias("mr")
    )
    with_p = arms.select(
        "a",
        "mr",
        (F.col("n") / F.sum("n").over(w_all).cast("double")).alias(
            "p"
        ),
        F.row_number()
        .over(Window.orderBy(F.desc("mr"), F.col("a")))
        .alias("rk"),
    )
    best = with_p.filter(F.col("rk") == 1).select(
        F.col("a").alias("best_a"), F.col("p").alias("best_p")
    )
    scored = logged.crossJoin(F.broadcast(best)).select(
        "r",
        (F.col("a") == F.col("best_a")).cast("double").alias("hit"),
        "best_p",
    )
    return scored.agg(
        F.count(F.lit(1)).alias("n_events"),
        F.first("best_p").alias("behavior_share"),
        F.round(F.avg("r"), 4).alias("logged_value"),
        F.round(
            F.avg(F.col("r") * F.col("hit") / F.col("best_p")), 4
        ).alias("ips_value"),
        F.round(
            F.sum(F.col("r") * F.col("hit") / F.col("best_p"))
            / F.sum(F.col("hit") / F.col("best_p")),
            4,
        ).alias("snips_value"),
    ).select(
        "n_events",
        F.round("behavior_share", 6).alias("behavior_share"),
        "logged_value",
        "ips_value",
        "snips_value",
    )


def q_gpd_pot_fit(spark, sf):
    """GPD method-of-moments fit over p99 order-value excesses.

    Scale: the p99 threshold comes from the histogram-pruned exact
    quantile search (operators/quantiles.py) — the previous
    partition-less ``percentile().over()`` window funneled EVERY order
    value through one window partition; now the threshold and total
    are bounded driver scalars and the excess pass is a plain
    scan-side filter."""
    from datafusion_archive_spark.operators.quantiles import (
        exact_quantiles_cont,
    )

    orders = cached(
        spark.read.parquet(f"{sf}/orders.parquet").select(
            F.col("o_totalprice").cast("double").alias("v")
        )
    )
    n_total = orders.count()
    (u,) = exact_quantiles_cont(orders, "v", [0.99])
    exc = orders.filter(F.col("v") > u).select(
        (F.col("v") - F.lit(u)).alias("e")
    )
    agg = exc.agg(
        F.lit(u).alias("u"),
        F.lit(n_total).alias("n_total"),
        F.count(F.lit(1)).alias("n_exc"),
        F.avg("e").alias("m"),
        F.var_samp("e").alias("v"),
    )
    xi = (1.0 - F.col("m") * F.col("m") / F.col("v")) / 2.0
    beta = F.col("m") * (1.0 - xi)
    lam = F.col("n_exc").cast("double") / F.col("n_total")
    ret = F.col("u") + beta / xi * (
        F.pow(lam * F.lit(float(_RET_N)), xi) - 1.0
    )
    return agg.select(
        F.col("n_exc").alias("n_exceedances"),
        F.round("u", 2).alias("threshold_p99"),
        F.round(xi, 6).alias("xi_hat"),
        F.round(beta, 4).alias("beta_hat"),
        F.round(ret, 2).alias("return_level"),
    )


QUERIES = {
    "ips_policy_eval": q_ips_policy_eval,
    "gpd_pot_fit": q_gpd_pot_fit,
}

ORACLES = {
    "ips_policy_eval": f"""
        WITH logged AS (
          SELECT CAST(json_extract_string(props, '$.k') AS BIGINT)
                   % {_ARMS} AS a,
                 value AS r
          FROM events WHERE event_type = 'purchase'
        ),
        arms AS (
          SELECT a, count(*) AS n, avg(r) AS mr
          FROM logged GROUP BY 1
        ),
        with_p AS (
          SELECT a, mr,
                 CAST(n AS DOUBLE) / sum(n) OVER () AS p,
                 row_number() OVER (ORDER BY mr DESC, a) AS rk
          FROM arms
        ),
        best AS (
          SELECT a AS best_a, p AS best_p FROM with_p WHERE rk = 1
        ),
        scored AS (
          SELECT l.r,
                 CASE WHEN l.a = b.best_a THEN 1.0 ELSE 0.0 END
                   AS hit,
                 b.best_p
          FROM logged l CROSS JOIN best b
        )
        SELECT count(*) AS n_events,
               round(max(best_p), 6) AS behavior_share,
               round(avg(r), 4) AS logged_value,
               round(avg(r * hit / best_p), 4) AS ips_value,
               round(sum(r * hit / best_p) / sum(hit / best_p), 4)
                 AS snips_value
        FROM scored
    """,
    "gpd_pot_fit": f"""
        WITH vals AS (
          SELECT CAST(o_totalprice AS DOUBLE) AS v FROM orders
        ),
        thr AS (
          SELECT quantile_cont(v, 0.99) AS u, count(*) AS n_total
          FROM vals
        ),
        exc AS (
          SELECT v.v - t.u AS e, t.u, t.n_total
          FROM vals v CROSS JOIN thr t
          WHERE v.v > t.u
        ),
        agg AS (
          SELECT max(u) AS u, max(n_total) AS n_total,
                 count(*) AS n_exc, avg(e) AS m, var_samp(e) AS v
          FROM exc
        )
        SELECT CAST(n_exc AS BIGINT) AS n_exceedances,
               round(u, 2) AS threshold_p99,
               round((1.0 - m * m / v) / 2.0, 6) AS xi_hat,
               round(m * (1.0 - (1.0 - m * m / v) / 2.0), 4)
                 AS beta_hat,
               round(u + (m * (1.0 - (1.0 - m * m / v) / 2.0))
                 / ((1.0 - m * m / v) / 2.0)
                 * ((CAST(n_exc AS DOUBLE) / n_total
                     * {float(_RET_N)!r}) ** ((1.0 - m * m / v) / 2.0)
                    - 1.0), 2) AS return_level
        FROM agg
    """,
}
