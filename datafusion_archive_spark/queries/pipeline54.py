"""Pipeline wave 54 (round 5, fifty-second wave): iterative model
training in the engine, and the balance diagnostic that gates causal
reads.

- ``logistic_newton`` — a 2-parameter logistic regression
  P(urgent) = σ(a + b·x̃) (x̃ = centered ln order value) trained by
  _NEWTON_ITERS full Newton–Raphson steps: each iteration is ONE
  aggregate pass collecting the 5 sufficient statistics (Σw, Σwx,
  Σwx², Σ(y−p), Σ(y−p)x) and a closed-form 2×2 solve — the
  distributed GLM training pattern (the data never moves; only 5
  doubles per iteration reach the driver). The oracle unrolls the
  identical iterations as generated MATERIALIZED CTEs, so even the
  TRAINING LOOP is certified exactly, not just the final scores.
- ``covariate_balance_smd`` — standardized mean differences of
  pre-period covariates between the first-event-signup cohort and
  control: SMD = (m_t − m_c)/√((s²_t + s²_c)/2) per covariate. The
  standard pre-analysis balance table — |SMD| < 0.1 is the usual
  "comparable groups" bar — that should accompany every
  ``diff_in_diff`` / ``quantile_treatment_effects`` readout.

The reference has no aggregates beyond MIN/MAX
(``/root/reference/ROADMAP.md``).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from datafusion_archive_spark.queries.timeseries import load_events

from datafusion_archive_spark.operators.util import cached

_NEWTON_ITERS = 4
_SPLIT = "2024-01-16"


def _obs(spark, sf):
    orders = spark.read.parquet(f"{sf}/orders.parquet")
    raw = orders.select(
        (F.col("o_orderpriority") == "1-URGENT")
        .cast("double")
        .alias("y"),
        F.log(F.col("o_totalprice").cast("double")).alias("lx"),
    )
    # broadcast the centering mean — a partition-less window here
    # would funnel every order through one window partition
    mu = raw.agg(F.avg("lx").alias("_mu"))
    return raw.crossJoin(F.broadcast(mu)).select(
        "y", (F.col("lx") - F.col("_mu")).alias("x")
    )


def q_logistic_newton(spark, sf):
    """Logistic P(urgent | ln value), 4 exact Newton steps."""
    obs = cached(_obs(spark, sf))
    a = b = 0.0
    for _ in range(_NEWTON_ITERS):
        p = 1.0 / (1.0 + F.exp(-(F.lit(a) + F.lit(b) * F.col("x"))))
        w = p * (1.0 - p)
        stats = obs.agg(
            F.sum(w).alias("h00"),
            F.sum(w * F.col("x")).alias("h01"),
            F.sum(w * F.col("x") * F.col("x")).alias("h11"),
            F.sum(F.col("y") - p).alias("g0"),
            F.sum((F.col("y") - p) * F.col("x")).alias("g1"),
        ).collect()[0]
        det = stats.h00 * stats.h11 - stats.h01 * stats.h01
        a += (stats.h11 * stats.g0 - stats.h01 * stats.g1) / det
        b += (stats.h00 * stats.g1 - stats.h01 * stats.g0) / det
    p = 1.0 / (1.0 + F.exp(-(F.lit(a) + F.lit(b) * F.col("x"))))
    return obs.agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.lit(a), 6).alias("intercept"),
        F.round(F.lit(b), 6).alias("slope"),
        F.round(
            -F.avg(
                F.col("y") * F.log(p)
                + (1.0 - F.col("y")) * F.log(1.0 - p)
            ),
            6,
        ).alias("log_loss"),
    )


def q_covariate_balance_smd(spark, sf):
    """Pre-period covariate SMD table, treated vs control."""
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
    pre = ev.filter(F.col("ts") < F.lit(_SPLIT).cast("timestamp"))
    per_user = pre.groupBy("user_id").agg(
        F.sum((F.col("event_type") == "view").cast("double")).alias(
            "pre_views"
        ),
        F.sum((F.col("event_type") == "click").cast("double")).alias(
            "pre_clicks"
        ),
        F.sum((F.col("event_type") == "error").cast("double")).alias(
            "pre_errors"
        ),
        F.sum(
            F.when(
                F.col("event_type") == "purchase", F.col("value")
            ).otherwise(0.0)
        ).alias("pre_purchase_value"),
    )
    tagged = per_user.join(F.broadcast(treated), "user_id", "left").select(
        F.coalesce("treat", F.lit(0)).alias("treat"),
        "pre_views",
        "pre_clicks",
        "pre_errors",
        "pre_purchase_value",
    )
    long = tagged.selectExpr(
        "treat",
        "stack(4, 'pre_views', pre_views, 'pre_clicks', pre_clicks, "
        "'pre_errors', pre_errors, "
        "'pre_purchase_value', pre_purchase_value) AS (covariate, v)",
    )
    cells = long.groupBy("covariate", "treat").agg(
        F.avg("v").alias("m"), F.var_samp("v").alias("s2")
    )
    t = cells.filter(F.col("treat") == 1).select(
        "covariate",
        F.col("m").alias("mt"),
        F.col("s2").alias("st"),
    )
    c = cells.filter(F.col("treat") == 0).select(
        "covariate",
        F.col("m").alias("mc"),
        F.col("s2").alias("sc"),
    )
    return (
        t.join(c, "covariate")
        .select(
            "covariate",
            F.round("mt", 4).alias("mean_treated"),
            F.round("mc", 4).alias("mean_control"),
            F.round(
                (F.col("mt") - F.col("mc"))
                / F.sqrt((F.col("st") + F.col("sc")) / 2.0),
                6,
            ).alias("smd"),
        )
        .orderBy("covariate")
    )


QUERIES = {
    "logistic_newton": q_logistic_newton,
    "covariate_balance_smd": q_covariate_balance_smd,
}


def _logistic_oracle() -> str:
    parts = [
        """
        obs AS MATERIALIZED (
          SELECT CASE WHEN o_orderpriority = '1-URGENT'
                 THEN 1.0 ELSE 0.0 END AS y,
                 ln(CAST(o_totalprice AS DOUBLE))
                   - avg(ln(CAST(o_totalprice AS DOUBLE))) OVER ()
                   AS x
          FROM orders
        ),
        p0 AS MATERIALIZED (
          SELECT CAST(0.0 AS DOUBLE) AS a, CAST(0.0 AS DOUBLE) AS b
        )"""
    ]
    prev = "p0"
    for k in range(1, _NEWTON_ITERS + 1):
        parts.append(
            f"""
        s{k} AS MATERIALIZED (
          SELECT p.a, p.b,
                 sum(pr * (1 - pr)) AS h00,
                 sum(pr * (1 - pr) * o.x) AS h01,
                 sum(pr * (1 - pr) * o.x * o.x) AS h11,
                 sum(o.y - pr) AS g0,
                 sum((o.y - pr) * o.x) AS g1
          FROM obs o CROSS JOIN {prev} p
          CROSS JOIN LATERAL (
            SELECT 1.0 / (1.0 + exp(-(p.a + p.b * o.x))) AS pr
          ) q
          GROUP BY p.a, p.b
        ),
        p{k} AS MATERIALIZED (
          SELECT a + (h11 * g0 - h01 * g1)
                   / (h00 * h11 - h01 * h01) AS a,
                 b + (h00 * g1 - h01 * g0)
                   / (h00 * h11 - h01 * h01) AS b
          FROM s{k}
        )"""
        )
        prev = f"p{k}"
    parts.append(
        f"""
        scored AS (
          SELECT o.y,
                 1.0 / (1.0 + exp(-(p.a + p.b * o.x))) AS pr,
                 p.a, p.b
          FROM obs o CROSS JOIN {prev} p
        )
        SELECT count(*) AS n,
               round(max(a), 6) AS intercept,
               round(max(b), 6) AS slope,
               round(-avg(y * ln(pr) + (1 - y) * ln(1 - pr)), 6)
                 AS log_loss
        FROM scored"""
    )
    return "WITH" + ",".join(parts)


ORACLES = {
    "logistic_newton": _logistic_oracle(),
    "covariate_balance_smd": f"""
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
        per_user AS (
          SELECT e.user_id,
                 sum(CASE WHEN e.event_type = 'view'
                     THEN 1.0 ELSE 0.0 END) AS pre_views,
                 sum(CASE WHEN e.event_type = 'click'
                     THEN 1.0 ELSE 0.0 END) AS pre_clicks,
                 sum(CASE WHEN e.event_type = 'error'
                     THEN 1.0 ELSE 0.0 END) AS pre_errors,
                 sum(CASE WHEN e.event_type = 'purchase'
                     THEN e.value ELSE 0.0 END) AS pre_purchase_value
          FROM events e
          WHERE e.ts < TIMESTAMP '{_SPLIT} 00:00:00'
          GROUP BY 1
        ),
        tagged AS (
          SELECT CASE WHEN t.user_id IS NULL THEN 0 ELSE 1 END
                   AS treat,
                 u.pre_views, u.pre_clicks, u.pre_errors,
                 u.pre_purchase_value
          FROM per_user u LEFT JOIN treated t
            ON u.user_id = t.user_id
        ),
        long AS (
          SELECT treat, 'pre_views' AS covariate, pre_views AS v
          FROM tagged
          UNION ALL
          SELECT treat, 'pre_clicks', pre_clicks FROM tagged
          UNION ALL
          SELECT treat, 'pre_errors', pre_errors FROM tagged
          UNION ALL
          SELECT treat, 'pre_purchase_value', pre_purchase_value
          FROM tagged
        ),
        cells AS (
          SELECT covariate, treat, avg(v) AS m, var_samp(v) AS s2
          FROM long GROUP BY 1, 2
        )
        SELECT t.covariate,
               round(t.m, 4) AS mean_treated,
               round(c.m, 4) AS mean_control,
               round((t.m - c.m) / sqrt((t.s2 + c.s2) / 2.0), 6)
                 AS smd
        FROM cells t JOIN cells c
          ON t.covariate = c.covariate
         AND t.treat = 1 AND c.treat = 0
        ORDER BY t.covariate
    """,
}
