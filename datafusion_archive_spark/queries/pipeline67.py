"""Pipeline wave 67 (round 5, sixty-fifth wave): survival regression —
the covariate-adjusted layer above the certified Kaplan–Meier curve
(``survival_curve``).

Cohort: per user, origin = first event, event = first purchase,
censored at the global observation end; binary covariate x = the
signup-first cohort flag (the same treatment the DiD/QTE waves use).
Durations stay integer microseconds end-to-end — no float time math.

- ``cox_ph_newton`` — the Cox proportional-hazards coefficient via
  _ITERS Newton–Raphson steps on the Breslow partial likelihood:
  per iteration, one pass builds per-duration risk aggregates, a
  DESC-cumulative window forms the risk-set sums S0/S1, and the
  score/information reduce to two scalars (binary x ⇒ S2 = S1).
  The hazard ratio e^β compares conversion hazards adjusted for
  censoring. The oracle unrolls identical iterations.
- ``logrank_test`` — the log-rank test between the two cohorts:
  per event time, observed-minus-expected group-1 events under the
  hypergeometric null and its variance, summed to the z statistic —
  the standard nonparametric companion the Cox fit should agree
  with in direction.

The reference has no window functions (``/root/reference/ROADMAP.md``).
"""

from __future__ import annotations

import math

from pyspark.sql import Window
from pyspark.sql import functions as F

from datafusion_archive_spark.queries.timeseries import load_events

from datafusion_archive_spark.operators.util import cached

_ITERS = 3


def _cohort(spark, sf):
    """(dur_us, event, x) per user."""
    ev = load_events(spark, sf)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_u = Window.partitionBy("user_id")
    base = ev.select(
        "user_id",
        "event_type",
        F.unix_micros("ts").alias("us"),
        F.row_number().over(w).alias("rn"),
    )
    per = base.select(
        "user_id",
        F.min("us").over(w_u).alias("t0"),
        F.min(F.when(F.col("rn") == 1, F.col("event_type")))
        .over(w_u)
        .alias("first_type"),
        F.min(
            F.when(F.col("event_type") == "purchase", F.col("us"))
        )
        .over(w_u)
        .alias("t_buy"),
    ).distinct()
    # broadcast the censoring horizon — the previous partition-less
    # max() window funneled every event through one window partition
    t_end = base.agg(F.max("us").alias("t_end"))
    return per.crossJoin(F.broadcast(t_end)).select(
        (
            F.coalesce("t_buy", "t_end") - F.col("t0")
        ).alias("dur"),
        F.col("t_buy").isNotNull().cast("int").alias("event"),
        (F.col("first_type") == "signup").cast("int").alias("x"),
    )


def q_cox_ph_newton(spark, sf):
    """Cox PH beta + hazard ratio, 3 Newton steps (Breslow ties)."""
    cohort = cached(_cohort(spark, sf))
    beta = 0.0
    for _ in range(_ITERS):
        eb = F.exp(F.lit(beta) * F.col("x"))
        per_t = cohort.groupBy("dur").agg(
            F.sum(eb).alias("se"),
            F.sum(F.col("x") * eb).alias("sxe"),
            F.sum("event").alias("d"),
            F.sum(F.col("x") * F.col("event")).alias("dx"),
        )
        w_desc = Window.orderBy(F.desc("dur")).rowsBetween(
            Window.unboundedPreceding, 0
        )
        risk = per_t.select(
            "dur",
            "d",
            "dx",
            F.sum("se").over(w_desc).alias("s0"),
            F.sum("sxe").over(w_desc).alias("s1"),
        ).filter(F.col("d") > 0)
        agg = risk.agg(
            F.sum(
                F.col("dx") - F.col("d") * F.col("s1") / F.col("s0")
            ).alias("u"),
            F.sum(
                F.col("d")
                * (
                    F.col("s1") / F.col("s0")
                    - F.pow(F.col("s1") / F.col("s0"), F.lit(2.0))
                )
            ).alias("info"),
        ).collect()[0]
        beta += agg.u / agg.info
    return cohort.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum("event").alias("n_events"),
        F.sum("x").alias("n_treated"),
        F.round(F.lit(beta), 6).alias("beta"),
        F.round(F.lit(math.exp(beta)), 6).alias("hazard_ratio"),
    )


def q_logrank_test(spark, sf):
    """Log-rank z between signup-first and control cohorts."""
    cohort = _cohort(spark, sf)
    per_t = cohort.groupBy("dur").agg(
        F.count(F.lit(1)).alias("at_t"),
        F.sum("x").alias("at_t_1"),
        F.sum("event").alias("d"),
        F.sum(F.col("x") * F.col("event")).alias("d1"),
    )
    w_desc = Window.orderBy(F.desc("dur")).rowsBetween(
        Window.unboundedPreceding, 0
    )
    risk = per_t.select(
        "dur",
        "d",
        "d1",
        F.sum("at_t").over(w_desc).alias("nt"),
        F.sum("at_t_1").over(w_desc).alias("n1t"),
    ).filter((F.col("d") > 0) & (F.col("nt") > 1))
    p1 = F.col("n1t").cast("double") / F.col("nt")
    e = F.col("d") * p1
    v = (
        F.col("d")
        * p1
        * (1.0 - p1)
        * (F.col("nt") - F.col("d")).cast("double")
        / (F.col("nt") - 1).cast("double")
    )
    return risk.agg(
        F.count(F.lit(1)).alias("n_event_times"),
        F.round(F.sum(F.col("d1") - e), 4).alias("o_minus_e"),
        F.round(
            F.sum(F.col("d1") - e) / F.sqrt(F.sum(v)), 6
        ).alias("z_logrank"),
    )


QUERIES = {
    "cox_ph_newton": q_cox_ph_newton,
    "logrank_test": q_logrank_test,
}

_COHORT_SQL = """
        base AS MATERIALIZED (
          SELECT user_id, event_type, epoch_us(ts) AS us,
                 row_number() OVER (PARTITION BY user_id
                   ORDER BY ts, event_id) AS rn
          FROM events
        ),
        per AS MATERIALIZED (
          SELECT user_id,
                 min(us) AS t0,
                 min(CASE WHEN rn = 1 THEN event_type END)
                   AS first_type,
                 min(CASE WHEN event_type = 'purchase' THEN us END)
                   AS t_buy,
                 (SELECT max(us) FROM base) AS t_end
          FROM base GROUP BY 1
        ),
        cohort AS MATERIALIZED (
          SELECT COALESCE(t_buy, t_end) - t0 AS dur,
                 CASE WHEN t_buy IS NOT NULL THEN 1 ELSE 0 END
                   AS event,
                 CASE WHEN first_type = 'signup' THEN 1 ELSE 0 END
                   AS x
          FROM per
        )
"""


def _cox_oracle() -> str:
    parts = [_COHORT_SQL + """,
        b0 AS MATERIALIZED (SELECT CAST(0.0 AS DOUBLE) AS beta)"""]
    prev = "b0"
    for k in range(1, _ITERS + 1):
        parts.append(f"""
        ,pt{k} AS MATERIALIZED (
          SELECT c.dur,
                 sum(exp(b.beta * c.x)) AS se,
                 sum(c.x * exp(b.beta * c.x)) AS sxe,
                 sum(c.event) AS d,
                 sum(c.x * c.event) AS dx
          FROM cohort c CROSS JOIN {prev} b
          GROUP BY 1
        ),
        rk{k} AS MATERIALIZED (
          SELECT dur, d, dx,
                 sum(se) OVER (ORDER BY dur DESC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS s0,
                 sum(sxe) OVER (ORDER BY dur DESC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS s1
          FROM pt{k}
        ),
        b{k} AS MATERIALIZED (
          SELECT b.beta + sum(dx - d * s1 / s0)
                   / sum(d * (s1 / s0 - (s1 / s0) ** 2)) AS beta
          FROM rk{k} CROSS JOIN {prev} b
          WHERE d > 0
          GROUP BY b.beta
        )""")
        prev = f"b{k}"
    parts.append(f"""
        SELECT (SELECT count(*) FROM cohort) AS n_users,
               (SELECT CAST(sum(event) AS BIGINT) FROM cohort)
                 AS n_events,
               (SELECT CAST(sum(x) AS BIGINT) FROM cohort)
                 AS n_treated,
               round(beta, 6) AS beta,
               round(exp(beta), 6) AS hazard_ratio
        FROM {prev}""")
    return "WITH" + "".join(parts)


ORACLES = {
    "cox_ph_newton": _cox_oracle(),
    "logrank_test": f"""
        WITH {_COHORT_SQL},
        per_t AS (
          SELECT dur, count(*) AS at_t,
                 sum(x) AS at_t_1,
                 sum(event) AS d,
                 sum(x * event) AS d1
          FROM cohort GROUP BY 1
        ),
        risk AS (
          SELECT dur, d, d1,
                 sum(at_t) OVER (ORDER BY dur DESC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS nt,
                 sum(at_t_1) OVER (ORDER BY dur DESC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS n1t
          FROM per_t
        )
        SELECT count(*) AS n_event_times,
               round(sum(d1 - d * (CAST(n1t AS DOUBLE) / nt)), 4)
                 AS o_minus_e,
               round(sum(d1 - d * (CAST(n1t AS DOUBLE) / nt))
                 / sqrt(sum(d * (CAST(n1t AS DOUBLE) / nt)
                   * (1.0 - CAST(n1t AS DOUBLE) / nt)
                   * CAST(nt - d AS DOUBLE) / (nt - 1))), 6)
                 AS z_logrank
        FROM risk
        WHERE d > 0 AND nt > 1
    """,
}
