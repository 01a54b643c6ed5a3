"""Pipeline wave 33 (round 5, thirty-first wave): growth accounting
and revenue bridges.

- ``daily_growth_accounting`` — THE growth-accounting framework:
  per day, active users split into new (first-ever day), retained
  (also active the previous day), and resurrected (active before,
  but not yesterday), plus churned (active yesterday, gone today).
  active(d) = new + retained + resurrected and
  churn(d) = active(d−1) − retained(d) by construction — both
  identities are asserted in tests. (Daily granularity: the 30-day
  synthetic stream has every user active every WEEK, which would
  make the weekly frame degenerate.)
- ``revenue_bridge_mom`` — the month-over-month revenue bridge at
  part level: ΔRev = Σ volume effect (Δq·p₀) + price effect (q₀·Δp)
  + cross term (Δq·Δp) + entry/exit revenue of parts traded in only
  one of the two months. The decomposition is EXACTLY additive to
  the revenue delta (asserted) — the finance-review waterfall.

The reference has no windows or joins (``/root/reference/ROADMAP.md``).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from datafusion_archive_spark.queries.timeseries import load_events
from datafusion_archive_spark.operators.util import cached, load_table


def _t(spark, sf_dir, name):
    return load_table(spark, sf_dir, name)


def q_daily_growth_accounting(spark, sf):
    """Per activity day: n_new, n_retained, n_resurrected,
    n_churned.

    Scale: the stream collapses to the distinct (user, day) grid;
    classification is one self-join on (user, day−1) plus each
    user's broadcast-joined first day — every shuffle keys on
    user_id."""
    e = load_events(spark, sf)
    # cached: the (user, day) grid feeds the first-day rollup, the
    # prev-day self-join, the classifier, and the active counts
    weeks = cached(
        e.select(
            "user_id",
            F.to_date("ts").alias("week"),
        ).distinct()
    )
    first = weeks.groupBy("user_id").agg(F.min("week").alias("w0"))
    prev = weeks.select(
        "user_id", F.date_add("week", 1).alias("week"), F.lit(1).alias("was_prev")
    )
    classified = (
        weeks.join(first, "user_id")
        .join(prev, ["user_id", "week"], "left_outer")
        .select(
            "week",
            F.when(F.col("week") == F.col("w0"), "new")
            .when(F.col("was_prev").isNotNull(), "retained")
            .otherwise("resurrected")
            .alias("cls"),
        )
    )
    counts = cached(classified.groupBy("week").agg(
        F.sum(F.when(F.col("cls") == "new", 1).otherwise(0)).alias("n_new"),
        F.sum(F.when(F.col("cls") == "retained", 1).otherwise(0)).alias(
            "n_retained"
        ),
        F.sum(F.when(F.col("cls") == "resurrected", 1).otherwise(0)).alias(
            "n_resurrected"
        ),
    ))
    active = weeks.groupBy("week").agg(
        F.count(F.lit(1)).alias("n_active")
    )
    next_counts = counts.select(
        F.date_add("week", -1).alias("week"),
        F.col("n_retained").alias("_next_retained"),
    )
    churn = active.join(next_counts, "week", "left_outer").select(
        "week",
        (
            F.col("n_active") - F.coalesce("_next_retained", F.lit(0))
        ).alias("_churn_from_here"),
    )
    churned = churn.select(
        F.date_add("week", 1).alias("week"),
        F.col("_churn_from_here").alias("n_churned"),
    )
    return (
        counts.join(churned, "week", "left_outer")
        .select(
            F.date_format("week", "yyyy-MM-dd").alias("day"),
            "n_new",
            "n_retained",
            "n_resurrected",
            F.coalesce("n_churned", F.lit(0)).alias("n_churned"),
        )
    )


def q_revenue_bridge_mom(spark, sf):
    """MoM revenue bridge per month (vs the previous calendar month):
    volume, price, cross, and entry/exit effects at part granularity,
    exactly additive to the revenue delta.

    Scale: one (part, month) rollup; the bridge joins consecutive
    months per part (equi-join on the derived month index) — the
    working set is the part×month grid, not the fact table."""
    li = _t(spark, sf, "lineitem")
    pm = li.groupBy(
        "l_partkey",
        (
            (F.year(F.to_date("l_shipdate")) - 1992) * 12
            + F.month(F.to_date("l_shipdate"))
            - 1
        ).alias("m"),
    ).agg(
        F.sum(F.col("l_quantity").cast("double")).alias("q"),
        F.sum("l_extendedprice").alias("rev"),
    ).withColumn("p", F.col("rev") / F.col("q"))
    cur = pm.alias("cur")
    prv = pm.alias("prv")
    joined = cur.join(
        prv,
        (F.col("cur.l_partkey") == F.col("prv.l_partkey"))
        & (F.col("cur.m") == F.col("prv.m") + 1),
        "full_outer",
    ).select(
        F.coalesce(F.col("cur.m"), F.col("prv.m") + 1).alias("m"),
        F.col("cur.q").alias("q1"),
        F.col("cur.p").alias("p1"),
        F.col("cur.rev").alias("r1"),
        F.col("prv.q").alias("q0"),
        F.col("prv.p").alias("p0"),
        F.col("prv.rev").alias("r0"),
    )
    both = F.col("q1").isNotNull() & F.col("q0").isNotNull()
    vol = F.when(both, (F.col("q1") - F.col("q0")) * F.col("p0")).otherwise(0.0)
    price = F.when(both, F.col("q0") * (F.col("p1") - F.col("p0"))).otherwise(
        0.0
    )
    cross = F.when(
        both, (F.col("q1") - F.col("q0")) * (F.col("p1") - F.col("p0"))
    ).otherwise(0.0)
    entry = F.when(
        F.col("q0").isNull(), F.coalesce("r1", F.lit(0.0))
    ).otherwise(0.0)
    exit_ = F.when(
        F.col("q1").isNull(), -F.coalesce("r0", F.lit(0.0))
    ).otherwise(0.0)
    return (
        joined.groupBy("m")
        .agg(
            F.round(F.sum(vol), 2).alias("volume_effect"),
            F.round(F.sum(price), 2).alias("price_effect"),
            F.round(F.sum(cross), 2).alias("cross_effect"),
            F.round(F.sum(entry), 2).alias("entry_effect"),
            F.round(F.sum(exit_), 2).alias("exit_effect"),
            F.round(
                F.sum(
                    F.coalesce("r1", F.lit(0.0))
                    - F.coalesce("r0", F.lit(0.0))
                ),
                2,
            ).alias("rev_delta"),
        )
        .filter(F.col("m") > 0)
    )


QUERIES = {
    "daily_growth_accounting": q_daily_growth_accounting,
    "revenue_bridge_mom": q_revenue_bridge_mom,
}

ORACLES = {
    "daily_growth_accounting": """
        WITH weeks AS (
          SELECT DISTINCT user_id, CAST(ts AS DATE) AS week
          FROM events
        ),
        first AS (
          SELECT user_id, min(week) AS w0 FROM weeks GROUP BY 1
        ),
        classified AS (
          SELECT w.week,
                 CASE WHEN w.week = f.w0 THEN 'new'
                      WHEN p.user_id IS NOT NULL THEN 'retained'
                      ELSE 'resurrected' END AS cls
          FROM weeks w
          JOIN first f USING (user_id)
          LEFT JOIN weeks p
            ON p.user_id = w.user_id AND p.week = w.week - 1
        ),
        counts AS (
          SELECT week,
                 sum(CASE WHEN cls = 'new' THEN 1 ELSE 0 END) AS n_new,
                 sum(CASE WHEN cls = 'retained' THEN 1 ELSE 0 END)
                   AS n_retained,
                 sum(CASE WHEN cls = 'resurrected' THEN 1 ELSE 0 END)
                   AS n_resurrected
          FROM classified GROUP BY week
        ),
        active AS (
          SELECT week, count(*) AS n_active FROM weeks GROUP BY 1
        ),
        churned AS (
          SELECT a.week + 1 AS week,
                 a.n_active - coalesce(c.n_retained, 0) AS n_churned
          FROM active a
          LEFT JOIN counts c ON c.week = a.week + 1
        )
        SELECT strftime(week, '%Y-%m-%d') AS day,
               CAST(c.n_new AS BIGINT) AS n_new,
               CAST(c.n_retained AS BIGINT) AS n_retained,
               CAST(c.n_resurrected AS BIGINT) AS n_resurrected,
               CAST(coalesce(ch.n_churned, 0) AS BIGINT) AS n_churned
        FROM counts c LEFT JOIN churned ch USING (week)
    """,
    "revenue_bridge_mom": """
        WITH pm AS (
          SELECT l_partkey,
                 (year(CAST(l_shipdate AS DATE)) - 1992) * 12
                   + month(CAST(l_shipdate AS DATE)) - 1 AS m,
                 sum(CAST(l_quantity AS DOUBLE)) AS q,
                 sum(l_extendedprice) AS rev,
                 sum(l_extendedprice) / sum(CAST(l_quantity AS DOUBLE))
                   AS p
          FROM lineitem GROUP BY 1, 2
        ),
        joined AS (
          SELECT coalesce(cur.m, prv.m + 1) AS m,
                 cur.q AS q1, cur.p AS p1, cur.rev AS r1,
                 prv.q AS q0, prv.p AS p0, prv.rev AS r0
          FROM pm cur
          FULL OUTER JOIN pm prv
            ON cur.l_partkey = prv.l_partkey AND cur.m = prv.m + 1
        )
        SELECT CAST(m AS INTEGER) AS m,
               round(sum(CASE WHEN q1 IS NOT NULL AND q0 IS NOT NULL
                              THEN (q1 - q0) * p0 ELSE 0 END), 2)
                 AS volume_effect,
               round(sum(CASE WHEN q1 IS NOT NULL AND q0 IS NOT NULL
                              THEN q0 * (p1 - p0) ELSE 0 END), 2)
                 AS price_effect,
               round(sum(CASE WHEN q1 IS NOT NULL AND q0 IS NOT NULL
                              THEN (q1 - q0) * (p1 - p0) ELSE 0 END), 2)
                 AS cross_effect,
               round(sum(CASE WHEN q0 IS NULL
                              THEN coalesce(r1, 0) ELSE 0 END), 2)
                 AS entry_effect,
               round(sum(CASE WHEN q1 IS NULL
                              THEN -coalesce(r0, 0) ELSE 0 END), 2)
                 AS exit_effect,
               round(sum(coalesce(r1, 0) - coalesce(r0, 0)), 2)
                 AS rev_delta
        FROM joined
        GROUP BY m
        HAVING m > 0
    """,
}
