"""Pipeline wave 53 (round 5, fifty-first wave): integral-metric
drift and inventory optimization.

- ``wasserstein_drift`` — the exact 1-Wasserstein (earth-mover)
  distance between the 1997 and 1998 order-value distributions:
  W₁ = ∫|F₁−F₂| dx computed in closed form over the pooled sorted
  support (cumulative indicator sums + one lead-diff window). The
  integral complement of the sup-metric KS screen
  (``ks_test_two_sample``): KS sees the worst point, W₁ sees total
  transported mass — a location shift that KS shrugs at shows up
  here in dollars. Also reports the KS statistic from the same scan.
- ``newsvendor_stocking`` — the newsvendor quantile rule per nation:
  stock the smallest level q* with F(daily demand ≤ q*) ≥
  cu/(cu+co) (critical ratio 0.9) via exact discrete quantiles
  (cume_dist window), with the realized service level and expected
  leftover/shortage per day evaluated empirically — the full
  decision readout, not just the quantile.

The reference has no window functions (``/root/reference/ROADMAP.md``).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from datafusion_archive_spark.operators.util import cached

_CU = 9.0
_CO = 1.0
_CR = _CU / (_CU + _CO)


def q_wasserstein_drift(spark, sf):
    """Exact W1 + KS between 1997 and 1998 order values.

    Scale (round 8): the old plan swept the distinct-price dictionary
    — which grows with the corpus — through three unpartitioned
    windows (two cumsums, one lead) plus global-total windows. The
    cumulative counts are now exact integer bucketed running sums,
    the step width comes from the distributed lag on the NEGATED
    value (lead == lag under reversal), and the two totals broadcast
    from a plain aggregate."""
    from datafusion_archive_spark.operators.ranks import (
        bucketed_group_lag,
        bucketed_group_rank,
    )

    orders = spark.read.parquet(f"{sf}/orders.parquet")
    vals = orders.select(
        F.col("o_totalprice").cast("double").alias("v"),
        F.year("o_orderdate").alias("yr"),
    ).filter(F.col("yr").isin(1997, 1998))
    # cached: the value dictionary (and the running-sum output) fan
    # out into totals + two bucketed passes — fan-out-recompute fix
    per_v = cached(
        vals.groupBy("v").agg(
            F.sum((F.col("yr") == 1997).cast("long")).alias("c1"),
            F.sum((F.col("yr") == 1998).cast("long")).alias("c2"),
        )
    )
    tots = per_v.agg(
        F.sum("c1").alias("n1"), F.sum("c2").alias("n2")
    )
    swept = bucketed_group_lag(
        cached(
            bucketed_group_rank(
                per_v,
                [],
                "v",
                tiebreak=["v"],  # v is distinct after the collapse
                running=[("c1", "_s1"), ("c2", "_s2")],
            )
        ).withColumn("_nv", -F.col("v")),
        [],
        "_nv",
        ["_nv"],
        [("v", "_next_v")],
    )
    cum = swept.join(F.broadcast(tots)).select(
        "v",
        (F.col("_s1") / F.col("n1").cast("double")).alias("f1"),
        (F.col("_s2") / F.col("n2").cast("double")).alias("f2"),
        "n1",
        "n2",
        (F.col("_next_v") - F.col("v")).alias("dx"),
    )
    return cum.agg(
        F.first("n1").alias("n_1997"),
        F.first("n2").alias("n_1998"),
        F.round(
            F.sum(
                F.abs(F.col("f1") - F.col("f2"))
                * F.coalesce("dx", F.lit(0.0))
            ),
            2,
        ).alias("w1_dollars"),
        F.round(F.max(F.abs(F.col("f1") - F.col("f2"))), 6).alias(
            "ks_stat"
        ),
    )


def q_newsvendor_stocking(spark, sf):
    """Per-nation optimal daily stock at critical ratio 0.9."""
    orders = spark.read.parquet(f"{sf}/orders.parquet")
    cust = spark.read.parquet(f"{sf}/customer.parquet")
    nation = spark.read.parquet(f"{sf}/nation.parquet")
    demand = (
        orders.join(
            cust.select("c_custkey", "c_nationkey"),
            orders.o_custkey == cust.c_custkey,
        )
        .join(
            F.broadcast(nation.select("n_nationkey", "n_name")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .groupBy(
            F.col("n_name").alias("nation"),
            F.col("o_orderdate").alias("d"),
        )
        .agg(F.count(F.lit(1)).alias("dem"))
    )
    # cached: the (nation, day) demand grid feeds the cume-dist pass
    # and the service-level join — uncached, the fact join runs twice
    demand = cached(demand)
    w_cd = Window.partitionBy("nation").orderBy("dem")
    with_cd = demand.select(
        "nation", "dem", F.cume_dist().over(w_cd).alias("cd")
    )
    qstar = (
        with_cd.filter(F.col("cd") >= _CR)
        .groupBy("nation")
        .agg(F.min("dem").alias("q_star"))
    )
    return (
        demand.join(qstar, "nation")
        .groupBy("nation")
        .agg(
            F.first("q_star").alias("q_star"),
            F.round(
                F.avg(
                    (F.col("dem") <= F.col("q_star")).cast("double")
                ),
                6,
            ).alias("service_level"),
            F.round(
                F.avg(
                    F.greatest(
                        F.col("q_star") - F.col("dem"), F.lit(0)
                    ).cast("double")
                ),
                4,
            ).alias("avg_leftover"),
            F.round(
                F.avg(
                    F.greatest(
                        F.col("dem") - F.col("q_star"), F.lit(0)
                    ).cast("double")
                ),
                4,
            ).alias("avg_shortage"),
        )
        .orderBy("nation")
    )


QUERIES = {
    "wasserstein_drift": q_wasserstein_drift,
    "newsvendor_stocking": q_newsvendor_stocking,
}

ORACLES = {
    "wasserstein_drift": """
        WITH vals AS (
          SELECT CAST(o_totalprice AS DOUBLE) AS v,
                 EXTRACT(year FROM o_orderdate) AS yr
          FROM orders
          WHERE EXTRACT(year FROM o_orderdate) IN (1997, 1998)
        ),
        per_v AS (
          SELECT v,
                 sum(CASE WHEN yr = 1997 THEN 1 ELSE 0 END) AS c1,
                 sum(CASE WHEN yr = 1998 THEN 1 ELSE 0 END) AS c2
          FROM vals GROUP BY 1
        ),
        cum AS (
          SELECT v,
                 CAST(sum(c1) OVER (ORDER BY v
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS DOUBLE) / sum(c1) OVER () AS f1,
                 CAST(sum(c2) OVER (ORDER BY v
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS DOUBLE) / sum(c2) OVER () AS f2,
                 sum(c1) OVER () AS n1,
                 sum(c2) OVER () AS n2,
                 lead(v) OVER (ORDER BY v) - v AS dx
          FROM per_v
        )
        SELECT CAST(max(n1) AS BIGINT) AS n_1997,
               CAST(max(n2) AS BIGINT) AS n_1998,
               round(sum(abs(f1 - f2) * COALESCE(dx, 0.0)), 2)
                 AS w1_dollars,
               round(max(abs(f1 - f2)), 6) AS ks_stat
        FROM cum
    """,
    "newsvendor_stocking": f"""
        WITH demand AS (
          SELECT n.n_name AS nation, o.o_orderdate AS d,
                 count(*) AS dem
          FROM orders o
          JOIN customer c ON o.o_custkey = c.c_custkey
          JOIN nation n ON c.c_nationkey = n.n_nationkey
          GROUP BY 1, 2
        ),
        with_cd AS (
          SELECT nation, dem,
                 cume_dist() OVER (PARTITION BY nation ORDER BY dem)
                   AS cd
          FROM demand
        ),
        qstar AS (
          SELECT nation, CAST(min(dem) AS BIGINT) AS q_star
          FROM with_cd WHERE cd >= {_CR} GROUP BY 1
        )
        SELECT d.nation,
               max(q.q_star) AS q_star,
               round(avg(CASE WHEN d.dem <= q.q_star
                         THEN 1.0 ELSE 0.0 END), 6) AS service_level,
               round(avg(GREATEST(q.q_star - d.dem, 0)), 4)
                 AS avg_leftover,
               round(avg(GREATEST(d.dem - q.q_star, 0)), 4)
                 AS avg_shortage
        FROM demand d JOIN qstar q ON d.nation = q.nation
        GROUP BY 1
        ORDER BY 1
    """,
}
