"""Pipeline wave 51 (round 5, forty-ninth wave): panel econometrics
and shuffle-skew diagnostics.

- ``fixed_effects_within`` — the two-way fixed-effects (within)
  estimator on the nation × month revenue panel: demean by both
  entity and time (ỹ = y − ȳᵢ − ȳₜ + ȳ), then the OLS slope on the
  transformed data — the standard panel regression that absorbs
  per-nation levels and per-month shocks, where pooled OLS
  (``regression_aggs``) and grouped OLS (``grouped_ols_elasticity``)
  would confound both. All algebra: two broadcast joins of the cell
  table against its own margins plus one covariance aggregate.
- ``shuffle_skew_audit`` — the pre-flight skew check every big join
  needs: bucket the join key by the engine-portable 60-bit hash
  (functions.text.hash64, the same family the dedup waves certify)
  into 32 simulated shuffle partitions and report max/min/avg bucket
  sizes and the skew factor. A skew factor near 1 means hash
  partitioning balances; a hot key shows up here BEFORE it shows up
  as a straggler executor — this is the audit that decides between
  plain shuffle, salting, and AQE skew-join hints.

The reference has no joins or hash functions
(``/root/reference/ROADMAP.md``).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from datafusion_archive_spark.operators.util import cached

from datafusion_archive_spark.functions import text as TX
from datafusion_archive_spark.queries.llm import _hash64_sql

_N_BUCKETS = 32
_SKEW_SEED = 11


def q_fixed_effects_within(spark, sf):
    """Two-way FE slope of ln(revenue) on ln(orders) per cell."""
    cells = (
        spark.read.parquet(f"{sf}/orders.parquet")
        .join(
            spark.read.parquet(f"{sf}/customer.parquet").select(
                "c_custkey", "c_nationkey"
            ),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .groupBy(
            F.col("c_nationkey").alias("i"),
            F.date_trunc("month", F.col("o_orderdate")).alias("t"),
        )
        .agg(
            F.log(F.count(F.lit(1)).cast("double")).alias("x"),
            F.log(
                F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
                .cast("double")
            ).alias("y"),
        )
    )
    # cached: the (nation, month) cells feed both fixed-effect
    # marginals, the grand mean, and the within transform — uncached,
    # the orders-customer join would run four times
    cells = cached(cells)
    mi = cells.groupBy("i").agg(
        F.avg("x").alias("xi"), F.avg("y").alias("yi")
    )
    mt = cells.groupBy("t").agg(
        F.avg("x").alias("xt"), F.avg("y").alias("yt")
    )
    mg = cells.agg(
        F.avg("x").alias("xg"), F.avg("y").alias("yg")
    )
    within = (
        cells.join(F.broadcast(mi), "i")
        .join(F.broadcast(mt), "t")
        .crossJoin(F.broadcast(mg))
        .select(
            (
                F.col("x") - F.col("xi") - F.col("xt") + F.col("xg")
            ).alias("xw"),
            (
                F.col("y") - F.col("yi") - F.col("yt") + F.col("yg")
            ).alias("yw"),
        )
    )
    agg = within.agg(
        F.count(F.lit(1)).alias("n_cells"),
        F.sum(F.col("xw") * F.col("yw")).alias("sxy"),
        F.sum(F.col("xw") * F.col("xw")).alias("sxx"),
        F.sum(F.col("yw") * F.col("yw")).alias("syy"),
    )
    return agg.select(
        "n_cells",
        F.round(F.col("sxy") / F.col("sxx"), 6).alias("beta_fe"),
        F.round(
            F.col("sxy") * F.col("sxy") / (F.col("sxx") * F.col("syy")),
            6,
        ).alias("r2_within"),
    )


def q_shuffle_skew_audit(spark, sf):
    """Simulated 32-partition hash layout of the lineitem join key."""
    li = spark.read.parquet(f"{sf}/lineitem.parquet")
    buckets = (
        li.select(
            F.pmod(
                TX.hash64(F.col("l_orderkey").cast("string"), _SKEW_SEED),
                F.lit(_N_BUCKETS),
            ).alias("bucket")
        )
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    return buckets.agg(
        F.count(F.lit(1)).alias("n_buckets"),
        F.sum("c").alias("n_rows"),
        F.max("c").alias("max_rows"),
        F.min("c").alias("min_rows"),
        F.round(
            F.max("c")
            / (F.sum("c").cast("double") / F.count(F.lit(1))),
            4,
        ).alias("skew_factor"),
    )


QUERIES = {
    "fixed_effects_within": q_fixed_effects_within,
    "shuffle_skew_audit": q_shuffle_skew_audit,
}

ORACLES = {
    "fixed_effects_within": """
        WITH cells AS (
          SELECT c.c_nationkey AS i,
                 date_trunc('month', o.o_orderdate) AS t,
                 ln(CAST(count(*) AS DOUBLE)) AS x,
                 ln(CAST(sum(CAST(o.o_totalprice AS DECIMAL(18,2)))
                    AS DOUBLE)) AS y
          FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
          GROUP BY 1, 2
        ),
        mi AS (SELECT i, avg(x) AS xi, avg(y) AS yi FROM cells
               GROUP BY 1),
        mt AS (SELECT t, avg(x) AS xt, avg(y) AS yt FROM cells
               GROUP BY 1),
        mg AS (SELECT avg(x) AS xg, avg(y) AS yg FROM cells),
        w AS (
          SELECT c.x - mi.xi - mt.xt + mg.xg AS xw,
                 c.y - mi.yi - mt.yt + mg.yg AS yw
          FROM cells c
          JOIN mi ON c.i = mi.i
          JOIN mt ON c.t = mt.t
          CROSS JOIN mg
        )
        SELECT count(*) AS n_cells,
               round(sum(xw * yw) / sum(xw * xw), 6) AS beta_fe,
               round(sum(xw * yw) * sum(xw * yw)
                 / (sum(xw * xw) * sum(yw * yw)), 6) AS r2_within
        FROM w
    """,
    "shuffle_skew_audit": f"""
        WITH buckets AS (
          SELECT {_hash64_sql("CAST(l_orderkey AS VARCHAR)", _SKEW_SEED)}
                   % {_N_BUCKETS} AS bucket,
                 count(*) AS c
          FROM lineitem
          GROUP BY 1
        )
        SELECT count(*) AS n_buckets,
               CAST(sum(c) AS BIGINT) AS n_rows,
               CAST(max(c) AS BIGINT) AS max_rows,
               CAST(min(c) AS BIGINT) AS min_rows,
               round(max(c) / (CAST(sum(c) AS DOUBLE) / count(*)), 4)
                 AS skew_factor
        FROM buckets
    """,
}
