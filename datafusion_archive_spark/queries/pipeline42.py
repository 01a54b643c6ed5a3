"""Pipeline wave 42 (round 5, fortieth wave): audience overlap and
ordered-trend testing.

- ``segment_overlap_venn`` — the 3-set Venn decomposition every
  audience/consent system needs: customers segmented by behavior
  (placed an URGENT order / placed a large order / active in 1997),
  reduced to one membership row per customer (bool_or flags — one
  shuffle on the entity key) and then counted by the 2³−1 flag
  combinations. Inclusion–exclusion identities are asserted in the
  tests; the same shape computes at 100 TB because the wide stage is
  an entity-keyed partial aggregate, never a self-join.
- ``trend_test_ca`` — the Cochran–Armitage trend test for a
  proportion across ORDERED groups (urgent-order share across order
  years, scores 0,1,2,…): z² against χ²₁ detects monotone dose-
  response where the already-certified contingency χ²
  (``contingency_stats``) only detects any-difference. Two-sided
  p via the same Abramowitz–Stegun 7.1.26 polynomial certified in
  ``fdr_bh_nation_tests`` (pipeline35) — identical in both engines.

The reference has no aggregates beyond MIN/MAX
(``/root/reference/ROADMAP.md``).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from datafusion_archive_spark.queries.pipeline35 import (
    _norm_sf_expr,
    _norm_sf_sql,
)


_BIG_ORDER = 300_000.0


def q_segment_overlap_venn(spark, sf):
    """Venn cell counts for three behavioral customer segments."""
    orders = spark.read.parquet(f"{sf}/orders.parquet")
    flags = orders.groupBy("o_custkey").agg(
        F.max(
            (F.col("o_orderpriority") == "1-URGENT").cast("int")
        ).alias("in_urgent"),
        F.max(
            (F.col("o_totalprice") > _BIG_ORDER).cast("int")
        ).alias("in_big"),
        F.max(
            (F.year("o_orderdate") == 1997).cast("int")
        ).alias("in_1997"),
    )
    return (
        flags.groupBy("in_urgent", "in_big", "in_1997")
        .agg(F.count(F.lit(1)).alias("n_customers"))
        .orderBy("in_urgent", "in_big", "in_1997")
    )


def q_trend_test_ca(spark, sf):
    """Cochran–Armitage z for urgent-share trend across order years.

    Scale: one year-keyed partial aggregate over the fact table, then
    constant-size algebra on the handful of year rows."""
    orders = spark.read.parquet(f"{sf}/orders.parquet")
    per_year = orders.groupBy(
        F.year("o_orderdate").alias("yr")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            (F.col("o_orderpriority") == "1-URGENT").cast("long")
        ).alias("y"),
    )
    w_all = Window.partitionBy()
    scored = per_year.select(
        "yr",
        "n",
        "y",
        (F.col("yr") - F.min("yr").over(w_all)).cast("double").alias("s"),
    )
    tot = scored.agg(
        F.count(F.lit(1)).alias("n_groups"),
        F.sum("n").alias("nt"),
        F.sum("y").alias("yt"),
        F.sum(F.col("n") * F.col("s")).alias("ns"),
        F.sum(F.col("n") * F.col("s") * F.col("s")).alias("nss"),
        F.sum(F.col("y") * F.col("s")).alias("ys"),
    )
    p_bar = F.col("yt").cast("double") / F.col("nt").cast("double")
    num = F.col("ys").cast("double") - p_bar * F.col("ns").cast("double")
    var = (
        p_bar
        * (1.0 - p_bar)
        * (
            F.col("nss").cast("double")
            - F.col("ns").cast("double")
            * F.col("ns").cast("double")
            / F.col("nt").cast("double")
        )
    )
    z = num / F.sqrt(var)
    return tot.select(
        "n_groups",
        F.round(p_bar, 6).alias("p_overall"),
        F.round(z, 6).alias("z_trend"),
        F.round(2.0 * _norm_sf_expr(z), 8).alias("p_two_sided"),
    )


QUERIES = {
    "segment_overlap_venn": q_segment_overlap_venn,
    "trend_test_ca": q_trend_test_ca,
}

ORACLES = {
    "segment_overlap_venn": f"""
        WITH flags AS (
          SELECT o_custkey,
                 max(CASE WHEN o_orderpriority = '1-URGENT'
                     THEN 1 ELSE 0 END) AS in_urgent,
                 max(CASE WHEN o_totalprice > {_BIG_ORDER}
                     THEN 1 ELSE 0 END) AS in_big,
                 max(CASE WHEN EXTRACT(year FROM o_orderdate) = 1997
                     THEN 1 ELSE 0 END) AS in_1997
          FROM orders GROUP BY 1
        )
        SELECT CAST(in_urgent AS INTEGER) AS in_urgent,
               CAST(in_big AS INTEGER) AS in_big,
               CAST(in_1997 AS INTEGER) AS in_1997,
               count(*) AS n_customers
        FROM flags
        GROUP BY 1, 2, 3
        ORDER BY 1, 2, 3
    """,
    "trend_test_ca": f"""
        WITH per_year AS (
          SELECT EXTRACT(year FROM o_orderdate) AS yr,
                 count(*) AS n,
                 CAST(sum(CASE WHEN o_orderpriority = '1-URGENT'
                          THEN 1 ELSE 0 END) AS BIGINT) AS y
          FROM orders GROUP BY 1
        ),
        scored AS (
          SELECT yr, n, y,
                 CAST(yr - min(yr) OVER () AS DOUBLE) AS s
          FROM per_year
        ),
        tot AS (
          SELECT count(*) AS n_groups,
                 sum(n) AS nt, sum(y) AS yt,
                 sum(n * s) AS ns, sum(n * s * s) AS nss,
                 sum(y * s) AS ys
          FROM scored
        )
        SELECT CAST(n_groups AS BIGINT) AS n_groups,
               round(CAST(yt AS DOUBLE) / nt, 6) AS p_overall,
               round((CAST(ys AS DOUBLE) - (CAST(yt AS DOUBLE) / nt) * ns)
                 / sqrt((CAST(yt AS DOUBLE) / nt)
                   * (1.0 - CAST(yt AS DOUBLE) / nt)
                   * (CAST(nss AS DOUBLE) - CAST(ns AS DOUBLE) * ns / nt)),
                 6) AS z_trend,
               round(2.0 * {_norm_sf_sql(
                   "((CAST(ys AS DOUBLE) - (CAST(yt AS DOUBLE) / nt) * ns)"
                   " / sqrt((CAST(yt AS DOUBLE) / nt)"
                   " * (1.0 - CAST(yt AS DOUBLE) / nt)"
                   " * (CAST(nss AS DOUBLE)"
                   " - CAST(ns AS DOUBLE) * ns / nt)))"
               )}, 8) AS p_two_sided
        FROM tot
    """,
}
