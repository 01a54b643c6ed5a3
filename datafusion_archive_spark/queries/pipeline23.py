"""Pipeline wave 23 (round 5, twenty-first wave): cohort economics,
market concentration, seasonal anomalies, and completeness audits.

- ``cohort_ltv_cumulative`` — cumulative revenue per first-order-year
  cohort by year offset, per cohort customer: the LTV curve that
  extends ``cohort_retention`` from presence to value.
- ``repeat_purchase_rate`` — share of customers placing a second
  order within 90 days of their first: the early-loyalty KPI, exact
  from the per-customer (first, second) order dates.
- ``supplier_share_hhi`` — Herfindahl–Hirschman concentration of
  supplier revenue within each part, reported as the
  most-concentrated parts (HHI = Σ shareᵢ², 1/n_suppliers at perfect
  balance, 1 at monopoly).
- ``seasonal_adjusted_outliers`` — daily revenue z-scored against its
  ISO-weekday profile (|z| > 2.5): outlier detection AFTER removing
  the weekly cycle — the flag ``events_anomaly_zscore`` would raise
  falsely on ordinary Mondays.
- ``missing_days_report`` — calendar completeness: the generated
  day dimension anti-joined to observed order days, rolled up per
  year with the missing-day count and ratio. The ingestion-gap audit
  every warehouse runs.

The reference has no date dimension generation, windows, or
aggregated subqueries (``/root/reference/ROADMAP.md``).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from datafusion_archive_spark.functions.rounding import (
    decimal_sum,
    decimal_sum_sql,
)
from datafusion_archive_spark.operators.util import cached, load_table


def _t(spark, sf_dir, name):
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# Cohort LTV
# ---------------------------------------------------------------------------


def q_cohort_ltv_cumulative(spark, sf):
    """Per (first-order-year cohort, year offset): revenue, cohort
    size, and cumulative lifetime value per cohort customer. The
    money view of cohort analysis.

    Scale: first-order year comes from one customer-level rollup
    joined back (the standard cohort double-aggregate — both
    Exchanges key on o_custkey, so AQE reuses the partitioning);
    the cumulative window runs over the ≤ |years|² cohort grid."""
    o = _t(spark, sf, "orders").select(
        "o_custkey",
        F.year(F.to_date("o_orderdate")).alias("yr"),
        "o_totalprice",
    )
    # cached: the customer-level rollup feeds the cohort sizes and
    # the revenue join — uncached, the orders Exchange runs twice
    first = cached(o.groupBy("o_custkey").agg(F.min("yr").alias("cohort")))
    sizes = first.groupBy("cohort").agg(
        F.count(F.lit(1)).alias("n_customers")
    )
    rev = (
        o.join(first, "o_custkey")
        .groupBy("cohort", (F.col("yr") - F.col("cohort")).alias("offset"))
        .agg(decimal_sum(F.col("o_totalprice")).cast("double").alias("rev"))
    )
    w = (
        Window.partitionBy("cohort")
        .orderBy("offset")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        rev.join(F.broadcast(sizes), "cohort")
        .withColumn("cum_rev", F.sum("rev").over(w))
        .select(
            "cohort",
            "offset",
            F.round("rev", 2).alias("rev"),
            "n_customers",
            F.round(
                F.col("cum_rev") / F.col("n_customers"), 2
            ).alias("cum_ltv_per_customer"),
        )
    )


# ---------------------------------------------------------------------------
# Repeat-purchase rate
# ---------------------------------------------------------------------------

_REPEAT_DAYS = 90


def q_repeat_purchase_rate(spark, sf):
    """Share of customers whose SECOND order lands within 90 days of
    their first. One row: n_customers, n_repeaters, repeat_rate.

    Scale: one Exchange on o_custkey; the second-order date is the
    2nd-smallest via a rank window over each customer's orders (the
    same partitioning as the rollup)."""
    o = _t(spark, sf, "orders").select(
        "o_custkey", F.to_date("o_orderdate").alias("d"), "o_orderkey"
    )
    w = Window.partitionBy("o_custkey").orderBy("d", "o_orderkey")
    ranked = o.withColumn("rn", F.row_number().over(w))
    per = ranked.filter(F.col("rn") <= 2).groupBy("o_custkey").agg(
        F.min(F.when(F.col("rn") == 1, F.col("d"))).alias("d1"),
        F.min(F.when(F.col("rn") == 2, F.col("d"))).alias("d2"),
    )
    flags = per.select(
        (
            F.col("d2").isNotNull()
            & (F.datediff("d2", "d1") <= _REPEAT_DAYS)
        ).cast("int").alias("is_repeat")
    )
    return flags.agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.sum("is_repeat").alias("n_repeaters"),
        F.round(F.avg("is_repeat"), 6).alias("repeat_rate"),
    )


# ---------------------------------------------------------------------------
# Supplier HHI
# ---------------------------------------------------------------------------

_HHI_TOPK = 25


def q_supplier_share_hhi(spark, sf):
    """Herfindahl–Hirschman index of supplier revenue concentration
    within each part; the 25 most concentrated multi-supplier parts
    (ties → part key). HHI = Σ (supplier share)².

    Scale: revenue collapses to (part, supplier) cells, part totals
    derive from the cells, and the HHI is one more rollup — three
    hash aggregates all keyed on l_partkey, one Exchange reused."""
    li = _t(spark, sf, "lineitem")
    cells = li.groupBy("l_partkey", "l_suppkey").agg(
        decimal_sum(F.col("l_extendedprice")).cast("double").alias("rev")
    )
    parts = cells.groupBy("l_partkey").agg(
        F.sum("rev").alias("tot"), F.count(F.lit(1)).alias("n_suppliers")
    )
    hhi = (
        cells.join(parts, "l_partkey")
        .groupBy("l_partkey")
        .agg(
            F.max("n_suppliers").alias("n_suppliers"),
            F.round(F.max("tot"), 2).alias("part_rev"),
            F.round(
                F.sum(F.pow(F.col("rev") / F.col("tot"), F.lit(2.0))), 6
            ).alias("hhi"),
        )
        .filter(F.col("n_suppliers") >= 2)
    )
    return hhi.orderBy(F.desc("hhi"), "l_partkey").limit(_HHI_TOPK)


# ---------------------------------------------------------------------------
# Seasonally adjusted outliers
# ---------------------------------------------------------------------------

_SEAS_Z = 2.5


def q_seasonal_adjusted_outliers(spark, sf):
    """Daily revenue z-scored against its ISO-weekday mean/stddev;
    days with |z| > 2.5 are flagged. Deseasonalized anomaly
    detection — the weekly cycle is modeled out before the flag.

    Scale: the day grid carries its weekday; the 7-row profile
    broadcasts back; no window anywhere."""
    o = _t(spark, sf, "orders")
    daily = o.groupBy(
        F.date_format(F.to_date("o_orderdate"), "yyyy-MM-dd").alias("day")
    ).agg(decimal_sum(F.col("o_totalprice")).cast("double").alias("rev"))
    daily = daily.withColumn(
        "isodow", F.weekday(F.to_date("day")) + 1
    )
    prof = daily.groupBy("isodow").agg(
        F.avg("rev").alias("mu"), F.stddev_samp("rev").alias("sd")
    )
    z = (F.col("rev") - F.col("mu")) / F.col("sd")
    return (
        daily.join(F.broadcast(prof), "isodow")
        .filter(F.abs(z) > _SEAS_Z)
        .select(
            "day",
            "isodow",
            F.round("rev", 2).alias("rev"),
            F.round(z, 4).alias("z"),
        )
    )


# ---------------------------------------------------------------------------
# Missing-days report
# ---------------------------------------------------------------------------


def q_missing_days_report(spark, sf):
    """Calendar completeness per year: expected days (generated day
    dimension over the observed min..max), observed order days,
    missing count and ratio. The ingestion-gap audit.

    Scale: the day dimension is GENERATED (sequence over the
    broadcast min/max — no table), the observed side is the
    day-collapsed scan, and the anti-join is dimension-sized."""
    o = _t(spark, sf, "orders")
    days = o.select(F.to_date("o_orderdate").alias("d")).distinct()
    bounds = days.agg(F.min("d").alias("lo"), F.max("d").alias("hi"))
    grid = bounds.select(
        F.explode(
            F.sequence("lo", "hi", F.expr("interval 1 day"))
        ).alias("d")
    )
    missing = grid.join(days, "d", "left_anti")
    m = missing.groupBy(F.year("d").alias("year")).agg(
        F.count(F.lit(1)).alias("n_missing")
    )
    e = grid.groupBy(F.year("d").alias("year")).agg(
        F.count(F.lit(1)).alias("n_expected")
    )
    return (
        e.join(m, "year", "left_outer")
        .select(
            "year",
            "n_expected",
            F.coalesce("n_missing", F.lit(0)).alias("n_missing"),
            F.round(
                F.coalesce("n_missing", F.lit(0)) / F.col("n_expected"), 6
            ).alias("missing_ratio"),
        )
    )


QUERIES = {
    "cohort_ltv_cumulative": q_cohort_ltv_cumulative,
    "repeat_purchase_rate": q_repeat_purchase_rate,
    "supplier_share_hhi": q_supplier_share_hhi,
    "seasonal_adjusted_outliers": q_seasonal_adjusted_outliers,
    "missing_days_report": q_missing_days_report,
}

ORACLES = {
    "cohort_ltv_cumulative": f"""
        WITH o AS (
          SELECT o_custkey,
                 year(CAST(o_orderdate AS DATE)) AS yr,
                 o_totalprice
          FROM orders
        ),
        first AS (
          SELECT o_custkey, min(yr) AS cohort FROM o GROUP BY 1
        ),
        sizes AS (
          SELECT cohort, count(*) AS n_customers FROM first GROUP BY 1
        ),
        rev AS (
          SELECT f.cohort, o.yr - f.cohort AS offset,
                 CAST({decimal_sum_sql("o.o_totalprice")} AS DOUBLE) AS rev
          FROM o JOIN first f USING (o_custkey)
          GROUP BY 1, 2
        )
        SELECT CAST(r.cohort AS INTEGER) AS cohort,
               CAST(r.offset AS INTEGER) AS offset,
               round(r.rev, 2) AS rev,
               s.n_customers,
               round(sum(r.rev) OVER (PARTITION BY r.cohort
                       ORDER BY r.offset
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                     / s.n_customers, 2) AS cum_ltv_per_customer
        FROM rev r JOIN sizes s USING (cohort)
    """,
    "repeat_purchase_rate": f"""
        WITH ranked AS (
          SELECT o_custkey, CAST(o_orderdate AS DATE) AS d,
                 row_number() OVER (PARTITION BY o_custkey
                   ORDER BY CAST(o_orderdate AS DATE), o_orderkey) AS rn
          FROM orders
        ),
        per AS (
          SELECT o_custkey,
                 min(CASE WHEN rn = 1 THEN d END) AS d1,
                 min(CASE WHEN rn = 2 THEN d END) AS d2
          FROM ranked WHERE rn <= 2 GROUP BY 1
        ),
        flags AS (
          SELECT CASE WHEN d2 IS NOT NULL
                       AND date_diff('day', d1, d2) <= {_REPEAT_DAYS}
                      THEN 1 ELSE 0 END AS is_repeat
          FROM per
        )
        SELECT count(*) AS n_customers,
               CAST(sum(is_repeat) AS BIGINT) AS n_repeaters,
               round(avg(is_repeat), 6) AS repeat_rate
        FROM flags
    """,
    "supplier_share_hhi": f"""
        WITH cells AS (
          SELECT l_partkey, l_suppkey,
                 CAST({decimal_sum_sql("l_extendedprice")} AS DOUBLE) AS rev
          FROM lineitem GROUP BY 1, 2
        ),
        parts AS (
          SELECT l_partkey, sum(rev) AS tot, count(*) AS n_suppliers
          FROM cells GROUP BY 1
        )
        SELECT c.l_partkey,
               CAST(max(p.n_suppliers) AS BIGINT) AS n_suppliers,
               round(max(p.tot), 2) AS part_rev,
               round(sum(power(c.rev / p.tot, 2.0)), 6) AS hhi
        FROM cells c JOIN parts p USING (l_partkey)
        GROUP BY c.l_partkey
        HAVING max(p.n_suppliers) >= 2
        ORDER BY hhi DESC, c.l_partkey
        LIMIT {_HHI_TOPK}
    """,
    "seasonal_adjusted_outliers": f"""
        WITH daily AS (
          SELECT strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d') AS day,
                 isodow(CAST(o_orderdate AS DATE)) AS isodow,
                 CAST({decimal_sum_sql("o_totalprice")} AS DOUBLE) AS rev
          FROM orders GROUP BY 1, 2
        ),
        prof AS (
          SELECT isodow, avg(rev) AS mu, stddev_samp(rev) AS sd
          FROM daily GROUP BY 1
        )
        SELECT d.day,
               CAST(d.isodow AS INTEGER) AS isodow,
               round(d.rev, 2) AS rev,
               round((d.rev - p.mu) / p.sd, 4) AS z
        FROM daily d JOIN prof p USING (isodow)
        WHERE abs((d.rev - p.mu) / p.sd) > {_SEAS_Z}
    """,
    "missing_days_report": """
        WITH days AS (
          SELECT DISTINCT CAST(o_orderdate AS DATE) AS d FROM orders
        ),
        grid AS (
          -- DuckDB's range() takes constants only: enumerate offsets
          -- and clamp to the observed bounds (20000 days ≈ 54 years,
          -- far beyond the generator's fixed span)
          SELECT * FROM (
            SELECT (SELECT min(d) FROM days)
                   + CAST(range AS INTEGER) * INTERVAL 1 DAY AS d
            FROM range(0, 20000)
          ) WHERE d <= (SELECT max(d) FROM days)
        ),
        m AS (
          SELECT year(g.d) AS year, count(*) AS n_missing
          FROM grid g ANTI JOIN days USING (d)
          GROUP BY 1
        ),
        e AS (
          SELECT year(d) AS year, count(*) AS n_expected
          FROM grid GROUP BY 1
        )
        SELECT CAST(e.year AS INTEGER) AS year,
               e.n_expected,
               CAST(coalesce(m.n_missing, 0) AS BIGINT) AS n_missing,
               round(coalesce(m.n_missing, 0) / e.n_expected, 6)
                 AS missing_ratio
        FROM e LEFT JOIN m USING (year)
    """,
}
