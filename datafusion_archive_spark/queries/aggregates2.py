"""Aggregate surface wave 2: statistical moments, argmin/argmax,
boolean aggregates, collect-style aggregation, unpivot, and the
Q2-style correlated scalar subquery.

skewness/kurtosis are deliberately absent from the oracle set: Spark
and DuckDB use different estimators (population vs sample-adjusted),
so there is no portable exact oracle; stddev/variance/corr/covar use
identical definitions and match to the last bits.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from datafusion_archive_spark.operators.quantiles import (
    exact_quantiles_cont,
    lit_cutpoints,
)
from datafusion_archive_spark.operators.util import load_table


def _t(spark, sf_dir, name):
    return load_table(spark, sf_dir, name)


def q_stats_aggs(spark, sf):
    l = _t(spark, sf, "lineitem")
    return l.groupBy("l_returnflag").agg(
        F.round(F.stddev_samp("l_quantity"), 6).alias("sd_qty"),
        F.round(F.var_samp("l_quantity"), 6).alias("var_qty"),
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias(
            "corr_qty_price"
        ),
        F.round(F.covar_samp("l_quantity", "l_discount"), 6).alias(
            "covar_qty_disc"
        ),
    )


def q_argminmax(spark, sf):
    l = _t(spark, sf, "lineitem")
    return l.groupBy("l_returnflag").agg(
        F.min_by("l_orderkey", "l_extendedprice").alias("cheapest_order"),
        F.max_by("l_orderkey", "l_extendedprice").alias("priciest_order"),
        F.expr("bool_and(l_quantity > 0)").alias("all_positive"),
        F.expr("bool_or(l_quantity > 49)").alias("any_near_max"),
    )


def q_collect_agg(spark, sf):
    """Set-collecting aggregation, scalarized deterministically
    (sorted + joined) — raw collect_list order is partition-dependent
    and must never be exposed (SURVEY §7.7 discipline)."""
    o = _t(spark, sf, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.array_join(
            F.sort_array(F.collect_set("o_orderstatus")), ","
        ).alias("statuses"),
        F.countDistinct("o_custkey").alias("n_customers"),
    )


def q2_min_per_group_subquery(spark, sf):
    """TPC-H Q2 shape: rows matching their group's minimum via a
    correlated scalar subquery (Catalyst decorrelates it into an
    aggregate + join — no per-row execution)."""
    return spark.sql(
        f"""
        SELECT s_suppkey, s_name, s_nationkey, s_acctbal
        FROM parquet.`{sf}/supplier.parquet` s
        WHERE s_acctbal = (
          SELECT min(s2.s_acctbal)
          FROM parquet.`{sf}/supplier.parquet` s2
          WHERE s2.s_nationkey = s.s_nationkey
        )
        """
    )


def q_unpivot(spark, sf):
    """Wide → long (stack/unpivot). Oracle is the portable UNION ALL
    form."""
    wide = (
        _t(spark, sf, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_tax"), 2).alias("sum_tax"),
        )
    )
    return wide.selectExpr(
        "l_returnflag",
        "stack(2, 'qty', sum_qty, 'tax', sum_tax) AS (metric, value)",
    )


def q_expr_misc(spark, sf):
    """coalesce/nullif/greatest/least + bitwise ops."""
    l = _t(spark, sf, "lineitem").filter(F.col("l_linenumber") == 4)
    k = F.col("l_orderkey")
    return l.select(
        "l_orderkey",
        F.greatest("l_quantity", "l_tax", "l_discount").alias("g3"),
        F.least("l_quantity", "l_tax", "l_discount").alias("l3"),
        F.coalesce(F.expr("nullif(l_returnflag, 'N')"), F.lit("none")).alias(
            "flag_or_none"
        ),
        k.bitwiseAND(F.lit(255)).alias("b_and"),
        k.bitwiseOR(F.lit(4096)).alias("b_or"),
        k.bitwiseXOR(F.lit(85)).alias("b_xor"),
        F.shiftleft(k, 2).alias("b_shl"),
        F.shiftright(k, 3).alias("b_shr"),
    )


_PROFILE_COLS = ("l_quantity", "l_extendedprice", "l_discount", "l_tax")


def q_profile_columns(spark, sf):
    """ANALYZE-style column profiling in ONE pass: per numeric column
    the null count, exact distinct count, and min/max — the stats
    sweep a warehouse runs before choosing layouts. Multiple exact
    COUNT(DISTINCT)s in one aggregate become a single Expand-based
    multi-distinct plan (rows × #distinct-aggs, standard at scale);
    the wide one-row result is then unpivoted with stack()."""
    l = _t(spark, sf, "lineitem")
    aggs = []
    for c in _PROFILE_COLS:
        aggs += [
            F.sum(F.col(c).isNull().cast("long")).alias(f"nn_{c}"),
            F.count_distinct(F.col(c)).alias(f"nd_{c}"),
            F.min(c).alias(f"mn_{c}"),
            F.max(c).alias(f"mx_{c}"),
        ]
    wide = l.agg(*aggs)
    stack = ", ".join(
        f"'{c}', nn_{c}, nd_{c}, mn_{c}, mx_{c}" for c in _PROFILE_COLS
    )
    return wide.selectExpr(
        f"stack({len(_PROFILE_COLS)}, {stack}) AS "
        "(column_name, n_nulls, n_distinct, min_v, max_v)"
    )


_HIST_PCTS = [round(0.1 * i, 1) for i in range(1, 10)]


def q_histogram_equi_depth(spark, sf):
    """Equi-depth (decile) histogram the scale-sane way: exact
    interpolated decile boundaries from the histogram-pruned
    order-statistic search (operators/quantiles.py — distributed
    passes over the pruned 1-column scan; round 7 retired the
    previous one-pass ``percentile`` aggregate, which funneled the
    whole fact column through a single task's buffer for the final
    merge), inlined as a literal array onto the scan, bucket
    assignment as a fold over the 9 cutpoints — never the
    ntile-over-global-order formulation, whose single-partition
    window is a scale-killer. The search is bit-identical to Spark
    ``percentile``, which shares linear interpolation with DuckDB
    ``quantile_cont``, so bucket edges (and therefore every count)
    match exactly."""
    l = _t(spark, sf, "lineitem").select("l_extendedprice")
    bounds = lit_cutpoints(
        exact_quantiles_cont(l, "l_extendedprice", _HIST_PCTS)
    )
    bucketed = l.select(
        F.aggregate(
            bounds,
            F.lit(0),
            lambda acc, b: acc
            + F.when(F.col("l_extendedprice") > b, 1).otherwise(0),
        ).alias("bucket"),
        "l_extendedprice",
    )
    return bucketed.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.min("l_extendedprice"), 2).alias("lo"),
        F.round(F.max("l_extendedprice"), 2).alias("hi"),
    )


QUERIES = {
    "histogram_equi_depth": q_histogram_equi_depth,
    "profile_columns": q_profile_columns,
    "stats_aggs": q_stats_aggs,
    "argminmax_aggs": q_argminmax,
    "collect_agg": q_collect_agg,
    "q2_min_per_group_subquery": q2_min_per_group_subquery,
    "unpivot_stack": q_unpivot,
    "expr_misc": q_expr_misc,
}

ORACLES = {
    "histogram_equi_depth": f"""
        WITH bounds AS (
          SELECT quantile_cont(l_extendedprice,
                               [{", ".join(str(p) for p in _HIST_PCTS)}]) AS bs
          FROM lineitem
        )
        SELECT CAST(list_sum(list_transform(b.bs,
                 x -> CASE WHEN l.l_extendedprice > x THEN 1 ELSE 0 END))
                 AS INTEGER) AS bucket,
               count(*) AS n,
               round(min(l.l_extendedprice), 2) AS lo,
               round(max(l.l_extendedprice), 2) AS hi
        FROM lineitem l CROSS JOIN bounds b
        GROUP BY 1
    """,
    "profile_columns": "\nUNION ALL\n".join(
        f"""
        SELECT '{c}' AS column_name,
               CAST(count(*) - count({c}) AS BIGINT) AS n_nulls,
               CAST(count(DISTINCT {c}) AS BIGINT) AS n_distinct,
               min({c}) AS min_v,
               max({c}) AS max_v
        FROM lineitem
        """
        for c in _PROFILE_COLS
    ),
    "stats_aggs": """
        SELECT l_returnflag,
               round(stddev_samp(l_quantity), 6) AS sd_qty,
               round(var_samp(l_quantity), 6) AS var_qty,
               round(corr(l_quantity, l_extendedprice), 6)
                 AS corr_qty_price,
               round(covar_samp(l_quantity, l_discount), 6)
                 AS covar_qty_disc
        FROM lineitem GROUP BY l_returnflag
    """,
    "argminmax_aggs": """
        SELECT l_returnflag,
               arg_min(l_orderkey, l_extendedprice) AS cheapest_order,
               arg_max(l_orderkey, l_extendedprice) AS priciest_order,
               bool_and(l_quantity > 0) AS all_positive,
               bool_or(l_quantity > 49) AS any_near_max
        FROM lineitem GROUP BY l_returnflag
    """,
    "collect_agg": """
        SELECT o_orderpriority,
               array_to_string(list_sort(list(DISTINCT o_orderstatus)), ',')
                 AS statuses,
               count(DISTINCT o_custkey) AS n_customers
        FROM orders GROUP BY o_orderpriority
    """,
    "q2_min_per_group_subquery": """
        SELECT s_suppkey, s_name, s_nationkey, s_acctbal
        FROM supplier s
        WHERE s_acctbal = (
          SELECT min(s2.s_acctbal) FROM supplier s2
          WHERE s2.s_nationkey = s.s_nationkey
        )
    """,
    "unpivot_stack": """
        WITH wide AS (
          SELECT l_returnflag,
                 round(sum(l_quantity), 2) AS sum_qty,
                 round(sum(l_tax), 2) AS sum_tax
          FROM lineitem GROUP BY l_returnflag
        )
        SELECT l_returnflag, 'qty' AS metric, sum_qty AS value FROM wide
        UNION ALL
        SELECT l_returnflag, 'tax' AS metric, sum_tax AS value FROM wide
    """,
    "expr_misc": """
        SELECT l_orderkey,
               greatest(l_quantity, l_tax, l_discount) AS g3,
               least(l_quantity, l_tax, l_discount) AS l3,
               coalesce(nullif(l_returnflag, 'N'), 'none') AS flag_or_none,
               l_orderkey & 255 AS b_and,
               l_orderkey | 4096 AS b_or,
               xor(l_orderkey, 85) AS b_xor,
               l_orderkey << 2 AS b_shl,
               l_orderkey >> 3 AS b_shr
        FROM lineitem WHERE l_linenumber = 4
    """,
}
