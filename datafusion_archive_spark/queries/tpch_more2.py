"""TPC-H analog wave 3 (q13/q15/q17/q22 shapes) + map functions +
deterministic sampling. (q9/q11/q16/q20/q21 analogs, adapted around
the missing partsupp/comment columns, live in tpch_more3.py.)
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from datafusion_archive_spark.functions import text as TX
from datafusion_archive_spark.functions.rounding import (
    decimal_sum,
    round_half_up,
)
from datafusion_archive_spark.operators.util import load_table


def _t(spark, sf_dir, name):
    return load_table(spark, sf_dir, name)


def q13_customer_distribution(spark, sf):
    """Q13: distribution of customers by order count (left join so
    zero-order customers count, two-level aggregation)."""
    c = _t(spark, sf, "customer")
    o = _t(spark, sf, "orders").filter(
        F.col("o_orderpriority") != "5-LOW"
    )
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


def q15_top_supplier(spark, sf):
    """Q15: suppliers achieving the maximum quarterly revenue (revenue
    CTE + scalar max — ties all returned, like the spec)."""
    l = _t(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    revenue = l.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        round_half_up(
            decimal_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))),
            2,
        ).alias("total_revenue")
    )
    mx = revenue.agg(F.max("total_revenue").alias("mx"))
    s = _t(spark, sf, "supplier")
    return (
        revenue.join(F.broadcast(mx), F.col("total_revenue") == F.col("mx"))
        .join(s, F.col("supplier_no") == s.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
    )


def q17_small_quantity_revenue(spark, sf):
    """Q17: revenue from orders below 20% of a part's average quantity
    (correlated aggregate decorrelated into a join)."""
    l = _t(spark, sf, "lineitem")
    p = _t(spark, sf, "part").filter(F.col("p_brand") == "Brand#5")
    avg_qty = l.groupBy(F.col("l_partkey").alias("ap")).agg(
        (F.avg("l_quantity") * 0.2).alias("qty_threshold")
    )
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(avg_qty, l.l_partkey == F.col("ap"))
        .filter(F.col("l_quantity") < F.col("qty_threshold"))
        .agg(
            round_half_up(decimal_sum(F.col("l_extendedprice")) / 7.0, 2)
            .alias("avg_yearly")
        )
    )


def q22_global_sales_opportunity(spark, sf):
    """Q22 shape: bucket customers by a key prefix, keep
    above-average-balance customers with no orders (scalar subquery +
    anti join)."""
    c = _t(spark, sf, "customer").withColumn(
        "bucket", (F.col("c_custkey") % 7).cast("int")
    )
    avg_bal = c.filter(F.col("c_acctbal") > 0.0).agg(
        F.avg("c_acctbal").alias("ab")
    )
    o = _t(spark, sf, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return (
        c.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("ab"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
    )


def q_map_funcs(spark, sf):
    """Map construction + lookup + keys/values (scalarized)."""
    l = _t(spark, sf, "lineitem").filter(F.col("l_linenumber") == 5)
    m = F.map_from_arrays(
        F.array(F.lit("qty"), F.lit("tax")),
        F.array(F.col("l_quantity"), F.col("l_tax")),
    )
    return l.select(
        "l_orderkey",
        F.element_at(m, "qty").alias("m_qty"),
        F.element_at(m, "tax").alias("m_tax"),
        F.array_join(F.map_keys(m), ",").alias("m_keys"),
        F.size(F.map_values(m)).alias("n_vals"),
    )


def q_sample_deterministic(spark, sf):
    """Deterministic 10% sample via content hashing — reproducible
    across engines and runs, unlike TABLESAMPLE (the right way to
    carve stable eval/holdout splits from a 100 TB corpus)."""
    d = _t(spark, sf, "documents")
    h = TX.hash64(F.col("doc_id").cast("string"), seed=9)
    return d.filter(h % 10 == 0).select("doc_id", "lang", "n_chars")


QUERIES = {
    "q13_customer_distribution": q13_customer_distribution,
    "q15_top_supplier": q15_top_supplier,
    "q17_small_quantity_revenue": q17_small_quantity_revenue,
    "q22_global_sales_opportunity": q22_global_sales_opportunity,
    "map_funcs": q_map_funcs,
    "sample_deterministic": q_sample_deterministic,
}

_DS = "CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(27,6))) AS DOUBLE)"

ORACLES = {
    "q13_customer_distribution": """
        SELECT c_count, count(*) AS custdist
        FROM (
          SELECT c_custkey, count(o_orderkey) AS c_count
          FROM customer
          LEFT JOIN (SELECT * FROM orders
                     WHERE o_orderpriority <> '5-LOW') o
            ON c_custkey = o_custkey
          GROUP BY c_custkey
        ) t
        GROUP BY c_count
        ORDER BY custdist DESC, c_count DESC
    """,
    "q15_top_supplier": f"""
        WITH revenue AS (
          SELECT l_suppkey AS supplier_no,
                 floor({_DS} * 100 + 0.5) / 100.0 AS total_revenue
          FROM lineitem
          WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
            AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
          GROUP BY l_suppkey
        )
        SELECT s_suppkey, s_name, total_revenue
        FROM revenue JOIN supplier ON supplier_no = s_suppkey
        WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
    """,
    "q17_small_quantity_revenue": """
        WITH avg_qty AS (
          SELECT l_partkey AS ap, avg(l_quantity) * 0.2 AS qty_threshold
          FROM lineitem GROUP BY l_partkey
        )
        SELECT floor((CAST(sum(CAST(l_extendedprice AS DECIMAL(27,6)))
                           AS DOUBLE) / 7.0) * 100 + 0.5) / 100.0
                 AS avg_yearly
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        JOIN avg_qty ON l_partkey = ap
        WHERE p_brand = 'Brand#5' AND l_quantity < qty_threshold
    """,
    "q22_global_sales_opportunity": """
        SELECT CAST(c_custkey % 7 AS INTEGER) AS bucket,
               count(*) AS numcust,
               round(sum(c_acctbal), 2) AS totacctbal
        FROM customer
        WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer
                           WHERE c_acctbal > 0.0)
          AND NOT EXISTS (SELECT 1 FROM orders
                          WHERE o_custkey = c_custkey
                            AND o_orderpriority = '1-URGENT')
        GROUP BY 1
    """,
    "map_funcs": """
        SELECT l_orderkey,
               l_quantity AS m_qty,
               l_tax AS m_tax,
               'qty,tax' AS m_keys,
               2 AS n_vals
        FROM lineitem WHERE l_linenumber = 5
    """,
    "sample_deterministic": """
        SELECT doc_id, lang, n_chars
        FROM documents
        WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':9'), 1, 15))
              ::BIGINT % 10 = 0
    """,
}
