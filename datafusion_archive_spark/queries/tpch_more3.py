"""TPC-H analog wave 4 — the remaining distinct TPC-H plan shapes
(q9/q11/q16/q20/q21), adapted to the driver's reduced schema (no
partsupp table, no commit/receipt dates, no comment columns):

- q9  profit by nation×year: cost proxy ``0.4·p_retailprice·l_quantity``
  replaces ``ps_supplycost·l_quantity``.
- q11 important stock: per-part lineitem value for one nation's
  suppliers vs a scalar fraction-of-total threshold (availqty·cost →
  extendedprice sums; exact-decimal comparison so the threshold cut is
  engine-deterministic).
- q16 supplier relationship: distinct (part,supplier) pairs come from
  lineitem instead of partsupp; "complaint" suppliers → negative
  account balance.
- q20 part promotion: a supplier qualifies when it shipped the
  dominant share (>50%) of a 'small%' part in 1997 (availqty > ½
  shipped → shipped > ½ total).
- q21 orders waiting: "late" = shipped >60 days after order date
  (receipt>commit is unavailable); same EXISTS / NOT-EXISTS
  multi-supplier structure, expressed as semi + anti joins.

Reference parity note: joins/subqueries are roadmap-only there
(`/root/reference/ROADMAP.md:33`); these pin the declared surface.
All money sums go through decimal_sum + half-up rounding
(see functions/rounding.py) for partition-order independence.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from datafusion_archive_spark.functions.rounding import (
    decimal_sum,
    decimal_sum_sql,
    round_half_up,
    round_half_up_sql,
)
from datafusion_archive_spark.operators.util import load_table


def _t(spark, sf_dir, name):
    return load_table(spark, sf_dir, name)


def q9_product_type_profit(spark, sf):
    """Q9: profit by supplier nation × ship year over '%red%' parts.

    part/supplier/nation are broadcast (dim tables); the only shuffle
    is the final 2-key aggregation, with map-side partials."""
    l = _t(spark, sf, "lineitem")
    p = _t(spark, sf, "part").filter(F.col("p_name").like("%red%"))
    s = _t(spark, sf, "supplier")
    n = _t(spark, sf, "nation")
    amount = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - 0.4 * F.col("p_retailprice") * F.col("l_quantity")
    )
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("l_shipdate").alias("o_year"),
        )
        .agg(round_half_up(decimal_sum(amount), 2).alias("sum_profit"))
        .orderBy("nation", F.col("o_year").desc())
    )


def q11_important_stock(spark, sf):
    """Q11: parts whose lineitem value (for NATION_3's suppliers)
    exceeds 2× the per-part average — TPC-H scales its q11 fraction by
    1/SF to stay selective; comparing against the mean is the
    scale-free equivalent (a fixed fraction returns everything at
    sf0.001 and nothing at sf0.1).

    The cut compares exact decimal sums rendered to double —
    ``value·n_parts > 2·total`` — so borderline groups can't flip
    between engines or partition orders. The scalar (count, total) row
    is broadcast."""
    l = _t(spark, sf, "lineitem")
    s = _t(spark, sf, "supplier")
    n = _t(spark, sf, "nation").filter(F.col("n_name") == "NATION_3")
    v = (
        l.join(F.broadcast(s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)),
               l.l_suppkey == s.s_suppkey)
        .groupBy(F.col("l_partkey").alias("ps_partkey"))
        .agg(F.sum(F.col("l_extendedprice").cast("decimal(27,6)")).alias("val"))
    )
    tot = v.agg(
        F.sum("val").cast("double").alias("total"),
        F.count(F.lit(1)).alias("n_parts"),
    )
    return (
        v.join(F.broadcast(tot))
        .filter(
            F.col("val").cast("double") * F.col("n_parts")
            > 2.0 * F.col("total")
        )
        .select("ps_partkey", F.col("val").cast("double").alias("value"))
        .orderBy(F.col("value").desc())
    )


def q16_parts_supplier_relationship(spark, sf):
    """Q16: supplier count per (brand, type, size) from distinct
    lineitem (part, supplier) pairs, excluding one brand, PROMO type,
    and negative-balance suppliers.

    The pair-distinct and the countDistinct shuffle on the same keys;
    part and the bad-supplier set are broadcast."""
    l = _t(spark, sf, "lineitem")
    p = _t(spark, sf, "part").filter(
        (F.col("p_brand") != "Brand#5")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 4, 9, 14, 19, 23, 36, 45)
    )
    bad = _t(spark, sf, "supplier").filter(F.col("s_acctbal") < 0).select(
        "s_suppkey"
    )
    pairs = l.select("l_partkey", "l_suppkey").distinct()
    return (
        pairs.join(F.broadcast(p), F.col("l_partkey") == p.p_partkey)
        .join(
            F.broadcast(bad),
            F.col("l_suppkey") == F.col("s_suppkey"),
            "left_anti",
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(
            F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size"
        )
    )


def q20_potential_part_promotion(spark, sf):
    """Q20: suppliers that shipped the dominant share (>50%) of some
    'small%' part during 1997.

    Quantity sums are integer-valued doubles (exact), so the 0.5×
    comparison is deterministic. The qualifying-supplier set rides a
    semi join; shipped/total aggregate on the same l_partkey key so
    AQE can collapse the pair into one shuffle."""
    p = _t(spark, sf, "part").filter(F.col("p_name").like("small%"))
    l = _t(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    shipped = (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("qty"))
    )
    tot = shipped.groupBy(F.col("l_partkey").alias("tp")).agg(
        F.sum("qty").alias("total_qty")
    )
    dominant = (
        shipped.join(tot, shipped.l_partkey == tot.tp)
        .filter(F.col("qty") > 0.5 * F.col("total_qty"))
        .select("l_suppkey")
    )
    s = _t(spark, sf, "supplier")
    return (
        s.join(dominant, s.s_suppkey == dominant.l_suppkey, "left_semi")
        .select("s_suppkey", "s_name", "s_acctbal")
        .orderBy("s_name")
    )


def q21_suppliers_kept_orders_waiting(spark, sf):
    """Q21: suppliers whose late shipment (>60 days after order date)
    was the sole late one on a multi-supplier finished order.

    EXISTS → left_semi, NOT EXISTS → left_anti, both on the orderkey
    equi-key with a suppkey inequality residual — Spark keeps the
    shuffle on l_orderkey for all three legs."""
    forders = _t(spark, sf, "orders").filter(
        F.col("o_orderstatus") == "F"
    ).select("o_orderkey", "o_orderdate")
    l = _t(spark, sf, "lineitem")
    late = l.join(forders, l.l_orderkey == forders.o_orderkey).filter(
        F.col("l_shipdate")
        > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    )
    all_pairs = l.select(
        F.col("l_orderkey").alias("ok2"), F.col("l_suppkey").alias("sk2")
    ).distinct()
    late_pairs = late.select(
        F.col("l_orderkey").alias("ok3"), F.col("l_suppkey").alias("sk3")
    ).distinct()
    s = _t(spark, sf, "supplier")
    return (
        late.join(
            all_pairs,
            (F.col("l_orderkey") == F.col("ok2"))
            & (F.col("l_suppkey") != F.col("sk2")),
            "left_semi",
        )
        .join(
            late_pairs,
            (F.col("l_orderkey") == F.col("ok3"))
            & (F.col("l_suppkey") != F.col("sk3")),
            "left_anti",
        )
        .join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(100)
    )


QUERIES = {
    "q9_product_type_profit": q9_product_type_profit,
    "q11_important_stock": q11_important_stock,
    "q16_parts_supplier_relationship": q16_parts_supplier_relationship,
    "q20_potential_part_promotion": q20_potential_part_promotion,
    "q21_suppliers_kept_orders_waiting": q21_suppliers_kept_orders_waiting,
}

_PROFIT = decimal_sum_sql(
    "l_extendedprice*(1-l_discount) - 0.4*p_retailprice*l_quantity"
)

ORACLES = {
    "q9_product_type_profit": f"""
        SELECT n_name AS nation,
               CAST(year(l_shipdate) AS INTEGER) AS o_year,
               {round_half_up_sql(_PROFIT, 2)} AS sum_profit
        FROM lineitem JOIN part ON l_partkey = p_partkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        WHERE p_name LIKE '%red%'
        GROUP BY 1, 2 ORDER BY nation, o_year DESC
    """,
    "q11_important_stock": """
        WITH v AS (
          SELECT l_partkey AS ps_partkey,
                 sum(CAST(l_extendedprice AS DECIMAL(27,6))) AS val
          FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
          JOIN nation ON s_nationkey = n_nationkey
          WHERE n_name = 'NATION_3' GROUP BY 1)
        SELECT ps_partkey, CAST(val AS DOUBLE) AS value
        FROM v
        WHERE CAST(val AS DOUBLE) * (SELECT count(*) FROM v)
              > 2.0 * (SELECT CAST(sum(val) AS DOUBLE) FROM v)
        ORDER BY value DESC
    """,
    "q16_parts_supplier_relationship": """
        SELECT p_brand, p_type, p_size,
               count(DISTINCT l_suppkey) AS supplier_cnt
        FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
        JOIN part ON l_partkey = p_partkey
        WHERE p_brand <> 'Brand#5' AND p_type <> 'PROMO'
          AND p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
          AND l_suppkey NOT IN
              (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        GROUP BY 1, 2, 3
        ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
    "q20_potential_part_promotion": """
        WITH shipped AS (
          SELECT l_suppkey, l_partkey, sum(l_quantity) AS qty
          FROM lineitem JOIN part ON l_partkey = p_partkey
          WHERE p_name LIKE 'small%'
            AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
            AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
          GROUP BY 1, 2),
        tot AS (SELECT l_partkey AS tp, sum(qty) AS total_qty
                FROM shipped GROUP BY 1)
        SELECT s_suppkey, s_name, s_acctbal FROM supplier
        WHERE s_suppkey IN (
          SELECT sh.l_suppkey FROM shipped sh JOIN tot ON sh.l_partkey = tp
          WHERE sh.qty > 0.5 * total_qty)
        ORDER BY s_name
    """,
    "q21_suppliers_kept_orders_waiting": """
        SELECT s_name, count(*) AS numwait
        FROM lineitem l1
        JOIN orders ON o_orderkey = l1.l_orderkey AND o_orderstatus = 'F'
        JOIN supplier ON s_suppkey = l1.l_suppkey
        WHERE l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
          AND EXISTS (SELECT 1 FROM lineitem l2
                      WHERE l2.l_orderkey = l1.l_orderkey
                        AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (SELECT 1 FROM lineitem l3
                          WHERE l3.l_orderkey = l1.l_orderkey
                            AND l3.l_suppkey <> l1.l_suppkey
                            AND l3.l_shipdate
                                > o_orderdate + INTERVAL 60 DAY)
        GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 100
    """,
}
