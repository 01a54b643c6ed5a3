"""ANSI-SQL surface wave 3: recursive CTEs and correlated LATERAL
subqueries — both absent from the reference planner
(``/root/reference/src/sqlplanner.rs`` handles plain
SELECT/WHERE/GROUP BY only; CTEs and laterals never parse).

Both queries run through ``spark.sql`` so the engine surface exercised
is the SQL front end itself, not a DataFrame re-formulation.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from datafusion_archive_spark.functions.rounding import (
    decimal_sum,
    decimal_sum_sql,
    round_half_up,
    round_half_up_sql,
)
from datafusion_archive_spark.operators.merge import merge_upsert


def _register(spark, sf, *names):
    for t in names:
        spark.read.parquet(f"{sf}/{t}.parquet").createOrReplaceTempView(
            f"{t}_v"
        )


def q_recursive_month_grid(spark, sf):
    """WITH RECURSIVE month dimension (80 iterations, 1995-01 →
    2001-08) left-joined to per-month order aggregates, zero-filled.

    The recursion generates the *dimension* side — constant-size,
    driver-cheap — while the fact side stays one hash aggregate, so
    the shape survives any fact-table scale. Revenue uses the exact
    decimal path so the oracle hash-matches.
    """
    _register(spark, sf, "orders")
    return spark.sql(
        f"""
        WITH RECURSIVE months(m) AS (
          SELECT CAST('1995-01-01' AS DATE)
          UNION ALL
          SELECT CAST(m + INTERVAL '1' MONTH AS DATE)
          FROM months WHERE m < CAST('2001-08-01' AS DATE)
        ),
        agg AS (
          SELECT date_format(o_orderdate, 'yyyy-MM') AS month,
                 count(*) AS n,
                 {_spark_decimal_sum("o_totalprice")} AS rev
          FROM orders_v GROUP BY 1
        )
        SELECT date_format(m, 'yyyy-MM') AS month,
               coalesce(n, 0) AS n_orders,
               coalesce(rev, 0.0) AS revenue
        FROM months LEFT JOIN agg ON date_format(m, 'yyyy-MM') = month
        """
    )


def q_lateral_top2_per_priority(spark, sf):
    """Correlated LATERAL subquery with ORDER BY + LIMIT: the top-2
    orders by price for every order priority. Catalyst decorrelates
    the lateral into a ranked window join — no per-row subquery
    execution — which is exactly the rewrite a warehouse user expects
    to get for free."""
    _register(spark, sf, "orders")
    return spark.sql(
        """
        SELECT p.o_orderpriority, t.o_orderkey, t.o_totalprice
        FROM (SELECT DISTINCT o_orderpriority FROM orders_v) p,
        LATERAL (
          SELECT o_orderkey, o_totalprice
          FROM orders_v o
          WHERE o.o_orderpriority = p.o_orderpriority
          ORDER BY o_totalprice DESC, o_orderkey
          LIMIT 2
        ) t
        """
    )


def q_merge_upsert_orders(spark, sf):
    """MERGE INTO semantics (WHEN MATCHED UPDATE * / WHEN NOT MATCHED
    INSERT *) without a lakehouse format: every 10th order arrives as
    an update (+10% reprice) AND as a brand-new insert under a shifted
    key; ``merge_upsert`` composes the result as left-anti + union —
    one shuffle on the merge key. The certified aggregate replays the
    merged table, so a dropped update, duplicated key, or lost insert
    breaks the hash match. Reference has no write path at all
    (``physicalplan.rs:25-29``)."""
    orders = spark.read.parquet(f"{sf}/orders.parquet")
    updated = orders.filter(F.col("o_orderkey") % 10 == 0).withColumn(
        "o_totalprice", round_half_up(F.col("o_totalprice") * 1.1, 2)
    )
    inserts = updated.withColumn(
        "o_orderkey", F.col("o_orderkey") + 100_000_000
    )
    source = updated.unionByName(inserts)
    merged = merge_upsert(orders, source, "o_orderkey")
    return merged.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        round_half_up(decimal_sum(F.col("o_totalprice")), 2).alias(
            "total_price"
        ),
    )


def q_join_null_safe(spark, sf):
    """Null-safe equality join (``<=>`` / IS NOT DISTINCT FROM): rows
    whose keys are BOTH NULL match each other, unlike plain equality.
    Spark plans EqualNullSafe as a hash-join key — this must NOT
    degrade to a cartesian product (plan-asserted in tests)."""
    c = (
        spark.read.parquet(f"{sf}/customer.parquet")
        .withColumn(
            "k",
            F.expr(
                "CASE WHEN c_custkey % 11 = 0 THEN NULL ELSE c_nationkey END"
            ),
        )
        .select("c_custkey", "k")
    )
    s = (
        spark.read.parquet(f"{sf}/supplier.parquet")
        .withColumn(
            "k",
            F.expr(
                "CASE WHEN s_suppkey % 7 = 0 THEN NULL ELSE s_nationkey END"
            ),
        )
        .select("s_suppkey", F.col("k").alias("sk"))
    )
    j = c.join(s, c["k"].eqNullSafe(s["sk"]))
    return j.groupBy(
        F.coalesce(F.col("k").cast("string"), F.lit("<null>")).alias("key")
    ).agg(F.count(F.lit(1)).alias("n_pairs"))


def _spark_decimal_sum(col: str) -> str:
    """SQL-string twin of functions.rounding.decimal_sum (same
    split-integer-micros construction, Spark syntax)."""
    micros = f"CAST(round({col} * 1000000) AS LONG)"
    return (
        f"CAST((sum({micros} div 1000000) "
        f"* CAST(1000000 AS DECIMAL(32,0)) "
        f"+ sum({micros} % 1000000)) "
        f"/ 1000000 AS DOUBLE)"
    )


QUERIES = {
    "recursive_month_grid": q_recursive_month_grid,
    "lateral_top2_per_priority": q_lateral_top2_per_priority,
    "merge_upsert_orders": q_merge_upsert_orders,
    "join_null_safe": q_join_null_safe,
}

ORACLES = {
    "recursive_month_grid": f"""
        WITH RECURSIVE months(m) AS (
          SELECT CAST('1995-01-01' AS DATE)
          UNION ALL
          SELECT CAST(m + INTERVAL 1 MONTH AS DATE)
          FROM months WHERE m < CAST('2001-08-01' AS DATE)
        ),
        agg AS (
          SELECT strftime(o_orderdate, '%Y-%m') AS month,
                 count(*) AS n,
                 {decimal_sum_sql("o_totalprice")} AS rev
          FROM orders GROUP BY 1
        )
        SELECT strftime(m, '%Y-%m') AS month,
               coalesce(n, 0) AS n_orders,
               coalesce(rev, 0.0) AS revenue
        FROM months LEFT JOIN agg ON strftime(m, '%Y-%m') = month
    """,
    "lateral_top2_per_priority": """
        SELECT p.o_orderpriority, t.o_orderkey, t.o_totalprice
        FROM (SELECT DISTINCT o_orderpriority FROM orders) p,
        LATERAL (
          SELECT o_orderkey, o_totalprice
          FROM orders o
          WHERE o.o_orderpriority = p.o_orderpriority
          ORDER BY o_totalprice DESC, o_orderkey
          LIMIT 2
        ) t
    """,
    "merge_upsert_orders": f"""
        WITH src AS (
          SELECT o_orderkey, o_custkey, o_orderstatus,
                 {round_half_up_sql("o_totalprice * 1.1", 2)} AS o_totalprice,
                 o_orderdate, o_orderpriority
          FROM orders WHERE o_orderkey % 10 = 0
          UNION ALL
          SELECT o_orderkey + 100000000, o_custkey, o_orderstatus,
                 {round_half_up_sql("o_totalprice * 1.1", 2)},
                 o_orderdate, o_orderpriority
          FROM orders WHERE o_orderkey % 10 = 0
        ),
        merged AS (
          SELECT t.* FROM orders t
          WHERE NOT EXISTS (
            SELECT 1 FROM src s WHERE s.o_orderkey = t.o_orderkey
          )
          UNION ALL
          SELECT * FROM src
        )
        SELECT o_orderpriority,
               count(*) AS n_orders,
               {round_half_up_sql(decimal_sum_sql("o_totalprice"), 2)}
                 AS total_price
        FROM merged GROUP BY 1
    """,
    "join_null_safe": """
        WITH c AS (
          SELECT c_custkey,
                 CASE WHEN c_custkey % 11 = 0 THEN NULL
                      ELSE c_nationkey END AS k
          FROM customer
        ),
        s AS (
          SELECT s_suppkey,
                 CASE WHEN s_suppkey % 7 = 0 THEN NULL
                      ELSE s_nationkey END AS sk
          FROM supplier
        )
        SELECT coalesce(CAST(c.k AS VARCHAR), '<null>') AS key,
               count(*) AS n_pairs
        FROM c JOIN s ON c.k IS NOT DISTINCT FROM s.sk
        GROUP BY 1
    """,
}
