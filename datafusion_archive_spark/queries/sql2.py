"""ANSI-SQL surface wave 3: recursive CTEs and correlated LATERAL
subqueries — both absent from the reference planner
(``/root/reference/src/sqlplanner.rs`` handles plain
SELECT/WHERE/GROUP BY only; CTEs and laterals never parse).

Both queries run through ``spark.sql`` so the engine surface exercised
is the SQL front end itself, not a DataFrame re-formulation.
"""

from __future__ import annotations

from datafusion_archive_spark.functions.rounding import decimal_sum_sql


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
}
