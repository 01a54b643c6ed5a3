"""Source/sink round-trip and skew-handling queries.

``sources_roundtrip`` drives the reference's *executing* core — the
CSV datasource (``/root/reference/src/execution/datasource.rs:33-58``,
``examples/csv_sql.rs:29-57``) plus its declared-only NDJSON format,
our ORC extension, and the write sink — through an oracle-checkable
query: parquet table slices are written to CSV, NDJSON, and ORC under
the repo, re-registered via the ``CREATE EXTERNAL TABLE`` dialect
(:mod:`datafusion_archive_spark.ddl`), joined back, and aggregated;
the DuckDB oracle computes the same aggregate from the original
parquet, so any fidelity loss in any write→DDL→scan path breaks the
hash match.

``salted_join_agg`` proves :func:`datafusion_archive_spark.operators.
skew.salted_join` preserves join semantics exactly: the salted fact ⋈
dim aggregate must hash-match a plain SQL join — salting only spreads
hot keys over ``factor`` shuffle sub-partitions.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from datafusion_archive_spark.context import ExecutionContext
from datafusion_archive_spark.functions.rounding import (
    decimal_sum,
    decimal_sum_sql,
    round_half_up,
    round_half_up_sql,
)
from datafusion_archive_spark.operators.skew import salted_join

#: scratch area for the round-trip files — must live under the repo
#: (the build sandbox owns nothing else); overwritten per run.
_IO_BASE = "/root/repo/.tmp_io"


def q_sources_roundtrip(spark, sf):
    base = f"{_IO_BASE}/{os.path.basename(sf.rstrip('/'))}"
    ctx = ExecutionContext(spark)
    nation = spark.read.parquet(f"{sf}/nation.parquet")
    supplier = spark.read.parquet(f"{sf}/supplier.parquet")
    region = spark.read.parquet(f"{sf}/region.parquet")
    ctx.write(nation, f"{base}/nation_csv", "csv", header="true")
    ctx.write(supplier, f"{base}/supplier_ndjson", "json")
    ctx.write(region, f"{base}/region_orc", "orc")
    ctx.sql(
        f"CREATE EXTERNAL TABLE nation_csv_rt ("
        f"n_nationkey INT, n_name VARCHAR, n_regionkey INT) "
        f"STORED AS CSV WITH HEADER ROW LOCATION '{base}/nation_csv'"
    )
    ctx.sql(
        f"CREATE EXTERNAL TABLE supplier_nd_rt ("
        f"s_suppkey BIGINT, s_name VARCHAR, s_nationkey INT, "
        f"s_acctbal DOUBLE) "
        f"STORED AS NDJSON LOCATION '{base}/supplier_ndjson'"
    )
    ctx.sql(
        f"CREATE EXTERNAL TABLE region_orc_rt "
        f"STORED AS ORC LOCATION '{base}/region_orc'"
    )
    # decimal-cast sum: exact 2dp money survives CSV/JSON text round-
    # trip and partition-order variation; final DOUBLE for dtype parity
    return ctx.sql(
        """
        SELECT r.r_name AS region,
               n.n_name AS nation,
               count(*) AS n_suppliers,
               CAST(sum(CAST(s.s_acctbal AS DECIMAL(12,2))) AS DOUBLE)
                 AS total_bal
        FROM supplier_nd_rt s
        JOIN nation_csv_rt n ON s.s_nationkey = n.n_nationkey
        JOIN region_orc_rt r ON n.n_regionkey = r.r_regionkey
        GROUP BY r.r_name, n.n_name
        """
    )


def q_partitioned_pruning(spark, sf):
    """Directory-partitioned layout end-to-end: orders re-written
    ``partitionBy(o_year)``, then scanned with a year predicate that
    must prune to one directory (``PartitionFilters`` in the plan —
    asserted in tests/test_plans.py). At 100 TB this IS the difference
    between scanning one day and scanning the table; the certified
    aggregate replays the pruned scan against the original parquet,
    so a partition-column encoding bug (year widening, null dirs)
    breaks the hash match."""
    base = f"{_IO_BASE}/{os.path.basename(sf.rstrip('/'))}_orders_by_year"
    orders = spark.read.parquet(f"{sf}/orders.parquet")
    (
        orders.withColumn("o_year", F.year("o_orderdate"))
        .write.mode("overwrite")
        .partitionBy("o_year")
        .parquet(base)
    )
    part = spark.read.parquet(base).filter(F.col("o_year") == 1997)
    return part.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        round_half_up(decimal_sum(F.col("o_totalprice")), 2).alias(
            "total_price"
        ),
    )


def q_console_script(spark, sf):
    """Drives the console's script pipeline (the reference console's
    batch mode, ``/root/reference/src/bin/console/main.rs:41-63``):
    quote-aware statement splitting, comment stripping, DDL
    interception, and query routing — everything the interactive
    binary does except terminal printing. The final SELECT is the
    certified result; the deliberately tricky script embeds a
    semicolon and a quote inside string literals plus a comment line,
    so a splitter regression breaks the driver row."""
    from datafusion_archive_spark.console import split_statements

    ctx = ExecutionContext(spark)
    script = f"""
      -- console-parity script: DDL, then an aggregate over it
      CREATE EXTERNAL TABLE li_console
      STORED AS PARQUET LOCATION '{sf}/lineitem.parquet';
      SELECT l_returnflag,
             count(*) AS n_open,
             sum(CASE WHEN l_returnflag = 'a;b' THEN 1 ELSE 0 END)
               AS semicolon_rows
      FROM li_console
      WHERE l_linestatus = 'O'
      GROUP BY l_returnflag
    """
    result = None
    for stmt in split_statements(script):
        out = ctx.sql(stmt)
        if out is not None:
            result = out
    return result


def q_salted_join_agg(spark, sf):
    l = spark.read.parquet(f"{sf}/lineitem.parquet").select(
        F.col("l_suppkey").alias("suppkey"), "l_quantity"
    )
    s = spark.read.parquet(f"{sf}/supplier.parquet").select(
        F.col("s_suppkey").alias("suppkey"), "s_name"
    )
    joined = salted_join(l, s, on="suppkey", factor=8)
    return joined.groupBy("s_name").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum("l_quantity").alias("total_qty"),
    )


def q_planir_roundtrip(spark, sf):
    """Authors a logical plan in the serde IR (scan → projection-rename
    → join → aggregate → sort → limit), serializes it to JSON,
    deserializes, builds and runs it — the reference's plan-serde
    round-trip (``/root/reference/src/logicalplan.rs:612-651``) driven
    end-to-end through an oracle-checked query. Catalyst still owns
    optimization: the IR builds lazy DataFrame ops."""
    from datafusion_archive_spark.plans import serde as P

    nation_renamed = P.projection(
        [
            P.alias(P.col("n_nationkey"), "c_nationkey"),
            P.alias(P.col("n_name"), "nation"),
        ],
        P.parquet_scan(f"{sf}/nation.parquet"),
    )
    plan = P.limit(
        10,
        P.sort(
            [{"expr": P.col("total_bal"), "asc": False},
             {"expr": P.col("nation"), "asc": True}],
            P.aggregate(
                [P.col("nation")],
                [
                    P.alias(P.agg("count", P.lit(1)), "n_customers"),
                    P.alias(
                        P.cast(
                            P.agg(
                                "sum",
                                P.cast(P.col("c_acctbal"), "decimal(12,2)"),
                            ),
                            "double",
                        ),
                        "total_bal",
                    ),
                ],
                P.join(
                    P.selection(
                        P.binop("gt", P.col("c_acctbal"), P.lit(0.0)),
                        P.parquet_scan(f"{sf}/customer.parquet"),
                    ),
                    nation_renamed,
                    on=["c_nationkey"],
                ),
            ),
        ),
    )
    wire = P.to_json(plan)
    assert P.to_json(P.from_json(wire)) == wire  # serde fixpoint
    return P.build(spark, P.from_json(wire))


QUERIES = {
    "sources_roundtrip": q_sources_roundtrip,
    "salted_join_agg": q_salted_join_agg,
    "planir_roundtrip": q_planir_roundtrip,
    "console_script_sql": q_console_script,
    "partitioned_pruning": q_partitioned_pruning,
}

ORACLES = {
    "sources_roundtrip": """
        SELECT r.r_name AS region,
               n.n_name AS nation,
               count(*) AS n_suppliers,
               CAST(sum(CAST(s.s_acctbal AS DECIMAL(12,2))) AS DOUBLE)
                 AS total_bal
        FROM supplier s
        JOIN nation n ON s.s_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        GROUP BY r.r_name, n.n_name
    """,
    "salted_join_agg": """
        SELECT s_name,
               count(*) AS n_items,
               sum(l_quantity) AS total_qty
        FROM lineitem l
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        GROUP BY s_name
    """,
    "partitioned_pruning": f"""
        SELECT o_orderpriority,
               count(*) AS n_orders,
               {round_half_up_sql(decimal_sum_sql("o_totalprice"), 2)}
                 AS total_price
        FROM orders
        WHERE EXTRACT(year FROM o_orderdate) = 1997
        GROUP BY 1
    """,
    "console_script_sql": """
        SELECT l_returnflag,
               count(*) AS n_open,
               CAST(sum(CASE WHEN l_returnflag = 'a;b' THEN 1 ELSE 0 END)
                    AS BIGINT) AS semicolon_rows
        FROM lineitem
        WHERE l_linestatus = 'O'
        GROUP BY l_returnflag
    """,
    "planir_roundtrip": """
        SELECT n.n_name AS nation,
               count(*) AS n_customers,
               CAST(sum(CAST(c.c_acctbal AS DECIMAL(12,2))) AS DOUBLE)
                 AS total_bal
        FROM customer c
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        WHERE c.c_acctbal > 0.0
        GROUP BY n.n_name
        ORDER BY total_bal DESC, nation
        LIMIT 10
    """,
}


def q_xml_roundtrip(spark, sf):
    """XML write→DDL→scan round-trip (Spark 4 native XML, our
    ``STORED AS XML ROWTAG`` grammar extension): the customer slice is
    written as XML, re-registered, joined to nation, and aggregated;
    the oracle computes the same aggregate from the original parquet,
    so any fidelity loss in the XML path breaks the hash.

    Scale: the XML codec is the per-file cost; the aggregate plan is
    the standard broadcast-dim join + one Exchange."""
    base = f"{_IO_BASE}/{os.path.basename(sf.rstrip('/'))}_xml"
    ctx = ExecutionContext(spark)
    customer = spark.read.parquet(f"{sf}/customer.parquet")
    (
        customer.write.mode("overwrite")
        .format("xml")
        .option("rowTag", "customer")
        .save(f"{base}/customer_xml")
    )
    ctx.sql(
        f"CREATE EXTERNAL TABLE customer_xml_rt ("
        f"c_custkey BIGINT, c_name VARCHAR, c_nationkey INT, "
        f"c_acctbal DOUBLE, c_mktsegment VARCHAR) "
        f"STORED AS XML ROWTAG 'customer' LOCATION '{base}/customer_xml'"
    )
    ctx.register_parquet("nation_pq", f"{sf}/nation.parquet")
    return ctx.sql(
        """
        SELECT n.n_name AS nation,
               c.c_mktsegment AS segment,
               count(*) AS n_customers,
               CAST(sum(CAST(c.c_acctbal AS DECIMAL(12,2))) AS DOUBLE)
                 AS total_bal
        FROM customer_xml_rt c
        JOIN nation_pq n ON c.c_nationkey = n.n_nationkey
        GROUP BY n.n_name, c.c_mktsegment
        """
    )


QUERIES["xml_roundtrip"] = q_xml_roundtrip
ORACLES["xml_roundtrip"] = """
    SELECT n.n_name AS nation,
           c.c_mktsegment AS segment,
           count(*) AS n_customers,
           CAST(sum(CAST(c.c_acctbal AS DECIMAL(12,2))) AS DOUBLE)
             AS total_bal
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name, c.c_mktsegment
"""
