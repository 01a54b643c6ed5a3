"""TPC-H-analog wave 2 (q4/q6/q10/q12/q14/q18/q19 shapes adapted to
the driver's schema) plus advanced window functions and ordering
semantics. The reference executes none of these (joins/sorts/windows
are roadmap — SURVEY §2.5); they complete the "a user of the reference
could run every query they run today, and the ones its roadmap
promised" story.

Determinism: percent_rank/cume_dist are small-rational outputs →
half-up floor rounding on both sides (see functions.rounding);
NULLS FIRST/LAST is always explicit in the oracle because Spark
defaults ASC NULLS FIRST while DuckDB defaults NULLS LAST.
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from datafusion_archive_spark.functions.rounding import decimal_sum, round_half_up
from datafusion_archive_spark.operators.util import load_table


def _t(spark, sf_dir, name):
    return load_table(spark, sf_dir, name)


def q4_order_priority(spark, sf):
    """Q4 shape: EXISTS-correlated count per priority (late shipments)."""
    o = _t(spark, sf, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    l = _t(spark, sf, "lineitem")
    late = l.join(
        o, l.l_orderkey == o.o_orderkey
    ).filter(F.col("l_shipdate") > F.col("o_orderdate")).select(
        "l_orderkey"
    ).distinct()
    return (
        o.join(late, o.o_orderkey == late.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


def q6_forecast_revenue(spark, sf):
    """Q6: single-table filter + agg — entirely scan-side except one
    1-row reduce."""
    l = _t(spark, sf, "lineitem")
    return l.filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        & (F.col("l_discount").between(0.02, 0.06))
        & (F.col("l_quantity") < 24)
    ).agg(
        round_half_up(
            decimal_sum(F.col("l_extendedprice") * F.col("l_discount")), 2
        ).alias("revenue")
    )


def q10_returned_items(spark, sf):
    """Q10 shape: revenue lost to returns per customer, top 20."""
    l = _t(spark, sf, "lineitem").filter(F.col("l_returnflag") == "R")
    o = _t(spark, sf, "orders")
    c = _t(spark, sf, "customer")
    n = _t(spark, sf, "nation")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            round_half_up(
                decimal_sum(
                    F.col("l_extendedprice") * (1 - F.col("l_discount"))
                ),
                2,
            ).alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


def q12_priority_shipping(spark, sf):
    """Q12 shape: conditional counts per line status."""
    l = _t(spark, sf, "lineitem")
    o = _t(spark, sf, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


def q14_promo_effect(spark, sf):
    """Q14: promo revenue share (CASE inside aggregate + division)."""
    l = _t(spark, sf, "lineitem")
    p = _t(spark, sf, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .agg(
            F.round(
                F.lit(100.0)
                * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(0.0))
                / F.sum(rev),
                4,
            ).alias("promo_revenue_pct")
        )
    )


def q18_large_volume(spark, sf):
    """Q18 shape: HAVING over grouped fact, then join back to dims."""
    l = _t(spark, sf, "lineitem")
    big = (
        l.groupBy("l_orderkey")
        .agg(F.round(F.sum("l_quantity"), 2).alias("total_qty"))
        .filter(F.col("total_qty") > 150)
    )
    o = _t(spark, sf, "orders")
    c = _t(spark, sf, "customer")
    return (
        big.join(o, big.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select("c_custkey", "c_name", "l_orderkey", "o_totalprice", "total_qty")
        .orderBy(F.col("total_qty").desc(), F.col("l_orderkey"))
        .limit(50)
    )


def q19_disjunctive_predicates(spark, sf):
    """Q19 shape: OR of conjunctive brand/quantity/size bands — the
    optimizer must push the common join key and evaluate the residual
    disjunction post-join."""
    l = _t(spark, sf, "lineitem")
    p = _t(spark, sf, "part")
    cond = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("l_quantity").between(1, 11)
            & F.col("p_size").between(1, 5)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("l_quantity").between(10, 20)
            & F.col("p_size").between(1, 10)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("l_quantity").between(20, 30)
            & F.col("p_size").between(1, 15)
        )
    )
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .filter(cond)
        .agg(
            round_half_up(
                decimal_sum(
                    F.col("l_extendedprice") * (1 - F.col("l_discount"))
                ),
                2,
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


def q_window_ranks(spark, sf):
    """dense_rank / percent_rank / cume_dist / ntile over order values
    per customer segment.

    Scale: c_mktsegment has FIVE values, so the plain shared window
    hashed the whole customer table into 5 sort tasks. Since round 8
    the ranks come from :func:`operators.ranks.bucketed_group_rank`
    (rank on the NEGATED balance — monotone-exact for doubles — so
    DESC needs no operator special case; dense_rank from the distinct
    counts per bucket). c_acctbal is non-null in the schema, which the
    negation relies on: the operator sorts nulls first while DESC
    would put them last."""
    from datafusion_archive_spark.operators.ranks import (
        bucketed_group_rank,
        cume_dist_expr,
        ntile_expr,
        percent_rank_expr,
    )

    c = _t(spark, sf, "customer").select(
        "c_custkey", "c_mktsegment", (-F.col("c_acctbal")).alias("_negbal")
    )
    ranked = bucketed_group_rank(
        c,
        ["c_mktsegment"],
        "_negbal",
        tiebreak=["c_custkey"],
        dense_col="_dense",
    )
    r, n = F.col("_rank"), F.col("_n")
    return ranked.select(
        "c_custkey",
        "c_mktsegment",
        F.col("_dense").cast("int").alias("drank"),
        round_half_up(percent_rank_expr(r, n), 6).alias("prank"),
        round_half_up(cume_dist_expr(r, n), 6).alias("cdist"),
        ntile_expr(r, n, 4).alias("quartile"),
    )


def q_window_frames(spark, sf):
    """first/last value with explicit frames + a sliding 3-row mean."""
    o = _t(spark, sf, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    sliding = w.rowsBetween(-1, 1)
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.first("o_totalprice").over(full).alias("first_price"),
        F.last("o_totalprice").over(full).alias("last_price"),
        # half-up formula, not F.round: a 3-row mean lands on decimal
        # midpoints often enough to bite (see functions.rounding)
        round_half_up(F.avg("o_totalprice").over(sliding), 2).alias("mavg3"),
    )


def q_nulls_ordering(spark, sf):
    """Explicit NULLS FIRST/LAST with LIMIT — Spark defaults NULLS
    FIRST on ASC, DuckDB defaults NULLS LAST, so portable queries pin
    it (SURVEY §7.7 discipline)."""
    d = _t(spark, sf, "documents")
    v = F.expr("nullif(n_chars % 7, 0)")
    return (
        d.select("doc_id", v.alias("mod7_or_null"))
        .orderBy(
            F.col("mod7_or_null").asc_nulls_first(), F.col("doc_id").asc()
        )
        .limit(30)
    )


def q_regexp_extract(spark, sf):
    """Regex extraction + containment (Java regex ∩ RE2 syntax)."""
    p = _t(spark, sf, "part")
    return p.select(
        "p_partkey",
        F.regexp_extract("p_name", r"^(\w+)", 1).alias("first_word"),
        F.regexp_extract("p_brand", r"#(\d+)", 1).alias("brand_num"),
        F.col("p_name").rlike("gear|bolt").alias("is_hardware"),
    )


QUERIES = {
    "q4_order_priority": q4_order_priority,
    "q6_forecast_revenue": q6_forecast_revenue,
    "q10_returned_items": q10_returned_items,
    "q12_priority_shipping": q12_priority_shipping,
    "q14_promo_effect": q14_promo_effect,
    "q18_large_volume": q18_large_volume,
    "q19_disjunctive_predicates": q19_disjunctive_predicates,
    "window_ranks": q_window_ranks,
    "window_frames": q_window_frames,
    "nulls_ordering": q_nulls_ordering,
    "regexp_extract": q_regexp_extract,
}

ORACLES = {
    "q4_order_priority": """
        SELECT o_orderpriority, count(*) AS order_count
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
          AND EXISTS (SELECT 1 FROM lineitem
                      WHERE l_orderkey = o_orderkey
                        AND l_shipdate > o_orderdate)
        GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
    "q6_forecast_revenue": """
        SELECT floor(CAST(sum(CAST(l_extendedprice * l_discount AS DECIMAL(27,6))) AS DOUBLE) * 100 + 0.5) / 100.0 AS revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
          AND l_discount BETWEEN 0.02 AND 0.06
          AND l_quantity < 24
    """,
    "q10_returned_items": """
        SELECT c_custkey, c_name, n_name,
               floor(CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(27,6))) AS DOUBLE) * 100 + 0.5) / 100.0 AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        WHERE l_returnflag = 'R'
        GROUP BY c_custkey, c_name, n_name
        ORDER BY revenue DESC, c_custkey LIMIT 20
    """,
    "q12_priority_shipping": """
        SELECT l_linestatus,
               sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                        THEN 1 ELSE 0 END)::BIGINT AS high_line_count,
               sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                        THEN 1 ELSE 0 END)::BIGINT AS low_line_count
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY l_linestatus
    """,
    "q14_promo_effect": """
        SELECT round(100.0 * sum(CASE WHEN p_type = 'PROMO'
                 THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END)
               / sum(l_extendedprice * (1 - l_discount)), 4)
               AS promo_revenue_pct
        FROM lineitem JOIN part ON l_partkey = p_partkey
    """,
    "q18_large_volume": """
        WITH big AS (
          SELECT l_orderkey, round(sum(l_quantity), 2) AS total_qty
          FROM lineitem GROUP BY l_orderkey
          HAVING round(sum(l_quantity), 2) > 150
        )
        SELECT c_custkey, c_name, l_orderkey, o_totalprice, total_qty
        FROM big
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        ORDER BY total_qty DESC, l_orderkey LIMIT 50
    """,
    "q19_disjunctive_predicates": """
        SELECT floor(CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(27,6))) AS DOUBLE) * 100 + 0.5) / 100.0 AS revenue,
               count(*) AS n_lines
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE (p_brand = 'Brand#12' AND l_quantity BETWEEN 1 AND 11
               AND p_size BETWEEN 1 AND 5)
           OR (p_brand = 'Brand#23' AND l_quantity BETWEEN 10 AND 20
               AND p_size BETWEEN 1 AND 10)
           OR (p_brand = 'Brand#3' AND l_quantity BETWEEN 20 AND 30
               AND p_size BETWEEN 1 AND 15)
    """,
    "window_ranks": """
        -- drank gets its own VALUE-ONLY window: dense_rank over an
        -- ordering that includes the unique c_custkey tiebreak
        -- degenerates to row_number, which only agrees with the
        -- value-dense engine semantics while c_acctbal happens to be
        -- collision-free (true at sf0.01, false at sf0.1 — the r10
        -- cross-sf sweep caught exactly that divergence; pinned on a
        -- tie-heavy frame in tests/test_round10.py).
        SELECT c_custkey, c_mktsegment,
               CAST(dense_rank() OVER wd AS INTEGER) AS drank,
               floor(percent_rank() OVER w * 1000000 + 0.5) / 1000000.0
                 AS prank,
               floor(cume_dist() OVER w * 1000000 + 0.5) / 1000000.0
                 AS cdist,
               CAST(ntile(4) OVER w AS INTEGER) AS quartile
        FROM customer
        WINDOW w AS (PARTITION BY c_mktsegment
                     ORDER BY c_acctbal DESC, c_custkey),
               wd AS (PARTITION BY c_mktsegment
                      ORDER BY c_acctbal DESC)
    """,
    "window_frames": """
        SELECT o_orderkey, o_custkey,
               first_value(o_totalprice) OVER wf AS first_price,
               last_value(o_totalprice) OVER wf AS last_price,
               floor(avg(o_totalprice) OVER ws * 100 + 0.5) / 100.0 AS mavg3
        FROM orders
        WINDOW wf AS (PARTITION BY o_custkey
                      ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING
                               AND UNBOUNDED FOLLOWING),
               ws AS (PARTITION BY o_custkey
                      ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING)
    """,
    "nulls_ordering": """
        SELECT doc_id, nullif(n_chars % 7, 0) AS mod7_or_null
        FROM documents
        ORDER BY mod7_or_null ASC NULLS FIRST, doc_id ASC
        LIMIT 30
    """,
    "regexp_extract": """
        SELECT p_partkey,
               regexp_extract(p_name, '^(\\w+)', 1) AS first_word,
               regexp_extract(p_brand, '#(\\d+)', 1) AS brand_num,
               regexp_matches(p_name, 'gear|bolt') AS is_hardware
        FROM part
    """,
}
