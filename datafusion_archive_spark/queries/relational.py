"""Core relational surface: every batch operator from SURVEY.md §2
(executed, planned, or declared in the reference) expressed as
idiomatic DataFrame plans, each with an exact DuckDB oracle.

Cross-engine determinism rules used throughout:

- Aggregates over floats are ``round(x, n)``-ed in BOTH engines —
  summation order differs between engines (and between Spark partitions)
  only in the last bits; per-row IEEE arithmetic is left unrounded
  (bit-identical by determinism of +,-,*,/).
- Result sets are unordered multisets unless the query's semantics are
  an ORDER BY + LIMIT; then the sort key includes a unique tiebreaker
  (SURVEY.md §7.7: never depend on incidental order).
- ``CAST(double AS int)`` truncates in Spark and in the reference
  (``/root/reference/tests/sql.rs:70-77``) but ROUNDS in DuckDB →
  oracles wrap the cast in ``trunc()``.
- Integer division: Spark ``div`` == DuckDB ``//`` (both truncate
  toward zero, matching the reference's Arrow typed kernels,
  ``src/execution/expression.rs:487-493``; SURVEY.md §7.5).
- Timestamps in output are rendered to strings on both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from datafusion_archive_spark.functions import geo
from datafusion_archive_spark.functions.rounding import decimal_sum, round_half_up
from datafusion_archive_spark.operators.util import load_table, salt_count


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# Scan / projection / filter / predicates (reference §2.1, §2.2 — the
# executing core: datasource.rs, projection.rs, filter.rs, expression.rs)
# ---------------------------------------------------------------------------


def q_scan_filter_project(spark, sf):
    """Projection + selection — the reference's canonical shape
    (``examples/csv_sql.rs:45``): predicates push to the parquet scan,
    only 4 columns are read (column pruning)."""
    return (
        _t(spark, sf, "lineitem")
        .filter((F.col("l_quantity") > 45) & (F.col("l_discount") < 0.02))
        .select("l_orderkey", "l_partkey", "l_quantity", "l_extendedprice")
    )


def q_predicate_between_in(spark, sf):
    """BETWEEN + IN predicates (reference comparison kernels,
    ``expression.rs:410-451``, extended to the full ANSI set)."""
    o = _t(spark, sf, "orders")
    return o.filter(
        F.col("o_totalprice").between(100000, 150000)
        & F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    ).select("o_orderkey", "o_totalprice", "o_orderpriority")


def q_filter_like(spark, sf):
    """LIKE / NOT LIKE — in the reference's Operator enum but never
    compiled (``src/logicalplan.rs:81-83``; SURVEY §2.2)."""
    p = _t(spark, sf, "part")
    return p.filter(
        F.col("p_name").like("%red%") & ~F.col("p_type").like("%PROMO%")
    ).select("p_partkey", "p_name", "p_type")


def q_null_predicates(spark, sf):
    """IS NULL / IS NOT NULL — planned, runtime commented out in the
    reference (``expression.rs:380-399``; goldens is_null_csv.csv)."""
    d = _t(spark, sf, "documents")
    ln = F.expr("nullif(lang, 'en')")
    return d.select(
        "doc_id",
        ln.alias("lang_or_null"),
        ln.isNull().alias("is_en"),
        ln.isNotNull().alias("is_not_en"),
    )


def q_cast(spark, sf):
    """CAST semantics (reference truncates float→int,
    ``tests/sql.rs:70-77``; golden test_cast.csv). Spark truncates too;
    the DuckDB oracle must trunc() explicitly since it rounds."""
    l = _t(spark, sf, "lineitem").filter(F.col("l_linenumber") == 1)
    return l.select(
        "l_orderkey",
        F.col("l_extendedprice").cast("bigint").alias("price_int"),
        (F.col("l_orderkey") % 128).cast("tinyint").alias("key_i8"),
        F.col("l_linenumber").cast("string").alias("ln_str"),
        F.col("l_quantity").cast("float").alias("qty_f32"),
    )


def q_arithmetic(spark, sf):
    """+ - * / % and integer division (reference math kernels
    ``expression.rs:466-493``; modulo declared but uncompiled, goldens
    numerics_modulo*.csv). Per-row IEEE ops — no rounding needed."""
    l = _t(spark, sf, "lineitem").filter(F.col("l_linenumber") == 3)
    return l.select(
        "l_orderkey",
        (F.col("l_quantity") + F.col("l_tax")).alias("a_add"),
        (F.col("l_extendedprice") - F.col("l_quantity")).alias("a_sub"),
        (F.col("l_quantity") * (1 - F.col("l_discount"))).alias("a_mul"),
        (F.col("l_extendedprice") / F.col("l_quantity")).alias("a_div"),
        (F.col("l_partkey") % 97).alias("a_mod"),
        F.expr("l_orderkey div 7").alias("a_idiv"),
    )


def q_literals_no_from(spark, sf):
    """SELECT without FROM — EmptyRelation in the reference, planner-only
    (``sqlplanner.rs:61-64``, exec stub ``context.rs:108-111``)."""
    return spark.sql(
        # 2.5 parses as DECIMAL(2,1) in Spark but the oracle fetches
        # DOUBLE — cast so the driver's dtype-sensitive hash matches
        "SELECT 1 AS i, CAST(2.5 AS DOUBLE) AS f, 'hello' AS s, true AS b, "
        "1 + 2 * 3 AS arith"
    )


def q_sqrt(spark, sf):
    """sqrt scalar function (reference golden test_sqrt.csv,
    planner test ``sqlplanner.rs:557-563``)."""
    return _t(spark, sf, "part").select(
        "p_partkey", F.sqrt("p_retailprice").alias("sqrt_price")
    )


def q_geo_udt(spark, sf):
    """ST_Point / ST_AsText UDF+UDT surface (reference smoke test,
    ``test/data/smoketest.sql:2-3``) — native struct + format_string,
    no Python UDF. Doubles are rounded to 1dp before formatting so the
    string rendering is engine-portable."""
    c = _t(spark, sf, "customer")
    pt = geo.st_point(
        F.col("c_nationkey").cast("double"), F.round(F.col("c_acctbal"), 1)
    )
    return c.select(
        "c_custkey",
        geo.st_astext(pt).alias("wkt"),
        pt.getField("x").alias("pt_x"),
        pt.getField("y").alias("pt_y"),
    )


# ---------------------------------------------------------------------------
# Aggregation (reference §2.4: aggregate.rs — min/max/sum executing,
# count/avg/count-distinct planned, HAVING rejected)
# ---------------------------------------------------------------------------


def q_agg_global(spark, sf):
    """Whole-table aggregate, no GROUP BY (``aggregate.rs:703-785``) +
    the planned-but-unimplemented COUNT / AVG / COUNT DISTINCT
    (``sqlplanner.rs:309-342``, ``ROADMAP.md:19-20``)."""
    return _t(spark, sf, "lineitem").agg(
        F.min("l_quantity").alias("min_qty"),
        F.max("l_quantity").alias("max_qty"),
        F.round(F.sum("l_extendedprice"), 2).alias("sum_price"),
        # decimal numerator + half-up: avg of exact-decimal values can
        # land on a rounding midpoint where float-sum order flips the
        # result (see functions.rounding)
        round_half_up(
            decimal_sum(F.col("l_discount")) / F.count(F.lit(1)), 6
        ).alias("avg_disc"),
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("l_orderkey").alias("n_orders"),
    )


def q1_pricing_summary(spark, sf):
    """Flagship: TPC-H Q1 pricing summary — grouped hash aggregate
    (reference ``aggregate.rs:787-952``, single-phase row-at-a-time;
    Spark runs partial+final hash aggregation with codegen)."""
    l = _t(spark, sf, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.filter(F.col("l_shipdate") <= F.lit("2000-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            # decimal_sum + half-up: revenue products are exact 4-6dp
            # decimals whose float sums land on .005 midpoints ~1% of
            # the time, where round() is engine/partition-order
            # dependent (see functions.rounding)
            round_half_up(decimal_sum(disc_price), 2).alias(
                "sum_disc_price"
            ),
            round_half_up(
                decimal_sum(disc_price * (1 + F.col("l_tax"))), 2
            ).alias("sum_charge"),
            round_half_up(
                decimal_sum(F.col("l_quantity")) / F.count(F.lit(1)), 4
            ).alias("avg_qty"),
            round_half_up(
                decimal_sum(F.col("l_extendedprice")) / F.count(F.lit(1)), 4
            ).alias("avg_price"),
            round_half_up(
                decimal_sum(F.col("l_discount")) / F.count(F.lit(1)), 4
            ).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def q_agg_having(spark, sf):
    """GROUP BY + HAVING — the reference rejects HAVING outright
    (``sqlplanner.rs:136-140``); roadmap-parity here."""
    return (
        _t(spark, sf, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_price"),
        )
        .filter(F.col("n") > 15000)
    )


def q_agg_count_distinct_group(spark, sf):
    return (
        _t(spark, sf, "customer")
        .groupBy("c_mktsegment")
        .agg(
            F.countDistinct("c_nationkey").alias("n_nations"),
            F.count(F.lit(1)).alias("n_cust"),
            round_half_up(
                decimal_sum(F.col("c_acctbal")) / F.count(F.lit(1)), 4
            ).alias("avg_bal"),
        )
    )


def q_agg_rollup(spark, sf):
    """ROLLUP grouping sets — absent from the reference (SURVEY §2.4
    'grouping sets / cube / rollup: none'); stock Spark."""
    return (
        _t(spark, sf, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        )
    )


def q_pivot(spark, sf):
    """Pivot on linestatus — conditional aggregation under the hood."""
    return (
        _t(spark, sf, "lineitem")
        .groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .agg(F.round(F.sum("l_extendedprice"), 2))
    )


# ---------------------------------------------------------------------------
# Sort / limit / top-k (reference §2.5: Sort and Limit planned, executor
# unimplemented — ``sqlplanner.rs:142-183``, gap ``context.rs:194``)
# ---------------------------------------------------------------------------


def q_sort_limit_topk(spark, sf):
    """ORDER BY + LIMIT — the reference's planned Limit(Sort(…)) shape
    (``sqlplanner.rs:669-675``, golden test_limit.csv). Spark executes
    this as TakeOrderedAndProject — no global sort materialization."""
    return (
        _t(spark, sf, "orders")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .select("o_orderkey", "o_totalprice")
        .limit(10)
    )


def q_distinct(spark, sf):
    return _t(spark, sf, "lineitem").select(
        "l_returnflag", "l_linestatus"
    ).distinct()


# ---------------------------------------------------------------------------
# Joins (reference §2.5: zero code, 0.7 roadmap "hash join and sort merge
# join", ROADMAP.md:33 — all stock Spark; Catalyst/AQE pick the strategy)
# ---------------------------------------------------------------------------


def q_join_inner_3way(spark, sf):
    """customer ⋈ nation ⋈ region — both dims are broadcast (tiny),
    so the fact side never shuffles."""
    c = _t(spark, sf, "customer").filter(F.col("c_acctbal") > 9000)
    n = _t(spark, sf, "nation")
    r = _t(spark, sf, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("c_custkey", "c_name", "n_name", "r_name")
    )


def q_join_left_outer(spark, sf):
    o = _t(spark, sf, "orders")
    rich = _t(spark, sf, "customer").filter(F.col("c_acctbal") > 8000)
    return (
        o.join(F.broadcast(rich), o.o_custkey == rich.c_custkey, "left")
        .select(
            "o_orderkey",
            "o_custkey",
            F.col("c_name").alias("rich_name"),
            F.coalesce("c_mktsegment", F.lit("NONE")).alias("segment"),
        )
    )


def q_join_semi(spark, sf):
    """LEFT SEMI (EXISTS) — customers with at least one big order."""
    c = _t(spark, sf, "customer")
    big = _t(spark, sf, "orders").filter(F.col("o_totalprice") > 400000)
    return c.join(
        big, c.c_custkey == big.o_custkey, "left_semi"
    ).select("c_custkey", "c_name")


def q_join_anti(spark, sf):
    """LEFT ANTI (NOT EXISTS) — customers with no big order. The right
    side is filtered so the result is non-empty at every sf (every
    testdata customer has *some* order — an unfiltered anti-join
    matches vacuously on 0 rows)."""
    c = _t(spark, sf, "customer")
    big = _t(spark, sf, "orders").filter(F.col("o_totalprice") > 300000)
    return c.join(big, c.c_custkey == big.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


def q_join_full_outer(spark, sf):
    """FULL OUTER over per-nation customer/supplier counts."""
    c = (
        _t(spark, sf, "customer")
        .groupBy(F.col("c_nationkey").alias("nk_c"))
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )
    s = (
        _t(spark, sf, "supplier")
        .groupBy(F.col("s_nationkey").alias("nk_s"))
        .agg(F.count(F.lit(1)).alias("n_suppliers"))
    )
    return c.join(s, c.nk_c == s.nk_s, "full").select(
        F.coalesce("nk_c", "nk_s").alias("nationkey"),
        F.coalesce("n_customers", F.lit(0)).alias("n_customers"),
        F.coalesce("n_suppliers", F.lit(0)).alias("n_suppliers"),
    )


def q3_shipping_priority(spark, sf):
    """TPC-H Q3 analog: 3-way join + grouped revenue + top-10.
    customer is broadcast; orders⋈lineitem shuffles on the join key
    once and the aggregation reuses that partitioning."""
    c = _t(spark, sf, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp")
    )
    l = _t(spark, sf, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-01-01").cast("timestamp")
    )
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            round_half_up(
                decimal_sum(
                    F.col("l_extendedprice") * (1 - F.col("l_discount"))
                ),
                2,
            ).alias("revenue")
        )
        .select(
            "l_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_orderpriority",
            "revenue",
        )
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


def q5_local_supplier(spark, sf):
    """TPC-H Q5 analog: 6-way join, revenue per nation in ASIA."""
    c = _t(spark, sf, "customer")
    o = _t(spark, sf, "orders")
    l = _t(spark, sf, "lineitem")
    s = _t(spark, sf, "supplier")
    n = _t(spark, sf, "nation")
    r = _t(spark, sf, "region").filter(F.col("r_name") == "ASIA")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(c, (o.o_custkey == c.c_custkey) & (c.c_nationkey == s.s_nationkey))
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(
            round_half_up(
                decimal_sum(
                    F.col("l_extendedprice") * (1 - F.col("l_discount"))
                ),
                2,
            ).alias("revenue")
        )
    )


def q_cte_scalar_subquery(spark, sf):
    """CTE + scalar subquery: customers above the mean balance."""
    return spark.sql(
        f"""
        WITH src AS (SELECT * FROM parquet.`{sf}/customer.parquet`),
        m AS (SELECT avg(c_acctbal) AS mean_bal FROM src)
        SELECT c_custkey, c_acctbal FROM src, m WHERE c_acctbal > mean_bal
        """
    )


# ---------------------------------------------------------------------------
# Set operations (absent in the reference — SURVEY §2.5)
# ---------------------------------------------------------------------------


def _nation_sides(spark, sf):
    c = _t(spark, sf, "customer").select(
        F.col("c_nationkey").cast("int").alias("nationkey")
    )
    s = _t(spark, sf, "supplier").select(
        F.col("s_nationkey").cast("int").alias("nationkey")
    )
    return c, s


def q_setop_union(spark, sf):
    c, s = _nation_sides(spark, sf)
    return c.union(s).distinct()


def q_setop_intersect(spark, sf):
    c, s = _nation_sides(spark, sf)
    return c.intersect(s)


def q_setop_except(spark, sf):
    """EXCEPT has set (distinct) semantics — ``subtract``, not
    ``exceptAll``. Supplier side is filtered so the difference is
    non-empty (all 25 nations have at least one supplier)."""
    c, _ = _nation_sides(spark, sf)
    s = (
        _t(spark, sf, "supplier")
        .filter(F.col("s_acctbal") > 5000)
        .select(F.col("s_nationkey").cast("int").alias("nationkey"))
    )
    return c.subtract(s)


def q_setop_intersect_all(spark, sf):
    """INTERSECT ALL — multiset semantics: each nationkey survives
    min(customer-count, supplier-count) times. Distinguishes Spark's
    ``intersectAll`` from ``intersect`` (which would return ≤25 rows);
    here the supplier side's multiplicity dominates."""
    c, s = _nation_sides(spark, sf)
    return c.intersectAll(s)


def q_setop_except_all(spark, sf):
    """EXCEPT ALL — multiset difference: customer-count minus
    supplier-count occurrences per nationkey (``exceptAll``, not
    ``subtract``)."""
    c, s = _nation_sides(spark, sf)
    return c.exceptAll(s)


# ---------------------------------------------------------------------------
# Window functions (absent in the reference — SURVEY §2.5)
# ---------------------------------------------------------------------------


#: Group cardinality of the top-k window's key: (returnflag,
#: linestatus) has 6 values in TPC-H (R/A/N x F/O with only N,O and
#: R,F/A,F populated). A naive window funnels the whole fact scan
#: into those ~6 reducer tasks; the salt fan-out is derived from
#: cluster parallelism per-session (operators.util.salt_count,
#: VERDICT r13 #3) so the same query fans out proportionally wider on
#: a real cluster, and the second phase sees <= salts*3 rows/group.
_TOPK_GROUPS = 6


def q_window_topk_per_group(spark, sf):
    """Top-3 lineitems by extendedprice per (returnflag, linestatus),
    as a salted two-phase top-k (VERDICT r7 #2; pattern proven by
    ``q_weighted_sample_per_lang_salted``, pipeline3.py).

    Phase 1 ranks within (keys, salt) — the full-scan sort spreads
    over keys x ``salt_count(spark, _TOPK_GROUPS)`` tasks instead of
    ~6 — and keeps each
    sub-partition's top-3. By pigeonhole any row of a group's true
    top-3 is in its own salt bucket's top-3, so phase 2's window over
    the <= salts*3 surviving rows per group reproduces the unsalted
    ``row_number`` exactly (the orderBy is a deterministic total
    order), hash-identical to the certified r1/r9 oracle.
    """
    order = [
        F.col("l_extendedprice").desc(),
        F.col("l_orderkey"),
        F.col("l_linenumber"),
    ]
    salt = F.pmod(
        F.xxhash64(F.col("l_orderkey"), F.col("l_linenumber")),
        F.lit(salt_count(spark, _TOPK_GROUPS)),
    )
    w1 = Window.partitionBy("l_returnflag", "l_linestatus", "salt").orderBy(
        *order
    )
    cand = (
        _t(spark, sf, "lineitem")
        .select(
            "l_returnflag", "l_linestatus", "l_orderkey",
            "l_linenumber", "l_extendedprice",
        )
        .withColumn("salt", salt)
        .withColumn("r1", F.row_number().over(w1))
        .filter(F.col("r1") <= 3)
        .drop("salt", "r1")
    )
    w2 = Window.partitionBy("l_returnflag", "l_linestatus").orderBy(*order)
    return (
        cand.withColumn("rn", F.row_number().over(w2))
        .filter(F.col("rn") <= 3)
        .select(
            "l_returnflag", "l_linestatus", "l_orderkey",
            "l_extendedprice", "rn",
        )
    )


def q_window_running(spark, sf):
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return _t(spark, sf, "orders").select(
        "o_orderkey",
        "o_custkey",
        F.round(
            F.sum("o_totalprice").over(
                w.rowsBetween(Window.unboundedPreceding, 0)
            ),
            2,
        ).alias("running_total"),
        F.lag("o_orderkey").over(w).alias("prev_order"),
        F.row_number().over(w).alias("order_seq"),
    )


def q_json_extract(spark, sf):
    """JSON field extraction from the events props column."""
    from datafusion_archive_spark.queries.timeseries import load_events

    return (
        load_events(spark, sf)
        .filter(F.col("event_type") == "purchase")
        .select(
            "event_id",
            F.get_json_object("props", "$.k").cast("int").alias("k"),
        )
    )



# ---------------------------------------------------------------------------
# Scalar function surface, wave 2: strings, dates, conditionals, safe math
# (the reference has none of these — SURVEY §2.3 "string / date / array /
# map / json functions: none exist"; roadmap-parity plus Spark built-ins)
# ---------------------------------------------------------------------------


def q_string_funcs(spark, sf):
    p = _t(spark, sf, "part")
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("up"),
        F.substring("p_name", 1, 5).alias("prefix"),
        F.lpad(F.col("p_partkey").cast("string"), 8, "0").alias("padded"),
        F.reverse(F.col("p_name")).alias("rev"),
        F.concat_ws("-", "p_brand", "p_type").alias("brand_type"),
        F.instr(F.col("p_name"), "e").alias("epos"),
        F.translate(F.col("p_name"), "aeiou", "AEIOU").alias("tr"),
        F.length(F.trim(F.col("p_name"))).alias("trimlen"),
    )


def q_date_funcs(spark, sf):
    o = _t(spark, sf, "orders")
    d = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        F.year(d).alias("y"),
        F.month(d).alias("m"),
        F.dayofmonth(d).alias("dom"),
        # Spark weekday: Monday=0 — oracle uses isodow(x)-1
        F.weekday(d).alias("wd"),
        F.date_format(F.date_add(d.cast("date"), 30), "yyyy-MM-dd").alias(
            "plus30"
        ),
        F.datediff(F.lit("2000-01-01").cast("date"), d.cast("date")).alias(
            "days_to_y2k"
        ),
        F.date_format(d, "yyyy-MM").alias("ym"),
    )


def q_case_when(spark, sf):
    o = _t(spark, sf, "orders")
    return o.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") > 300000, "big")
        .when(F.col("o_totalprice") > 100000, "mid")
        .otherwise("small")
        .alias("size_class"),
        F.when(F.col("o_orderstatus") == "O", F.col("o_totalprice"))
        .alias("open_price"),
    )


def q_try_divide(spark, sf):
    """Safe division: Spark 4 runs ANSI mode where /0 raises (as the
    reference's Arrow kernels do — SURVEY §7.5); try_divide gives the
    tolerant NULL form, which is DuckDB's native `/` behavior."""
    l = _t(spark, sf, "lineitem").filter(F.col("l_linenumber") == 2)
    return l.select(
        "l_orderkey",
        F.try_divide(F.col("l_extendedprice"), F.col("l_quantity") - 26).alias(
            "div_maybe_null"
        ),
    )


def q_union_all(spark, sf):
    c, s = _nation_sides(spark, sf)
    return c.union(s)  # bag semantics (UNION ALL)


def q_cube(spark, sf):
    return (
        _t(spark, sf, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def q_grouping_sets(spark, sf):
    return spark.sql(
        f"""
        SELECT l_returnflag, l_linestatus, count(*) AS n,
               round(sum(l_quantity), 2) AS sum_qty
        FROM parquet.`{sf}/lineitem.parquet`
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
        """
    )


def q_in_subquery(spark, sf):
    return spark.sql(
        f"""
        SELECT o_orderkey, o_totalprice
        FROM parquet.`{sf}/orders.parquet`
        WHERE o_custkey IN (
          SELECT c_custkey FROM parquet.`{sf}/customer.parquet`
          WHERE c_acctbal > 9500
        )
        """
    )


def q_percentiles(spark, sf):
    """Exact interpolated percentiles per return flag, from the
    grouped histogram-pruned search (operators/quantiles — round 7:
    three return-flag groups over a fact table is exactly the
    low-cardinality-key case where the grouped ``percentile``
    aggregate buffers a third of the fact column in one task). The
    search is bit-identical to Spark ``percentile`` == DuckDB
    ``quantile_cont`` (both linear interpolation); approx_percentile
    remains the documented sketch path.

    Round 16 (VERDICT r15 #6, guide §1.2 step 1 — don't scan what
    you can share): the three per-column searches each ran their own
    stats + histogram + selection passes over lineitem (9 fact
    passes). The three columns now STACK into one frame keyed by the
    composite (column-tag | return-flag) group, so the one certified
    grouped search runs all of them in 3 shared passes. Per composite
    group the value multiset is identical to the old per-column call,
    and each probability's order statistics are resolved
    independently of the others in the prob list, so every reported
    value is bit-identical; the operator kernel itself is untouched.
    """
    from datafusion_archive_spark.operators.quantiles import (
        exact_grouped_quantiles,
    )

    li = _t(spark, sf, "lineitem")
    cols = [
        ("qty", "l_quantity", 0.5),
        ("price", "l_extendedprice", 0.95),
        ("disc", "l_discount", 0.25),
    ]
    probs = sorted({p for _, _, p in cols})
    stacked = li.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(tag).alias("t"),
                        F.col(c).cast("double").alias("v"),
                    )
                    for tag, c, _ in cols
                ]
            )
        ).alias("s"),
        "l_returnflag",
    ).select(
        F.concat_ws("|", F.col("s.t"), F.col("l_returnflag")).alias("ck"),
        F.col("s.v").alias("v"),
    )
    qs = exact_grouped_quantiles(stacked, "ck", "v", probs)
    flags = sorted({k.split("|", 1)[1] for k in qs})
    by = {
        (tag, flag): qs[f"{tag}|{flag}"][probs.index(p)]
        for tag, _, p in cols
        for flag in flags
    }
    cuts = spark.createDataFrame(
        [
            (k, by[("qty", k)], by[("price", k)], by[("disc", k)])
            for k in flags
        ],
        "l_returnflag string, q50_qty double, q95_price double, "
        "q25_disc double",
    )
    return cuts.select(
        "l_returnflag",
        F.round("q50_qty", 4).alias("p50_qty"),
        F.round("q95_price", 4).alias("p95_price"),
        F.round("q25_disc", 4).alias("p25_disc"),
    )


def q_try_cast(spark, sf):
    """try_cast: NULL-tolerant casts (ANSI-mode Spark raises on
    invalid/overflowing CAST; DuckDB TRY_CAST matches try_cast)."""
    p = _t(spark, sf, "part")
    return p.select(
        "p_partkey",
        F.col("p_name").try_cast("int").alias("name_as_int"),
        F.regexp_extract("p_brand", r"#(\d+)", 1)
        .try_cast("int")
        .alias("brand_num"),
        (F.col("p_size") * 1000).try_cast("tinyint").alias("overflow_null"),
    )


QUERIES = {
    "scan_filter_project": q_scan_filter_project,
    "predicate_between_in": q_predicate_between_in,
    "filter_like": q_filter_like,
    "null_predicates": q_null_predicates,
    "cast_semantics": q_cast,
    "arithmetic_ops": q_arithmetic,
    "literals_no_from": q_literals_no_from,
    "sqrt_fn": q_sqrt,
    "geo_udt": q_geo_udt,
    "agg_global": q_agg_global,
    "q1_pricing_summary": q1_pricing_summary,
    "agg_having": q_agg_having,
    "agg_count_distinct_group": q_agg_count_distinct_group,
    "agg_rollup": q_agg_rollup,
    "pivot_linestatus": q_pivot,
    "sort_limit_topk": q_sort_limit_topk,
    "distinct_pairs": q_distinct,
    "join_inner_3way": q_join_inner_3way,
    "join_left_outer": q_join_left_outer,
    "join_semi": q_join_semi,
    "join_anti": q_join_anti,
    "join_full_outer": q_join_full_outer,
    "q3_shipping_priority": q3_shipping_priority,
    "q5_local_supplier": q5_local_supplier,
    "cte_scalar_subquery": q_cte_scalar_subquery,
    "setop_union": q_setop_union,
    "setop_intersect": q_setop_intersect,
    "setop_except": q_setop_except,
    "setop_intersect_all": q_setop_intersect_all,
    "setop_except_all": q_setop_except_all,
    "window_topk_per_group": q_window_topk_per_group,
    "window_running": q_window_running,
    "json_extract": q_json_extract,
    "try_cast_nulls": q_try_cast,
    "string_funcs": q_string_funcs,
    "date_funcs": q_date_funcs,
    "case_when": q_case_when,
    "try_divide_nulls": q_try_divide,
    "setop_union_all": q_union_all,
    "agg_cube": q_cube,
    "agg_grouping_sets": q_grouping_sets,
    "in_subquery": q_in_subquery,
    "percentiles": q_percentiles,
}


ORACLES = {
    "scan_filter_project": """
        SELECT l_orderkey, l_partkey, l_quantity, l_extendedprice
        FROM lineitem WHERE l_quantity > 45 AND l_discount < 0.02
    """,
    "predicate_between_in": """
        SELECT o_orderkey, o_totalprice, o_orderpriority
        FROM orders
        WHERE o_totalprice BETWEEN 100000 AND 150000
          AND o_orderpriority IN ('1-URGENT', '2-HIGH')
    """,
    "filter_like": """
        SELECT p_partkey, p_name, p_type
        FROM part WHERE p_name LIKE '%red%' AND p_type NOT LIKE '%PROMO%'
    """,
    "null_predicates": """
        SELECT doc_id,
               nullif(lang, 'en') AS lang_or_null,
               nullif(lang, 'en') IS NULL AS is_en,
               nullif(lang, 'en') IS NOT NULL AS is_not_en
        FROM documents
    """,
    "cast_semantics": """
        SELECT l_orderkey,
               CAST(trunc(l_extendedprice) AS BIGINT) AS price_int,
               CAST(l_orderkey % 128 AS TINYINT) AS key_i8,
               CAST(l_linenumber AS VARCHAR) AS ln_str,
               CAST(l_quantity AS FLOAT) AS qty_f32
        FROM lineitem WHERE l_linenumber = 1
    """,
    "arithmetic_ops": """
        SELECT l_orderkey,
               l_quantity + l_tax AS a_add,
               l_extendedprice - l_quantity AS a_sub,
               l_quantity * (1 - l_discount) AS a_mul,
               l_extendedprice / l_quantity AS a_div,
               l_partkey % 97 AS a_mod,
               l_orderkey // 7 AS a_idiv
        FROM lineitem WHERE l_linenumber = 3
    """,
    "literals_no_from": """
        SELECT 1 AS i, 2.5::DOUBLE AS f, 'hello' AS s, true AS b,
               1 + 2 * 3 AS arith
    """,
    "sqrt_fn": """
        SELECT p_partkey, sqrt(p_retailprice) AS sqrt_price FROM part
    """,
    "geo_udt": """
        SELECT c_custkey,
               'POINT (' || CAST(CAST(c_nationkey AS DOUBLE) AS VARCHAR)
                 || ' ' || CAST(round(c_acctbal, 1) AS VARCHAR) || ')' AS wkt,
               CAST(c_nationkey AS DOUBLE) AS pt_x,
               round(c_acctbal, 1) AS pt_y
        FROM customer
    """,
    "agg_global": """
        SELECT min(l_quantity) AS min_qty,
               max(l_quantity) AS max_qty,
               round(sum(l_extendedprice), 2) AS sum_price,
               floor((CAST(sum(CAST(l_discount AS DECIMAL(27,6))) AS DOUBLE)
                      / count(*)) * 1000000 + 0.5) / 1000000.0 AS avg_disc,
               count(*) AS n_rows,
               count(DISTINCT l_orderkey) AS n_orders
        FROM lineitem
    """,
    "q1_pricing_summary": """
        SELECT l_returnflag, l_linestatus,
               round(sum(l_quantity), 2) AS sum_qty,
               round(sum(l_extendedprice), 2) AS sum_base_price,
               floor(CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(27,6))) AS DOUBLE) * 100 + 0.5) / 100.0 AS sum_disc_price,
               floor(CAST(sum(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(27,6))) AS DOUBLE) * 100 + 0.5) / 100.0 AS sum_charge,
               floor((CAST(sum(CAST(l_quantity AS DECIMAL(27,6))) AS DOUBLE)
                      / count(*)) * 10000 + 0.5) / 10000.0 AS avg_qty,
               floor((CAST(sum(CAST(l_extendedprice AS DECIMAL(27,6))) AS DOUBLE)
                      / count(*)) * 10000 + 0.5) / 10000.0 AS avg_price,
               floor((CAST(sum(CAST(l_discount AS DECIMAL(27,6))) AS DOUBLE)
                      / count(*)) * 10000 + 0.5) / 10000.0 AS avg_disc,
               count(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '2000-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
    """,
    "agg_having": """
        SELECT l_returnflag, count(*) AS n,
               round(sum(l_extendedprice), 2) AS sum_price
        FROM lineitem GROUP BY l_returnflag HAVING count(*) > 15000
    """,
    "agg_count_distinct_group": """
        SELECT c_mktsegment,
               count(DISTINCT c_nationkey) AS n_nations,
               count(*) AS n_cust,
               floor((CAST(sum(CAST(c_acctbal AS DECIMAL(27,6))) AS DOUBLE)
                      / count(*)) * 10000 + 0.5) / 10000.0 AS avg_bal
        FROM customer GROUP BY c_mktsegment
    """,
    "agg_rollup": """
        SELECT l_returnflag, l_linestatus, count(*) AS n,
               round(sum(l_quantity), 2) AS sum_qty
        FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    "pivot_linestatus": """
        SELECT l_returnflag,
               round(sum(CASE WHEN l_linestatus = 'F' THEN l_extendedprice END), 2) AS "F",
               round(sum(CASE WHEN l_linestatus = 'O' THEN l_extendedprice END), 2) AS "O"
        FROM lineitem GROUP BY l_returnflag
    """,
    "sort_limit_topk": """
        SELECT o_orderkey, o_totalprice FROM orders
        ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
    """,
    "distinct_pairs": """
        SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
    """,
    "join_inner_3way": """
        SELECT c_custkey, c_name, n_name, r_name
        FROM customer
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE c_acctbal > 9000
    """,
    "join_left_outer": """
        SELECT o_orderkey, o_custkey, c_name AS rich_name,
               coalesce(c_mktsegment, 'NONE') AS segment
        FROM orders
        LEFT JOIN (SELECT * FROM customer WHERE c_acctbal > 8000) rich
          ON o_custkey = c_custkey
    """,
    "join_semi": """
        SELECT c_custkey, c_name FROM customer
        WHERE EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_totalprice > 400000)
    """,
    "join_anti": """
        SELECT c_custkey, c_name FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders
                          WHERE o_custkey = c_custkey
                            AND o_totalprice > 300000)
    """,
    "join_full_outer": """
        SELECT coalesce(nk_c, nk_s) AS nationkey,
               coalesce(n_customers, 0) AS n_customers,
               coalesce(n_suppliers, 0) AS n_suppliers
        FROM (SELECT c_nationkey AS nk_c, count(*) AS n_customers
              FROM customer GROUP BY 1) c
        FULL OUTER JOIN
             (SELECT s_nationkey AS nk_s, count(*) AS n_suppliers
              FROM supplier GROUP BY 1) s
          ON nk_c = nk_s
    """,
    "q3_shipping_priority": """
        SELECT l_orderkey,
               strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
               o_orderpriority,
               floor(CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(27,6))) AS DOUBLE) * 100 + 0.5) / 100.0 AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
          AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
        GROUP BY l_orderkey, o_orderdate, o_orderpriority
        ORDER BY revenue DESC, l_orderkey LIMIT 10
    """,
    "q5_local_supplier": """
        SELECT n_name,
               floor(CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(27,6))) AS DOUBLE) * 100 + 0.5) / 100.0 AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
        GROUP BY n_name
    """,
    "cte_scalar_subquery": """
        WITH m AS (SELECT avg(c_acctbal) AS mean_bal FROM customer)
        SELECT c_custkey, c_acctbal FROM customer, m
        WHERE c_acctbal > mean_bal
    """,
    "setop_union": """
        SELECT CAST(c_nationkey AS INTEGER) AS nationkey FROM customer
        UNION
        SELECT CAST(s_nationkey AS INTEGER) FROM supplier
    """,
    "setop_intersect": """
        SELECT CAST(c_nationkey AS INTEGER) AS nationkey FROM customer
        INTERSECT
        SELECT CAST(s_nationkey AS INTEGER) FROM supplier
    """,
    "setop_except": """
        SELECT CAST(c_nationkey AS INTEGER) AS nationkey FROM customer
        EXCEPT
        SELECT CAST(s_nationkey AS INTEGER) FROM supplier
        WHERE s_acctbal > 5000
    """,
    "setop_intersect_all": """
        SELECT CAST(c_nationkey AS INTEGER) AS nationkey FROM customer
        INTERSECT ALL
        SELECT CAST(s_nationkey AS INTEGER) FROM supplier
    """,
    "setop_except_all": """
        SELECT CAST(c_nationkey AS INTEGER) AS nationkey FROM customer
        EXCEPT ALL
        SELECT CAST(s_nationkey AS INTEGER) FROM supplier
    """,
    "window_topk_per_group": """
        SELECT l_returnflag, l_linestatus, l_orderkey, l_extendedprice, rn
        FROM (SELECT l_returnflag, l_linestatus, l_orderkey, l_linenumber,
                     l_extendedprice,
                     CAST(row_number() OVER (
                       PARTITION BY l_returnflag, l_linestatus
                       ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
                     ) AS INTEGER) AS rn
              FROM lineitem) t
        WHERE rn <= 3
    """,
    "window_running": """
        SELECT o_orderkey, o_custkey,
               round(sum(o_totalprice) OVER (
                 PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
                 AS running_total,
               lag(o_orderkey) OVER (
                 PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
                 AS prev_order,
               CAST(row_number() OVER (
                 PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
                 AS INTEGER) AS order_seq
        FROM orders
    """,
    "json_extract": """
        SELECT event_id,
               CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
        FROM events WHERE event_type = 'purchase'
    """,
    "try_cast_nulls": r"""
        SELECT p_partkey,
               TRY_CAST(p_name AS INTEGER) AS name_as_int,
               TRY_CAST(regexp_extract(p_brand, '#(\d+)', 1) AS INTEGER)
                 AS brand_num,
               TRY_CAST(p_size * 1000 AS TINYINT) AS overflow_null
        FROM part
    """,
    "string_funcs": """
        SELECT p_partkey,
               upper(p_name) AS up,
               substr(p_name, 1, 5) AS prefix,
               lpad(CAST(p_partkey AS VARCHAR), 8, '0') AS padded,
               reverse(p_name) AS rev,
               p_brand || '-' || p_type AS brand_type,
               CAST(instr(p_name, 'e') AS INTEGER) AS epos,
               translate(p_name, 'aeiou', 'AEIOU') AS tr,
               CAST(length(trim(p_name)) AS INTEGER) AS trimlen
        FROM part
    """,
    "date_funcs": """
        SELECT o_orderkey,
               CAST(year(o_orderdate) AS INTEGER) AS y,
               CAST(month(o_orderdate) AS INTEGER) AS m,
               CAST(day(o_orderdate) AS INTEGER) AS dom,
               CAST(isodow(o_orderdate) - 1 AS INTEGER) AS wd,
               strftime(CAST(o_orderdate AS DATE) + 30, '%Y-%m-%d')
                 AS plus30,
               CAST(datediff('day', CAST(o_orderdate AS DATE),
                             DATE '2000-01-01') AS INTEGER) AS days_to_y2k,
               strftime(o_orderdate, '%Y-%m') AS ym
        FROM orders
    """,
    "case_when": """
        SELECT o_orderkey,
               CASE WHEN o_totalprice > 300000 THEN 'big'
                    WHEN o_totalprice > 100000 THEN 'mid'
                    ELSE 'small' END AS size_class,
               CASE WHEN o_orderstatus = 'O' THEN o_totalprice END
                 AS open_price
        FROM orders
    """,
    "try_divide_nulls": """
        SELECT l_orderkey,
               l_extendedprice / (l_quantity - 26) AS div_maybe_null
        FROM lineitem WHERE l_linenumber = 2
    """,
    "setop_union_all": """
        SELECT CAST(c_nationkey AS INTEGER) AS nationkey FROM customer
        UNION ALL
        SELECT CAST(s_nationkey AS INTEGER) FROM supplier
    """,
    "agg_cube": """
        SELECT l_returnflag, l_linestatus, count(*) AS n
        FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
    "agg_grouping_sets": """
        SELECT l_returnflag, l_linestatus, count(*) AS n,
               round(sum(l_quantity), 2) AS sum_qty
        FROM lineitem GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
    """,
    "in_subquery": """
        SELECT o_orderkey, o_totalprice FROM orders
        WHERE o_custkey IN (SELECT c_custkey FROM customer
                            WHERE c_acctbal > 9500)
    """,
    "percentiles": """
        SELECT l_returnflag,
               round(quantile_cont(l_quantity, 0.5), 4) AS p50_qty,
               round(quantile_cont(l_extendedprice, 0.95), 4) AS p95_price,
               round(quantile_cont(l_discount, 0.25), 4) AS p25_disc
        FROM lineitem GROUP BY l_returnflag
    """,
}
