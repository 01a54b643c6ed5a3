"""Nested/array operators and approximate aggregates.

The reference's nested-object support is a roadmap item
(``/root/reference/ROADMAP.md:32``, ``ScalarValue::Struct``
unimplemented at runtime ``src/logicalplan.rs:128-129``); Spark's
array/struct surface covers it natively. Array outputs are scalarized
(joined/rounded) so cross-engine value hashing is stable.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from datafusion_archive_spark.operators.util import load_table


def _t(spark, sf_dir, name):
    return load_table(spark, sf_dir, name)


def q_array_ops(spark, sf):
    """Array kernels over the embedding column: size, sum, min/max,
    filter-count, scalarized slice."""
    e = _t(spark, sf, "embeddings")
    v = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    return e.select(
        "vec_id",
        F.size("embedding").alias("n_dims"),
        F.round(
            F.aggregate(v, F.lit(0.0), lambda acc, x: acc + x), 4
        ).alias("v_sum"),
        F.round(F.array_max(v), 6).alias("v_max"),
        F.round(F.array_min(v), 6).alias("v_min"),
        F.size(F.filter(v, lambda x: x > 0)).alias("n_positive"),
        # scalarized slice: fixed-point ints, not double→string casts —
        # Spark renders small doubles in scientific notation ("5.0E-4")
        # while DuckDB prints plain decimal, so strings would diverge
        F.array_join(
            F.transform(
                F.slice(v, 1, 3),
                lambda x: F.floor(x * 10000 + 0.5).cast("string"),
            ),
            ",",
        ).alias("head3"),
    )


def q_posexplode(spark, sf):
    """Array → rows with ordinality (UDTF-style explode — the
    reference's 'Array UDFs' roadmap item, ROADMAP.md:31)."""
    e = _t(spark, sf, "embeddings").filter(F.col("vec_id") < 5)
    return e.select(
        "vec_id", F.posexplode(F.col("embedding"))
    ).select(
        "vec_id",
        F.col("pos").cast("int").alias("pos"),
        F.col("col").cast("double").alias("val"),
    )


def q_struct_access(spark, sf):
    """Struct construction + field access (ScalarValue::Struct is
    unimplemented in the reference — logicalplan.rs:128-129)."""
    c = _t(spark, sf, "customer")
    s = F.struct(
        F.col("c_name").alias("name"), F.col("c_acctbal").alias("bal")
    )
    return c.select(
        "c_custkey",
        s.getField("name").alias("sname"),
        (s.getField("bal") * 2).alias("dbl_bal"),
    )


def q_approx_aggs(spark, sf):
    """Approximate sketches — the 100 TB scale path for distincts and
    quantiles — certified via their DOCUMENTED error bounds.

    The raw sketch outputs are engine-specific (HLL++/KLL internals),
    so no SQL engine can reproduce them value-for-value. What IS
    exactly checkable is the contract each sketch ships with:

    - ``approx_count_distinct(rsd=0.02)``: HLL++ standard error 2%;
      we emit ``approx_orders_ok`` = within 3 sigma (6%, absolute
      floor 5 for tiny groups) of the exact distinct count.
    - ``percentile_approx(accuracy=1000)``: rank error <= n/1000 =
      0.1% of rows; we emit ``approx_median_ok`` = the sketch median
      lies between the exact 0.49 and 0.51 quantiles (10x slack on
      the guarantee).

    Both checks are deterministic booleans (as INT for the driver
    hash) — the oracle asserts them as literal 1 alongside the exact
    distinct count, so this row is now an EXACT driver row, not
    rows-only. The exact companions are themselves scale-safe: the
    distinct count is an ordinary distinct aggregate, and the quantile
    band comes from the engine's own
    :func:`~datafusion_archive_spark.operators.quantiles.
    exact_grouped_quantiles` (bit-identical to grouped ``percentile``
    but histogram-pruned — no per-group value buffer in any task), so
    even the certification form of this query survives fact-scale
    data. A production run keeps just the sketch columns (the exact
    companions are the cost the sketch replaces)."""
    from datafusion_archive_spark.operators.quantiles import (
        exact_grouped_quantiles,
    )

    li = _t(spark, sf, "lineitem")
    band = exact_grouped_quantiles(
        li, "l_returnflag", "l_extendedprice", [0.49, 0.51]
    )
    band_df = spark.createDataFrame(
        [(k, v[0], v[1]) for k, v in band.items()],
        "l_returnflag string, q_lo double, q_hi double",
    )
    # The sketch aggregates and the exact distinct run as SEPARATE
    # aggregations joined on the 3-row group key: putting
    # count_distinct in the same agg as percentile_approx forces
    # Catalyst's Expand plan (one duplicated row-stream per distinct
    # group) and knocks the TypedImperativeAggregate sketch out of
    # ObjectHashAggregate into SortAggregate — 15 s vs 2.8 s at sf0.1,
    # and the expanded sort grows with fact rows, exactly the shape
    # that dies at 100 TB. Split, each side is a codegen two-phase
    # hash aggregate with map-side combine.
    sk = li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_orderkey", rsd=0.02).alias(
            "approx_orders"
        ),
        F.percentile_approx("l_extendedprice", 0.5, 1000).alias(
            "approx_median_price"
        ),
    )
    ex = (
        li.select("l_returnflag", "l_orderkey")
        .distinct()
        .groupBy("l_returnflag")
        # count the KEY, not lit(1): count(DISTINCT x) ignores NULL x,
        # and after .distinct() a NULL orderkey group would otherwise
        # be counted, diverging from the oracle on NULL-bearing data
        .agg(F.count("l_orderkey").alias("exact_orders"))
    )
    # NULL-SAFE group-key joins (ADVICE r11): the oracle's GROUP BY
    # retains a NULL l_returnflag group, but a plain equi-join between
    # the aggregation branches drops it (NULL = NULL is NULL). <=>
    # (EqualNullSafe) is still an equi-join key for Catalyst — same
    # hash-join plan — and keeps the NULL group aligned with the
    # oracle on NULL-bearing inputs (exact_grouped_quantiles likewise
    # treats a NULL key as a group, so the band side carries it too).
    # Explicit aliases because both branches share the lineitem
    # lineage — df["col"] references would self-resolve trivially
    # true. TPC-H data has no NULL flag, so the certified output is
    # unchanged.
    g = (
        sk.alias("sk")
        .join(
            ex.alias("ex"),
            F.col("sk.l_returnflag").eqNullSafe(
                F.col("ex.l_returnflag")
            ),
        )
        .drop(F.col("ex.l_returnflag"))
    )
    tol = F.greatest(
        F.col("exact_orders") * F.lit(0.06), F.lit(5.0)
    )
    return g.alias("g").join(
        F.broadcast(band_df.alias("b")),
        F.col("g.l_returnflag").eqNullSafe(F.col("b.l_returnflag")),
    ).drop(F.col("b.l_returnflag")).select(
        "l_returnflag",
        "exact_orders",
        (
            F.abs(F.col("approx_orders") - F.col("exact_orders")) <= tol
        ).cast("int").alias("approx_orders_ok"),
        (
            (F.col("approx_median_price") >= F.col("q_lo"))
            & (F.col("approx_median_price") <= F.col("q_hi"))
        ).cast("int").alias("approx_median_ok"),
    )


QUERIES = {
    "array_ops": q_array_ops,
    "posexplode_ordinality": q_posexplode,
    "struct_access": q_struct_access,
    "approx_aggs": q_approx_aggs,
}

ORACLES = {
    "array_ops": """
        WITH c AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
        SELECT vec_id,
               CAST(len(v) AS INTEGER) AS n_dims,
               round(list_aggregate(v, 'sum'), 4) AS v_sum,
               round(list_max(v), 6) AS v_max,
               round(list_min(v), 6) AS v_min,
               CAST(len(list_filter(v, x -> x > 0)) AS INTEGER)
                 AS n_positive,
               array_to_string(
                 list_transform(v[1:3],
                   x -> CAST(CAST(floor(x * 10000 + 0.5) AS BIGINT)
                             AS VARCHAR)), ',') AS head3
        FROM c
    """,
    "posexplode_ordinality": """
        WITH c AS (SELECT vec_id, embedding::DOUBLE[] AS v
                   FROM embeddings WHERE vec_id < 5)
        SELECT vec_id,
               CAST(i - 1 AS INTEGER) AS pos,
               v[i] AS val
        FROM c, unnest(generate_series(1, len(v))) AS t(i)
    """,
    "struct_access": """
        SELECT c_custkey, c_name AS sname, c_acctbal * 2 AS dbl_bal
        FROM customer
    """,
    # The sketch values themselves are engine-specific; the oracle
    # pins the group keys, the exact distinct counts, and asserts the
    # documented error bounds hold (the Spark side computes the same
    # booleans from its sketches — a red row here means a sketch broke
    # its contract, which is exactly what certification should catch).
    "approx_aggs": """
        SELECT l_returnflag,
               count(DISTINCT l_orderkey) AS exact_orders,
               1 AS approx_orders_ok,
               1 AS approx_median_ok
        FROM lineitem
        GROUP BY l_returnflag
    """,
}
