"""Plan-IR JSON serde round-trip (reference
``src/logicalplan.rs:612-651`` — serde derives on LogicalPlan/Expr)."""

from __future__ import annotations

import pytest

from datafusion_archive_spark.plans import serde as P


def _sample_plan(sf_dir: str) -> dict:
    return P.limit(
        5,
        P.sort(
            [{"expr": P.col("total"), "asc": False}],
            P.aggregate(
                [P.col("n_regionkey")],
                [P.alias(P.agg("count", P.lit(1)), "total")],
                P.selection(
                    P.binop("gteq", P.col("n_nationkey"), P.lit(0)),
                    P.parquet_scan(f"{sf_dir}/nation.parquet"),
                ),
            ),
        ),
    )


def test_json_round_trip_is_fixpoint(sf_dir):
    plan = _sample_plan(sf_dir)
    wire = P.to_json(plan)
    assert P.from_json(wire) == plan
    assert P.to_json(P.from_json(wire)) == wire


def test_build_matches_handwritten(spark, sf_dir):
    from pyspark.sql import functions as F

    plan = _sample_plan(sf_dir)
    got = P.build(spark, P.from_json(P.to_json(plan))).collect()
    want = (
        spark.read.parquet(f"{sf_dir}/nation.parquet")
        .filter(F.col("n_nationkey") >= 0)
        .groupBy("n_regionkey")
        .agg(F.count(F.lit(1)).alias("total"))
        .orderBy(F.col("total").desc())
        .limit(5)
        .collect()
    )
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))


def test_expression_surface(spark):
    df = spark.range(5).select(
        P.build_expr(P.alias(P.fn("sqrt", P.col("id")), "r")),
        P.build_expr(P.alias(P.cast(P.col("id"), "string"), "s")),
        P.build_expr(
            P.alias(
                P.binop("and",
                        P.binop("gt", P.col("id"), P.lit(1)),
                        {"expr": "is_not_null", "input": P.col("id")}),
                "p",
            )
        ),
        P.build_expr(
            P.alias({"expr": "like", "input": P.cast(P.col("id"), "string"),
                     "pattern": "%3%"}, "l")
        ),
    )
    rows = df.collect()
    assert [r["p"] for r in rows] == [False, False, True, True, True]
    assert [r["l"] for r in rows] == [False, False, False, True, False]


def test_unknown_nodes_rejected():
    with pytest.raises(ValueError):
        P.from_json('{"op": "drop_table"}')
    with pytest.raises(ValueError):
        P.build_expr({"expr": "exec", "cmd": "rm"})
    with pytest.raises(ValueError):
        P.binop("xor", P.col("a"), P.col("b"))
    with pytest.raises(ValueError):
        P.fn("system", P.col("a"))


def test_csv_scan_and_join_ops(spark, sf_dir, tmp_path):
    from pyspark.sql import functions as F

    src = spark.read.parquet(f"{sf_dir}/region.parquet")
    path = str(tmp_path / "region_csv")
    src.write.mode("overwrite").option("header", "true").csv(path)
    plan = P.join(
        P.csv_scan(
            path,
            [["r_regionkey", "int32"], ["r_name", "utf8"]],
            header=True,
        ),
        P.projection(
            [P.alias(P.col("n_regionkey"), "r_regionkey"),
             P.col("n_name")],
            P.parquet_scan(f"{sf_dir}/nation.parquet"),
        ),
        on=["r_regionkey"],
    )
    got = P.build(spark, P.from_json(P.to_json(plan)))
    n = spark.read.parquet(f"{sf_dir}/nation.parquet").count()
    assert got.count() == n
    assert set(got.columns) >= {"r_regionkey", "r_name", "n_name"}
