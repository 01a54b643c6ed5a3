"""At-rest layout: partition pruning, bucketed shuffle-free joins,
compaction — verified against the actual physical plans."""

import os

import pytest
from pyspark.sql import functions as F

from datafusion_archive_spark.sources import (
    compact,
    write_bucketed,
    write_partitioned,
)


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "simple"
    )


def test_partition_pruning(spark, sf_dir, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("part") / "orders_by_status")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    write_partitioned(orders, out, ["o_orderstatus"])
    # one subdirectory per status value
    assert sorted(
        d for d in os.listdir(out) if d.startswith("o_orderstatus=")
    ) == ["o_orderstatus=F", "o_orderstatus=O", "o_orderstatus=P"]

    q = spark.read.parquet(out).filter(F.col("o_orderstatus") == "O")
    plan = _plan(q)
    # the status predicate must be a partition filter (pruned scan),
    # not a data filter
    assert "PartitionFilters" in plan and "o_orderstatus" in plan.split(
        "PartitionFilters"
    )[1].split("\n")[0]
    expected = orders.filter(F.col("o_orderstatus") == "O").count()
    assert q.count() == expected


def test_bucketed_join_skips_shuffle(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    lineitem = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    write_bucketed(orders, "b_orders", "o_orderkey", 8)
    write_bucketed(
        lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
        "b_lineitem",
        "o_orderkey",
        8,
    )
    # disable auto-broadcast: at test scale Catalyst would broadcast
    # the tiny tables, hiding the property under test (at 100 TB the
    # fact-fact join is SMJ, which is what bucketing de-shuffles)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = (
            spark.table("b_orders")
            .join(spark.table("b_lineitem"), "o_orderkey")
            .groupBy("o_orderstatus")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        import re

        plan = _plan(joined)
        # bucketed-on-key join: SMJ whose inputs read bucketed scans
        # directly — the ONLY shuffle in the plan is the groupBy's;
        # the same join over plain parquet shows 3 (one per join input)
        assert "SortMergeJoin" in plan
        n_exchanges = len(re.findall(r"Exchange hashpartitioning", plan))
        assert n_exchanges == 1, (
            f"bucketed join should not shuffle its inputs "
            f"({n_exchanges} hash exchanges):\n" + plan
        )
        total = joined.agg(F.sum("n")).collect()[0][0]
        assert total == lineitem.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_compaction(spark, sf_dir, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("compact") / "events")
    spark.read.parquet(f"{sf_dir}/nation.parquet").repartition(
        16
    ).write.parquet(out)
    n_before = len([f for f in os.listdir(out) if f.endswith(".parquet")])
    assert n_before > 2
    compact(spark, out, 2)
    n_after = len([f for f in os.listdir(out) if f.endswith(".parquet")])
    assert n_after <= 2
    assert spark.read.parquet(out).count() == 25
