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


def test_zorder_clusters_both_dimensions(spark, sf_dir, tmp_path_factory):
    """Z-order must make per-file min/max stats selective for a box
    predicate on BOTH columns — the property that lets parquet
    row-group/file stats skip data for either dimension. Validated
    directly from the written files' footers via pyarrow."""
    import pyarrow.parquet as pq
    import os

    from datafusion_archive_spark.sources.layout import write_zordered

    src = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    lo_k, hi_k = 1.0, float(
        src.agg({"o_custkey": "max"}).collect()[0][0]
    )
    lo_p, hi_p = 0.0, 500_000.0
    base = tmp_path_factory.mktemp("zorder")

    zpath = str(base / "z")
    write_zordered(
        src, zpath, "o_custkey", "o_totalprice",
        (lo_k, hi_k), (lo_p, hi_p), n_files=16,
    )
    upath = str(base / "u")
    src.repartition(16).write.parquet(upath)  # round-robin: no clustering

    def overlap_fraction(path):
        files = [
            os.path.join(path, f)
            for f in os.listdir(path)
            if f.endswith(".parquet")
        ]
        assert len(files) >= 8
        # box predicate: bottom-quarter custkey AND bottom-quarter price
        k_cut = lo_k + (hi_k - lo_k) / 4
        p_cut = lo_p + (hi_p - lo_p) / 4
        hit = 0
        for f in files:
            md = pq.ParquetFile(f).metadata
            kmin = min(
                md.row_group(i).column(1).statistics.min
                for i in range(md.num_row_groups)
            )
            pmin = min(
                md.row_group(i).column(2).statistics.min
                for i in range(md.num_row_groups)
            )
            if kmin <= k_cut and pmin <= p_cut:
                hit += 1
        return hit / len(files)

    z_frac, u_frac = overlap_fraction(zpath), overlap_fraction(upath)
    # every unsorted file spans the whole space → ~100% overlap;
    # z-ordered files cover compact boxes → only the corner overlaps
    assert u_frac >= 0.9, u_frac
    assert z_frac <= 0.5, (
        f"z-ordered files should mostly skip the corner box: {z_frac}"
    )


def test_zorder_n_dimensional_validation_and_locality(spark):
    """n-col z-values: validation errors and 3-D locality sanity —
    neighbors in all three dims must be z-closer than far points."""
    import pytest as _pytest

    from datafusion_archive_spark.sources.layout import zorder_expr_n

    with _pytest.raises(ValueError):
        zorder_expr_n([("a", 0.0, 1.0)])
    with _pytest.raises(ValueError):
        zorder_expr_n([("a", 0.0, 1.0)] * 7, bits=10)  # 70 bits > 62

    df = spark.createDataFrame(
        [(0.1, 0.1, 0.1), (0.12, 0.12, 0.12), (0.9, 0.9, 0.9)],
        "x DOUBLE, y DOUBLE, z DOUBLE",
    )
    zs = [
        r.zv
        for r in df.select(
            zorder_expr_n(
                [("x", 0.0, 1.0), ("y", 0.0, 1.0), ("z", 0.0, 1.0)],
                bits=10,
            ).alias("zv")
        ).collect()
    ]
    assert abs(zs[0] - zs[1]) < abs(zs[0] - zs[2])
