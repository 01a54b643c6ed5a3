"""Salted skew join correctness + session_window vs lag-based
sessionization cross-validation."""

import pytest
from pyspark.sql import functions as F

from datafusion_archive_spark.operators.skew import salted_join
from datafusion_archive_spark.queries.timeseries import load_events
from datafusion_archive_spark.streaming import sessionize_batch


def test_salted_join_equals_plain_join(spark, sf_dir):
    l = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_suppkey", "l_quantity"
    )
    s = spark.read.parquet(f"{sf_dir}/supplier.parquet").select(
        F.col("s_suppkey").alias("l_suppkey"), "s_name"
    )
    plain = (
        l.join(s, "l_suppkey")
        .groupBy("l_suppkey")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("l_quantity"), 2).alias("q"))
    )
    salted = (
        salted_join(l, s, "l_suppkey", factor=4)
        .groupBy("l_suppkey")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("l_quantity"), 2).alias("q"))
    )
    assert sorted(map(tuple, plain.collect())) == sorted(
        map(tuple, salted.collect())
    )


def test_salted_left_join_keeps_unmatched(spark):
    left = spark.createDataFrame(
        [(1, "a"), (2, "b"), (99, "c")], ["k", "v"]
    )
    right = spark.createDataFrame([(1, 10.0), (2, 20.0)], ["k", "w"])
    out = {r.k: r.w for r in salted_join(left, right, "k", "left", 4).collect()}
    assert out == {1: 10.0, 2: 20.0, 99: None}


def test_salted_join_rejects_unsupported_how(spark):
    df = spark.range(1)
    with pytest.raises(ValueError):
        salted_join(df, df, "id", how="full")


def test_session_window_agrees_with_lag_sessionize(spark, sf_dir):
    """Two independent sessionization implementations — Spark's
    native session_window and our lag+cumsum operator — must produce
    the same per-user session count."""
    ev = load_events(spark, sf_dir)
    native = (
        ev.groupBy(F.session_window("ts", "30 minutes"), "user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_sessions"))
    )
    ours = sessionize_batch(ev, gap_minutes=30).select(
        "user_id", "n_sessions"
    )
    n_rows = {r.user_id: r.n_sessions for r in native.collect()}
    o_rows = {r.user_id: r.n_sessions for r in ours.collect()}
    assert n_rows == o_rows
