"""Round-6 regression pins: the VERDICT r5 / ADVICE r5 fixes.

- sink crash-safety: kill-between-renames rollback (VERDICT r5 #8)
- matview replayed-batch idempotence (ADVICE r5, medium)
- fixed-width stream offsets are name-based, not positional (ADVICE low)
- DDL format-clause cross-validation (ADVICE low)
- Observation counters report 0 on empty input (ADVICE low)
- forward as-of deterministic (key, ts)-tie carry (ADVICE low)
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# sink rollback under a rename failure (VERDICT r5 #8)
# ---------------------------------------------------------------------------


def test_upsert_sink_rolls_back_when_second_rename_dies(
    spark, tmp_path, monkeypatch
):
    from datafusion_archive_spark.streaming.sinks import ParquetUpsertSink

    target = str(tmp_path / "tbl")
    sink = ParquetUpsertSink(spark, target, key="k")
    sink(spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string"), 0)
    before = {(r.k, r.v) for r in sink.read().collect()}

    real_rename = os.rename

    def dying_rename(src, dst):
        # fail exactly the tmp -> target swap, after target was moved
        # to __old — the worst-case crash point the rollback covers
        if src.endswith("__tmp"):
            raise OSError("injected: crash between the two renames")
        return real_rename(src, dst)

    monkeypatch.setattr(os, "rename", dying_rename)
    with pytest.raises(OSError, match="injected"):
        sink(spark.createDataFrame([(2, "B"), (3, "c")], "k int, v string"), 1)
    monkeypatch.undo()

    # the pre-failure table must be fully readable — never stranded
    after = {(r.k, r.v) for r in sink.read().collect()}
    assert after == before

    # and the sink must still work after recovery
    sink(spark.createDataFrame([(3, "c")], "k int, v string"), 2)
    assert (3, "c") in {(r.k, r.v) for r in sink.read().collect()}


# ---------------------------------------------------------------------------
# matview replay idempotence (ADVICE r5, medium)
# ---------------------------------------------------------------------------


def test_matview_sink_ignores_replayed_batch(spark, tmp_path):
    from datafusion_archive_spark.streaming.matview import (
        IncrementalRollupSink,
    )

    target = str(tmp_path / "mv")
    sink = IncrementalRollupSink(spark, target, ["g"], "x")
    batch = spark.createDataFrame([("a", 1.0), ("a", 3.0)], "g string, x double")
    sink(batch, 0)
    first = {(r.g, r.n_events, r.sum_value) for r in sink.read_view().collect()}
    assert first == {("a", 2, 4.0)}

    # foreachBatch is at-least-once: a crash between the parquet swap
    # and the checkpoint commit re-delivers the same batch_id — the
    # non-idempotent addition must NOT be folded in twice
    sink(batch, 0)
    assert {
        (r.g, r.n_events, r.sum_value) for r in sink.read_view().collect()
    } == first

    # a genuinely new batch still applies
    sink(spark.createDataFrame([("a", 5.0)], "g string, x double"), 1)
    assert {
        (r.g, r.n_events, r.sum_value) for r in sink.read_view().collect()
    } == {("a", 3, 9.0)}


# ---------------------------------------------------------------------------
# fixed-width stream offsets are name-based (ADVICE r5, low)
# ---------------------------------------------------------------------------


def _write_fw(path: str, rows: list[str]) -> None:
    with open(path, "w") as fh:
        for r in rows:
            fh.write(r + "\n")


def test_fixedwidth_stream_detects_out_of_order_late_file(tmp_path):
    from pyspark.sql.types import StringType, StructField, StructType

    from datafusion_archive_spark.sources.pydatasource import (
        FixedWidthStreamReader,
    )

    schema = StructType(
        [StructField("a", StringType()), StructField("b", StringType())]
    )
    d = str(tmp_path / "in")
    os.makedirs(d)
    _write_fw(os.path.join(d, "b.txt"), ["x1y1"])
    reader = FixedWidthStreamReader(schema, {"path": d, "widths": "2,2"})

    rows, off1 = reader.read(reader.initialOffset())
    assert [tuple(r) for r in rows] == [("x1", "y1")]
    assert off1["last"] == "b.txt" and off1["n_files"] == 1

    # append-only contract honored: a later-sorting file is consumed
    _write_fw(os.path.join(d, "c.txt"), ["x2y2"])
    rows, off2 = reader.read(off1)
    assert [tuple(r) for r in rows] == [("x2", "y2")]

    # contract violated: a file sorting BEFORE the committed offset
    # appears — positional offsets would silently replay/skip; the
    # name-based offset must refuse instead
    _write_fw(os.path.join(d, "a.txt"), ["x0y0"])
    with pytest.raises(RuntimeError, match="append-only"):
        reader.read(off2)

    # replay of a committed range stays deterministic while the
    # listing prefix is intact
    os.remove(os.path.join(d, "a.txt"))
    replay = list(reader.readBetweenOffsets(off1, off2))
    assert [tuple(r) for r in replay] == [("x2", "y2")]


# ---------------------------------------------------------------------------
# DDL format-clause cross-validation (ADVICE r5, low)
# ---------------------------------------------------------------------------


def test_ddl_rejects_widths_outside_fixedwidth():
    from datafusion_archive_spark.ddl import parse_create_external_table

    with pytest.raises(ValueError, match="WIDTHS.*FIXEDWIDTH"):
        parse_create_external_table(
            "CREATE EXTERNAL TABLE t STORED AS CSV WIDTHS '1,2' "
            "LOCATION '/tmp/x'"
        )


def test_ddl_rejects_rowtag_outside_xml():
    from datafusion_archive_spark.ddl import parse_create_external_table

    with pytest.raises(ValueError, match="ROWTAG.*XML"):
        parse_create_external_table(
            "CREATE EXTERNAL TABLE t STORED AS PARQUET ROWTAG 'row' "
            "LOCATION '/tmp/x'"
        )


def test_ddl_rejects_malformed_widths_at_parse_time():
    from datafusion_archive_spark.ddl import parse_create_external_table

    with pytest.raises(ValueError, match="WIDTHS"):
        parse_create_external_table(
            "CREATE EXTERNAL TABLE t STORED AS FIXEDWIDTH WIDTHS '6,,8' "
            "LOCATION '/tmp/x'"
        )


def test_ddl_valid_fixedwidth_still_parses():
    from datafusion_archive_spark.ddl import parse_create_external_table

    t = parse_create_external_table(
        "CREATE EXTERNAL TABLE t STORED AS FIXEDWIDTH WIDTHS '6, 12, 8' "
        "LOCATION '/tmp/x'"
    )
    assert t.widths == "6,12,8"


# ---------------------------------------------------------------------------
# Observation counters on empty input (ADVICE r5, low)
# ---------------------------------------------------------------------------


def test_observe_quality_empty_input_reports_zero(spark):
    from datafusion_archive_spark.operators.metrics import observe_quality

    df = spark.createDataFrame([], "a int, b string").filter(F.lit(False))
    observed, obs = observe_quality(
        df, null_cols=["b"], violation=F.col("a") < 0
    )
    observed.count()
    got = obs.get
    assert got["n_rows"] == 0
    assert got["n_null_b"] == 0, "SUM over zero rows must coalesce to 0"
    assert got["n_violations"] == 0


# ---------------------------------------------------------------------------
# forward as-of tie determinism (ADVICE r5, low)
# ---------------------------------------------------------------------------


def test_asof_forward_tie_is_deterministic(spark):
    from datafusion_archive_spark.operators.asof import asof_join_forward

    left = spark.createDataFrame([("k", 10)], "key string, t int")
    # three right rows share (key, ts): the carried value must be the
    # greatest value tuple, independent of shuffle order
    right = spark.createDataFrame(
        [("k", 10, 1.0), ("k", 10, 9.0), ("k", 10, 5.0)],
        "key string, t int, v double",
    )
    for _ in range(3):
        out = asof_join_forward(
            left, right.repartition(8), "key", "t", "t", ["v"]
        ).collect()
        assert [r.v_asof for r in out] == [9.0]


def test_asof_backward_tie_is_deterministic(spark):
    from datafusion_archive_spark.operators.asof import asof_join

    left = spark.createDataFrame([("k", 10)], "key string, t int")
    right = spark.createDataFrame(
        [("k", 10, 2.0), ("k", 10, 7.0), ("k", 10, 4.0)],
        "key string, t int, v double",
    )
    for _ in range(3):
        out = asof_join(
            left, right.repartition(8), "key", "t", "t", ["v"]
        ).collect()
        assert [r.v_asof for r in out] == [7.0]


# ---------------------------------------------------------------------------
# SPRT partitioned-window plan (VERDICT r5 #6)
# ---------------------------------------------------------------------------


def test_sprt_windows_partition_by_arm(spark, sf_dir):
    """Every window in the SPRT plan must partition by the experiment
    arm — the certified row may not run a full-stream global window
    (which funnels the entire trial stream through one task)."""
    import re

    from datafusion_archive_spark.plans.inspect import plan_string
    from datafusion_archive_spark.queries import QUERIES

    raw = plan_string(QUERIES["sprt_ab_sequential"](spark, sf_dir))
    windows = re.findall(r"(?:Window|RunningWindowFunction)\s*\[.*", raw)
    assert windows, raw
    for w in windows:
        assert "arm" in w, f"unpartitioned window in SPRT plan: {w}"


# ---------------------------------------------------------------------------
# load_table memo semantics (round-6 plan-construction optimization)
# ---------------------------------------------------------------------------


def test_load_table_memoizes_per_session(spark, sf_dir):
    from datafusion_archive_spark.operators.util import load_table

    a = load_table(spark, sf_dir, "nation")
    b = load_table(spark, sf_dir, "nation")
    assert a is b, "same (session, dir, table) must return the cached handle"
    c = load_table(spark, sf_dir, "region")
    assert c is not a
    assert a.count() == 25


def test_load_table_rebuilds_for_new_session(spark, sf_dir):
    """A handle from a dead/other session must not leak across — the
    memo keys on the session object identity."""
    from datafusion_archive_spark.operators import util

    key = (sf_dir, "nation")
    df = util.load_table(spark, sf_dir, "nation")
    # simulate a stale entry from another session object
    util._TABLE_HANDLES[key] = (object(), df)
    rebuilt = util.load_table(spark, sf_dir, "nation")
    assert util._TABLE_HANDLES[key][0] is spark
    assert rebuilt.count() == 25


# ---------------------------------------------------------------------------
# upsert sink within-batch dedup determinism
# ---------------------------------------------------------------------------


def test_upsert_sink_batch_dedup_is_deterministic(spark, tmp_path):
    """A batch carrying several versions of a key must converge to
    the SAME row whatever the partitioning — dropDuplicates would keep
    a partition-order-dependent row, so a replayed batch could differ."""
    from datafusion_archive_spark.streaming.sinks import ParquetUpsertSink

    rows = [(1, "a"), (1, "c"), (1, "b"), (2, "x")]
    picked = set()
    for i in range(3):
        target = str(tmp_path / f"t{i}")
        sink = ParquetUpsertSink(spark, target, key="k")
        sink(
            spark.createDataFrame(rows, "k int, v string").repartition(7),
            0,
        )
        picked.add(tuple(sorted((r.k, r.v) for r in sink.read().collect())))
    assert picked == {((1, "c"), (2, "x"))}, picked


# ---------------------------------------------------------------------------
# compact() rollback under a rename failure (same contract as the sinks)
# ---------------------------------------------------------------------------


def test_compact_rolls_back_when_second_rename_dies(
    spark, tmp_path, monkeypatch
):
    from datafusion_archive_spark.sources.layout import compact

    path = str(tmp_path / "tbl")
    spark.range(100).repartition(8).write.parquet(path)
    before = set(r.id for r in spark.read.parquet(path).collect())

    real_rename = os.rename

    def dying_rename(src, dst):
        if src.endswith("__compact_tmp"):
            raise OSError("injected: crash between the two renames")
        return real_rename(src, dst)

    monkeypatch.setattr(os, "rename", dying_rename)
    with pytest.raises(OSError, match="injected"):
        compact(spark, path, target_files=1)
    monkeypatch.undo()

    # rollback restored the original table in place, fully readable
    assert set(r.id for r in spark.read.parquet(path).collect()) == before

    # and compaction succeeds after recovery
    compact(spark, path, target_files=1)
    assert set(r.id for r in spark.read.parquet(path).collect()) == before


# ---------------------------------------------------------------------------
# exact distributed quantiles (operators/quantiles.py)
# ---------------------------------------------------------------------------


@pytest.mark.slow
def test_exact_order_statistics_differential(spark):
    """Histogram-pruned selection == sorted-list indexing on random
    data with duplicates, constants, and mixed magnitudes."""
    import random
    import statistics

    from datafusion_archive_spark.operators.quantiles import (
        exact_kth_smallest,
        exact_median,
        exact_order_statistics,
    )

    rng = random.Random(13)
    for _ in range(4):
        n = rng.randint(1, 3000)
        vals = [
            rng.choice(
                [rng.uniform(-1e6, 1e6), rng.gauss(0, 1), 0.0, 7.25]
            )
            for _ in range(n)
        ]
        df = spark.createDataFrame([(v,) for v in vals], "x double")
        s = sorted(vals)
        assert exact_median(df, "x") == statistics.median(vals)
        k = rng.randint(1, n)
        assert exact_kth_smallest(df, "x", k) == s[k - 1]
        k2 = min(n, k + 1)
        assert exact_order_statistics(df, "x", k, k2) == (s[k - 1], s[k2 - 1])


def test_exact_median_constant_and_null_columns(spark):
    from datafusion_archive_spark.operators.quantiles import exact_median

    const = spark.createDataFrame([(3.5,)] * 7, "x double")
    assert exact_median(const, "x") == 3.5
    withnull = spark.createDataFrame(
        [(1.0,), (None,), (2.0,), (None,)], "x double"
    )
    assert exact_median(withnull, "x") == 1.5


def test_exact_quantiles_cont_bit_parity_with_percentile(spark):
    """Multi-rank histogram selection must reproduce Spark's
    percentile(col, array(...)) bit-for-bit, including interpolation."""
    import random

    from datafusion_archive_spark.operators.quantiles import (
        exact_quantiles_cont,
    )

    rng = random.Random(29)
    probs = [0.1 * i for i in range(1, 10)] + [0.0, 0.5, 1.0]
    for _ in range(3):
        n = rng.randint(1, 2500)
        vals = [
            rng.choice([rng.uniform(-9e5, 9e5), rng.gauss(0, 1), 2.5])
            for _ in range(n)
        ]
        df = spark.createDataFrame([(v,) for v in vals], "x double")
        got = exact_quantiles_cont(df, "x", probs)
        want = list(
            df.agg(
                F.percentile("x", F.array(*[F.lit(p) for p in probs]))
            ).first()[0]
        )
        assert got == want


@pytest.mark.slow
def test_quantile_search_multi_round_and_big_bucket_paths(
    spark, monkeypatch
):
    """Force the refinement paths the defaults never hit on small
    data: tiny _TAIL/_BUCKETS make the single-rank search recurse
    through multiple rounds, and the multi-rank path take its
    big-bucket fallback — results must stay exact."""
    import random
    import statistics

    from datafusion_archive_spark.operators import quantiles as Q

    monkeypatch.setattr(Q, "_BUCKETS", 8)
    monkeypatch.setattr(Q, "_TAIL", 16)

    rng = random.Random(41)
    # heavy concentration on one value plus a spread tail: buckets
    # stay unbalanced, so the pruning must handle fat buckets
    vals = [3.0] * 400 + [rng.uniform(-100, 100) for _ in range(300)]
    rng.shuffle(vals)
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    s = sorted(vals)

    assert Q.exact_median(df, "x") == statistics.median(vals)
    for k in (1, 5, 200, 400, 650, len(vals)):
        assert Q.exact_kth_smallest(df, "x", k) == s[k - 1], k

    probs = [0.05, 0.25, 0.5, 0.75, 0.95]
    got = Q.exact_quantiles_cont(df, "x", probs)
    from pyspark.sql import functions as SF

    want = list(
        df.agg(
            SF.percentile("x", SF.array(*[SF.lit(p) for p in probs]))
        ).first()[0]
    )
    assert got == want
