"""Round-7 regression pins for the ADVICE r6 fixes:

1. matview v1→v2 state migration (decimal unit sums → long micros)
2. matview exactness + overflow guards under non-ANSI mode
3. fixedwidth stream v1 (positional-only) offset backward compat
4. quantiles NaN routing (parity with Spark's percentile ordering)
5. quantiles zero-width bucket fallback
6. load_table invalidation hook (stale file-index snapshot)
"""

from __future__ import annotations

import math
import os

import pytest
from pyspark.sql import functions as F

from datafusion_archive_spark.operators import quantiles as Q
from datafusion_archive_spark.operators.util import (
    invalidate_tables,
    load_table,
)
from datafusion_archive_spark.sources.pydatasource import (
    FixedWidthStreamReader,
)
from datafusion_archive_spark.streaming.matview import (
    _MAX_EXACT_UNITS,
    _SUM_GUARD,
    IncrementalRollupSink,
)
from pyspark.sql.types import StructType


# ---------------------------------------------------------------- matview


def _write_v1_state(spark, path: str, rows):
    """A state directory exactly as the v1 sink wrote it: sum_v is a
    decimal(27,6) in MONEY UNITS (not micros) plus the batch marker."""
    spark.createDataFrame(rows, "k string, n long").withColumn(
        "sum_v", (F.col("n") * 1.5).cast("decimal(27,6)")
    ).write.mode("overwrite").parquet(path)
    with open(os.path.join(path, "_last_batch_id"), "w") as fh:
        fh.write("0")


def test_matview_migrates_v1_decimal_state(spark, tmp_path):
    """A pre-existing v1 (decimal unit-sum) state directory must be
    converted to long micros before merging — ADVICE r6: merging it
    as-is silently mixed unit sums with micro sums (10^6x wrong)."""
    target = str(tmp_path / "state")
    _write_v1_state(spark, target, [("a", 4), ("b", 2)])  # sums 6.0, 3.0
    sink = IncrementalRollupSink(spark, target, ["k"], "v")
    # read_state alone must already present micros
    st = {r.k: (r.n, r.sum_v) for r in sink.read_state().collect()}
    assert st == {"a": (4, 6_000_000), "b": (2, 3_000_000)}
    # and a fold on top must produce unit-correct view values
    batch = spark.createDataFrame([("a", 1.0), ("c", 2.5)], "k string, v double")
    sink(batch, 1)
    view = {r.k: (r.n_events, r.sum_value) for r in sink.read_view().collect()}
    assert view == {"a": (5, 7.0), "b": (2, 3.0), "c": (1, 2.5)}


def test_matview_rejects_unknown_state_dtype(spark, tmp_path):
    target = str(tmp_path / "state")
    spark.createDataFrame(
        [("a", 1, "oops")], "k string, n long, sum_v string"
    ).write.mode("overwrite").parquet(target)
    sink = IncrementalRollupSink(spark, target, ["k"], "v")
    with pytest.raises(RuntimeError, match="unrecognized sum_v dtype"):
        sink.read_state()


def test_matview_guards_exactness_and_overflow(spark, tmp_path):
    """ANSI is off by default, so the sink must guard explicitly:
    |value| past double's exact-integer micro range is refused, and a
    merged sum near long overflow raises instead of wrapping."""
    assert spark.conf.get("spark.sql.ansi.enabled", "false") == "false"
    sink = IncrementalRollupSink(spark, str(tmp_path / "s1"), ["k"], "v")
    too_big = spark.createDataFrame(
        [("a", float(_MAX_EXACT_UNITS * 2))], "k string, v double"
    )
    with pytest.raises(ValueError, match="exact-integer range"):
        sink(too_big, 0)
    # overflow headroom: seed a state whose sum_v is already past the
    # guard; the next fold must raise OverflowError, not wrap
    target = str(tmp_path / "s2")
    spark.createDataFrame(
        [("a", 1, _SUM_GUARD + 1)], "k string, n long, sum_v long"
    ).write.mode("overwrite").parquet(target)
    with open(os.path.join(target, "_last_batch_id"), "w") as fh:
        fh.write("0")
    sink2 = IncrementalRollupSink(spark, target, ["k"], "v")
    ok = spark.createDataFrame([("a", 1.0)], "k string, v double")
    with pytest.raises(OverflowError, match="headroom guard"):
        sink2(ok, 1)


# ----------------------------------------------------- fixedwidth offsets


def _stream_reader(tmp_path) -> FixedWidthStreamReader:
    d = tmp_path / "fw"
    d.mkdir(exist_ok=True)
    for i in range(4):
        (d / f"part-{i:03d}.txt").write_text(f"{i:03d}x{i}\n")
    schema = StructType.fromDDL("a string, b string")
    return FixedWidthStreamReader(
        schema, {"path": str(d), "widths": "3,2"}
    )


def test_fixedwidth_resumes_from_v1_positional_offset(tmp_path):
    """A checkpoint committed by the old positional-only offset format
    ({'n_files': k}, no 'last') must resume with files[k:], not crash
    with a bogus append-only violation — ADVICE r6."""
    r = _stream_reader(tmp_path)
    rows, end = r.read({"n_files": 2})  # v1 offset: 2 files consumed
    got = sorted(t[0] for t in rows)
    assert got == ["002", "003"]
    # and the emitted offset is the new name-based format
    assert end == {"n_files": 4, "last": "part-003.txt"}


def test_fixedwidth_replays_v1_offset_range(tmp_path):
    """readBetweenOffsets over a fully-v1 (start, end) pair replays the
    positional slice files[start_k:end_k]."""
    r = _stream_reader(tmp_path)
    rows = list(r.readBetweenOffsets({"n_files": 1}, {"n_files": 3}))
    assert sorted(t[0] for t in rows) == ["001", "002"]
    # mixed: v1 start, v2 end
    rows2 = list(
        r.readBetweenOffsets({"n_files": 1}, {"n_files": 4, "last": "part-003.txt"})
    )
    assert sorted(t[0] for t in rows2) == ["001", "002", "003"]


# ------------------------------------------------------------- quantiles


def test_quantiles_nan_parity_with_percentile(spark):
    """NaNs sort GREATER than any double in Spark; the bucket search
    must route them to the top ranks (ADVICE r6: they used to corrupt
    the histogram range and land in bucket 0)."""
    data = [(float(i),) for i in range(1, 10)] + [(float("nan"),)] * 2
    df = spark.createDataFrame(data, "x double")
    for p in (0.5, 0.75, 0.9, 1.0):
        want = df.agg(F.percentile("x", F.lit(p))).first()[0]
        got = Q.exact_quantiles_cont(df, "x", [p])[0]
        assert (math.isnan(want) and math.isnan(got)) or want == got, p
    assert Q.exact_median(df, "x") == 6.0
    v1, v2 = Q.exact_order_statistics(df, "x", 9, 10)
    assert v1 == 9.0 and math.isnan(v2)
    v1, v2 = Q.exact_order_statistics(df, "x", 10, 11)
    assert math.isnan(v1) and math.isnan(v2)


def test_quantiles_nan_routed_in_bucket_rounds(spark, monkeypatch):
    """Force the refinement loop to actually run (tiny _TAIL) with
    NaNs present — the search must stay NaN-free internally and still
    return the exact order statistics."""
    monkeypatch.setattr(Q, "_TAIL", 4)
    data = [(float(i),) for i in range(1, 100)] + [(float("nan"),)] * 3
    df = spark.createDataFrame(data, "x double")
    assert Q.exact_kth_smallest(df, "x", 50) == 50.0
    assert Q.exact_order_statistics(df, "x", 99, 100) == pytest.approx(
        (99.0, float("nan")), nan_ok=True
    )


def test_quantiles_zero_width_range(spark, monkeypatch):
    """A value range so small that (hi-lo)/_BUCKETS rounds to 0.0 must
    fall back to the exact finish instead of looping on floor(x/0)."""
    monkeypatch.setattr(Q, "_TAIL", 2)
    base = 5e-324  # the smallest subnormal double
    data = [(base * i,) for i in range(1, 8)]
    df = spark.createDataFrame(data, "x double")
    assert Q.exact_kth_smallest(df, "x", 3) == base * 3
    got = Q.exact_quantiles_cont(df, "x", [0.0, 0.5, 1.0])
    want = [
        df.agg(F.percentile("x", F.lit(p))).first()[0] for p in (0.0, 0.5, 1.0)
    ]
    assert got == want


def test_quantiles_all_nan(spark):
    df = spark.createDataFrame([(float("nan"),)] * 5, "x double")
    assert math.isnan(Q.exact_median(df, "x"))
    assert all(math.isnan(v) for v in Q.exact_quantiles_cont(df, "x", [0.5]))


# ------------------------------------------------------------ load_table


def test_load_table_invalidation(spark, tmp_path):
    """spark.read.parquet snapshots the file index at DataFrame
    creation; after rewriting a table dir the memoized handle is
    stale by design — invalidate_tables must force re-resolution."""
    d = str(tmp_path)
    spark.range(3).write.mode("overwrite").parquet(f"{d}/t.parquet")
    h1 = load_table(spark, d, "t")
    assert h1.count() == 3
    assert load_table(spark, d, "t") is h1  # memo hit
    spark.range(7).write.mode("overwrite").parquet(f"{d}/t.parquet")
    invalidate_tables(d, "t")
    h2 = load_table(spark, d, "t")
    assert h2 is not h1
    assert h2.count() == 7


# ------------------------------------------------- quantiles property


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_SPECIALS = [
    float("nan"),
    float("inf"),
    float("-inf"),
    0.0,
    -0.0,
    5e-324,
    1e308,
    -1e308,
]
_VALS = st.lists(
    st.one_of(
        st.sampled_from(_SPECIALS),
        st.floats(allow_nan=False, allow_infinity=False, width=64),
        st.integers(min_value=-5, max_value=5).map(float),
    ),
    min_size=1,
    max_size=30,
)
_PROBS = st.lists(
    st.sampled_from([0.0, 0.1, 0.25, 0.5, 0.75, 0.9, 1.0]),
    min_size=1,
    max_size=3,
    unique=True,
)


def _same(a: float, b: float) -> bool:
    if a is None or b is None:
        return a is None and b is None
    return (math.isnan(a) and math.isnan(b)) or a == b


@given(_VALS, _PROBS)
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@pytest.mark.slow
def test_exact_quantiles_match_percentile_aggregate(spark, xs, probs):
    """exact_quantiles_cont must be BIT-IDENTICAL to Spark's
    percentile aggregate on arbitrary doubles, including NaN/±inf/
    subnormals/duplicates — the contract the five certified cutpoint
    queries rely on."""
    df = spark.createDataFrame([(v,) for v in xs], "x double")
    arr = ", ".join(repr(p) for p in probs)
    want = df.agg(F.expr(f"percentile(x, array({arr}))")).first()[0]
    got = Q.exact_quantiles_cont(df, "x", probs)
    assert len(got) == len(want)
    for g, w, p in zip(got, want, probs):
        assert _same(g, w), (p, g, w, sorted(xs, key=lambda v: (math.isnan(v), v)))


@given(_VALS, st.data())
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_exact_order_statistics_match_sorted(spark, xs, data):
    """exact_order_statistics(k1, k2) must equal the k-th smallest
    values under Spark's double ordering (NaN greatest)."""
    n = len(xs)
    k1 = data.draw(st.integers(min_value=1, max_value=n))
    k2 = data.draw(st.integers(min_value=k1, max_value=min(n, k1 + 1)))
    df = spark.createDataFrame([(v,) for v in xs], "x double")
    ordered = sorted(xs, key=lambda v: (math.isnan(v), v))
    v1, v2 = Q.exact_order_statistics(df, "x", k1, k2)
    assert _same(v1, ordered[k1 - 1]) and _same(v2, ordered[k2 - 1]), (
        k1,
        k2,
        ordered,
    )


# --------------------------------------------------- grouped quantiles


def test_grouped_quantiles_match_grouped_percentile(spark):
    """exact_grouped_quantiles must equal groupBy().percentile()
    bit-for-bit across mixed group shapes: large, tiny, singleton,
    NaN-bearing, all-NaN, and subnormal-width groups."""
    import random

    random.seed(7)
    rows = []
    for g, n in [("a", 1000), ("b", 7), ("c", 1), ("d", 50)]:
        rows += [(g, random.gauss(0.0, 100.0)) for _ in range(n)]
    rows += [("a", float("nan"))] * 3 + [("e", float("nan"))]
    rows += [("f", 5e-324), ("f", 1e-323), ("f", 1.5e-323)]
    df = spark.createDataFrame(rows, "k string, x double")
    probs = [0.0, 0.25, 0.5, 0.9, 1.0]
    got = Q.exact_grouped_quantiles(df, "k", "x", probs)
    want = {
        r.k: r.qs
        for r in df.groupBy("k")
        .agg(
            F.percentile(
                "x", F.array(*[F.lit(p) for p in probs])
            ).alias("qs")
        )
        .collect()
    }
    assert set(got) == set(want)
    for k in want:
        for g, w in zip(got[k], want[k]):
            assert _same(g, w), (k, got[k], want[k])


def test_grouped_quantiles_int_keys_and_group_cap(spark):
    df = spark.createDataFrame(
        [(i % 3, float(i)) for i in range(99)], "k int, x double"
    )
    got = Q.exact_grouped_quantiles(df, "k", "x", [0.5])
    want = {
        r.k: r.m
        for r in df.groupBy("k")
        .agg(F.percentile("x", F.lit(0.5)).alias("m"))
        .collect()
    }
    assert {k: v[0] for k, v in got.items()} == want
    with pytest.raises(ValueError, match="exceeds max_groups"):
        Q.exact_grouped_quantiles(df, "k", "x", [0.5], max_groups=2)


def test_grouped_quantiles_forced_histogram_path(spark, monkeypatch):
    """Shrink _TAIL so the big-bucket fallback path actually runs."""
    monkeypatch.setattr(Q, "_TAIL", 1)
    df = spark.createDataFrame(
        [("g", float(i % 13)) for i in range(500)]
        + [("h", float(i)) for i in range(40)],
        "k string, x double",
    )
    got = Q.exact_grouped_quantiles(df, "k", "x", [0.1, 0.5, 0.95])
    want = {
        r.k: r.qs
        for r in df.groupBy("k")
        .agg(
            F.percentile(
                "x", F.array(F.lit(0.1), F.lit(0.5), F.lit(0.95))
            ).alias("qs")
        )
        .collect()
    }
    for k in want:
        assert got[k] == list(want[k]), (k, got[k], want[k])


def test_grouped_quantiles_null_group_key(spark):
    """A NULL group key is a group like any other in grouped
    percentile — the search must match it through the null-safe join
    and selection sentinel instead of silently dropping it."""
    import random

    random.seed(3)
    rows = [("a", float(i)) for i in range(200)] + [
        (None, random.gauss(0.0, 10.0)) for _ in range(300)
    ]
    df = spark.createDataFrame(rows, "k string, x double")
    probs = [0.25, 0.5, 0.75]
    got = Q.exact_grouped_quantiles(df, "k", "x", probs)
    want = {
        r.k: r.qs
        for r in df.groupBy("k")
        .agg(
            F.percentile(
                "x", F.array(*[F.lit(p) for p in probs])
            ).alias("qs")
        )
        .collect()
    }
    assert set(got) == {"a", None}
    for k in want:
        assert got[k] == list(want[k]), (k, got[k], want[k])


def test_matview_stream_resumes_over_v1_state(spark, sf_dir, tmp_path):
    """End-to-end migration: run the rollup stream once (checkpoint +
    marker established), rewrite the state directory to the v1 format
    (decimal UNIT sums) as an old deployment left it, add new source
    files and RESUME — the next micro-batch must fold into the
    MIGRATED state, and the final view must equal the full batch
    rollup over everything ever streamed."""
    import shutil

    from datafusion_archive_spark.streaming.matview import (
        stream_incremental_rollup,
    )

    src = str(tmp_path / "src")
    first = spark.createDataFrame(
        [("a", 1.25), ("a", 2.0), ("b", 0.5)] * 2, "k string, v double"
    )
    first.coalesce(1).write.parquet(src)
    target = str(tmp_path / "state")
    schema = spark.read.parquet(src).schema
    q, sink = stream_incremental_rollup(spark, src, schema, target, ["k"], "v")
    try:
        q.awaitTermination(120)
    finally:
        q.stop()
    marker = os.path.join(target, "_last_batch_id")
    with open(marker) as fh:
        applied = fh.read()
    # rewrite the state dir to v1 (decimal unit sums), marker kept
    v1 = {
        r.k: (r.n, r.sum_v / 1_000_000)
        for r in spark.read.parquet(target).collect()
    }
    shutil.rmtree(target)
    spark.createDataFrame(
        [(k, n, float(s)) for k, (n, s) in v1.items()],
        "k string, n long, units double",
    ).withColumn("sum_v", F.col("units").cast("decimal(27,6)")).drop(
        "units"
    ).write.parquet(target)
    with open(marker, "w") as fh:
        fh.write(applied)
    # new files arrive; the resumed stream folds them into migrated state
    second = spark.createDataFrame(
        [("a", 10.0), ("c", 4.75)], "k string, v double"
    )
    second.coalesce(1).write.mode("append").parquet(src)
    q2, sink2 = stream_incremental_rollup(
        spark, src, schema, target, ["k"], "v"
    )
    try:
        q2.awaitTermination(120)
    finally:
        q2.stop()
    got = {
        r.k: (r.n_events, r.sum_value) for r in sink2.read_view().collect()
    }
    assert got == {
        "a": (5, 2 * 3.25 + 10.0),
        "b": (2, 1.0),
        "c": (1, 4.75),
    }
    # and the state on disk is v2 (long micros) again
    from pyspark.sql.types import LongType

    assert isinstance(
        spark.read.parquet(target).schema["sum_v"].dataType, LongType
    )


def test_fixedwidth_stream_resumes_from_v1_checkpoint(spark, tmp_path):
    """End-to-end v1-offset resume: run the fixedwidth stream, rewrite
    the committed checkpoint offset to the old positional-only format
    ({"n_files": k} — exactly what a pre-upgrade checkpoint holds),
    add new files and restart: the stream must continue with only the
    new files (no crash, no replay) and commit name-based offsets."""
    import glob
    import json

    from datafusion_archive_spark.sources import pydatasource

    pydatasource.register(spark)
    d = str(tmp_path)
    src, out, ckpt = f"{d}/src", f"{d}/out", f"{d}/ckpt"
    os.makedirs(src)
    for i in range(2):
        with open(f"{src}/f{i:02d}.txt", "w") as fh:
            fh.write(f"{i:03d}ab\n")

    def run():
        stream = (
            spark.readStream.format("fixedwidth")
            .schema("a string, b string")
            .option("path", src)
            .option("widths", "3,2")
            .load()
        )
        q = (
            stream.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(60)
        q.stop()

    run()
    # rewrite the committed offset to the v1 positional format
    off = sorted(glob.glob(f"{ckpt}/offsets/[0-9]*"))[-1]
    lines = open(off).read().splitlines()
    assert json.loads(lines[-1]) == {"n_files": 2, "last": "f01.txt"}
    lines[-1] = json.dumps({"n_files": 2})
    with open(off, "w") as fh:
        fh.write("\n".join(lines))
    crc = os.path.join(os.path.dirname(off), f".{os.path.basename(off)}.crc")
    if os.path.exists(crc):
        os.remove(crc)
    # two new files arrive; the resumed stream must pick up ONLY them
    for i in (2, 3):
        with open(f"{src}/f{i:02d}.txt", "w") as fh:
            fh.write(f"{i:03d}cd\n")
    run()
    got = sorted(r.a for r in spark.read.parquet(out).collect())
    assert got == ["000", "001", "002", "003"]
    # and the new commit is name-based again
    off2 = sorted(glob.glob(f"{ckpt}/offsets/[0-9]*"))[-1]
    assert json.loads(open(off2).read().splitlines()[-1]) == {
        "n_files": 4,
        "last": "f03.txt",
    }


def test_quantiles_equal_key_interpolation_no_underflow(spark):
    """Spark Percentile short-circuits equal lower/higher KEYS; plain
    numeric interpolation there underflows (0.5·5e-324 rounds to 0.0
    half-even). Pin the shortcut on the smallest subnormal."""
    data = [(0.0,), (0.0,), (5e-324,), (5e-324,)]
    df = spark.createDataFrame(data, "x double")
    # pos = 1.5: both ranks hold... rank2=0.0, rank3=5e-324 → interp;
    # pos = 2.5 falls between the two 5e-324 rows → equal keys
    for p in (0.5, 0.75, 1.0):
        want = df.agg(F.percentile("x", F.lit(p))).first()[0]
        got = Q.exact_quantiles_cont(df, "x", [p])[0]
        assert got == want, (p, got, want)
    gq = Q.exact_grouped_quantiles(
        df.withColumn("k", F.lit("g")), "k", "x", [0.75]
    )
    assert gq["g"][0] == df.agg(F.percentile("x", F.lit(0.75))).first()[0]
