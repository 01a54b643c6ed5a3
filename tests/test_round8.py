"""Round-8 regression pins for the ADVICE r7 fixes plus the new
weighted-quantile search (VERDICT r7 #3):

1. matview v1 migration refuses a decimal sum past long range
   (previously Decimal.toLong wrapped to the low 64 bits silently)
2. matview overflow-guard raise does not leak the persisted merge
3. exact_grouped_quantiles caps driver collection BEFORE materializing
   (limit-guarded stats) and rejects non-string/integral key dtypes
4. lit_cutpoints keeps empty-input call sites null-shaped instead of
   crashing on float(None)
5. weighted_lower_quantiles_grouped: differential vs the cumulative
   window sweep, plus contract edges (zero/negative weights, NaN,
   single-value groups, the 0/den target)
6. q_weighted_median pinned against the window sweep it replaced
7. operators/ranks.bucketed_group_rank: differentials vs
   row_number()/rank() and the built-in ntile/percent_rank/cume_dist
   over plain per-group windows, plus the NaN / cardinality /
   null-key guards (the low-cardinality per-row-rank scale fix)
"""

from __future__ import annotations

import os
import random

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from datafusion_archive_spark.operators import quantiles as Q
from datafusion_archive_spark.streaming.matview import (
    _SUM_GUARD,
    IncrementalRollupSink,
)


# ---------------------------------------------------------------- matview


def test_matview_v1_migration_refuses_long_overflow(spark, tmp_path):
    """ADVICE r7 #1: a v1 decimal sum whose micros exceed long range
    must raise during migration, never wrap through Decimal.toLong."""
    target = str(tmp_path / "state")
    huge = (_SUM_GUARD // 1_000_000) * 3  # units; micros ~3x the guard
    spark.createDataFrame(
        [("a", 1)], "k string, n long"
    ).withColumn(
        "sum_v", F.lit(huge).cast("decimal(27,6)")
    ).write.mode("overwrite").parquet(target)
    with open(os.path.join(target, "_last_batch_id"), "w") as fh:
        fh.write("0")
    sink = IncrementalRollupSink(spark, target, ["k"], "v")
    with pytest.raises(OverflowError, match="silently wrap"):
        sink.read_state()


def test_matview_guard_raise_does_not_leak_cache(spark, tmp_path):
    """ADVICE r7 #3: when the merged-sum guard raises, the persisted
    merge DataFrame must be unpersisted on the way out."""
    target = str(tmp_path / "s")
    spark.createDataFrame(
        [("a", 1, _SUM_GUARD + 1)], "k string, n long, sum_v long"
    ).write.mode("overwrite").parquet(target)
    with open(os.path.join(target, "_last_batch_id"), "w") as fh:
        fh.write("0")
    sink = IncrementalRollupSink(spark, target, ["k"], "v")
    batch = spark.createDataFrame([("a", 1.0)], "k string, v double")
    jsc = spark.sparkContext._jsc.sc()
    before = jsc.getPersistentRDDs().size()
    with pytest.raises(OverflowError, match="headroom guard"):
        sink(batch, 1)
    assert jsc.getPersistentRDDs().size() == before


# ----------------------------------------------------- grouped quantiles


def test_grouped_quantiles_guard_fires_without_full_collect(spark):
    """ADVICE r7 #2: the max_groups guard must bound what reaches the
    driver — the stats collection is limit(max_groups+1)-guarded, so
    an accidental high-cardinality key raises after shipping at most
    max_groups+1 rows."""
    df = spark.range(0, 10_000).select(
        F.col("id").alias("k"), (F.col("id") % 97).cast("double").alias("x")
    )
    with pytest.raises(ValueError, match="max_groups=8"):
        Q.exact_grouped_quantiles(df, "k", "x", [0.5], max_groups=8)
    # the guard text names the escape hatches
    with pytest.raises(ValueError, match="sketch path"):
        Q.exact_grouped_quantiles(df, "k", "x", [0.5], max_groups=8)


def test_grouped_quantiles_rejects_nonstring_key_dtype(spark):
    """ADVICE r7 #5 (exact path): a boolean/float/date key silently
    matched nothing in the concat_ws selection filter; the EXACT
    grouped search still fails fast naming the fallback.

    ADVICE r8 #3 relaxed the WEIGHTED path to all atomic key types —
    it matches groups by value via eqNullSafe, not by string form —
    so the old pin that a double key raises is replaced by the new
    contract: a double key is ACCEPTED and the unit-weight quantiles
    bit-match the built-in grouped ``percentile``."""
    df = spark.createDataFrame(
        [(True, 1.0), (False, 2.0)], "k boolean, x double"
    )
    with pytest.raises(ValueError, match="string/integral"):
        Q.exact_grouped_quantiles(df, "k", "x", [0.5])
    # weighted path: double key accepted, values match percentile(0.0)
    # (the lower quantile at num/den=1/2 over unit weights equals the
    # smallest v with rank*2 >= n — the discrete lower median).
    rows = [
        (1.5, 10.0), (1.5, 20.0), (1.5, 30.0), (1.5, 40.0),
        (2.5, 7.0), (2.5, 9.0),
    ]
    dfd = spark.createDataFrame(rows, "k double, x double")
    got = Q.weighted_lower_quantiles_grouped(
        dfd, "k", "x", F.lit(1), [(1, 2), (1, 1)]
    )
    assert set(got) == {1.5, 2.5}
    assert got[1.5] == ([20.0, 40.0], 4)
    assert got[2.5] == ([7.0, 9.0], 2)


def test_lit_cutpoints_null_safe_on_empty_input(spark):
    """ADVICE r7 #4: empty input -> [None,...] cutpoints -> the old
    plans produced null cutpoints; lit_cutpoints must build the same
    null literals instead of crashing in float(None)."""
    empty = spark.createDataFrame([], "x double")
    cuts = Q.exact_quantiles_cont(empty, "x", [0.25, 0.5])
    assert cuts == [None, None]
    arr = Q.lit_cutpoints(cuts)  # must not raise
    out = (
        spark.range(1)
        .select(
            F.aggregate(
                arr,
                F.lit(0),
                lambda acc, b: acc + F.when(F.lit(1.0) > b, 1).otherwise(0),
            ).alias("bucket")
        )
        .first()
    )
    # x > null is null -> the fold adds nothing: bucket 0, like the
    # old percentile-aggregate plans on an empty table
    assert out.bucket == 0
    # non-null values still inline exactly
    assert Q.lit_cutpoints([1.5, None]) is not None


# ---------------------------------------------------- weighted quantiles


def _sweep_reference(spark, rows, targets):
    """The certified cumulative-window formulation (the plan the
    search replaced) as the differential oracle."""
    df = spark.createDataFrame(rows, "k string, v double, w long")
    by_v = df.filter("w > 0").groupBy("k", "v").agg(
        F.sum("w").alias("wt")
    )
    w = Window.partitionBy("k").orderBy("v")
    cum = by_v.withColumn(
        "c",
        F.sum("wt").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    ).withColumn("t", F.sum("wt").over(Window.partitionBy("k")))
    aggs = [
        F.min(
            F.when(F.col("c") * den >= F.col("t") * num, F.col("v"))
        ).alias(f"q{i}")
        for i, (num, den) in enumerate(targets)
    ]
    out = {}
    for row in cum.groupBy("k").agg(*aggs, F.max("t").alias("t")).collect():
        out[row.k] = ([row[f"q{i}"] for i in range(len(targets))], row.t)
    return out


def test_weighted_quantiles_match_window_sweep(spark):
    """Bit-exact differential: the histogram search must reproduce
    the cumulative-window sweep on skewed random integer-weighted
    data, including duplicate values and all-equal groups."""
    rng = random.Random(81)
    rows = []
    for k, n in (("a", 400), ("b", 50), ("c", 1)):
        for _ in range(n):
            v = round(rng.expovariate(0.001), 2)
            rows.append((k, v, rng.randint(1, 9)))
    rows += [("a", rows[0][1], 3)]  # duplicate value, extra weight
    rows += [("d", 7.5, 2), ("d", 7.5, 5)]  # single-distinct group
    targets = [(0, 4), (1, 4), (2, 4), (3, 4), (4, 4)]
    df = spark.createDataFrame(rows, "k string, v double, w long")
    got = Q.weighted_lower_quantiles_grouped(df, "k", "v", "w", targets)
    want = _sweep_reference(spark, rows, targets)
    assert got == want


def test_weighted_quantiles_contract_edges(spark):
    base = [("a", 1.0, 2), ("a", 2.0, 0), ("a", 3.0, 1)]
    df = spark.createDataFrame(base, "k string, v double, w long")
    # zero weights are dropped: p100 over weights (2,0,1) -> 3.0, and
    # the median lands on 1.0 (cum 2 of total 3 >= ceil(1.5))
    res = Q.weighted_lower_quantiles_grouped(
        df, "k", "v", "w", [(1, 2), (1, 1)]
    )
    assert res == {"a": ([1.0, 3.0], 3)}
    # a group with no positive weight is omitted
    df2 = spark.createDataFrame(
        base + [("z", 9.0, 0)], "k string, v double, w long"
    )
    res2 = Q.weighted_lower_quantiles_grouped(df2, "k", "v", "w", [(1, 2)])
    assert set(res2) == {"a"}
    # negative weights raise instead of silently dropping
    df3 = spark.createDataFrame(
        base + [("a", 4.0, -1)], "k string, v double, w long"
    )
    with pytest.raises(ValueError, match="non-monotone"):
        Q.weighted_lower_quantiles_grouped(df3, "k", "v", "w", [(1, 2)])
    # NaN values raise
    df4 = spark.createDataFrame(
        base + [("a", float("nan"), 1)], "k string, v double, w long"
    )
    with pytest.raises(ValueError, match="NaN"):
        Q.weighted_lower_quantiles_grouped(df4, "k", "v", "w", [(1, 2)])
    # malformed target fractions raise
    with pytest.raises(ValueError, match="target fraction"):
        Q.weighted_lower_quantiles_grouped(df, "k", "v", "w", [(1, 0)])


from hypothesis import HealthCheck, assume, given, settings
from hypothesis import strategies as st

_W_SPECIALS = [0.0, -0.0, 5e-324, 1e308, -1e308, 1e-300, 123.456]
_W_VALS = st.lists(
    st.tuples(
        st.one_of(
            st.sampled_from(_W_SPECIALS),
            st.floats(allow_nan=False, allow_infinity=False, width=64),
            st.integers(min_value=-3, max_value=3).map(float),
        ),
        st.integers(min_value=0, max_value=5),
    ),
    min_size=1,
    max_size=25,
)


@given(_W_VALS)
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@pytest.mark.slow
def test_weighted_quantiles_fuzz_vs_sweep(spark, pairs):
    """Hypothesis differential (the round-7 fuzz pattern that caught
    the subnormal/huge-double bugs in the unweighted search): the
    weighted search must equal the cumulative-window sweep on
    arbitrary finite doubles — specials, subnormals, ±1e308,
    duplicates — with weights in 0..5 (zeros exercise the drop
    path)."""
    assume(any(w > 0 for _, w in pairs))
    rows = [("g", v, w) for v, w in pairs] + [
        ("h", pairs[0][0], max(pairs[0][1], 1))
    ]
    targets = [(0, 4), (1, 4), (2, 4), (3, 4), (4, 4)]
    df = spark.createDataFrame(rows, "k string, v double, w long")
    got = Q.weighted_lower_quantiles_grouped(df, "k", "v", "w", targets)
    want = _sweep_reference(spark, rows, targets)
    assert got == want, (rows, got, want)


def test_weighted_quantiles_recursive_fallback_path(spark):
    """Force the big-bucket recursion (_weighted_search_single) by
    shrinking the tail/bucket thresholds via monkeypatch-free slice:
    a value set concentrated on one bucket still resolves exactly."""
    rows = [("a", 5.0 + i * 1e-12, 1 + (i % 3)) for i in range(200)]
    rows += [("a", 1e6, 1)]  # stretches the grid so the 5.0s share a bucket
    targets = [(1, 4), (3, 4)]
    df = spark.createDataFrame(rows, "k string, v double, w long")
    got = Q.weighted_lower_quantiles_grouped(df, "k", "v", "w", targets)
    want = _sweep_reference(spark, rows, targets)
    assert got == want


def test_weighted_median_query_matches_old_sweep(spark, sf_dir):
    """q_weighted_median rerouted onto the weighted histogram search
    in round 8 (the same VERDICT r7 #3 upgrade as weighted_quartiles);
    pin it against the cumulative-window sweep it replaced, built
    inline the way the certified plan used to."""
    from datafusion_archive_spark.queries.pipeline11 import q_weighted_median

    got = sorted(
        (r.l_returnflag, r.weighted_median_price, r.total_weight)
        for r in q_weighted_median(spark, sf_dir).collect()
    )

    l = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    by_price = l.groupBy(
        "l_returnflag", F.col("l_extendedprice").alias("price")
    ).agg(F.sum(F.col("l_quantity").cast("long")).alias("wt"))
    w = Window.partitionBy("l_returnflag").orderBy("price")
    cum = (
        by_price.withColumn(
            "_cum",
            F.sum("wt").over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
        .withColumn(
            "_total", F.sum("wt").over(Window.partitionBy("l_returnflag"))
        )
        .filter(F.col("_cum") * 2 >= F.col("_total"))
    )
    want = sorted(
        (r.l_returnflag, r.m, r.t)
        for r in cum.groupBy("l_returnflag")
        .agg(F.min("price").alias("m"), F.max("_total").alias("t"))
        .collect()
    )
    assert got == want


# ------------------------------------------------------- bucketed rank


def _rank_slab(spark, seed=7, n=5000):
    import random as _r

    _r.seed(seed)
    rows = []
    for i in range(n):
        g = _r.choice("abcd")
        v = _r.choice(
            [None, 0.0, -0.0, 1.5, _r.uniform(-1e6, 1e6),
             _r.uniform(-5, 5), float(_r.randint(-3, 3))]
        )
        rows.append((i, g, v))
    return spark.createDataFrame(rows, "id long, g string, v double")


def test_bucketed_rank_row_number_differential(spark):
    """bucketed_group_rank with a total ordering == row_number over
    the plain per-group window, on a slab mixing nulls, signed zeros,
    heavy ties, and wide magnitudes."""
    from datafusion_archive_spark.operators.ranks import bucketed_group_rank

    df = _rank_slab(spark)
    got = bucketed_group_rank(df, ["g"], "v", tiebreak=["id"])
    w = Window.partitionBy("g").orderBy(F.col("v").asc_nulls_first(), "id")
    want = df.withColumn(
        "_rank", F.row_number().over(w).cast("long")
    ).withColumn("_n", F.count(F.lit(1)).over(Window.partitionBy("g")))
    a = {r.id: (r._rank, r._n) for r in got.collect()}
    b = {r.id: (r._rank, r._n) for r in want.collect()}
    assert a == b


def test_bucketed_rank_ties_differential(spark):
    """tiebreak=None == rank() (ties share the smallest position)."""
    from datafusion_archive_spark.operators.ranks import bucketed_group_rank

    df = _rank_slab(spark, seed=11)
    got = bucketed_group_rank(df, ["g"], "v", tiebreak=None)
    w = Window.partitionBy("g").orderBy(F.col("v").asc_nulls_first())
    want = df.withColumn("_rank", F.rank().over(w).cast("long"))
    key = lambda t: (t[0], t[1] is not None, t[1] or 0.0, t[2])
    a = sorted(((r.g, r.v, r._rank) for r in got.collect()), key=key)
    b = sorted(((r.g, r.v, r._rank) for r in want.collect()), key=key)
    assert a == b


def test_bucketed_rank_derived_window_functions(spark):
    """ntile/percent_rank/cume_dist derived from (rank, n) equal the
    built-ins over the same total ordering."""
    from datafusion_archive_spark.operators.ranks import (
        bucketed_group_rank,
        cume_dist_expr,
        ntile_expr,
        percent_rank_expr,
    )

    df = _rank_slab(spark, seed=13)
    w = Window.partitionBy("g").orderBy(F.col("v").asc_nulls_first(), "id")
    got = bucketed_group_rank(df, ["g"], "v", tiebreak=["id"])
    r, n = F.col("_rank"), F.col("_n")
    der = got.select(
        "id",
        ntile_expr(r, n, 4).alias("q"),
        F.round(percent_rank_expr(r, n), 6).alias("pr"),
        F.round(cume_dist_expr(r, n), 6).alias("cd"),
    )
    bi = df.select(
        "id",
        F.ntile(4).over(w).alias("q"),
        F.round(F.percent_rank().over(w), 6).alias("pr"),
        F.round(F.cume_dist().over(w), 6).alias("cd"),
    )
    da = {r_.id: (r_.q, r_.pr, r_.cd) for r_ in der.collect()}
    db = {r_.id: (r_.q, r_.pr, r_.cd) for r_ in bi.collect()}
    assert da == db


def test_bucketed_rank_guards(spark):
    """NaN values, over-cap group counts (cap now derived from the
    32 MiB broadcast budget — see test_round9), and NULL group keys
    all fail fast (silent wrong answers are the failure mode each
    guard blocks)."""
    from datafusion_archive_spark.operators.ranks import bucketed_group_rank

    df = _rank_slab(spark, seed=17, n=500)
    with pytest.raises(ValueError, match="NaN"):
        bucketed_group_rank(
            df.withColumn(
                "v",
                F.when(F.col("id") == 3, float("nan")).otherwise(F.col("v")),
            ),
            ["g"], "v", ["id"],
        )
    with pytest.raises(ValueError, match="groups"):
        bucketed_group_rank(df, ["id"], "v", None)
    with pytest.raises(ValueError, match="NULL group key"):
        bucketed_group_rank(
            df.withColumn(
                "g", F.when(F.col("id") == 3, None).otherwise(F.col("g"))
            ),
            ["g"], "v", ["id"],
        )


def test_bucketed_rank_dense_differential(spark):
    """dense_col == dense_rank() over the plain per-group window
    (value-only ordering; nulls tie at dense rank 1)."""
    from datafusion_archive_spark.operators.ranks import bucketed_group_rank

    df = _rank_slab(spark, seed=19)
    got = bucketed_group_rank(
        df, ["g"], "v", tiebreak=["id"], dense_col="_dense"
    )
    w = Window.partitionBy("g").orderBy(F.col("v").asc_nulls_first())
    want = df.withColumn("_dense", F.dense_rank().over(w).cast("long"))
    key = lambda t: (t[0], t[1] is not None, t[1] or 0.0, t[2])
    a = sorted(((r.g, r.v, r._dense) for r in got.collect()), key=key)
    b = sorted(((r.g, r.v, r._dense) for r in want.collect()), key=key)
    assert a == b


def test_bucketed_rank_running_sums_differential(spark):
    """running=[(src, out)] == sum(src) OVER (PARTITION BY g ORDER BY
    v, id ROWS UNBOUNDED PRECEDING..CURRENT), exactly — integer
    addition regroups freely across buckets. Nulls count as 0."""
    from datafusion_archive_spark.operators.ranks import bucketed_group_rank

    import random as _r

    _r.seed(23)
    rows = [
        (
            i,
            _r.choice("ab"),
            _r.uniform(-100, 100),
            _r.choice([None, 0, 1, 1, 2]),
        )
        for i in range(4000)
    ]
    df = spark.createDataFrame(rows, "id long, g string, v double, s int")
    got = bucketed_group_rank(
        df, ["g"], "v", tiebreak=["id"], running=[("s", "cum_s")]
    )
    w = (
        Window.partitionBy("g")
        .orderBy(F.col("v").asc_nulls_first(), "id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    want = df.withColumn(
        "cum_s", F.sum(F.coalesce(F.col("s"), F.lit(0))).over(w).cast("long")
    )
    a = {r.id: r.cum_s for r in got.collect()}
    b = {r.id: r.cum_s for r in want.collect()}
    assert a == b

    with pytest.raises(ValueError, match="total"):
        bucketed_group_rank(df, ["g"], "v", None, running=[("s", "c")])
    with pytest.raises(ValueError, match="integral"):
        bucketed_group_rank(
            df, ["g"], "v", ["id"], running=[("v", "c")]
        )


def test_bucketed_lag_differential(spark):
    """bucketed_group_lag == lag(src) over the plain window, grouped
    and global, including heavy duplicate values at bucket scale."""
    from datafusion_archive_spark.operators.ranks import bucketed_group_lag

    import random as _r

    _r.seed(31)
    rows = [
        (i, _r.choice("ab"), _r.uniform(-1e6, 1e6), _r.randint(0, 99))
        for i in range(4000)
    ]
    rows += [(10000 + i, "a", 42.0, i) for i in range(50)]  # dup ties
    df = spark.createDataFrame(rows, "id long, g string, v double, s int")

    got = bucketed_group_lag(df, ["g"], "v", ["id"], [("s", "ps"), ("v", "pv")])
    w = Window.partitionBy("g").orderBy(F.col("v").asc_nulls_first(), "id")
    want = df.withColumn("ps", F.lag("s").over(w)).withColumn(
        "pv", F.lag("v").over(w)
    )
    assert {r.id: (r.ps, r.pv) for r in got.collect()} == {
        r.id: (r.ps, r.pv) for r in want.collect()
    }

    got2 = bucketed_group_lag(df, [], "v", ["id"], [("v", "pv")])
    w2 = Window.orderBy(F.col("v").asc_nulls_first(), "id")
    want2 = df.withColumn("pv", F.lag("v").over(w2))
    assert {r.id: r.pv for r in got2.collect()} == {
        r.id: r.pv for r in want2.collect()
    }

    with pytest.raises(ValueError, match="NULL"):
        bucketed_group_lag(
            df.withColumn(
                "v", F.when(F.col("id") == 5, None).otherwise(F.col("v"))
            ),
            ["g"], "v", ["id"], [("v", "p")],
        )
    with pytest.raises(ValueError, match="total ordering"):
        bucketed_group_lag(df, ["g"], "v", [], [("v", "p")])


def test_bucketed_rank_edge_inputs(spark):
    """Empty input returns empty; ±inf collapses the grid (every
    (x−lo)/width is NaN, which the clamp sends to the top bucket) —
    one bucket means one window partition, i.e. the operator degrades
    to the plain-window plan but stays EXACT."""
    from datafusion_archive_spark.operators.ranks import (
        bucketed_group_lag,
        bucketed_group_rank,
    )

    empty = spark.createDataFrame([], "id long, g string, v double")
    assert bucketed_group_rank(empty, ["g"], "v", ["id"]).count() == 0
    assert (
        bucketed_group_lag(empty, ["g"], "v", ["id"], [("v", "p")]).count()
        == 0
    )

    rows = [
        (1, "a", float("inf")),
        (2, "a", float("-inf")),
        (3, "a", 0.0),
        (4, "a", None),
        (5, "a", float("inf")),
    ]
    df = spark.createDataFrame(rows, "id long, g string, v double")
    got = bucketed_group_rank(df, ["g"], "v", tiebreak=["id"])
    w = Window.partitionBy("g").orderBy(F.col("v").asc_nulls_first(), "id")
    want = df.withColumn("_rank", F.row_number().over(w).cast("long"))
    assert {r.id: r._rank for r in got.collect()} == {
        r.id: r._rank for r in want.collect()
    }

    finite = df.filter(F.col("v").isNotNull())
    got_lag = bucketed_group_lag(finite, ["g"], "v", ["id"], [("v", "pv")])
    want_lag = finite.withColumn("pv", F.lag("v").over(w))
    assert {r.id: r.pv for r in got_lag.collect()} == {
        r.id: r.pv for r in want_lag.collect()
    }


def test_bucketed_rank_rejects_unorderable_value_dtype(spark):
    """A STRING value column casts to NULL double — every row would
    silently vanish through the offset equi-join; both operators must
    fail fast naming the contract."""
    from datafusion_archive_spark.operators.ranks import (
        bucketed_group_lag,
        bucketed_group_rank,
    )

    df = spark.createDataFrame(
        [(1, "a", "x"), (2, "a", "y")], "id long, g string, v string"
    )
    with pytest.raises(ValueError, match="monotone"):
        bucketed_group_rank(df, ["g"], "v", ["id"])
    with pytest.raises(ValueError, match="monotone"):
        bucketed_group_lag(df, ["g"], "v", ["id"], [("v", "p")])


@pytest.mark.parametrize("seed", [99, 7, 31])
def test_bucketed_rank_lag_special_value_fuzz(spark, seed):
    """Round-8 fuzz (the round-7 quantile-fuzz tradition): random
    mixes of ±inf, ±1e308, subnormals, signed zeros, nulls, and
    duplicate pools across rank + dense_rank + running sums + lag vs
    the plain windows. A 60-trial sweep ran clean; three seeds pin it."""
    from datafusion_archive_spark.operators.ranks import (
        bucketed_group_lag,
        bucketed_group_rank,
    )

    rng = random.Random(seed)
    special = [0.0, -0.0, 1.0, -1.0, 1e308, -1e308, 5e-324, -5e-324,
               float("inf"), float("-inf"), 1e-15, 123.456]
    dup_pool = [rng.choice(special) for _ in range(rng.randint(1, 6))]
    rows = []
    for i in range(rng.randint(50, 300)):
        g = chr(97 + rng.randint(0, 3))
        r = rng.random()
        if r < 0.35:
            v = rng.choice(special)
        elif r < 0.55:
            v = rng.choice(dup_pool)
        elif r < 0.65:
            v = None
        else:
            v = rng.uniform(-1e6, 1e6)
        rows.append((i, g, v, rng.randint(0, 3)))
    df = spark.createDataFrame(rows, "id long, g string, v double, s int")
    w = Window.partitionBy("g").orderBy(F.col("v").asc_nulls_first(), "id")
    wr = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wv = Window.partitionBy("g").orderBy(F.col("v").asc_nulls_first())
    got = bucketed_group_rank(
        df, ["g"], "v", ["id"], dense_col="_d", running=[("s", "_cs")]
    )
    want = (
        df.withColumn("_rank", F.row_number().over(w).cast("long"))
        .withColumn("_d", F.dense_rank().over(wv).cast("long"))
        .withColumn("_cs", F.sum("s").over(wr).cast("long"))
    )
    assert {r.id: (r._rank, r._d, r._cs) for r in got.collect()} == {
        r.id: (r._rank, r._d, r._cs) for r in want.collect()
    }

    nn = df.filter(F.col("v").isNotNull())
    got2 = bucketed_group_lag(nn, ["g"], "v", ["id"], [("v", "pv")])
    want2 = nn.withColumn("pv", F.lag("v").over(w))
    assert {r.id: repr(r.pv) for r in got2.collect()} == {
        r.id: repr(r.pv) for r in want2.collect()
    }
