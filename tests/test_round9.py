"""Round-9/10 regression pins for the three round-9 guard changes
(VERDICT r9 "What's wrong" — none of the new paths had a test) plus
the two ADVICE r9 items:

1. date-valued ``bucketed_group_rank`` / ``bucketed_group_lag``
   (``ranks._date_safe_value``, the ADVICE r8 #1 fix) equals the
   plain window form on a small frame — the first-ever execution of
   that path — and the internal ``_ord_*`` twin never leaks into the
   output schema;
2. the derived broadcast-budget group cap (``ranks._MAX_RANK_GROUPS``,
   VERDICT r8 #2): the >cap input raises naming the 32 MiB budget,
   and the grid at the cap stays inside
   ``_GRID_BROADCAST_BUDGET_BYTES`` by the module's own row model;
3. ``weighted_lower_quantiles_grouped`` rejects NaN float keys
   (``quantiles.py`` post-stats guard) and non-atomic (array) keys
   (``_check_weighted_key_dtype``);
4. ADVICE r9 #1: a pre-existing user column named like the internal
   date twin raises instead of being silently overwritten+dropped;
5. ADVICE r9 #2: guard errors name the CALLER's column, not the
   internal ``_ord_*`` rewrite.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from datafusion_archive_spark.operators import quantiles as Q
from datafusion_archive_spark.operators import ranks as R


def _date_frame(spark):
    """Small grouped frame with a DATE ordering column, ties included
    (two rows share 2024-01-03 in group a), plus an integral payload
    for running sums / lag."""
    rows = [
        ("a", "2024-01-03", 1, 10),
        ("a", "2024-01-01", 2, 20),
        ("a", "2024-01-03", 3, 30),
        ("a", "2024-02-10", 4, 40),
        ("b", "2023-12-31", 5, 50),
        ("b", "2024-01-02", 6, 60),
    ]
    return spark.createDataFrame(
        rows, "g string, d string, tb int, x int"
    ).withColumn("d", F.to_date("d"))


# ------------------------------------------------ 1. date-valued path


def test_bucketed_group_rank_date_value_matches_window(spark):
    df = _date_frame(spark)
    got = R.bucketed_group_rank(
        df, ["g"], "d", tiebreak=["tb"], dense_col="_dense",
        running=[("x", "_run")],
    )
    w = Window.partitionBy("g").orderBy(
        F.col("d").asc_nulls_first(), F.col("tb").asc_nulls_first()
    )
    want = (
        df.withColumn("_rank", F.row_number().over(w))
        .withColumn("_n", F.count(F.lit(1)).over(Window.partitionBy("g")))
        .withColumn(
            "_dense",
            F.dense_rank().over(Window.partitionBy("g").orderBy("d")),
        )
        .withColumn(
            "_run",
            F.sum("x").over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
    )
    cols = ["g", "d", "tb", "x", "_rank", "_n", "_dense", "_run"]
    assert sorted(got.columns) == sorted(cols)  # no _ord_d leak
    assert sorted(map(tuple, got.select(*cols).collect())) == sorted(
        map(tuple, want.select(*cols).collect())
    )


def test_bucketed_group_rank_date_rank_semantics(spark):
    # tiebreak=None -> rank(): the two tied dates share position 2
    df = _date_frame(spark)
    got = R.bucketed_group_rank(df, ["g"], "d")
    w = Window.partitionBy("g").orderBy(F.col("d").asc_nulls_first())
    want = df.withColumn("_rank", F.rank().over(w)).withColumn(
        "_n", F.count(F.lit(1)).over(Window.partitionBy("g"))
    )
    cols = ["g", "d", "tb", "x", "_rank", "_n"]
    assert sorted(map(tuple, got.select(*cols).collect())) == sorted(
        map(tuple, want.select(*cols).collect())
    )


def test_bucketed_group_lag_date_value_matches_window(spark):
    df = _date_frame(spark)
    got = R.bucketed_group_lag(
        df, ["g"], "d", tiebreak=["tb"], lag_of=[("x", "prev_x")]
    )
    w = Window.partitionBy("g").orderBy(
        F.col("d").asc_nulls_first(), F.col("tb").asc_nulls_first()
    )
    want = df.withColumn("prev_x", F.lag("x").over(w))
    cols = ["g", "d", "tb", "x", "prev_x"]
    assert sorted(got.columns) == sorted(cols)
    assert sorted(
        map(tuple, got.select(*cols).collect()), key=str
    ) == sorted(map(tuple, want.select(*cols).collect()), key=str)


# --------------------------------------- 2. derived broadcast-grid cap


def test_rank_group_cap_raises_naming_budget(spark):
    n = R._MAX_RANK_GROUPS + 10
    df = spark.range(n).select(
        F.col("id").alias("g"), (F.col("id") % 7).cast("double").alias("v")
    )
    with pytest.raises(ValueError, match="32 MiB broadcast budget"):
        R.bucketed_group_rank(df, ["g"], "v")
    with pytest.raises(ValueError, match="32 MiB broadcast budget"):
        R.bucketed_group_lag(
            df, ["g"], "v", tiebreak=["g"], lag_of=[("v", "p")]
        )


def test_rank_group_cap_is_derived_from_budget():
    """The cap must be a consequence of the budget, not a constant
    that drifts from it: at the cap, the grid's worst-case size by the
    module's own row model fits the budget, and one more group would
    not."""
    grid_rows_per_group = R._BUCKETS + 2
    at_cap = R._MAX_RANK_GROUPS * grid_rows_per_group * R._GRID_ROW_BYTES
    over = (
        (R._MAX_RANK_GROUPS + 1) * grid_rows_per_group * R._GRID_ROW_BYTES
    )
    assert at_cap <= R._GRID_BROADCAST_BUDGET_BYTES < over
    # sanity: the derivation actually bites (cap is small, per the
    # operator's low-cardinality contract)
    assert R._MAX_RANK_GROUPS == R._GRID_BROADCAST_BUDGET_BYTES // (
        R._GRID_ROW_BYTES * grid_rows_per_group
    )


# ------------------------------- 3. weighted quantile key-type guards


def test_weighted_grouped_rejects_nan_float_key(spark):
    df = spark.createDataFrame(
        [(float("nan"), 1.0), (1.0, 2.0)], "k double, x double"
    )
    with pytest.raises(ValueError, match="NaN group key"):
        Q.weighted_lower_quantiles_grouped(
            df, "k", "x", F.lit(1), [(1, 2)]
        )


def test_weighted_grouped_rejects_array_key(spark):
    df = spark.createDataFrame(
        [([1, 2], 1.0)], "k array<int>, x double"
    )
    with pytest.raises(ValueError, match="atomic"):
        Q.weighted_lower_quantiles_grouped(
            df, "k", "x", F.lit(1), [(1, 2)]
        )


def test_weighted_grouped_accepts_boolean_and_date_keys(spark):
    # the widened contract (ADVICE r8 #3): value-faithful atomic keys
    dfb = spark.createDataFrame(
        [(True, 1.0), (True, 3.0), (False, 5.0)], "k boolean, x double"
    )
    got = Q.weighted_lower_quantiles_grouped(
        dfb, "k", "x", F.lit(1), [(1, 1)]
    )
    assert got[True] == ([3.0], 2) and got[False] == ([5.0], 1)
    dfd = spark.createDataFrame(
        [("2024-01-01", 2.0), ("2024-01-01", 4.0)], "k string, x double"
    ).withColumn("k", F.to_date("k"))
    got = Q.weighted_lower_quantiles_grouped(
        dfd, "k", "x", F.lit(1), [(1, 2)]
    )
    (key, ([median], total)), = got.items()
    assert str(key) == "2024-01-01" and median == 2.0 and total == 2


# --------------------------------------------- 4+5. ADVICE r9 pins


def test_date_twin_name_collision_raises(spark):
    df = _date_frame(spark).withColumn("_ord_d", F.lit(0))
    with pytest.raises(ValueError, match="_ord_d"):
        R.bucketed_group_rank(df, ["g"], "d", tiebreak=["tb"])
    with pytest.raises(ValueError, match="rename that column"):
        R.bucketed_group_lag(
            df, ["g"], "d", tiebreak=["tb"], lag_of=[("x", "p")]
        )


def test_guard_errors_name_callers_column_not_internal(spark):
    # a NULL date hits bucketed_group_lag's null guard AFTER the
    # _ord_ rewrite; the message must name 'd', not '_ord_d'
    df = _date_frame(spark).union(
        _date_frame(spark).limit(1).withColumn("d", F.lit(None).cast("date"))
    )
    with pytest.raises(ValueError) as ei:
        R.bucketed_group_lag(
            df, ["g"], "d", tiebreak=["tb"], lag_of=[("x", "p")]
        )
    assert "'d'" in str(ei.value) and "_ord_" not in str(ei.value)


# ----------------------------------- date-valued special-value fuzz


def _date_slab(spark, seed, n=4000, with_nulls=True):
    """Random date slab in the r8 fuzz style: pre-epoch dates, the
    epoch itself, far-future dates, heavy ties (a handful of cluster
    days), and (for the rank path) NULLs."""
    import datetime as _dt
    import random as _r

    _r.seed(seed)
    pool = [
        _dt.date(1, 1, 1),
        _dt.date(1969, 12, 31),
        _dt.date(1970, 1, 1),
        _dt.date(2024, 2, 29),
        _dt.date(9999, 12, 31),
        _dt.date(2024, 6, 1),
        _dt.date(2024, 6, 2),
    ]
    rows = []
    for i in range(n):
        d = None if (with_nulls and _r.random() < 0.05) else _r.choice(
            pool + [_dt.date(2000 + _r.randint(0, 30), _r.randint(1, 12), 1)]
        )
        rows.append((i, _r.choice("abc"), d, _r.randint(0, 3)))
    return spark.createDataFrame(rows, "id long, g string, d date, x int")


def test_bucketed_rank_date_fuzz_differential(spark):
    """4000-row date slab (extremes, ties, NULLs): rank + dense +
    running sums over a date ordering == the plain window forms."""
    got = R.bucketed_group_rank(
        _date_slab(spark, seed=41), ["g"], "d", tiebreak=["id"],
        dense_col="_dense", running=[("x", "_run")],
    )
    df = _date_slab(spark, seed=41)
    w = Window.partitionBy("g").orderBy(F.col("d").asc_nulls_first(), "id")
    want = (
        df.withColumn("_rank", F.row_number().over(w).cast("long"))
        .withColumn("_n", F.count(F.lit(1)).over(Window.partitionBy("g")))
        .withColumn(
            "_dense",
            F.dense_rank().over(
                Window.partitionBy("g").orderBy(F.col("d").asc_nulls_first())
            ).cast("long"),
        )
        .withColumn(
            "_run",
            F.sum(F.coalesce("x", F.lit(0))).over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
    )
    a = {r.id: (r._rank, r._n, r._dense, r._run) for r in got.collect()}
    b = {r.id: (r._rank, r._n, r._dense, r._run) for r in want.collect()}
    assert a == b


def test_bucketed_lag_date_fuzz_differential(spark):
    """Date slab without NULLs: lag over the date ordering == the
    plain window lag, including across bucket boundaries."""
    df = _date_slab(spark, seed=43, with_nulls=False)
    got = R.bucketed_group_lag(
        df, ["g"], "d", tiebreak=["id"], lag_of=[("x", "px"), ("id", "pid")]
    )
    w = Window.partitionBy("g").orderBy(F.col("d").asc_nulls_first(), "id")
    want = df.withColumn("px", F.lag("x").over(w)).withColumn(
        "pid", F.lag("id").over(w)
    )
    a = {r.id: (r.px, r.pid) for r in got.collect()}
    b = {r.id: (r.px, r.pid) for r in want.collect()}
    assert a == b


def test_bucketed_rank_and_lag_timestamp_value_differential(spark):
    """_check_value_dtype admits timestamps (cast to double = epoch
    seconds, monotone — non-strictly for far-future values where the
    double mantissa coarsens below microseconds, which is still safe:
    equal-cast values share a bucket and the in-bucket sort orders by
    the timestamp itself). No registry query ranks on a raw timestamp,
    so pin the path here, extremes included."""
    import datetime as _dt
    import random as _r

    _r.seed(47)
    pool = [
        _dt.datetime(1969, 12, 31, 23, 59, 59, 999999),
        _dt.datetime(1970, 1, 1, 0, 0, 0),
        _dt.datetime(2024, 6, 1, 12, 0, 0, 1),
        _dt.datetime(2024, 6, 1, 12, 0, 0, 2),
        _dt.datetime(9999, 12, 30, 0, 0, 0),
        _dt.datetime(9999, 12, 30, 0, 0, 0, 1),
    ]
    rows = [
        (
            i,
            _r.choice("ab"),
            _r.choice(pool + [_dt.datetime(2020, 1, 1 + _r.randint(0, 27))]),
            _r.randint(0, 3),
        )
        for i in range(2000)
    ]
    df = spark.createDataFrame(rows, "id long, g string, t timestamp, x int")
    w = Window.partitionBy("g").orderBy(F.col("t").asc_nulls_first(), "id")
    got = R.bucketed_group_rank(df, ["g"], "t", tiebreak=["id"])
    want = df.withColumn("_rank", F.row_number().over(w).cast("long"))
    a = {r.id: r._rank for r in got.collect()}
    b = {r.id: r._rank for r in want.collect()}
    assert a == b
    gotl = R.bucketed_group_lag(
        df, ["g"], "t", tiebreak=["id"], lag_of=[("x", "px")]
    )
    wantl = df.withColumn("px", F.lag("x").over(w))
    al = {r.id: r.px for r in gotl.collect()}
    bl = {r.id: r.px for r in wantl.collect()}
    assert al == bl
