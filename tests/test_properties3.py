"""Round-6 property-based tests: operator invariants on randomized
inputs, checked against brute-force Python references.

Hypothesis drives the DATA (random key/timestamp/value tables, with
deliberate (key, ts) collisions); each property compares the
distributed operator against an exhaustive per-row reference, so the
semantics hold for shapes the curated testdata never produces."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

# small domains force collisions: few keys, few timestamps
_ROW = st.tuples(
    st.integers(0, 3),      # key
    st.integers(0, 9),      # ts
    st.integers(0, 99),     # value
)
_ROWS = st.lists(_ROW, min_size=0, max_size=12)

_SLOW = settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _mk(spark, rows, cols):
    return spark.createDataFrame(
        [tuple(r) for r in rows] or [], f"{cols[0]} int, {cols[1]} int, {cols[2]} int"
    )


@given(left=_ROWS, right=_ROWS)
@_SLOW
def test_asof_backward_matches_bruteforce(spark, left, right):
    """asof_join == per-row argmax over right rows with ts <= left ts;
    ties broken by the greatest value (the documented contract)."""
    from datafusion_archive_spark.operators.asof import asof_join

    ldf = _mk(spark, [(k, t, i) for i, (k, t, _) in enumerate(left)],
              ["key", "t", "rowid"])
    rdf = _mk(spark, right, ["key", "t", "v"])
    got = {
        (r.rowid): r.v_asof
        for r in asof_join(
            ldf, rdf.repartition(5), "key", "t", "t", ["v"]
        ).collect()
    }
    for i, (k, t, _) in enumerate(left):
        cands = [rv for rk, rt, rv in right if rk == k and rt <= t]
        want = max(
            (rt, rv) for rt, rv in [(rt, rv) for rk, rt, rv in right
                                    if rk == k and rt <= t]
        )[1] if cands else None
        # among max-ts ties the greatest value wins
        if cands:
            mx_ts = max(rt for rk, rt, rv in right if rk == k and rt <= t)
            want = max(rv for rk, rt, rv in right
                       if rk == k and rt == mx_ts)
        assert got[i] == want, (i, k, t, got[i], want)


@given(left=_ROWS, right=_ROWS)
@_SLOW
def test_asof_forward_matches_bruteforce(spark, left, right):
    """forward as-of == per-row argmin over right rows with ts >=
    left ts; ties broken by the greatest value."""
    from datafusion_archive_spark.operators.asof import asof_join_forward

    ldf = _mk(spark, [(k, t, i) for i, (k, t, _) in enumerate(left)],
              ["key", "t", "rowid"])
    rdf = _mk(spark, right, ["key", "t", "v"])
    got = {
        (r.rowid): r.v_asof
        for r in asof_join_forward(
            ldf, rdf.repartition(5), "key", "t", "t", ["v"]
        ).collect()
    }
    for i, (k, t, _) in enumerate(left):
        cands = [(rt, rv) for rk, rt, rv in right if rk == k and rt >= t]
        if not cands:
            want = None
        else:
            mn_ts = min(rt for rt, _ in cands)
            want = max(rv for rt, rv in cands if rt == mn_ts)
        assert got[i] == want, (i, k, t, got[i], want)


@pytest.mark.slow
@given(rows=_ROWS)
@_SLOW
def test_merge_upsert_idempotent_and_total(spark, rows):
    """merge_upsert(T, B) applied twice == applied once, and the
    result's key set is keys(T) ∪ keys(B)."""
    from datafusion_archive_spark.operators.merge import merge_upsert

    if not rows:
        return
    half = len(rows) // 2
    tgt = _mk(spark, rows[:half], ["k", "a", "b"]).dropDuplicates(["k"])
    # deterministic batch: one row per key via struct-max
    raw = _mk(spark, rows[half:], ["k", "a", "b"])
    batch = (
        raw.groupBy("k")
        .agg(F.max(F.struct("a", "b")).alias("_r"))
        .select("k", "_r.*")
    )
    once = merge_upsert(tgt, batch, "k")
    twice = merge_upsert(once, batch, "k")
    s_once = {tuple(r) for r in once.collect()}
    s_twice = {tuple(r) for r in twice.collect()}
    assert s_once == s_twice, "upsert must be idempotent per batch"
    want_keys = {r.k for r in tgt.collect()} | {r.k for r in batch.collect()}
    assert {r[0] for r in s_once} == want_keys


@given(rows=st.lists(st.text(alphabet="ab ", min_size=0, max_size=8),
                     min_size=0, max_size=10))
@_SLOW
def test_exact_duplicates_survivor_properties(spark, rows):
    """One group per distinct fingerprint, survivor = min id of the
    group, copy counts sum to the corpus size, and re-running on the
    survivors alone yields all-singleton groups (idempotence)."""
    from datafusion_archive_spark.functions import text as TX
    from datafusion_archive_spark.operators.dedup import exact_duplicates

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(rows)] or [],
        "doc_id long, text string",
    )
    groups = {
        r.fp: (r.keep_id, r.n_copies) for r in exact_duplicates(df).collect()
    }
    fps = {
        r.doc_id: r.fp
        for r in df.select(
            "doc_id", TX.fingerprint(F.col("text")).alias("fp")
        ).collect()
    }
    # survivor is the min id of its fingerprint class; counts add up
    for fp, (keep, n) in groups.items():
        members = [d for d, f in fps.items() if f == fp]
        assert keep == min(members)
        assert n == len(members)
    assert sum(n for _, n in groups.values()) == len(rows)
    # idempotence: survivors alone contain no duplicates
    keep_ids = {keep for keep, _ in groups.values()}
    survivors = df.filter(F.col("doc_id").isin(list(keep_ids)) if keep_ids
                          else F.lit(False))
    again = exact_duplicates(survivors).collect()
    assert all(r.n_copies == 1 for r in again)


# ---------------------------------------------------------------------
# VERDICT r9 #7: the weighted grouped-quantile key guard was widened to
# ALL atomic types (ADVICE r8 #3) on the reasoning that the
# collect/createDataFrame/eqNullSafe round-trip is value-faithful for
# every one of them. Property-test that reasoning: draw the key dtype
# across the atomic matrix and random (key, value, weight) tables, and
# compare against a brute-force Python reference of the documented
# contract (smallest v with W(v)*den >= total*num over positive
# integer weights; zero-weight rows lossless to drop; empty groups
# omitted). 7 dtypes x 30 examples = 210 differentials per run.

import datetime as _dt
import decimal as _decimal

_WQ_POOLS = {
    "string": ["a", "b", "c"],
    "bigint": [0, 1, 2],
    "double": [0.25, 1.5, 2.75],
    "boolean": [True, False],
    "date": [
        _dt.date(2024, 1, 1),
        _dt.date(2024, 6, 30),
        _dt.date(1999, 12, 31),
    ],
    "timestamp": [
        _dt.datetime(2024, 1, 1, 0, 0, 1),
        _dt.datetime(2024, 1, 1, 12, 30, 0),
        _dt.datetime(2030, 7, 4, 23, 59, 59),
    ],
    "decimal(5,2)": [
        _decimal.Decimal("1.10"),
        _decimal.Decimal("2.20"),
        _decimal.Decimal("-3.30"),
    ],
}
_WQ_TARGETS = [(1, 4), (1, 2), (3, 4), (1, 1)]
_WQ_ROWS = st.lists(
    st.tuples(
        st.integers(0, 2),   # key pool index
        st.integers(0, 9),   # value
        st.integers(0, 3),   # weight (0 must be lossless to drop)
    ),
    min_size=0,
    max_size=14,
)


def _wq_reference(rows, pool):
    groups: dict = {}
    for ki, v, w in rows:
        if w > 0:
            groups.setdefault(pool[ki % len(pool)], []).append((float(v), w))
    expected = {}
    for k, vw in groups.items():
        total = sum(w for _, w in vw)
        res = []
        for num, den in _WQ_TARGETS:
            thr = -(-total * num // den)  # exact ceil in int space
            cum, ans = 0, None
            for v, w in sorted(vw):
                cum += w
                if cum >= thr:
                    ans = v
                    break
            res.append(ans)
        expected[k] = (res, total)
    return expected


@pytest.mark.parametrize("dtype", sorted(_WQ_POOLS))
@given(rows=_WQ_ROWS)
@settings(
    max_examples=30,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@pytest.mark.slow
def test_weighted_grouped_quantiles_key_dtype_matrix(spark, dtype, rows):
    from datafusion_archive_spark.operators import quantiles as Q

    pool = _WQ_POOLS[dtype]
    data = [
        (pool[ki % len(pool)], float(v), w) for ki, v, w in rows
    ]
    df = spark.createDataFrame(data or [], f"k {dtype}, v double, w int")
    got = Q.weighted_lower_quantiles_grouped(
        df, "k", "v", "w", _WQ_TARGETS
    )
    assert got == _wq_reference(rows, pool)


@pytest.mark.slow
@given(rows=_ROWS)
@_SLOW
def test_bucketed_group_lag_matches_bruteforce(spark, rows):
    """bucketed_group_lag == per-row predecessor under the total
    (value, tiebreak) ordering, on hypothesis-drawn collision-heavy
    tables — the property form of the seeded r8/r9 slabs. Each drawn
    row is (key, value, payload); the rowid tiebreak makes the
    ordering total."""
    from datafusion_archive_spark.operators.ranks import bucketed_group_lag

    data = [(k, v, p, i) for i, (k, v, p) in enumerate(rows)]
    df = spark.createDataFrame(
        data or [], "k int, v int, p int, rowid int"
    )
    got = {
        r.rowid: r.prev_p
        for r in bucketed_group_lag(
            df, ["k"], "v", tiebreak=["rowid"], lag_of=[("p", "prev_p")]
        ).collect()
    }
    for k, v, p, i in data:
        preds = [
            (vv, ii, pp)
            for kk, vv, pp, ii in data
            if kk == k and (vv, ii) < (v, i)
        ]
        want = max(preds)[2] if preds else None
        assert got[i] == want, (i, k, v, got[i], want)


@pytest.mark.slow
@given(rows=_ROWS)
@_SLOW
def test_bucketed_group_rank_matches_bruteforce(spark, rows):
    """bucketed_group_rank == 1 + count of strict (value, tiebreak)
    predecessors in the group (row_number semantics), and with
    tiebreak=None == 1 + count of strictly smaller values (rank
    semantics) — the rank twin of the lag property above."""
    from datafusion_archive_spark.operators.ranks import bucketed_group_rank

    data = [(k, v, i) for i, (k, v, _) in enumerate(rows)]
    df = spark.createDataFrame(data or [], "k int, v int, rowid int")
    got_rn = {
        r.rowid: r._rank
        for r in bucketed_group_rank(
            df, ["k"], "v", tiebreak=["rowid"]
        ).collect()
    }
    got_rk = {
        (r.k, r.v): r._rank
        for r in bucketed_group_rank(df, ["k"], "v").collect()
    }
    for k, v, i in data:
        rn = 1 + sum(
            1 for kk, vv, ii in data if kk == k and (vv, ii) < (v, i)
        )
        assert got_rn[i] == rn, ("row_number", i, got_rn[i], rn)
        rk = 1 + sum(1 for kk, vv, _ in data if kk == k and vv < v)
        assert got_rk[(k, v)] == rk, ("rank", k, v, got_rk[(k, v)], rk)
