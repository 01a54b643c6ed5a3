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
