"""Round-12 contracts: the loop_conf concurrency guard (VERDICT r11
#3 — the session-scoped conf caveat is now enforced, not just
documented) and the two ADVICE r11 semantic mirrors (approx_aggs
NULL-group join, Clark–Evans empty-table radius guard)."""

from __future__ import annotations

import threading
import time

import pytest
from pyspark.sql import functions as F

from datafusion_archive_spark.operators.util import (
    LOOP_LOCK_TIMEOUT_SEC,
    loop_conf,
    loop_owner,
)

SF = "/root/testdata/sf0.001"


# ---------------------------------------------------------------- #
# loop_conf concurrency contract                                    #
# ---------------------------------------------------------------- #


def test_loop_conf_nested_same_thread_raises(spark):
    """An inner loop restoring the outer loop's narrowed conf is a
    bug (and a lock deadlock) — nesting must fail loudly."""
    with loop_conf(spark, 100):
        assert loop_owner(spark) is threading.current_thread()
        with pytest.raises(RuntimeError, match="not reentrant"):
            with loop_conf(spark, 100):
                pass  # pragma: no cover - never entered
    # the failed inner enter must not have released the outer scope
    # or corrupted the restore: exiting cleanly clears ownership
    assert loop_owner(spark) is None


def test_loop_conf_concurrent_query_raises(spark, sf_dir):
    """THE r11 caveat, now asserted: while one thread's iterative
    loop scopes the session conf, a registry query built from another
    thread must raise instead of silently planning under the narrowed
    width with AQE off. (Without the guard the query build succeeds —
    this test fails loudly on the unguarded tree.)"""
    from datafusion_archive_spark.queries import QUERIES

    entered = threading.Event()
    release = threading.Event()
    errors: list[BaseException] = []

    def looper():
        try:
            with loop_conf(spark, 100):
                entered.set()
                assert release.wait(timeout=30)
        except BaseException as e:  # pragma: no cover - surfaced below
            errors.append(e)
            entered.set()

    t = threading.Thread(target=looper)
    t.start()
    try:
        assert entered.wait(timeout=30)
        assert not errors
        assert loop_owner(spark) is t
        with pytest.raises(RuntimeError, match="iterative loop"):
            QUERIES["scan_filter_project"](spark, sf_dir)
    finally:
        release.set()
        t.join(timeout=30)
    assert not errors
    # once the loop exits, the same build succeeds and the session
    # conf is back to the caller's values
    assert loop_owner(spark) is None
    assert QUERIES["scan_filter_project"](spark, sf_dir).count() >= 0


def test_loop_conf_concurrent_sql_raises(spark):
    """Same contract at the SQL surface (ExecutionContext.sql)."""
    from datafusion_archive_spark.context import ExecutionContext

    ctx = ExecutionContext(spark)
    entered = threading.Event()
    release = threading.Event()

    def looper():
        with loop_conf(spark, 100):
            entered.set()
            release.wait(timeout=30)

    t = threading.Thread(target=looper)
    t.start()
    try:
        assert entered.wait(timeout=30)
        with pytest.raises(RuntimeError, match="iterative loop"):
            ctx.sql("SELECT 1 AS one")
    finally:
        release.set()
        t.join(timeout=30)
    # and on the loop thread itself, planning was always allowed —
    # the guard keys on the OWNER thread, not on mere scope presence
    assert ctx.sql("SELECT 1 AS one").collect()[0].one == 1


def test_loop_conf_concurrent_loops_serialize(spark):
    """Two loops on one session must not interleave their
    saved/restored confs: the second enter blocks until the first
    scope exits, and after both exit the caller's conf is intact.
    (Unguarded, B enters mid-A; A's exit then restores B's narrowed
    width as if it were the session default — the corruption this
    test pins against.)"""
    before = spark.conf.get("spark.sql.shuffle.partitions")
    order: list[str] = []
    a_in = threading.Event()
    a_release = threading.Event()

    def loop_a():
        with loop_conf(spark, 10_000_000):
            order.append("a_enter")
            a_in.set()
            a_release.wait(timeout=30)
            time.sleep(0.2)
            order.append("a_exit")

    def loop_b():
        assert a_in.wait(timeout=30)
        a_release.set()
        with loop_conf(spark, 200_000):
            # by lock contract, A has fully exited before B enters
            order.append("b_enter")
            order.append("b_exit")

    ta = threading.Thread(target=loop_a)
    tb = threading.Thread(target=loop_b)
    ta.start()
    tb.start()
    ta.join(timeout=60)
    tb.join(timeout=60)
    assert order == ["a_enter", "a_exit", "b_enter", "b_exit"]
    assert loop_owner(spark) is None
    assert spark.conf.get("spark.sql.shuffle.partitions") == before


def test_loop_lock_timeout_is_sane():
    # the anti-deadlock bound exists and is minutes, not forever
    assert 60 <= LOOP_LOCK_TIMEOUT_SEC <= 3600


# ---------------------------------------------------------------- #
# ADVICE r11 semantic mirrors                                       #
# ---------------------------------------------------------------- #


def test_approx_aggs_retains_null_group(spark, tmp_path):
    """ADVICE r11: the sketch/exact branch join and the quantile-band
    join are null-safe, so a NULL l_returnflag group survives to the
    output exactly as the oracle's GROUP BY retains it."""
    from datafusion_archive_spark.queries import nested

    # prices repeat (5 distinct values per group) so the exact
    # (q49, q51) band contains an actual data value — with all-distinct
    # tiny groups the band falls between order statistics and no
    # sketch could land inside it
    rows = []
    for flag in ("A", "R", None):
        for i in range(200):
            rows.append(
                (flag, (hash((flag, i)) % 13) + 1, 100.0 + (i % 5))
            )
    spark.createDataFrame(
        rows,
        "l_returnflag string, l_orderkey bigint, l_extendedprice double",
    ).write.parquet(str(tmp_path / "lineitem.parquet"))

    out = nested.q_approx_aggs(spark, str(tmp_path)).collect()
    by_flag = {r.l_returnflag: r for r in out}
    assert set(by_flag) == {"A", "R", None}
    null_row = by_flag[None]
    # the sketch contracts hold on the NULL group like any other
    assert null_row.approx_orders_ok == 1
    assert null_row.approx_median_ok == 1
    assert null_row.exact_orders >= 1


def test_clark_evans_radius_guard_mirrors_sql():
    """ADVICE r11: engine max(n, 1) == SQL greatest(count(*), 1) —
    identical bits for every n >= 1, both defined at n = 0."""
    import math

    import duckdb

    from datafusion_archive_spark.queries.pipeline68 import (
        _N_REF,
        _radius_scale,
    )

    for n in (0, 1, 2, 149, 1500, 240_000):
        sql = duckdb.sql(
            f"SELECT sqrt({float(_N_REF)!r} / greatest({n}, 1)) AS s"
        ).fetchone()[0]
        assert _radius_scale(n) == sql, n
    assert _radius_scale(0) == math.sqrt(_N_REF)


# ---------------------------------------------------------------- #
# sweep_outliers ambient attribution (VERDICT r11 #7)               #
# ---------------------------------------------------------------- #


class TestSweepAttribution:
    def _mod(self):
        import importlib.util
        import pathlib

        p = (
            pathlib.Path(__file__).parent.parent
            / "tools"
            / "sweep_outliers.py"
        )
        spec = importlib.util.spec_from_file_location("sweep_outliers", p)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        return mod

    def test_ambient_breach_downgrades_real_breach_stays(self):
        m = self._mod()
        small = {"bursty": 2.0, "cliff": 2.0}
        large = {"bursty": 40.0, "cliff": 40.0}  # both 20x > 15x cap
        bad = m.audit_struct(small, large, 15.0, 90.0)
        assert {v["name"] for v in bad} == {"bursty", "cliff"}
        # same-commit A/B: bursty re-reads back inside the cap
        # (ambient), cliff reproduces (real)
        rereads = {"bursty": 6.0, "cliff": 41.0}
        real, ambient = m.attribute(bad, small, 15.0, 90.0, rereads)
        assert [v["name"] for v in real] == ["cliff"]
        assert len(ambient) == 1 and "bursty" in ambient[0]
        assert "ambient" in ambient[0]

    def test_ceiling_breach_attributable(self):
        m = self._mod()
        small = {"slow": 20.0}
        large = {"slow": 95.0}  # ceiling breach, growth fine
        bad = m.audit_struct(small, large, 15.0, 90.0)
        assert [v["kind"] for v in bad] == ["ceiling"]
        real, ambient = m.attribute(bad, small, 15.0, 90.0, {"slow": 60.0})
        assert real == [] and len(ambient) == 1

    def test_missing_rows_and_failed_rereads_stay_real(self):
        m = self._mod()
        small = {"a": 1.0, "gone": 1.0}
        large = {"a": 40.0}
        bad = m.audit_struct(small, large, 15.0, 90.0)
        # no re-read produced a row for either -> both stay real
        real, ambient = m.attribute(bad, small, 15.0, 90.0, {})
        assert {v["name"] for v in real} == {"a", "gone"}
        assert ambient == []

    def test_back_compat_audit_messages_unchanged(self):
        m = self._mod()
        small = {"q": 2.0}
        large = {"q": 40.0}
        assert m.audit(small, large, 15.0, 90.0) == [
            v["msg"] for v in m.audit_struct(small, large, 15.0, 90.0)
        ]
