"""Round-13 contracts: the ADVICE r12 fixes (loop_conf __enter__
exception safety; sweep_outliers hung-re-read tolerance and explicit
--sf-dir scale verification) and the VERDICT r12 #5 loop-lock
registry pruning (weakref.finalize on the session, so a process
cycling sessions doesn't grow _LOOP_LOCKS monotonically)."""

from __future__ import annotations

import gc
import importlib.util
import pathlib
import subprocess
import sys

import pytest

from datafusion_archive_spark.operators import util as oputil
from datafusion_archive_spark.operators.util import (
    _LOOP_LOCKS,
    _LOOP_OWNERS,
    _session_loop_lock,
    loop_conf,
    loop_owner,
)


# ---------------------------------------------------------------- #
# loop_conf __enter__ exception safety (ADVICE r12 medium)          #
# ---------------------------------------------------------------- #


class _FakeConf:
    """Session-conf stub whose set() can be made to raise, to drive
    the failure path loop_conf.__enter__ must survive."""

    def __init__(self, store=None, fail_on=()):
        self.store = dict(store or {})
        self.fail_on = set(fail_on)

    def get(self, key):
        return self.store[key]  # KeyError caught by loop_conf._get

    def set(self, key, value):
        if key in self.fail_on:
            raise RuntimeError(f"boom setting {key}")
        self.store[key] = value

    def unset(self, key):
        self.store.pop(key, None)


class _FakeSession:
    """Just enough session surface for loop_conf: a .conf attribute
    (no .sparkContext — loop_conf falls back to its row-derived
    width). Weakref-able, so the registry pruning applies."""

    def __init__(self, conf):
        self.conf = conf


def test_enter_failure_releases_lock_and_owner():
    """If the conf save/narrow block raises, __exit__ never runs (the
    with-statement skips it when __enter__ raises) — the scope must
    undo its own owner entry and lock, or every later query on the
    session would fail the loop_owner guard forever and the next
    loop_conf would deadlock (ADVICE r12)."""
    sess = _FakeSession(_FakeConf(fail_on={"spark.sql.adaptive.enabled"}))
    with pytest.raises(RuntimeError, match="boom"):
        with loop_conf(sess, 100):
            pass  # pragma: no cover - never entered
    assert loop_owner(sess) is None
    lock = _session_loop_lock(sess)
    assert lock.acquire(blocking=False)
    lock.release()
    # and the session is not poisoned: a working enter/exit succeeds
    sess.conf.fail_on.clear()
    with loop_conf(sess, 100):
        assert loop_owner(sess) is not None
    assert loop_owner(sess) is None


def test_enter_partial_failure_restores_narrowed_conf():
    """If the FIRST narrow (AQE off) lands and the SECOND raises, the
    failed enter must put AQE back to the caller's value — otherwise
    the session silently keeps AQE disabled with no scope to ever
    restore it."""
    conf = _FakeConf(
        store={"spark.sql.adaptive.enabled": "true"},
        fail_on={"spark.sql.shuffle.partitions"},
    )
    sess = _FakeSession(conf)
    with pytest.raises(RuntimeError, match="boom"):
        with loop_conf(sess, 100):
            pass  # pragma: no cover - never entered
    assert conf.store["spark.sql.adaptive.enabled"] == "true"
    assert loop_owner(sess) is None


def test_enter_partial_failure_unsets_previously_unset_aqe():
    """Same, when AQE had no session-level value before: the failed
    enter unsets it rather than pinning 'false'."""
    conf = _FakeConf(fail_on={"spark.sql.shuffle.partitions"})
    sess = _FakeSession(conf)
    with pytest.raises(RuntimeError, match="boom"):
        with loop_conf(sess, 100):
            pass  # pragma: no cover - never entered
    assert "spark.sql.adaptive.enabled" not in conf.store
    assert loop_owner(sess) is None


# ---------------------------------------------------------------- #
# loop-lock registry pruning (VERDICT r12 #5)                       #
# ---------------------------------------------------------------- #


def test_loop_lock_registry_pruned_on_session_collection():
    """Cycling sessions must not grow _LOOP_LOCKS monotonically: the
    weakref.finalize registered at lock creation prunes the entry
    when the session object is collected, so a recycled id() can
    never inherit a dead session's lock either."""
    baseline = len(_LOOP_LOCKS)
    sessions = [_FakeSession(_FakeConf()) for _ in range(8)]
    for s in sessions:
        _session_loop_lock(s)
    assert len(_LOOP_LOCKS) >= baseline + 8
    keys = [id(x) for x in sessions]
    del sessions, s  # s: the for-loop variable still holds the last one
    gc.collect()
    for k in keys:
        assert k not in _LOOP_LOCKS
        assert k not in _LOOP_OWNERS
    # registry back to its baseline: no monotonic growth
    assert len(_LOOP_LOCKS) == baseline


def test_loop_lock_registry_stable_across_reuse():
    """Repeated lock lookups on one live session reuse one entry (no
    per-call growth), and the entry survives while the session is
    referenced."""
    sess = _FakeSession(_FakeConf())
    a = _session_loop_lock(sess)
    b = _session_loop_lock(sess)
    assert a is b
    assert id(sess) in _LOOP_LOCKS
    del sess
    gc.collect()
    assert a is not None  # lock object itself stays valid for holders


def test_prune_clears_stale_owner_row():
    """_prune_loop_entry drops any owner entry too — a dead session
    must not leave a stale owner that poisons a recycled id()."""
    sess = _FakeSession(_FakeConf())
    key = id(sess)
    _session_loop_lock(sess)
    _LOOP_OWNERS[key] = object()  # simulate a stale row
    del sess
    gc.collect()
    assert key not in _LOOP_OWNERS
    assert key not in _LOOP_LOCKS


# ---------------------------------------------------------------- #
# sweep_outliers: hung re-reads + --sf-dir scale guard (ADVICE r12) #
# ---------------------------------------------------------------- #


def _sweep_mod():
    p = pathlib.Path(__file__).parent.parent / "tools" / "sweep_outliers.py"
    spec = importlib.util.spec_from_file_location("sweep_outliers_r13", p)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_reread_timeout_does_not_crash_the_gate(monkeypatch):
    """A hung check_oracle re-run (the worst kind of regression) must
    not crash the gate with a traceback; the query simply gets no
    re-read and stays REAL in attribute()."""
    m = _sweep_mod()

    def hang(*a, **kw):
        raise subprocess.TimeoutExpired(cmd="check_oracle", timeout=1.0)

    monkeypatch.setattr(m.subprocess, "run", hang)
    out = m.reread_times(["q"], "/root/testdata/sf0.1", runs=2, timeout=1.0)
    assert out == {}
    # and a REAL verdict follows: no re-read -> violation stays
    bad = m.audit_struct({"q": 1.0}, {"q": 40.0}, 15.0, 90.0)
    real, ambient = m.attribute(bad, {"q": 1.0}, 15.0, 90.0, out)
    assert [v["name"] for v in real] == ["q"] and ambient == []


def test_log_sf_dir_header_parse(tmp_path):
    m = _sweep_mod()
    with_header = tmp_path / "a.log"
    with_header.write_text(
        "# SF_DIR /root/testdata/sf0.1\nPASS q1: 5 rows (1.0s)\n"
    )
    assert m.log_sf_dir(str(with_header)) == "/root/testdata/sf0.1"
    without = tmp_path / "b.log"
    without.write_text("PASS q1: 5 rows (1.0s)\n")
    assert m.log_sf_dir(str(without)) is None
    # the header line must not leak into the parsed times
    assert m.parse_log(str(with_header)) == {"q1": 1.0}


def _run_sweep_cli(args):
    tool = pathlib.Path(__file__).parent.parent / "tools" / "sweep_outliers.py"
    return subprocess.run(
        [sys.executable, str(tool), *args],
        capture_output=True,
        text=True,
        timeout=60,
    )


def test_attribute_requires_explicit_sf_dir(tmp_path):
    """--attribute with no --sf-dir must refuse (exit 2) instead of
    silently re-reading at a default scale that may not match the
    large log's."""
    small = tmp_path / "s.log"
    large = tmp_path / "l.log"
    small.write_text("PASS q1: 5 rows (1.0s)\n")
    large.write_text("PASS q1: 5 rows (2.0s)\n")
    proc = _run_sweep_cli([str(small), str(large), "--attribute"])
    assert proc.returncode == 2
    assert "--sf-dir" in proc.stderr


def test_attribute_rejects_mismatched_recorded_scale(tmp_path):
    """When the large log records its scale (# SF_DIR header), a
    contradicting --sf-dir is an error — a re-read at the wrong scale
    misattributes real breaches as ambient (or vice versa)."""
    small = tmp_path / "s.log"
    large = tmp_path / "l.log"
    small.write_text("PASS q1: 5 rows (1.0s)\n")
    large.write_text(
        "# SF_DIR /root/testdata/sf0.1\nPASS q1: 5 rows (2.0s)\n"
    )
    proc = _run_sweep_cli(
        [
            str(small),
            str(large),
            "--attribute",
            "--sf-dir",
            "/root/testdata/sf0.01",
        ]
    )
    assert proc.returncode == 2
    assert "recorded scale" in proc.stderr
    # a matching --sf-dir passes the guard (and the gate, 2x growth)
    proc = _run_sweep_cli(
        [
            str(small),
            str(large),
            "--attribute",
            "--sf-dir",
            "/root/testdata/sf0.1",
        ]
    )
    assert proc.returncode == 0
    assert "GATE PASS" in proc.stdout


def test_non_attribute_runs_need_no_sf_dir(tmp_path):
    """The plain gate (no --attribute) is unaffected by the new
    requirement."""
    small = tmp_path / "s.log"
    large = tmp_path / "l.log"
    small.write_text("PASS q1: 5 rows (1.0s)\n")
    large.write_text("PASS q1: 5 rows (2.0s)\n")
    proc = _run_sweep_cli([str(small), str(large)])
    assert proc.returncode == 0
    assert "GATE PASS" in proc.stdout


# ---------------------------------------------------------------- #
# expr-string blocking keys == chained-Column blocking keys         #
# ---------------------------------------------------------------- #


class TestExprStringBlockingParity:
    """The r13 perf pass rebuilt the SimHash/LSH blocking keys as
    single F.expr SQL strings (0.64 s of chained py4j calls -> ~1 ms
    per build). The SQL must stay VALUE-identical to the chained
    formulation — these tests pin the refactor by computing both on
    the same signatures and comparing exact sets, covering operator
    precedence (| vs shiftleft), mask widths, and the 2^60-1 edge."""

    #: signature edge cases: 0, all-ones at 60 bits, alternating
    #: patterns, single bits at block boundaries
    SIGS = [
        0,
        (1 << 60) - 1,
        0x0AAAAAAAAAAAAAA5,
        0x0555555555555555,
        1,
        1 << 59,
        (1 << 10) | (1 << 20) | (1 << 30) | (1 << 40) | (1 << 50),
        0x0123456789ABCDE,
    ]

    def _sig_df(self, spark):
        return spark.createDataFrame(
            [(i, s) for i, s in enumerate(self.SIGS)], "id INT, sig LONG"
        )

    def test_simple_band_keys_match_chained(self, spark):
        from pyspark.sql import functions as F

        bits, bands = 60, 4
        width = bits // bands
        mask = (1 << width) - 1
        df = self._sig_df(spark)
        items = ", ".join(
            f"named_struct('band', {b}, 'band_val', "
            f"(shiftrightunsigned(sig, {b * width}) & {mask}))"
            for b in range(bands)
        )
        got = {
            (r.id, r.bb.band, r.bb.band_val)
            for r in df.select(
                "id", F.expr(f"explode(array({items}))").alias("bb")
            ).collect()
        }
        chained = [
            F.struct(
                F.lit(b).alias("band"),
                F.shiftrightunsigned(F.col("sig"), b * width)
                .bitwiseAND(F.lit(mask))
                .alias("band_val"),
            )
            for b in range(bands)
        ]
        want = {
            (r.id, r.bb.band, r.bb.band_val)
            for r in df.select(
                "id", F.explode(F.array(*chained)).alias("bb")
            ).collect()
        }
        assert got == want and len(got) == len(self.SIGS) * bands

    def test_combination_keys_match_chained(self, spark):
        from itertools import combinations

        from pyspark.sql import functions as F

        bits, n_blocks, max_hamming = 60, 6, 3
        combo_size = n_blocks - max_hamming
        width = bits // n_blocks
        mask = (1 << width) - 1
        df = self._sig_df(spark)

        block_sql = [
            f"(shiftrightunsigned(sig, {i * width}) & {mask})"
            for i in range(n_blocks)
        ]
        items = []
        for cidx, combo in enumerate(
            combinations(range(n_blocks), combo_size)
        ):
            val = " | ".join(
                f"shiftleft({block_sql[i]}, {pos * width})"
                if pos
                else block_sql[i]
                for pos, i in enumerate(combo)
            )
            items.append(
                f"named_struct('band', {cidx}, 'band_val', {val})"
            )
        got = {
            (r.id, r.bb.band, r.bb.band_val)
            for r in df.select(
                "id",
                F.expr(f"explode(array({', '.join(items)}))").alias("bb"),
            ).collect()
        }

        block = [
            F.shiftrightunsigned(F.col("sig"), i * width).bitwiseAND(
                F.lit(mask)
            )
            for i in range(n_blocks)
        ]
        chained = []
        for cidx, combo in enumerate(
            combinations(range(n_blocks), combo_size)
        ):
            val = block[combo[0]]
            for pos, i in enumerate(combo[1:], start=1):
                val = val.bitwiseOR(F.shiftleft(block[i], pos * width))
            chained.append(
                F.struct(F.lit(cidx).alias("band"), val.alias("band_val"))
            )
        want = {
            (r.id, r.bb.band, r.bb.band_val)
            for r in df.select(
                "id", F.explode(F.array(*chained)).alias("bb")
            ).collect()
        }
        n_combos = len(list(combinations(range(n_blocks), combo_size)))
        assert got == want and len(got) == len(self.SIGS) * n_combos

    def test_near_pairs_schemes_still_agree_end_to_end(self, spark):
        """Belt and braces at the operator level: on real text, the
        simple and combination schemes (both now expr-built) must
        produce the identical exact pair set — the pigeonhole
        guarantee the r11 probe measured, re-pinned on the new key
        construction."""
        from datafusion_archive_spark.operators import dedup

        docs = spark.read.parquet(
            "/root/testdata/sf0.001/documents.parquet"
        )
        simple = {
            (r.id_a, r.id_b, r.hamming)
            for r in dedup.simhash_near_pairs(
                docs, max_hamming=3, bits=60
            ).collect()
        }
        combo = {
            (r.id_a, r.id_b, r.hamming)
            for r in dedup.simhash_near_pairs(
                docs, max_hamming=3, bits=60, n_blocks=6
            ).collect()
        }
        assert simple == combo and simple


def test_enter_conf_property_failure_leaves_nothing_held():
    """If the session's .conf property itself raises (stopped/broken
    session), __enter__ must fail before taking the lock or owner
    entry — nothing to unwind, session id not poisoned."""

    class _BrokenSession:
        @property
        def conf(self):
            raise RuntimeError("session is stopped")

    sess = _BrokenSession()
    with pytest.raises(RuntimeError, match="stopped"):
        with loop_conf(sess, 100):
            pass  # pragma: no cover - never entered
    assert loop_owner(sess) is None
    assert id(sess) not in oputil._LOOP_OWNERS


def test_registry_lock_is_reentrant_for_finalizers():
    """_prune_loop_entry may fire as a weakref.finalize callback
    during any allocation — including while the same thread holds
    the registry lock. The registry lock must therefore be
    reentrant, or the thread deadlocks against itself."""
    with oputil._LOOP_REGISTRY_LOCK:
        # simulates a finalizer firing inside the critical section
        oputil._prune_loop_entry(0xDEAD)  # must not deadlock
