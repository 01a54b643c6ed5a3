"""Round-5 wave-23 semantics: any-order funnel, session abandonment
(datafusion_archive_spark/queries/pipeline25.py)."""

from __future__ import annotations

import math
from collections import defaultdict

from datafusion_archive_spark.queries import pipeline25 as P25
from datafusion_archive_spark.queries.timeseries import load_events

SF = "/root/testdata/sf0.001"


def _us(ts):
    """Exact integer microseconds (float .timestamp() drops µs)."""
    import datetime

    td = ts - datetime.datetime(1970, 1, 1)
    return td.days * 86_400_000_000 + td.seconds * 1_000_000 + td.microseconds


class TestAnyorderFunnel:
    def test_matches_python(self, spark):
        ev = [
            r
            for r in load_events(spark, SF).collect()
            if r.event_type in P25._FUNNEL_TYPES
        ]
        by_user = defaultdict(list)
        for r in ev:
            by_user[r.user_id].append((_us(r.ts), r.event_type, r.ts))
        want = {}
        for u, rows in by_user.items():
            rows.sort()
            best = None
            for us, _, ts in rows:
                types = {
                    t
                    for us2, t, _ in rows
                    if us <= us2 < us + P25._FUNNEL_SPAN_US
                }
                if len(types) == len(P25._FUNNEL_TYPES):
                    best = ts if best is None else min(best, ts)
            if best is not None:
                want[u] = best.strftime("%Y-%m-%d %H:%M:%S.%f")
        got = {
            r.user_id: r.first_window_start
            for r in P25.q_anyorder_funnel_1h(spark, SF).collect()
        }
        assert got == want
        assert got  # the fixture must produce at least one completion

    def test_window_start_is_a_funnel_event(self, spark):
        """Each reported window start must be one of that user's own
        funnel-type event timestamps (anchors are events, not grid
        points)."""
        ev = defaultdict(set)
        for r in load_events(spark, SF).collect():
            if r.event_type in P25._FUNNEL_TYPES:
                ev[r.user_id].add(r.ts.strftime("%Y-%m-%d %H:%M:%S.%f"))
        for r in P25.q_anyorder_funnel_1h(spark, SF).collect():
            assert r.first_window_start in ev[r.user_id]


class TestAbandonment:
    def test_matches_python(self, spark):
        ev = sorted(
            load_events(spark, SF).collect(),
            key=lambda r: (r.user_id, r.ts, r.event_id),
        )
        gap_us = 30 * 60 * 1_000_000
        sessions = defaultdict(lambda: [0, 0])  # (has_click, has_purchase)
        last = {}
        sid = defaultdict(int)
        for r in ev:
            us = _us(r.ts)
            if r.user_id not in last or us - last[r.user_id] > gap_us:
                sid[r.user_id] += 1
            last[r.user_id] = us
            key = (r.user_id, sid[r.user_id])
            sessions[key]  # materialize EVERY session, not just flagged
            if r.event_type == "click":
                sessions[key][0] = 1
            if r.event_type == "purchase":
                sessions[key][1] = 1
        n_sessions = len(sessions)
        n_click = sum(c for c, _ in sessions.values())
        n_aband = sum(1 for c, p in sessions.values() if c and not p)
        row = P25.q_session_abandonment_rate(spark, SF).collect()[0]
        assert row.n_sessions == n_sessions
        assert row.n_click_sessions == n_click
        assert row.n_abandoned == n_aband
        assert math.isclose(
            row.abandonment_rate, n_aband / n_click, abs_tol=1e-5
        )
        assert 0 < row.abandonment_rate < 1  # both outcomes present
