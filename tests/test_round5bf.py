"""Round-5 wave-63 semantics: Markov journey chain + removal
attribution (datafusion_archive_spark/queries/pipeline65.py)."""

from __future__ import annotations

from collections import defaultdict

import pytest

from datafusion_archive_spark.queries import pipeline65 as P65
from datafusion_archive_spark.queries.timeseries import load_events

SF = "/root/testdata/sf0.001"


def _journeys(spark):
    per = defaultdict(list)
    rows = sorted(
        load_events(spark, SF).collect(),
        key=lambda r: (r.user_id, r.ts, r.event_id),
    )
    for r in rows:
        per[r.user_id].append(r.event_type)
    trans = defaultdict(int)
    for evs in per.values():
        if "purchase" in evs:
            evs = evs[: evs.index("purchase") + 1]
            absorbed = True
        else:
            absorbed = False
        prev = "start"
        for e in evs:
            trans[(prev, e)] += 1
            prev = e
        if not absorbed:
            trans[(prev, "null")] += 1
    return trans


class TestTransitionMatrix:
    def test_matches_python(self, spark):
        trans = _journeys(spark)
        got = {(r.src, r.dst): r for r in
               P65.q_markov_transition_matrix(spark, SF).collect()}
        assert set(got) == set(trans)
        src_tot = defaultdict(int)
        for (s, _), n in trans.items():
            src_tot[s] += n
        for (s, d), n in trans.items():
            r = got[(s, d)]
            assert r.n == n
            assert r.p == pytest.approx(
                round(n / src_tot[s], 6), abs=1e-6
            )


class TestRemovalAttribution:
    def test_matches_python_propagation(self, spark):
        trans = _journeys(spark)
        src_tot = defaultdict(int)
        for (s, _), n in trans.items():
            src_tot[s] += n
        base = {
            (s, d): n / src_tot[s] for (s, d), n in trans.items()
        }

        def conv(removed):
            edges = defaultdict(float)
            for (s, d), p in base.items():
                if s == removed:
                    continue
                d2 = "null" if d == removed else d
                edges[(s, d2)] += p
            edges[("purchase", "purchase")] = 1.0
            edges[("null", "null")] = 1.0
            v = {"start": 1.0}
            for _ in range(P65._ITERS):
                nv = defaultdict(float)
                for (s, d), p in edges.items():
                    if s in v:
                        nv[d] += v[s] * p
                v = dict(nv)
            return v.get("purchase", 0.0)

        base_cv = conv(None)
        drops = {
            c: (base_cv - conv(c)) / base_cv for c in P65._CHANNELS
        }
        tot = sum(drops.values())
        got = {r.removed_channel: r for r in
               P65.q_markov_attribution_removal(spark, SF).collect()}
        assert set(got) == set(P65._CHANNELS)
        for c in P65._CHANNELS:
            r = got[c]
            assert r.base_conv == pytest.approx(
                round(base_cv, 6), abs=1e-5
            )
            assert r.attribution_share == pytest.approx(
                round(drops[c] / tot, 6), abs=1e-4
            )
        # attribution shares form a distribution
        assert sum(r.attribution_share for r in got.values()) == (
            pytest.approx(1.0, abs=1e-4)
        )

    def test_chain_conversion_tracks_empirical(self, spark):
        per = defaultdict(list)
        for r in load_events(spark, SF).collect():
            per[r.user_id].append(r.event_type)
        emp = sum(
            1 for evs in per.values() if "purchase" in evs
        ) / len(per)
        got = P65.q_markov_attribution_removal(spark, SF).collect()
        # first-order chain conversion should be in the empirical
        # ballpark (Markov assumption, not equality)
        assert abs(got[0].base_conv - emp) < 0.25
