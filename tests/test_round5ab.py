"""Round-5 wave-32 semantics: haversine nearest-hub assignment
(datafusion_archive_spark/queries/pipeline34.py)."""

from __future__ import annotations

import hashlib
import math
from collections import defaultdict

from datafusion_archive_spark.queries import pipeline34 as P34

SF = "/root/testdata/sf0.001"


def _frac(key, seed):
    return (
        int(hashlib.md5(f"{key}:{seed}".encode()).hexdigest()[:15], 16)
        / P34._TWO60
    )


def _haversine(la1, lo1, la2, lo2):
    la1, lo1, la2, lo2 = map(math.radians, (la1, lo1, la2, lo2))
    a = (
        math.sin((la2 - la1) / 2) ** 2
        + math.cos(la1) * math.cos(la2) * math.sin((lo2 - lo1) / 2) ** 2
    )
    return 2 * P34._EARTH_KM * math.asin(math.sqrt(a))


def _bearing(la1, lo1, la2, lo2):
    la1, lo1, la2, lo2 = map(math.radians, (la1, lo1, la2, lo2))
    b = math.atan2(
        math.sin(lo2 - lo1) * math.cos(la2),
        math.cos(la1) * math.sin(la2)
        - math.sin(la1) * math.cos(la2) * math.cos(lo2 - lo1),
    )
    return (math.degrees(b) + 360.0) % 360.0


def test_matches_python(spark):
    keys = [
        r.c_custkey
        for r in spark.read.parquet(f"{SF}/customer.parquet").collect()
    ]
    agg = defaultdict(lambda: [0, 0.0, 0.0])
    for k in keys:
        lat = _frac(k, 11) * 120.0 - 60.0
        lon = _frac(k, 13) * 360.0 - 180.0
        best = min(
            (
                (_haversine(lat, lon, hla, hlo), n, _bearing(lat, lon, hla, hlo))
                for n, hla, hlo in P34._HUBS
            ),
        )
        a = agg[best[1]]
        a[0] += 1
        a[1] += best[0]
        a[2] += best[2]
    got = {r.hub: r for r in P34.q_haversine_nearest_hub(spark, SF).collect()}
    assert set(got) == set(agg)
    for hub, (n, sd, sb) in agg.items():
        assert got[hub].n_customers == n
        assert math.isclose(got[hub].avg_distance_km, sd / n, abs_tol=1e-2)
        assert math.isclose(got[hub].avg_bearing_deg, sb / n, abs_tol=1e-2)


def test_every_hub_gets_customers(spark):
    rows = P34.q_haversine_nearest_hub(spark, SF).collect()
    assert len(rows) == len(P34._HUBS)
    assert all(r.n_customers > 0 for r in rows)
    # plausibility: nearest-hub mean distance is well under a
    # half-circumference
    assert all(r.avg_distance_km < math.pi * P34._EARTH_KM / 2 for r in rows)
