"""Pipeline wave 34 (round 5, thirty-second wave): spherical
geo-assignment.

- ``haversine_nearest_hub`` — assign every customer (deterministic
  synthetic lat/lon from the portable hash, mapped into a real
  ±60°/±180° range) to the nearest of five fixed hubs by great-circle
  (haversine) distance, with the initial bearing; rolled up per hub.
  Certifies the trigonometric expression surface (radians / sin /
  cos / asin / atan2 / sqrt) bit-for-bit against DuckDB — the one
  function family no earlier wave exercised — inside the standard
  broadcast nearest-assignment plan.

The reference's entire math-function surface is ``sqrt``
(``src/sqlplanner.rs:343-367``).
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from datafusion_archive_spark.functions import text as TX
from datafusion_archive_spark.operators.util import load_table

_TWO60 = float(2**60)
_EARTH_KM = 6371.0

#: five fixed hubs (name, lat, lon)
_HUBS = [
    ("alpha", 40.0, -74.0),
    ("bravo", 51.5, 0.0),
    ("charlie", -33.9, 151.2),
    ("delta", 35.7, 139.7),
    ("echo", -23.5, -46.6),
]


def _t(spark, sf_dir, name):
    return load_table(spark, sf_dir, name)


def _coord(key_col, seed, lo, hi):
    frac = TX.hash64(key_col.cast("string"), seed) / _TWO60
    return frac * (hi - lo) + lo


def q_haversine_nearest_hub(spark, sf):
    """Per hub: assigned-customer count, mean great-circle distance
    (km), and mean initial bearing (degrees), customers placed by the
    portable hash into lat ∈ (−60, 60), lon ∈ (−180, 180).

    Scale: the 5-hub dimension is broadcast; distance and the argmin
    are scan-side codegen over the customer stream (the 5-way
    crossJoin collapses map-side via the per-customer min); one
    Exchange for the per-hub rollup."""
    c = _t(spark, sf, "customer").select(
        "c_custkey",
        _coord(F.col("c_custkey"), 11, -60.0, 60.0).alias("lat"),
        _coord(F.col("c_custkey"), 13, -180.0, 180.0).alias("lon"),
    )
    hubs = [
        F.struct(
            F.lit(n).alias("hub"),
            F.lit(la).alias("hlat"),
            F.lit(lo).alias("hlon"),
        )
        for n, la, lo in _HUBS
    ]
    exploded = c.select(
        "c_custkey", "lat", "lon", F.explode(F.array(*hubs)).alias("h")
    ).select("c_custkey", "lat", "lon", "h.hub", "h.hlat", "h.hlon")
    la1, lo1 = F.radians("lat"), F.radians("lon")
    la2, lo2 = F.radians("hlat"), F.radians("hlon")
    dlat, dlon = la2 - la1, lo2 - lo1
    a = (
        F.sin(dlat / 2) * F.sin(dlat / 2)
        + F.cos(la1) * F.cos(la2) * F.sin(dlon / 2) * F.sin(dlon / 2)
    )
    dist = 2 * _EARTH_KM * F.asin(F.sqrt(a))
    bearing_rad = F.atan2(
        F.sin(dlon) * F.cos(la2),
        F.cos(la1) * F.sin(la2) - F.sin(la1) * F.cos(la2) * F.cos(dlon),
    )
    bearing = (F.degrees(bearing_rad) + 360.0) % 360.0
    scored = exploded.select(
        "c_custkey",
        "hub",
        dist.alias("d"),
        bearing.alias("b"),
    )
    best = scored.groupBy("c_custkey").agg(
        F.min_by("hub", "d").alias("hub"),
        F.min("d").alias("d"),
        F.min_by("b", "d").alias("b"),
    )
    return best.groupBy("hub").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.round(F.avg("d"), 4).alias("avg_distance_km"),
        F.round(F.avg("b"), 4).alias("avg_bearing_deg"),
    )


QUERIES = {
    "haversine_nearest_hub": q_haversine_nearest_hub,
}


def _hub_values() -> str:
    return ", ".join(f"('{n}', {la}, {lo})" for n, la, lo in _HUBS)


def _hash_frac(seed: int) -> str:
    return (
        f"(('0x' || substr(md5(CAST(c_custkey AS VARCHAR) || ':{seed}'), "
        f"1, 15))::BIGINT / {_TWO60})"
    )


ORACLES = {
    "haversine_nearest_hub": f"""
        WITH c AS (
          SELECT c_custkey,
                 {_hash_frac(11)} * 120.0 - 60.0 AS lat,
                 {_hash_frac(13)} * 360.0 - 180.0 AS lon
          FROM customer
        ),
        hubs(hub, hlat, hlon) AS (VALUES {_hub_values()}),
        scored AS (
          SELECT c.c_custkey, h.hub,
                 2 * {_EARTH_KM} * asin(sqrt(
                   sin((radians(h.hlat) - radians(c.lat)) / 2)
                     * sin((radians(h.hlat) - radians(c.lat)) / 2)
                   + cos(radians(c.lat)) * cos(radians(h.hlat))
                     * sin((radians(h.hlon) - radians(c.lon)) / 2)
                     * sin((radians(h.hlon) - radians(c.lon)) / 2)
                 )) AS d,
                 fmod(degrees(atan2(
                   sin(radians(h.hlon) - radians(c.lon))
                     * cos(radians(h.hlat)),
                   cos(radians(c.lat)) * sin(radians(h.hlat))
                     - sin(radians(c.lat)) * cos(radians(h.hlat))
                       * cos(radians(h.hlon) - radians(c.lon))
                 )) + 360.0, 360.0) AS b
          FROM c CROSS JOIN hubs h
        ),
        best AS (
          SELECT c_custkey,
                 arg_min(hub, d) AS hub,
                 min(d) AS d,
                 arg_min(b, d) AS b
          FROM scored GROUP BY c_custkey
        )
        SELECT hub,
               count(*) AS n_customers,
               round(avg(d), 4) AS avg_distance_km,
               round(avg(b), 4) AS avg_bearing_deg
        FROM best GROUP BY hub
    """,
}
