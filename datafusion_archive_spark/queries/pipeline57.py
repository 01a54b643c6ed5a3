"""Pipeline wave 57 (round 5, fifty-fifth wave): privacy auditing and
computational geometry.

- ``k_anonymity_audit`` — the release-gating privacy audit: group by
  the quasi-identifier tuple (nation, order month, priority), report
  k (the smallest group), the share of rows in groups below
  _K_THRESHOLD (re-identifiable mass), and the minimum l-diversity
  of the sensitive order-status attribute (a k-anonymous group
  where every order has the same status still leaks it). One aggregate per grain — the audit an
  anonymized-export pipeline must pass before data leaves.
- ``point_in_polygon_tag`` — ray-casting point-in-polygon: tag the
  deterministic hash-fraction supplier points (same portable
  coordinate synthesis the geo-grid wave certifies) against a fixed
  non-convex polygon by crossing parity, computed as an
  explode-over-edges + parity aggregate (scales as points × edges
  with the polygon broadcast — the standard geofencing kernel).
  Reports inside/outside counts and the inside share per region.

The reference has no geometry or grouping surface
(``/root/reference/ROADMAP.md``).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from datafusion_archive_spark.queries.pipeline10 import _synth_point

_K_THRESHOLD = 5

# a fixed non-convex (arrow-head) polygon in the [0,10)^2 synth space
_POLY = [
    (1.0, 1.0),
    (9.0, 2.0),
    (5.0, 5.0),
    (8.5, 8.5),
    (2.0, 9.0),
    (4.0, 5.0),
]


def q_k_anonymity_audit(spark, sf):
    """k-anonymity + l-diversity over (nation, month, priority)."""
    orders = spark.read.parquet(f"{sf}/orders.parquet")
    cust = spark.read.parquet(f"{sf}/customer.parquet")
    groups = (
        orders.join(
            cust.select("c_custkey", "c_nationkey"),
            orders.o_custkey == cust.c_custkey,
        )
        .groupBy(
            F.col("c_nationkey").alias("qi_nation"),
            F.date_trunc("month", F.col("o_orderdate")).alias(
                "qi_month"
            ),
            F.col("o_orderpriority").alias("qi_priority"),
        )
        .agg(
            F.count(F.lit(1)).alias("sz"),
            F.count_distinct("o_orderstatus").alias("l_div"),
        )
    )
    return groups.agg(
        F.count(F.lit(1)).alias("n_groups"),
        F.sum("sz").alias("n_rows"),
        F.min("sz").alias("k_anonymity"),
        F.round(
            F.sum(
                F.when(
                    F.col("sz") < _K_THRESHOLD, F.col("sz")
                ).otherwise(F.lit(0))
            ).cast("double")
            / F.sum("sz"),
            6,
        ).alias("pct_rows_below_k"),
        F.min("l_div").alias("min_l_diversity"),
    )


def q_point_in_polygon_tag(spark, sf):
    """Ray-cast supplier points against the fixed polygon."""
    sup = spark.read.parquet(f"{sf}/supplier.parquet")
    pts = sup.select(
        "s_suppkey",
        "s_nationkey",
        *_synth_point(F.col("s_suppkey"), "p"),
    )
    edges = F.array(
        *[
            F.struct(
                F.lit(x1).alias("x1"),
                F.lit(y1).alias("y1"),
                F.lit(x2).alias("x2"),
                F.lit(y2).alias("y2"),
            )
            for (x1, y1), (x2, y2) in zip(
                _POLY, _POLY[1:] + _POLY[:1]
            )
        ]
    )
    e = pts.select(
        "s_suppkey",
        "s_nationkey",
        "p_lat",
        "p_lon",
        F.explode(edges).alias("e"),
    )
    # edge crosses the horizontal ray from (lat, lon) to lon = +inf
    crosses = (
        (
            (F.col("e.y1") > F.col("p_lat"))
            != (F.col("e.y2") > F.col("p_lat"))
        )
        & (
            F.col("p_lon")
            < (F.col("e.x2") - F.col("e.x1"))
            * (F.col("p_lat") - F.col("e.y1"))
            / (F.col("e.y2") - F.col("e.y1"))
            + F.col("e.x1")
        )
    ).cast("int")
    parity = e.select(
        "s_suppkey", "s_nationkey", crosses.alias("c")
    ).groupBy("s_suppkey", "s_nationkey").agg(
        (F.sum("c") % 2 == 1).cast("int").alias("inside")
    )
    return (
        parity.groupBy(F.col("s_nationkey").alias("nationkey"))
        .agg(
            F.count(F.lit(1)).alias("n_suppliers"),
            F.sum("inside").alias("n_inside"),
            F.round(
                F.sum("inside") / F.count(F.lit(1)).cast("double"), 6
            ).alias("inside_share"),
        )
        .orderBy("nationkey")
    )


QUERIES = {
    "k_anonymity_audit": q_k_anonymity_audit,
    "point_in_polygon_tag": q_point_in_polygon_tag,
}


def _pip_oracle() -> str:
    from datafusion_archive_spark.queries.pipeline10 import (
        _GEO_SEED_LAT,
        _GEO_SEED_LON,
        _GEO_SPAN,
        _TWO60,
    )
    from datafusion_archive_spark.queries.llm import _hash64_sql

    lat = (
        f"({_hash64_sql('CAST(s_suppkey AS VARCHAR)', _GEO_SEED_LAT)}"
        f" / {_TWO60!r}) * {_GEO_SPAN!r}"
    )
    lon = (
        f"({_hash64_sql('CAST(s_suppkey AS VARCHAR)', _GEO_SEED_LON)}"
        f" / {_TWO60!r}) * {_GEO_SPAN!r}"
    )
    edge_rows = ", ".join(
        f"({x1!r}, {y1!r}, {x2!r}, {y2!r})"
        for (x1, y1), (x2, y2) in zip(_POLY, _POLY[1:] + _POLY[:1])
    )
    return f"""
        WITH pts AS (
          SELECT s_suppkey, s_nationkey,
                 {lat} AS p_lat, {lon} AS p_lon
          FROM supplier
        ),
        edges(x1, y1, x2, y2) AS (VALUES {edge_rows}),
        parity AS (
          SELECT p.s_suppkey, p.s_nationkey,
                 CASE WHEN sum(CASE WHEN
                   (e.y1 > p.p_lat) != (e.y2 > p.p_lat)
                   AND p.p_lon < (e.x2 - e.x1)
                     * (p.p_lat - e.y1) / (e.y2 - e.y1) + e.x1
                   THEN 1 ELSE 0 END) % 2 = 1
                 THEN 1 ELSE 0 END AS inside
          FROM pts p CROSS JOIN edges e
          GROUP BY 1, 2
        )
        SELECT s_nationkey AS nationkey,
               count(*) AS n_suppliers,
               CAST(sum(inside) AS BIGINT) AS n_inside,
               round(CAST(sum(inside) AS DOUBLE) / count(*), 6)
                 AS inside_share
        FROM parity
        GROUP BY 1
        ORDER BY 1
    """


ORACLES = {
    "k_anonymity_audit": f"""
        WITH groups AS (
          SELECT c.c_nationkey AS qi_nation,
                 date_trunc('month', o.o_orderdate) AS qi_month,
                 o.o_orderpriority AS qi_priority,
                 count(*) AS sz,
                 count(DISTINCT o.o_orderstatus) AS l_div
          FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
          GROUP BY 1, 2, 3
        )
        SELECT count(*) AS n_groups,
               CAST(sum(sz) AS BIGINT) AS n_rows,
               CAST(min(sz) AS BIGINT) AS k_anonymity,
               round(CAST(sum(CASE WHEN sz < {_K_THRESHOLD}
                          THEN sz ELSE 0 END) AS DOUBLE) / sum(sz), 6)
                 AS pct_rows_below_k,
               CAST(min(l_div) AS BIGINT) AS min_l_diversity
        FROM groups
    """,
    "point_in_polygon_tag": _pip_oracle(),
}
