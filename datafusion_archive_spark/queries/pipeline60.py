"""Pipeline wave 60 (round 5, fifty-eighth wave): density clustering
and clustering evaluation.

- ``dbscan_clusters`` — grid-accelerated DBSCAN over the portable
  hash-fraction customer points: ε-neighbor pairs come from the same
  cell-bucketed candidate join the geo wave certifies (work ∝
  occupied-cell co-membership, never n²), core points have ≥
  _MIN_PTS neighbors, clusters are the connected components of the
  core-core graph (the already-certified min-label/pointer-jump
  operator), and border points attach to any adjacent core's
  cluster. ε is DENSITY-ADAPTIVE (ε(n) = _EPS·sqrt(_N_REF/n), see
  _eps_for) so the ε-graph stays subcritical (mean degree ≈ 3) at
  every scale — fixed ε went supercritical at sf0.1 and cost the
  round-10 sweep 34 min in the oracle's recursive CTE. Output:
  clusters / core / border / noise counts and the largest-cluster
  size. The oracle replays the same definition (including the ε
  expression and cell blocking) with a recursive min-label CTE.
- ``silhouette_simplified`` — the centroid-form silhouette over the
  labeled embedding corpus: a = distance to own-label centroid,
  b = min distance to any other label's centroid,
  s = (b−a)/max(a,b), averaged per label. The standard
  clustering-quality readout, exact in SQL (position-exploded
  centroid aggregate + a labels × centroids distance join).

The reference has no joins or arrays (``/root/reference/ROADMAP.md``).
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from datafusion_archive_spark.operators import dedup
from datafusion_archive_spark.operators.util import cached
from datafusion_archive_spark.queries.pipeline10 import _synth_point

_EPS = 0.25
_MIN_PTS = 3  # neighbors (excluding self) to be a core point
_DIM = 64
_N_REF = 1500  # density anchor: ε is calibrated at the sf0.01 scale


def _eps_for(n: int) -> float:
    """Density-adaptive radius: ε(n) = _EPS · sqrt(_N_REF / n) keeps
    the expected ε-degree constant (n·π·ε²/span² ≈ 3, subcritical) as
    the corpus grows. A FIXED radius goes supercritical at 10× density
    (mean degree ≈ 30 at sf0.1 → one giant component), which is both
    degenerate clustering and a scale cliff: the engine's component
    labels still converge, but the DuckDB oracle's recursive min-label
    CTE materializes s² label pairs per size-s component (34 min at
    sf0.1 in the round-10 sweep — found and fixed in round 11).
    Anchored at _N_REF so the certified sf0.01 output is unchanged;
    the same expression is computed in SQL by the oracle (identical
    IEEE double ops ⇒ identical ε bit-for-bit). Guarded against an
    empty table (ε = _EPS — nothing to pair anyway, but the query
    must still build)."""
    return _EPS * math.sqrt(_N_REF / n) if n > 0 else _EPS


def _neighbor_pairs(pts, r):
    """Symmetric ε-neighbor pairs (a != b) via the cell-bucket join
    (cell size = r ⇒ every true pair meets in one of 9 buckets)."""
    a = pts.select(
        F.col("id").alias("ida"),
        F.col("p_lat").alias("xa"),
        F.col("p_lon").alias("ya"),
        F.floor(F.col("p_lat") / r).alias("cx"),
        F.floor(F.col("p_lon") / r).alias("cy"),
    )
    offsets = F.array(
        *[
            F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
            for dx in (-1, 0, 1)
            for dy in (-1, 0, 1)
        ]
    )
    b = (
        pts.select(
            F.col("id").alias("idb"),
            F.col("p_lat").alias("xb"),
            F.col("p_lon").alias("yb"),
        )
        .select("*", F.explode(offsets).alias("o"))
        .select(
            "idb",
            "xb",
            "yb",
            (F.floor(F.col("xb") / r) + F.col("o.dx")).alias("cx"),
            (F.floor(F.col("yb") / r) + F.col("o.dy")).alias("cy"),
        )
    )
    dx = F.col("xa") - F.col("xb")
    dy = F.col("ya") - F.col("yb")
    # no .distinct() (round 15): a given ordered pair meets in EXACTLY
    # one bucket — the offset must equal cell(a) − cell(b), a fixed
    # integer vector — so the join output is duplicate-free by
    # construction and the old distinct was a full Exchange of the
    # pair list doing nothing. The oracle's pairs CTE has no DISTINCT
    # either (same construction), so semantics were already pinned.
    return (
        a.join(b, ["cx", "cy"])
        .filter(
            (F.col("ida") != F.col("idb"))
            & (dx * dx + dy * dy < F.lit(r * r))
        )
        .select("ida", "idb")
    )


def q_dbscan_clusters(spark, sf):
    """DBSCAN summary: clusters, core/border/noise, max size."""
    pts = spark.read.parquet(f"{sf}/customer.parquet").select(
        F.col("c_custkey").alias("id"),
        *_synth_point(F.col("c_custkey"), "p"),
    )
    n_pts = pts.count()
    # cached (registry-released, not a bare persist that would leak
    # across driver/bench sessions): pairs feeds the degree, core-core
    # restriction, and border passes
    pairs = cached(_neighbor_pairs(pts, _eps_for(n_pts)))
    deg = pairs.groupBy(F.col("ida").alias("id")).agg(
        F.count(F.lit(1)).alias("deg")
    )
    core = cached(deg.filter(F.col("deg") >= _MIN_PTS).select("id"))
    core_pairs = (
        pairs.join(core.withColumnRenamed("id", "ida"), "ida")
        .join(core.withColumnRenamed("id", "idb"), "idb")
        .select("ida", "idb")
    )
    comp = dedup.connected_components(
        core_pairs, a_col="ida", b_col="idb"
    )
    # isolated core points (no core neighbor) form singleton clusters
    lonely = core.join(
        comp.select(F.col("node").alias("id")), "id", "left_anti"
    ).select(
        F.col("id").alias("node"), F.col("id").alias("component")
    )
    labels = cached(comp.unionByName(lonely))
    # border: non-core with >= 1 core neighbor; attach to min cluster
    border = (
        pairs.join(core.withColumnRenamed("id", "idb"), "idb")
        .join(
            core.withColumnRenamed("id", "ida"), "ida", "left_anti"
        )
        .join(
            labels.select(
                F.col("node").alias("idb"),
                F.col("component").alias("comp"),
            ),
            "idb",
        )
        .groupBy(F.col("ida").alias("node"))
        .agg(F.min("comp").alias("component"))
    )
    sizes = (
        labels.unionByName(border)
        .groupBy("component")
        .agg(F.count(F.lit(1)).alias("sz"))
    )
    return (
        sizes.agg(
            F.count(F.lit(1)).alias("n_clusters"),
            F.coalesce(F.max("sz"), F.lit(0)).alias(
                "max_cluster_size"
            ),
            F.coalesce(F.sum("sz"), F.lit(0)).alias("n_clustered"),
        )
        .crossJoin(
            core.agg(F.count(F.lit(1)).alias("n_core"))
        )
        .select(
            "n_clusters",
            "max_cluster_size",
            "n_core",
            (F.col("n_clustered") - F.col("n_core")).alias("n_border"),
            (F.lit(n_pts) - F.col("n_clustered")).alias("n_noise"),
        )
    )


def q_silhouette_simplified(spark, sf):
    """Centroid-form silhouette per embedding label."""
    emb = spark.read.parquet(f"{sf}/embeddings.parquet")
    cells = emb.select(
        "vec_id", "label", F.posexplode("embedding").alias("i", "x")
    ).select("vec_id", "label", "i", F.col("x").cast("double").alias("x"))
    cents = cells.groupBy("label", "i").agg(F.avg("x").alias("c"))
    # distance of every vector to every label centroid
    d2 = (
        cells.join(
            cents.select(
                F.col("label").alias("clabel"), "i", "c"
            ),
            "i",
        )
        .groupBy("vec_id", "label", "clabel")
        .agg(
            F.sum(
                F.pow(F.col("x") - F.col("c"), F.lit(2.0))
            ).alias("ss")
        )
        .select(
            "vec_id", "label", "clabel", F.sqrt("ss").alias("dist")
        )
    )
    own = d2.filter(F.col("label") == F.col("clabel")).select(
        "vec_id", "label", F.col("dist").alias("a")
    )
    other = (
        d2.filter(F.col("label") != F.col("clabel"))
        .groupBy("vec_id")
        .agg(F.min("dist").alias("b"))
    )
    sil = own.join(other, "vec_id").select(
        "label",
        (
            (F.col("b") - F.col("a"))
            / F.greatest(F.col("a"), F.col("b"))
        ).alias("s"),
    )
    return (
        sil.groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vectors"),
            F.round(F.avg("s"), 6).alias("mean_silhouette"),
        )
        .orderBy("label")
    )


QUERIES = {
    "dbscan_clusters": q_dbscan_clusters,
    "silhouette_simplified": q_silhouette_simplified,
}


def _dbscan_oracle() -> str:
    from datafusion_archive_spark.queries.llm import _hash64_sql
    from datafusion_archive_spark.queries.pipeline10 import (
        _GEO_SEED_LAT,
        _GEO_SEED_LON,
        _GEO_SPAN,
        _TWO60,
    )

    lat = (
        f"({_hash64_sql('CAST(c_custkey AS VARCHAR)', _GEO_SEED_LAT)}"
        f" / {_TWO60!r}) * {_GEO_SPAN!r}"
    )
    lon = (
        f"({_hash64_sql('CAST(c_custkey AS VARCHAR)', _GEO_SEED_LON)}"
        f" / {_TWO60!r}) * {_GEO_SPAN!r}"
    )
    return f"""
        WITH RECURSIVE pts AS MATERIALIZED (
          SELECT c_custkey AS id, {lat} AS x, {lon} AS y
          FROM customer
        ),
        eps AS MATERIALIZED (
          -- density-adaptive radius, same IEEE expression as the
          -- engine's _eps_for (constant expected degree at any SF —
          -- a fixed radius made this CTE chain supercritical at
          -- sf0.1: s² recursive label pairs, 34 min)
          SELECT {_EPS} * sqrt({float(_N_REF)} / count(*)) AS r
          FROM pts
        ),
        cells AS MATERIALIZED (
          SELECT id, x, y,
                 CAST(floor(x / e.r) AS BIGINT) AS cx,
                 CAST(floor(y / e.r) AS BIGINT) AS cy
          FROM pts, eps e
        ),
        pairs AS MATERIALIZED (
          -- cell-bucketed candidates (cell size = r ⇒ every true pair
          -- meets in one of the 9 neighbor buckets), exact distance
          -- predicate closes — blocking is exactness-preserving
          SELECT a.id AS ida, b.id AS idb
          FROM cells a, eps e,
               (SELECT c.id, c.x, c.y,
                       c.cx + ox.dx AS cx, c.cy + oy.dy AS cy
                FROM cells c, range(-1, 2) ox(dx),
                     range(-1, 2) oy(dy)) b
          WHERE a.cx = b.cx AND a.cy = b.cy
            AND a.id != b.id
            AND (a.x - b.x) ** 2 + (a.y - b.y) ** 2 < e.r * e.r
        ),
        core AS MATERIALIZED (
          SELECT ida AS id FROM pairs GROUP BY 1
          HAVING count(*) >= {_MIN_PTS}
        ),
        core_pairs AS MATERIALIZED (
          SELECT p.ida, p.idb FROM pairs p
          JOIN core a ON p.ida = a.id
          JOIN core b ON p.idb = b.id
        ),
        lbl AS (
          SELECT id AS node, id AS lab FROM core
          UNION
          SELECT p.ida, l.lab
          FROM lbl l JOIN core_pairs p ON l.node = p.idb
        ),
        comp AS MATERIALIZED (
          SELECT node, min(lab) AS component FROM lbl GROUP BY 1
        ),
        border AS MATERIALIZED (
          SELECT p.ida AS node, min(c.component) AS component
          FROM pairs p
          JOIN core b ON p.idb = b.id
          JOIN comp c ON c.node = p.idb
          WHERE p.ida NOT IN (SELECT id FROM core)
          GROUP BY 1
        ),
        sizes AS (
          SELECT component, count(*) AS sz FROM (
            SELECT node, component FROM comp
            UNION ALL
            SELECT node, component FROM border
          ) GROUP BY 1
        )
        SELECT (SELECT count(*) FROM sizes) AS n_clusters,
               (SELECT CAST(COALESCE(max(sz), 0) AS BIGINT)
                FROM sizes) AS max_cluster_size,
               (SELECT count(*) FROM core) AS n_core,
               (SELECT count(*) FROM border) AS n_border,
               (SELECT count(*) FROM pts)
                 - (SELECT CAST(COALESCE(sum(sz), 0) AS BIGINT)
                    FROM sizes) AS n_noise
    """


ORACLES = {
    "dbscan_clusters": _dbscan_oracle(),
    "silhouette_simplified": f"""
        WITH cells AS (
          SELECT vec_id, label, r.i AS i,
                 CAST(embedding[r.i] AS DOUBLE) AS x
          FROM embeddings, range(1, {_DIM} + 1) r(i)
        ),
        cents AS (
          SELECT label AS clabel, i, avg(x) AS c
          FROM cells GROUP BY 1, 2
        ),
        d2 AS (
          SELECT t.vec_id, t.label, k.clabel,
                 sqrt(sum((t.x - k.c) ** 2)) AS dist
          FROM cells t JOIN cents k ON t.i = k.i
          GROUP BY 1, 2, 3
        ),
        own AS (
          SELECT vec_id, label, dist AS a FROM d2
          WHERE label = clabel
        ),
        other AS (
          SELECT vec_id, min(dist) AS b FROM d2
          WHERE label != clabel GROUP BY 1
        )
        SELECT o.label,
               count(*) AS n_vectors,
               round(avg((t.b - o.a) / GREATEST(o.a, t.b)), 6)
                 AS mean_silhouette
        FROM own o JOIN other t ON o.vec_id = t.vec_id
        GROUP BY 1
        ORDER BY 1
    """,
}
