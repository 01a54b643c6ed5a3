"""Pipeline wave 68 (round 5, sixty-sixth wave): spatial point-pattern
statistics and EM mixture fitting.

- ``spatial_clark_evans`` — complete-spatial-randomness tests on the
  portable hash-fraction customer points: the Clark–Evans ratio
  R = d̄_NN / (1/(2√λ)) with its z statistic (R < 1 clustered,
  R > 1 dispersed), plus Ripley's K̂(r)/(πr²) at three radii (the
  multi-scale CSR profile). Candidates come from the certified
  cell-bucket join at cell size max(_RADII): every pair closer than
  the largest K radius meets in one of the 9 neighbor buckets, so
  the K counts are exact by construction, and a point's blocked
  nearest-neighbor distance is its TRUE nearest-neighbor distance
  whenever it is < the cell size (anything outside the 3×3
  neighborhood is ≥ one full cell away). The rare points with no
  candidate that close (P ≈ e^{-πλc²} under CSR — a handful at
  sf0.001, none at sf0.01+) fall back to an exact brute-force pass
  against the full point set, so the result is byte-identical to the
  all-pairs formulation at every scale while the work stays
  ∝ n·occupancy, never n². (The r10 sf0.1 sweep paid 351 s for the
  old all-pairs join — recomputed twice because it was uncached;
  fixed in round 11.) At extreme density the K counts themselves
  grow ∝ n·λ·r² — that is the statistic's own output size; sample
  before this query if that budget is too high.
- ``em_exponential_mixture`` — a 2-component exponential mixture fit
  to global event inter-arrival gaps by _EM_ITERS exact EM steps
  (deterministic moment-based init; E-step responsibilities, M-step
  closed forms — one aggregate pass per iteration). The EM loop
  joins the engine's certified iterative-training family (Newton
  logistic, IRLS Huber, Lloyd k-means, power-iteration PCA); the
  oracle unrolls identical iterations.

The reference has no joins or exp/log functions
(``/root/reference/ROADMAP.md``).
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from datafusion_archive_spark.queries.pipeline10 import _synth_point
from datafusion_archive_spark.queries.timeseries import load_events

from datafusion_archive_spark.operators.util import cached

_AREA = 100.0  # the synth coordinate space is [0, 10)^2
_RADII = (0.25, 0.5, 1.0)
_N_REF = 1500  # density anchor: radii are calibrated at sf0.01 scale
_EM_ITERS = 3


def _radius_scale(n: int) -> float:
    """Density-adaptive radius factor, the same playbook as DBSCAN's
    ε(n) (queries/pipeline60._eps_for): the synth space is a FIXED
    [0,10)² square, so growing the corpus densifies it and the pair
    count within a fixed radius is Θ(λ²·A·πr²) — quadratic in rows
    (the round-11d sweep-growth audit measured this query at 14.4×
    wall for 10× rows, one ambient wobble from the 15× gate).
    Scaling every radius by sqrt(_N_REF/n) keeps the expected
    neighbor count per point constant, so candidates grow linearly
    with rows at any scale; the CSR readouts stay interpretable at
    any radius (under CSR, K(r)/πr² ≈ 1 and the Clark–Evans R and z
    don't involve the radii at all). Anchored at _N_REF so the
    certified sf0.01 output is unchanged; the oracle computes the
    identical IEEE expression in SQL (dbscan precedent ⇒ identical
    radii bit-for-bit). The empty-table guard is max(n, 1) — the SAME
    expression the oracle's eps CTE uses (greatest(count(*), 1),
    ADVICE r11) — so engine and SQL radii are identical bits for
    every n >= 1 AND both sides stay defined (if degenerate) at
    n = 0, where there is nothing to pair anyway."""
    return math.sqrt(_N_REF / max(n, 1))


def q_spatial_clark_evans(spark, sf):
    """Clark–Evans CSR test + Ripley K ratios at 3 density-adaptive
    radii (base radii × sqrt(_N_REF/n); columns keep the base-radius
    labels)."""
    pts = spark.read.parquet(f"{sf}/customer.parquet").select(
        F.col("c_custkey").alias("id"),
        *_synth_point(F.col("c_custkey"), "p"),
    )
    n_pts = pts.count()
    scale = _radius_scale(n_pts)
    radii = [r * scale for r in _RADII]
    c = max(radii)  # cell size = largest K radius
    a = pts.select(
        F.col("id").alias("ida"),
        F.col("p_lat").alias("xa"),
        F.col("p_lon").alias("ya"),
        F.floor(F.col("p_lat") / c).alias("cx"),
        F.floor(F.col("p_lon") / c).alias("cy"),
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
            (F.floor(F.col("xb") / c) + F.col("o.dx")).alias("cx"),
            (F.floor(F.col("yb") / c) + F.col("o.dy")).alias("cy"),
        )
    )
    dx = F.col("xa") - F.col("xb")
    dy = F.col("ya") - F.col("yb")
    dist = F.sqrt(dx * dx + dy * dy)
    # cached (registry-released): the candidate table feeds both the
    # NN aggregate and the K counts; it is occupancy-bounded
    # (∝ n·9λc², never n²), so materializing it is cheap
    cand = cached(
        a.join(b, ["cx", "cy"])
        .filter(F.col("ida") != F.col("idb"))
        .select("ida", dist.alias("dist"))
    )
    # blocked NN is the TRUE NN whenever it is < the cell size; the
    # (CSR-exponentially rare) remainder gets an exact brute-force
    # pass, so the nnd column is byte-identical to all-pairs
    nnb = (
        cand.groupBy("ida")
        .agg(F.min("dist").alias("nnd"))
        .filter(F.col("nnd") < c)
    )
    miss = a.select("ida", "xa", "ya").join(
        nnb.select("ida"), "ida", "left_anti"
    )
    nnm = (
        F.broadcast(miss)
        .join(
            pts.select(
                F.col("id").alias("idb"),
                F.col("p_lat").alias("xb"),
                F.col("p_lon").alias("yb"),
            ),
            F.col("ida") != F.col("idb"),
        )
        .select("ida", dist.alias("dist"))
        .groupBy("ida")
        .agg(F.min("dist").alias("nnd"))
    )
    nn = nnb.unionByName(nnm)
    kstats = cand.agg(
        *[
            F.sum((F.col("dist") < r).cast("long")).alias(
                f"k{int(r0 * 100)}"
            )
            for r0, r in zip(_RADII, radii)
        ]
    )
    ce = nn.agg(
        F.count(F.lit(1)).alias("n"),
        F.avg("nnd").alias("dbar"),
    )
    joined = ce.crossJoin(F.broadcast(kstats))
    n = F.col("n").cast("double")
    lam = n / _AREA
    expected = 1.0 / (2.0 * F.sqrt(lam))
    se = 0.26136 / F.sqrt(n * lam)
    k_cols = []
    for r0, r in zip(_RADII, radii):
        k_hat = (
            F.lit(_AREA)
            * F.col(f"k{int(r0 * 100)}").cast("double")
            / (n * (n - 1.0))
        )
        k_cols.append(
            F.round(k_hat / (math.pi * r * r), 6).alias(
                f"k_ratio_{int(r0 * 100)}"
            )
        )
    return joined.select(
        F.col("n").alias("n_points"),
        F.round(F.col("dbar") / expected, 6).alias("r_clark_evans"),
        F.round((F.col("dbar") - expected) / se, 6).alias("z_ce"),
        *k_cols,
    )


def _gaps(spark, sf):
    # round 8: distributed lag (operators/ranks) — the unpartitioned
    # lag window sorted the whole event stream in one task
    from datafusion_archive_spark.operators.ranks import bucketed_group_lag

    ev = load_events(spark, sf)
    return (
        bucketed_group_lag(
            ev.select(F.unix_micros("ts").alias("us"), "event_id"),
            [],
            "us",
            ["event_id"],
            [("us", "_prev_us")],
        )
        .select(
            (
                (F.col("us") - F.col("_prev_us")).cast("double")
                / 1.0e6
            ).alias("x")
        )
        .filter(F.col("x").isNotNull())
    )


def q_em_exponential_mixture(spark, sf):
    """2-component exponential mixture on inter-arrival gaps."""
    gaps = cached(_gaps(spark, sf))
    m = gaps.agg(F.avg("x").alias("m")).collect()[0].m
    lam1, lam2, pi1 = 2.0 / m, 0.5 / m, 0.5
    for _ in range(_EM_ITERS):
        f1 = F.lit(pi1) * F.lit(lam1) * F.exp(-F.lit(lam1) * F.col("x"))
        f2 = (
            F.lit(1.0 - pi1)
            * F.lit(lam2)
            * F.exp(-F.lit(lam2) * F.col("x"))
        )
        r = f1 / (f1 + f2)
        agg = gaps.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(r).alias("sr"),
            F.sum(r * F.col("x")).alias("srx"),
            F.sum((1.0 - r) * F.col("x")).alias("scx"),
        ).collect()[0]
        pi1 = agg.sr / agg.n
        lam1 = agg.sr / agg.srx
        lam2 = (agg.n - agg.sr) / agg.scx
    f1 = F.lit(pi1) * F.lit(lam1) * F.exp(-F.lit(lam1) * F.col("x"))
    f2 = (
        F.lit(1.0 - pi1)
        * F.lit(lam2)
        * F.exp(-F.lit(lam2) * F.col("x"))
    )
    return gaps.agg(
        F.count(F.lit(1)).alias("n_gaps"),
        F.round(F.lit(pi1), 6).alias("pi_fast"),
        F.round(F.lit(lam1), 6).alias("lambda_fast"),
        F.round(F.lit(lam2), 6).alias("lambda_slow"),
        F.round(F.avg(F.log(f1 + f2)), 6).alias("mean_loglik"),
    )


QUERIES = {
    "spatial_clark_evans": q_spatial_clark_evans,
    "em_exponential_mixture": q_em_exponential_mixture,
}


def _ce_oracle() -> str:
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
    # scalar subquery, NOT a cross join + GROUP BY: ks must stay a
    # global aggregate so a degenerate empty candidate set still
    # yields one row (matching the engine's agg-without-groupBy)
    ksel = ", ".join(
        f"CAST(sum(CASE WHEN dist < {r!r} * (SELECT s FROM eps)"
        f" THEN 1 ELSE 0 END) AS BIGINT) AS k{int(r * 100)}"
        for r in _RADII
    )
    kout = ", ".join(
        f"round(({_AREA!r} * k.k{int(r * 100)}"
        f" / (CAST(c.n AS DOUBLE) * (c.n - 1)))"
        f" / ({math.pi!r} * ({r!r} * e.s) * ({r!r} * e.s)), 6)"
        f" AS k_ratio_{int(r * 100)}"
        for r in _RADII
    )
    c = max(_RADII)
    return f"""
        WITH pts AS MATERIALIZED (
          SELECT c_custkey AS id, {lat} AS x, {lon} AS y
          FROM customer
        ),
        eps AS MATERIALIZED (
          -- density-adaptive radius factor, same IEEE expression as
          -- the engine's _radius_scale (constant expected neighbor
          -- count at any SF — fixed radii on the fixed [0,10)^2
          -- space made this quadratic: 14.4x wall for 10x rows).
          -- greatest(count(*), 1) mirrors the engine's max(n, 1)
          -- empty-table guard (ADVICE r11): identical bits for every
          -- n >= 1, defined at n = 0
          SELECT sqrt({float(_N_REF)!r} / greatest(count(*), 1)) AS s
          FROM pts
        ),
        cells AS MATERIALIZED (
          SELECT id, x, y,
                 CAST(floor(x / ({c!r} * e.s)) AS BIGINT) AS cx,
                 CAST(floor(y / ({c!r} * e.s)) AS BIGINT) AS cy
          FROM pts, eps e
        ),
        cand AS MATERIALIZED (
          -- cell-bucket candidates at cell size max(adaptive radii):
          -- every pair closer than the largest K radius meets here,
          -- so the K counts are exact and blocked-NN < cell size is
          -- true NN
          SELECT a.id AS ida,
                 sqrt((a.x - b.x) ** 2 + (a.y - b.y) ** 2) AS dist
          FROM cells a
          JOIN (SELECT cl.id, cl.x, cl.y,
                       cl.cx + ox.dx AS cx, cl.cy + oy.dy AS cy
                FROM cells cl, range(-1, 2) ox(dx),
                     range(-1, 2) oy(dy)) b
            ON a.cx = b.cx AND a.cy = b.cy AND a.id != b.id
        ),
        nnb AS MATERIALIZED (
          SELECT ida, min(dist) AS nnd FROM cand, eps e
          GROUP BY 1, e.s
          HAVING min(dist) < {c!r} * e.s
        ),
        nnm AS (
          -- exact brute-force fallback for points with no candidate
          -- within one cell (CSR-exponentially rare)
          SELECT a.id AS ida,
                 min(sqrt((a.x - b.x) ** 2 + (a.y - b.y) ** 2))
                   AS nnd
          FROM pts a JOIN pts b ON a.id != b.id
          WHERE a.id NOT IN (SELECT ida FROM nnb)
          GROUP BY 1
        ),
        nn AS (
          SELECT * FROM nnb UNION ALL SELECT * FROM nnm
        ),
        ce AS (
          SELECT count(*) AS n, avg(nnd) AS dbar FROM nn
        ),
        ks AS (SELECT {ksel} FROM cand)
        SELECT c.n AS n_points,
               round(c.dbar / (1.0 / (2.0
                 * sqrt(CAST(c.n AS DOUBLE) / {_AREA!r}))), 6)
                 AS r_clark_evans,
               round((c.dbar - 1.0 / (2.0
                 * sqrt(CAST(c.n AS DOUBLE) / {_AREA!r})))
                 / (0.26136 / sqrt(CAST(c.n AS DOUBLE)
                   * (CAST(c.n AS DOUBLE) / {_AREA!r}))), 6) AS z_ce,
               {kout}
        FROM ce c CROSS JOIN ks k CROSS JOIN eps e
    """


def _em_oracle() -> str:
    parts = [
        """
        gaps AS MATERIALIZED (
          SELECT (us - lag(us) OVER (ORDER BY us, event_id))
                   / 1.0e6 AS x
          FROM (SELECT epoch_us(ts) AS us, event_id FROM events)
          QUALIFY x IS NOT NULL
        ),
        p0 AS MATERIALIZED (
          SELECT 2.0 / avg(x) AS lam1, 0.5 / avg(x) AS lam2,
                 CAST(0.5 AS DOUBLE) AS pi1
          FROM gaps
        )"""
    ]
    prev = "p0"
    for k in range(1, _EM_ITERS + 1):
        parts.append(
            f"""
        ,s{k} AS MATERIALIZED (
          SELECT count(*) AS n, sum(r) AS sr, sum(r * x) AS srx,
                 sum((1 - r) * x) AS scx
          FROM (
            SELECT g.x,
                   (p.pi1 * p.lam1 * exp(-p.lam1 * g.x))
                   / (p.pi1 * p.lam1 * exp(-p.lam1 * g.x)
                      + (1 - p.pi1) * p.lam2 * exp(-p.lam2 * g.x))
                     AS r
            FROM gaps g CROSS JOIN {prev} p
          )
        ),
        p{k} AS MATERIALIZED (
          SELECT sr / srx AS lam1,
                 (n - sr) / scx AS lam2,
                 sr / n AS pi1
          FROM s{k}
        )"""
        )
        prev = f"p{k}"
    parts.append(
        f"""
        SELECT count(*) AS n_gaps,
               round(max(p.pi1), 6) AS pi_fast,
               round(max(p.lam1), 6) AS lambda_fast,
               round(max(p.lam2), 6) AS lambda_slow,
               round(avg(ln(p.pi1 * p.lam1 * exp(-p.lam1 * g.x)
                 + (1 - p.pi1) * p.lam2 * exp(-p.lam2 * g.x))), 6)
                 AS mean_loglik
        FROM gaps g CROSS JOIN {prev} p"""
    )
    return "WITH" + "".join(parts)


ORACLES = {
    "spatial_clark_evans": _ce_oracle(),
    "em_exponential_mixture": _em_oracle(),
}
