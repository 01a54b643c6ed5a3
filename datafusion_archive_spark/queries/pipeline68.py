"""Pipeline wave 68 (round 5, sixty-sixth wave): spatial point-pattern
statistics and EM mixture fitting.

- ``spatial_clark_evans`` — complete-spatial-randomness tests on the
  portable hash-fraction customer points: the Clark–Evans ratio
  R = d̄_NN / (1/(2√λ)) with its z statistic (R < 1 clustered,
  R > 1 dispersed), plus Ripley's K̂(r)/(πr²) at three radii (the
  multi-scale CSR profile). Exact nearest neighbors come from the
  full pair join here (quadratic in the ~1.5k CUSTOMER dim — at
  corpus scale the certified cell-bucket join from the geo/DBSCAN
  waves replaces it, same semantics).
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
_EM_ITERS = 3


def q_spatial_clark_evans(spark, sf):
    """Clark–Evans CSR test + Ripley K ratios at 3 radii."""
    pts = spark.read.parquet(f"{sf}/customer.parquet").select(
        F.col("c_custkey").alias("id"),
        *_synth_point(F.col("c_custkey"), "p"),
    )
    a = pts.select(
        F.col("id").alias("ida"),
        F.col("p_lat").alias("xa"),
        F.col("p_lon").alias("ya"),
    )
    b = pts.select(
        F.col("id").alias("idb"),
        F.col("p_lat").alias("xb"),
        F.col("p_lon").alias("yb"),
    )
    dx = F.col("xa") - F.col("xb")
    dy = F.col("ya") - F.col("yb")
    # deliberately NOT cached: the pair table is data-heavy but
    # compute-light (one subtract/sqrt per row), so re-running the
    # broadcast join for the second consumer beats materializing the
    # ~4M-row table (measured warm at sf0.01: ~3.9 s uncached vs
    # slower with the cache — the same trade outliers_mad documents)
    pairs = (
        a.join(b, F.col("ida") != F.col("idb"))
        .select(
            "ida", F.sqrt(dx * dx + dy * dy).alias("dist")
        )
    )
    nn = pairs.groupBy("ida").agg(F.min("dist").alias("nnd"))
    kstats = pairs.agg(
        *[
            F.sum((F.col("dist") < r).cast("long")).alias(
                f"k{int(r * 100)}"
            )
            for r in _RADII
        ],
        F.count(F.lit(1)).alias("n_ordered_pairs"),
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
    for r in _RADII:
        k_hat = (
            F.lit(_AREA)
            * F.col(f"k{int(r * 100)}").cast("double")
            / (n * (n - 1.0))
        )
        k_cols.append(
            F.round(k_hat / (math.pi * r * r), 6).alias(
                f"k_ratio_{int(r * 100)}"
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
    ksel = ", ".join(
        f"CAST(sum(CASE WHEN dist < {r} THEN 1 ELSE 0 END) AS BIGINT)"
        f" AS k{int(r * 100)}"
        for r in _RADII
    )
    kout = ", ".join(
        f"round(({_AREA!r} * k.k{int(r * 100)}"
        f" / (CAST(c.n AS DOUBLE) * (c.n - 1)))"
        f" / ({math.pi!r} * {r!r} * {r!r}), 6)"
        f" AS k_ratio_{int(r * 100)}"
        for r in _RADII
    )
    return f"""
        WITH pts AS MATERIALIZED (
          SELECT c_custkey AS id, {lat} AS x, {lon} AS y
          FROM customer
        ),
        pairs AS MATERIALIZED (
          SELECT a.id AS ida,
                 sqrt((a.x - b.x) ** 2 + (a.y - b.y) ** 2) AS dist
          FROM pts a JOIN pts b ON a.id != b.id
        ),
        nn AS (
          SELECT ida, min(dist) AS nnd FROM pairs GROUP BY 1
        ),
        ce AS (
          SELECT count(*) AS n, avg(nnd) AS dbar FROM nn
        ),
        ks AS (SELECT {ksel} FROM pairs)
        SELECT c.n AS n_points,
               round(c.dbar / (1.0 / (2.0
                 * sqrt(CAST(c.n AS DOUBLE) / {_AREA!r}))), 6)
                 AS r_clark_evans,
               round((c.dbar - 1.0 / (2.0
                 * sqrt(CAST(c.n AS DOUBLE) / {_AREA!r})))
                 / (0.26136 / sqrt(CAST(c.n AS DOUBLE)
                   * (CAST(c.n AS DOUBLE) / {_AREA!r}))), 6) AS z_ce,
               {kout}
        FROM ce c CROSS JOIN ks k
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
