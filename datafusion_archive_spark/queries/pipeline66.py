"""Pipeline wave 66 (round 5, sixty-fourth wave): density estimation
and tail-sensitive two-sample testing.

- ``kde_gaussian_grid`` — Gaussian kernel density of order values on
  a fixed _GRID_N-point grid with Silverman's rule-of-thumb
  bandwidth h = 1.06·σ·n^{-1/5}: one grid × data cross join (grid
  broadcast) feeding an exp aggregate — the standard distributed KDE
  shape, reported at the 5 grid points bracketing the mode plus
  overall integral ≈ 1 (Riemann check in tests).
- ``anderson_darling_2sample`` — the two-sample Anderson–Darling
  statistic A² = (1/(nm))·Σᵢ (Mᵢ·N − n·i)²/(i·(N−i)) over the pooled
  ordering (ties broken by sample id — deterministic in both
  engines), comparing 1997 vs 1998 order values. AD weights the
  TAILS where KS (``ks_test_two_sample``) is blind — the drift pair
  to the certified KS/Wasserstein screens.

The reference has no window functions (``/root/reference/ROADMAP.md``).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

_GRID_N = 50
_TOP = 5


def q_kde_gaussian_grid(spark, sf):
    """Top-5 density grid points of the order-value KDE."""
    vals = spark.read.parquet(f"{sf}/orders.parquet").select(
        F.col("o_totalprice").cast("double").alias("v")
    )
    w_all = Window.partitionBy()
    stats = vals.agg(
        F.count(F.lit(1)).alias("n"),
        F.stddev_samp("v").alias("sd"),
        F.min("v").alias("lo"),
        F.max("v").alias("hi"),
    )
    grid = spark.range(_GRID_N).select(F.col("id").alias("g"))
    pts = grid.crossJoin(F.broadcast(stats)).select(
        "g",
        "n",
        "sd",
        (
            F.col("lo")
            + (F.col("hi") - F.col("lo"))
            * F.col("g")
            / (_GRID_N - 1)
        ).alias("x"),
        (
            1.06
            * F.col("sd")
            * F.pow(F.col("n").cast("double"), F.lit(-0.2))
        ).alias("h"),
    )
    dens = (
        vals.crossJoin(F.broadcast(pts))
        .groupBy("g", "x", "h", "n")
        .agg(
            F.sum(
                F.exp(
                    F.lit(-0.5)
                    * F.pow((F.col("v") - F.col("x")) / F.col("h"),
                            F.lit(2.0))
                )
            ).alias("ksum")
        )
        .select(
            "g",
            F.round("x", 2).alias("x"),
            F.round(
                F.col("ksum")
                / (
                    F.col("n")
                    * F.col("h")
                    * F.lit(2.5066282746310002)  # sqrt(2*pi)
                )
                * 1.0e5,
                6,
            ).alias("density_e5"),
        )
    )
    return dens.orderBy(F.desc("density_e5"), "g").limit(_TOP)


def q_anderson_darling_2sample(spark, sf):
    """Two-sample AD statistic, 1997 vs 1998 order values.

    Scale (round 8): the old plan chained THREE unpartitioned windows
    over the raw 1997/98 order rows (row_number, a cumsum over it,
    global totals) — fact-scale one-task sorts. Rank and cumulative
    1997-count now come from one bucketed pass (operators/ranks) and
    the totals broadcast from a plain aggregate. The (v, yr) ordering
    is not total, but rows tied on it share is1 (yr determines it),
    so the {(i, m_i)} pairs — and therefore the summed statistic —
    are assignment-invariant, exactly as in the old plan."""
    from datafusion_archive_spark.operators.ranks import bucketed_group_rank

    vals = (
        spark.read.parquet(f"{sf}/orders.parquet")
        .select(
            F.col("o_totalprice").cast("double").alias("v"),
            F.year("o_orderdate").alias("yr"),
        )
        .filter(F.col("yr").isin(1997, 1998))
    )
    base = vals.select(
        "v", "yr", (F.col("yr") == 1997).cast("long").alias("is1")
    )
    tots = base.agg(
        F.sum("is1").alias("n1"), F.count(F.lit(1)).alias("nn")
    )
    ranked = (
        bucketed_group_rank(
            base, [], "v", tiebreak=["yr"], rank_col="i",
            running=[("is1", "m_i")],
        )
        .join(F.broadcast(tots))
        .select("i", "m_i", "n1", "nn")
    )
    term = (
        F.pow(
            F.col("m_i") * F.col("nn") - F.col("n1") * F.col("i"),
            F.lit(2.0),
        )
        / (F.col("i").cast("double") * (F.col("nn") - F.col("i")))
    )
    return (
        ranked.filter(F.col("i") < F.col("nn"))
        .agg(
            F.first("n1").alias("n_1997"),
            (F.first("nn") - F.first("n1")).alias("n_1998"),
            F.round(
                F.sum(term)
                / (
                    F.first("n1").cast("double")
                    * (F.first("nn") - F.first("n1"))
                ),
                6,
            ).alias("a2_stat"),
        )
    )


QUERIES = {
    "kde_gaussian_grid": q_kde_gaussian_grid,
    "anderson_darling_2sample": q_anderson_darling_2sample,
}

ORACLES = {
    "kde_gaussian_grid": f"""
        WITH vals AS (
          SELECT CAST(o_totalprice AS DOUBLE) AS v FROM orders
        ),
        stats AS (
          SELECT count(*) AS n, stddev_samp(v) AS sd,
                 min(v) AS lo, max(v) AS hi
          FROM vals
        ),
        grid AS (
          SELECT unnest(range(0, {_GRID_N})) AS g
        ),
        pts AS (
          SELECT g, s.n, s.sd,
                 s.lo + (s.hi - s.lo) * g / ({_GRID_N} - 1) AS x,
                 1.06 * s.sd * CAST(s.n AS DOUBLE) ** (-0.2) AS h
          FROM grid CROSS JOIN stats s
        ),
        dens AS (
          SELECT p.g, p.x,
                 sum(exp(-0.5 * ((v.v - p.x) / p.h) ** 2))
                   / (p.n * p.h * 2.5066282746310002) * 1.0e5
                   AS density_e5
          FROM vals v CROSS JOIN pts p
          GROUP BY p.g, p.x, p.h, p.n
        )
        SELECT CAST(g AS BIGINT) AS g,
               round(x, 2) AS x,
               round(density_e5, 6) AS density_e5
        FROM dens
        ORDER BY density_e5 DESC, g
        LIMIT {_TOP}
    """,
    "anderson_darling_2sample": """
        WITH vals AS (
          SELECT CAST(o_totalprice AS DOUBLE) AS v,
                 EXTRACT(year FROM o_orderdate) AS yr
          FROM orders
          WHERE EXTRACT(year FROM o_orderdate) IN (1997, 1998)
        ),
        ranked AS (
          SELECT CASE WHEN yr = 1997 THEN 1 ELSE 0 END AS is1,
                 row_number() OVER (ORDER BY v, yr) AS i
          FROM vals
        ),
        cum AS (
          SELECT i,
                 sum(is1) OVER (ORDER BY i
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS m_i,
                 sum(is1) OVER () AS n1,
                 count(*) OVER () AS nn
          FROM ranked
        )
        SELECT CAST(max(n1) AS BIGINT) AS n_1997,
               CAST(max(nn) - max(n1) AS BIGINT) AS n_1998,
               round(sum((m_i * nn - n1 * i) ** 2
                 / (CAST(i AS DOUBLE) * (nn - i)))
                 / (CAST(max(n1) AS DOUBLE) * (max(nn) - max(n1))),
                 6) AS a2_stat
        FROM cum
        WHERE i < nn
    """,
}
