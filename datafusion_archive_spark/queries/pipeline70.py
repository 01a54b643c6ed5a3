"""Pipeline wave 70 (round 5, sixty-eighth wave): decision-stump
induction — the split-search kernel under every tree ensemble.

``decision_stump_gini`` — train a depth-1 decision tree predicting
urgent orders from ln(order value): bin the feature to _BINS
equi-width cells (one fact-table aggregate), then evaluate EVERY bin
boundary as a split with prefix sums (left/right counts and
positives are cumulative sums over the tiny bin table) and pick the
threshold with the best Gini impurity decrease (ties to the lower
threshold). This is how distributed tree learners (approximate
split finding) actually work: the fact scan builds histograms once,
the split search runs on the histogram. Output: the chosen
threshold, parent/left/right urgent rates, sizes, and the impurity
gain.

The reference has no aggregates beyond MIN/MAX
(``/root/reference/ROADMAP.md``).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

_BINS = 50


def q_decision_stump_gini(spark, sf):
    """Best Gini split of urgent ~ ln(totalprice)."""
    orders = spark.read.parquet(f"{sf}/orders.parquet").select(
        F.log(F.col("o_totalprice").cast("double")).alias("x"),
        (F.col("o_orderpriority") == "1-URGENT")
        .cast("long")
        .alias("y"),
    )
    w_all = Window.partitionBy()
    rng = orders.select(
        "x",
        "y",
        F.min("x").over(w_all).alias("lo"),
        F.max("x").over(w_all).alias("hi"),
    )
    bins = rng.select(
        F.least(
            F.lit(_BINS - 1),
            F.floor(
                (F.col("x") - F.col("lo"))
                / (F.col("hi") - F.col("lo"))
                * _BINS
            ),
        ).alias("b"),
        "y",
        "lo",
        "hi",
    ).groupBy("b", "lo", "hi").agg(
        F.count(F.lit(1)).alias("n"), F.sum("y").alias("pos")
    )
    w_ord = Window.orderBy("b").rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = bins.select(
        "b",
        "lo",
        "hi",
        F.sum("n").over(w_ord).alias("nl"),
        F.sum("pos").over(w_ord).alias("pl"),
        F.sum("n").over(w_all).alias("nt"),
        F.sum("pos").over(w_all).alias("pt"),
    ).filter(F.col("nl") < F.col("nt"))
    nl = F.col("nl").cast("double")
    nr = (F.col("nt") - F.col("nl")).cast("double")
    pl = F.col("pl").cast("double") / nl
    pr = (F.col("pt") - F.col("pl")).cast("double") / nr
    pp = F.col("pt").cast("double") / F.col("nt")
    gini_parent = 2.0 * pp * (1.0 - pp)
    gain = gini_parent - (
        nl / F.col("nt") * 2.0 * pl * (1.0 - pl)
        + nr / F.col("nt") * 2.0 * pr * (1.0 - pr)
    )
    scored = cum.select(
        "b",
        (
            F.col("lo")
            + (F.col("hi") - F.col("lo"))
            * (F.col("b") + 1).cast("double")
            / _BINS
        ).alias("threshold"),
        F.col("nl").alias("n_left"),
        (F.col("nt") - F.col("nl")).alias("n_right"),
        F.round(pl, 6).alias("rate_left"),
        F.round(pr, 6).alias("rate_right"),
        F.round(pp, 6).alias("rate_parent"),
        F.round(gain, 8).alias("gini_gain"),
    )
    return (
        scored.orderBy(F.desc("gini_gain"), "b")
        .limit(1)
        .select(
            F.round("threshold", 6).alias("threshold"),
            "n_left",
            "n_right",
            "rate_left",
            "rate_right",
            "rate_parent",
            "gini_gain",
        )
    )


QUERIES = {"decision_stump_gini": q_decision_stump_gini}

ORACLES = {
    "decision_stump_gini": f"""
        WITH obs AS (
          SELECT ln(CAST(o_totalprice AS DOUBLE)) AS x,
                 CASE WHEN o_orderpriority = '1-URGENT'
                      THEN 1 ELSE 0 END AS y
          FROM orders
        ),
        rng AS (SELECT min(x) AS lo, max(x) AS hi FROM obs),
        bins AS (
          SELECT LEAST({_BINS - 1},
                   CAST(floor((o.x - r.lo) / (r.hi - r.lo)
                        * {_BINS}) AS BIGINT)) AS b,
                 r.lo, r.hi,
                 count(*) AS n, sum(o.y) AS pos
          FROM obs o CROSS JOIN rng r
          GROUP BY 1, 2, 3
        ),
        cum AS (
          SELECT b, lo, hi,
                 sum(n) OVER (ORDER BY b
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS nl,
                 sum(pos) OVER (ORDER BY b
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS pl,
                 sum(n) OVER () AS nt,
                 sum(pos) OVER () AS pt
          FROM bins
        ),
        scored AS (
          SELECT b,
                 lo + (hi - lo) * (b + 1) / {_BINS}.0 AS threshold,
                 nl AS n_left, nt - nl AS n_right,
                 CAST(pl AS DOUBLE) / nl AS pl_,
                 CAST(pt - pl AS DOUBLE) / (nt - nl) AS pr_,
                 CAST(pt AS DOUBLE) / nt AS pp_,
                 2.0 * (CAST(pt AS DOUBLE) / nt)
                   * (1.0 - CAST(pt AS DOUBLE) / nt)
                 - (CAST(nl AS DOUBLE) / nt * 2.0
                     * (CAST(pl AS DOUBLE) / nl)
                     * (1.0 - CAST(pl AS DOUBLE) / nl)
                   + CAST(nt - nl AS DOUBLE) / nt * 2.0
                     * (CAST(pt - pl AS DOUBLE) / (nt - nl))
                     * (1.0 - CAST(pt - pl AS DOUBLE) / (nt - nl)))
                   AS gain
          FROM cum WHERE nl < nt
        )
        SELECT round(threshold, 6) AS threshold,
               CAST(n_left AS BIGINT) AS n_left,
               CAST(n_right AS BIGINT) AS n_right,
               round(pl_, 6) AS rate_left,
               round(pr_, 6) AS rate_right,
               round(pp_, 6) AS rate_parent,
               round(gain, 8) AS gini_gain
        FROM scored
        ORDER BY round(gain, 8) DESC, b
        LIMIT 1
    """,
}
