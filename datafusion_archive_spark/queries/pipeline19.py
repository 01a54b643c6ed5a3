"""Pipeline wave 19 (round 5, seventeenth wave): model-evaluation
metrics and multivariate profiling — the scoring half of an ML data
platform (the feature half is waves 14-16).

Score/label convention for the evaluation trio: score =
``o_totalprice``, positive label = ``o_orderpriority = '1-URGENT'``.
A near-0.5 AUC is CORRECT here (the synthetic label is independent of
price) — the tests pin the exact arithmetic, not a lucky separation.

- ``auc_roc`` — exact AUC via the rank identity
  AUC = (R₊ − n₊(n₊+1)/2)/(n₊·n₋) with average ranks for ties: the
  Mann–Whitney formulation that computes exact AUC in one
  value-collapsed window pass — no threshold sweep, no sampling, no
  sort of the raw rows.
- ``cumulative_gains`` — the gains/lift table at decile resolution:
  population share vs captured-positives share ordered by score
  (broadcast-cutpoint deciles, descending), plus per-decile lift.
- ``calibration_curve`` — the reliability diagram: mean predicted
  probability vs observed positive rate per prediction bin, using
  the smoothed nation target-encoding (wave 16) as the predictor.
- ``corr_matrix`` — the pairwise Pearson correlation matrix of the
  four lineitem measures in ONE aggregate pass (all 6 pairs as
  columns, unpivoted to tidy rows).
- ``theil_index`` — the Theil T inequality index of customer spend:
  T = (1/n)·Σ (xᵢ/μ)·ln(xᵢ/μ) — the additively-decomposable
  complement to ``gini_customer_spend``, windowless by construction.

The reference has no rank, correlation, or logarithm machinery
(``src/execution/expression.rs``).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from datafusion_archive_spark.functions.rounding import (
    decimal_sum,
    decimal_sum_sql,
)
from datafusion_archive_spark.operators.quantiles import (
    exact_quantiles_cont,
    lit_cutpoints,
)
from datafusion_archive_spark.operators.util import cached, load_table


def _t(spark, sf_dir, name):
    return load_table(spark, sf_dir, name)


_POS = "o_orderpriority = '1-URGENT'"


def _scored(spark, sf):
    return _t(spark, sf, "orders").select(
        F.col("o_totalprice").alias("score"),
        F.expr(_POS).cast("int").alias("y"),
    )


# ---------------------------------------------------------------------------
# Exact AUC-ROC
# ---------------------------------------------------------------------------


def q_auc_roc(spark, sf):
    """Exact AUC-ROC by the rank identity (tie-aware): collapse to
    distinct scores, average-rank each, AUC = (Σ rank·pos − n₊(n₊+1)/2)
    / (n₊·n₋). One row: n_pos, n_neg, auc.

    Scale: the ranking collapses to the DISTINCT-score dictionary
    (average-rank from a running count) — the raw rows are never
    globally sorted — and since round 8 the running count comes from
    the bucketed global running sums (operators/ranks): a continuous
    score's dictionary (here |distinct totalprice|) grows with the
    corpus, so the old unpartitioned dictionary window was a one-task
    sort. Integer counts regroup exactly across buckets, so the
    distributed form is bit-identical and no quantization trade is
    needed; the plan-shape test still pins agg-before-window."""
    from datafusion_archive_spark.operators.ranks import bucketed_group_rank

    s = _scored(spark, sf)
    per = s.groupBy("score").agg(
        F.count(F.lit(1)).alias("_tl"),
        F.sum("y").alias("_tpl"),
    )
    ranked = bucketed_group_rank(
        per, [], "score", tiebreak=["score"], running=[("_tl", "_ct")]
    ).select(
        F.col("_tl").cast("double").alias("t"),
        F.col("_tpl").cast("double").alias("tp"),
        (
            F.col("_ct").cast("double")
            - (F.col("_tl").cast("double") - 1) / 2
        ).alias("avg_rank"),
    )
    agg = ranked.agg(
        F.sum("tp").alias("np"),
        (F.sum("t") - F.sum("tp")).alias("nn"),
        F.sum(F.col("tp") * F.col("avg_rank")).alias("rp"),
    )
    auc = (F.col("rp") - F.col("np") * (F.col("np") + 1) / 2) / (
        F.col("np") * F.col("nn")
    )
    return agg.select(
        F.col("np").cast("long").alias("n_pos"),
        F.col("nn").cast("long").alias("n_neg"),
        F.round(auc, 6).alias("auc"),
    )


# ---------------------------------------------------------------------------
# Cumulative gains / lift
# ---------------------------------------------------------------------------

_GAIN_PCTS = [round(0.1 * i, 1) for i in range(1, 10)]


def q_cumulative_gains(spark, sf):
    """Gains table: customers bucketed into score deciles (decile 0 =
    highest scores), cumulative population and captured-positive
    shares, and per-decile lift. The targeting-efficiency curve of
    campaign analytics.

    Scale: decile cutpoints come from the histogram-pruned exact
    order-statistic search (operators/quantiles.py — bit-identical to
    ``percentile(x, array(...))`` but with no single-task aggregation
    buffer over the order-level score column); assignment is a
    scan-side fold over the inlined literal array (descending); the
    cumulative window runs over 10 rows."""
    s = _scored(spark, sf)
    cuts = lit_cutpoints(exact_quantiles_cont(s, "score", _GAIN_PCTS))
    binned = s.select(
        "y",
        # count of cutpoints the score does NOT exceed = descending bin
        F.aggregate(
            cuts,
            F.lit(0),
            lambda acc, b: acc
            + F.when(F.col("score") <= b, 1).otherwise(0),
        ).alias("decile"),
    )
    # cached: the 10-row rollup feeds the totals and the window —
    # uncached, the decile binning scan re-runs per branch
    per = cached(
        binned.groupBy("decile").agg(
            F.count(F.lit(1)).cast("double").alias("n"),
            F.sum("y").cast("double").alias("pos"),
        )
    )
    tot = per.agg(F.sum("n").alias("tn"), F.sum("pos").alias("tp"))
    w = Window.orderBy("decile").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    joined = (
        per.join(F.broadcast(tot))
        .withColumn("cum_n", F.sum("n").over(w))
        .withColumn("cum_pos", F.sum("pos").over(w))
    )
    return joined.select(
        "decile",
        F.col("n").cast("long").alias("n"),
        F.col("pos").cast("long").alias("n_pos"),
        F.round(F.col("cum_n") / F.col("tn"), 6).alias("cum_pop_share"),
        F.round(F.col("cum_pos") / F.col("tp"), 6).alias("cum_gain"),
        F.round(
            (F.col("cum_pos") / F.col("tp")) / (F.col("cum_n") / F.col("tn")),
            6,
        ).alias("lift"),
    )


# ---------------------------------------------------------------------------
# Calibration curve
# ---------------------------------------------------------------------------

_CAL_SMOOTH = 20.0
_CAL_BINS = [0.15, 0.18, 0.21, 0.24]


def q_calibration_curve(spark, sf):
    """Reliability diagram for the smoothed nation target-encoding as
    an urgent-order predictor: per prediction bin, mean predicted
    probability vs observed positive rate and count. A calibrated
    model tracks the diagonal.

    Scale: the predictor is the broadcast (nation → encoding) map
    from one rollup; binning is scan-side; the curve is ≤5 cells."""
    o = _t(spark, sf, "orders").select(
        "o_custkey", F.expr(_POS).cast("double").alias("y")
    )
    c = _t(spark, sf, "customer").select("c_custkey", "c_nationkey")
    labeled = o.join(c, o.o_custkey == c.c_custkey).select("c_nationkey", "y")
    # cached: the 25-row encoding rollup feeds the prior and the
    # smoothed map — uncached, the orders-customer join runs again
    enc = cached(
        labeled.groupBy("c_nationkey").agg(
            F.count(F.lit(1)).alias("n"), F.sum("y").alias("ny")
        )
    )
    prior = enc.agg((F.sum("ny") / F.sum("n")).alias("prior"))
    enc = enc.join(F.broadcast(prior)).select(
        "c_nationkey",
        (
            (F.col("ny") + _CAL_SMOOTH * F.col("prior"))
            / (F.col("n") + _CAL_SMOOTH)
        ).alias("p_hat"),
    )
    cuts_sql = ", ".join(str(b) for b in _CAL_BINS)
    scored = labeled.join(F.broadcast(enc), "c_nationkey").select(
        "y",
        "p_hat",
        F.expr(
            f"aggregate(array({cuts_sql}), 0, "
            "(acc, b) -> acc + IF(p_hat > b, 1, 0))"
        ).alias("bin"),
    )
    return scored.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.avg("p_hat"), 6).alias("mean_predicted"),
        F.round(F.avg("y"), 6).alias("observed_rate"),
    )


# ---------------------------------------------------------------------------
# Correlation matrix
# ---------------------------------------------------------------------------

_CORR_COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]


def q_corr_matrix(spark, sf):
    """Pairwise Pearson correlations of the four lineitem measures —
    all 6 upper-triangle pairs in ONE aggregate pass, unpivoted to
    tidy (col1, col2, corr) rows.

    Scale: corr is a map-side-combinable second-moment fold; one scan,
    one reduce, zero joins."""
    li = _t(spark, sf, "lineitem")
    pairs = [
        (a, b)
        for i, a in enumerate(_CORR_COLS)
        for b in _CORR_COLS[i + 1 :]
    ]
    agg = li.agg(
        *[
            F.round(F.corr(a, b), 6).alias(f"{a}__{b}")
            for a, b in pairs
        ]
    )
    stack = ", ".join(f"'{a}', '{b}', {a}__{b}" for a, b in pairs)
    return agg.select(
        F.expr(
            f"stack({len(pairs)}, {stack}) AS (col1, col2, corr)"
        )
    )


# ---------------------------------------------------------------------------
# Theil index
# ---------------------------------------------------------------------------


def q_theil_index(spark, sf):
    """Theil T inequality index of customer spend:
    T = (1/n)·Σ (xᵢ/μ)·ln(xᵢ/μ). Zero for perfect equality, ln(n) at
    maximal concentration; unlike Gini it needs NO ranking — two
    aggregate passes, no window anywhere.

    Scale: spend collapses per customer; the mean broadcasts back;
    the T-sum is a second map-side-combinable aggregate."""
    o = _t(spark, sf, "orders")
    spend = o.groupBy("o_custkey").agg(
        decimal_sum(F.col("o_totalprice")).cast("double").alias("x")
    )
    mu = spend.agg(
        F.avg("x").alias("mu"), F.count(F.lit(1)).alias("n")
    )
    joined = spend.join(F.broadcast(mu))
    r = F.col("x") / F.col("mu")
    return joined.agg(
        F.max("n").alias("n_customers"),
        F.round(F.max("mu"), 2).alias("mean_spend"),
        F.round(F.sum(r * F.log(r)) / F.max("n"), 6).alias("theil_t"),
    )


QUERIES = {
    "auc_roc": q_auc_roc,
    "cumulative_gains": q_cumulative_gains,
    "calibration_curve": q_calibration_curve,
    "corr_matrix": q_corr_matrix,
    "theil_index": q_theil_index,
}

_PCTS_SQL = ", ".join(str(p) for p in _GAIN_PCTS)

ORACLES = {
    "auc_roc": f"""
        WITH s AS (
          SELECT o_totalprice AS score,
                 CASE WHEN {_POS} THEN 1 ELSE 0 END AS y
          FROM orders
        ),
        per AS (
          SELECT score,
                 CAST(count(*) AS DOUBLE) AS t,
                 CAST(sum(y) AS DOUBLE) AS tp
          FROM s GROUP BY score
        ),
        ranked AS (
          SELECT t, tp,
                 sum(t) OVER (ORDER BY score
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   - (t - 1) / 2 AS avg_rank
          FROM per
        ),
        agg AS (
          SELECT sum(tp) AS np, sum(t) - sum(tp) AS nn,
                 sum(tp * avg_rank) AS rp
          FROM ranked
        )
        SELECT CAST(np AS BIGINT) AS n_pos,
               CAST(nn AS BIGINT) AS n_neg,
               round((rp - np * (np + 1) / 2) / (np * nn), 6) AS auc
        FROM agg
    """,
    "cumulative_gains": f"""
        WITH s AS (
          SELECT o_totalprice AS score,
                 CASE WHEN {_POS} THEN 1 ELSE 0 END AS y
          FROM orders
        ),
        cuts AS (
          SELECT quantile_cont(score, [{_PCTS_SQL}]) AS bs FROM s
        ),
        binned AS (
          SELECT s.y,
                 CAST(list_sum(list_transform(c.bs,
                   b -> CASE WHEN s.score <= b THEN 1 ELSE 0 END))
                 AS INTEGER) AS decile
          FROM s CROSS JOIN cuts c
        ),
        per AS (
          SELECT decile,
                 CAST(count(*) AS DOUBLE) AS n,
                 CAST(sum(y) AS DOUBLE) AS pos
          FROM binned GROUP BY decile
        ),
        tot AS (SELECT sum(n) AS tn, sum(pos) AS tp FROM per)
        SELECT decile,
               CAST(n AS BIGINT) AS n,
               CAST(pos AS BIGINT) AS n_pos,
               round(sum(n) OVER w / tn, 6) AS cum_pop_share,
               round(sum(pos) OVER w / tp, 6) AS cum_gain,
               round((sum(pos) OVER w / tp) / (sum(n) OVER w / tn), 6)
                 AS lift
        FROM per CROSS JOIN tot
        WINDOW w AS (ORDER BY decile
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
    "calibration_curve": f"""
        WITH labeled AS (
          SELECT c.c_nationkey,
                 CASE WHEN {_POS} THEN 1.0 ELSE 0.0 END AS y
          FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        ),
        enc0 AS (
          SELECT c_nationkey, count(*) AS n, sum(y) AS ny
          FROM labeled GROUP BY 1
        ),
        pr AS (SELECT sum(ny) / sum(n) AS prior FROM enc0),
        enc AS (
          SELECT c_nationkey,
                 (ny + {_CAL_SMOOTH} * prior) / (n + {_CAL_SMOOTH})
                   AS p_hat
          FROM enc0 CROSS JOIN pr
        ),
        scored AS (
          SELECT l.y, e.p_hat,
                 CAST(list_sum(list_transform(
                   [{", ".join(str(b) for b in _CAL_BINS)}],
                   b -> CASE WHEN e.p_hat > b THEN 1 ELSE 0 END))
                 AS INTEGER) AS bin
          FROM labeled l JOIN enc e USING (c_nationkey)
        )
        SELECT bin, count(*) AS n,
               round(avg(p_hat), 6) AS mean_predicted,
               round(avg(y), 6) AS observed_rate
        FROM scored GROUP BY bin
    """,
    "corr_matrix": "\nUNION ALL\n".join(
        f"""
        SELECT '{a}' AS col1, '{b}' AS col2,
               round(corr({a}, {b}), 6) AS corr
        FROM lineitem
        """
        for i, a in enumerate(_CORR_COLS)
        for b in _CORR_COLS[i + 1 :]
    ),
    "theil_index": f"""
        WITH spend AS (
          SELECT o_custkey,
                 CAST({decimal_sum_sql("o_totalprice")} AS DOUBLE) AS x
          FROM orders GROUP BY o_custkey
        ),
        m AS (SELECT avg(x) AS mu, count(*) AS n FROM spend)
        SELECT CAST(max(n) AS BIGINT) AS n_customers,
               round(max(mu), 2) AS mean_spend,
               round(sum((x / mu) * ln(x / mu)) / max(n), 6) AS theil_t
        FROM spend CROSS JOIN m
    """,
}
