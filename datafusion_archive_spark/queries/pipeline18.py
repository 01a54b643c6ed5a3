"""Pipeline wave 18 (round 5, sixteenth wave): rank tests, survival,
information-theoretic dependence, drift monitoring, sequence mining,
and growth accounting.

- ``mann_whitney_u`` — the Mann–Whitney U rank-sum test (click vs
  purchase event values) with tie-corrected normal approximation:
  the nonparametric two-sample test that complements
  ``ks_test_two_sample``. Built on the value-collapsed average-rank
  formulation — ranks come from a window over DISTINCT values, so
  the sort is dictionary-sized, not row-sized.
- ``survival_curve`` — customer-lifetime survival function S(k):
  the fraction of customers whose first→last order span reaches k
  months, on a 6-month grid. The Kaplan–Meier shape without
  censoring (the corpus window is closed).
- ``mutual_information_lang_source`` — mutual information between
  the ``lang`` and ``source`` columns of the documents table, with
  both marginal entropies: the dependence screen for "is my corpus
  mix confounded?".
- ``psi_price_drift`` — Population Stability Index of the
  order-total distribution, early period (≤ 1997) as reference vs
  late period (≥ 1998): THE standard ML-monitoring drift metric,
  decile bins from the reference period via the broadcast-cutpoint
  fold.
- ``event_trigrams`` — top event-type trigrams over per-user
  timelines (double lag): the sequence-mining upgrade of
  ``events_transitions``.
- ``percent_change_mom`` — month-over-month and year-over-year
  revenue growth over the monthly rollup: the growth-accounting
  staple, windows over the month grid only.

The reference has no ranks, windows, or information-theoretic
functions (``/root/reference/ROADMAP.md``).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from datafusion_archive_spark.functions.rounding import (
    decimal_sum,
    decimal_sum_sql,
)
from datafusion_archive_spark.queries.timeseries import load_events
from datafusion_archive_spark.operators.quantiles import (
    exact_quantiles_cont,
    lit_cutpoints,
)
from datafusion_archive_spark.operators.util import cached, load_table


def _t(spark, sf_dir, name):
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# Mann-Whitney U
# ---------------------------------------------------------------------------

_MW_A, _MW_B = "click", "purchase"


def q_mann_whitney_u(spark, sf):
    """Mann–Whitney U for ``value`` between click and purchase
    events, with tie-corrected z: U₁ = R₁ − n₁(n₁+1)/2,
    z = (U₁ − n₁n₂/2) / √(n₁n₂/12·((n+1) − Στ(t³−t)/(n(n−1)))).

    Scale: the pooled ranking collapses to DISTINCT values first
    (average-rank formula from a running count), and since round 8
    the running count comes from the bucketed global running sums
    (operators/ranks) — a continuous measurement column's value
    dictionary grows with the corpus, so the old unpartitioned
    dictionary window was a one-task sort (the weighted-quartiles
    dictionary-growth argument). Integer counts regroup exactly, so
    no quantization trade is needed; everything downstream is
    broadcast scalars."""
    from datafusion_archive_spark.operators.ranks import bucketed_group_rank

    e = load_events(spark, sf).filter(
        F.col("event_type").isin(_MW_A, _MW_B)
    )
    per_val = e.groupBy("value").agg(
        F.count(F.lit(1)).alias("_tl"),
        F.sum(
            F.when(F.col("event_type") == _MW_A, 1).otherwise(0)
        ).alias("_t1l"),
    )
    # cum count in exact integers, then the same double arithmetic the
    # window form evaluated (sums of integer-valued doubles are exact)
    ranked = bucketed_group_rank(
        per_val, [], "value", tiebreak=["value"], running=[("_tl", "_ct")]
    ).select(
        F.col("_tl").cast("double").alias("t"),
        F.col("_t1l").cast("double").alias("t1"),
        (
            F.col("_ct").cast("double")
            - (F.col("_tl").cast("double") - 1) / 2
        ).alias("avg_rank"),
    )
    agg = ranked.agg(
        F.sum("t1").alias("n1"),
        (F.sum("t") - F.sum("t1")).alias("n2"),
        F.sum("t").alias("n"),
        F.sum(F.col("t1") * F.col("avg_rank")).alias("r1"),
        F.sum(F.col("t") * F.col("t") * F.col("t") - F.col("t")).alias(
            "tie_sum"
        ),
    )
    u1 = F.col("r1") - F.col("n1") * (F.col("n1") + 1) / 2
    mu = F.col("n1") * F.col("n2") / 2
    sigma2 = (
        F.col("n1")
        * F.col("n2")
        / 12.0
        * (
            (F.col("n") + 1)
            - F.col("tie_sum") / (F.col("n") * (F.col("n") - 1))
        )
    )
    return agg.select(
        F.col("n1").cast("long").alias("n1"),
        F.col("n2").cast("long").alias("n2"),
        F.round(u1, 2).alias("u1"),
        F.round((u1 - mu) / F.sqrt(sigma2), 6).alias("z"),
    )


# ---------------------------------------------------------------------------
# Survival curve
# ---------------------------------------------------------------------------

_SURV_MAX_MONTHS = 72
_SURV_STEP = 6


def q_survival_curve(spark, sf):
    """Customer-lifetime survival: S(k) = fraction of customers whose
    first→last order span is at least k months (30-day months), on a
    6-month grid to k = 72. The no-censoring Kaplan–Meier shape.

    Scale: one Exchange collapses orders to (first, last) per
    customer; the k-grid is generated and broadcast; each S(k) is a
    conditional count over the customer rollup."""
    o = _t(spark, sf, "orders")
    life = o.groupBy("o_custkey").agg(
        (
            F.datediff(
                F.max(F.to_date("o_orderdate")),
                F.min(F.to_date("o_orderdate")),
            )
            / 30
        ).alias("months")
    )
    ks = spark.range(0, _SURV_MAX_MONTHS + 1, _SURV_STEP).select(
        F.col("id").cast("int").alias("k")
    )
    tot = life.agg(F.count(F.lit(1)).alias("n_customers"))
    return (
        life.crossJoin(F.broadcast(ks))
        .groupBy("k")
        .agg(
            F.sum(
                F.when(F.col("months") >= F.col("k"), 1).otherwise(0)
            ).alias("n_surviving")
        )
        .join(F.broadcast(tot))
        .select(
            "k",
            "n_surviving",
            F.round(
                F.col("n_surviving") / F.col("n_customers"), 6
            ).alias("survival"),
        )
    )


# ---------------------------------------------------------------------------
# Mutual information lang x source
# ---------------------------------------------------------------------------


def q_mutual_information_lang_source(spark, sf):
    """Mutual information (nats) between document ``lang`` and
    ``source``, with the marginal entropies: MI near 0 means the
    corpus mix is unconfounded; MI near min(H) means one column
    predicts the other. One row: n_docs, H(lang), H(source), MI.

    Scale: one (lang, source) rollup (|langs|×|sources| cells);
    marginals and total derive from the cells — the corpus is
    scanned once."""
    d = _t(spark, sf, "documents")
    # cached: the contingency cells feed both marginals, the total,
    # and the join — uncached, the corpus scan re-runs per branch
    cells = cached(
        d.groupBy("lang", "source").agg(
            F.count(F.lit(1)).cast("double").alias("n")
        )
    )
    lm = cells.groupBy("lang").agg(F.sum("n").alias("nl"))
    sm = cells.groupBy("source").agg(F.sum("n").alias("ns"))
    tot = cells.agg(F.sum("n").alias("nt"))
    joined = (
        cells.join(F.broadcast(lm), "lang")
        .join(F.broadcast(sm), "source")
        .join(F.broadcast(tot))
    )
    p = F.col("n") / F.col("nt")
    pl = F.col("nl") / F.col("nt")
    ps = F.col("ns") / F.col("nt")
    return joined.agg(
        F.max("nt").cast("long").alias("n_docs"),
        F.round(
            -F.sum(
                (F.col("nl") / F.col("nt")) * F.log(F.col("nl") / F.col("nt"))
                * F.col("n") / F.col("nl")
            ),
            6,
        ).alias("h_lang"),
        F.round(
            -F.sum(
                (F.col("ns") / F.col("nt")) * F.log(F.col("ns") / F.col("nt"))
                * F.col("n") / F.col("ns")
            ),
            6,
        ).alias("h_source"),
        F.round(F.sum(p * F.log(p / (pl * ps))), 6).alias("mi_nats"),
    )


# ---------------------------------------------------------------------------
# PSI drift
# ---------------------------------------------------------------------------

_PSI_SPLIT = "1998-01-01"
_PSI_PCTS = [round(0.1 * i, 1) for i in range(1, 10)]


def q_psi_price_drift(spark, sf):
    """Population Stability Index of the order-total distribution:
    decile bins fitted on the reference period (orders before 1998)
    via the broadcast-cutpoint fold, compared against the current
    period (1998+). Per-bin shares and PSI contributions
    (p − q)·ln(p/q); total PSI > 0.2 is the conventional
    "investigate" threshold.

    Scale: cutpoints come from the histogram-pruned exact
    order-statistic search (operators/quantiles.py — bit-identical to
    ``percentile(x, array(...))`` but with no single-task aggregation
    buffer; the reference partition is ORDER-level, so at 100 TB the
    old one-pass percentile would funnel 10^10 values through one
    task) over a pruned 1-column scan of the reference slice; bin
    assignment is a scan-side fold over the inlined literal cutpoint
    array; the rollup is 10 cells per period."""
    o = _t(spark, sf, "orders").select(
        "o_totalprice",
        (F.to_date("o_orderdate") < F.lit(_PSI_SPLIT).cast("date")).alias(
            "is_ref"
        ),
    )
    cuts = lit_cutpoints(
        exact_quantiles_cont(o.filter("is_ref"), "o_totalprice", _PSI_PCTS)
    )
    binned = o.select(
        "is_ref",
        F.aggregate(
            cuts,
            F.lit(0),
            lambda acc, b: acc
            + F.when(F.col("o_totalprice") > b, 1).otherwise(0),
        ).alias("bin"),
    )
    # cached: the 10-cell rollup feeds the totals and the final
    # select — uncached, the binning scan re-runs per branch
    cells = cached(
        binned.groupBy("bin").agg(
            F.sum(F.when(F.col("is_ref"), 1).otherwise(0)).cast("double").alias(
                "n_ref"
            ),
            F.sum(F.when(F.col("is_ref"), 0).otherwise(1)).cast("double").alias(
                "n_cur"
            ),
        )
    )
    tot = cells.agg(
        F.sum("n_ref").alias("tr"), F.sum("n_cur").alias("tc")
    )
    p = F.col("n_ref") / F.col("tr")
    q = F.col("n_cur") / F.col("tc")
    return cells.join(F.broadcast(tot)).select(
        "bin",
        F.col("n_ref").cast("long").alias("n_ref"),
        F.col("n_cur").cast("long").alias("n_cur"),
        F.round(p, 6).alias("ref_share"),
        F.round(q, 6).alias("cur_share"),
        F.round((p - q) * F.log(p / q), 6).alias("psi_part"),
    )


# ---------------------------------------------------------------------------
# Event trigrams
# ---------------------------------------------------------------------------

_TRIGRAM_TOPK = 20


def q_event_trigrams(spark, sf):
    """Top 20 event-type trigrams across per-user timelines (ties
    broken lexicographically): the order-3 sequence-mining pass over
    user behavior.

    Scale: one Exchange on user_id shared by both lag windows; the
    trigram rollup is |types|³ ≤ 125 cells; TakeOrdered for the
    top-k."""
    e = load_events(spark, sf).select("user_id", "ts", "event_id", "event_type")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    tri = (
        e.withColumn("t2", F.lag("event_type", 1).over(w))
        .withColumn("t3", F.lag("event_type", 2).over(w))
        .filter(F.col("t3").isNotNull())
    )
    return (
        tri.groupBy(
            F.col("t3").alias("first"),
            F.col("t2").alias("second"),
            F.col("event_type").alias("third"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "first", "second", "third")
        .limit(_TRIGRAM_TOPK)
    )


# ---------------------------------------------------------------------------
# MoM / YoY growth
# ---------------------------------------------------------------------------


def q_percent_change_mom(spark, sf):
    """Monthly revenue with month-over-month and year-over-year
    percent change: lag(1) and lag(12) over the month grid. NULL
    growth for months without a comparison point.

    Scale: the fact scan collapses to the month rollup (one
    Exchange); both lags share one ordered window over ~80 rows."""
    o = _t(spark, sf, "orders")
    monthly = o.groupBy(
        F.date_format(F.to_date("o_orderdate"), "yyyy-MM").alias("month")
    ).agg(decimal_sum(F.col("o_totalprice")).cast("double").alias("rev"))
    w = Window.orderBy("month")
    prev = F.lag("rev", 1).over(w)
    yago = F.lag("rev", 12).over(w)
    return monthly.select(
        "month",
        F.round("rev", 2).alias("rev"),
        F.round((F.col("rev") - prev) / prev * 100, 4).alias("mom_pct"),
        F.round((F.col("rev") - yago) / yago * 100, 4).alias("yoy_pct"),
    )


QUERIES = {
    "mann_whitney_u": q_mann_whitney_u,
    "survival_curve": q_survival_curve,
    "mutual_information_lang_source": q_mutual_information_lang_source,
    "psi_price_drift": q_psi_price_drift,
    "event_trigrams": q_event_trigrams,
    "percent_change_mom": q_percent_change_mom,
}

ORACLES = {
    "mann_whitney_u": f"""
        WITH pooled AS (
          SELECT value, event_type FROM events
          WHERE event_type IN ('{_MW_A}', '{_MW_B}')
        ),
        per_val AS (
          SELECT value,
                 CAST(count(*) AS DOUBLE) AS t,
                 CAST(sum(CASE WHEN event_type = '{_MW_A}'
                               THEN 1 ELSE 0 END) AS DOUBLE) AS t1
          FROM pooled GROUP BY value
        ),
        ranked AS (
          SELECT t, t1,
                 sum(t) OVER (ORDER BY value
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   - (t - 1) / 2 AS avg_rank
          FROM per_val
        ),
        agg AS (
          SELECT sum(t1) AS n1,
                 sum(t) - sum(t1) AS n2,
                 sum(t) AS n,
                 sum(t1 * avg_rank) AS r1,
                 sum(t * t * t - t) AS tie_sum
          FROM ranked
        )
        SELECT CAST(n1 AS BIGINT) AS n1,
               CAST(n2 AS BIGINT) AS n2,
               round(r1 - n1 * (n1 + 1) / 2, 2) AS u1,
               round((r1 - n1 * (n1 + 1) / 2 - n1 * n2 / 2)
                     / sqrt(n1 * n2 / 12.0
                            * ((n + 1) - tie_sum / (n * (n - 1)))), 6)
                 AS z
        FROM agg
    """,
    "survival_curve": f"""
        WITH life AS (
          SELECT o_custkey,
                 date_diff('day', min(CAST(o_orderdate AS DATE)),
                           max(CAST(o_orderdate AS DATE))) / 30.0
                   AS months
          FROM orders GROUP BY o_custkey
        ),
        ks AS (
          SELECT CAST(range AS INTEGER) AS k
          FROM range(0, {_SURV_MAX_MONTHS + 1}, {_SURV_STEP})
        ),
        tot AS (SELECT count(*) AS n_customers FROM life)
        SELECT k,
               CAST(sum(CASE WHEN months >= k THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_surviving,
               round(sum(CASE WHEN months >= k THEN 1 ELSE 0 END)
                     / (SELECT n_customers FROM tot), 6) AS survival
        FROM life CROSS JOIN ks
        GROUP BY k
    """,
    "mutual_information_lang_source": """
        WITH cells AS (
          SELECT lang, source, CAST(count(*) AS DOUBLE) AS n
          FROM documents GROUP BY 1, 2
        ),
        lm AS (SELECT lang, sum(n) AS nl FROM cells GROUP BY 1),
        sm AS (SELECT source, sum(n) AS ns FROM cells GROUP BY 1),
        tot AS (SELECT sum(n) AS nt FROM cells)
        SELECT CAST(max(nt) AS BIGINT) AS n_docs,
               round(-sum((nl / nt) * ln(nl / nt) * n / nl), 6) AS h_lang,
               round(-sum((ns / nt) * ln(ns / nt) * n / ns), 6)
                 AS h_source,
               round(sum((n / nt)
                     * ln((n / nt) / ((nl / nt) * (ns / nt)))), 6)
                 AS mi_nats
        FROM cells
        JOIN lm USING (lang)
        JOIN sm USING (source)
        CROSS JOIN tot
    """,
    "psi_price_drift": f"""
        WITH o AS (
          SELECT o_totalprice,
                 CAST(o_orderdate AS DATE) < DATE '{_PSI_SPLIT}' AS is_ref
          FROM orders
        ),
        cuts AS (
          SELECT quantile_cont(o_totalprice,
                   [{", ".join(str(p) for p in _PSI_PCTS)}]) AS bs
          FROM o WHERE is_ref
        ),
        binned AS (
          SELECT o.is_ref,
                 CAST(list_sum(list_transform(c.bs,
                   b -> CASE WHEN o.o_totalprice > b THEN 1 ELSE 0 END))
                 AS INTEGER) AS bin
          FROM o CROSS JOIN cuts c
        ),
        cells AS (
          SELECT bin,
                 CAST(sum(CASE WHEN is_ref THEN 1 ELSE 0 END)
                      AS DOUBLE) AS n_ref,
                 CAST(sum(CASE WHEN is_ref THEN 0 ELSE 1 END)
                      AS DOUBLE) AS n_cur
          FROM binned GROUP BY bin
        ),
        tot AS (SELECT sum(n_ref) AS tr, sum(n_cur) AS tc FROM cells)
        SELECT bin,
               CAST(n_ref AS BIGINT) AS n_ref,
               CAST(n_cur AS BIGINT) AS n_cur,
               round(n_ref / tr, 6) AS ref_share,
               round(n_cur / tc, 6) AS cur_share,
               round((n_ref / tr - n_cur / tc)
                     * ln((n_ref / tr) / (n_cur / tc)), 6) AS psi_part
        FROM cells CROSS JOIN tot
    """,
    "event_trigrams": f"""
        WITH seq AS (
          SELECT event_type,
                 lag(event_type, 1) OVER w AS t2,
                 lag(event_type, 2) OVER w AS t3
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        )
        SELECT t3 AS "first", t2 AS "second", event_type AS "third",
               count(*) AS n
        FROM seq WHERE t3 IS NOT NULL
        GROUP BY 1, 2, 3
        ORDER BY n DESC, 1, 2, 3
        LIMIT {_TRIGRAM_TOPK}
    """,
    "percent_change_mom": f"""
        WITH monthly AS (
          SELECT strftime(CAST(o_orderdate AS DATE), '%Y-%m') AS month,
                 CAST({decimal_sum_sql("o_totalprice")} AS DOUBLE) AS rev
          FROM orders GROUP BY 1
        )
        SELECT month,
               round(rev, 2) AS rev,
               round((rev - lag(rev, 1) OVER (ORDER BY month))
                     / lag(rev, 1) OVER (ORDER BY month) * 100, 4)
                 AS mom_pct,
               round((rev - lag(rev, 12) OVER (ORDER BY month))
                     / lag(rev, 12) OVER (ORDER BY month) * 100, 4)
                 AS yoy_pct
        FROM monthly
    """,
}
