"""Pipeline wave 14 (round 5, twelfth wave): positional phrase
search, dense histograms, inequality and burstiness metrics.

- ``phrase_search_inverted`` — exact phrase matching through a
  positional posting join: tokenize with positions, join the two
  terms' postings on (doc, adjacent position). The inverted-index
  primitive under quoted-query retrieval; positions shuffle as
  (token, doc, pos) triples — document text never moves.
- ``histogram_dense`` — fixed-width histogram with EMPTY BINS
  materialized via a generated bin dimension LEFT JOIN'd to counts:
  the densification pattern every charting/export pipeline needs
  (a missing bucket is data, not absence of a row).
- ``gini_customer_spend`` — Gini coefficient of customer revenue
  concentration by the rank formula G = 2·Σ(i·xᵢ)/(n·Σx) − (n+1)/n
  over the spend-sorted customer list: the whale-detection /
  inequality metric. Spend collapses per customer (exact decimals)
  before the single bounded rank window.
- ``interarrival_stats`` — per-user inter-event gap count, mean,
  and coefficient of variation (burstiness: CV ≫ 1 bursty, ≈ 1
  Poisson): lag over each user's timeline, exact integer µs.

The reference has no window functions, arrays, or positional text
operations (``/root/reference/ROADMAP.md``).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from datafusion_archive_spark.functions import text as TX
from datafusion_archive_spark.functions.rounding import (
    decimal_sum,
    decimal_sum_sql,
)
from datafusion_archive_spark.queries.llm import _WORDS
from datafusion_archive_spark.queries.timeseries import load_events
from datafusion_archive_spark.operators.util import load_table


def _t(spark, sf_dir, name):
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# Positional phrase search
# ---------------------------------------------------------------------------

_PHRASE = ("window", "join")


def q_phrase_search_inverted(spark, sf):
    """Documents containing the exact phrase "window join", with
    occurrence counts and the first match position — via the
    positional-postings self-join (term A at p, term B at p+1, same
    doc).

    Scale: postings are filtered to the two query terms AT THE SCAN
    (predicate pushes into the explode output before any shuffle), so
    the join input is |postings(A)| + |postings(B)|, not the corpus;
    both sides shuffle on doc_id."""
    d = _t(spark, sf, "documents").filter(F.col("text").isNotNull())
    toks = d.select(
        "doc_id",
        F.posexplode(
            F.split(TX.normalize_text(F.col("text")), " ")
        ).alias("p", "t"),
    )
    a = toks.filter(F.col("t") == _PHRASE[0]).select(
        "doc_id", F.col("p").alias("pa")
    )
    b = toks.filter(F.col("t") == _PHRASE[1]).select(
        "doc_id", F.col("p").alias("pb")
    )
    hits = a.join(b, "doc_id").filter(F.col("pb") == F.col("pa") + 1)
    return hits.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_occurrences"),
        F.min("pa").alias("first_pos"),
    )


# ---------------------------------------------------------------------------
# Dense histogram
# ---------------------------------------------------------------------------

_HIST_LO = 0.0
_HIST_HI = 600000.0
_HIST_BINS = 30


def q_histogram_dense(spark, sf):
    """Fixed-width histogram of order totals with every bin present
    (zero-filled): a generated bin dimension LEFT JOINs the observed
    counts. Out-of-range values clamp into the edge bins.

    Scale: the scan collapses to ≤30 bin counts map-side; the bin
    dimension is generated (no table), broadcast, and joined — the
    densification costs nothing at any corpus size."""
    o = _t(spark, sf, "orders")
    width = (_HIST_HI - _HIST_LO) / _HIST_BINS
    bin_of = F.least(
        F.greatest(
            F.floor((F.col("o_totalprice") - _HIST_LO) / width).cast(
                "int"
            ),
            F.lit(0),
        ),
        F.lit(_HIST_BINS - 1),
    )
    counts = o.groupBy(bin_of.alias("bin")).agg(
        F.count(F.lit(1)).alias("n")
    )
    bins = spark.range(_HIST_BINS).select(
        F.col("id").cast("int").alias("bin")
    )
    return (
        bins.join(counts, "bin", "left_outer")
        .select(
            "bin",
            F.round(F.lit(_HIST_LO) + F.col("bin") * width, 2).alias(
                "bin_lo"
            ),
            F.round(F.lit(_HIST_LO) + (F.col("bin") + 1) * width, 2).alias(
                "bin_hi"
            ),
            F.coalesce(F.col("n"), F.lit(0).cast("long")).alias("n"),
        )
    )


# ---------------------------------------------------------------------------
# Gini coefficient
# ---------------------------------------------------------------------------


def q_gini_customer_spend(spark, sf):
    """Gini coefficient of total spend across customers (customers
    with no orders excluded), by the sorted-rank identity
    G = 2·Σ(i·xᵢ)/(n·Σx) − (n+1)/n, ties broken by customer key so
    the rank assignment is deterministic. One row: n_customers,
    total spend, gini.

    Scale: spend collapses per customer first (exact decimal sums,
    one Exchange); the rank over the per-customer frame — which grows
    linearly with the corpus — comes from the bucketed global rank
    (operators/ranks, round 8) rather than an unpartitioned
    row_number window, so no single task ever sorts every customer."""
    o = _t(spark, sf, "orders")
    spend = o.groupBy("o_custkey").agg(
        decimal_sum(F.col("o_totalprice")).cast("double").alias("x")
    )
    # round 8: the global rank comes from the bucketed search —
    # Window.orderBy with no partition funnels the per-customer frame
    # (which grows linearly with the corpus) into ONE sort task; the
    # bucketed form's widest sort is one value-bucket slice.
    from datafusion_archive_spark.operators.ranks import bucketed_group_rank

    ranked = bucketed_group_rank(
        spend, [], "x", tiebreak=["o_custkey"]
    ).withColumn("i", F.col("_rank").cast("double"))
    agg = ranked.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("x").alias("sx"),
        F.sum(F.col("i") * F.col("x")).alias("six"),
    )
    gini = (
        F.lit(2.0) * F.col("six") / (F.col("n") * F.col("sx"))
        - (F.col("n") + 1) / F.col("n")
    )
    return agg.select(
        F.col("n").cast("long").alias("n_customers"),
        F.round("sx", 2).alias("total_spend"),
        F.round(gini, 6).alias("gini"),
    )


# ---------------------------------------------------------------------------
# Inter-arrival statistics
# ---------------------------------------------------------------------------


def q_interarrival_stats(spark, sf):
    """Per-user inter-event gaps: count, mean (µs), and coefficient
    of variation (stddev/mean — the burstiness index). Gaps are exact
    integer µs from lag over the user's (ts, event_id) timeline; the
    CV uses sample stddev and rounds to 6. Users with fewer than 3
    events (< 2 gaps) are excluded — CV needs a spread estimate.

    Scale: one Exchange on user_id shared by the lag window and the
    aggregate."""
    e = load_events(spark, sf).select(
        "user_id", "event_id", F.unix_micros(F.col("ts")).alias("us")
    )
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    gaps = e.withColumn(
        "gap", F.col("us") - F.lag("us").over(w)
    ).filter(F.col("gap").isNotNull())
    stats = gaps.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_gaps"),
        F.avg("gap").alias("_mean"),
        F.stddev_samp("gap").alias("_sd"),
    )
    return stats.filter(F.col("n_gaps") >= 2).select(
        "user_id",
        "n_gaps",
        F.round("_mean", 2).alias("mean_gap_us"),
        F.round(F.col("_sd") / F.col("_mean"), 6).alias("cv"),
    )


QUERIES = {
    "phrase_search_inverted": q_phrase_search_inverted,
    "histogram_dense": q_histogram_dense,
    "gini_customer_spend": q_gini_customer_spend,
    "interarrival_stats": q_interarrival_stats,
}

ORACLES = {
    "phrase_search_inverted": f"""
        WITH toks AS (
          SELECT doc_id,
                 unnest({_WORDS}) AS t,
                 generate_subscripts({_WORDS}, 1) - 1 AS p
          FROM documents WHERE text IS NOT NULL
        ),
        a AS (SELECT doc_id, p AS pa FROM toks WHERE t = '{_PHRASE[0]}'),
        b AS (SELECT doc_id, p AS pb FROM toks WHERE t = '{_PHRASE[1]}')
        SELECT a.doc_id,
               count(*) AS n_occurrences,
               CAST(min(pa) AS INTEGER) AS first_pos
        FROM a JOIN b ON a.doc_id = b.doc_id AND b.pb = a.pa + 1
        GROUP BY a.doc_id
    """,
    "histogram_dense": f"""
        WITH counts AS (
          SELECT least(greatest(CAST(floor(
                   (o_totalprice - {_HIST_LO})
                   / {(_HIST_HI - _HIST_LO) / _HIST_BINS}) AS INTEGER),
                   0), {_HIST_BINS - 1}) AS bin,
                 count(*) AS n
          FROM orders GROUP BY 1
        ),
        bins AS (
          SELECT CAST(range AS INTEGER) AS bin
          FROM range(0, {_HIST_BINS})
        )
        SELECT b.bin,
               round({_HIST_LO} + b.bin
                     * {(_HIST_HI - _HIST_LO) / _HIST_BINS}, 2) AS bin_lo,
               round({_HIST_LO} + (b.bin + 1)
                     * {(_HIST_HI - _HIST_LO) / _HIST_BINS}, 2) AS bin_hi,
               CAST(coalesce(c.n, 0) AS BIGINT) AS n
        FROM bins b LEFT JOIN counts c USING (bin)
    """,
    "gini_customer_spend": f"""
        WITH spend AS (
          SELECT o_custkey,
                 CAST({decimal_sum_sql("o_totalprice")} AS DOUBLE) AS x
          FROM orders GROUP BY o_custkey
        ),
        ranked AS (
          SELECT x, CAST(row_number() OVER (ORDER BY x, o_custkey)
                    AS DOUBLE) AS i
          FROM spend
        ),
        agg AS (
          SELECT CAST(count(*) AS DOUBLE) AS n,
                 sum(x) AS sx,
                 sum(i * x) AS six
          FROM ranked
        )
        SELECT CAST(n AS BIGINT) AS n_customers,
               round(sx, 2) AS total_spend,
               round(2.0 * six / (n * sx) - (n + 1) / n, 6) AS gini
        FROM agg
    """,
    "interarrival_stats": """
        WITH gaps AS (
          SELECT user_id,
                 epoch_us(ts) - lag(epoch_us(ts)) OVER (
                   PARTITION BY user_id ORDER BY epoch_us(ts), event_id
                 ) AS gap
          FROM events
        ),
        stats AS (
          SELECT user_id,
                 count(*) AS n_gaps,
                 avg(gap) AS mean_g,
                 stddev_samp(gap) AS sd
          FROM gaps WHERE gap IS NOT NULL
          GROUP BY user_id
        )
        SELECT user_id, n_gaps,
               round(mean_g, 2) AS mean_gap_us,
               round(sd / mean_g, 6) AS cv
        FROM stats
        WHERE n_gaps >= 2
    """,
}
