"""Pipeline wave 2: time-series gap-fill with LOCF, Gopher-style
intra-document repetition metrics, and incremental (new-batch vs
corpus) dedup.

These extend the engine's training-pipeline/time-series surface beyond
the reference (which has none of it — its roadmap stops at batch SQL,
``/root/reference/ROADMAP.md:36-56``):

- gap-fill + last-observation-carried-forward is the standard
  hypertable/monitoring query (report every bucket, carry the last
  reading across silent ones);
- duplicate-token and repeated-2-gram fractions are the Gopher/C4
  repetition quality rules used to drop boilerplate from training
  corpora (token-type repetition was already covered by
  ``text_stats``; these pin the n-gram family);
- incremental dedup is the production shape of near-dup removal: a new
  ingest batch is checked against the existing corpus, not against
  itself — only *cross* pairs disqualify a new document.

All three are pure Catalyst plans with exact DuckDB twins.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from datafusion_archive_spark.functions import text as TX
from datafusion_archive_spark.functions.rounding import (
    decimal_sum,
    decimal_sum_sql,
    round_half_up,
    round_half_up_sql,
)
from datafusion_archive_spark.operators import dedup
from datafusion_archive_spark.queries import llm as _llm
from datafusion_archive_spark.queries.timeseries import load_events
from datafusion_archive_spark.operators.quantiles import exact_grouped_quantiles
from datafusion_archive_spark.operators.util import cached, load_table


def _t(spark, sf_dir, name):
    return load_table(spark, sf_dir, name)


#: 6-hour buckets: at sf0.01 the grid is ~150 users x ~120 buckets —
#: large enough to exercise sequence/explode/LOCF, small enough for
#: the driver's full-result compare.
_BUCKET_S = 21_600


def q_events_gapfill_locf(spark, sf):
    """Gap-fill + LOCF: every user reports every 6-hour bucket between
    their first and last activity; silent buckets carry the last
    observed bucket-sum forward.

    Plan shape: one hash aggregate on (user_id, bucket), a per-user
    min/max (same partitioning), a ``sequence``+``explode`` grid
    (narrow — one output row per grid cell, no shuffle beyond the
    agg's), a left join back on (user_id, bucket), and one window pass
    for the carry-forward. The grid is O(users x span/bucket) — at
    scale this is the dimension side, NOT the event count, which is
    why gap-fill is grid-join-shaped rather than resample-shaped.
    Bucket sums go through ``decimal_sum`` so LOCF carries exact
    values the oracle reproduces bit-for-bit.
    """
    ev = load_events(spark, sf)
    bucketed = ev.withColumn(
        "bucket",
        F.timestamp_seconds(
            (F.expr("unix_micros(ts) div 1000000") / _BUCKET_S).cast("long")
            * _BUCKET_S
        ),
    )
    agg = bucketed.groupBy("user_id", "bucket").agg(
        decimal_sum(F.col("value")).alias("v_sum"),
        F.count(F.lit(1)).alias("n"),
    )
    bounds = agg.groupBy("user_id").agg(
        F.min("bucket").alias("lo"), F.max("bucket").alias("hi")
    )
    grid = bounds.select(
        "user_id",
        F.explode(
            F.sequence("lo", "hi", F.expr(f"INTERVAL {_BUCKET_S} SECONDS"))
        ).alias("bucket"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        grid.join(agg, ["user_id", "bucket"], "left")
        .select(
            "user_id",
            F.date_format("bucket", "yyyy-MM-dd HH:mm:ss").alias(
                "bucket_start"
            ),
            F.coalesce(F.col("n"), F.lit(0)).alias("n_events"),
            F.last("v_sum", ignorenulls=True).over(w).alias("locf_value"),
        )
    )


def q_text_repetition_gopher(spark, sf):
    """Gopher/C4 repetition rules as scan-side expressions: fraction
    of tokens that are repeats of an earlier token type, the share of
    2-grams taken by the most frequent 2-gram, and the fraction of
    2-grams whose type occurs more than once. Zero Exchanges — the
    per-document array work is O(grams log grams) (sorted run-length
    counts, round 15), bounded by document length, and never leaves
    the scan stage."""
    d = _t(spark, sf, "documents").select(
        "doc_id",
        F.split(TX.normalize_text(F.col("text")), " ").alias("w"),
    )
    g2 = (
        "transform(sequence(1, size(w) - 1), "
        "i -> concat(element_at(w, i), ' ', element_at(w, i + 1)))"
    )
    # per-type 2-gram counts via the sorted run-length fold (round
    # 15): O(n log n) per document instead of the quadratic
    # distinct-times-filter form — array_max and the singles count
    # below are order-insensitive, so the sorted output is a drop-in
    d = d.withColumn("g", F.expr(g2)).withColumn(
        "cnts", F.expr(TX.run_length_counts_sql("g"))
    )
    n_tok = F.size("w")
    n_g = F.size("g")
    return d.select(
        "doc_id",
        round_half_up(
            F.when(
                n_tok > 0,
                F.lit(1.0) - F.size(F.array_distinct("w")) / n_tok,
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("dup_token_frac"),
        round_half_up(
            F.when(
                n_g > 0, F.array_max("cnts") / n_g
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("top_2gram_frac"),
        round_half_up(
            F.when(
                n_g > 0,
                (n_g - F.expr("size(filter(cnts, c -> c = 1))")) / n_g,
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("dup_2gram_frac"),
    )


def q_text_token_entropy(spark, sf):
    """Unigram token entropy per document (nats) — low entropy flags
    repetitive gibberish/spam, high entropy flags random noise; the
    classic cheap perplexity proxy for corpus filtering. Scan-side
    array work only. The float fold runs over SORTED counts on both
    engines: a float sum's low bits depend on summation order, and
    Spark's ``array_distinct`` (first-occurrence order) and DuckDB's
    ``list_distinct`` (unspecified order) would otherwise disagree at
    the rounding boundary."""
    d = _t(spark, sf, "documents").select(
        "doc_id",
        F.split(TX.normalize_text(F.col("text")), " ").alias("w"),
    )
    # sorted counts via the run-length fold (round 15, O(n log n) vs
    # the quadratic distinct-times-filter form); the fold output is
    # already array_sort-ed, preserving the deterministic float
    # summation order the docstring requires
    d = d.withColumn("cnts", F.expr(TX.run_length_counts_sql("w")))
    ent = F.expr(
        "-aggregate(cnts, CAST(0 AS DOUBLE), (acc, c) -> "
        "acc + (c / CAST(size(w) AS DOUBLE)) "
        "* ln(c / CAST(size(w) AS DOUBLE)))"
    )
    return d.select(
        "doc_id",
        round_half_up(
            F.when(F.size("w") > 0, ent).otherwise(F.lit(0.0)), 4
        ).alias("token_entropy"),
        F.size("w").alias("n_tokens"),
    )


def q_weighted_sample(spark, sf):
    """Quality-weighted sample without replacement (Efraimidis-
    Spirakis A-ES): each document draws a deterministic uniform
    u from its id hash and ranks by ln(u)/w — the top-k of that key
    IS an exact weighted sample without replacement. Because u is
    md5-derived (not RNG), the sample is reproducible on any cluster,
    any partitioning, and bit-replayable by the oracle. One scan +
    one TakeOrdered — no shuffle of the corpus.

    The weight is the document quality score clamped away from zero,
    so high-quality docs are proportionally more likely — the
    standard quality-weighted corpus subsampling step.
    """
    d = _t(spark, sf, "documents")
    m = 1 << 53
    u = (TX.hash64(F.col("doc_id").cast("string"), 11) % m + 0.5) / m
    w = F.greatest(TX.quality_score(F.col("text")), F.lit(0.05))
    key = F.log(u) / w
    return (
        d.select(
            "doc_id",
            "lang",
            round_half_up(key, 6).alias("sample_key"),
        )
        .orderBy(F.col("sample_key").desc(), F.col("doc_id"))
        .limit(100)
    )


def q_weighted_sample_per_lang(spark, sf):
    """Per-group weighted sampling: the A-ES key of
    :func:`q_weighted_sample` ranked WITHIN each language — k docs per
    language, quality-weighted, deterministic. One hash Exchange on
    lang + a row_number filter; the balanced-subcorpus construction
    (equal doc budget per language regardless of language skew)."""
    d = _t(spark, sf, "documents")
    m = 1 << 53
    u = (TX.hash64(F.col("doc_id").cast("string"), 11) % m + 0.5) / m
    w = F.greatest(TX.quality_score(F.col("text")), F.lit(0.05))
    keyed = d.select(
        "doc_id", "lang", round_half_up(F.log(u) / w, 6).alias("sample_key")
    )
    win = Window.partitionBy("lang").orderBy(
        F.col("sample_key").desc(), F.col("doc_id")
    )
    return (
        keyed.withColumn("rk", F.row_number().over(win))
        .filter(F.col("rk") <= 20)
        .select("doc_id", "lang", "sample_key", "rk")
    )


def q_dedup_incremental(spark, sf):
    """Incremental near-dup dedup: treat ``doc_id % 5 == 0`` as the
    newly ingested batch and the rest as the standing corpus; a new
    document survives unless it is a near-duplicate (3-gram Jaccard
    >= 0.2) of a CORPUS document. New-vs-new duplicates are kept —
    intra-batch dedup is a separate (already certified) pass.

    Round 15 (guide §2.3/§3.2 — decide with the restriction BEFORE
    the quadratic step): only NEW×CORPUS pairs can drop a new
    document, so the shingle self-join now puts the new batch on one
    side and the standing corpus on the other instead of enumerating
    ALL same-shingle pairs (new×new and corpus×corpus — two thirds of
    the candidates, including the corpus² term that dominates at
    scale) and filtering afterwards. Equivalence: the old mixed-pair
    set in either (id_a < id_b) orientation is exactly the
    (new, corpus) equi-join's row set; Jaccard is symmetric; the
    stop-shingle df cap is still computed over the WHOLE corpus
    before the sides split, and per-doc set sizes are side-
    independent. The old (id, shingle)-level .distinct() is dropped:
    array_distinct already de-duplicates within a document and
    doc_ids are unique, so the rows were globally unique by
    construction (same argument as minhash_estimate_audit, r15).

    Round 16 (ADVICE r15): the restricted self-join is the operator's
    kernel, not an inline copy — ``dedup.ngram_jaccard_pairs`` grew a
    ``side_pred`` parameter (side a = rows matching the predicate,
    side b = the complement, no id-order constraint), so shingle
    normalization, the df cap, and the rounding semantics propagate
    from the one shared implementation.
    """
    docs = _t(spark, sf, "documents")
    is_new = lambda c: c % 5 == 0  # noqa: E731
    pairs = dedup.ngram_jaccard_pairs(
        docs, k=3, threshold=0.2, max_shingle_df=50, side_pred=is_new
    )
    drop = pairs.select(F.col("id_a").alias("doc_id")).distinct()
    return (
        docs.filter(is_new(F.col("doc_id")))
        .select("doc_id")
        .join(drop, "doc_id", "left_anti")
    )


#: per-language sampling fractions for the stratified sample — the
#: corpus-rebalancing pattern (downsample the dominant language,
#: keep the tail). Basis points of 10000.
_STRATA_BP = {"en": 2500, "de": 7500, "fr": 7500, "es": 7500, "zh": 7500}
_STRATA_SEED = 7


def q_stratified_sample(spark, sf):
    """Deterministic per-stratum (language) sampling: each document
    passes iff ``hash64(doc_id) mod 10000`` falls under its language's
    basis-point budget. Unlike ``df.sampleBy`` (RNG-order-dependent),
    the hash gate is a pure per-row predicate — reproducible on any
    cluster, any partitioning, and exactly replayable by the oracle.
    Map-only: no shuffle, no sort."""
    d = _t(spark, sf, "documents")
    bp = F.create_map(
        *[F.lit(x) for kv in _STRATA_BP.items() for x in kv]
    )
    gate = TX.hash64(F.col("doc_id").cast("string"), _STRATA_SEED) % 10_000
    return (
        d.withColumn("bucket", gate)
        .filter(F.col("bucket") < bp[F.col("lang")])
        .select("doc_id", "lang", "bucket")
    )


def q_winsorized_aggs(spark, sf):
    """Winsorized (clipped) aggregation: per event type, clip values
    to the exact [p05, p95] band and aggregate the clipped series —
    the standard robust-mean pattern for long-tailed metrics. The
    per-type bands come from the grouped histogram-pruned search
    (operators/quantiles.exact_grouped_quantiles — round 7: the
    grouped ``percentile`` aggregate buffered every value of an
    event type in the one task finalizing it, hundreds of GB per
    low-cardinality group at fact scale) and broadcast back onto the
    events scan. The search is bit-identical to ``percentile``,
    which shares linear interpolation with DuckDB ``quantile_cont``,
    so the oracle is exact."""
    ev = load_events(spark, sf)
    qs = exact_grouped_quantiles(ev, "event_type", "value", [0.05, 0.95])
    bands = spark.createDataFrame(
        [(k, v[0], v[1]) for k, v in qs.items()],
        "event_type string, lo double, hi double",
    )
    clipped = ev.join(F.broadcast(bands), "event_type").withColumn(
        "v_clip", F.least(F.greatest(F.col("value"), F.col("lo")), F.col("hi"))
    )
    return clipped.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.count(F.when(F.col("value") < F.col("lo"), 1)).alias("n_floor"),
        F.count(F.when(F.col("value") > F.col("hi"), 1)).alias("n_ceil"),
        round_half_up(decimal_sum(F.col("v_clip")), 2).alias("clipped_sum"),
    )


QUERIES = {
    "events_gapfill_locf": q_events_gapfill_locf,
    "text_repetition_gopher": q_text_repetition_gopher,
    "dedup_incremental": q_dedup_incremental,
    "stratified_sample": q_stratified_sample,
    "winsorized_aggs": q_winsorized_aggs,
    "text_token_entropy": q_text_token_entropy,
    "weighted_sample": q_weighted_sample,
    "weighted_sample_per_lang": q_weighted_sample_per_lang,
}

_G2_SQL = (
    "list_transform(range(1, len(w)), "
    "i -> list_extract(w, i) || ' ' || list_extract(w, i + 1))"
)

ORACLES = {
    "events_gapfill_locf": f"""
        WITH ev AS (
          SELECT user_id,
                 make_timestamp((epoch_us(ts) // {_BUCKET_S * 1_000_000})
                                * {_BUCKET_S} * 1000000) AS bucket,
                 value
          FROM events
        ),
        agg AS (
          SELECT user_id, bucket,
                 {decimal_sum_sql("value")} AS v_sum,
                 count(*) AS n
          FROM ev GROUP BY 1, 2
        ),
        bounds AS (
          SELECT user_id, min(bucket) AS lo, max(bucket) AS hi
          FROM agg GROUP BY 1
        ),
        grid AS (
          SELECT user_id,
                 unnest(generate_series(lo, hi,
                        INTERVAL {_BUCKET_S} SECOND)) AS bucket
          FROM bounds
        )
        SELECT g.user_id,
               strftime(g.bucket, '%Y-%m-%d %H:%M:%S') AS bucket_start,
               coalesce(a.n, 0) AS n_events,
               last_value(a.v_sum IGNORE NULLS) OVER (
                 PARTITION BY g.user_id ORDER BY g.bucket
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS locf_value
        FROM grid g
        LEFT JOIN agg a ON g.user_id = a.user_id AND g.bucket = a.bucket
    """,
    "text_repetition_gopher": f"""
        WITH wl AS (
          SELECT doc_id, {_llm._WORDS} AS w FROM documents
        ),
        gl AS (
          SELECT doc_id, w, {_G2_SQL} AS g FROM wl
        ),
        cl AS (
          SELECT doc_id, w, g,
                 list_transform(list_distinct(g),
                   t -> len(list_filter(g, x -> x = t))) AS cnts
          FROM gl
        )
        SELECT doc_id,
               {round_half_up_sql(
                   "CASE WHEN len(w) > 0 THEN "
                   "1.0 - len(list_distinct(w)) / len(w) ELSE 0.0 END", 6)}
                 AS dup_token_frac,
               {round_half_up_sql(
                   "CASE WHEN len(g) > 0 THEN "
                   "list_max(cnts) / len(g) ELSE 0.0 END", 6)}
                 AS top_2gram_frac,
               {round_half_up_sql(
                   "CASE WHEN len(g) > 0 THEN "
                   "(len(g) - len(list_filter(cnts, c -> c = 1))) / len(g) "
                   "ELSE 0.0 END", 6)}
                 AS dup_2gram_frac
        FROM cl
    """,
}


_STRATA_CASE = " ".join(
    f"WHEN '{lang}' THEN {bp}" for lang, bp in _STRATA_BP.items()
)

ORACLES["stratified_sample"] = f"""
    SELECT doc_id, lang, bucket
    FROM (
      SELECT doc_id, lang,
             {_llm._hash64_sql("CAST(doc_id AS VARCHAR)", _STRATA_SEED)}
               % 10000 AS bucket
      FROM documents
    )
    WHERE bucket < (CASE lang {_STRATA_CASE} ELSE 0 END)
"""

def _weighted_sample_oracle() -> str:
    m = 1 << 53
    u = f"(({_llm._hash64_sql('CAST(doc_id AS VARCHAR)', 11)} % {m}) + 0.5) / {m}"
    return f"""
        WITH keyed AS (
          SELECT doc_id, lang,
                 {round_half_up_sql(
                     f"ln({u}) / greatest({_llm._QUALITY_SQL}, 0.05)", 6)}
                   AS sample_key
          FROM documents
        )
        SELECT doc_id, lang, sample_key
        FROM keyed
        ORDER BY sample_key DESC, doc_id
        LIMIT 100
    """


ORACLES["weighted_sample"] = _weighted_sample_oracle()


def _weighted_sample_per_lang_oracle() -> str:
    m = 1 << 53
    u = f"(({_llm._hash64_sql('CAST(doc_id AS VARCHAR)', 11)} % {m}) + 0.5) / {m}"
    return f"""
        WITH keyed AS (
          SELECT doc_id, lang,
                 {round_half_up_sql(
                     f"ln({u}) / greatest({_llm._QUALITY_SQL}, 0.05)", 6)}
                   AS sample_key
          FROM documents
        )
        SELECT doc_id, lang, sample_key, rk FROM (
          SELECT *, CAST(row_number() OVER (
                   PARTITION BY lang
                   ORDER BY sample_key DESC, doc_id
                 ) AS INTEGER) AS rk
          FROM keyed
        ) WHERE rk <= 20
    """


ORACLES["weighted_sample_per_lang"] = _weighted_sample_per_lang_oracle()

ORACLES["winsorized_aggs"] = f"""
    WITH bands AS (
      SELECT event_type,
             quantile_cont(value, 0.05) AS lo,
             quantile_cont(value, 0.95) AS hi
      FROM events GROUP BY 1
    )
    SELECT e.event_type,
           count(*) AS n,
           count(*) FILTER (WHERE e.value < b.lo) AS n_floor,
           count(*) FILTER (WHERE e.value > b.hi) AS n_ceil,
           {round_half_up_sql(
               decimal_sum_sql("least(greatest(e.value, b.lo), b.hi)"), 2)}
             AS clipped_sum
    FROM events e JOIN bands b USING (event_type)
    GROUP BY 1
"""


ORACLES["text_token_entropy"] = f"""
    WITH wl AS (
      SELECT doc_id, {_llm._WORDS} AS w FROM documents
    ),
    cl AS (
      SELECT doc_id, w,
             list_sort(list_transform(list_distinct(w),
               t -> len(list_filter(w, x -> x = t)))) AS cnts
      FROM wl
    )
    SELECT doc_id,
           {round_half_up_sql(
               "CASE WHEN len(w) > 0 THEN "
               "-list_sum(list_transform(cnts, "
               "c -> (c / CAST(len(w) AS DOUBLE)) "
               "* ln(c / CAST(len(w) AS DOUBLE)))) "
               "ELSE 0.0 END", 4)}
             AS token_entropy,
           CAST(len(w) AS INTEGER) AS n_tokens
    FROM cl
"""


def _incremental_oracle() -> str:
    pairs_sql = _llm.ORACLES["dedup_ngram_jaccard"]
    return f"""
        WITH pairs AS ({pairs_sql}),
        drops AS (
          SELECT id_a AS doc_id FROM pairs
          WHERE id_a % 5 = 0 AND id_b % 5 <> 0
          UNION
          SELECT id_b FROM pairs
          WHERE id_b % 5 = 0 AND id_a % 5 <> 0
        )
        SELECT d.doc_id
        FROM documents d
        WHERE d.doc_id % 5 = 0
          AND NOT EXISTS (SELECT 1 FROM drops x WHERE x.doc_id = d.doc_id)
    """


ORACLES["dedup_incremental"] = _incremental_oracle()
