"""Pipeline wave 3 (round 5): skew-proof sampling, the heavy-hitters
batch twin, ingestion robustness (schema evolution + corrupt-row
quarantine) through the oracle, and PMI collocations.

These close the round-4 verdict's certification gaps:

- ``weighted_sample_per_lang_salted`` proves the escape hatch for the
  one skew-sensitive spot in the sampling family: a dominant language
  concentrates the per-language window sort on one partition, and the
  salted two-phase top-k spreads it while provably returning the
  identical sample (it must hash-match ``weighted_sample_per_lang``'s
  oracle);
- ``heavy_hitters_topk`` is the exact batch twin of
  :func:`datafusion_archive_spark.streaming.stateful.
  streaming_heavy_hitters` — with capacity above the distinct-token
  cardinality the space-saving sketch is exact, so the streaming
  output must equal this certified row (tests/test_round5.py);
- ``schema_evolution_merge`` and ``quarantine_corrupt_rows`` give the
  ingestion paths (``register_parquet_evolving``, PERMISSIVE NDJSON —
  previously pytest-only, ``context.py``) driver rows: the oracle
  recomputes the expected result from the pristine base tables, so
  any fidelity loss in evolve/quarantine breaks the hash;
- ``collocations_pmi`` extends the text-analysis family with the
  classic bigram pointwise-mutual-information collocation ranking.

The reference has none of this surface (its roadmap stops at batch
SQL, ``/root/reference/ROADMAP.md:36-56``); it belongs to the
training-data-pipeline extension mandate.
"""

from __future__ import annotations

import os

from pyspark.sql import Window
from pyspark.sql import functions as F

from datafusion_archive_spark.context import ExecutionContext
from datafusion_archive_spark.functions import text as TX
from datafusion_archive_spark.functions.rounding import (
    decimal_sum,
    decimal_sum_sql,
    round_half_up,
    round_half_up_sql,
)
from datafusion_archive_spark.operators import dedup
from datafusion_archive_spark.operators.quantiles import exact_grouped_quantiles
from datafusion_archive_spark.operators.util import cached
from datafusion_archive_spark.queries import llm as _llm
from datafusion_archive_spark.queries.pipeline2 import (
    _weighted_sample_per_lang_oracle,
)
from datafusion_archive_spark.queries.timeseries import load_events
from datafusion_archive_spark.operators.util import load_table, salt_count

_IO_BASE = "/root/repo/.tmp_io"


def _t(spark, sf_dir, name):
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# Skew-proof per-language sampling
# ---------------------------------------------------------------------------

#: Group cardinality of the sampling window's key: the documents
#: table carries 5 languages. The salt fan-out itself is derived from
#: cluster parallelism per-session (operators.util.salt_count,
#: VERDICT r13 #3), not fixed.
_LANG_GROUPS = 5
_PER_LANG_K = 20


def q_weighted_sample_per_lang_salted(spark, sf):
    """The salted two-phase variant of ``weighted_sample_per_lang``:
    rank within (lang, salt) first, keep the per-salt top-k, then
    re-rank the surviving <= salt_buckets x k rows per language.

    Semantics are identical by a pigeonhole argument — any row in a
    language's true top-k is necessarily in the top-k of its own salt
    bucket — so this row must hash-match the unsalted query's oracle.
    The point is the plan shape: the heavy window sort runs over
    (lang, salt) — ``salt_count(spark, _LANG_GROUPS)`` sub-partitions
    per language — so
    a corpus that is 90% one language no longer funnels 90% of the
    sort into one task; the second window sees only the tiny
    candidate set. This is the documented escape hatch for the one
    skew-sensitive spot in the sampling family.
    """
    d = _t(spark, sf, "documents")
    m = 1 << 53
    u = (TX.hash64(F.col("doc_id").cast("string"), 11) % m + 0.5) / m
    w = F.greatest(TX.quality_score(F.col("text")), F.lit(0.05))
    keyed = d.select(
        "doc_id", "lang", round_half_up(F.log(u) / w, 6).alias("sample_key")
    )
    salt = TX.hash64(F.col("doc_id").cast("string"), 23) % salt_count(
        spark, _LANG_GROUPS
    )
    w1 = Window.partitionBy("lang", "salt").orderBy(
        F.col("sample_key").desc(), F.col("doc_id")
    )
    cand = (
        keyed.withColumn("salt", salt)
        .withColumn("r1", F.row_number().over(w1))
        .filter(F.col("r1") <= _PER_LANG_K)
        .drop("salt", "r1")
    )
    w2 = Window.partitionBy("lang").orderBy(
        F.col("sample_key").desc(), F.col("doc_id")
    )
    return (
        cand.withColumn("rk", F.row_number().over(w2))
        .filter(F.col("rk") <= _PER_LANG_K)
        .select("doc_id", "lang", "sample_key", "rk")
    )


# ---------------------------------------------------------------------------
# Heavy hitters — exact batch twin of the streaming space-saving sketch
# ---------------------------------------------------------------------------

_HH_K = 10


def q_heavy_hitters_topk(spark, sf):
    """Exact per-language token top-k — the batch twin of
    :func:`streaming.stateful.streaming_heavy_hitters`. When the
    sketch capacity exceeds the per-language distinct-token
    cardinality (it does on this corpus: capacity 1000 vs 31 tokens),
    space-saving counts are exact, so the streaming query's final
    micro-batch output must equal this certified result — asserted in
    tests/test_round5.py, the same stream==batch certification pattern
    ``events_attribution_join`` established for stream-stream joins.

    Plan: explode tokens -> two-phase hash aggregate on (lang, token)
    (map-side combine absorbs the explode fan-out) -> per-lang
    row_number over (count desc, token) -> filter. One Exchange on
    the agg, one on the tiny counted side for the window.
    """
    d = _t(spark, sf, "documents")
    toks = d.select(
        "lang",
        F.explode(
            F.split(TX.normalize_text(F.col("text")), " ")
        ).alias("token"),
    ).filter(F.col("token") != "")
    counts = toks.groupBy("lang", "token").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    win = Window.partitionBy("lang").orderBy(
        F.col("cnt").desc(), F.col("token")
    )
    return (
        counts.withColumn("rk", F.row_number().over(win))
        .filter(F.col("rk") <= _HH_K)
        .select("lang", "token", "cnt", "rk")
    )


# ---------------------------------------------------------------------------
# Ingestion robustness: schema evolution + corrupt-record quarantine
# ---------------------------------------------------------------------------

_EVOLVE_SPLIT_YEAR = 1998


def q_schema_evolution_merge(spark, sf):
    """Schema evolution on read, certified: orders are re-written as
    two ingestion batches — a legacy batch (orders before
    ``_EVOLVE_SPLIT_YEAR``) WITHOUT the ``o_year`` column and a
    current batch WITH it — under ``batch=N`` directories, then read
    back through :meth:`ExecutionContext.register_parquet_evolving`
    (``mergeSchema``), where legacy rows surface ``o_year`` as NULL.
    The certified aggregate counts legacy/current rows and money per
    priority; the oracle recomputes it from the pristine orders
    table, so a merge bug (column misalignment, partition-dir typing,
    non-null backfill) breaks the hash."""
    base = f"{_IO_BASE}/{os.path.basename(sf.rstrip('/'))}_orders_evolving"
    orders = _t(spark, sf, "orders")
    legacy = orders.filter(F.year("o_orderdate") < _EVOLVE_SPLIT_YEAR).select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    current = orders.filter(
        F.year("o_orderdate") >= _EVOLVE_SPLIT_YEAR
    ).select(
        "o_orderkey",
        "o_orderpriority",
        "o_totalprice",
        F.year("o_orderdate").alias("o_year"),
    )
    legacy.write.mode("overwrite").parquet(f"{base}/batch=1")
    current.write.mode("overwrite").parquet(f"{base}/batch=2")
    ctx = ExecutionContext(spark)
    merged = ctx.register_parquet_evolving("orders_evolving", base)
    return merged.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.col("o_year").isNull().cast("long")).alias("n_legacy"),
        F.count("o_year").alias("n_current"),
        round_half_up(decimal_sum(F.col("o_totalprice")), 2).alias(
            "total_price"
        ),
    )


def q_quarantine_corrupt_rows(spark, sf):
    """PERMISSIVE corrupt-record quarantine, certified: documents are
    serialized to NDJSON with every ``doc_id % 7 == 0`` line
    deliberately truncated mid-string (invalid JSON), read back
    through :meth:`ExecutionContext.register_ndjson` with
    ``mode=PERMISSIVE`` + a ``_corrupt`` column, and counted per
    language. Corrupt lines parse to all-NULL fields with the raw
    line quarantined in ``_corrupt`` — they form the NULL-lang group.
    The oracle recomputes both populations from the documents table:
    a miscounted quarantine (dropped lines, misparsed valid rows)
    breaks rows and hash."""
    base = f"{_IO_BASE}/{os.path.basename(sf.rstrip('/'))}_docs_ndjson"
    docs = _t(spark, sf, "documents")
    lines = docs.select(
        F.when(
            F.col("doc_id") % 7 == 0,
            F.concat(F.lit('{"doc_id": '), F.col("doc_id"), F.lit(', "lang": "')),
        )
        .otherwise(F.to_json(F.struct("doc_id", "lang")))
        .alias("value")
    )
    lines.coalesce(1).write.mode("overwrite").text(base)
    ctx = ExecutionContext(spark)
    parsed = ctx.register_ndjson(
        "docs_quarantined",
        base,
        schema=(
            ("doc_id", "int64"),
            ("lang", "utf8"),
            ("_corrupt", "utf8"),
        ),
        mode="PERMISSIVE",
        columnNameOfCorruptRecord="_corrupt",
    )
    return parsed.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("_corrupt").alias("n_corrupt"),
    )


# ---------------------------------------------------------------------------
# PMI collocations
# ---------------------------------------------------------------------------

_PMI_MIN_COUNT = 5
_PMI_TOP = 20


def q_collocations_pmi(spark, sf):
    """Bigram collocation ranking by pointwise mutual information —
    ``ln((c_xy/N_bg) / ((c_x/N_w)(c_y/N_w)))`` over the corpus, min
    count 5, top 20 — the classic phrase-mining signal (NSP/collocation
    extraction) for tokenizer and vocab curation.

    Plan: one explode->agg for unigram counts, one for bigram counts;
    the two global totals ride along via their aggregates; unigram
    counts join onto bigrams twice — both broadcastable (vocab-sized,
    orders of magnitude under the corpus). PMI is computed from exact
    integer counts and rounded half-up BEFORE ranking so the ordering
    is engine-portable; ties break on the bigram string.
    """
    d = _t(spark, sf, "documents")
    words = d.select(
        F.split(TX.normalize_text(F.col("text")), " ").alias("w")
    ).filter(F.size("w") > 0)
    # cache the two count tables (vocab-sized, tiny): the scalar
    # totals re-aggregate them instead of re-scanning + re-tokenizing
    # the corpus — 2 corpus scans total (uni, bi), not 4
    uni = cached(
        words.select(F.explode("w").alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("c_tok"))
    )
    bi_all = cached(
        words.select(
            F.explode(
                F.expr(
                    "transform(sequence(1, size(w) - 1), "
                    "i -> concat(w[i - 1], ' ', w[i]))"
                )
            ).alias("bigram")
        )
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("c_bg"))
    )
    bi = bi_all.filter(F.col("c_bg") >= _PMI_MIN_COUNT)
    n_w = uni.agg(F.sum("c_tok").alias("n_w"))
    # Σ bigram counts (pre-filter) == Σ (len(w) - 1): same total, no
    # third corpus scan
    n_bg = bi_all.agg(F.sum("c_bg").alias("n_bg"))
    parts = bi.withColumn(
        "tok_a", F.split(F.col("bigram"), " ").getItem(0)
    ).withColumn("tok_b", F.split(F.col("bigram"), " ").getItem(1))
    joined = (
        parts.join(
            F.broadcast(uni.select(F.col("tok").alias("tok_a"),
                                   F.col("c_tok").alias("c_a"))),
            "tok_a",
        )
        .join(
            F.broadcast(uni.select(F.col("tok").alias("tok_b"),
                                   F.col("c_tok").alias("c_b"))),
            "tok_b",
        )
        .join(F.broadcast(n_w))
        .join(F.broadcast(n_bg))
    )
    pmi = F.log(
        (F.col("c_bg") / F.col("n_bg"))
        / ((F.col("c_a") / F.col("n_w")) * (F.col("c_b") / F.col("n_w")))
    )
    return (
        joined.select(
            "bigram",
            "c_bg",
            round_half_up(pmi, 6).alias("pmi"),
        )
        .orderBy(F.col("pmi").desc(), F.col("bigram"))
        .limit(_PMI_TOP)
    )


# ---------------------------------------------------------------------------
# Containment dedup (asymmetric doc-in-doc)
# ---------------------------------------------------------------------------


def q_dedup_containment(spark, sf):
    """Asymmetric containment near-dup — |A∩B|/|A| over 3-gram shingle
    sets: catches a short document quoted verbatim inside a longer one
    (low Jaccard, high containment), the doc-in-doc case the certified
    Jaccard row cannot express. Same banded plan and stop-shingle skew
    guard as ``dedup_ngram_jaccard``."""
    return dedup.containment_pairs(
        _t(spark, sf, "documents"), k=3, threshold=0.3, max_shingle_df=50
    )


# ---------------------------------------------------------------------------
# Robust outlier detection (median/MAD)
# ---------------------------------------------------------------------------

_MAD_CUT = 3.0


def q_outliers_mad(spark, sf):
    """Median/MAD outlier profile per event type — the robust z-score
    (|x − median| > 3·MAD) that survives the long tails a mean/stddev
    gate drowns in. Two broadcast-back passes, mirroring the certified
    winsorized pattern: exact per-type median from the grouped
    histogram-pruned search (operators/quantiles — round 7: no
    per-group value buffer in a single task, the grouped
    ``percentile`` failure mode at fact scale), broadcast onto the
    scan for absolute deviations, exact MAD of those the same way,
    final single-Exchange aggregate. The search is bit-identical to
    ``percentile``, which shares linear interpolation with DuckDB
    ``quantile_cont``, so the flag boundary is engine-exact."""
    ev = load_events(spark, sf)
    med_qs = exact_grouped_quantiles(ev, "event_type", "value", [0.5])
    med = spark.createDataFrame(
        [(k, v[0]) for k, v in med_qs.items()],
        "event_type string, med double",
    )
    dev = ev.join(F.broadcast(med), "event_type").withColumn(
        "adev", F.abs(F.col("value") - F.col("med"))
    )
    mad_qs = exact_grouped_quantiles(dev, "event_type", "adev", [0.5])
    mad = spark.createDataFrame(
        [(k, v[0]) for k, v in mad_qs.items()],
        "event_type string, mad double",
    )
    flagged = dev.join(F.broadcast(mad), "event_type")
    return flagged.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.count(
            F.when(F.col("adev") > _MAD_CUT * F.col("mad"), 1)
        ).alias("n_outliers"),
        round_half_up(F.min("med"), 6).alias("median_v"),
        round_half_up(F.min("mad"), 6).alias("mad_v"),
    )


# ---------------------------------------------------------------------------
# TF-IDF top terms
# ---------------------------------------------------------------------------

_TFIDF_K = 3


def q_tfidf_topk_terms(spark, sf):
    """Per-document top-k TF-IDF terms — the keyword-extraction
    complement to the corpus-level BM25 row: tf·ln(N/df) with exact
    integer tf/df, scored per (doc, term), ranked per doc. ONE corpus
    scan: the (doc, term, tf) table is cached (bounded by corpus
    token-type volume) and re-aggregated for document frequencies and
    the document count, so the scoring join never re-tokenizes. Scores
    round half-up BEFORE ranking so ordering is engine-portable."""
    d = _t(spark, sf, "documents")
    tf = cached(
        d.select(
            "doc_id",
            F.explode(
                F.split(TX.normalize_text(F.col("text")), " ")
            ).alias("term"),
        )
        .filter(F.col("term") != "")
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df_counts = tf.groupBy("term").agg(
        F.count(F.lit(1)).alias("df")
    )
    ndocs = tf.agg(F.count_distinct("doc_id").alias("nd"))
    scored = (
        tf.join(F.broadcast(df_counts), "term")
        .join(F.broadcast(ndocs))
        .withColumn(
            "score",
            round_half_up(
                F.col("tf") * F.log(F.col("nd") / F.col("df")), 6
            ),
        )
    )
    win = Window.partitionBy("doc_id").orderBy(
        F.col("score").desc(), F.col("term")
    )
    return (
        scored.withColumn("rk", F.row_number().over(win))
        .filter(F.col("rk") <= _TFIDF_K)
        .select("doc_id", "term", "tf", "score", "rk")
    )


# ---------------------------------------------------------------------------
# Composite quality gate (C4/Gopher-style filter chain)
# ---------------------------------------------------------------------------

_QF_MIN_QUALITY = 0.5
_QF_MAX_DUP_FRAC = 0.3
_QF_MIN_TOKENS, _QF_MAX_TOKENS = 5, 5000
_QF_LANGS = ("en", "de", "fr")

#: reject-reason bits (a document may fail several gates at once)
_QF_BIT_QUALITY, _QF_BIT_REPETITION, _QF_BIT_LENGTH, _QF_BIT_LANG = 1, 2, 4, 8


def q_quality_filter_pipeline(spark, sf):
    """The canonical corpus-preprocessing decision: every document
    gets a keep/drop verdict plus a reject-reason BITMASK (quality=1,
    repetition=2, length=4, language=8) — the auditable form of a
    C4/Gopher filter chain, where knowing *why* a doc dropped matters
    as much as dropping it (reason histograms are how thresholds get
    tuned). All four gates are scan-side codegen over already-
    certified signals; zero shuffles, map-only at any scale."""
    d = _t(spark, sf, "documents")
    w = F.split(TX.normalize_text(F.col("text")), " ")
    q = TX.quality_score(F.col("text"))
    dup = round_half_up(
        F.when(
            F.size(w) > 0,
            1.0 - F.size(F.array_distinct(w)) / F.size(w).cast("double"),
        ).otherwise(F.lit(0.0)),
        6,
    )
    ntok = F.size(w)
    reasons = (
        F.when(q < _QF_MIN_QUALITY, _QF_BIT_QUALITY).otherwise(0)
        + F.when(dup > _QF_MAX_DUP_FRAC, _QF_BIT_REPETITION).otherwise(0)
        + F.when(
            (ntok < _QF_MIN_TOKENS) | (ntok > _QF_MAX_TOKENS),
            _QF_BIT_LENGTH,
        ).otherwise(0)
        + F.when(~F.col("lang").isin(*_QF_LANGS), _QF_BIT_LANG).otherwise(0)
    )
    return d.select(
        "doc_id",
        "lang",
        q.alias("quality"),
        dup.alias("dup_frac"),
        ntok.alias("n_tokens"),
        reasons.cast("int").alias("reject_reasons"),
        (reasons == 0).alias("keep"),
    )


QUERIES = {
    "weighted_sample_per_lang_salted": q_weighted_sample_per_lang_salted,
    "heavy_hitters_topk": q_heavy_hitters_topk,
    "schema_evolution_merge": q_schema_evolution_merge,
    "quarantine_corrupt_rows": q_quarantine_corrupt_rows,
    "collocations_pmi": q_collocations_pmi,
    "dedup_containment": q_dedup_containment,
    "outliers_mad": q_outliers_mad,
    "tfidf_topk_terms": q_tfidf_topk_terms,
    "quality_filter_pipeline": q_quality_filter_pipeline,
}

# the salted variant must return EXACTLY the unsalted sample — same
# oracle, by construction
ORACLES = {
    "weighted_sample_per_lang_salted": _weighted_sample_per_lang_oracle(),
    "heavy_hitters_topk": f"""
        WITH toks AS (
          SELECT lang, unnest({_llm._WORDS}) AS token FROM documents
        ),
        counts AS (
          SELECT lang, token, count(*) AS cnt
          FROM toks WHERE token <> '' GROUP BY 1, 2
        )
        SELECT lang, token, cnt,
               CAST(row_number() OVER (
                 PARTITION BY lang ORDER BY cnt DESC, token
               ) AS INTEGER) AS rk
        FROM counts
        QUALIFY rk <= {_HH_K}
    """,
    "schema_evolution_merge": f"""
        SELECT o_orderpriority,
               count(*) AS n_orders,
               CAST(sum(CASE WHEN EXTRACT(year FROM o_orderdate)
                                  < {_EVOLVE_SPLIT_YEAR}
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_legacy,
               CAST(sum(CASE WHEN EXTRACT(year FROM o_orderdate)
                                  >= {_EVOLVE_SPLIT_YEAR}
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_current,
               {round_half_up_sql(decimal_sum_sql("o_totalprice"), 2)}
                 AS total_price
        FROM orders
        GROUP BY 1
    """,
    "quarantine_corrupt_rows": """
        SELECT lang,
               count(*) AS n_rows,
               CAST(0 AS BIGINT) AS n_corrupt
        FROM documents
        WHERE doc_id % 7 <> 0
        GROUP BY 1
        UNION ALL
        SELECT NULL AS lang,
               count(*) AS n_rows,
               count(*) AS n_corrupt
        FROM documents
        WHERE doc_id % 7 = 0
    """,
    "collocations_pmi": f"""
        WITH wl AS (
          SELECT {_llm._WORDS} AS w FROM documents WHERE len({_llm._WORDS}) > 0
        ),
        uni AS (
          SELECT tok, count(*) AS c_tok
          FROM (SELECT unnest(w) AS tok FROM wl) GROUP BY 1
        ),
        bi AS (
          SELECT bigram, count(*) AS c_bg
          FROM (
            SELECT unnest(list_transform(range(1, len(w)),
                     i -> list_extract(w, i) || ' ' ||
                          list_extract(w, i + 1))) AS bigram
            FROM wl
          ) GROUP BY 1
          HAVING count(*) >= {_PMI_MIN_COUNT}
        ),
        tot AS (
          SELECT (SELECT sum(c_tok) FROM uni) AS n_w,
                 (SELECT sum(len(w) - 1) FROM wl) AS n_bg
        )
        SELECT bigram, c_bg,
               {round_half_up_sql(
                   "ln((c_bg / n_bg) / "
                   "((ua.c_tok / n_w) * (ub.c_tok / n_w)))", 6)} AS pmi
        FROM bi, tot,
             uni ua, uni ub
        WHERE ua.tok = string_split(bigram, ' ')[1]
          AND ub.tok = string_split(bigram, ' ')[2]
        ORDER BY pmi DESC, bigram
        LIMIT {_PMI_TOP}
    """,
    "dedup_containment": f"""
        WITH wl AS (
          SELECT doc_id, {_llm._WORDS} AS w FROM documents
        ),
        sh_all AS (
          SELECT DISTINCT doc_id, unnest({_llm._shingles_sql(3)}) AS shingle
          FROM wl
        ),
        rare AS (
          SELECT shingle FROM sh_all GROUP BY shingle HAVING count(*) <= 50
        ),
        sh AS (
          SELECT sh_all.* FROM sh_all JOIN rare USING (shingle)
        ),
        sizes AS (
          SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id
        ),
        inter AS (
          SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
          FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
          GROUP BY 1, 2
        ),
        scored AS (
          SELECT id_a, id_b,
                 floor((inter / na.n) * 10000 + 0.5) / 10000.0
                   AS cont_a_in_b,
                 floor((inter / nb.n) * 10000 + 0.5) / 10000.0
                   AS cont_b_in_a
          FROM inter
          JOIN sizes na ON id_a = na.doc_id
          JOIN sizes nb ON id_b = nb.doc_id
        )
        SELECT * FROM scored
        WHERE greatest(cont_a_in_b, cont_b_in_a) >= 0.3
    """,
    "outliers_mad": f"""
        WITH med AS (
          SELECT event_type, quantile_cont(value, 0.5) AS med
          FROM events GROUP BY 1
        ),
        dev AS (
          SELECT e.event_type, e.value, m.med,
                 abs(e.value - m.med) AS adev
          FROM events e JOIN med m USING (event_type)
        ),
        mad AS (
          SELECT event_type, quantile_cont(adev, 0.5) AS mad
          FROM dev GROUP BY 1
        )
        SELECT d.event_type,
               count(*) AS n,
               CAST(sum(CASE WHEN d.adev > {_MAD_CUT} * m.mad
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
               {round_half_up_sql("min(d.med)", 6)} AS median_v,
               {round_half_up_sql("min(m.mad)", 6)} AS mad_v
        FROM dev d JOIN mad m USING (event_type)
        GROUP BY 1
    """,
    "tfidf_topk_terms": f"""
        WITH toks AS (
          SELECT doc_id, unnest({_llm._WORDS}) AS term FROM documents
        ),
        tf AS (
          SELECT doc_id, term, count(*) AS tf
          FROM toks WHERE term <> '' GROUP BY 1, 2
        ),
        dfc AS (
          SELECT term, count(*) AS df FROM tf GROUP BY 1
        ),
        nd AS (
          SELECT count(DISTINCT doc_id) AS nd FROM tf
        )
        SELECT doc_id, term, tf,
               {round_half_up_sql("tf * ln(nd / df)", 6)} AS score,
               CAST(row_number() OVER (
                 PARTITION BY doc_id ORDER BY
                 {round_half_up_sql("tf * ln(nd / df)", 6)} DESC, term
               ) AS INTEGER) AS rk
        FROM tf JOIN dfc USING (term) CROSS JOIN nd
        QUALIFY rk <= {_TFIDF_K}
    """,
    "quality_filter_pipeline": f"""
        WITH sig AS (
          SELECT doc_id, lang,
                 {_llm._QUALITY_SQL} AS quality,
                 {_llm._WORDS} AS w
          FROM documents
        ),
        scored AS (
          SELECT doc_id, lang, quality,
                 floor((CASE WHEN len(w) > 0
                        THEN 1.0 - len(list_distinct(w)) / CAST(len(w) AS DOUBLE)
                        ELSE 0.0 END) * 1000000 + 0.5) / 1000000.0 AS dup_frac,
                 CAST(len(w) AS INTEGER) AS n_tokens
          FROM sig
        )
        SELECT doc_id, lang, quality, dup_frac, n_tokens,
               CAST(
                 (CASE WHEN quality < {_QF_MIN_QUALITY}
                       THEN {_QF_BIT_QUALITY} ELSE 0 END)
               + (CASE WHEN dup_frac > {_QF_MAX_DUP_FRAC}
                       THEN {_QF_BIT_REPETITION} ELSE 0 END)
               + (CASE WHEN n_tokens < {_QF_MIN_TOKENS}
                        OR n_tokens > {_QF_MAX_TOKENS}
                       THEN {_QF_BIT_LENGTH} ELSE 0 END)
               + (CASE WHEN lang NOT IN {_QF_LANGS!r}
                       THEN {_QF_BIT_LANG} ELSE 0 END)
               AS INTEGER) AS reject_reasons,
               ((CASE WHEN quality < {_QF_MIN_QUALITY}
                      THEN {_QF_BIT_QUALITY} ELSE 0 END)
              + (CASE WHEN dup_frac > {_QF_MAX_DUP_FRAC}
                      THEN {_QF_BIT_REPETITION} ELSE 0 END)
              + (CASE WHEN n_tokens < {_QF_MIN_TOKENS}
                       OR n_tokens > {_QF_MAX_TOKENS}
                      THEN {_QF_BIT_LENGTH} ELSE 0 END)
              + (CASE WHEN lang NOT IN {_QF_LANGS!r}
                      THEN {_QF_BIT_LANG} ELSE 0 END)) = 0 AS keep
        FROM scored
    """,
}
