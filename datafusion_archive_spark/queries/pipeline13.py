"""Pipeline wave 13 (round 5, eleventh wave): corpus statistics and
embedding-cluster profiling.

- ``vocab_richness`` — per-language type/token counts, type-token
  ratio, and hapax share: the lexical-diversity screen that flags
  template-y or machine-generated sources in a training corpus.
- ``zipf_fit`` — least-squares slope of log-frequency vs log-rank
  over the frequency head: natural corpora fit slope ≈ −1 (Zipf's
  law); a flat or broken slope is a classic crawl-pathology signal.
- ``readability_scores`` — Flesch reading ease per document from
  sentence/word/vowel-group counts (the syllable proxy that works
  without a dictionary): a standard quality-prior feature.
- ``embedding_centroids`` — per-label centroid norm and within-
  cluster inertia via the sum-of-squares identity
  Σ‖v−c‖² = Σ‖v‖² − n‖c‖², which needs NO second pass joining
  vectors back to centroids: embeddings are consumed in one
  position-exploded aggregate.

All text statistics reuse the engine-portable normalization
(functions.text.normalize_text ↔ the documented DuckDB twin), so
the oracles pin identical tokenizations. The reference has neither
text functions nor arrays (``/root/reference/ROADMAP.md``).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from datafusion_archive_spark.functions import text as TX
from datafusion_archive_spark.queries.llm import _NORM, _WORDS
from datafusion_archive_spark.operators.util import load_table


def _t(spark, sf_dir, name):
    return load_table(spark, sf_dir, name)


def _tokens(spark, sf):
    d = _t(spark, sf, "documents").filter(F.col("text").isNotNull())
    return d.select(
        "lang",
        F.explode(
            F.split(TX.normalize_text(F.col("text")), " ")
        ).alias("token"),
    ).filter(F.length("token") > 0)


# ---------------------------------------------------------------------------
# Vocabulary richness
# ---------------------------------------------------------------------------


def q_vocab_richness(spark, sf):
    """Per-language lexical diversity: tokens, types, type-token
    ratio, hapax count and share. Scale: one (lang, token) aggregate
    — the same shape as vocab_topk — then a per-language rollup;
    ratios are exact integer-count divisions."""
    freq = _tokens(spark, sf).groupBy("lang", "token").agg(
        F.count(F.lit(1)).alias("f")
    )
    return freq.groupBy("lang").agg(
        F.sum("f").alias("n_tokens"),
        F.count(F.lit(1)).alias("n_types"),
        F.round(F.count(F.lit(1)) / F.sum("f"), 6).alias("ttr"),
        F.sum((F.col("f") == 1).cast("long")).alias("n_hapax"),
        F.round(
            F.sum((F.col("f") == 1).cast("long")) / F.count(F.lit(1)), 6
        ).alias("hapax_share"),
    )


# ---------------------------------------------------------------------------
# Zipf fit
# ---------------------------------------------------------------------------

_ZIPF_HEAD = 200


def q_zipf_fit(spark, sf):
    """Least-squares slope (and r²) of ln(freq) on ln(rank) over the
    200 most frequent tokens corpus-wide — the Zipf exponent. The
    regression runs as explicit co-moment sums over the tiny ranked
    head (deterministic rank: freq desc, token asc), so both engines
    execute identical arithmetic; a natural corpus lands near −1.

    Scale: one token-frequency aggregate, a 200-row TakeOrdered, and
    closed-form math — the corpus never sorts globally."""
    freq = _tokens(spark, sf).groupBy("token").agg(
        F.count(F.lit(1)).alias("f")
    )
    head = freq.orderBy(F.col("f").desc(), F.col("token")).limit(
        _ZIPF_HEAD
    )
    from pyspark.sql import Window

    ranked = head.withColumn(
        "r",
        F.row_number().over(
            Window.orderBy(F.col("f").desc(), F.col("token"))
        ),
    ).select(
        F.log(F.col("r").cast("double")).alias("x"),
        F.log(F.col("f").cast("double")).alias("y"),
    )
    s = ranked.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    vx = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    vy = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    return s.select(
        F.col("n").cast("long").alias("n_head"),
        F.round(num / vx, 4).alias("zipf_slope"),
        F.round(num * num / (vx * vy), 4).alias("r2"),
    )


# ---------------------------------------------------------------------------
# Readability
# ---------------------------------------------------------------------------


def q_readability_scores(spark, sf):
    """Flesch reading ease per document from regex counts: words
    (whitespace tokens), sentences ([.!?]+ boundaries, floor 1), and
    vowel groups [aeiouy]+ as the dictionary-free syllable proxy.
    206.835 − 1.015·(W/S) − 84.6·(Syl/W), exact integer inputs.

    Scale: pure scan-side regex codegen, zero Exchange — the same
    shape as text_stats."""
    d = _t(spark, sf, "documents").filter(F.col("text").isNotNull())
    norm = TX.normalize_text(F.col("text"))
    words = F.size(F.split(norm, " "))
    sents = F.greatest(
        F.size(
            F.filter(
                F.transform(
                    F.split(F.col("text"), "[.!?]+"),
                    lambda s: F.trim(s),
                ),
                lambda s: F.length(s) > 0,
            )
        ),
        F.lit(1),
    )
    syls = F.size(
        F.regexp_extract_all(F.lower(F.col("text")), F.lit("[aeiouy]+"), 0)
    )
    flesch = (
        F.lit(206.835)
        - F.lit(1.015) * (words / sents)
        - F.lit(84.6) * (syls / words)
    )
    return d.select(
        "doc_id",
        words.alias("n_words"),
        sents.alias("n_sentences"),
        syls.alias("n_vowel_groups"),
        F.round(flesch, 4).alias("flesch"),
    )


# ---------------------------------------------------------------------------
# Embedding centroids
# ---------------------------------------------------------------------------


def q_embedding_centroids(spark, sf):
    """Per-label vector count, centroid L2 norm, and within-cluster
    inertia via Σ‖v−c‖² = Σ‖v‖² − n·‖c‖² — no centroid join-back
    pass. Rounded coarsely (2dp) because float-sum order differs
    across engines; the identity itself is exact.

    Scale: posexplode emits (label, pos, val) — 64 floats per vector
    — into ONE aggregate keyed (label, pos), then a per-label rollup.
    Payload vectors never shuffle whole."""
    e = _t(spark, sf, "embeddings")
    pe = e.select(
        "label",
        F.posexplode(F.col("embedding").cast("array<double>")).alias(
            "pos", "val"
        ),
    )
    per_dim = pe.groupBy("label", "pos").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("val").alias("sv"),
        F.sum(F.col("val") * F.col("val")).alias("svv"),
    )
    per_label = per_dim.groupBy("label").agg(
        F.max("n").alias("n_vecs"),
        F.sum("svv").alias("_total_sq"),
        F.sum(
            (F.col("sv") / F.col("n")) * (F.col("sv") / F.col("n"))
        ).alias("_c_sq"),
    )
    return per_label.select(
        "label",
        "n_vecs",
        F.round(F.sqrt(F.col("_c_sq")), 4).alias("centroid_norm"),
        F.round(
            F.col("_total_sq") - F.col("n_vecs") * F.col("_c_sq"), 2
        ).alias("inertia"),
    )


QUERIES = {
    "vocab_richness": q_vocab_richness,
    "zipf_fit": q_zipf_fit,
    "readability_scores": q_readability_scores,
    "embedding_centroids": q_embedding_centroids,
}

ORACLES = {
    "vocab_richness": f"""
        WITH toks AS (
          SELECT lang, unnest({_WORDS}) AS token
          FROM documents WHERE text IS NOT NULL
        ),
        freq AS (
          SELECT lang, token, count(*) AS f FROM toks
          WHERE length(token) > 0 GROUP BY 1, 2
        )
        SELECT lang,
               CAST(sum(f) AS BIGINT) AS n_tokens,
               count(*) AS n_types,
               round(CAST(count(*) AS DOUBLE) / sum(f), 6) AS ttr,
               CAST(sum(CASE WHEN f = 1 THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_hapax,
               round(CAST(sum(CASE WHEN f = 1 THEN 1 ELSE 0 END)
                     AS DOUBLE) / count(*), 6) AS hapax_share
        FROM freq
        GROUP BY lang
    """,
    "zipf_fit": f"""
        WITH toks AS (
          SELECT unnest({_WORDS}) AS token
          FROM documents WHERE text IS NOT NULL
        ),
        freq AS (
          SELECT token, count(*) AS f FROM toks
          WHERE length(token) > 0 GROUP BY 1
        ),
        head AS (
          SELECT f, row_number() OVER (ORDER BY f DESC, token) AS r
          FROM freq ORDER BY f DESC, token LIMIT {_ZIPF_HEAD}
        ),
        xy AS (
          SELECT ln(CAST(r AS DOUBLE)) AS x, ln(CAST(f AS DOUBLE)) AS y
          FROM head
        ),
        s AS (
          SELECT CAST(count(*) AS DOUBLE) AS n,
                 sum(x) AS sx, sum(y) AS sy,
                 sum(x * x) AS sxx, sum(y * y) AS syy,
                 sum(x * y) AS sxy
          FROM xy
        )
        SELECT CAST(n AS BIGINT) AS n_head,
               round((n * sxy - sx * sy) / (n * sxx - sx * sx), 4)
                 AS zipf_slope,
               round((n * sxy - sx * sy) * (n * sxy - sx * sy)
                     / ((n * sxx - sx * sx) * (n * syy - sy * sy)), 4)
                 AS r2
        FROM s
    """,
    "readability_scores": f"""
        WITH base AS (
          SELECT doc_id,
                 len(regexp_split_to_array({_NORM}, ' ')) AS n_words,
                 greatest(len(list_filter(
                   list_transform(
                     string_split_regex(text, '[.!?]+'), s -> trim(s)),
                   s -> length(s) > 0)), 1) AS n_sentences,
                 len(regexp_extract_all(lower(text), '[aeiouy]+'))
                   AS n_vowel_groups
          FROM documents WHERE text IS NOT NULL
        )
        SELECT doc_id,
               CAST(n_words AS INTEGER) AS n_words,
               CAST(n_sentences AS INTEGER) AS n_sentences,
               CAST(n_vowel_groups AS INTEGER) AS n_vowel_groups,
               round(206.835
                     - 1.015 * (CAST(n_words AS DOUBLE) / n_sentences)
                     - 84.6 * (CAST(n_vowel_groups AS DOUBLE) / n_words),
                     4) AS flesch
        FROM base
    """,
    "embedding_centroids": """
        WITH pe AS (
          SELECT e.label, t.i AS pos,
                 CAST(e.embedding[t.i + 1] AS DOUBLE) AS val
          FROM embeddings e, range(0, 64) t(i)
        ),
        per_dim AS (
          SELECT label, pos, count(*) AS n,
                 sum(val) AS sv, sum(val * val) AS svv
          FROM pe GROUP BY 1, 2
        ),
        per_label AS (
          SELECT label,
                 max(n) AS n_vecs,
                 sum(svv) AS total_sq,
                 sum((sv / n) * (sv / n)) AS c_sq
          FROM per_dim GROUP BY label
        )
        SELECT CAST(label AS INTEGER) AS label,
               CAST(n_vecs AS BIGINT) AS n_vecs,
               round(sqrt(c_sq), 4) AS centroid_norm,
               round(total_sq - n_vecs * c_sq, 2) AS inertia
        FROM per_label
    """,
}
