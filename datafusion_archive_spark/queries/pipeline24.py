"""Pipeline wave 24 (round 5, twenty-second wave): sketch
self-auditing, corpus novelty, and embedding-column QA.

- ``minhash_estimate_audit`` — the sketch-quality audit: for every
  LSH candidate pair, the MinHash-ESTIMATED Jaccard next to the
  EXACT shingle Jaccard and the absolute error. The operator that
  tells you whether 16 hashes are enough before you dedup 100 TB
  with them. Exact side is computed only for the candidate ids
  (semi-join first), so the audit costs candidates × shingles, not
  corpus².
- ``ngram_novelty_rate`` — per-document novelty: the share of a
  doc's distinct 3-word shingles that appear NOWHERE else in the
  corpus (df = 1). Low novelty = boilerplate/template; the
  complement of the cross-doc duplication signals.
- ``embedding_norm_outliers`` — the 10 vectors with the most
  atypical L2 norms (|z| vs the corpus norm distribution):
  truncated, zeroed, or exploding embeddings are the first thing a
  similarity pipeline should quarantine.
- ``embedding_dim_variance`` — per-dimension mean/variance/extrema
  profile: dead (near-zero-variance) or saturated dimensions
  indicate an export bug and silently poison cosine similarity.

The reference has no arrays, hashing, or text operations
(``/root/reference/ROADMAP.md``).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from datafusion_archive_spark.functions import text as TX
from datafusion_archive_spark.functions.rounding import (
    round_half_up,
    round_half_up_sql,
)
from datafusion_archive_spark.operators import dedup
from datafusion_archive_spark.queries.llm import (
    _MINHASH_BANDS,
    _N_MINHASH,
    _WORDS,
    _minhash_pair_ctes,
    _shingles_sql,
)
from datafusion_archive_spark.operators.util import (
    cached,
    load_table,
    spread,
)


def _t(spark, sf_dir, name):
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# MinHash estimate vs exact audit
# ---------------------------------------------------------------------------


def q_minhash_estimate_audit(spark, sf):
    """Per LSH candidate pair (threshold 0.25, the certified
    ``dedup_minhash_lsh`` configuration): estimated Jaccard, exact
    shingle Jaccard, and |error|.

    Scale: candidates come from the banded join (linear); the exact
    side restricts the shingle self-join to candidate ids via
    semi-joins BEFORE intersecting, so the quadratic kernel touches
    only audited documents."""
    docs = _t(spark, sf, "documents")
    # cached: the candidate pairs feed the id set (twice) and the
    # final join — uncached, the whole minhash+banding pipeline would
    # re-run three times
    pairs = cached(
        dedup.minhash_lsh_pairs(
            docs, num_hashes=_N_MINHASH, bands=_MINHASH_BANDS, k=3,
            threshold=0.25,
        )
    )
    ids = pairs.select(F.col("id_a").alias("id")).union(
        pairs.select("id_b")
    ).distinct()
    # Round 15: the id restriction moves BEFORE the shingle explode —
    # the old shape exploded (and shuffled a distinct over) the WHOLE
    # corpus's shingles and only then semi-joined to the ~|candidates|
    # audited ids, which at 100 TB explodes every document to audit a
    # sliver. Semi-joining the docs scan first (broadcast: the id set
    # is candidate-bounded) explodes only audited documents; the old
    # (id, shingle)-level .distinct() was a full shuffle of the
    # exploded corpus doing nothing — array_distinct already
    # de-duplicates within a document and ids are unique per row.
    audited = docs.filter(F.col("text").isNotNull()).join(
        F.broadcast(ids), docs["doc_id"] == ids["id"], "left_semi"
    )
    # cached: the restricted shingle set feeds the sizes and both
    # sides of the intersection self-join
    exf = cached(
        audited.select(
            F.col("doc_id").alias("id"),
            F.explode(
                F.array_distinct(TX.word_shingles(F.col("text"), 3))
            ).alias("shingle"),
        )
    )
    sizes = exf.groupBy("id").agg(F.count(F.lit(1)).alias("n"))
    a = exf.alias("a")
    b = exf.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("i"))
    )
    sa = sizes.select(F.col("id").alias("id_a"), F.col("n").alias("na"))
    sb = sizes.select(F.col("id").alias("id_b"), F.col("n").alias("nb"))
    exact = (
        pairs.join(inter, ["id_a", "id_b"], "left_outer")
        .join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn("i", F.coalesce("i", F.lit(0)))
        .withColumn(
            "exact_jaccard",
            round_half_up(
                F.col("i") / (F.col("na") + F.col("nb") - F.col("i")), 4
            ),
        )
    )
    return exact.select(
        "id_a",
        "id_b",
        "est_jaccard",
        "exact_jaccard",
        F.round(F.abs(F.col("est_jaccard") - F.col("exact_jaccard")), 4
                ).alias("abs_err"),
    )


# ---------------------------------------------------------------------------
# N-gram novelty
# ---------------------------------------------------------------------------


def q_ngram_novelty_rate(spark, sf):
    """Per document: distinct 3-shingle count, how many of them are
    corpus-unique (df = 1), and the novelty ratio. Boilerplate scores
    near 0; fresh text near 1.

    Scale: one (shingle → df) rollup joined back onto the exploded
    shingles — shingle strings shuffle once, text never does."""
    docs = spread(
        _t(spark, sf, "documents").filter(F.col("text").isNotNull())
    )
    # round 15: spread parallelizes the shingle kernel off a
    # single-task small-file scan, and the old corpus-wide
    # .distinct() exchange is dropped — array_distinct already makes
    # each document contribute every shingle at most once, and
    # doc_id never collides across documents, so the rows are
    # globally unique by construction
    ex = docs.select(
        "doc_id",
        F.explode(
            F.array_distinct(TX.word_shingles(F.col("text"), 3))
        ).alias("shingle"),
    )
    dfc = ex.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
    return (
        ex.join(dfc, "shingle")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum(F.when(F.col("df") == 1, 1).otherwise(0)).alias(
                "n_unique"
            ),
            F.round(
                F.avg(F.when(F.col("df") == 1, 1.0).otherwise(0.0)), 6
            ).alias("novelty"),
        )
    )


# ---------------------------------------------------------------------------
# Embedding norm outliers
# ---------------------------------------------------------------------------

_NORM_TOPK = 10


def q_embedding_norm_outliers(spark, sf):
    """The 10 vectors whose L2 norm deviates most from the corpus
    norm distribution (|z|, ties → vec_id): the embedding-QA pass
    that catches zeroed, truncated, or exploding vectors before they
    poison similarity search.

    Scale: the norm is a scan-side array fold; mean/sd broadcast;
    TakeOrdered for the top-k."""
    e = _t(spark, sf, "embeddings")
    norm = F.sqrt(
        F.aggregate(
            F.col("embedding"),
            F.lit(0.0),
            lambda acc, x: acc + x.cast("double") * x.cast("double"),
        )
    )
    normed = e.select("vec_id", norm.alias("l2"))
    stats = normed.agg(
        F.avg("l2").alias("mu"), F.stddev_samp("l2").alias("sd")
    )
    z = (F.col("l2") - F.col("mu")) / F.col("sd")
    return (
        normed.join(F.broadcast(stats))
        .select(
            "vec_id",
            F.round("l2", 6).alias("l2_norm"),
            F.round(z, 4).alias("z"),
        )
        .orderBy(F.desc(F.abs(F.col("z"))), "vec_id")
        .limit(_NORM_TOPK)
    )


# ---------------------------------------------------------------------------
# Embedding dimension profile
# ---------------------------------------------------------------------------


def q_embedding_dim_variance(spark, sf):
    """Per-dimension profile of the embedding column: mean, sample
    variance, min, max for each of the 64 dimensions. Dead
    (near-zero-variance) or saturated dimensions surface immediately.

    Scale: posexplode → (dim) rollup — the shuffle carries (dim,
    value) pairs with map-side combine into 64 cells."""
    e = _t(spark, sf, "embeddings")
    dims = e.select(
        F.posexplode(F.col("embedding")).alias("dim", "x")
    ).select("dim", F.col("x").cast("double").alias("x"))
    return dims.groupBy("dim").agg(
        F.round(F.avg("x"), 6).alias("mean"),
        F.round(F.var_samp("x"), 6).alias("variance"),
        F.round(F.min("x"), 6).alias("min_x"),
        F.round(F.max("x"), 6).alias("max_x"),
    )


QUERIES = {
    "minhash_estimate_audit": q_minhash_estimate_audit,
    "ngram_novelty_rate": q_ngram_novelty_rate,
    "embedding_norm_outliers": q_embedding_norm_outliers,
    "embedding_dim_variance": q_embedding_dim_variance,
}

ORACLES = {
    "minhash_estimate_audit": _minhash_pair_ctes(0.25) + f"""
        , ex AS (
          SELECT DISTINCT doc_id AS id,
                 unnest(list_distinct({_shingles_sql(3)})) AS shingle
          FROM (SELECT doc_id, {_WORDS} AS w FROM documents
                WHERE text IS NOT NULL)
        ),
        ids AS (
          SELECT id_a AS id FROM pairs
          UNION SELECT id_b FROM pairs
        ),
        exf AS (SELECT * FROM ex WHERE id IN (SELECT id FROM ids)),
        sizes AS (SELECT id, count(*) AS n FROM exf GROUP BY 1),
        inter AS (
          SELECT a.id AS id_a, b.id AS id_b, count(*) AS i
          FROM exf a JOIN exf b
            ON a.shingle = b.shingle AND a.id < b.id
          GROUP BY 1, 2
        )
        SELECT p.id_a, p.id_b, p.est_jaccard,
               {round_half_up_sql("coalesce(i.i, 0) / (sa.n + sb.n - coalesce(i.i, 0))", 4)} AS exact_jaccard,
               round(abs(p.est_jaccard - {round_half_up_sql("coalesce(i.i, 0) / (sa.n + sb.n - coalesce(i.i, 0))", 4)}), 4) AS abs_err
        FROM pairs p
        LEFT JOIN inter i USING (id_a, id_b)
        JOIN sizes sa ON sa.id = p.id_a
        JOIN sizes sb ON sb.id = p.id_b
    """,
    "ngram_novelty_rate": f"""
        WITH ex AS (
          SELECT DISTINCT doc_id,
                 unnest(list_distinct({_shingles_sql(3)})) AS shingle
          FROM (SELECT doc_id, {_WORDS} AS w FROM documents
                WHERE text IS NOT NULL)
        ),
        dfc AS (SELECT shingle, count(*) AS df FROM ex GROUP BY 1)
        SELECT e.doc_id,
               count(*) AS n_shingles,
               CAST(sum(CASE WHEN d.df = 1 THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_unique,
               round(avg(CASE WHEN d.df = 1 THEN 1.0 ELSE 0.0 END), 6)
                 AS novelty
        FROM ex e JOIN dfc d USING (shingle)
        GROUP BY e.doc_id
    """,
    "embedding_norm_outliers": f"""
        WITH normed AS (
          SELECT vec_id,
                 sqrt(list_sum(list_transform(embedding,
                   x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS l2
          FROM embeddings
        ),
        stats AS (
          SELECT avg(l2) AS mu, stddev_samp(l2) AS sd FROM normed
        )
        SELECT vec_id,
               round(l2, 6) AS l2_norm,
               round((l2 - mu) / sd, 4) AS z
        FROM normed CROSS JOIN stats
        ORDER BY abs((l2 - mu) / sd) DESC, vec_id
        LIMIT {_NORM_TOPK}
    """,
    "embedding_dim_variance": """
        WITH dims AS (
          SELECT generate_subscripts(embedding, 1) - 1 AS dim,
                 CAST(unnest(embedding) AS DOUBLE) AS x
          FROM embeddings
        )
        SELECT CAST(dim AS INTEGER) AS dim,
               round(avg(x), 6) AS mean,
               round(var_samp(x), 6) AS variance,
               round(min(x), 6) AS min_x,
               round(max(x), 6) AS max_x
        FROM dims GROUP BY dim
    """,
}
