"""BM25 full-text relevance ranking over a document corpus.

The retrieval side of a training-data pipeline (quality-aware corpus
selection, targeted decontamination, eval-set mining) needs a ranked
keyword search. BM25 is the standard scoring function; this module
computes it as pure DataFrame algebra — no UDFs, no driver loops.

Plan shape (scale notes for a 100 TB corpus):

- tokenize + document length: one scan-side projection (``split`` on
  the normalized text — the same normalization the dedup family uses).
- term frequencies: explode tokens, filter to the query's terms
  *immediately after the generator* (Catalyst evaluates the IN filter
  before any shuffle), then one hash-aggregate on (doc_id, term).
  The shuffle carries only matching tokens — for a selective query
  that is a vanishing fraction of the corpus.
- corpus stats (N, avg document length) and per-term document
  frequencies are tiny aggregates, broadcast back into the score join.
- scoring sums ≤ |query| contributions per doc; top-k is a
  TakeOrderedAndProject, not a global sort.

Engine-portable determinism: each term's contribution is rounded to
integer micros (exact in a LONG) before summing, so the per-doc score
is independent of partition merge order and reproducible bit-for-bit
by the DuckDB oracle; ranking compares (micros, doc_id) — integers —
so the top-k cut is deterministic in both engines.

No reference parity: the reference engine has no text-retrieval
surface; LLM-pipeline extension family.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from datafusion_archive_spark.functions import text as TX


def bm25_topk(
    df: DataFrame,
    query_terms: Sequence[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-``k`` documents for a bag-of-words query under BM25
    (Lucene's non-negative idf variant: ``ln(1 + (N-df+.5)/(df+.5))``).

    Returns ``(doc_id, score, rank)`` — ``score`` a double equal to
    sum-of-contribution-micros / 1e6, ``rank`` dense from 1.
    """
    terms = sorted(set(query_terms))
    words = F.split(TX.normalize_text(F.col(text_col)), " ")
    base = df.select(F.col(id_col), words.alias("w")).select(
        id_col, "w", F.size("w").alias("dl")
    )

    # corpus-level scalars: one tiny agg, broadcast into every row
    stats = base.agg(
        F.count(F.lit(1)).alias("n_docs"), F.avg("dl").alias("avgdl")
    )

    tf = (
        base.select(id_col, "dl", F.explode("w").alias("token"))
        .filter(F.col("token").isin(list(terms)))
        .groupBy(id_col, "dl", "token")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))

    idf = F.log(
        (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
    )
    contrib = idf * (
        F.col("tf")
        * (k1 + 1.0)
        / (F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl")))
    )
    scored = (
        tf.join(F.broadcast(dfreq), "token")
        .crossJoin(F.broadcast(stats))
        .select(
            id_col,
            F.floor(contrib * 1_000_000 + F.lit(0.5))
            .cast("long")
            .alias("micros"),
        )
        .groupBy(id_col)
        .agg(F.sum("micros").alias("micros"))
    )
    # top-k first (TakeOrderedAndProject — no global sort), THEN rank:
    # the window runs over k rows, not every matching document, so the
    # single-partition window stage is O(k) regardless of corpus size
    topk = scored.orderBy(F.col("micros").desc(), F.col(id_col)).limit(k)
    w = Window.orderBy(F.col("micros").desc(), F.col(id_col))
    return (
        topk.withColumn("rank", F.row_number().over(w))
        .select(
            id_col,
            (F.col("micros") / 1_000_000.0).alias("score"),
            F.col("rank").cast("int").alias("rank"),
        )
    )
