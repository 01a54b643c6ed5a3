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
from datafusion_archive_spark.queries import llm as _llm
from datafusion_archive_spark.queries.pipeline2 import (
    _weighted_sample_per_lang_oracle,
)

_IO_BASE = "/root/repo/.tmp_io"


def _t(spark, sf_dir, name):
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# ---------------------------------------------------------------------------
# Skew-proof per-language sampling
# ---------------------------------------------------------------------------

_SALT_BUCKETS = 8
_PER_LANG_K = 20


def q_weighted_sample_per_lang_salted(spark, sf):
    """The salted two-phase variant of ``weighted_sample_per_lang``:
    rank within (lang, salt) first, keep the per-salt top-k, then
    re-rank the surviving <= salt_buckets x k rows per language.

    Semantics are identical by a pigeonhole argument — any row in a
    language's true top-k is necessarily in the top-k of its own salt
    bucket — so this row must hash-match the unsalted query's oracle.
    The point is the plan shape: the heavy window sort runs over
    (lang, salt) — ``_SALT_BUCKETS`` sub-partitions per language — so
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
    salt = (TX.hash64(F.col("doc_id").cast("string"), 23) % _SALT_BUCKETS)
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
    uni = (
        words.select(F.explode("w").alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("c_tok"))
    )
    bi = (
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
        .filter(F.col("c_bg") >= _PMI_MIN_COUNT)
    )
    n_w = uni.agg(F.sum("c_tok").alias("n_w"))
    n_bg = words.select(
        F.sum(F.size("w") - 1).alias("n_bg")
    )
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


QUERIES = {
    "weighted_sample_per_lang_salted": q_weighted_sample_per_lang_salted,
    "heavy_hitters_topk": q_heavy_hitters_topk,
    "schema_evolution_merge": q_schema_evolution_merge,
    "quarantine_corrupt_rows": q_quarantine_corrupt_rows,
    "collocations_pmi": q_collocations_pmi,
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
}
