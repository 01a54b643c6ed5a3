"""Pipeline wave 64 (round 5, sixty-second wave): winnowing — the
MOSS local fingerprinting algorithm, the guarantee-bearing member of
the dedup family.

Construction shared by both queries: normalized text → all
_K-character gram positions → portable 60-bit hash per gram → for
every window of _WIN consecutive positions select the minimal
(hash, position) key (lexicographic on the zero-padded key string —
identical tie-breaking in any engine) → the DISTINCT selected keys
are the document's fingerprints. Winnowing's guarantee: any shared
substring of length ≥ _K + _WIN − 1 yields at least one shared
fingerprint, with expected density 2/(_WIN+1) — unlike the certified
MinHash/SimHash waves (global similarity), winnowing finds LOCAL
copies.

- ``winnowing_fingerprints`` — per-source fingerprint statistics:
  positions, selected fingerprints, observed density (tests pin it
  near 2/(w+1)).
- ``moss_shared_fingerprints`` — the plagiarism readout: top-10
  document pairs by count of shared selected fingerprint hashes,
  restricted to fingerprints appearing in at most ``_MAX_HASH_DF``
  documents. The document-frequency cap is part of the published
  MOSS design (Schleimer et al., SIGMOD 2003 §5: fingerprints shared
  by many documents are boilerplate, not copying) and is also the
  scale guard: without it the hash self-join enumerates C(df, 2)
  rows per fingerprint, and the synthetic corpus's boilerplate
  8-grams already make that QUADRATIC between the certified scales
  (sf0.01 → sf0.1 is 10× docs but 1.08M → 107M join candidates).
  With the cap, per-hash work is bounded by C(_MAX_HASH_DF, 2) and
  total candidates track the distinct-hash count — linear in docs.

The reference has no string functions (``/root/reference/ROADMAP.md``).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from datafusion_archive_spark.functions import text as TX
from datafusion_archive_spark.operators.util import spread
from datafusion_archive_spark.queries.llm import _hash64_sql, _NORM

_K = 8
_WIN = 4
_SEED = 5
_TOP = 10
_MAX_HASH_DF = 50


def _normed(spark, sf):
    return (
        spark.read.parquet(f"{sf}/documents.parquet")
        .filter(F.col("text").isNotNull())
        .select(
            "doc_id",
            "source",
            TX.normalize_text(F.col("text")).alias("t"),
        )
        .filter(F.length("t") >= _K + _WIN - 1)
    )


def _selected(spark, sf):
    return _selected_from(_normed(spark, sf))


def _selected_sets(d):
    """Winnowing selection over a pre-normalized ``(doc_id, source,
    t)`` frame, one row per document: ``(doc_id, source, n_pos,
    sels)`` with ``sels`` the distinct selected keys.

    Round 15 (guide §2.4): the selection's only irreducible shuffle
    is the per-document window sort; everything after it is
    per-document and now stays in that partitioning. The old final
    ``.distinct()`` was a second corpus-wide Exchange carrying every
    selected key; ``groupBy(doc_id)`` + ``collect_set`` computes the
    same per-document key set WITHOUT a new Exchange (the hash
    aggregate's required distribution is satisfied by the window's
    hash(doc_id) partitioning), because (doc_id, sel) never collides
    across documents — per-doc distinct ≡ global distinct. ``source``
    is constant per document (min = that constant) and ``max_p`` —
    constant per document by construction — IS the position count,
    which also lets the fingerprint-stats query drop its second
    documents scan. Documents with fewer than _WIN positions have no
    surviving rows (the max_p filter), exactly as before.

    (An array-HOF formulation with zero window shuffle was measured
    and REJECTED this round: interpreted per-element md5 + per-window
    slice/array_min lost to the codegen'd window by ~1.5×;
    OPTIMIZATION_r15.md has the numbers.)

    Memory bound of the set form (ADVICE r15): ``collect_set``
    materializes one document's whole key set in a single aggregation
    buffer — per-row state is O(document length): each selected key
    is a 26-char string (19-digit hash + 7-digit position), ≤ n_pos
    keys per document, so a 10 MB document bounds at ~10^7 positions
    × ~26 B ≈ 260 MB worst case, though winnowing selects ≪ 1 key
    per position (~2/(_WIN+1) of positions in expectation, ~50 MB
    for that document). The row-form ``_selected_from`` (used by the
    pairwise/probe paths) has no per-doc single-row state and remains
    the at-scale shape for corpora with unbounded document sizes; the
    set form serves the per-source STATS queries, whose inputs are
    length-capped upstream by the normalization filter.

    ``spread`` before the explode (round 15): the documents scan is
    one task on a small file, which serialized every position's md5
    on one core — the hashing stage, not the window, was the measured
    wall (3.8 of 5.8 s at sf0.1). Same guard the shingle operators
    already use; a no-op on any at-scale table."""
    pos = spread(d).select(
        "doc_id",
        "source",
        "t",
        F.explode(
            F.sequence(F.lit(1), F.length("t") - (_K - 1))
        ).alias("p"),
    )
    keyed = pos.select(
        "doc_id",
        "source",
        "p",
        F.concat(
            F.lpad(
                TX.hash64(
                    F.expr(f"substr(t, p, {_K})"), _SEED
                ).cast("string"),
                19,
                "0",
            ),
            F.lpad(F.col("p").cast("string"), 7, "0"),
        ).alias("key"),
    )
    w = Window.partitionBy("doc_id").orderBy("p").rowsBetween(
        0, _WIN - 1
    )
    w_cnt = Window.partitionBy("doc_id")
    mins = keyed.select(
        "doc_id",
        "source",
        "p",
        F.min("key").over(w).alias("sel"),
        F.max("p").over(w_cnt).alias("max_p"),
    ).filter(F.col("p") <= F.col("max_p") - (_WIN - 1))
    return mins.groupBy("doc_id").agg(
        F.min("source").alias("source"),
        F.max("max_p").alias("n_pos"),
        F.collect_set("sel").alias("sels"),
    )


def _selected_from(d):
    """Row-form winnowing selection — split from :func:`_selected` so
    the scale probe can run the EXACT certified kernel on synthetic
    corpora (one row per (doc, selected key), as always)."""
    return _selected_sets(d).select(
        "doc_id", "source", F.explode("sels").alias("sel")
    )


def q_winnowing_fingerprints(spark, sf):
    """Per-source winnowing density statistics.

    Round 15: reads the per-document set form directly — n_sel is the
    set size and n_pos rides out of the same window pass (max_p), so
    the old explode → per-doc count → join against a SECOND documents
    scan collapses into the selection pass plus one per-source
    aggregate. The old inner join kept exactly the documents with
    n_pos ≥ _WIN, which is exactly the set-form's row set."""
    s = _selected_sets(_normed(spark, sf))
    return (
        s.select("source", "n_pos", F.size("sels").alias("n_sel"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_pos").alias("n_positions"),
            F.sum("n_sel").alias("n_fingerprints"),
            F.round(
                F.sum("n_sel") / F.sum("n_pos").cast("double"), 6
            ).alias("density"),
        )
        .orderBy("source")
    )


def q_moss_shared_fingerprints(spark, sf):
    """Top-10 doc pairs by shared RARE winnowing fingerprint hashes
    (document frequency <= _MAX_HASH_DF — see the module docstring:
    the MOSS boilerplate filter, which is also what keeps the self-
    join linear in documents instead of quadratic)."""
    from datafusion_archive_spark.operators.util import cached

    # cached (registry-released): the winnowing selection (per-char
    # explode + window min — the heaviest stage) feeds FOUR plan
    # branches after the df-cap join (rare's groupBy plus both join
    # sides); uncached it would rely on ReusedExchange kicking in,
    # the exact fan-out-recompute class the plan-scan gate exists
    # for. Round 15: the hash prefixes are de-duplicated INSIDE each
    # document's key set (array ops on the set rows) instead of a
    # corpus-wide DISTINCT Exchange over every (doc_id, h) — doc_id
    # never collides across documents, so per-doc distinct ≡ global
    # distinct.
    sel = cached(
        _selected_sets(_normed(spark, sf)).select(
            "doc_id",
            F.explode(
                F.array_distinct(
                    F.transform(
                        F.col("sels"),
                        lambda s: F.substring(s, 1, 19),
                    )
                )
            ).alias("h"),
        )
    )
    rare = (
        sel.groupBy("h")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") <= _MAX_HASH_DF)
        .select("h")
    )
    sel = sel.join(rare, "h")
    a = sel.alias("a")
    b = sel.alias("b")
    return (
        a.join(
            b,
            (F.col("a.h") == F.col("b.h"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
        )
        .agg(F.count(F.lit(1)).alias("shared"))
        .orderBy(F.desc("shared"), "doc_a", "doc_b")
        .limit(_TOP)
    )


QUERIES = {
    "winnowing_fingerprints": q_winnowing_fingerprints,
    "moss_shared_fingerprints": q_moss_shared_fingerprints,
}

_SEL_SQL = f"""
        norm AS (
          SELECT doc_id, source, {_NORM} AS t
          FROM documents
          WHERE text IS NOT NULL
            AND length({_NORM}) >= {_K + _WIN - 1}
        ),
        pos AS (
          SELECT doc_id, source, t,
                 unnest(range(1, length(t) - {_K - 2})) AS p
          FROM norm
        ),
        keyed AS (
          SELECT doc_id, source, p,
                 lpad(CAST(
                   {_hash64_sql(f"substr(t, CAST(p AS INT), {_K})", _SEED)}
                   AS VARCHAR), 19, '0')
                 || lpad(CAST(p AS VARCHAR), 7, '0') AS key
          FROM pos
        ),
        mins AS (
          SELECT doc_id, source, p,
                 min(key) OVER (PARTITION BY doc_id ORDER BY p
                   ROWS BETWEEN CURRENT ROW AND {_WIN - 1} FOLLOWING)
                   AS sel,
                 max(p) OVER (PARTITION BY doc_id) AS max_p
          FROM keyed
        ),
        selected AS (
          SELECT DISTINCT doc_id, source, sel
          FROM mins WHERE p <= max_p - {_WIN - 1}
        )
"""

ORACLES = {
    "winnowing_fingerprints": f"""
        WITH {_SEL_SQL},
        per_doc AS (
          SELECT doc_id, source, count(*) AS n_sel
          FROM selected GROUP BY 1, 2
        ),
        sizes AS (
          SELECT doc_id, length(t) - {_K - 1} AS n_pos FROM norm
          WHERE length(t) - {_K - 1} >= {_WIN}
        )
        SELECT p.source,
               count(*) AS n_docs,
               CAST(sum(s.n_pos) AS BIGINT) AS n_positions,
               CAST(sum(p.n_sel) AS BIGINT) AS n_fingerprints,
               round(CAST(sum(p.n_sel) AS DOUBLE) / sum(s.n_pos), 6)
                 AS density
        FROM per_doc p JOIN sizes s ON p.doc_id = s.doc_id
        GROUP BY 1
        ORDER BY 1
    """,
    "moss_shared_fingerprints": f"""
        WITH {_SEL_SQL},
        all_hashes AS (
          SELECT DISTINCT doc_id, substr(sel, 1, 19) AS h
          FROM selected
        ),
        -- MOSS boilerplate filter: fingerprints in more than
        -- {_MAX_HASH_DF} documents are shared prose, not copying,
        -- and each would contribute C(df, 2) join rows (quadratic
        -- between sf0.01 and sf0.1 on this corpus without the cap)
        hashes AS (
          SELECT doc_id, h FROM all_hashes
          WHERE h IN (SELECT h FROM all_hashes
                      GROUP BY 1 HAVING count(*) <= {_MAX_HASH_DF})
        )
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               count(*) AS shared
        FROM hashes a JOIN hashes b
          ON a.h = b.h AND a.doc_id < b.doc_id
        GROUP BY 1, 2
        ORDER BY shared DESC, doc_a, doc_b
        LIMIT {_TOP}
    """,
}
