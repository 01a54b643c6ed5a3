"""Byte-pair-encoding merge training — the iterative tokenizer-prep
pass (Sennrich et al. 2016) expressed Spark-first.

Scale design: the ONLY corpus-sized operation is the initial word-
frequency aggregation (one scan, one shuffle on the word). Every merge
iteration runs over the DISTINCT-WORD table — vocab-sized, orders of
magnitude below the corpus at any scale — and the only data that ever
reaches the driver is the single argmax pair per iteration (bounded:
``n_merges`` rows total, the same documented pattern as the IVF probed-
id collect in operators/similarity.py). Pair extraction and the merge
rewrite are pure JVM expressions (array transform + regexp_replace), no
Python in the loop.

The reference engine has no tokenizer surface (its roadmap stops at
batch SQL, ``/root/reference/ROADMAP.md:36-56``); this operator belongs
to the training-data-pipeline extension mandate. Correctness is pinned
differentially against a pure-Python reference BPE in
tests/test_round5b.py — the op is iterative and not SQL-expressible, so
its registry row is rows-only by design.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

#: end-of-word marker, as in the original BPE formulation — keeps
#: merges from crossing word boundaries when pairs are counted.
EOW = "</w>"


def _quote(sym: str) -> str:
    """Literal-quote a symbol for a Java regex (\\Q…\\E)."""
    return "\\Q" + sym.replace("\\E", "\\E\\\\E\\Q") + "\\E"


def word_frequencies(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus -> (word, freq): the one corpus-sized step. Whitespace
    tokenization over the normalized text; the aggregation shuffles
    only (word, partial count) with map-side combine. (A ``spread``
    here was measured and rejected in round 15: the normalize+split
    kernel is cheap enough that the round-robin shuffle cost ~10%
    instead of saving any — unlike the encode side, whose per-word
    regex chain is the heavy kernel.)"""
    from datafusion_archive_spark.functions import text as TX

    return (
        docs.select(
            F.explode(
                F.split(TX.normalize_text(F.col(text_col)), " ")
            ).alias("word")
        )
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def bpe_merges(words: DataFrame, n_merges: int = 10) -> list[tuple]:
    """Learn the first ``n_merges`` BPE merges from a (word, freq)
    table. Returns ``[(merge_idx, left, right, pair_freq), …]`` in
    merge order.

    Each iteration: explode adjacent symbol pairs weighted by word
    frequency, aggregate, take the argmax (ties break on the pair
    string so the result is deterministic), then rewrite the symbol
    strings with a left-to-right non-overlapping regex replace — the
    exact greedy semantics of the reference BPE algorithm.
    """
    spark = words.sparkSession
    # symbol representation: space-separated chars + end-of-word mark
    sym = words.select(
        "freq",
        F.concat(
            F.trim(F.regexp_replace(F.col("word"), "(.)", "$1 ")),
            F.lit(" " + EOW),
        ).alias("syms"),
    )
    sym = sym.cache()
    # the parent of the CURRENT sym — unpersisted only after the next
    # argmax job has materialized sym's own cache (round 16, VERDICT
    # r15 #5): the old loop ran an explicit nxt.count() per merge just
    # to materialize before dropping the parent, doubling the
    # per-merge job count; the very next iteration's argmax scan
    # materializes the cache anyway, so deferring the unpersist by one
    # iteration gets the same safety with half the jobs (2N+1 -> N+1
    # for N merges). If an evicted partition ever forces recompute,
    # the lineage chain (n_merges nested regexp_replaces) is intact —
    # slower, never wrong.
    prev: DataFrame | None = None
    merges: list[tuple] = []
    for idx in range(n_merges):
        arr = F.split(F.col("syms"), " ")
        # fully-merged words have one symbol left — no pairs (and
        # sequence(0, -1) would run DESCENDING, indexing out of range)
        pairs = sym.filter(F.size(arr) >= 2).select(
            "freq",
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), F.size(arr) - 2),
                    # symbols are space-free by construction, so the
                    # space-joined pair splits back unambiguously
                    lambda i: F.concat_ws(
                        " ",
                        F.element_at(arr, i + 1),
                        F.element_at(arr, i + 2),
                    ),
                )
            ).alias("pair"),
        )
        top = (
            pairs.groupBy("pair")
            .agg(F.sum("freq").alias("n"))
            .orderBy(F.desc("n"), "pair")
            .limit(1)
            .collect()
        )
        # the argmax scan above just materialized sym's cache, so the
        # previous round's parent is now safe to release
        if prev is not None:
            prev.unpersist()
            prev = None
        if not top:
            break
        left, right = top[0]["pair"].split(" ")
        merges.append((idx, left, right, top[0]["n"]))
        # left-to-right, non-overlapping: "a a a" under merge (a,a)
        # becomes "aa a", matching the reference implementation
        pat = f"(?<!\\S){_quote(left)} {_quote(right)}(?!\\S)"
        repl = (left + right).replace("\\", "\\\\").replace("$", "\\$")
        nxt = sym.withColumn(
            "syms", F.regexp_replace("syms", pat, repl)
        ).cache()
        prev, sym = sym, nxt
    sym.unpersist()
    if prev is not None:
        prev.unpersist()
    return merges


def bpe_merge_table(
    spark, docs: DataFrame, n_merges: int = 10, text_col: str = "text"
) -> DataFrame:
    """End-to-end: corpus -> ordered merge table DataFrame with columns
    (merge_idx, left, right, pair_freq)."""
    rows = bpe_merges(word_frequencies(docs, text_col), n_merges)
    return spark.createDataFrame(
        rows, "merge_idx INT, left STRING, right STRING, pair_freq BIGINT"
    )


def bpe_encode(
    docs: DataFrame,
    merges: list[tuple],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Tokenize text with a learned merge list — the apply side of
    :func:`bpe_merges`. Returns (id, tokens array<string>, n_tokens).

    Semantics: each merge is applied once, in rank order, as a greedy
    left-to-right non-overlapping rewrite — the exact mirror of the
    rewrite the vocabulary underwent during training, so a word seen
    in training reproduces its trained segmentation verbatim. (The
    classic "repeat lowest-rank applicable merge" loop differs only in
    pathological vocabularies where two different merges concatenate
    to the same symbol string; the differential test pins this
    single-pass-in-order definition.)

    Scale: map-only. The merge chain compiles to nested JVM
    regexp_replace calls inside an array transform — no Python in the
    row path, nothing shuffles, and the merge list itself is
    vocabulary-sized (the same object every tokenizer broadcasts).
    ``spread`` guards the one failure mode of map-only kernels
    (round 15): a small-file scan is ONE task, serializing every
    regex pass on one core regardless of cluster width — a no-op on
    any at-scale table, a tiny round-robin shuffle otherwise.
    """
    from datafusion_archive_spark.functions import text as TX
    from datafusion_archive_spark.operators.util import spread

    docs = spread(docs)

    def encode_word(w):
        s = F.concat(
            F.trim(F.regexp_replace(w, "(.)", "$1 ")), F.lit(" " + EOW)
        )
        for _, left, right, _ in merges:
            pat = f"(?<!\\S){_quote(left)} {_quote(right)}(?!\\S)"
            repl = (left + right).replace("\\", "\\\\").replace("$", "\\$")
            s = F.regexp_replace(s, F.lit(pat), F.lit(repl))
        return F.split(s, " ")

    words = F.filter(
        F.split(TX.normalize_text(F.col(text_col)), " "),
        lambda w: w != F.lit(""),
    )
    toks = F.flatten(F.transform(words, encode_word))
    return docs.select(
        F.col(id_col),
        toks.alias("tokens"),
        F.size(toks).alias("n_tokens"),
    )
