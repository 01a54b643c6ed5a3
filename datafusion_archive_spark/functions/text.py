"""Text-analysis column functions for large-scale training-data pipelines.

Everything here is built from ``pyspark.sql.functions`` — JVM-side,
whole-stage-codegen'd, no Python UDFs — so it runs at full scan speed
on a 100 TB corpus. Each function documents the exact DuckDB-SQL
equivalent used by the correctness oracle, so semantics are pinned
bit-for-bit (the driver hash-compares results).

The reference engine has no text functions (SURVEY.md §2.3: "string /
date / array / map / json functions — none exist"); this is the
extension surface mandated by BASELINE.json's north star.
"""

from __future__ import annotations

from contextlib import contextmanager as _contextmanager

from pyspark.sql import Column
from pyspark.sql import functions as F

# Deterministic per-language marker words for the n-gram/stopword
# language-ID heuristic. Occurrences are counted with replace()-based
# arithmetic, which both Spark and DuckDB evaluate identically.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": (" the ", " and ", " of "),
    "de": (" der ", " und ", " das "),
    "fr": (" le ", " et ", " les "),
    "es": (" el ", " que ", " los "),
}

STOPWORDS: tuple[str, ...] = (
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
)


def char_count(c: Column) -> Column:
    """DuckDB: ``length(text)``."""
    return F.length(c)


def token_count(c: Column) -> Column:
    """Whitespace tokenization count.

    DuckDB: ``length(regexp_split_to_array(trim(text), '\\s+'))``.
    """
    return F.size(F.split(F.trim(c), r"\s+"))


#: Sub-word-ish tokenizer pattern: letter runs, digit runs, and single
#: punctuation marks each count as one token — a cheap deterministic
#: proxy for a BPE tokenizer's token count. No lookarounds, so it is
#: valid in both Java regex (Spark) and RE2 (DuckDB).
BPE_ISH_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def bpe_ish_token_count(c: Column) -> Column:
    """DuckDB: ``length(regexp_extract_all(text,
    '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]'))``."""
    return F.regexp_count(c, F.lit(BPE_ISH_PATTERN))


def punct_ratio(c: Column) -> Column:
    """Share of characters that are not alphanumeric or whitespace.

    DuckDB: ``round(length(regexp_replace(text, '[A-Za-z0-9\\s]', '',
    'g')) / greatest(length(text), 1), 4)`` — note DuckDB needs the
    ``'g'`` flag; Spark's regexp_replace is global by default.
    """
    stripped = F.regexp_replace(c, r"[A-Za-z0-9\s]", "")
    return F.round(
        F.length(stripped) / F.greatest(F.length(c), F.lit(1)), 4
    )


def stopword_ratio(c: Column) -> Column:
    """Fraction of whitespace tokens that are stopwords.

    DuckDB: ``round(len(list_filter(regexp_split_to_array(trim(lower(
    text)), '\\s+'), t -> t IN (...))) / greatest(length(
    regexp_split_to_array(trim(text), '\\s+')), 1), 4)``.
    """
    tokens = F.split(F.trim(F.lower(c)), r"\s+")
    hits = F.size(F.filter(tokens, lambda t: t.isin(*STOPWORDS)))
    return F.round(hits / F.greatest(F.size(tokens), F.lit(1)), 4)


def avg_token_len(c: Column) -> Column:
    """DuckDB: ``round(length(regexp_replace(trim(text), '\\s+', '',
    'g')) / greatest(len(regexp_split_to_array(trim(text), '\\s+')),
    1), 4)``."""
    compact = F.regexp_replace(F.trim(c), r"\s+", "")
    return F.round(
        F.length(compact) / F.greatest(token_count(c), F.lit(1)), 4
    )


def quality_score(c: Column) -> Column:
    """Deterministic [0,1] quality heuristic: longer docs (up to 100
    tokens) with low punctuation density and mid-length words score
    high. Weights are arbitrary but fixed; the oracle reproduces the
    identical arithmetic.

    DuckDB: ``floor((least(<tokens>/100.0, 1.0) * 0.5
    + (1.0 - <punct_ratio_unrounded>) * 0.3
    + least(<avg_token_len_unrounded>/10.0, 1.0) * 0.2) * 10000 + 0.5)
    / 10000.0`` — explicit half-up rounding because the score is a
    small-rational combination that lands on decimal midpoints (see
    functions.rounding).
    """
    from datafusion_archive_spark.functions.rounding import round_half_up

    tokens = token_count(c).cast("double")
    punct = F.length(F.regexp_replace(c, r"[A-Za-z0-9\s]", "")) / F.greatest(
        F.length(c), F.lit(1)
    )
    awl = F.length(F.regexp_replace(F.trim(c), r"\s+", "")) / F.greatest(
        token_count(c), F.lit(1)
    )
    return round_half_up(
        F.least(tokens / 100.0, F.lit(1.0)) * 0.5
        + (F.lit(1.0) - punct) * 0.3
        + F.least(awl / 10.0, F.lit(1.0)) * 0.2,
        4,
    )


def lang_id(c: Column) -> Column:
    """Marker-word language-ID heuristic: count per-language marker
    occurrences in the padded lowercase text; argmax wins, ties broken
    by the fixed language order; zero hits → 'unknown'.

    Occurrence counting is replace-arithmetic —
    ``(length(p) - length(replace(p, m, ''))) / length(m)`` — which is
    identical SQL in DuckDB.
    """
    padded = F.concat(F.lit(" "), F.lower(c), F.lit(" "))

    def hits(markers: tuple[str, ...]) -> Column:
        total = F.lit(0)
        for m in markers:
            total = total + (
                (F.length(padded) - F.length(F.replace(padded, F.lit(m))))
                / len(m)
            ).cast("int")
        return total

    scores = {lang: hits(ms) for lang, ms in LANG_MARKERS.items()}
    # CASE chain: the first language (in fixed order) holding the
    # maximal score wins; all-zero scores → 'unknown'.
    langs = list(LANG_MARKERS)
    max_score = scores[langs[0]]
    for lang in langs[1:]:
        max_score = F.greatest(max_score, scores[lang])
    expr = F.when(max_score <= 0, F.lit("unknown"))
    for lang in langs:
        expr = expr.when(scores[lang] == max_score, F.lit(lang))
    return expr.otherwise(F.lit("unknown"))


def normalize_text(c: Column) -> Column:
    """Whitespace-collapse + lowercase + trim normalization.

    DuckDB: ``lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))``.
    """
    return F.lower(F.trim(F.regexp_replace(c, r"\s+", " ")))


def fingerprint(c: Column) -> Column:
    """128-bit content fingerprint: md5 of the normalized text.
    DuckDB: ``md5(<normalize_text>)``."""
    return F.md5(normalize_text(c))


def word_shingles(c: Column, k: int = 3) -> Column:
    """Array of k-word shingles of the normalized text (the unit for
    MinHash / Jaccard dedup). Documents shorter than k words produce a
    single shingle of the whole text.

    DuckDB equivalent: split to words ``w``, then
    ``list_transform(range(1, greatest(len(w)-k+2, 2)),
    i -> array_to_string(w[i:i+k-1], ' '))`` (1-indexed inclusive
    slices).
    """
    words = F.split(normalize_text(c), " ")
    n = F.greatest(F.size(words) - (k - 1), F.lit(1))
    return F.transform(
        F.sequence(F.lit(1), n),
        lambda i: F.array_join(F.slice(words, i, k), " "),
    )


#: Active hash family for :func:`hash64` — "md5" (default: engine-
#: portable, DuckDB-reproducible, the correctness-oracle path) or
#: "xxhash64" (Spark-native, ~2-3× faster hashing, NOT reproducible
#: outside Spark — the production path when cross-engine parity isn't
#: required). Switch scoped via :func:`use_hash`.
HASH_METHOD = "md5"


@_contextmanager
def use_hash(method: str):
    """Scoped hash-family override: ``with use_hash("xxhash64"): ...``
    makes every operator built inside the block (minhash, simhash,
    fingerprints, splits) use the Spark-native family. Plan-build-time
    only — the choice is baked into the returned lazy DataFrame."""
    global HASH_METHOD
    if method not in ("md5", "xxhash64"):
        raise ValueError(f"unknown hash method: {method!r}")
    old, HASH_METHOD = HASH_METHOD, method
    try:
        yield
    finally:
        HASH_METHOD = old


def hash64(c: Column, seed: int = 0) -> Column:
    """Deterministic 60-bit positive integer hash of a string.

    md5 family (default): first 15 hex digits of
    ``md5(s || ':' || seed)`` as a base-16 integer — reproducible in
    any engine (DuckDB: ``('0x' || substr(md5(s || ':<seed>'), 1,
    15))::BIGINT``), which keeps the correctness oracle exact.

    xxhash64 family (``use_hash("xxhash64")``): Spark-native seeded
    xxhash, shifted to the same positive 60-bit range so downstream
    modular arithmetic (MinHash affine family) behaves identically.
    Same collision statistics, ~2-3× faster, Spark-only.

    Both stay JVM-side / codegen'd, and both return NULL for NULL
    input: ``xxhash64`` natively ignores NULL args (it would hash just
    the seed, giving every null-text doc one shared fingerprint and
    silently changing dedup grouping vs the md5 family), so the
    xxhash path hashes the same ``s || ':' || seed`` concat — concat
    with a NULL is NULL, and xxhash of a single NULL arg with the
    default seed is the seed itself, which the ``when`` guard maps
    back to NULL.
    """
    if HASH_METHOD == "xxhash64":
        return F.when(
            c.isNotNull(),
            F.shiftrightunsigned(
                F.xxhash64(F.concat(c, F.lit(f":{seed}"))), 4
            ),
        ).cast("long")
    return F.conv(
        F.substring(F.md5(F.concat(c, F.lit(f":{seed}"))), 1, 15), 16, 10
    ).cast("long")


def rolling_hash_fingerprint(c: Column, window: int = 8) -> Column:
    """Document fingerprint via a rolling-hash-style reduction: hash
    each ``window``-word shingle to 60 bits and keep the minimum —
    a one-value winnowing sketch usable for cheap near-dup blocking.

    DuckDB: ``list_min(list_transform(<shingles>, s ->
    ('0x' || substr(md5(s || ':0'), 1, 15))::BIGINT))``.
    """
    shingles = word_shingles(c, window)
    return F.array_min(
        F.transform(
            shingles,
            lambda s: F.conv(
                F.substring(F.md5(F.concat(s, F.lit(":0"))), 1, 15), 16, 10
            ).cast("long"),
        )
    )


# -- cleaning / PII scrubbing ------------------------------------------------
# RE2-compatible patterns only (no lookarounds) so the DuckDB oracle
# can run the identical regex; Spark regexp_replace is global by
# default, DuckDB needs the 'g' flag.

#: HTML/XML tags (non-greedy, single-line).
HTML_TAG_RE = r"<[^>]+>"
#: email addresses (pragmatic corpus-scrubbing pattern, not RFC 5322)
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
#: http(s) URLs up to the next whitespace
URL_RE = r"https?://[^\s]+"


def strip_html(c: Column) -> Column:
    """Remove HTML/XML tags. DuckDB:
    ``regexp_replace(text, '<[^>]+>', ' ', 'g')``."""
    return F.regexp_replace(c, HTML_TAG_RE, " ")


def mask_emails(c: Column, token: str = "<EMAIL>") -> Column:
    """Replace email addresses with a redaction token (PII scrub).
    DuckDB: ``regexp_replace(text, <EMAIL_RE>, token, 'g')``."""
    return F.regexp_replace(c, EMAIL_RE, token)


def mask_urls(c: Column, token: str = "<URL>") -> Column:
    """Replace http(s) URLs with a redaction token.
    DuckDB: ``regexp_replace(text, <URL_RE>, token, 'g')``."""
    return F.regexp_replace(c, URL_RE, token)


def clean_text(c: Column) -> Column:
    """Full cleaning chain for corpus ingestion: strip tags, mask
    emails and URLs, collapse whitespace (order matters — tags first
    so attribute URLs vanish with their tag, then PII masks, then
    whitespace).

    Since round 15 the tag pass and the whitespace-collapse pass are
    FUSED into one scan (VERDICT r14 #3): ``(?:<[^>]+>|\\s)+`` matches
    a maximal run of tags-or-whitespace, so one replacement emits the
    single space the old tags-then-``\\s+`` pair produced. Output is
    byte-identical to the 4-pass chain (the DuckDB oracle still runs
    it un-fused): collapsing whitespace BEFORE the masks instead of
    after cannot change a mask match — ``EMAIL_RE`` and ``URL_RE``
    match only non-whitespace runs and their tokens introduce no
    whitespace, so no whitespace edit creates or destroys a match —
    and tags are still removed before masks, which is the ordering
    that carries semantics (a tag terminates a URL exactly like the
    space it becomes)."""
    return F.trim(
        mask_urls(mask_emails(F.regexp_replace(c, r"(?:<[^>]+>|\s)+", " ")))
    )


def run_length_counts_sql(arr_sql: str) -> str:
    """SQL fragment: the SORTED per-type occurrence counts of the
    elements of string-array expression ``arr_sql`` — i.e. the value
    of ``array_sort(transform(array_distinct(a), t -> size(filter(a,
    x -> x = t))))`` — computed in O(n log n) instead of
    O(distinct·n): sort the array once, then fold run lengths in a
    single linear pass (equal elements are adjacent exactly once
    each). The old distinct-times-``filter`` form additionally
    allocated a filtered array per distinct element; on long
    documents (n and distinct both grow with doc length) it is
    quadratic in document size — the same hazard class profiling
    caught in ``repetition_ratio`` (tools/probe_text_clean_r15.log).

    The ``prev=''`` seed never appends a phantom run: the append
    branch requires ``acc.run > 0``, and a genuine leading ``''``
    element takes the run-extension branch off the seed with run 0,
    folding to run 1 exactly like any first element.
    """
    return (
        f"aggregate(array_sort({arr_sql}), "
        "named_struct('prev', '', 'run', 0, "
        "'cnts', CAST(array() AS ARRAY<INT>)), "
        "(acc, x) -> named_struct("
        "'prev', x, "
        "'run', IF(x = acc.prev, acc.run + 1, 1), "
        "'cnts', IF(x = acc.prev OR acc.run = 0, acc.cnts, "
        "concat(acc.cnts, array(acc.run)))), "
        "acc -> array_sort(IF(acc.run = 0, acc.cnts, "
        "concat(acc.cnts, array(acc.run)))))"
    )


def repetition_ratio(c: Column) -> Column:
    """Share of the most frequent token in the document — the standard
    boilerplate/spam signal (≈1.0 for 'buy buy buy …'). Empty text → 0.

    Per-row array ops only (no shuffle). Since round 15: sort the
    tokens and take the longest EQUAL-RUN in one linear ``aggregate``
    pass — O(n log n) per document. The previous
    distinct-tokens-times-``filter`` form was O(distinct·n) per row
    AND allocated a filtered array per distinct token; profiling
    (tools/probe_text_clean_r15.py, VERDICT r14 #3) showed it was
    ~95% of the whole text_clean query's wall, ~25x the cost of the
    regex cleaning chain it was blamed on. The run-length max over
    sorted tokens is the same value by construction (equal tokens
    are adjacent exactly once each). DuckDB twin unchanged — the
    oracle pins the VALUE, not the plan:
    ``list_max(list_transform(list_distinct(toks),
    t -> len(list_filter(toks, x -> x = t)))) / len(toks)``.

    The fold state is (previous token, current run, best run); the
    ``prev=''`` seed is safe for a leading real ``''`` token because
    the seed run is 0 — the first element always folds to run 1
    whether or not it equals the seed.
    """
    toks = F.split(normalize_text(c), " ")
    run_inc = lambda acc, x: F.when(  # noqa: E731 - local fold step
        x == acc["prev"], acc["run"] + F.lit(1)
    ).otherwise(F.lit(1))
    top = F.aggregate(
        F.array_sort(toks),
        F.struct(
            F.lit("").alias("prev"),
            F.lit(0).alias("run"),
            F.lit(0).alias("best"),
        ),
        lambda acc, x: F.struct(
            x.alias("prev"),
            run_inc(acc, x).alias("run"),
            F.greatest(acc["best"], run_inc(acc, x)).alias("best"),
        ),
        lambda acc: acc["best"],
    )
    return F.when(
        F.size(toks) > 0, top / F.size(toks)
    ).otherwise(F.lit(0.0))
