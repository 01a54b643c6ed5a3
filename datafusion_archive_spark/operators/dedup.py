"""Deduplication operators for document corpora.

Six strategies, all expressed as DataFrame compositions that scale to
100 TB on a real cluster:

- :func:`exact_duplicates` — hash-groupBy on a content fingerprint.
  One shuffle on a 128-bit key; fingerprints computed scan-side.
- :func:`ngram_jaccard_pairs` — exact n-gram Jaccard via a shingle
  self-join. Shuffle key = shingle; hot shingles are pre-filtered by
  document frequency (stop-shingle removal) to bound skew.
- :func:`minhash_signatures` / :func:`minhash_lsh_pairs` — MinHash +
  LSH banding: candidate generation cost is O(docs × bands), never
  O(docs²); the quadratic verify step runs only inside tiny buckets.
- :func:`simhash64` / :func:`simhash_near_pairs` — 64-bit SimHash with
  banded blocking for Hamming-distance search.
- :func:`editdistance_pairs` — banded Levenshtein with prefix
  blocking; the quadratic kernel runs only inside same-prefix blocks.
- embedding near-dup lives in
  :mod:`datafusion_archive_spark.operators.similarity`
  (:func:`~datafusion_archive_spark.operators.similarity.cosine_pairs`).

Every hash is md5-derived (:func:`~datafusion_archive_spark.functions.
text.hash64`) so an external SQL oracle can reproduce results exactly.
The reference engine has no dedup surface; this is north-star work
(BASELINE.json).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation, Window
from pyspark.sql import functions as F

from datafusion_archive_spark.functions import text as TX
from datafusion_archive_spark.functions.rounding import round_half_up
from datafusion_archive_spark.operators.util import (
    BROADCAST_NODE_CAP as _BROADCAST_NODE_CAP,
    cached,
    loop_session as _loop_session,
    spread,
)


def exact_duplicates(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Group documents by normalized-content fingerprint.

    Returns one row per distinct content: ``fp`` (md5 hex), ``keep_id``
    (min id — the canonical survivor), ``n_copies``.

    Scale: a single hash-aggregate; the fingerprint is computed in the
    scan stage and the shuffle moves only (fp, id) pairs, not text.
    """
    return (
        df.select(
            TX.fingerprint(F.col(text_col)).alias("fp"), F.col(id_col)
        )
        .groupBy("fp")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


def _nonempty(df: DataFrame, text_col: str) -> DataFrame:
    """Drop null / empty / whitespace-only documents before shingle or
    token hashing: they carry no content, and their degenerate single
    shingle (the empty string) would otherwise make every empty doc a
    'near-duplicate' of every other. Exact dedup keeps them (same-
    fingerprint grouping of empties IS meaningful there)."""
    return df.filter(F.length(TX.normalize_text(F.col(text_col))) > 0)


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    threshold: float = 0.5,
    max_shingle_df: int | None = None,
    side_pred=None,
) -> DataFrame:
    """Exact pairwise Jaccard similarity over k-word shingle sets,
    returning pairs ``(id_a < id_b, jaccard)`` with
    ``jaccard >= threshold``.

    ``side_pred`` (round 16, ADVICE r15): an optional id-column
    predicate restricting WHICH pairs are enumerated — side a holds
    rows where ``side_pred(id)`` is true, side b its complement, and
    the self-join pairs a×b only (no ``id_a < id_b`` constraint; the
    sides are disjoint so orientation is fixed by the predicate).
    This is the incremental-dedup restriction (guide §3.2 — restrict
    BEFORE the quadratic step): a NEW×CORPUS join never materializes
    the corpus² candidate term. Shingle building, the stop-shingle
    cap (still computed over the WHOLE corpus before the split), the
    per-doc sizes (side-independent), and the Jaccard formula are
    the one shared kernel; q_dedup_incremental previously inlined
    all of it.

    Plan shape: explode distinct shingles → self-join on shingle →
    count co-occurrences → join per-doc set sizes → Jaccard. The only
    quadratic term is per-shingle (documents sharing a shingle), so
    ``max_shingle_df`` drops shingles whose document frequency exceeds
    the cap — the standard stop-shingle guard that keeps the self-join
    skew-free at corpus scale (AQE skew-join handles the remainder).

    Null/empty/whitespace-only documents are excluded (via
    :func:`_nonempty`): they have no shingles, and without the guard
    every empty document would pair with every other at jaccard 1.0
    through the single empty shingle.

    Precondition (round 15): ``id_col`` must be unique per row — true
    for every caller (document ids). Under it the exploded rows are
    globally unique by construction (array_distinct de-duplicates
    within a document), so the old corpus-wide ``.distinct()`` — a
    full Exchange of every (id, shingle) — was doing nothing and is
    dropped (same argument as minhash_estimate_audit, r15).
    """
    shingles = (
        spread(_nonempty(df, text_col)).select(
            F.col(id_col).alias("id"),
            F.explode(
                F.array_distinct(TX.word_shingles(F.col(text_col), k))
            ).alias("shingle"),
        )
    )
    # reused by three plan branches (sizes, join-left, join-right);
    # persisting avoids recomputing the explode+distinct each time
    shingles = cached(shingles)
    if max_shingle_df is not None:
        rare = (
            shingles.groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("df"))
            .filter(F.col("df") <= max_shingle_df)
            .select("shingle")
        )
        # cached (round 16): the capped frame also feeds all three
        # branches; uncached, the cap join re-ran for each
        shingles = cached(shingles.join(rare, "shingle"))

    sizes = shingles.groupBy("id").agg(F.count(F.lit(1)).alias("n"))

    if side_pred is None:
        a = shingles.alias("a")
        b = shingles.alias("b")
        cond = (F.col("a.shingle") == F.col("b.shingle")) & (
            F.col("a.id") < F.col("b.id")
        )
    else:
        # disjoint sides: orientation is fixed by the predicate, so
        # the id ordering constraint is unnecessary (and wrong — a
        # corpus id below a new id must still pair)
        a = shingles.filter(side_pred(F.col("id"))).alias("a")
        b = shingles.filter(~side_pred(F.col("id"))).alias("b")
        cond = F.col("a.shingle") == F.col("b.shingle")
    inter = (
        a.join(b, cond)
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa = sizes.select(F.col("id").alias("id_a"), F.col("n").alias("n_a"))
    sb = sizes.select(F.col("id").alias("id_b"), F.col("n").alias("n_b"))
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "jaccard",
            # half-up formula (not F.round): a small-integer ratio can
            # land exactly on a decimal midpoint, where Spark and
            # external engines disagree — see functions.rounding
            round_half_up(
                F.col("inter")
                / (F.col("n_a") + F.col("n_b") - F.col("inter")),
                4,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def containment_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    threshold: float = 0.5,
    max_shingle_df: int | None = None,
) -> DataFrame:
    """Exact pairwise shingle CONTAINMENT — ``|A ∩ B| / |A|`` — the
    asymmetric near-dup relation Jaccard misses: a short document
    embedded verbatim inside a long one scores near 1.0 containment
    but low Jaccard (the union is dominated by the long doc). This is
    the doc-in-doc signal used to drop quoted/aggregated pages from
    training corpora (Broder's containment, the same measure
    super-shingle systems estimate).

    Returns ``(id_a < id_b, containment_a_in_b, containment_b_in_a)``
    where either direction clears ``threshold``. Plan shape and scale
    behavior are identical to :func:`ngram_jaccard_pairs` — the
    intersection self-join is per-shingle linear under the
    ``max_shingle_df`` stop-shingle cap; only the final ratio differs
    (per-side size instead of union). Same unique-id precondition and
    dropped redundant distinct as :func:`ngram_jaccard_pairs` (r15).
    """
    shingles = (
        spread(_nonempty(df, text_col)).select(
            F.col(id_col).alias("id"),
            F.explode(
                F.array_distinct(TX.word_shingles(F.col(text_col), k))
            ).alias("shingle"),
        )
    )
    shingles = cached(shingles)
    if max_shingle_df is not None:
        rare = (
            shingles.groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("df"))
            .filter(F.col("df") <= max_shingle_df)
            .select("shingle")
        )
        shingles = shingles.join(rare, "shingle")

    sizes = shingles.groupBy("id").agg(F.count(F.lit(1)).alias("n"))

    a = shingles.alias("a")
    b = shingles.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa = sizes.select(F.col("id").alias("id_a"), F.col("n").alias("n_a"))
    sb = sizes.select(F.col("id").alias("id_b"), F.col("n").alias("n_b"))
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "cont_a_in_b",
            round_half_up(F.col("inter") / F.col("n_a"), 4),
        )
        .withColumn(
            "cont_b_in_a",
            round_half_up(F.col("inter") / F.col("n_b"), 4),
        )
        .filter(
            F.greatest(F.col("cont_a_in_b"), F.col("cont_b_in_a"))
            >= threshold
        )
        .select("id_a", "id_b", "cont_a_in_b", "cont_b_in_a")
    )


#: Mersenne prime 2^31-1 — modulus of the universal hash family below.
MINHASH_PRIME = 2147483647


def minhash_affine_params(i: int) -> tuple[int, int]:
    """Deterministic (a, b) for hash function i of the universal
    family ``h_i(x) = ((base(x) mod p) * a + b) mod p`` — derived from
    md5 so any engine can reproduce them. a ∈ [1, p-1], b ∈ [0, p-1];
    the product stays < 2^62, so no int64 overflow (ANSI-safe)."""
    import hashlib

    a = int(hashlib.md5(f"minhash-a:{i}".encode()).hexdigest()[:8], 16) % (
        MINHASH_PRIME - 1
    ) + 1
    b = int(hashlib.md5(f"minhash-b:{i}".encode()).hexdigest()[:8], 16) % (
        MINHASH_PRIME
    )
    return a, b


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    k: int = 3,
) -> DataFrame:
    """Per-document MinHash signature via a universal hash family:
    ONE md5 per shingle (``base = hash64(shingle, 0)``), then
    ``h_i = ((base mod p) * a_i + b_i) mod p`` per hash function —
    16× fewer md5 evaluations than hashing per-seed, with the same
    collision statistics (standard affine MinHash construction).

    Shape: explode distinct shingles once, take per-document mins in a
    single hash aggregation (map-side partial combine ships just
    num_hashes longs per doc). One pass over the text — an
    array_min-per-column formulation would recompute the shingle
    pipeline num_hashes times (Catalyst collapses projections without
    cross-column CSE).
    """
    ex = spread(_nonempty(df, text_col)).select(
        F.col(id_col).alias("id"),
        F.explode(
            F.array_distinct(TX.word_shingles(F.col(text_col), k))
        ).alias("shingle"),
    ).select(
        "id", (TX.hash64(F.col("shingle"), 0) % MINHASH_PRIME).alias("base")
    )
    # expr strings, not chained Column ops — see simhash64 note on
    # py4j plan-construction cost
    aggs = []
    for i in range(num_hashes):
        a, b = minhash_affine_params(i)
        aggs.append(
            F.expr(f"min((base * {a}L + {b}L) % {MINHASH_PRIME}L)").alias(
                f"mh_{i}"
            )
        )
    return ex.groupBy("id").agg(*aggs)


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    bands: int = 4,
    k: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """MinHash + LSH banding near-dup detection.

    Signatures are split into ``bands`` bands of ``num_hashes/bands``
    rows; documents agreeing on any full band become candidate pairs
    (shuffle key = (band index, band values) — cardinality ~#docs×bands,
    never quadratic). Candidates are then verified with the *estimated*
    Jaccard = fraction of agreeing minhashes, keeping pairs ≥ threshold.

    Returns ``(id_a < id_b, est_jaccard)``.
    """
    assert num_hashes % bands == 0
    rows_per_band = num_hashes // bands
    # Persist: the banding explode and the self-join below would
    # otherwise recompute the signature aggregation once per plan
    # branch. Signatures are tiny relative to the corpus (id +
    # num_hashes longs/doc ≈ 136 B — ~140 GB even for 10^9 docs,
    # spillable), so caching them is the intended scale design.
    sig = cached(minhash_signatures(df, text_col, id_col, num_hashes, k))

    mh_cols = [f"mh_{i}" for i in range(num_hashes)]
    band_structs = []
    for b in range(bands):
        band_cols = mh_cols[b * rows_per_band : (b + 1) * rows_per_band]
        band_structs.append(
            F.struct(
                F.lit(b).alias("band"),
                F.concat_ws("_", *[F.col(c) for c in band_cols]).alias(
                    "bucket"
                ),
            )
        )
    buckets = sig.select(
        "id", F.explode(F.array(*band_structs)).alias("bb"), *mh_cols
    ).select("id", F.col("bb.band").alias("band"),
             F.col("bb.bucket").alias("bucket"), *mh_cols)

    a = buckets.alias("a")
    b = buckets.alias("b")
    agree = F.expr(
        " + ".join(f"IF(a.{c} = b.{c}, 1, 0)" for c in mh_cols)
    )
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            (agree / F.lit(float(num_hashes))).alias("est_jaccard_raw"),
        )
        # a pair can match in several bands — dedupe candidates
        .groupBy("id_a", "id_b")
        .agg(F.round(F.min("est_jaccard_raw"), 4).alias("est_jaccard"))
    )
    return cand.filter(F.col("est_jaccard") >= threshold)


def simhash64(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 64,
) -> DataFrame:
    """Per-document SimHash: each whitespace token votes ±1 on each of
    ``bits`` bit positions of its 60-bit md5-derived hash; the sign of
    the per-position sum forms the signature.

    Implemented as explode(tokens) → one hash per token → bit-slice
    votes aggregated per document — a single shuffle on doc id with
    map-side partial aggregation. ``bits`` ≤ 60 because
    :func:`~datafusion_archive_spark.functions.text.hash64` yields 60
    usable bits.
    """
    bits = min(bits, 60)
    # md5-hash each token ONCE in its own projection; the packed vote
    # aggregates then bit-slice the materialized long. Inlining the
    # hash into each aggregate would evaluate the md5 per slice —
    # CollapseProject keeps non-cheap multi-referenced aliases as a
    # separate projection, same pattern as minhash_signatures.
    tokens = spread(_nonempty(df, text_col)).select(
        F.col(id_col).alias("id"),
        F.explode(
            F.split(TX.normalize_text(F.col(text_col)), " ")
        ).alias("tok"),
    ).select("id", TX.hash64(F.col("tok"), seed=0).alias("th"))
    # Bit-packed voting: instead of `bits` separate ±1-sum columns
    # (a 60-long-wide aggregation buffer shuffled per doc), deposit
    # each hash bit into a 16-bit lane of ceil(bits/4) packed longs
    # and sum those. Lane g*4+f of s_g counts tokens whose bit j was
    # set (cnt_j ≤ token count, so lanes never carry for docs up to
    # 65 535 tokens — far above any sane document; pre-chunk longer
    # ones). The ±1 vote sign is recovered after the aggregate:
    # sum(±1) > 0  ⟺  2·cnt_j > n. Shuffle width drops 4× (15 longs
    # + count vs 60 longs) and the per-token CASE WHENs disappear.
    # Expressions are built as single SQL strings (F.expr), not
    # chained Column ops: 60 bit positions × several py4j calls each
    # costs ~2 s of driver-side plan construction PER QUERY BUILD —
    # measured 2.6 s chained vs ~0 s for one expr() round-trip.
    lane_bits = 16
    lanes_per_long = 64 // lane_bits
    n_packed = -(-bits // lanes_per_long)
    packed = []
    for g in range(n_packed):
        terms = " + ".join(
            f"shiftleft(shiftright(th, {g * lanes_per_long + f}) & 1, "
            f"{lane_bits * f})"
            for f in range(lanes_per_long)
            if g * lanes_per_long + f < bits
        )
        packed.append(F.expr(f"sum({terms})").alias(f"s_{g}"))
    agg = tokens.groupBy("id").agg(
        F.count(F.lit(1)).alias("n"), *packed
    )
    lane_mask = (1 << lane_bits) - 1
    sig_terms = []
    for j in range(bits):
        g, f = divmod(j, lanes_per_long)
        sig_terms.append(
            f"IF((shiftrightunsigned(s_{g}, {lane_bits * f}) & {lane_mask})"
            f" * 2 > n, {1 << j}L, 0L)"
        )
    sig = F.expr(" + ".join(sig_terms))
    return agg.select("id", sig.alias("simhash"))


def simhash_near_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    bits: int = 64,
    blocking_bands: int = 4,
    n_blocks: int | None = None,
) -> DataFrame:
    """Pairs of documents whose SimHash Hamming distance ≤
    ``max_hamming``.

    Blocking (``n_blocks=None``, the simple scheme): split the
    signature into ``blocking_bands`` contiguous bit-bands; by
    pigeonhole, any pair within distance ``blocking_bands - 1`` agrees
    exactly on at least one band, so the candidate join keys on
    (band index, band value) — never the doc² cross product.
    Verification computes the true popcount of XOR, so the OUTPUT is
    exact under either scheme; blocking only sets candidate volume.

    Combination blocking (``n_blocks`` set — Manku, Jain & Sarma,
    WWW'07): the simple scheme's band width is pinned to
    ``bits / (max_hamming + 1)`` (15 bits here), so RANDOM band
    collisions grow ~n²/2^15 — measurably super-linear once the corpus
    passes ~2^15 docs (tools/scale_probe_r11.log: 1022 → 9456 → 125398
    candidates at 2.5k/10k/40k docs). Instead split into ``n_blocks``
    blocks and key each candidate table on a COMBINATION of
    ``n_blocks - max_hamming`` blocks: ≤ ``max_hamming`` differing
    bits can dirty at most ``max_hamming`` blocks, so some kept
    combination agrees fully — the same pigeonhole exactness — while
    the join key widens to ``(n_blocks - max_hamming) * width`` bits
    (30 here for n_blocks=6), pushing random collisions out to ~2^30
    docs. Cost: C(n_blocks, n_blocks - max_hamming) exploded rows per
    doc (20 for (6,3)) — a constant factor on a linear shuffle, the
    right trade at 100 TB. Re-probed with (6,3): 733 → 2781 → 11763
    candidates at the same sizes — linear in docs, with the OUTPUT
    pair sets byte-identical to the simple scheme at every size.
    """
    bits = min(bits, 60)
    # persisted: the band explode + self-join would recompute the
    # packed vote aggregation per plan branch otherwise
    sig = cached(simhash64(df, text_col, id_col, bits))
    # Band/combination keys are built as ONE F.expr SQL string, not
    # chained Column ops: the (6,3) scheme's 20 structs × ~8 py4j
    # round-trips each cost a measured 0.64 s of driver-side plan
    # construction PER QUERY BUILD vs ~1 ms for the single expr()
    # round-trip — same pattern (and same measurement protocol) as
    # simhash64's packed votes and signature_col. The SQL is
    # value-identical: shiftrightunsigned/&/shiftleft/| on the same
    # long column, so plans differ only in how they were authored.
    if n_blocks is None:
        band_width = bits // blocking_bands
        band_mask = (1 << band_width) - 1
        items = [
            f"named_struct('band', {bidx}, 'band_val', "
            f"(shiftrightunsigned(simhash, {bidx * band_width})"
            f" & {band_mask}))"
            for bidx in range(blocking_bands)
        ]
    else:
        from itertools import combinations

        if bits % n_blocks:
            raise ValueError(
                f"n_blocks={n_blocks} must divide the usable "
                f"signature width {bits}"
            )
        combo_size = n_blocks - max_hamming
        if combo_size < 1:
            raise ValueError(
                f"combination blocking needs n_blocks > max_hamming "
                f"(got {n_blocks} <= {max_hamming})"
            )
        width = bits // n_blocks
        mask = (1 << width) - 1
        block_sql = [
            f"(shiftrightunsigned(simhash, {i * width}) & {mask})"
            for i in range(n_blocks)
        ]
        items = []
        for cidx, combo in enumerate(
            combinations(range(n_blocks), combo_size)
        ):
            # pack the combo's blocks into one long (combo_size*width
            # <= bits <= 60, always fits)
            val = " | ".join(
                f"shiftleft({block_sql[i]}, {pos * width})"
                if pos
                else block_sql[i]
                for pos, i in enumerate(combo)
            )
            items.append(
                f"named_struct('band', {cidx}, 'band_val', {val})"
            )
    blocked = sig.select(
        "id",
        "simhash",
        F.expr(f"explode(array({', '.join(items)}))").alias("bb"),
    ).select(
        "id", "simhash", F.col("bb.band").alias("band"),
        F.col("bb.band_val").alias("band_val"),
    )

    a, b = blocked.alias("a"), blocked.alias("b")
    xored = F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
    hamming = F.bit_count(xored)
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            hamming.cast("int").alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )


#: label-chain compressions per propagation round. With label-pointer
#: edges in the propagation set (hash-to-min), extra jumps buy nothing:
#: the 240k round-11b probe converges in 29 rounds with 1 jump or 3,
#: and each jump is a per-round self-join — so keep exactly one.
_JUMPS_PER_ROUND = 1

#: _BROADCAST_NODE_CAP is shared with graph.pagerank — see
#: operators.util.BROADCAST_NODE_CAP for the sizing rationale
#: (honest one-real-count hint vs Catalyst's carried checkpoint
#: estimates; 2M rows x ~32 B ~= 64 MB broadcast).

def _rewrap_checkpoint(ck: DataFrame) -> DataFrame:
    """Re-wrap an (eagerly) checkpointed DataFrame's materialized
    InternalRow RDD in a fresh relation, dropping the statistics the
    checkpoint carried over from its originating plan (see the caller
    comment: carried sizeInBytes compounds across self-join rounds
    until Catalyst's stats visitor dominates wall time). Uses the
    JVM-side internalCreateDataFrame so no row crosses the Python
    boundary; falls back to the public createDataFrame(rdd) path if
    the internal API is unavailable (e.g. Spark Connect)."""
    try:
        jdf = ck._jdf
        jrdd = jdf.queryExecution().toRdd()
        spark = ck.sparkSession
        new_jdf = spark._jsparkSession.internalCreateDataFrame(
            jrdd, jdf.schema(), False
        )
        return DataFrame(new_jdf, spark)
    except Exception:  # pragma: no cover - connect-only path
        return ck.sparkSession.createDataFrame(ck.rdd, schema=ck.schema)


def connected_components(
    pairs: DataFrame,
    a_col: str = "id_a",
    b_col: str = "id_b",
    max_iterations: int = 50,
) -> DataFrame:
    """Resolve near-duplicate candidate pairs into clusters: connected
    components by iterative min-label propagation, the standard way
    corpus dedup turns pairwise LSH matches into keep-one groups at
    scale (no graph library needed — each iteration is a join + a
    min-aggregate, all shuffles on the node id).

    Each node starts labeled with itself; every iteration each node
    takes the min label over its neighbors in the graph UNION the
    label-pointer mapping (both directions — the hash-to-min trick:
    mins flow member → label-root → members, so star-shaped regions
    merge in O(1) rounds), then applies ``_JUMPS_PER_ROUND`` POINTER
    JUMPS (``L(u) ← L(L(u))`` — self-joins on the label table) to
    flatten label chains. Labels are min-monotone, so convergence is
    guaranteed; thin chain-of-stars tails can still take ~diameter/k
    rounds, which the default cap absorbs (the round-11b 240k-point
    geometric probe — largest component 115 nodes, diameter 32 —
    converges in 29 rounds, output exactly matching a union-find
    ground truth; plain propagation + a single jump did NOT converge
    in 20). Iteration stops early the first round nothing changes.

    Returns ``(node, component)`` where component = min node id in the
    cluster. Only nodes that appear in ``pairs`` are returned —
    singletons never enter the pair list by construction.

    Raises ``RuntimeError`` if labels were still changing after
    ``max_iterations`` — returning silently-split clusters would be a
    wrong answer, and a pathological long-chain graph (diameter >
    max_iterations) is a caller decision: raise the cap or switch to a
    path-doubling variant.
    """
    edges = (
        pairs.select(F.col(a_col).alias("u"), F.col(b_col).alias("v"))
        .unionByName(
            pairs.select(F.col(b_col).alias("u"), F.col(a_col).alias("v"))
        )
        .distinct()
        .persist()
    )
    labels = edges.select(F.col("u").alias("node")).distinct().withColumn(
        "component", F.col("node")
    ).persist()
    # the de-dup shuffle of the raw pair list (potentially the large
    # input) runs HERE, under the caller's conf — full shuffle width
    # and AQE apply to the one data-sized stage. Counting edges and
    # nodes materializes both persisted frames and gives the real
    # sizes the loop scope below is derived from.
    n_edges = edges.count()
    # one real count of the (round-invariant) node set decides the
    # join strategy for every label-sized frame below: the stats
    # reset in _rewrap_checkpoint leaves Catalyst with no size
    # information, so without the hint even a 500-node toy graph pays
    # a full shuffle join per round (~2x wall at sf0.1). Label-sized
    # means <= n_nodes rows by construction (labels, neighbor_min,
    # the jump table, the changed-check side); `edges` itself can be
    # much larger and is never broadcast.
    n_nodes = labels.count()
    small = n_nodes <= _BROADCAST_NODE_CAP

    def _bc(label_sized: DataFrame) -> DataFrame:
        return F.broadcast(label_sized) if small else label_sized

    changed = 0
    # the loop runs on a dedicated child session (own SQLConf: AQE
    # off, label-sized shuffle width) — the caller's session conf is
    # never touched, so concurrent queries on it cannot plan under
    # the narrowed width (VERDICT r13 #2; see operators.util.
    # loop_session). edges/labels cross via global-temp-view handoff;
    # their persisted data is shared (one cache manager per context).
    with _loop_session(pairs.sparkSession, 2 * n_nodes + n_edges) as ls:
        edges_l = ls.handoff(edges)
        labels_l = labels_first = ls.handoff(labels)
        for _ in range(max_iterations):
            # min over the ORIGINAL edges plus the LABEL-POINTER edges in
            # both directions. Plain propagation moves the min value one
            # graph-hop per round (Θ(diameter) rounds — a diameter-32
            # component in the 240k-point round-11b probe blew the cap),
            # and pointer jumps alone only shortcut label chains, which
            # random-id geometric clusters barely form. Treating the
            # label mapping as extra edges is the hash-to-min trick:
            # mins flow member -> label-root -> members, so star-shaped
            # regions merge in ~2 rounds regardless of their size and the
            # same probe converges in 29 rounds (exactly matching a
            # union-find ground truth) instead of not at all; only thin
            # chain tails still crawl, which the generous default cap
            # absorbs now that per-round cost is flat (see the stats
            # note below).
            label_edges = labels_l.select(
                F.col("node").alias("u"), F.col("component").alias("v")
            ).unionByName(
                labels_l.select(
                    F.col("component").alias("u"), F.col("node").alias("v")
                )
            )
            neighbor_min = (
                edges_l.unionByName(label_edges)
                .join(_bc(labels_l.withColumnRenamed("node", "v")), "v")
                .groupBy(F.col("u").alias("node"))
                .agg(F.min("component").alias("nmin"))
            )
            # _old rides along so convergence detection below reads it
            # straight off the materialized checkpoint instead of
            # re-joining new labels against the previous round's frame
            # (round 15: one broadcast-join job per round removed; the
            # cost is 8 bytes/row through the round's shuffles)
            stepped = labels_l.join(_bc(neighbor_min), "node", "left").select(
                "node",
                F.least(
                    F.col("component"), F.coalesce("nmin", "component")
                ).alias("component"),
                F.col("component").alias("_old"),
            )
            # pointer jumps: L(u) ← L(L(u)), repeated _JUMPS_PER_ROUND
            # times — label-only self-joins that flatten label chains so
            # the next round's label edges point near the root. Cheap
            # next to the per-round edge join.
            compressed = stepped
            for _ in range(_JUMPS_PER_ROUND):
                jump = compressed.select(
                    F.col("node").alias("jnode"),
                    F.col("component").alias("jcomp"),
                )
                compressed = compressed.join(
                    _bc(jump), compressed.component == jump.jnode, "left"
                ).select(
                    "node",
                    F.coalesce("jcomp", "component").alias("component"),
                    "_old",
                )
            # localCheckpoint, not persist: persist caches *data* but the
            # logical plan still accrues one join per iteration — planning
            # cost (and plan-string size) grows without bound on
            # high-diameter graphs. Checkpointing truncates lineage so
            # every iteration plans against a materialized leaf.
            #
            # The convergence count rides the checkpoint's OWN job
            # (round 16, VERDICT r15 #3): a CollectMetrics node on the
            # frame being checkpointed is populated during the eager
            # materialization, so the separate per-round
            # filter(component != _old) count job disappears — one
            # fewer fixed-cost job per propagation round.
            obs = Observation()
            ck = compressed.observe(
                obs,
                F.count(
                    F.when(F.col("component") != F.col("_old"), 1)
                ).alias("n_changed"),
            ).localCheckpoint(eager=True)
            # ...but the checkpoint relation CARRIES the pre-checkpoint
            # plan's statistics, and Catalyst's size-only stats visitor
            # MULTIPLIES children's sizeInBytes across joins — with the
            # per-round self-joins the carried BigInt's bit-length
            # compounds ~2^(jumps+1)× per round, and by round ~7 the
            # stats visitor burns minutes per plan in BigInteger
            # Toom-Cook products (jstack-diagnosed, round 11b; the same
            # compounding capped the 240k-point probe even with one jump
            # per round). Re-wrapping the materialized InternalRow RDD in
            # a fresh relation resets the stats every round — JVM-side,
            # no Python data movement; the public createDataFrame(rdd)
            # fallback covers connect-style sessions without _jdf.
            rewrapped = _rewrap_checkpoint(ck)
            # convergence straight off the checkpoint job's metrics
            # (the _old column carried through the round). The
            # fallback recomputes from the materialized checkpoint on
            # sessions where CollectMetrics on a checkpoint action is
            # unavailable (connect-style sessions).
            try:
                changed = obs.get["n_changed"]
            except Exception:  # pragma: no cover - connect-only path
                changed = (
                    rewrapped.filter(
                        F.col("component") != F.col("_old")
                    )
                    .limit(1)
                    .count()
                )
            new_labels = rewrapped.select("node", "component")
            if labels_l is not labels_first:
                labels_l.unpersist()
            else:
                # first iteration: labels_l is the child's VIEW-READ
                # frame — whether unpersisting it reaches the caller's
                # cache entry depends on the cache manager stripping
                # the view's SubqueryAlias, which is version-dependent
                # (ADVICE r14). Unpersist the ORIGINAL caller-side
                # frame instead; nothing reads it after this round
                # (later rounds propagate over new_labels only).
                labels.unpersist()
            labels_l = new_labels
            if changed == 0:
                break
        # hand the (materialized — rewrapped checkpoint) result back
        # to the caller's session before the scope drops its views;
        # downstream consumers then execute under the caller's conf,
        # exactly as the old loop_conf contract promised
        result = ls.handback(labels_l)
    edges.unpersist()
    labels.unpersist()
    if changed != 0:
        raise RuntimeError(
            f"connected_components did not converge within "
            f"{max_iterations} iterations (labels still changing); "
            f"increase max_iterations for high-diameter graphs"
        )
    return cached(result)


def dedup_clusters(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.5,
) -> DataFrame:
    """End-to-end near-dup clustering: MinHash-LSH candidate pairs →
    connected components → one row per cluster with the kept (min-id)
    doc and the cluster size."""
    pairs = minhash_lsh_pairs(df, text_col, id_col, threshold=threshold)
    comp = connected_components(pairs)
    return (
        comp.groupBy("component")
        .agg(
            F.count(F.lit(1)).alias("cluster_size"),
            F.min("node").alias("keep_id"),
        )
        .select("keep_id", "cluster_size")
    )


def editdistance_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_dist: int = 8,
    prefix_len: int = 16,
) -> DataFrame:
    """Near-duplicate pairs by Levenshtein edit distance, the sixth
    dedup strategy (catches small in-place edits — typo fixes,
    appended boilerplate — that shingle/bit-sketch methods may score
    as identical or miss entirely).

    Full pairwise edit distance is O(docs² · len²) — untenable. The
    standard blocking compromise: candidates must share their first
    ``prefix_len`` normalized characters and differ in length by at
    most ``max_dist`` (a *necessary* condition — each insert/delete
    changes length by 1). The plan is then a plain equi-join on the
    prefix key (one shuffle of (prefix, id, text)), with the quadratic
    kernel confined to same-prefix blocks; Spark's banded
    ``levenshtein(l, r, threshold)`` bails out early at
    ``O(max_dist · len)`` per pair. Recall tradeoff (documented, by
    design): edits inside the first ``prefix_len`` characters move a
    doc to a different block — mirror-block on a suffix key for
    higher recall.

    Returns ``(id_a < id_b, dist)`` with ``dist <= max_dist``.
    """
    # spread (round 15): the normalize pass is regex-heavy and a
    # small-file scan is one task — same single-core trap the shingle
    # operators already guard; no-op at scale
    t = spread(_nonempty(df, text_col)).select(
        F.col(id_col).alias("id"),
        TX.normalize_text(F.col(text_col)).alias("norm"),
    ).select(
        "id", "norm",
        F.substring("norm", 1, prefix_len).alias("block"),
        F.length("norm").alias("len"),
    )
    a, b = t.alias("a"), t.alias("b")
    dist = F.levenshtein(F.col("a.norm"), F.col("b.norm"), max_dist)
    return (
        a.join(
            b,
            (F.col("a.block") == F.col("b.block"))
            & (F.col("a.id") < F.col("b.id"))
            & (
                F.abs(F.col("a.len") - F.col("b.len")) <= max_dist
            ),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            dist.alias("dist"),
        )
        .filter((F.col("dist") >= 0) & (F.col("dist") <= max_dist))
    )
