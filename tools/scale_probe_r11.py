"""Round-11 scale probe of the DEDUP + ANN families (VERDICT r10 #3)
— the same growing-scale evidence the r10 probe gave graphs.

Synthetic corpus at three sizes (default 2500 docs, then 4x and 16x):
20% of documents are controlled near-duplicates (2 of 50 words
perturbed -> shingle-Jaccard ~0.78), the rest draw content words from
an effectively unbounded hash vocabulary, so TRUE pair count is n/5
by construction and any super-linear growth in candidates or wall is
the algorithm's, not the data's.

Measured per size, for the three banded/blocked dedup kernels the
registry certifies (identical parameters to queries/llm.py):

- CANDIDATE pairs — the number the banding/blocking actually
  enumerates (sum over buckets of C(c,2), rebuilt from the operator's
  own signature primitives). The 100 TB claim is that this tracks
  docs, never docs²; a probe ratio far above the size factor means
  the blocking broke.
- OUTPUT pairs — should track the planted n/5 exactly for minhash /
  ngram (simhash additionally surfaces legitimate random near-ties).
- wall seconds.

Plus ANN recall stability: clustered embeddings (64-dim, cluster size
40, cluster count grows with the corpus — the shape where IVF/LSH
earn their keep), 20 perturbed-member queries, recall@5 of
lsh_cosine_topk / ivf_topk against exact cosine_topk at every size —
approximate-index quality must not decay as the corpus grows (LSH
band selectivity and IVF list size are both corpus-relative by
construction; this demonstrates it).

Usage: python tools/scale_probe_r11.py [n_docs_small] [factor]
Commit stdout as tools/scale_probe_r11.log.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from datafusion_archive_spark.functions import text as TX
from datafusion_archive_spark.operators import dedup, similarity
from datafusion_archive_spark.operators.util import release_caches
from datafusion_archive_spark.session import get_spark

N_SMALL = int(sys.argv[1]) if len(sys.argv) > 1 else 2500
FACTOR = int(sys.argv[2]) if len(sys.argv) > 2 else 4
DOC_LEN = 50
DIM = 64
CLUSTER = 40
N_QUERIES = 20


def docs_at(spark, n):
    """n docs of DOC_LEN words; id % 5 == 4 near-duplicates id-1 with
    positions j % 25 == 7 rewritten (2 words -> ~6 of 48 shingles)."""
    base = spark.range(n).select(
        F.col("id").alias("doc_id"),
        (
            F.col("id")
            - F.when(F.col("id") % 5 == 4, F.lit(1)).otherwise(F.lit(0))
        ).alias("parent"),
        (F.col("id") % 5 == 4).alias("is_dup"),
    )
    doc_id, parent, is_dup = (
        F.col("doc_id"), F.col("parent"), F.col("is_dup"),
    )
    words = F.transform(
        F.sequence(F.lit(0), F.lit(DOC_LEN - 1)),
        lambda j: F.when(
            is_dup & (j % 25 == F.lit(7)),
            F.concat(
                F.lit("x"),
                F.pmod(F.xxhash64(doc_id, j), F.lit(999983)).cast("string"),
            ),
        ).otherwise(
            F.concat(
                F.lit("w"),
                F.pmod(
                    F.xxhash64(parent, j, F.lit(7)), F.lit(99999989)
                ).cast("string"),
            )
        ),
    )
    return base.select("doc_id", F.concat_ws(" ", words).alias("text"))


def _bucket_candidates(grouped) -> int:
    """sum over buckets of C(c, 2) — the pairs the blocking join
    actually enumerates."""
    row = grouped.agg(
        F.sum(F.col("c") * (F.col("c") - 1) / 2).cast("long").alias("cand")
    ).collect()[0]
    return int(row.cand or 0)


def minhash_candidates(d) -> int:
    sig = dedup.minhash_signatures(d, num_hashes=16, k=3)
    bands = [
        F.struct(
            F.lit(b).alias("band"),
            F.concat_ws(
                "_", *[F.col(f"mh_{i}") for i in range(b * 4, b * 4 + 4)]
            ).alias("bucket"),
        )
        for b in range(4)
    ]
    g = (
        sig.select(F.explode(F.array(*bands)).alias("bb"))
        .groupBy("bb.band", "bb.bucket")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    return _bucket_candidates(g)


def simhash_candidates(d, n_blocks=None) -> int:
    """Simple contiguous bands (n_blocks=None: 4 x 15-bit) or
    Manku combination blocking (n_blocks=6: C(6,3) 30-bit keys) —
    mirrors operators.dedup.simhash_near_pairs."""
    sig = dedup.simhash64(d, bits=64)  # clamps to 60 usable bits
    if n_blocks is None:
        width = 15
        bands = [
            F.struct(
                F.lit(b).alias("band"),
                F.shiftrightunsigned(F.col("simhash"), b * width)
                .bitwiseAND(F.lit((1 << width) - 1))
                .alias("bucket"),
            )
            for b in range(4)
        ]
    else:
        from itertools import combinations

        width = 60 // n_blocks
        combo_size = n_blocks - 3
        block = [
            F.shiftrightunsigned(F.col("simhash"), i * width).bitwiseAND(
                F.lit((1 << width) - 1)
            )
            for i in range(n_blocks)
        ]
        bands = []
        for cidx, combo in enumerate(
            combinations(range(n_blocks), combo_size)
        ):
            val = block[combo[0]]
            for pos, i in enumerate(combo[1:], start=1):
                val = val.bitwiseOR(F.shiftleft(block[i], pos * width))
            bands.append(
                F.struct(F.lit(cidx).alias("band"), val.alias("bucket"))
            )
    g = (
        sig.select(F.explode(F.array(*bands)).alias("bb"))
        .groupBy("bb.band", "bb.bucket")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    return _bucket_candidates(g)


def ngram_candidates(d, max_df=50) -> int:
    g = (
        d.select(
            F.explode(
                F.array_distinct(TX.word_shingles(F.col("text"), 3))
            ).alias("shingle")
        )
        .groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") <= max_df)
    )
    return _bucket_candidates(g)


def embeddings_at(spark, n):
    """Clustered embeddings: center by cluster id (cluster size
    CLUSTER, so cluster COUNT grows with n), per-vector noise."""
    base = spark.range(n).select(
        F.col("id").alias("vec_id"),
        (F.col("id") / CLUSTER).cast("long").alias("cl"),
    )
    vid, cl = F.col("vec_id"), F.col("cl")
    vec = F.transform(
        F.sequence(F.lit(0), F.lit(DIM - 1)),
        lambda j: (
            F.pmod(F.xxhash64(cl, j), F.lit(2001)) / 1000.0 - 1.0
        )
        + 0.25
        * (F.pmod(F.xxhash64(vid, j, F.lit(13)), F.lit(2001)) / 1000.0 - 1.0),
    )
    return base.select("vec_id", vec.alias("embedding"))


def queries_from(corpus):
    """First N_QUERIES cluster representatives, slightly perturbed,
    re-keyed out of the corpus id space."""
    reps = corpus.filter(
        (F.col("vec_id") % CLUSTER == 0)
        & (F.col("vec_id") < CLUSTER * N_QUERIES)
    )
    vid = F.col("vec_id")
    pert = F.transform(
        F.col("embedding"),
        lambda x, i: x
        + 0.05
        * (F.pmod(F.xxhash64(vid, i, F.lit(99)), F.lit(2001)) / 1000.0 - 1.0),
    )
    return reps.select(
        (vid + 10_000_000).alias("vec_id"), pert.alias("embedding")
    )


def recall_at_5(approx, brute) -> float:
    hits = approx.join(brute, ["query_id", "neighbor_id"], "semi").count()
    total = brute.count()
    return hits / total if total else 0.0


def main() -> int:
    spark = get_spark("scale_probe_r11")
    sizes = [N_SMALL, N_SMALL * FACTOR, N_SMALL * FACTOR * FACTOR]

    print("# dedup family: params identical to the certified queries")
    print(
        "# n_docs kernel candidates out_pairs true_dups wall_s"
    )
    for n in sizes:
        d = docs_at(spark, n).cache()
        d.count()
        true_dups = n // 5
        for kernel, cand_fn, pair_fn in (
            (
                "minhash_lsh",
                minhash_candidates,
                lambda x: dedup.minhash_lsh_pairs(
                    x, num_hashes=16, bands=4, k=3, threshold=0.25
                ),
            ),
            (
                "simhash_simple4",
                simhash_candidates,
                lambda x: dedup.simhash_near_pairs(
                    x, max_hamming=3, bits=64, blocking_bands=4
                ),
            ),
            (
                "simhash_combo6x3",
                lambda x: simhash_candidates(x, n_blocks=6),
                lambda x: dedup.simhash_near_pairs(
                    x, max_hamming=3, bits=64, n_blocks=6
                ),
            ),
            (
                "ngram_jaccard",
                ngram_candidates,
                lambda x: dedup.ngram_jaccard_pairs(
                    x, k=3, threshold=0.2, max_shingle_df=50
                ),
            ),
        ):
            cand = cand_fn(d)
            t0 = time.time()
            n_pairs = pair_fn(d).count()
            wall = time.time() - t0
            release_caches()
            print(f"{n} {kernel} {cand} {n_pairs} {true_dups} {wall:.2f}")
        d.unpersist()

    print("# ann family: recall@5 vs exact, 20 perturbed-rep queries.")
    print("# ivf50 = fixed centroid_stride 50 (nlist ~ n/50: assignment")
    print("# cost n*nlist goes QUADRATIC — the r11 finding); ivfsqrt =")
    print("# stride sqrt(n) (nlist ~ sqrt(n): the standard IVF sizing,")
    print("# assignment n^1.5, per-probe list length sqrt(n)).")
    print(
        "# n_vecs lsh_recall ivf50_recall ivfsqrt_recall brute_wall_s"
        " lsh_wall_s ivf50_wall_s ivfsqrt_wall_s"
    )
    for n in sizes:
        c = embeddings_at(spark, n).cache()
        c.count()
        q = queries_from(c).cache()
        q.count()
        t0 = time.time()
        brute = similarity.cosine_topk(c, q, k=5).cache()
        brute.count()
        t_brute = time.time() - t0
        t0 = time.time()
        lsh = similarity.lsh_cosine_topk(
            c, q, k=5, planes=12, bands=4, dim=DIM
        )
        r_lsh = recall_at_5(lsh, brute)
        t_lsh = time.time() - t0
        release_caches()
        t0 = time.time()
        ivf = similarity.ivf_topk(c, q, k=5, nprobe=2, centroid_stride=50)
        r_ivf = recall_at_5(ivf, brute)
        t_ivf = time.time() - t0
        release_caches()
        stride = max(50, int(round(n ** 0.5)))
        t0 = time.time()
        ivf2 = similarity.ivf_topk(
            c, q, k=5, nprobe=2, centroid_stride=stride
        )
        r_ivf2 = recall_at_5(ivf2, brute)
        t_ivf2 = time.time() - t0
        release_caches()
        print(
            f"{n} {r_lsh:.3f} {r_ivf:.3f} {r_ivf2:.3f} "
            f"{t_brute:.2f} {t_lsh:.2f} {t_ivf:.2f} {t_ivf2:.2f}"
        )
        brute.unpersist()
        q.unpersist()
        c.unpersist()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
