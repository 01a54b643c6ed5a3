"""End-to-end training-data pipeline over the testdata corpus:

read documents → text features (quality/tokens/lang) → quality gate →
benchmark decontamination → exact dedup → MinHash-LSH near-dup
clustering (keep one survivor per cluster) → embedding near-dup check
(banded LSH) → write the clean corpus partitioned by language.

Every stage is a scan-side projection, a broadcast probe, or a single
keyed shuffle; at 100 TB the same code runs unchanged — partitioned
output + AQE do the rest.
Run: python examples/training_data_pipeline.py [sf_dir] [out_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import tempfile

from pyspark.sql import functions as F

from datafusion_archive_spark import ExecutionContext, get_spark
from datafusion_archive_spark.functions import text as TX
from datafusion_archive_spark.operators import dedup, similarity
from datafusion_archive_spark.sources import write_partitioned


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_dir = (
        sys.argv[2] if len(sys.argv) > 2 else tempfile.mkdtemp("clean_corpus")
    )
    ctx = ExecutionContext(get_spark("training_pipeline"))
    ctx.register_testdata(sf_dir)
    docs = ctx.table("documents")

    # 1. features + quality gate (scan-side, zero shuffles)
    t = F.col("text")
    enriched = docs.select(
        "doc_id",
        "text",
        "lang",
        TX.quality_score(t).alias("quality"),
        TX.token_count(t).alias("tokens"),
    ).filter((F.col("quality") >= 0.4) & (F.col("tokens") >= 10))

    # 2. benchmark decontamination: drop docs sharing any 8-gram with
    #    the (stand-in) eval set — the gram set broadcasts, the corpus
    #    never shuffles for the probe
    bench = docs.filter(F.col("doc_id") < 20)

    def grams(df):
        return df.select(
            F.col("doc_id").alias("id"),
            F.explode(
                F.array_distinct(TX.word_shingles(F.col("text"), 8))
            ).alias("g"),
        ).select("id", TX.hash64(F.col("g"), 0).alias("gh"))

    bench_grams = grams(bench).select("gh").distinct()
    contaminated = (
        grams(enriched.select(F.col("doc_id"), F.col("text")))
        .join(F.broadcast(bench_grams), "gh")
        .select(F.col("id").alias("doc_id"))
        .distinct()
    )
    clean = enriched.join(contaminated, "doc_id", "left_anti")

    # 3. exact dedup: keep the lowest doc_id per fingerprint
    survivors = dedup.exact_duplicates(clean).select(
        F.col("keep_id").alias("doc_id")
    )
    clean = clean.join(survivors, "doc_id")

    # 4. near-dup clustering: LSH pairs → connected components → keep
    #    one survivor (min id) per cluster
    keep = dedup.dedup_clusters(clean, threshold=0.5).select(
        F.col("keep_id").alias("doc_id")
    )
    paired = dedup.minhash_lsh_pairs(clean, threshold=0.5)
    in_any_pair = (
        paired.select(F.col("id_a").alias("doc_id"))
        .unionByName(paired.select(F.col("id_b").alias("doc_id")))
        .distinct()
    )
    clean = clean.join(in_any_pair, "doc_id", "left_anti").unionByName(
        clean.join(keep, "doc_id")
    )

    # 5. embedding near-dups via banded LSH (cosine ≥ 0.95) → drop
    #    higher vec_id of each pair
    emb = ctx.table("embeddings")
    epairs = similarity.lsh_cosine_pairs(emb, threshold=0.95)
    edrop = epairs.select(F.col("id_b").alias("doc_id")).distinct()
    clean = clean.join(edrop, "doc_id", "left_anti")

    # 6. write partitioned by language (partition-pruned reads later)
    write_partitioned(
        clean.select("doc_id", "lang", "quality", "tokens", "text"),
        out_dir,
        ["lang"],
    )

    kept = ctx.spark.read.parquet(out_dir)
    print(f"input docs: {docs.count()}")
    print(f"clean docs: {kept.count()}  →  {out_dir}")
    kept.groupBy("lang").count().orderBy("lang").show()


if __name__ == "__main__":
    main()
