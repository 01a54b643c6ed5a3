"""End-to-end training-data pipeline over the testdata corpus:

read documents → text features (quality/tokens/lang) → quality gate →
exact dedup → MinHash-LSH near-dup pruning → embedding near-dup check
→ write the clean corpus partitioned by language.

Every stage is a scan-side projection or a single keyed shuffle; at
100 TB the same code runs unchanged — partitioned output + AQE do the
rest. Run: python examples/training_data_pipeline.py [sf_dir] [out_dir]
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

    # 2. exact dedup: keep the lowest doc_id per fingerprint
    survivors = dedup.exact_duplicates(enriched).select(
        F.col("keep_id").alias("doc_id")
    )
    clean = enriched.join(survivors, "doc_id")

    # 3. near-dup pruning: drop the higher id of each MinHash-LSH pair
    near = dedup.minhash_lsh_pairs(clean, bands=8, threshold=0.5)
    drop = near.select(F.col("id_b").alias("doc_id")).distinct()
    clean = clean.join(drop, "doc_id", "left_anti")

    # 4. embedding near-dups (cosine ≥ 0.95) → drop higher vec_id
    emb = ctx.table("embeddings")
    epairs = similarity.cosine_pairs(emb, threshold=0.95)
    edrop = epairs.select(F.col("id_b").alias("doc_id")).distinct()
    clean = clean.join(edrop, "doc_id", "left_anti")

    # 5. write partitioned by language (partition-pruned reads later)
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
