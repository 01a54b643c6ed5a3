"""Round-11d scale probe: the WINNOWING / MOSS fingerprint family —
the last heavy operator family without growing-scale evidence.

Synthetic corpus at three sizes (default 2500 docs, then 4x and 16x):
docs are 60 words from an effectively unbounded hash vocabulary;
``id % 5 == 4`` copies a 20-word passage from doc ``id-1`` (a LOCAL
copy — winnowing's guarantee: any shared substring of length
>= k + w - 1 chars yields a shared fingerprint, so each planted pair
MUST surface), and ``id % 17 == 0`` appends one FIXED 12-word
boilerplate footer. The boilerplate group grows linearly with the
corpus, so every footer fingerprint's document frequency grows with
n and its C(df, 2) self-join contribution grows with n² — exactly
the blowup the certified corpus shows between sf0.01 and sf0.1
(1.08M -> 107M candidates for 10x docs) and exactly what the MOSS
document-frequency cap (queries/pipeline64._MAX_HASH_DF, Schleimer
et al. SIGMOD 2003 s5) exists to stop.

Measured per size, with the EXACT certified kernel
(pipeline64._selected_from, same _K/_WIN/_SEED):

- winnowing: positions, selected fingerprints, observed density
  (must stay ~2/(w+1), size-independent), wall — all linear.
- moss: join candidates sum C(df,2) UNCAPPED vs CAPPED at
  _MAX_HASH_DF, output pair count, planted-pair recall (the n/5
  parent-copy pairs must all appear), wall of the capped pipeline.
  The uncapped candidate column is the quadratic counterfactual; the
  capped one must track docs.

Usage: python tools/scale_probe_r11d.py [n_docs_small] [factor]
Commit stdout as tools/scale_probe_r11d.log.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from datafusion_archive_spark.operators.util import release_caches
from datafusion_archive_spark.queries.pipeline64 import (
    _MAX_HASH_DF,
    _selected_from,
)
from datafusion_archive_spark.session import get_spark

N_SMALL = int(sys.argv[1]) if len(sys.argv) > 1 else 2500
FACTOR = int(sys.argv[2]) if len(sys.argv) > 2 else 4
DOC_LEN = 60
COPY_LEN = 20
BOILER = " ".join(f"boiler{i} footer{i}" for i in range(6))


def docs_at(spark, n):
    base = spark.range(n).select(
        F.col("id").alias("doc_id"),
        (
            F.col("id")
            - F.when(F.col("id") % 5 == 4, F.lit(1)).otherwise(F.lit(0))
        ).alias("parent"),
        (F.col("id") % 5 == 4).alias("is_dup"),
        (F.col("id") % 17 == 0).alias("has_boiler"),
    )
    doc_id, parent, is_dup = (
        F.col("doc_id"), F.col("parent"), F.col("is_dup"),
    )
    words = F.transform(
        F.sequence(F.lit(0), F.lit(DOC_LEN - 1)),
        lambda j: F.when(
            is_dup & (j < F.lit(COPY_LEN)),
            # the copied passage: words 0..COPY_LEN-1 of the parent
            F.concat(
                F.lit("w"),
                F.pmod(
                    F.xxhash64(parent, j, F.lit(7)), F.lit(99999989)
                ).cast("string"),
            ),
        ).otherwise(
            F.concat(
                F.lit("w"),
                F.pmod(
                    F.xxhash64(doc_id, j, F.lit(7)), F.lit(99999989)
                ).cast("string"),
            )
        ),
    )
    text = F.when(
        F.col("has_boiler"),
        F.concat(F.concat_ws(" ", words), F.lit(" " + BOILER)),
    ).otherwise(F.concat_ws(" ", words))
    return base.select(
        "doc_id",
        (F.col("doc_id") % 4).cast("string").alias("source"),
        F.lower(text).alias("t"),
    )


def main() -> int:
    spark = get_spark("scale_probe_r11d")
    sizes = [N_SMALL, N_SMALL * FACTOR, N_SMALL * FACTOR * FACTOR]
    print(
        "# n_docs positions selected density winnow_wall_s | "
        "cand_uncapped cand_capped out_pairs planted planted_found "
        "moss_wall_s"
    )
    for n in sizes:
        d = docs_at(spark, n).cache()
        d.count()
        t0 = time.time()
        sel = _selected_from(d).cache()
        stats = sel.groupBy().agg(
            F.count(F.lit(1)).alias("n_sel")
        ).collect()[0]
        npos = d.select(
            F.sum(F.length("t") - 7).alias("p")
        ).collect()[0].p
        winnow_wall = time.time() - t0
        density = stats.n_sel / npos

        hashes = sel.select(
            "doc_id", F.substring("sel", 1, 19).alias("h")
        ).distinct().cache()
        dfreq = hashes.groupBy("h").agg(F.count(F.lit(1)).alias("df"))
        cand = dfreq.agg(
            F.sum(F.expr("df*(df-1)/2")).cast("long").alias("unc"),
            F.sum(
                F.when(
                    F.col("df") <= _MAX_HASH_DF,
                    F.expr("df*(df-1)/2"),
                ).otherwise(F.lit(0))
            ).cast("long").alias("cap"),
        ).collect()[0]

        t0 = time.time()
        rare = dfreq.filter(F.col("df") <= _MAX_HASH_DF).select("h")
        hc = hashes.join(rare, "h")
        pairs = (
            hc.alias("a")
            .join(
                hc.alias("b"),
                (F.col("a.h") == F.col("b.h"))
                & (F.col("a.doc_id") < F.col("b.doc_id")),
            )
            .groupBy(
                F.col("a.doc_id").alias("doc_a"),
                F.col("b.doc_id").alias("doc_b"),
            )
            .agg(F.count(F.lit(1)).alias("shared"))
            .cache()
        )
        out_pairs = pairs.count()
        moss_wall = time.time() - t0
        planted = n // 5
        planted_found = pairs.filter(
            (F.col("doc_b") == F.col("doc_a") + 1)
            & (F.col("doc_b") % 5 == 4)
        ).count()

        print(
            f"{n} {npos} {stats.n_sel} {density:.4f} "
            f"{winnow_wall:.2f} | {cand.unc} {cand.cap} {out_pairs} "
            f"{planted} {planted_found} {moss_wall:.2f}"
        )
        release_caches()
        d.unpersist()
        sel.unpersist()
        hashes.unpersist()
        pairs.unpersist()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
