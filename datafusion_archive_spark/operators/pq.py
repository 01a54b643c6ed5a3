"""Product quantization (PQ) for embedding columns — the compression
that makes 100 TB-scale vector search feasible (Jegou et al. 2011):
split each vector into ``m`` subspaces, learn a ``ksub``-entry k-means
codebook per subspace, store each vector as ``m`` small codes, and
score queries against codes via per-query lookup tables (asymmetric
distance computation, ADC).

Scale design:

- **Training** runs ``m`` independent Lloyd's trainings
  (operators/kmeans.py) over sliced sub-vectors — each is the bounded-
  driver pattern (k x dsub centroids per iteration), and at scale it
  runs on a sample, not the full corpus.
- **Encoding** is map-only: the m x ksub codebook rides into the plan
  as literals, each subspace's argmin is a pure array expression —
  zero shuffles, zero Python, the corpus never moves. A float32
  dim-128 vector (512 B) becomes m codes (m bytes): a 64x storage
  reduction at m=8.
- **ADC scoring** explodes codes to (vec, subspace, code) and joins
  the broadcast per-query lookup table (nq x m x ksub rows — tiny);
  the only shuffle carries (query, vec, partial sums) into the final
  aggregate. The full-precision corpus is never read at query time.

The reference has no vector surface (``/root/reference/ROADMAP.md``);
this belongs to the training-data-pipeline extension (embedding dedup
and similarity at corpus scale). Recall and the compression contract
are pinned in tests/test_round5b.py against exact brute-force search.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from datafusion_archive_spark.operators.kmeans import _sqdist, kmeans_train


def _sub(vec, j: int, dsub: int):
    """1-based slice of subspace j from an array column."""
    return F.slice(vec, j * dsub + 1, dsub)


def pq_train(
    corpus: DataFrame,
    m: int = 4,
    ksub: int = 16,
    n_iters: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[list[float]]]:
    """Learn per-subspace codebooks: returns ``m`` lists of ``ksub``
    centroids (each of length dim/m). dim must divide evenly by m."""
    dim = len(corpus.select(vec_col).first()[0])
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    dsub = dim // m
    v = F.col(vec_col).cast("array<double>")
    books = []
    for j in range(m):
        sub = corpus.select(
            F.col(id_col).alias(id_col), _sub(v, j, dsub).alias("sv")
        )
        books.append(
            kmeans_train(
                sub, k=ksub, n_iters=n_iters, id_col=id_col, vec_col="sv"
            )
        )
    return books


def _argmin_code(sv, book: list[list[float]]):
    """Pure-expression argmin over the ksub codebook entries: index of
    the minimum squared distance (ties -> lowest code, matching
    kmeans_assign's ordering)."""
    dists = F.array(
        *[
            F.aggregate(
                F.zip_with(
                    sv,
                    F.array(*[F.lit(float(x)) for x in c]),
                    lambda a, b: (a - b) * (a - b),
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            for c in book
        ]
    )
    return (F.array_position(dists, F.array_min(dists)) - 1).cast("int")


def pq_encode(
    corpus: DataFrame,
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Map-only encoding: (id, codes array<int>) — m small codes per
    vector, computed entirely in JVM expressions with the codebooks as
    plan literals. This is the at-rest representation; the
    full-precision column is dropped."""
    m = len(codebooks)
    dsub = len(codebooks[0][0])
    v = F.col(vec_col).cast("array<double>")
    return corpus.select(
        F.col(id_col).alias("pid"),
        F.array(
            *[_argmin_code(_sub(v, j, dsub), codebooks[j]) for j in range(m)]
        ).alias("codes"),
    )


def pq_topk(
    codes: DataFrame,
    queries: DataFrame,
    codebooks: list[list[list[float]]],
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ADC top-k by (approximate) squared euclidean distance: build the
    per-query (subspace, code) -> distance lookup table driver-side
    (nq x m x ksub doubles — bounded), broadcast it onto the exploded
    code column, and aggregate per (query, vector).

    Returns (query_id, neighbor_id, approx_dist, rk) with rk <= k,
    ties broken on neighbor_id.
    """
    spark = codes.sparkSession
    m = len(codebooks)
    dsub = len(codebooks[0][0])
    qrows = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("qv"),
    ).collect()
    lut = []
    for qr in qrows:
        qv = list(qr.qv)
        for j in range(m):
            sub = qv[j * dsub : (j + 1) * dsub]
            for code, cent in enumerate(codebooks[j]):
                d = sum((a - b) * (a - b) for a, b in zip(sub, cent))
                lut.append((qr.query_id, j, code, d))
    ldf = spark.createDataFrame(
        lut, "query_id LONG, j INT, code INT, d DOUBLE"
    )
    exploded = codes.select(
        "pid", F.posexplode("codes").alias("j", "code")
    )
    scored = (
        exploded.join(F.broadcast(ldf), ["j", "code"])
        .filter(F.col("query_id") != F.col("pid"))
        .groupBy("query_id", "pid")
        .agg(F.sum("d").alias("approx_dist"))
    )
    w = Window.partitionBy("query_id").orderBy("approx_dist", "pid")
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select(
            "query_id",
            F.col("pid").alias("neighbor_id"),
            F.round("approx_dist", 6).alias("approx_dist"),
            "rk",
        )
    )


def pq_topk_refined(
    codes: DataFrame,
    corpus: DataFrame,
    queries: DataFrame,
    codebooks: list[list[list[float]]],
    k: int = 5,
    shortlist_mult: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """The production PQ pattern: ADC produces a cheap shortlist
    (``shortlist_mult * k`` per query, scored from codes alone), then
    ONLY the shortlisted vectors are re-ranked with exact full-
    precision distances. At 100 TB the full-precision column lives in
    cold storage and this join touches shortlist-sized row groups, not
    the corpus — the quantization error that caps raw-ADC recall
    affects only shortlist membership, which the multiplier absorbs.

    Returns (query_id, neighbor_id, dist, rk) with exact squared
    euclidean distances, rk <= k.
    """
    short = pq_topk(
        codes, queries, codebooks, k=k * shortlist_mult,
        id_col=id_col, vec_col=vec_col,
    ).select("query_id", "neighbor_id")
    full = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("nv"),
    )
    qv = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("qv"),
    )
    w = Window.partitionBy("query_id").orderBy("dist", "neighbor_id")
    return (
        short.join(full, "neighbor_id")
        .join(F.broadcast(qv), "query_id")
        .select(
            "query_id",
            "neighbor_id",
            F.round(_sqdist(F.col("qv"), F.col("nv")), 6).alias("dist"),
        )
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
    )
