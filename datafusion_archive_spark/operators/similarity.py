"""Similarity search over embedding columns (``array<float>``).

Three tiers, same API shape (returns ``(query_id, neighbor_id, cosine)``):

- :func:`cosine_topk` — exact brute force: broadcast the query set,
  cross-join against the corpus, vectorized dot products via
  ``zip_with``/``aggregate`` (JVM-side, codegen'd — no Python). O(N·Q);
  the correctness baseline and fine whenever Q is small.
- :func:`lsh_cosine_topk` — random-hyperplane LSH: each vector gets a
  ``planes``-bit signature; candidates share a signature bucket
  (multi-probe via bit flips). Cost O(N) to sign + bucket-local
  verification. The 100 TB scale path.
- :func:`ivf_assign` / :func:`ivf_topk` — inverted-file (IVF) index:
  deterministic centroid subset, vectors assigned to nearest centroid,
  queries probe ``nprobe`` nearest lists.

Dot products are computed in float64 after an explicit cast so results
are bit-reproducible against the DuckDB oracle (both engines then do
the identical left-to-right summation over 64 dims).

Embedding near-duplicate detection (:func:`cosine_pairs`) reuses the
same kernels. Reference has no similarity surface — north-star work
(BASELINE.json).
"""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from datafusion_archive_spark.operators.util import cached, spread


def _as_double(v: Column) -> Column:
    return F.transform(v, lambda x: x.cast("double"))


def _normalized(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    id_alias: str,
    vec_alias: str,
    spread_input: bool = True,
    persist: bool = True,
) -> DataFrame:
    """Project (id, unit-normalized float64 vector) and (by default)
    persist.

    Normalizing once turns every pairwise cosine into a single dot
    product (3× fewer vector passes in the quadratic kernels). The
    persist is load-bearing twice over: the self-join/broadcast reuses
    the normalized arrays instead of recomputing them per plan branch,
    and — because Catalyst inlines projected expressions into HOF
    lambdas — an unpersisted norm column would be re-evaluated per
    ELEMENT inside the division lambda. Pass ``persist=False`` when the
    caller persists a derived frame that already carries the vector
    (stacked cache layers cost a full extra materialization pass)."""
    v = _as_double(F.col(vec_col))
    nrm = F.sqrt(
        F.aggregate(
            F.zip_with(v, v, lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    if spread_input:  # small single-row-group scans otherwise serialize
        df = spread(df)
    out = (
        df
        .select(F.col(id_col).alias(id_alias), v.alias("_v"), nrm.alias("_n"))
        .select(
            id_alias,
            F.transform(F.col("_v"), lambda x: x / F.col("_n")).alias(
                vec_alias
            ),
        )
    )
    return cached(out) if persist else out


def dot(a: Column, b: Column) -> Column:
    """DuckDB: ``list_dot_product(a::DOUBLE[], b::DOUBLE[])``."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity in float64. DuckDB:
    ``list_dot_product(a,b) / (sqrt(list_dot_product(a,a)) *
    sqrt(list_dot_product(b,b)))``."""
    return dot(a, b) / (norm(a) * norm(b))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k neighbors by cosine for every query vector.

    The query side is broadcast (no shuffle of the corpus); ranking is
    a window over query id. Self-matches (same id) are excluded.
    """
    c = _normalized(corpus, id_col, vec_col, "neighbor_id", "cv")
    q = _normalized(queries, id_col, vec_col, "query_id", "qv", spread_input=False)
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(dot(F.col("qv"), F.col("cv")), 6).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def cosine_pairs(
    df: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding near-duplicate pairs: all (id_a < id_b) with cosine ≥
    threshold. Exact (quadratic) — use :func:`lsh_cosine_topk` blocking
    at corpus scale; this exact form is the verification kernel."""
    a = _normalized(df, id_col, vec_col, "id_a", "va")
    b = a.select(F.col("id_a").alias("id_b"), F.col("va").alias("vb"))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.round(dot(F.col("va"), F.col("vb")), 6).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )


# -- LSH: random hyperplanes ------------------------------------------------


def _hyperplanes(dim: int, planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic pseudo-random unit-free hyperplanes: component
    (p, d) = standardized value derived from md5(seed:p:d). Box-Muller
    over two md5-derived uniforms keeps components Gaussian-ish, which
    preserves the LSH cosine-angle guarantee."""
    out = []
    for p in range(planes):
        row = []
        for d in range(dim):
            h1 = int(
                hashlib.md5(f"{seed}:{p}:{d}:a".encode()).hexdigest()[:15], 16
            )
            h2 = int(
                hashlib.md5(f"{seed}:{p}:{d}:b".encode()).hexdigest()[:15], 16
            )
            u1 = (h1 + 1) / (16**15 + 1)
            u2 = (h2 + 1) / (16**15 + 1)
            row.append(
                math.sqrt(-2.0 * math.log(u1)) * math.cos(2 * math.pi * u2)
            )
        out.append(row)
    return out


def signature_col(vec: str, planes: list[list[float]]) -> Column:
    """Bit-signature of a (double-cast) vector column named ``vec``
    against the hyperplanes: bit p = 1 iff dot(vec, plane_p) >= 0.
    Returns a long.

    Two deliberate shape choices, both measured:

    - Stays zip_with+aggregate (not an unrolled ``v[0]·p0 + …`` Add
      tree): same IEEE result, but the 768-node tree makes Catalyst
      re-walk it on every optimizer/AQE pass — 1.6× slower end-to-end.
    - Built as ONE ``F.expr`` SQL string, not chained Column ops:
      12 planes × 64 ``F.lit`` components is ~800 py4j round-trips,
      ~3 s of driver-side plan construction per query build.

    Plane components are embedded as ``CAST('<repr>' AS DOUBLE)`` —
    repr round-trips IEEE doubles exactly, so results are bit-identical
    to the lit() formulation (and to the SQL oracle, which inlines the
    same reprs).
    """
    terms = []
    for p, plane in enumerate(planes):
        arr = ", ".join(f"CAST('{x!r}' AS DOUBLE)" for x in plane)
        d = (
            f"aggregate(zip_with({vec}, array({arr}), (x, y) -> x * y), "
            f"CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)"
        )
        terms.append(f"IF({d} >= 0, {1 << p}L, 0L)")
    return F.expr(" + ".join(terms))


def lsh_cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    planes: int = 12,
    bands: int = 4,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k via banded random-hyperplane LSH
    (OR-amplification): the ``planes``-bit signature is split into
    ``bands`` bands; a corpus vector is a candidate iff it agrees with
    the query on *any* full band. Candidates are verified with exact
    cosine; top-k ranked per query.

    Scale: signatures are one narrow map over the corpus; the candidate
    join is an equi-join on (band, band-bits) — shuffle cardinality
    O(N·bands), never O(N·Q). Tune the recall/candidate-volume
    trade-off with bits-per-band (selectivity halves per extra bit):
    clustered real-world embeddings want more bits per band; this
    testdata is near-uniform, where any sublinear ANN is inherently
    recall-limited.
    """
    assert planes % bands == 0
    bits_per_band = planes // bands
    mask = (1 << bits_per_band) - 1
    hp = _hyperplanes(dim, planes, seed)

    def banded(df, id_alias, vec_alias):
        # persist the signed frame: the 12 interpreted plane-dots per
        # row must compute once, not once per band row / join branch
        signed = cached(
            df.withColumn("sig", signature_col(vec_alias, hp))
        )
        # one expr() round-trip, not bands×~8 chained py4j calls —
        # the same driver-side plan-construction economy as
        # signature_col (measured ~30 ms per chained struct on this
        # host; value-identical SQL)
        band_items = ", ".join(
            f"named_struct('band', {b}, 'band_val', "
            f"(shiftrightunsigned(sig, {b * bits_per_band}) & {mask}))"
            for b in range(bands)
        )
        return signed.select(
            id_alias,
            vec_alias,
            F.expr(f"explode(array({band_items}))").alias("bb"),
        ).select(
            id_alias,
            vec_alias,
            F.col("bb.band").alias("band"),
            F.col("bb.band_val").alias("band_val"),
        )

    # the persist under banded() is load-bearing: signature_col indexes
    # the vector 64×/plane, and an unpersisted normalized array would
    # inline its whole transform lineage into every getItem
    c = banded(
        _normalized(corpus, id_col, vec_col, "neighbor_id", "cv"),
        "neighbor_id",
        "cv",
    )
    q = banded(
        _normalized(
            queries, id_col, vec_col, "query_id", "qv", spread_input=False
        ),
        "query_id",
        "qv",
    )

    scored = (
        c.join(F.broadcast(q), ["band", "band_val"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(dot(F.col("qv"), F.col("cv")), 6).alias("cosine"),
        )
        # a pair can match in several bands — dedupe (values identical)
        .groupBy("query_id", "neighbor_id")
        .agg(F.min("cosine").alias("cosine"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def lsh_cosine_pairs(
    df: DataFrame,
    threshold: float = 0.9,
    planes: int = 12,
    bands: int = 4,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """Embedding near-duplicate pairs at scale: banded hyperplane-LSH
    candidate generation → exact-cosine verification, returning
    ``(id_a < id_b, cosine ≥ threshold)``.

    This is the scale path :func:`cosine_pairs` documents: the
    self-join keys on (band, band-bits) so shuffle cardinality is
    O(N·bands) and the quadratic term is confined to same-bucket
    collisions, while every emitted pair is exact (verified with the
    true dot product) — only recall is approximate, as for any LSH
    blocking scheme.
    """
    assert planes % bands == 0
    bits_per_band = planes // bands
    mask = (1 << bits_per_band) - 1
    hp = _hyperplanes(dim, planes, seed)

    normed = _normalized(df, id_col, vec_col, "id", "v")
    signed = cached(normed.withColumn("sig", signature_col("v", hp)))
    # single expr() round-trip (see lsh_cosine_topk.banded for the
    # measured py4j economics); value-identical SQL
    band_items = ", ".join(
        f"named_struct('band', {b}, 'band_val', "
        f"(shiftrightunsigned(sig, {b * bits_per_band}) & {mask}))"
        for b in range(bands)
    )
    blocked = signed.select(
        "id", "v", F.expr(f"explode(array({band_items}))").alias("bb")
    ).select(
        "id", "v",
        F.col("bb.band").alias("band"),
        F.col("bb.band_val").alias("band_val"),
    )
    a, b = blocked.alias("a"), blocked.alias("b")
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
            F.round(dot(F.col("a.v"), F.col("b.v")), 6).alias("cosine"),
        )
        # a pair can collide in several bands — dedupe (values identical)
        .groupBy("id_a", "id_b")
        .agg(F.min("cosine").alias("cosine"))
        .filter(F.col("cosine") >= threshold)
    )


# -- IVF --------------------------------------------------------------------


def _auto_stride(corpus: DataFrame) -> int:
    """centroid_stride ~ sqrt(n): nlist ~ sqrt(n) and each list ~
    sqrt(n) long — the standard IVF sizing the r11 scale probe
    validated (a FIXED stride makes nlist grow with the corpus and
    the assignment join quadratic; see ivf_topk's sizing note). Costs
    one count() of the corpus, which an index build amortizes."""
    n = corpus.count()
    return max(1, int(round(n**0.5)))


def ivf_assign(
    corpus: DataFrame,
    centroid_stride: int | None = 50,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Assign every vector to its nearest centroid. Centroids are the
    deterministic subset ``id % stride == 0`` (a real system would run
    k-means; the index structure and query path are identical).
    ``centroid_stride=None`` auto-sizes to ~sqrt(corpus) — see
    :func:`_auto_stride`. Returns corpus rows + ``list_id``."""
    if centroid_stride is None:
        centroid_stride = _auto_stride(corpus)
    c = _normalized(corpus, id_col, vec_col, "nid", "v")
    cents = c.filter(F.col("nid") % centroid_stride == 0).select(
        F.col("nid").alias("list_id"), F.col("v").alias("cv")
    )
    scored = c.join(F.broadcast(cents)).select(
        "nid", "v", "list_id", dot(F.col("v"), F.col("cv")).alias("cos")
    )
    w = Window.partitionBy("nid").orderBy(F.col("cos").desc(), F.col("list_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("nid", "v", "list_id")
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    nprobe: int = 2,
    centroid_stride: int | None = 50,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF query: probe the ``nprobe`` nearest inverted lists, exact
    cosine within them. At scale the assigned corpus is written
    partitioned by ``list_id`` so a probe reads only its partitions
    (partition pruning does the index lookup).

    Sizing rule (r11 scale probe, tools/scale_probe_r11.log): a FIXED
    ``centroid_stride`` makes nlist grow with the corpus, so the
    assignment join costs n * (n/stride) — quadratic; the probe
    measured 1.7 s -> 15.7 s for 4x the vectors. Choose
    ``centroid_stride ~ sqrt(n)`` (nlist ~ sqrt(n), the standard IVF
    sizing): assignment drops to n^1.5 and each probed list stays
    ~sqrt(n) long (3.3x faster at 40k vectors, recall within 4 pts).
    Pass ``centroid_stride=None`` to auto-size that way. The certified
    query keeps stride=50 because its gate corpus is 500 vectors,
    where 50 IS ~sqrt(n)."""
    if centroid_stride is None:
        centroid_stride = _auto_stride(corpus)
    assigned = ivf_assign(corpus, centroid_stride, id_col, vec_col)
    cents = _normalized(
        corpus.filter(F.col(id_col) % centroid_stride == 0),
        id_col, vec_col, "list_id", "cv",
    )
    q = _normalized(queries, id_col, vec_col, "query_id", "qv", spread_input=False)
    probe_w = Window.partitionBy("query_id").orderBy(
        F.col("ccos").desc(), F.col("list_id")
    )
    probes = (
        q.join(F.broadcast(cents))
        .select(
            "query_id", "qv", "list_id",
            dot(F.col("qv"), F.col("cv")).alias("ccos"),
        )
        .withColumn("rn", F.row_number().over(probe_w))
        .filter(F.col("rn") <= nprobe)
        .select("query_id", "qv", "list_id")
    )
    scored = (
        assigned.join(F.broadcast(probes), "list_id")
        .filter(F.col("query_id") != F.col("nid"))
        .select(
            "query_id",
            F.col("nid").alias("neighbor_id"),
            F.round(dot(F.col("qv"), F.col("v")), 6).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def ivf_index_write(
    corpus: DataFrame,
    base_path: str,
    centroid_stride: int | None = 50,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Materialize the IVF index at rest: the assigned corpus written
    ``partitionBy(list_id)`` (one directory per inverted list) plus
    the small centroid table alongside. This is the layout that turns
    an IVF probe into *partition pruning* — the query below reads only
    its probed lists' directories, which is the whole point of an IVF
    index at 100 TB. ``centroid_stride=None`` auto-sizes to
    ~sqrt(corpus) (see :func:`_auto_stride`) — the natural choice
    here, where the build cost is amortized over every future probe."""
    if centroid_stride is None:
        centroid_stride = _auto_stride(corpus)
    assigned = ivf_assign(corpus, centroid_stride, id_col, vec_col)
    (
        assigned.write.mode("overwrite")
        .partitionBy("list_id")
        .parquet(f"{base_path}/lists")
    )
    cents = _normalized(
        corpus.filter(F.col(id_col) % centroid_stride == 0),
        id_col, vec_col, "list_id", "cv", spread_input=False,
        persist=False,
    )
    cents.write.mode("overwrite").parquet(f"{base_path}/centroids")


def ivf_topk_from_index(
    spark,
    base_path: str,
    queries: DataFrame,
    k: int = 5,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF query against the at-rest index: pick each query's
    ``nprobe`` nearest centroids, then scan ONLY those lists'
    partitions (static IN-list pruning — the probed id set is tiny,
    queries x nprobe, so collecting it to the driver is the correct
    move; the plan shows the list_id PartitionFilters) and rank exact
    cosine within them. Results are identical to the in-memory
    :func:`ivf_topk` for the same stride/probe parameters."""
    cents = spark.read.parquet(f"{base_path}/centroids")
    q = _normalized(
        queries, id_col, vec_col, "query_id", "qv", spread_input=False
    )
    probe_w = Window.partitionBy("query_id").orderBy(
        F.col("ccos").desc(), F.col("list_id")
    )
    probes = (
        q.join(F.broadcast(cents))
        .select(
            "query_id", "qv", "list_id",
            dot(F.col("qv"), F.col("cv")).alias("ccos"),
        )
        .withColumn("rn", F.row_number().over(probe_w))
        .filter(F.col("rn") <= nprobe)
        .select("query_id", "qv", "list_id")
    )
    probes = cached(probes)
    probe_ids = [r.list_id for r in probes.select("list_id").distinct().collect()]
    lists = spark.read.parquet(f"{base_path}/lists").filter(
        F.col("list_id").isin(probe_ids)
    )
    scored = (
        lists.join(F.broadcast(probes), "list_id")
        .filter(F.col("query_id") != F.col("nid"))
        .select(
            "query_id",
            F.col("nid").alias("neighbor_id"),
            F.round(dot(F.col("qv"), F.col("v")), 6).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def ivf_topk_kmeans(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    nprobe: int = 2,
    n_lists: int = 8,
    n_iters: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF with TRAINED centroids: Lloyd's k-means over the unit-
    normalized corpus (operators/kmeans.py) replaces the id-stride
    seeding rule — the variant that holds when ids carry no cluster
    structure (the stride rule's silent assumption). On unit vectors,
    squared euclidean is 2 - 2*cos, so euclidean k-means cells are
    exactly the cosine Voronoi cells the probe path assumes.

    Same probe machinery and output schema as ivf_topk:
    (query_id, neighbor_id, cosine, rank).
    """
    from datafusion_archive_spark.operators.kmeans import (
        kmeans_assign,
        kmeans_train,
    )

    spark = corpus.sparkSession
    c = _normalized(corpus, id_col, vec_col, "nid", "v")
    cents = kmeans_train(
        c, k=n_lists, n_iters=n_iters, id_col="nid", vec_col="v"
    )
    assigned = kmeans_assign(c, cents, id_col="nid", vec_col="v").select(
        F.col("pid").alias("nid"), "v", "list_id"
    )
    cdf = spark.createDataFrame(
        [(i, cv) for i, cv in enumerate(cents)],
        "list_id INT, cv ARRAY<DOUBLE>",
    )
    q = _normalized(
        queries, id_col, vec_col, "query_id", "qv", spread_input=False
    )
    probe_w = Window.partitionBy("query_id").orderBy(
        F.col("ccos").desc(), F.col("list_id")
    )
    probes = (
        q.join(F.broadcast(cdf))
        .select(
            "query_id", "qv", "list_id",
            dot(F.col("qv"), F.col("cv")).alias("ccos"),
        )
        .withColumn("rn", F.row_number().over(probe_w))
        .filter(F.col("rn") <= nprobe)
        .select("query_id", "qv", "list_id")
    )
    scored = (
        assigned.join(F.broadcast(probes), "list_id")
        .filter(F.col("query_id") != F.col("nid"))
        .select(
            "query_id",
            F.col("nid").alias("neighbor_id"),
            F.round(dot(F.col("qv"), F.col("v")), 6).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def semantic_dedup(
    df: DataFrame,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cluster_col: str = "label",
) -> DataFrame:
    """SemDeDup-style cluster-scoped embedding dedup: a vector is
    *removed* iff an earlier (lower-id) member of the SAME cluster has
    cosine >= threshold to it. Returns (id, cluster, removed flag).

    This is the scale formulation of semantic dedup: the corpus-wide
    quadratic kernel collapses to an equi-join on the cluster id, so
    cost is sum(|cluster|^2) — bounded by the clustering granularity
    (at 100 TB the cluster assignment comes from operators.kmeans /
    ivf_assign; here the assignment column is an input). Nothing
    all-pairs ever runs across clusters, the join key is the cluster
    id (hash-shuffle, AQE-skew-splittable), and vectors are
    unit-normalized once before the join (dot == cosine).

    Keep-lowest-id is deterministic and order-free: "removed" is
    EXISTS(earlier similar member), not a greedy chain — every engine
    computes the identical set regardless of partitioning.
    """
    a = _normalized(df, id_col, vec_col, "_id", "_v", persist=False)
    c = df.select(
        F.col(id_col).alias("_id"), F.col(cluster_col).alias("_c")
    )
    a = cached(a.join(c, "_id"))
    b = a.select(
        F.col("_id").alias("_id_b"), F.col("_v").alias("_vb"), "_c"
    )
    dup_ids = (
        a.join(b, "_c")
        .filter(F.col("_id") < F.col("_id_b"))
        .filter(F.round(dot(F.col("_v"), F.col("_vb")), 6) >= threshold)
        .select(F.col("_id_b").alias("_dup"))
        .distinct()
    )
    return (
        a.join(
            dup_ids, a["_id"] == dup_ids["_dup"], "left"
        )
        .select(
            F.col("_id").alias(id_col),
            F.col("_c").alias(cluster_col),
            F.col("_dup").isNotNull().alias("removed"),
        )
    )
