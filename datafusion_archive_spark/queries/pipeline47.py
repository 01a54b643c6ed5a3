"""Pipeline wave 47 (round 5, forty-fifth wave): linear algebra on
the embedding corpus — the PCA/compression layer of an ANN pipeline.

- ``pca_power_iteration`` — the top principal component of the
  embedding corpus by _PCA_ITERS fixed power iterations on the
  covariance action Cv = (1/n)Σ(x−m)((x−m)·v): each iteration is a
  broadcast-v matvec (one dot-product map + one per-dimension
  aggregate — never materializing the d×d covariance), the exact
  distributed PCA pattern for d up to thousands. Output: Rayleigh
  eigenvalue, explained-variance share, and the top loadings. The
  oracle UNROLLS the identical 8 iterations as generated DuckDB
  CTEs (list_dot_product + per-index regroup) — same start vector,
  same normalization, same arithmetic.
- ``embedding_quantization_audit`` — uniform per-dimension 4-bit
  scalar quantization (the PQ-lite baseline): codes by
  ``floor((x−lo)/(hi−lo)·16)`` clamped to 15 (floor, not round —
  half-to-even vs half-up is an engine-semantics trap), with
  corpus reconstruction MSE and the mean per-dimension code entropy
  in bits (how many of the 4 bits the data actually uses).

The reference has no arrays (``/root/reference/ROADMAP.md``).
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from datafusion_archive_spark.operators.util import cached

_PCA_ITERS = 8
_PCA_TOP = 8
_DIM = 64
_QLEVELS = 16


def _exploded(spark, sf):
    emb = spark.read.parquet(f"{sf}/embeddings.parquet")
    return emb.select(
        "vec_id", F.posexplode("embedding").alias("i", "x")
    ).select("vec_id", (F.col("i") + 1).alias("i"),
             F.col("x").cast("double").alias("x"))


def _pca_matvec_fn(m, v):
    """mapInArrow kernel for one power iteration: per batch, emit the
    64 partial sums of c_i * ((x-m)·v) — the covariance action on v
    without ever shuffling per-vector rows (round 16; the old shape
    ran a corpus-cardinality groupBy(vec_id) AND a vec_id join per
    iteration)."""
    import numpy as np

    M = np.asarray(m, dtype=np.float64)
    V0 = np.asarray(v, dtype=np.float64)

    def fn(batches):
        import numpy as np
        import pyarrow as pa

        from datafusion_archive_spark.queries.pipeline62 import _km_vmat

        for b in batches:
            if not b.num_rows:
                continue
            C = _km_vmat(b, "v") - M
            s = C.T @ (C @ V0)
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(np.arange(1, s.size + 1, dtype=np.int32)),
                    pa.array(s),
                ],
                names=["i", "psum"],
            )

    return fn


def _pca_final_fn(m, v):
    """mapInArrow kernel for the readout: per batch, partial Σ((x-m)·v)²
    (the Rayleigh numerator) and partial Σ(x-m)² (total variance) —
    one fused pass instead of two corpus branches."""
    import numpy as np

    M = np.asarray(m, dtype=np.float64)
    V0 = np.asarray(v, dtype=np.float64)

    def fn(batches):
        import pyarrow as pa

        from datafusion_archive_spark.queries.pipeline62 import _km_vmat

        for b in batches:
            if not b.num_rows:
                continue
            C = _km_vmat(b, "v") - M
            dot = C @ V0
            yield pa.RecordBatch.from_arrays(
                [pa.array([float(dot @ dot)]), pa.array([float((C * C).sum())])],
                names=["pdot2", "pc2"],
            )

    return fn


def q_pca_power_iteration(spark, sf):
    """Top PC by 8 distributed power iterations; exact oracle.

    Round 16 (guide §1.2 step 1, §2.3, §4.2): the iteration vector v
    is bounded driver state and was already re-injected as literals,
    but each iteration still shuffled corpus-cardinality rows TWICE —
    a groupBy(vec_id) for the dot products plus a vec_id join to
    re-attach them. The covariance action Cv = (1/n)Σ(x−m)((x−m)·v)
    needs neither: per vector it is two dot products against driver
    constants, so each iteration is now ONE vectorized Arrow pass
    (NumPy matvec per batch, the same engine as kmeans_lloyd) emitting
    64 partial sums per batch into one bounded (i) aggregate — no
    per-vector key ever shuffles. The readout fuses the Rayleigh
    numerator and total variance into one pass (they were two corpus
    branches). Same arithmetic, same start vector, same
    normalization; the unrolled-CTE DuckDB oracle pins the result."""
    emb = cached(
        spark.read.parquet(f"{sf}/embeddings.parquet").select(
            "vec_id", F.col("embedding").cast("array<double>").alias("v")
        )
    )
    means = (
        emb.select(F.posexplode("v").alias("i", "x"))
        .groupBy("i")
        .agg(F.avg("x").alias("m"))
        .collect()
    )
    m = [r.m for r in sorted(means, key=lambda r: r.i)]
    n = emb.select("vec_id").distinct().count()
    v = [1.0 / math.sqrt(_DIM)] * _DIM
    for _ in range(_PCA_ITERS):
        raw = (
            emb.select("v")
            .mapInArrow(_pca_matvec_fn(m, v), "i INT, psum DOUBLE")
            .groupBy("i")
            .agg(F.sum("psum").alias("s"))
            .collect()
        )
        vals = [r.s / n for r in sorted(raw, key=lambda r: r.i)]
        nrm = math.sqrt(sum(x * x for x in vals))
        v = [x / nrm for x in vals]
    final = (
        emb.select("v")
        .mapInArrow(_pca_final_fn(m, v), "pdot2 DOUBLE, pc2 DOUBLE")
        .agg(
            (F.sum("pdot2") / n).alias("eig"),
            (F.sum("pc2") / n).alias("tv"),
        )
    )
    loadings = sorted(
        ((abs(x), i + 1, x) for i, x in enumerate(v)), reverse=True
    )[:_PCA_TOP]
    load_df = F.array(
        *[
            F.struct(
                F.lit(i).alias("dim"), F.lit(round(x, 5)).alias("loading")
            )
            for _, i, x in loadings
        ]
    )
    return (
        final.select(
            F.explode(load_df).alias("l"),
            F.round("eig", 4).alias("eigenvalue"),
            F.round(F.col("eig") / F.col("tv"), 6).alias(
                "explained_share"
            ),
        )
        .select(
            F.col("l.dim").alias("dim"),
            F.col("l.loading").alias("loading"),
            "eigenvalue",
            "explained_share",
        )
    )


def q_embedding_quantization_audit(spark, sf):
    """4-bit uniform scalar quantization: MSE + used-bits entropy."""
    # cached: the exploded cells feed the range rollup and the
    # coding pass; the reconstruction feeds the MSE and the code
    # histogram — uncached, each branch re-explodes the corpus
    cells = cached(_exploded(spark, sf))
    rng = cells.groupBy("i").agg(
        F.min("x").alias("lo"), F.max("x").alias("hi")
    )
    coded = cells.join(F.broadcast(rng), "i").select(
        "i",
        "x",
        "lo",
        "hi",
        F.least(
            F.lit(_QLEVELS - 1),
            F.floor(
                (F.col("x") - F.col("lo"))
                / (F.col("hi") - F.col("lo"))
                * _QLEVELS
            ),
        ).alias("code"),
    )
    recon = coded.select(
        "i",
        "code",
        (
            F.col("x")
            - (
                F.col("lo")
                + (F.col("code") + 0.5)
                * (F.col("hi") - F.col("lo"))
                / _QLEVELS
            )
        ).alias("err"),
    )
    recon = cached(recon)
    mse = recon.agg(
        F.count(F.lit(1)).alias("n_cells"),
        F.avg(F.col("err") * F.col("err")).alias("mse"),
    )
    code_counts = recon.groupBy("i", "code").agg(
        F.count(F.lit(1)).alias("c")
    )
    # entropy needs the per-dim total; compute via a join
    totals = code_counts.groupBy("i").agg(F.sum("c").alias("tot"))
    ent = (
        code_counts.join(F.broadcast(totals), "i")
        .select(
            "i",
            (
                -(F.col("c") / F.col("tot"))
                * F.log2(F.col("c") / F.col("tot"))
            ).alias("h"),
        )
        .groupBy("i")
        .agg(F.sum("h").alias("h_dim"))
        .agg(F.avg("h_dim").alias("avg_bits"))
    )
    return mse.crossJoin(ent).select(
        "n_cells",
        F.round(F.col("mse") * 1.0e4, 4).alias("mse_e4"),
        F.round("avg_bits", 4).alias("avg_code_entropy_bits"),
    )


def _pca_oracle() -> str:
    """Generate the unrolled 8-iteration power-method SQL."""
    start = 1.0 / math.sqrt(_DIM)
    parts = [
        f"""
        cells AS MATERIALIZED (
          SELECT vec_id, r.i AS i,
                 CAST(embedding[r.i] AS DOUBLE) AS x
          FROM embeddings, range(1, {_DIM} + 1) r(i)
        ),
        means AS (SELECT i, avg(x) AS m FROM cells GROUP BY 1),
        centered AS MATERIALIZED (
          SELECT c.vec_id, c.i, c.x - m.m AS c
          FROM cells c JOIN means m ON c.i = m.i
        ),
        nrows AS MATERIALIZED (SELECT count(DISTINCT vec_id) AS n FROM centered),
        v0 AS MATERIALIZED (
          SELECT i, {start!r} AS val
          FROM range(1, {_DIM} + 1) r(i)
        )"""
    ]
    prev = "v0"
    for k in range(1, _PCA_ITERS + 1):
        parts.append(
            f"""
        dots{k} AS MATERIALIZED (
          SELECT t.vec_id, sum(t.c * v.val) AS dot
          FROM centered t JOIN {prev} v ON t.i = v.i
          GROUP BY 1
        ),
        raw{k} AS MATERIALIZED (
          SELECT t.i, sum(t.c * d.dot) / (SELECT n FROM nrows) AS val
          FROM centered t JOIN dots{k} d ON t.vec_id = d.vec_id
          GROUP BY 1
        ),
        nrm{k} AS (SELECT sqrt(sum(val * val)) AS nm FROM raw{k}),
        v{k} AS MATERIALIZED (
          SELECT i, val / (SELECT nm FROM nrm{k}) AS val FROM raw{k}
        )"""
        )
        prev = f"v{k}"
    parts.append(
        f"""
        fdots AS (
          SELECT t.vec_id, sum(t.c * v.val) AS dot
          FROM centered t JOIN {prev} v ON t.i = v.i
          GROUP BY 1
        ),
        eig AS (
          SELECT sum(dot * dot) / (SELECT n FROM nrows) AS eig
          FROM fdots
        ),
        tv AS (
          SELECT sum(c * c) / (SELECT n FROM nrows) AS tv
          FROM centered
        ),
        top AS (
          SELECT CAST(i AS BIGINT) AS dim, round(val, 5) AS loading
          FROM {prev}
          ORDER BY abs(val) DESC, i
          LIMIT {_PCA_TOP}
        )
        SELECT t.dim, t.loading,
               round(e.eig, 4) AS eigenvalue,
               round(e.eig / v.tv, 6) AS explained_share
        FROM top t CROSS JOIN eig e CROSS JOIN tv v"""
    )
    return "WITH" + ",".join(parts)


QUERIES = {
    "pca_power_iteration": q_pca_power_iteration,
    "embedding_quantization_audit": q_embedding_quantization_audit,
}

ORACLES = {
    "pca_power_iteration": _pca_oracle(),
    "embedding_quantization_audit": f"""
        WITH cells AS (
          SELECT vec_id, r.i AS i,
                 CAST(embedding[r.i] AS DOUBLE) AS x
          FROM embeddings, range(1, {_DIM} + 1) r(i)
        ),
        rng AS (
          SELECT i, min(x) AS lo, max(x) AS hi FROM cells GROUP BY 1
        ),
        coded AS (
          SELECT c.i, c.x, r.lo, r.hi,
                 LEAST({_QLEVELS - 1},
                   CAST(floor((c.x - r.lo) / (r.hi - r.lo)
                        * {_QLEVELS}) AS BIGINT)) AS code
          FROM cells c JOIN rng r ON c.i = r.i
        ),
        recon AS (
          SELECT i, code,
                 x - (lo + (code + 0.5) * (hi - lo) / {_QLEVELS})
                   AS err
          FROM coded
        ),
        mse AS (
          SELECT count(*) AS n_cells, avg(err * err) AS mse FROM recon
        ),
        counts AS (
          SELECT i, code, count(*) AS c FROM recon GROUP BY 1, 2
        ),
        totals AS (SELECT i, sum(c) AS tot FROM counts GROUP BY 1),
        ent AS (
          SELECT avg(h_dim) AS avg_bits FROM (
            SELECT k.i,
                   sum(-(CAST(k.c AS DOUBLE) / t.tot)
                     * log2(CAST(k.c AS DOUBLE) / t.tot)) AS h_dim
            FROM counts k JOIN totals t ON k.i = t.i
            GROUP BY 1
          )
        )
        SELECT CAST(m.n_cells AS BIGINT) AS n_cells,
               round(m.mse * 1.0e4, 4) AS mse_e4,
               round(e.avg_bits, 4) AS avg_code_entropy_bits
        FROM mse m CROSS JOIN ent e
    """,
}
