"""KMV (k-minimum-values) distinct-count sketch — an approximate
aggregate whose answer is nevertheless engine-deterministic.

Spark's own sketches (``approx_count_distinct`` HLL++) are
implementation-specific, so their answers can't be checked against an
external oracle. KMV built on the md5-derived :func:`text.hash64`
gives the classic estimator — keep the k smallest distinct hash
values; with ``u_k`` the k-th smallest hash normalized to (0, 1],
``estimate = (k-1)/u_k`` — with every intermediate reproducible in any
engine that has md5. The driver's DuckDB oracle therefore checks the
approximate answer EXACTLY (same hashes → same k-th minimum → same
IEEE division).

Scale shape: one distinct on (group, hash) — the same shuffle an exact
count-distinct needs — then a per-group bottom-k (window over the
already-distinct frame, input cardinality = Σ distinct values). For a
true single-pass at 100 TB the bottom-k folds into a partial
aggregate of sorted-array-merge partials; the window form keeps the
plan entirely in built-in operators, which AQE handles well, and
never materializes more than the distinct pairs an exact count would.

Mergeability (union of sketches = sketch of union) holds because
min-k(A ∪ B) = min-k(min-k(A) ∪ min-k(B)) — pinned in tests.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from datafusion_archive_spark.functions import text as TX

#: hash64 yields 60 usable bits; normalize by 2^60 into (0, 1].
_HASH_SPACE = float(1 << 60)


def kmv_distinct(
    df: DataFrame,
    group_col: str,
    value_col: Column | str,
    k: int = 32,
) -> DataFrame:
    """Per-group approximate distinct count of ``value_col``.

    Returns ``(group, n_kept, kmv_estimate)`` where ``n_kept`` is the
    number of hash values retained (< k ⇒ the estimate is exact).
    """
    v = F.col(value_col) if isinstance(value_col, str) else value_col
    pairs = df.select(
        F.col(group_col).alias("grp"),
        TX.hash64(v.cast("string"), seed=11).alias("hv"),
    ).distinct()
    w = Window.partitionBy("grp").orderBy("hv")
    kept = pairs.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") <= k
    )
    return kept.groupBy("grp").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.when(
            F.count(F.lit(1)) < k,
            F.count(F.lit(1)).cast("double"),
        )
        .otherwise(
            F.lit(float(k - 1))
            / (F.max("hv").cast("double") / F.lit(_HASH_SPACE))
        )
        .alias("kmv_estimate"),
    )


def kmv_sql(table_expr: str, group_col: str, value_expr: str,
            k: int = 32, seed: int = 11) -> str:
    """DuckDB twin of :func:`kmv_distinct` for oracle strings."""
    hash_sql = (
        f"('0x' || substr(md5(CAST({value_expr} AS VARCHAR) || ':{seed}'),"
        f" 1, 15))::BIGINT"
    )
    return f"""
        WITH pairs AS (
          SELECT DISTINCT {group_col} AS grp, {hash_sql} AS hv
          FROM {table_expr}
        ),
        ranked AS (
          SELECT grp, hv,
                 row_number() OVER (PARTITION BY grp ORDER BY hv) AS rn
          FROM pairs
        )
        SELECT grp,
               CAST(count(*) AS BIGINT) AS n_kept,
               CASE WHEN count(*) < {k}
                    THEN CAST(count(*) AS DOUBLE)
                    ELSE {float(k - 1)}
                         / (CAST(max(hv) AS DOUBLE) / {_HASH_SPACE})
               END AS kmv_estimate
        FROM ranked WHERE rn <= {k}
        GROUP BY grp
    """
