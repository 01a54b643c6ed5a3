"""At-rest data layout: partitioning, bucketing, compaction.

The reference has no write path at all (``PhysicalPlan::Write`` is
declared with no executor — ``src/execution/physicalplan.rs:25-29``,
``ROADMAP.md:46``). At 100 TB the write-side layout IS the read-side
query plan:

- **Partitioned** parquet (`partitionBy` on a low-cardinality column,
  e.g. date or IVF list id): Catalyst prunes non-matching directories,
  so a filtered scan touches only its partitions.
- **Bucketed** tables (`bucketBy` on a join/agg key): co-locates both
  sides of a key so later joins/aggregations skip the shuffle entirely.
- **Compaction**: many small files → few target-size files; small-file
  explosion is the classic ingestion failure mode at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    file_format: str = "parquet",
    mode: str = "overwrite",
) -> None:
    """Write with directory partitioning; scans filtered on
    ``partition_cols`` read only matching directories (verify with
    `.explain` → `PartitionFilters`)."""
    (
        df.write.mode(mode)
        .partitionBy(*partition_cols)
        .format(file_format)
        .save(path)
    )


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_col: str,
    num_buckets: int = 32,
    sort_col: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Write a bucketed (and optionally sorted) managed table. Joins
    between tables bucketed on the same key with the same bucket count
    need no shuffle; with ``sort_col`` a sort-merge join also skips the
    sort."""
    writer = df.write.mode(mode).bucketBy(num_buckets, bucket_col)
    if sort_col:
        writer = writer.sortBy(sort_col)
    writer.saveAsTable(table_name)


def compact(
    spark: SparkSession,
    path: str,
    target_files: int,
    file_format: str = "parquet",
) -> None:
    """Rewrite a directory into ``target_files`` files (small-file
    compaction). Uses coalesce — no shuffle — because compaction only
    reduces file count; use repartition instead if re-clustering.

    Local-filesystem paths only: the swap below uses OS renames, which
    don't exist on object stores (s3://, hdfs:// — those need a
    table-format commit protocol like Delta/Iceberg, out of scope
    here). The swap is crash-safe in the never-lose-data sense: the
    old directory is renamed aside *before* the new one moves into
    place, so at every instant the data exists at a deterministic
    location (``path``, ``path__compact_old``, or the tmp dir) —
    never deleted before its replacement is in place.
    """
    import os
    import shutil
    from urllib.parse import urlparse

    scheme = urlparse(path).scheme
    if scheme not in ("", "file"):
        raise ValueError(
            f"compact() only supports local filesystem paths, got {path!r}"
        )
    local = urlparse(path).path if scheme == "file" else path

    df = spark.read.format(file_format).load(path)
    tmp = local.rstrip("/") + "__compact_tmp"
    old = local.rstrip("/") + "__compact_old"
    df.coalesce(target_files).write.mode("overwrite").format(
        file_format
    ).save(tmp)
    # move old aside → move new into place → drop old (each step an
    # OS rename except the final cleanup, which is safe to re-run)
    if os.path.exists(old):
        shutil.rmtree(old)
    os.rename(local, old)
    try:
        os.rename(tmp, local)
    except OSError:
        os.rename(old, local)  # roll back; tmp still holds the rewrite
        raise
    shutil.rmtree(old)


def zorder_expr_n(
    cols: "list[tuple[str, float, float]]",
    bits: int = 10,
) -> "Column":
    """Z-order (Morton) interleave of n quantized columns.

    ``cols`` is a list of (column_name, lo, hi): each column is
    min-max quantized to ``bits`` bits against caller-supplied bounds
    (at scale the bounds come from table stats — a constant, not a
    data pass), then the bit planes are interleaved round-robin so
    rows close in the n-dimensional space get close z-values. Sorting
    the write by this value clusters every dimension at once, which
    is what makes parquet file/row-group min/max stats selective for
    ANY of the predicates — the standard multi-dimensional
    data-skipping layout (Delta/Iceberg OPTIMIZE ZORDER).

    n·bits must fit a signed 64-bit long (n·bits ≤ 62). Built as one
    ``F.expr`` string (n·bits shift terms) per the plan-build cost
    rule in PERF.md.
    """
    from pyspark.sql import functions as F

    n = len(cols)
    if n < 2:
        raise ValueError("zorder needs at least 2 columns")
    if n * bits > 62:
        raise ValueError(f"{n} cols x {bits} bits exceeds a 64-bit long")

    def quant(col_sql: str, lo: float, hi: float) -> str:
        span = hi - lo
        return (
            f"CAST(least(greatest(floor((({col_sql}) - {lo!r}) "
            f"/ {span!r} * {(1 << bits) - 1}), 0), {(1 << bits) - 1}) AS LONG)"
        )

    qs = [quant(c, lo, hi) for c, lo, hi in cols]
    terms = []
    for i in range(bits):
        for j, q in enumerate(qs):
            # column j's bit i lands at interleaved position i*n + (n-1-j)
            terms.append(
                f"(shiftleft(shiftright({q}, {i}) & 1, {i * n + (n - 1 - j)}))"
            )
    return F.expr(" + ".join(terms))


def zorder_expr(
    col1: str,
    col2: str,
    bounds1: tuple[float, float],
    bounds2: tuple[float, float],
    bits: int = 10,
) -> "Column":
    """Two-column convenience wrapper over :func:`zorder_expr_n`."""
    return zorder_expr_n(
        [(col1, *bounds1), (col2, *bounds2)], bits
    )


def write_zordered(
    df: "DataFrame",
    path: str,
    col1: str,
    col2: str,
    bounds1: tuple[float, float],
    bounds2: tuple[float, float],
    n_files: int = 16,
    bits: int = 10,
    file_format: str = "parquet",
) -> None:
    """Write ``df`` clustered by the Z-order of (col1, col2): range-
    partition on the z-value into ``n_files`` files and sort within
    each, so every file covers a compact box in (col1, col2) space and
    its min/max stats prune box predicates on either column. One
    range-exchange shuffle — same cost class as any global sort."""
    z = zorder_expr(col1, col2, bounds1, bounds2, bits)
    (
        df.withColumn("_z", z)
        .repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .format(file_format)
        .save(path)
    )
