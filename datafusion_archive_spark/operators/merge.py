"""MERGE / upsert / SCD2 emulation.

Lakehouse MERGE INTO needs Delta/Iceberg jars (not in this
environment); the same semantics compose from anti-join + union
(upsert) and window + union (SCD2), per standard Spark practice. At
scale both are one shuffle on the merge key; the rewrite-the-table
write pattern is the classic copy-on-write lakehouse layout.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def merge_upsert(target: DataFrame, source: DataFrame, key: str) -> DataFrame:
    """MERGE: source rows replace matching target rows (whole-row
    update) and insert otherwise. Equivalent to
    ``MERGE … WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN
    INSERT *``."""
    kept = target.join(source.select(key), key, "left_anti")
    return kept.unionByName(source.select(*target.columns))


def merge_delete(target: DataFrame, deletes: DataFrame, key: str) -> DataFrame:
    """MERGE … WHEN MATCHED THEN DELETE."""
    return target.join(deletes.select(key), key, "left_anti")


def scd2_apply(
    dim: DataFrame,
    updates: DataFrame,
    key: str,
    ts_col: str = "valid_from",
    current_col: str = "is_current",
    end_col: str = "valid_to",
) -> DataFrame:
    """Slowly-changing-dimension type 2: close out the current version
    of each updated key (set ``valid_to`` / drop ``is_current``) and
    append the update as the new current version.

    ``dim`` columns: key, attributes…, valid_from, valid_to (NULL for
    current), is_current. ``updates`` columns: key, attributes…,
    valid_from (the change timestamp).

    One-update-per-key contract: like SQL MERGE (which errors on a
    multi-match), each key may contribute only one new version per
    apply. Rather than fanning the dimension out through a duplicated
    broadcast join, ``updates`` is first reduced to the LATEST row per
    key (max ``ts_col``, standard micro-batch compaction); apply the
    operator once per version if full intermediate history must be
    recorded.
    """
    latest_w = Window.partitionBy(key).orderBy(F.col(ts_col).desc())
    updates = (
        updates.withColumn("_rn", F.row_number().over(latest_w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    upd_keys = updates.select(key, F.col(ts_col).alias("_new_from"))
    closed = (
        dim.join(F.broadcast(upd_keys), key, "left")
        .withColumn(
            end_col,
            F.when(
                (F.col(current_col) == True)  # noqa: E712
                & F.col("_new_from").isNotNull(),
                F.col("_new_from"),
            ).otherwise(F.col(end_col)),
        )
        .withColumn(
            current_col,
            F.when(F.col("_new_from").isNotNull(), F.lit(False)).otherwise(
                F.col(current_col)
            ),
        )
        .drop("_new_from")
    )
    fresh = updates.withColumn(end_col, F.lit(None).cast("timestamp")) \
        .withColumn(current_col, F.lit(True))
    return closed.unionByName(fresh.select(*dim.columns))
