"""Incremental materialized-view maintenance: keep a grouped-rollup
parquet table up to date from a stream with MERGEABLE partial
aggregates, without ever re-reading history.

The maintained state per group is (count, sum) — both merge by
addition, so each micro-batch folds in as

    new_state = old_state ⊕ partial(batch)

and the final table equals the one-shot batch aggregate over all rows
ever seen (proven in tests/test_matview.py, including a multi-batch
drip). Derived columns (avg) are recomputed FROM the state at read
time — never maintained directly, since averages don't merge.

This is the warehouse "incremental view maintenance" pattern on
Structured Streaming: the work per trigger is O(|batch| + |touched
groups|), not O(|history|); replayed micro-batches are the one hazard
(addition is not idempotent), so delivery relies on the checkpoint's
exactly-once batch ids — the same contract Spark's own stateful
aggregation uses.
"""

from __future__ import annotations

import os
import threading

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

def partial_state(batch: DataFrame, keys: list[str], value_col: str) -> DataFrame:
    """The mergeable per-group state of one slice of rows: (n, sum).

    The sum is kept as EXACT INTEGER MICROS in a LONG — not a double
    (``decimal_sum`` ends in a double cast, which would let a
    multi-batch fold drift by an ulp per merge depending on batch
    order) and not a decimal buffer (BigDecimal aggregation leaves
    whole-stage codegen). Long addition is exact and associative, so
    any merge order and any restart replay boundary yields the
    bit-identical state; overflow needs ~9·10¹² money units per
    group — and Spark's ANSI mode raises rather than corrupts beyond
    it. ``read_view`` converts back to units at read time."""
    micros = F.round(F.col(value_col) * 1_000_000).cast("long")
    return batch.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(micros).alias("sum_v"),
    )


def merge_states(old: DataFrame, new: DataFrame, keys: list[str]) -> DataFrame:
    """old ⊕ new by addition per group (full outer on the keys)."""
    o = old.select(
        *keys, F.col("n").alias("n_o"), F.col("sum_v").alias("s_o")
    )
    n = new.select(
        *keys, F.col("n").alias("n_n"), F.col("sum_v").alias("s_n")
    )
    zero = F.lit(0).cast("long")
    return o.join(n, keys, "full_outer").select(
        *keys,
        (F.coalesce("n_o", F.lit(0)) + F.coalesce("n_n", F.lit(0))).alias(
            "n"
        ),
        (
            F.coalesce(F.col("s_o"), zero) + F.coalesce(F.col("s_n"), zero)
        ).alias("sum_v"),
    )


class IncrementalRollupSink:
    """foreachBatch target maintaining the grouped (n, sum) state in
    a parquet table via the copy-on-write swap (same crash-recovery
    contract as ParquetUpsertSink)."""

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        keys: list[str],
        value_col: str,
    ):
        self.spark = spark
        self.path = path
        self.keys = keys
        self.value_col = value_col
        self._lock = threading.Lock()

    def read_state(self) -> DataFrame | None:
        if not os.path.isdir(self.path):
            return None
        return self.spark.read.parquet(self.path)

    def read_view(self) -> DataFrame:
        """The user-facing view: derived columns recomputed from the
        mergeable state (avg = sum/n — never maintained directly)."""
        st = self.read_state()
        return st.select(
            *self.keys,
            F.col("n").alias("n_events"),
            # micros -> units through an exact decimal, then double
            (F.col("sum_v").cast("decimal(32,0)") / 1_000_000)
            .cast("double")
            .alias("sum_value"),
            (
                F.col("sum_v").cast("decimal(32,0)") / 1_000_000 / F.col("n")
            ).cast("double").alias("avg_value"),
        )

    def _last_applied(self) -> int:
        """batch_id folded into the current state (-1 if none). Stored
        as an underscore-prefixed file INSIDE the state directory so
        it swaps atomically with the state it describes (Spark's
        parquet reader ignores `_`-prefixed files)."""
        marker = os.path.join(self.path, "_last_batch_id")
        if not os.path.isfile(marker):
            return -1
        with open(marker) as fh:
            return int(fh.read().strip() or -1)

    def __call__(self, batch: DataFrame, batch_id: int) -> None:
        with self._lock:
            # foreachBatch is at-least-once: a micro-batch replayed
            # after a crash between the parquet swap and the
            # checkpoint commit must NOT be folded in twice (addition
            # is not idempotent). The marker travels inside the state
            # dir, so state and watermark swap as one unit.
            if batch_id <= self._last_applied():
                return
            part = partial_state(batch, self.keys, self.value_col)
            cur = self.read_state()
            merged = part if cur is None else merge_states(cur, part, self.keys)
            tmp = self.path.rstrip("/") + "__tmp"
            merged.write.mode("overwrite").parquet(tmp)
            with open(os.path.join(tmp, "_last_batch_id"), "w") as fh:
                fh.write(str(batch_id))
            old = self.path.rstrip("/") + "__old"
            import shutil

            if os.path.exists(old):
                shutil.rmtree(old)
            had = os.path.exists(self.path)
            try:
                if had:
                    os.rename(self.path, old)
                os.rename(tmp, self.path)
            except OSError:
                if had and not os.path.exists(self.path):
                    os.rename(old, self.path)
                raise
            if os.path.exists(old):
                shutil.rmtree(old)


def stream_incremental_rollup(
    spark: SparkSession,
    source_path: str,
    schema,
    target_path: str,
    keys: list[str],
    value_col: str,
):
    """File stream → incrementally maintained grouped rollup. Returns
    (StreamingQuery, sink)."""
    sink = IncrementalRollupSink(spark, target_path, keys, value_col)
    stream = spark.readStream.schema(schema).parquet(source_path)
    q = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", target_path.rstrip("/") + "__ckpt")
        .trigger(availableNow=True)
        .start()
    )
    return q, sink
