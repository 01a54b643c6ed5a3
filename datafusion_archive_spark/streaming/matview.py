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
from pyspark.sql.types import DecimalType, LongType

#: |value| beyond this exceeds double's 2^53 integer range once
#: scaled to micros, so round(value*1e6) would silently lose
#: exactness — the sink refuses such batches up front.
_MAX_EXACT_UNITS = 9_000_000_000
#: overflow headroom on the merged long sums when ANSI mode is off
#: (non-ANSI long addition wraps silently): half the long range
#: still leaves ~4.6e18 micros of accumulation room.
_SUM_GUARD = (1 << 62)


def partial_state(
    batch: DataFrame,
    keys: list[str],
    value_col: str,
    with_max_abs: bool = False,
) -> DataFrame:
    """The mergeable per-group state of one slice of rows: (n, sum).

    The sum is kept as EXACT INTEGER MICROS in a LONG — not a double
    (``decimal_sum`` ends in a double cast, which would let a
    multi-batch fold drift by an ulp per merge depending on batch
    order) and not a decimal buffer (BigDecimal aggregation leaves
    whole-stage codegen). Long addition is exact and associative, so
    any merge order and any restart replay boundary yields the
    bit-identical state; overflow needs ~9·10¹² money units per
    group — which the sink GUARDS explicitly (ANSI mode is off by
    default, where long addition wraps silently). ``read_view``
    converts back to units at read time.

    ``with_max_abs`` adds a ``_max_abs`` column (max |value| of the
    slice, PRE-rounding) so the sink's exactness guard rides the same
    aggregate pass instead of re-scanning the batch; it is not part
    of the state and must be dropped before merging."""
    micros = F.round(F.col(value_col) * 1_000_000).cast("long")
    aggs = [
        F.count(F.lit(1)).alias("n"),
        F.sum(micros).alias("sum_v"),
    ]
    if with_max_abs:
        aggs.append(F.max(F.abs(F.col(value_col))).alias("_max_abs"))
    return batch.groupBy(*keys).agg(*aggs)


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
        st = self.spark.read.parquet(self.path)
        # State-format migration: the v1 sink stored sum_v as a
        # decimal(27,6) in MONEY UNITS; the current format is a long
        # in integer MICROS. A pre-existing v1 directory merged as-is
        # would add unit-valued sums to micro-valued ones (silently
        # wrong by 10^6x) — detect the old schema by its dtype and
        # convert exactly (decimal·1e6 is exact; the long cast is
        # range-checked by the decimal width) before anything merges
        # or reads it.
        dt = st.schema["sum_v"].dataType
        if isinstance(dt, DecimalType):
            micros = (
                F.col("sum_v") * F.lit(1_000_000).cast("decimal(7,0)")
            ).cast("decimal(33,0)")
            # decimal(33,0) holds values far past long range, and a
            # non-ANSI Decimal.toLong WRAPS to the low 64 bits — an
            # oversized v1 sum would migrate to a corrupted value
            # that can even pass the _SUM_GUARD check downstream
            # (ADVICE r7 #1). Guard in decimal space before casting;
            # the one extra aggregate runs only on the one-time v1
            # migration path and the state is rollup-sized.
            top = st.agg(F.max(F.abs(micros)).alias("m")).first()
            if top.m is not None and int(top.m) > _SUM_GUARD:
                raise OverflowError(
                    f"matview state at {self.path}: v1 sum_v of "
                    f"{top.m} micros exceeds the {_SUM_GUARD} long "
                    "headroom guard — migrating would silently wrap; "
                    "re-scale the view before converting this state"
                )
            st = st.withColumn("sum_v", micros.cast("long"))
        elif not isinstance(dt, LongType):
            raise RuntimeError(
                f"matview state at {self.path}: unrecognized sum_v "
                f"dtype {dt.simpleString()} — refusing to merge"
            )
        return st

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
            # Exactness/overflow guards (ADVICE r6): ANSI mode is off
            # by default in Spark, so long-sum overflow would WRAP
            # silently rather than raise, and round(value*1e6) loses
            # micro exactness past double's 2^53 integer range. Both
            # are checked explicitly instead of assumed; the ANSI
            # conf only decides whether the overflow check is
            # redundant (ANSI addition raises on its own).
            ansi = (
                str(self.spark.conf.get("spark.sql.ansi.enabled", "false"))
                .lower()
                == "true"
            )
            # the exactness guard rides the partial aggregate itself
            # (one scan of the batch total); the group-level rollup
            # is tiny, so persisting it for the guard + merge pair is
            # O(groups), not O(batch)
            part_full = partial_state(
                batch, self.keys, self.value_col, with_max_abs=True
            ).persist()
            try:
                guard = part_full.agg(
                    F.max("_max_abs").alias("m")
                ).first()
                if guard.m is not None and guard.m > _MAX_EXACT_UNITS:
                    raise ValueError(
                        f"matview sink: |{self.value_col}| = {guard.m} "
                        f"exceeds {_MAX_EXACT_UNITS} units — micros no "
                        "longer fit double's exact-integer range; rescale "
                        "the value column or lower the fixed-point scale"
                    )
                part = part_full.drop("_max_abs")
                cur = self.read_state()
                merged = (
                    part
                    if cur is None
                    else merge_states(cur, part, self.keys)
                )
                if not ansi:
                    # extra action over merged: persist for the
                    # guard+write pair so the state join computes once
                    merged = merged.persist()
                tmp = self.path.rstrip("/") + "__tmp"
                # one try/finally covers BOTH the guard and the
                # write: a guard raise must not leak the persisted
                # DataFrame in the executors (ADVICE r7 #3)
                try:
                    if not ansi:
                        top = merged.agg(
                            F.max(F.abs(F.col("sum_v"))).alias("m")
                        ).first()
                        if top.m is not None and top.m > _SUM_GUARD:
                            raise OverflowError(
                                f"matview sink: merged |sum_v| = {top.m} "
                                f"is past the {_SUM_GUARD} headroom guard "
                                "— non-ANSI long addition would soon wrap "
                                "silently; enable spark.sql.ansi.enabled "
                                "or re-scale the view"
                            )
                    merged.write.mode("overwrite").parquet(tmp)
                finally:
                    if not ansi:
                        merged.unpersist()
            finally:
                part_full.unpersist()
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
