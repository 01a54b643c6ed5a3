"""Event-stream operators: windowed aggregation + sessionization.

Each operator has a batch form (used by the correctness oracle — the
semantics of a completed stream equal the batch computation over the
same data) and a streaming form (``readStream`` → watermark → window →
``writeStream``), exercised in tests with a file source and memory
sink driven to completion via ``processAllAvailable()``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from datafusion_archive_spark.functions.rounding import decimal_sum, round_half_up


def windowed_event_counts(
    events: DataFrame,
    window_duration: str = "1 hour",
    ts_col: str = "ts",
    slide: str | None = None,
) -> DataFrame:
    """Tumbling- or hopping-window counts/sums per event type (batch
    form). ``slide`` < ``window_duration`` makes windows overlap — each
    event contributes to ``window/slide`` buckets (Spark expands the
    row before the hash aggregate; the shuffle carries the expansion,
    which is the standard cost of hopping windows at any scale).

    Window start is rendered as a string so external oracles compare
    exactly (DuckDB: ``strftime(date_trunc('hour', ts), ...)`` for the
    1-hour tumbling case — windows align to the epoch; hopping starts
    enumerate via generate_series).
    """
    win = (
        F.window(F.col(ts_col), window_duration, slide)
        if slide
        else F.window(F.col(ts_col), window_duration)
    )
    return (
        events.groupBy(
            win.alias("w"),
            F.col("event_type"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            # decimal partials: order-independent sum (see
            # functions.rounding.decimal_sum)
            round_half_up(decimal_sum(F.col("value")), 2).alias("sum_value"),
        )
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias(
                "window_start"
            ),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def windowed_event_counts_stream(
    spark: SparkSession,
    path: str,
    schema,
    window_duration: str = "1 hour",
    watermark: str = "2 hours",
    slide: str | None = None,
):
    """Streaming form: file source → watermark → tumbling/hopping
    window agg. Returns the streaming DataFrame (caller attaches a
    sink). Late rows beyond the watermark are dropped; 'append' output
    emits each window once it is final — the 100 TB pattern for
    continuous ingestion."""
    stream = (
        spark.readStream.schema(schema).parquet(path)
        .withWatermark("ts", watermark)
    )
    win = (
        F.window("ts", window_duration, slide)
        if slide
        else F.window("ts", window_duration)
    )
    return (
        stream.groupBy(win, "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            # identical decimal formulation to the batch twin so the
            # stream-equals-batch invariant holds bit-for-bit
            round_half_up(decimal_sum(F.col("value")), 2).alias("sum_value"),
        )
        .select(
            F.date_format(F.col("window.start"), "yyyy-MM-dd HH:mm:ss").alias(
                "window_start"
            ),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def attribution_join_batch(
    events: DataFrame,
    left_type: str = "click",
    right_type: str = "purchase",
    within_minutes: int = 60,
) -> DataFrame:
    """Batch twin of the stream-stream attribution join: every
    (click, purchase) pair for the same user where the purchase
    happens within ``within_minutes`` AFTER the click. Integer-µs
    bounds so the comparison is exact on both engines."""
    lo = events.filter(F.col("event_type") == left_type).select(
        F.col("user_id"),
        F.col("event_id").alias("click_id"),
        F.unix_micros("ts").alias("click_us"),
    )
    hi = events.filter(F.col("event_type") == right_type).select(
        F.col("user_id").alias("r_user"),
        F.col("event_id").alias("purchase_id"),
        F.unix_micros("ts").alias("purchase_us"),
    )
    bound = within_minutes * 60 * 1_000_000
    return (
        lo.join(
            hi,
            (F.col("user_id") == F.col("r_user"))
            & (F.col("purchase_us") >= F.col("click_us"))
            & (F.col("purchase_us") <= F.col("click_us") + bound),
        )
        .select("user_id", "click_id", "purchase_id")
    )


def attribution_join_stream(
    spark: SparkSession,
    path: str,
    schema,
    left_type: str = "click",
    right_type: str = "purchase",
    within_minutes: int = 60,
    watermark: str = "2 hours",
):
    """Stream-stream inner join with event-time bounds — the canonical
    attribution pipeline (clicks ⋈ purchases within the conversion
    window). Both sides carry watermarks and the join predicate bounds
    purchase time to [click, click + window], so Spark can size and
    EVICT join state — without the time bound a stream-stream join's
    state grows forever. State is sharded by the equi-key (user_id);
    at 100 TB this is the same single keyed shuffle as the batch twin.
    """
    src = spark.readStream.schema(schema).parquet(path)
    bound_s = within_minutes * 60
    lo = (
        src.filter(F.col("event_type") == left_type)
        .select(
            "user_id",
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", watermark)
    )
    hi = (
        src.filter(F.col("event_type") == right_type)
        .select(
            F.col("user_id").alias("r_user"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("purchase_ts"),
        )
        .withWatermark("purchase_ts", watermark)
    )
    return (
        lo.join(
            hi,
            (F.col("user_id") == F.col("r_user"))
            & (F.col("purchase_ts") >= F.col("click_ts"))
            & (
                F.col("purchase_ts")
                <= F.col("click_ts") + F.expr(f"INTERVAL {bound_s} SECOND")
            ),
        )
        .select("user_id", "click_id", "purchase_id")
    )


def sessionize_batch(
    events: DataFrame,
    gap_minutes: int = 30,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Gap-based sessionization (batch form): a new session starts when
    the same user's inter-event gap exceeds ``gap_minutes``. Returns
    per-user session counts and the longest session length in events.

    Classic lag + cumulative-sum-over-window; one shuffle on user_id.
    The streaming twin is ``groupBy(session_window(ts, gap))`` —
    exercised separately in tests.
    """
    w = Window.partitionBy(user_col).orderBy(F.col(ts_col), F.col("event_id"))
    # integer microseconds (not float seconds) so the gap comparison is
    # exact and oracle-reproducible (DuckDB epoch_us)
    gap_us = gap_minutes * 60 * 1_000_000
    us = F.unix_micros(F.col(ts_col))
    with_gap = events.select(
        user_col,
        ts_col,
        "event_id",
        (us - F.lag(us).over(w)).alias("gap"),
    ).withColumn(
        "new_session",
        F.when(
            F.col("gap").isNull() | (F.col("gap") > gap_us), 1
        ).otherwise(0),
    )
    sessioned = with_gap.withColumn(
        "session_id",
        F.sum("new_session").over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    per_session = sessioned.groupBy(user_col, "session_id").agg(
        F.count(F.lit(1)).alias("n_events")
    )
    return per_session.groupBy(user_col).agg(
        F.max("session_id").alias("n_sessions"),
        F.max("n_events").alias("max_session_events"),
    )


def multi_resolution_rollup(
    events: DataFrame,
    resolutions: tuple[str, ...] = ("hour", "day"),
    ts_col: str = "ts",
    key_col: str = "event_type",
) -> DataFrame:
    """Hypertable-style continuous-aggregate rollup: one stacked frame
    of (resolution, bucket, key) aggregates for every requested
    resolution.

    Scale design: raw rows are aggregated ONCE at the finest
    resolution; every coarser resolution re-aggregates the finer
    partials, never the raw table. At 100 TB that's one big shuffle
    (finest buckets) followed by shuffles over already-tiny aggregate
    frames — the same dataflow a TimescaleDB continuous aggregate or a
    Druid rollup maintains incrementally. Counts add; sums add (kept
    as exact decimals until the final render); that is what makes the
    partial re-aggregation valid.

    ``resolutions`` must be ordered finest→coarsest and each must be a
    ``date_trunc`` unit (minute/hour/day/week/month).
    """
    finest = resolutions[0]
    cur = (
        events.groupBy(
            F.date_trunc(finest, F.col(ts_col)).alias("bucket"),
            F.col(key_col).alias("key"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(27,6)")).alias("sum_dec"),
        )
    )
    out = None
    for res in resolutions:
        if res != finest:
            cur = (
                cur.groupBy(
                    F.date_trunc(res, F.col("bucket")).alias("bucket"),
                    "key",
                )
                .agg(
                    F.sum("n_events").alias("n_events"),
                    F.sum("sum_dec").alias("sum_dec"),
                )
            )
        level = cur.select(
            F.lit(res).alias("resolution"),
            F.date_format("bucket", "yyyy-MM-dd HH:mm:ss").alias(
                "bucket_start"
            ),
            "key",
            "n_events",
            round_half_up(F.col("sum_dec").cast("double"), 2).alias(
                "sum_value"
            ),
        )
        out = level if out is None else out.unionByName(level)
    return out
