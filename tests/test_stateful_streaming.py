"""applyInPandasWithState operator: the final state after draining a
file-driven stream must equal the batch aggregation over the same rows."""

import pytest
from pyspark.sql import functions as F

from datafusion_archive_spark.queries.timeseries import load_events
from datafusion_archive_spark.streaming.stateful import running_user_profile


def test_stateful_profile_equals_batch(spark, sf_dir, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("stateful") / "events")
    ev = load_events(spark, sf_dir)
    # two files → at least one micro-batch boundary exercised
    ev.coalesce(2).write.parquet(out)
    batch_df = spark.read.parquet(out)

    expected = {
        r.user_id: (r.n, round(r.s, 2))
        for r in batch_df.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("s"))
        .collect()
    }

    stream = (
        spark.readStream.schema(batch_df.schema)
        .option("maxFilesPerTrigger", "1")  # force multiple micro-batches
        .parquet(out)
    )
    q = (
        running_user_profile(stream)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("profiles")
        .start()
    )
    try:
        q.processAllAvailable()
        # 'update' emits one row per key per batch; the LAST emission per
        # key is the final state
        got_rows = spark.sql("SELECT * FROM profiles").collect()
    finally:
        q.stop()

    final = {}
    for r in got_rows:  # memory sink appends in batch order
        final[r.user_id] = (r.n_events, r.sum_value)
    assert len(final) == len(expected)
    for uid, (n, s) in expected.items():
        assert final[uid] == (n, s), f"user {uid}"


def test_streaming_heavy_hitters_exact_when_capacity_suffices(
    spark, sf_dir, tmp_path_factory
):
    """With capacity >= distinct tokens the space-saving sketch is
    exact: the final per-lang top-k must equal the batch top-k
    (count-desc, token-asc). With tiny capacity, state stays bounded."""
    from pyspark.sql import functions as F

    from datafusion_archive_spark.functions import text as TX
    from datafusion_archive_spark.streaming.stateful import (
        streaming_heavy_hitters,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    toks = docs.select(
        "lang",
        F.explode(F.split(TX.normalize_text(F.col("text")), " ")).alias(
            "token"
        ),
    )
    src = str(tmp_path_factory.mktemp("hh") / "tokens")
    toks.coalesce(4).write.parquet(src)

    # batch truth: top-5 tokens per lang
    w_batch = (
        toks.groupBy("lang", "token")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    )
    import collections

    truth = collections.defaultdict(dict)
    for r in w_batch:
        truth[r.lang][r.token] = r.cnt
    expected = {
        lang: sorted(d.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
        for lang, d in truth.items()
    }

    stream = spark.readStream.schema(toks.schema).parquet(src)
    out = streaming_heavy_hitters(stream, k=5, capacity=100_000)
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName("hh_out")
        .start()
    )
    try:
        q.processAllAvailable()
        rows = spark.sql(
            "SELECT * FROM hh_out"
        ).collect()  # update mode: last emission per key wins
    finally:
        q.stop()
    # update mode appends one emission per key per micro-batch; counts
    # only grow, so per (lang, token) the max count is the final one
    best = collections.defaultdict(dict)
    for r in rows:
        if r.cnt >= best[r.lang].get(r.token, 0):
            best[r.lang][r.token] = r.cnt
    final = {
        lang: sorted(d.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
        for lang, d in best.items()
    }
    assert set(final) == set(expected)
    for lang in expected:
        assert final[lang] == expected[lang], (
            lang, final[lang], expected[lang],
        )


def test_streaming_transitions_equal_certified_batch(
    spark, sf_dir, tmp_path_factory
):
    """Drain a two-segment time-ordered file stream through the
    stateful transition emitter; aggregated pair counts must equal the
    certified batch query (pipeline4.events_transitions), including
    the pairs that straddle the segment boundary."""
    from datafusion_archive_spark.queries.pipeline4 import (
        q_events_transitions,
    )
    from datafusion_archive_spark.streaming.stateful import (
        streaming_transitions,
    )

    ev = load_events(spark, sf_dir).select(
        "user_id", "ts", "event_id", "event_type"
    )
    # two time-ordered segments written sequentially: segment 1 holds
    # the earlier half of every user's history (split on ts), so the
    # file stream replays each user's events in event-time order —
    # the documented soundness requirement for sequence mining
    src = str(tmp_path_factory.mktemp("transitions") / "events")
    bounds = ev.agg(F.expr("percentile(cast(ts as double), 0.5)")).first()[0]
    first = ev.filter(F.col("ts").cast("double") < bounds)
    second = ev.filter(F.col("ts").cast("double") >= bounds)
    first.coalesce(1).write.mode("append").parquet(src)
    second.coalesce(1).write.mode("append").parquet(src)

    batch_schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(batch_schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    q = (
        streaming_transitions(stream)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("transition_pairs")
        .start()
    )
    try:
        q.processAllAvailable()
        got_rows = spark.sql(
            "SELECT from_type, to_type, count(*) AS n "
            "FROM transition_pairs GROUP BY 1, 2"
        ).collect()
    finally:
        q.stop()

    got = {(r.from_type, r.to_type): r.n for r in got_rows}
    expected = {
        (r.from_type, r.to_type): r.n_transitions
        for r in q_events_transitions(spark, sf_dir).collect()
    }
    assert got == expected


def test_streaming_anomaly_zscore_equals_certified_batch(
    spark, sf_dir, tmp_path_factory
):
    """Drain a two-segment time-ordered stream through the rolling
    z-score flagger; per-type (eligible, anomaly) counts must equal
    the certified batch twin (pipeline6.events_anomaly_zscore),
    including frames straddling the segment boundary."""
    from datafusion_archive_spark.queries.pipeline6 import (
        q_events_anomaly_zscore,
    )
    from datafusion_archive_spark.streaming.stateful import (
        streaming_anomaly_zscore,
    )

    ev = load_events(spark, sf_dir).select(
        "user_id", "ts", "event_id", "event_type", "value"
    )
    src = str(tmp_path_factory.mktemp("anomaly") / "events")
    bounds = ev.agg(F.expr("percentile(cast(ts as double), 0.5)")).first()[0]
    ev.filter(F.col("ts").cast("double") < bounds).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    ev.filter(F.col("ts").cast("double") >= bounds).coalesce(1).write.mode(
        "append"
    ).parquet(src)

    batch_schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(batch_schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    q = (
        streaming_anomaly_zscore(stream)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("anomaly_flags")
        .start()
    )
    try:
        q.processAllAvailable()
        got_rows = spark.sql(
            "SELECT event_type, "
            "       sum(CASE WHEN eligible THEN 1 ELSE 0 END) AS n_eligible, "
            "       sum(CASE WHEN anomaly THEN 1 ELSE 0 END) AS n_anomalies "
            "FROM anomaly_flags GROUP BY 1"
        ).collect()
    finally:
        q.stop()

    got = {r.event_type: (r.n_eligible, r.n_anomalies) for r in got_rows}
    expected = {
        r.event_type: (r.n_eligible, r.n_anomalies)
        for r in q_events_anomaly_zscore(spark, sf_dir).collect()
    }
    assert got == expected


def test_streaming_running_distinct_equals_certified_batch(
    spark, sf_dir, tmp_path_factory
):
    """Drain a two-segment time-ordered stream through the running
    distinct-type stamper; every event's count must equal the
    certified batch twin (pipeline10.window_running_distinct),
    including first-occurrences straddling the segment boundary."""
    from datafusion_archive_spark.queries.pipeline10 import (
        q_window_running_distinct,
    )
    from datafusion_archive_spark.streaming.stateful import (
        streaming_running_distinct,
    )

    ev = load_events(spark, sf_dir).select(
        "user_id", "ts", "event_id", "event_type"
    )
    src = str(tmp_path_factory.mktemp("rdistinct") / "events")
    bounds = ev.agg(F.expr("percentile(cast(ts as double), 0.5)")).first()[0]
    ev.filter(F.col("ts").cast("double") < bounds).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    ev.filter(F.col("ts").cast("double") >= bounds).coalesce(1).write.mode(
        "append"
    ).parquet(src)

    batch_schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(batch_schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    q = (
        streaming_running_distinct(stream)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("running_distinct")
        .start()
    )
    try:
        q.processAllAvailable()
        got_rows = spark.sql("SELECT * FROM running_distinct").collect()
    finally:
        q.stop()

    got = {r.event_id: r.n_types_seen for r in got_rows}
    expected = {
        r.event_id: r.n_types_seen
        for r in q_window_running_distinct(spark, sf_dir).collect()
    }
    assert got == expected
