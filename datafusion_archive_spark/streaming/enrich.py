"""Stream-static enrichment: a streaming fact joined to a static
dimension (the canonical "decorate events with reference data"
pattern). Spark evaluates the static side per micro-batch with the
same broadcast plan as batch — no state store involved — so the
completed stream equals the batch join exactly.

Batch twin certified as ``events_enriched_segment``
(queries/pipeline20.py); the stream==batch equality is pinned in
tests/test_streaming_enrich.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from datafusion_archive_spark.functions.rounding import (
    decimal_sum,
    round_half_up,
)


def enrich_events_batch(events: DataFrame, customer: DataFrame) -> DataFrame:
    """Per-market-segment event rollup after enriching events with
    the customer dimension (user_id == c_custkey). Events without a
    matching customer are dropped (inner join) — the dimension is the
    source of truth for segment membership.

    Scale: the dimension broadcasts (explicitly — it is structurally
    small); the fact never shuffles for the join, only for the
    segment rollup, which collapses map-side first."""
    dim = F.broadcast(customer.select("c_custkey", "c_mktsegment"))
    return (
        events.join(dim, events.user_id == dim.c_custkey)
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            # COUNT(DISTINCT) is not streamable in complete mode —
            # this aggregate list is deliberately restricted to
            # stream-safe folds so stream == batch EXACTLY
            F.count(F.lit(1)).alias("n_events"),
            round_half_up(decimal_sum(F.col("value")), 2).alias(
                "sum_value"
            ),
        )
    )


def enrich_events_stream(
    stream_events: DataFrame, customer: DataFrame
) -> DataFrame:
    """Streaming form: identical plan — stream-static joins need no
    watermark (the static side is re-broadcast per micro-batch), and
    the complete-mode aggregate keeps per-segment state only
    (|segments| rows — bounded regardless of stream length)."""
    return enrich_events_batch(stream_events, customer)
