"""Structured Streaming surface.

The reference's distributed/streaming ambitions are roadmap-only
(``/root/reference/ROADMAP.md:36-56``); here they're realized on
Spark Structured Streaming: watermarked tumbling/sliding window
aggregation, sessionization, and an exactly-once-style sink pattern.
"""

from datafusion_archive_spark.streaming.dedup import (
    event_dedup_stream,
    exact_dedup_stream,
)
from datafusion_archive_spark.streaming.events import (
    sessionize_batch,
    windowed_event_counts,
    windowed_event_counts_stream,
)

__all__ = [
    "event_dedup_stream",
    "exact_dedup_stream",
    "sessionize_batch",
    "windowed_event_counts",
    "windowed_event_counts_stream",
]
