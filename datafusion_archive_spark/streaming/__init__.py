"""Structured Streaming surface.

The reference's distributed/streaming ambitions are roadmap-only
(``/root/reference/ROADMAP.md:36-56``); here they're realized on
Spark Structured Streaming: watermarked tumbling/sliding window
aggregation, sessionization, and an exactly-once-style sink pattern.
"""

from datafusion_archive_spark.streaming.events import (
    sessionize_batch,
    windowed_event_counts,
    windowed_event_counts_stream,
)

__all__ = [
    "sessionize_batch",
    "windowed_event_counts",
    "windowed_event_counts_stream",
]
