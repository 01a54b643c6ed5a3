"""Pipeline wave 20 (round 5, eighteenth wave): stream-static
enrichment (batch twin).

- ``events_enriched_segment`` — the canonical stream-static
  enrichment: the events fact joined to the static customer
  dimension (broadcast) and rolled up per market segment. The
  streaming form (``streaming/enrich.py``) runs the IDENTICAL plan
  per micro-batch — stream-static joins need no watermark and the
  complete-mode aggregate holds |segments| rows of state; the
  stream==batch equality is pinned in tests/test_streaming_enrich.py.

The reference has neither joins nor streams at runtime
(``/root/reference/ROADMAP.md:33-56``).
"""

from __future__ import annotations

from datafusion_archive_spark.functions.rounding import (
    decimal_sum_sql,
    round_half_up_sql,
)
from datafusion_archive_spark.queries.timeseries import load_events
from datafusion_archive_spark.streaming.enrich import enrich_events_batch


def q_events_enriched_segment(spark, sf):
    """Batch twin of the stream-static enrichment operator. See
    streaming/enrich.py for the operator contract and scale notes."""
    events = load_events(spark, sf)
    customer = spark.read.parquet(f"{sf}/customer.parquet")
    return enrich_events_batch(events, customer)


QUERIES = {
    "events_enriched_segment": q_events_enriched_segment,
}

ORACLES = {
    "events_enriched_segment": f"""
        SELECT c.c_mktsegment AS segment,
               count(*) AS n_events,
               {round_half_up_sql(decimal_sum_sql("e.value"), 2)}
                 AS sum_value
        FROM events e
        JOIN customer c ON e.user_id = c.c_custkey
        GROUP BY 1
    """,
}
