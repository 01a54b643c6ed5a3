"""Pipeline wave 36 (round 5, thirty-fourth wave): semi-structured
VARIANT columns.

- ``variant_extraction`` — Spark 4's VARIANT type end to end:
  ``parse_json`` the events ``props`` payload once, ``variant_get``
  typed fields out, and aggregate — the open-schema ingestion
  pattern (store once as variant, project lazily) that replaces
  string re-parsing per query. The oracle is DuckDB's native JSON
  extraction over the same payload, so the typed values must agree
  exactly.

The reference has no nested or semi-structured types at all
(``src/logicalplan.rs:95-111`` — Struct is declared and
``unimplemented!()``).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from datafusion_archive_spark.queries.timeseries import load_events


def q_variant_extraction(spark, sf):
    """Per event type: count of events with a parsable ``k`` field,
    min/max/avg of the typed value, and how many payloads were null
    or unparsable. One VARIANT parse per row; every probe after that
    is a typed path lookup, not a re-parse.

    Scale: parse + typed extraction are scan-side; the rollup is
    |types| cells."""
    e = load_events(spark, sf)
    v = e.select(
        "event_type",
        F.variant_get(
            F.try_parse_json(F.col("props")), "$.k", "int"
        ).alias("k"),
    )
    return v.groupBy("event_type").agg(
        F.count("k").alias("n_with_k"),
        F.sum(F.col("k").isNull().cast("long")).alias("n_missing"),
        F.min("k").alias("min_k"),
        F.max("k").alias("max_k"),
        F.round(F.avg("k"), 4).alias("avg_k"),
    )


QUERIES = {
    "variant_extraction": q_variant_extraction,
}

ORACLES = {
    "variant_extraction": """
        WITH v AS (
          SELECT event_type,
                 CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
          FROM events
        )
        SELECT event_type,
               count(k) AS n_with_k,
               CAST(sum(CASE WHEN k IS NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_missing,
               CAST(min(k) AS INTEGER) AS min_k,
               CAST(max(k) AS INTEGER) AS max_k,
               round(avg(k), 4) AS avg_k
        FROM v GROUP BY event_type
    """,
}
