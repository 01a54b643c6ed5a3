"""The engine's query suite — one entry per operator in SURVEY.md §2
plus the north-star extension surface (text/dedup/similarity/
multimodal/streaming).

Each query is a ``(spark, sf_dir) -> DataFrame`` callable with a
DuckDB-SQL oracle string whose column names and value semantics match
exactly (the driver hash-compares sorted results). Queries without an
oracle (approximate / non-SQL-expressible operators) get a rows-only
check.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from datafusion_archive_spark.queries import (
    aggregates2,
    llm,
    nested,
    pipeline,
    relational,
    timeseries,
    tpch_more,
    tpch_more2,
    tpch_more3,
)

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}

for mod in (
    relational,
    timeseries,
    llm,
    nested,
    tpch_more,
    tpch_more2,
    tpch_more3,
    aggregates2,
    pipeline,
):
    QUERIES.update(mod.QUERIES)
    ORACLES.update(mod.ORACLES)

__all__ = ["QUERIES", "ORACLES"]
