"""datafusion_archive_spark — a PySpark-native analytics engine.

A brand-new engine with the query and data-processing capabilities of
the reference engine (andygrove/datafusion v0.6.0 snapshot — a Rust,
single-threaded, Arrow-columnar SQL engine), re-expressed Spark-first:
logical plans are declared with the DataFrame/SQL API and optimized by
Catalyst; physical execution is Tungsten whole-stage codegen.

Layout
------
- ``context``    — ExecutionContext: datasource registry + ``sql()`` entry
                   point (reference: ``src/execution/context.rs``).
- ``types``      — reference type system mapped to Spark, incl. the
                   unsigned-int widening policy and the supertype lattice
                   (reference: ``src/logicalplan.rs:95-111,446-554``).
- ``ddl``        — ``CREATE EXTERNAL TABLE … STORED AS … LOCATION`` dialect
                   shim (reference: ``src/dfparser.rs:101-208``).
- ``sources``    — CSV / Parquet / NDJSON registration helpers
                   (reference: ``src/execution/datasource.rs``).
- ``functions``  — scalar function registry (sqrt, ST_Point, ST_AsText)
                   and text-analysis functions (reference:
                   ``src/logicalplan.rs:24-64``, ``test/data/smoketest.sql``).
- ``operators``  — batch operators beyond stock Spark: dedup family,
                   similarity search, as-of join, multimodal columns.
- ``streaming``  — Structured Streaming surface (windowed aggregation,
                   stateful ops) — the reference's roadmap ambition
                   (``ROADMAP.md:36-56``) realized on Spark.
"""

from datafusion_archive_spark.context import ExecutionContext
from datafusion_archive_spark.session import get_spark

__all__ = ["ExecutionContext", "get_spark"]
__version__ = "0.1.0"
