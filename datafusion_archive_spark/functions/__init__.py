"""Function surface of the engine.

- :mod:`registry` — scalar-function registry mirroring the reference's
  ``FunctionMeta`` / ``SchemaProvider::get_function_meta`` design
  (``/root/reference/src/logicalplan.rs:24-64``,
  ``src/sqlplanner.rs:29-32,343-367``).
- :mod:`geo` — the reference's geospatial UDF/UDT smoke-test surface
  (``ST_Point`` / ``ST_AsText``, ``test/data/smoketest.sql``).
- :mod:`text` — text-analysis column functions for LLM data pipelines
  (token counting, language ID, quality scoring, fingerprinting).
"""

from datafusion_archive_spark.functions.registry import FunctionMeta, FunctionRegistry

__all__ = ["FunctionMeta", "FunctionRegistry"]
