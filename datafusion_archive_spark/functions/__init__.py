"""Function surface of the engine.

- :mod:`registry` — scalar-function registry mirroring the reference's
  ``FunctionMeta`` / ``SchemaProvider::get_function_meta`` design
  (``/root/reference/src/logicalplan.rs:24-64``,
  ``src/sqlplanner.rs:29-32,343-367``).
- :mod:`geo` — the reference's geospatial UDF/UDT smoke-test surface
  (``ST_Point`` / ``ST_AsText``, ``test/data/smoketest.sql``).
- :mod:`text` — text-analysis column functions for LLM data pipelines
  (token counting, language ID, quality scoring, fingerprinting).
- :mod:`udaf` — Pandas GROUPED_AGG UDAFs (the reference's declared-only
  ``FunctionType::Aggregate``); kept free of PEP 563 annotations,
  which break pandas_udf signature resolution.
- :mod:`rounding` — engine-portable exact rounding/summation
  (``round_half_up``, split-integer ``decimal_sum``).
"""

from datafusion_archive_spark.functions.registry import FunctionMeta, FunctionRegistry

__all__ = ["FunctionMeta", "FunctionRegistry"]
