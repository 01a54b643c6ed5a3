"""Geospatial UDF/UDT surface from the reference smoke test.

The reference console registers (commented out) ``ST_Point`` — a UDT
constructor producing a point struct — and ``ST_AsText`` — WKT
rendering (``/root/reference/src/bin/console/main.rs:25-27,123-125``;
exercised by ``test/data/smoketest.sql:2-3`` which expects
``POINT (lat lng)`` strings per ``test/data/smoketest-expected.txt``;
goldens ``test/data/expected/test_df_udf_udt.csv``,
``test_sql_udf_udt.csv``).

Implemented as *native* column compositions — struct creation and
``format_string`` are JVM-side expressions, no Python UDF involved.
"""

from __future__ import annotations

from pyspark.sql import Column, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from datafusion_archive_spark.functions.registry import FunctionMeta, FunctionRegistry

POINT_TYPE = T.StructType(
    [
        T.StructField("x", T.DoubleType(), True),
        T.StructField("y", T.DoubleType(), True),
    ]
)


def st_point(x: Column, y: Column) -> Column:
    """Point UDT constructor: two doubles → struct<x,y>."""
    return F.struct(
        x.cast("double").alias("x"), y.cast("double").alias("y")
    )


def st_astext(point: Column) -> Column:
    """WKT rendering matching the smoke test's ``POINT (x y)`` shape
    (``smoketest-expected.txt``)."""
    return F.format_string(
        "POINT (%s %s)",
        point.getField("x").cast("string"),
        point.getField("y").cast("string"),
    )


def register(registry: FunctionRegistry) -> None:
    registry.register_native(
        FunctionMeta(
            "ST_Point",
            arg_types=(T.DoubleType(), T.DoubleType()),
            return_type=POINT_TYPE,
        ),
        st_point,
    )
    registry.register_native(
        FunctionMeta("ST_AsText", return_type=T.StringType()), st_astext
    )


def register_sql(spark: SparkSession) -> None:
    """Expose both functions to ``spark.sql`` queries. Struct creation
    can't be a SQL alias without a UDF, so SQL-side we register thin
    Python UDFs; DataFrame-side callers should prefer the native
    column functions above."""
    spark.udf.register(
        "ST_Point",
        lambda x, y: (float(x), float(y)) if x is not None and y is not None else None,
        POINT_TYPE,
    )
    spark.udf.register(
        "ST_AsText",
        lambda p: f"POINT ({p[0]} {p[1]})" if p is not None else None,
        T.StringType(),
    )
