"""Driver-certifiable batch twin for the scalar-function registry.

The reference declares a UDF registry but never executes it
(``FunctionMeta`` at ``/root/reference/src/logicalplan.rs:24-64``,
planner resolution ``src/sqlplanner.rs:343-367``, execution
``unimplemented!()`` at ``src/context.rs:255-257``). Our registry
(`functions/registry.py`) is functional; until now it was only
pytest-covered because its queries weren't SQL-twinned. This module
runs BOTH registry paths in one certified query:

- a *native* registered function (Column composition, JVM codegen) —
  ``disc_price(extendedprice, discount)``, with declared-arg casts;
- a *python* registered function (Arrow-batched pandas UDF) —
  ``qty_band(quantity)`` — whose semantics are deliberately
  SQL-expressible so DuckDB can replay them exactly.

The money sum goes through the shared ``decimal_sum`` integer-micros
path so the result is partition-order-independent and hash-matches the
DuckDB oracle bit-for-bit.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

from datafusion_archive_spark.functions.registry import (
    FunctionMeta,
    FunctionRegistry,
)
from datafusion_archive_spark.functions.rounding import (
    decimal_sum,
    decimal_sum_sql,
)


def q_registry_udf_expr(spark, sf):
    """Aggregate lineitem revenue per quantity band where the band comes
    from a registered pandas UDF and the revenue term from a registered
    native function. One two-phase hash aggregate; the only Python in
    the plan is the Arrow-batched band classifier."""
    l = spark.read.parquet(f"{sf}/lineitem.parquet")
    reg = FunctionRegistry(spark)
    reg.register_native(
        FunctionMeta(
            "disc_price",
            [T.DoubleType(), T.DoubleType()],
            T.DoubleType(),
        ),
        lambda price, disc: price * (F.lit(1.0) - disc),
    )

    def qty_band(q: pd.Series) -> pd.Series:
        return q.map(
            lambda v: "low" if v < 10 else ("mid" if v < 25 else "high")
        )

    reg.register_python(
        FunctionMeta("qty_band", [T.DoubleType()], T.StringType()),
        qty_band,
        vectorized=True,
    )

    return (
        l.withColumn("band", reg.call("qty_band", F.col("l_quantity")))
        .groupBy("band")
        .agg(
            decimal_sum(
                reg.call(
                    "disc_price", F.col("l_extendedprice"), F.col("l_discount")
                )
            ).alias("disc_revenue"),
            F.count(F.lit(1)).alias("n"),
        )
    )


QUERIES = {
    "registry_udf_expr": q_registry_udf_expr,
}

ORACLES = {
    "registry_udf_expr": f"""
        SELECT CASE WHEN l_quantity < 10 THEN 'low'
                    WHEN l_quantity < 25 THEN 'mid'
                    ELSE 'high' END AS band,
               {decimal_sum_sql("l_extendedprice * (1 - l_discount)")}
                 AS disc_revenue,
               count(*) AS n
        FROM lineitem
        GROUP BY 1
    """,
}
