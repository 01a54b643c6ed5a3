"""Scalar-function registry.

The reference declares a UDF registry but never wires a runtime
(``FunctionMeta { name, args, return_type, function_type }`` at
``/root/reference/src/logicalplan.rs:24-64``; planner resolution via
``SchemaProvider::get_function_meta`` at ``src/sqlplanner.rs:29-32,
343-367``; execution ``unimplemented!()`` at ``context.rs:255-257``).

Here the registry is functional: a function is either

- *native*: a Python callable composing ``pyspark.sql.functions``
  Columns — stays JVM-side, whole-stage-codegen'd, the preferred path; or
- *python*: a genuine UDF registered through ``spark.udf.register``
  (Arrow-batched pandas UDF when ``vectorized=True``) — the slow path.

Declared argument types are honored the way the reference planner does
it (casting arguments to the declared types before invocation,
``src/sqlplanner.rs:350-354``).
"""

from __future__ import annotations

from collections.abc import Callable, Sequence
from dataclasses import dataclass, field as dc_field

from pyspark.sql import Column, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


@dataclass
class FunctionMeta:
    """Mirror of the reference's FunctionMeta (``logicalplan.rs:24-64``)."""

    name: str
    arg_types: Sequence[T.DataType] = dc_field(default_factory=tuple)
    return_type: T.DataType | None = None
    function_type: str = "scalar"  # "scalar" | "aggregate" (FunctionType enum)


class FunctionRegistry:
    """Named scalar functions usable from both the DataFrame API and SQL."""

    def __init__(self, spark: SparkSession):
        self.spark = spark
        self._meta: dict[str, FunctionMeta] = {}
        self._impl: dict[str, Callable[..., Column]] = {}

    def register_native(
        self,
        meta: FunctionMeta,
        impl: Callable[..., Column],
    ) -> None:
        """Register a Column-composition function (JVM-side, fast path)."""
        self._meta[meta.name.lower()] = meta
        self._impl[meta.name.lower()] = self._with_arg_casts(meta, impl)

    def register_python(
        self,
        meta: FunctionMeta,
        fn: Callable,
        vectorized: bool = True,
    ) -> None:
        """Register a Python UDF (pandas UDF when vectorized) — also
        visible to ``spark.sql`` under ``meta.name``."""
        if vectorized:
            udf = F.pandas_udf(fn, returnType=meta.return_type)
        else:
            udf = F.udf(fn, returnType=meta.return_type)
        self.spark.udf.register(meta.name, udf)
        self._meta[meta.name.lower()] = meta
        self._impl[meta.name.lower()] = udf

    def get_function_meta(self, name: str) -> FunctionMeta | None:
        """Reference ``SchemaProvider::get_function_meta``
        (``sqlplanner.rs:29-32``)."""
        return self._meta.get(name.lower())

    def call(self, name: str, *args: Column) -> Column:
        try:
            impl = self._impl[name.lower()]
        except KeyError:
            raise ValueError(f"unknown function: {name!r}") from None
        return impl(*args)

    def _with_arg_casts(
        self, meta: FunctionMeta, impl: Callable[..., Column]
    ) -> Callable[..., Column]:
        """Cast arguments to declared types before invocation — the
        reference planner inserts these casts at ``sqlplanner.rs:350-354``."""

        def wrapped(*args: Column) -> Column:
            cast_args = [
                a.cast(t) if t is not None else a
                for a, t in zip(
                    args,
                    list(meta.arg_types) + [None] * (len(args) - len(meta.arg_types)),
                )
            ]
            return impl(*cast_args)

        return wrapped
