"""Logical-plan IR with JSON serialization — the reference's plan
serde surface (``/root/reference/src/logicalplan.rs:612-651`` derives
``Serialize``/``Deserialize`` on every ``LogicalPlan`` and ``Expr``
variant; ``ROADMAP.md:44`` plans protobuf shipping of the same IR).

Spark needs no plan shipping — Catalyst serializes its own plans
between driver and executors — so the equivalent surface here is a
*declarative front end*: a small dataclass IR covering the reference's
plan algebra (scan / projection / selection / aggregate / sort / limit
/ join / empty-relation) and expression algebra (column, literal,
binary ops, NOT/LIKE/IS NULL, CAST, alias, scalar + aggregate calls)
that round-trips through JSON and *builds* a Spark DataFrame. A plan
authored on one machine can be stored, shipped, deserialized and
executed on another — exactly what the reference's serde is for —
while execution stays fully Catalyst-optimized (the IR builds lazy
DataFrame ops, so pushdown/pruning/join-selection all still apply).

Round-trip contract: ``from_json(to_json(p))`` reproduces the IR
exactly, and ``build`` of both produces the same results.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

# -- expression IR -----------------------------------------------------------

#: binary operators: IR tag → Column builder. Mirrors the reference
#: ``Expr::BinaryExpr`` operator set (logicalplan.rs Operator enum).
_BINOPS = {
    "eq": lambda a, b: a == b,
    "neq": lambda a, b: a != b,
    "lt": lambda a, b: a < b,
    "lteq": lambda a, b: a <= b,
    "gt": lambda a, b: a > b,
    "gteq": lambda a, b: a >= b,
    "and": lambda a, b: a & b,
    "or": lambda a, b: a | b,
    "plus": lambda a, b: a + b,
    "minus": lambda a, b: a - b,
    "multiply": lambda a, b: a * b,
    "divide": lambda a, b: a / b,
    "modulus": lambda a, b: a % b,
}

#: aggregate functions (reference Expr::AggregateFunction)
_AGGS = {
    "min": F.min,
    "max": F.max,
    "sum": F.sum,
    "avg": F.avg,
    "count": F.count,
    "count_distinct": F.count_distinct,
}

#: scalar functions admitted in the IR (reference Expr::ScalarFunction;
#: sqrt is the reference's only shipped scalar — we admit the common
#: ANSI set Spark shares with it)
_SCALARS = {
    "sqrt": F.sqrt,
    "abs": F.abs,
    "upper": F.upper,
    "lower": F.lower,
    "length": F.length,
    "year": F.year,
    "round": F.round,
}


def col(name: str) -> dict:
    return {"expr": "column", "name": name}


def lit(value: Any) -> dict:
    return {"expr": "literal", "value": value}


def binop(op: str, left: dict, right: dict) -> dict:
    if op not in _BINOPS:
        raise ValueError(f"unknown binary operator: {op!r}")
    return {"expr": "binary", "op": op, "left": left, "right": right}


def fn(name: str, *args: dict) -> dict:
    if name not in _SCALARS:
        raise ValueError(f"unknown scalar function: {name!r}")
    return {"expr": "scalar_fn", "fn": name, "args": list(args)}


def agg(name: str, arg: dict) -> dict:
    if name not in _AGGS:
        raise ValueError(f"unknown aggregate function: {name!r}")
    return {"expr": "agg", "fn": name, "arg": arg}


def alias(e: dict, name: str) -> dict:
    return {"expr": "alias", "input": e, "name": name}


def cast(e: dict, to: str) -> dict:
    return {"expr": "cast", "input": e, "to": to}


def build_expr(e: dict) -> Column:
    """IR expression → Spark Column."""
    kind = e["expr"]
    if kind == "column":
        return F.col(e["name"])
    if kind == "literal":
        return F.lit(e["value"])
    if kind == "binary":
        return _BINOPS[e["op"]](build_expr(e["left"]), build_expr(e["right"]))
    if kind == "not":
        return ~build_expr(e["input"])
    if kind == "like":
        return build_expr(e["input"]).like(e["pattern"])
    if kind == "is_null":
        return build_expr(e["input"]).isNull()
    if kind == "is_not_null":
        return build_expr(e["input"]).isNotNull()
    if kind == "cast":
        return build_expr(e["input"]).cast(e["to"])
    if kind == "alias":
        return build_expr(e["input"]).alias(e["name"])
    if kind == "scalar_fn":
        return _SCALARS[e["fn"]](*[build_expr(a) for a in e["args"]])
    if kind == "agg":
        return _AGGS[e["fn"]](build_expr(e["arg"]))
    raise ValueError(f"unknown expression kind: {kind!r}")


# -- plan IR -----------------------------------------------------------------


def scan(table: str) -> dict:
    return {"op": "scan", "table": table}


def parquet_scan(path: str) -> dict:
    return {"op": "parquet_scan", "path": path}


def csv_scan(path: str, schema: list[list[str]], header: bool = True) -> dict:
    return {"op": "csv_scan", "path": path, "schema": schema,
            "header": header}


def projection(exprs: list[dict], input_plan: dict) -> dict:
    return {"op": "projection", "exprs": exprs, "input": input_plan}


def selection(predicate: dict, input_plan: dict) -> dict:
    return {"op": "selection", "predicate": predicate, "input": input_plan}


def aggregate(
    group_exprs: list[dict], aggr_exprs: list[dict], input_plan: dict
) -> dict:
    return {"op": "aggregate", "group": group_exprs, "aggr": aggr_exprs,
            "input": input_plan}


def sort(keys: list[dict], input_plan: dict) -> dict:
    """keys: [{"expr": ..., "asc": bool}, ...]"""
    return {"op": "sort", "keys": keys, "input": input_plan}


def limit(n: int, input_plan: dict) -> dict:
    return {"op": "limit", "n": n, "input": input_plan}


def join(
    left: dict, right: dict, on: list[str], how: str = "inner"
) -> dict:
    return {"op": "join", "left": left, "right": right, "on": on,
            "how": how}


def empty_relation() -> dict:
    return {"op": "empty_relation"}


def build(
    spark: SparkSession,
    plan: dict,
    tables: dict[str, DataFrame] | None = None,
) -> DataFrame:
    """IR plan → Spark DataFrame (lazy — Catalyst optimizes the whole
    composed tree exactly as if it had been written by hand; the IR
    adds no execution layer)."""
    op = plan["op"]
    if op == "scan":
        t = plan["table"]
        if tables and t in tables:
            return tables[t]
        return spark.table(t)
    if op == "parquet_scan":
        return spark.read.parquet(plan["path"])
    if op == "csv_scan":
        from datafusion_archive_spark import types as _types

        reader = spark.read.option("header", str(plan["header"]).lower())
        st = None
        if plan.get("schema"):
            from pyspark.sql import types as T

            st = T.StructType(
                [_types.field(n, t) for n, t in plan["schema"]]
            )
            reader = reader.schema(st)
        return reader.csv(plan["path"])
    if op == "projection":
        return build(spark, plan["input"], tables).select(
            *[build_expr(e) for e in plan["exprs"]]
        )
    if op == "selection":
        return build(spark, plan["input"], tables).filter(
            build_expr(plan["predicate"])
        )
    if op == "aggregate":
        inp = build(spark, plan["input"], tables)
        groups = [build_expr(e) for e in plan["group"]]
        aggs = [build_expr(e) for e in plan["aggr"]]
        if groups:
            return inp.groupBy(*groups).agg(*aggs)
        return inp.agg(*aggs)
    if op == "sort":
        keys = [
            build_expr(k["expr"]) if k.get("asc", True)
            else build_expr(k["expr"]).desc()
            for k in plan["keys"]
        ]
        return build(spark, plan["input"], tables).orderBy(*keys)
    if op == "limit":
        return build(spark, plan["input"], tables).limit(plan["n"])
    if op == "join":
        return build(spark, plan["left"], tables).join(
            build(spark, plan["right"], tables), plan["on"], plan["how"]
        )
    if op == "empty_relation":
        return spark.range(1).select(F.lit(1).alias("one")).drop("one")
    raise ValueError(f"unknown plan op: {op!r}")


# -- JSON round-trip ---------------------------------------------------------


def to_json(plan: dict) -> str:
    """Serialize an IR plan — the reference's serde_json::to_string
    equivalent (logicalplan.rs:612-651). Deterministic (sorted keys)
    so equality of serialized forms == equality of plans."""
    import json

    return json.dumps(plan, sort_keys=True, separators=(",", ":"))


def from_json(s: str) -> dict:
    import json

    plan = json.loads(s)
    _validate(plan)
    return plan


_PLAN_OPS = {
    "scan", "parquet_scan", "csv_scan", "projection", "selection",
    "aggregate", "sort", "limit", "join", "empty_relation",
}


def _validate(plan: dict) -> None:
    """Structural validation on deserialization — unknown ops/exprs
    fail here, not deep inside build()."""
    if not isinstance(plan, dict) or plan.get("op") not in _PLAN_OPS:
        raise ValueError(f"invalid plan node: {plan!r}")
    for key in ("input", "left", "right"):
        if key in plan:
            _validate(plan[key])
