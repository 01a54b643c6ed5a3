"""Reference type system mapped onto Spark SQL types.

The reference's value domain (``/root/reference/src/logicalplan.rs:95-111``)
is: Null, Boolean, Float32, Float64, Int8/16/32/64, UInt8/16/32/64, Utf8,
Struct. Spark has no unsigned integers, so we adopt the widening policy
from SURVEY.md §7.3: each unsigned type is stored in the narrowest Spark
type that can represent its full range, and the logical type tag is kept
in field metadata so round-trips preserve intent.

The supertype lattice for implicit binary-operand coercion is re-derived
from ``/root/reference/src/logicalplan.rs:446-554`` and exposed as
:func:`supertype` for plan-time decisions (e.g. picking integer vs float
division in :mod:`datafusion_archive_spark.expressions`).
"""

from __future__ import annotations

from pyspark.sql import types as T

# Logical (reference) type names. These are the strings users may write in
# CREATE EXTERNAL TABLE column lists and in programmatic schemas.
_SQL_TYPE_MAP: dict[str, T.DataType] = {
    # SQL keyword → type, per /root/reference/src/sqlplanner.rs:379-393
    "BOOLEAN": T.BooleanType(),
    "SMALLINT": T.ShortType(),
    "INT": T.IntegerType(),
    "INTEGER": T.IntegerType(),
    "BIGINT": T.LongType(),
    "FLOAT": T.DoubleType(),
    "REAL": T.DoubleType(),
    "DOUBLE": T.DoubleType(),
    "CHAR": T.StringType(),
    "VARCHAR": T.StringType(),
    # Extended surface (Spark-native; absent from the reference but needed
    # by a real pipeline): dates/times/decimal/binary.
    "DATE": T.DateType(),
    "TIMESTAMP": T.TimestampType(),
    "DECIMAL": T.DecimalType(38, 18),
    "BINARY": T.BinaryType(),
    "STRING": T.StringType(),
}

# Reference scalar-type tag → physical Spark type, including the unsigned
# widening policy (SURVEY.md §7.3). The tag is preserved in metadata.
_LOGICAL_TYPE_MAP: dict[str, T.DataType] = {
    "null": T.NullType(),
    "boolean": T.BooleanType(),
    "int8": T.ByteType(),
    "int16": T.ShortType(),
    "int32": T.IntegerType(),
    "int64": T.LongType(),
    "uint8": T.ShortType(),  # 0..255 fits in int16
    "uint16": T.IntegerType(),  # 0..65535 fits in int32
    "uint32": T.LongType(),  # 0..2^32-1 fits in int64
    "uint64": T.DecimalType(20, 0),  # 0..2^64-1 needs 20 digits
    "float32": T.FloatType(),
    "float64": T.DoubleType(),
    "utf8": T.StringType(),
}

_UNSIGNED = {"uint8", "uint16", "uint32", "uint64"}
_SIGNED = {"int8", "int16", "int32", "int64"}
_FLOATS = {"float32", "float64"}
_NUMERIC = _UNSIGNED | _SIGNED | _FLOATS

_INT_WIDTH = {
    "int8": 8,
    "int16": 16,
    "int32": 32,
    "int64": 64,
    "uint8": 8,
    "uint16": 16,
    "uint32": 32,
    "uint64": 64,
}


def spark_type_for_sql(sql_type: str) -> T.DataType:
    """SQL keyword (``BIGINT``, ``VARCHAR(10)``, …) → Spark type."""
    base = sql_type.strip().upper().split("(")[0].strip()
    try:
        return _SQL_TYPE_MAP[base]
    except KeyError:
        raise ValueError(f"unsupported SQL type: {sql_type!r}") from None


def spark_type_for_logical(tag: str) -> T.DataType:
    """Reference logical type tag (``uint32``, ``utf8``, …) → Spark type."""
    try:
        return _LOGICAL_TYPE_MAP[tag.lower()]
    except KeyError:
        raise ValueError(f"unknown logical type tag: {tag!r}") from None


def field(name: str, tag: str, nullable: bool = True) -> T.StructField:
    """``Field::new(name, type, nullable)`` equivalent
    (reference ``src/execution/datasource.rs:28``, ``examples/csv_sql.rs:34-38``),
    preserving the logical tag in metadata for unsigned round-trips.
    """
    return T.StructField(
        name,
        spark_type_for_logical(tag),
        nullable,
        metadata={"logical_type": tag.lower()},
    )


def schema(*fields: T.StructField) -> T.StructType:
    return T.StructType(list(fields))


def supertype(a: str, b: str) -> str | None:
    """Common supertype of two logical type tags for binary-operand
    coercion, following the reference lattice
    (``/root/reference/src/logicalplan.rs:446-554``) with one
    DELIBERATE deviation: mixed-signedness pairs widen losslessly.
    The reference maps UInt8+Int8→Int8 and UInt32+Int32→Int32, which
    silently truncates unsigned values above the signed max; here they
    promote to the signed type wide enough for both ranges (uint8+int8
    → int16, uint32+int32 → int64). Everything else matches: equal
    types map to themselves; any float involvement wins at float64
    unless both are float32; utf8 pairs with nothing numeric.

    Known hazard, kept for reference parity (``logicalplan.rs:471``):
    uint64 mixed with any signed int yields int64, which cannot
    represent uint64 values above 2**63-1 — there is no wider signed
    int to widen into (the storage type DECIMAL(20,0) exists, but the
    reference coerces to Int64 and we match it). Callers mixing uint64
    with signed ints must range-check upstream.
    """
    a, b = a.lower(), b.lower()
    if a == b:
        return a
    if a == "utf8" or b == "utf8":
        return "utf8" if (a == b == "utf8") else None
    if a not in _NUMERIC or b not in _NUMERIC:
        return None
    if a in _FLOATS or b in _FLOATS:
        if {a, b} == {"float32", "float32"}:
            return "float32"
        return "float64"
    wa, wb = _INT_WIDTH[a], _INT_WIDTH[b]
    ua, ub = a in _UNSIGNED, b in _UNSIGNED
    if ua == ub:
        # same signedness: wider wins
        return a if wa >= wb else b
    # mixed signedness: result is signed, at least as wide as the wider
    # operand; an unsigned operand as wide as the signed one forces the
    # next width up (uint32 + int32 → int64), capping at int64.
    s_w, u_w = (wa, wb) if ub else (wb, wa)
    width = max(s_w, min(u_w * 2, 64)) if u_w >= s_w else s_w
    return f"int{width}"


def is_integer(tag: str) -> bool:
    return tag.lower() in _SIGNED or tag.lower() in _UNSIGNED


def is_float(tag: str) -> bool:
    return tag.lower() in _FLOATS
