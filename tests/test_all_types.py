"""Golden-corpus parity: the reference's fuller pre-0.6 test suite is
preserved as 66 expected-output CSVs (``/root/reference/test/data/
expected/`` — per-type comparisons ``c_int8_gt.csv`` …, range
predicates ``c_int8_range_inclusive.csv``, casts for every int/uint
type ``c_uint16_cast.csv`` …, arithmetic incl. modulo
``numerics_modulo.csv``, null predicates ``is_null_csv.csv``). Those
goldens define the intended type surface better than the executing
code (SURVEY.md §5.4).

This module rebuilds that surface on our engine: an all_types fixture
(our own rows, reference data not copied) with every reference type —
unsigned ones stored via the §7.3 widening policy — exercised through
per-type predicates, ranges, casts, arithmetic, and null handling,
asserted against plain-Python computation of the same semantics.
"""

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from datafusion_archive_spark import types as ty

# one row per "interesting" value pattern, all columns nullable; row 4
# is all-NULL (exercises is_null goldens)
ROWS = [
    # c_int8, c_int16, c_int32, c_int64, c_uint8, c_uint16, c_uint32,
    # c_uint64, c_f32, c_f64, c_bool, c_utf8
    (-128, -32768, -2147483648, -9223372036854775808, 0, 0, 0, 0,
     -1.5, -2.75, False, "alpha"),
    (-1, -2, -3, -4, 1, 2, 3, 4, 0.0, 0.0, True, "bravo"),
    (0, 0, 0, 0, 127, 1000, 70000, 5000000000, 1.25, 2.5, False, "charlie"),
    (127, 32767, 2147483647, 9223372036854775807, 255, 65535, 4294967295,
     18446744073709551615, 3.5, 7.125, True, "delta"),
    (None,) * 12,
    (42, 420, 4200, 42000, 200, 40000, 3000000000, 10000000000,
     0.5, -0.25, True, "echo"),
]

COLS = [
    ("c_int8", "int8"), ("c_int16", "int16"), ("c_int32", "int32"),
    ("c_int64", "int64"), ("c_uint8", "uint8"), ("c_uint16", "uint16"),
    ("c_uint32", "uint32"), ("c_uint64", "uint64"), ("c_f32", "float32"),
    ("c_f64", "float64"), ("c_bool", "boolean"), ("c_utf8", "utf8"),
]


@pytest.fixture(scope="module")
def all_types(spark):
    import decimal

    schema = T.StructType([ty.field(n, t) for n, t in COLS])
    rows = [
        tuple(
            decimal.Decimal(v)
            if v is not None and COLS[i][1] == "uint64"
            else v
            for i, v in enumerate(r)
        )
        for r in ROWS
    ]
    return spark.createDataFrame(rows, schema)


def col_vals(df, col):
    return [r[0] for r in df.select(col).collect()]


@pytest.mark.parametrize(
    "col,threshold",
    [
        ("c_int8", 0), ("c_int16", -2), ("c_int32", 0), ("c_int64", -4),
        ("c_uint8", 127), ("c_uint16", 1000), ("c_uint32", 70000),
        ("c_f32", 0.0), ("c_f64", 2.5),
    ],
)
def test_gt_predicate_per_type(all_types, col, threshold):
    """c_<type>_gt.csv semantics: x > threshold, NULLs dropped."""
    got = sorted(col_vals(all_types.filter(F.col(col) > threshold), col))
    idx = [c for c, _ in COLS].index(col)
    expected = sorted(
        r[idx] for r in ROWS if r[idx] is not None and r[idx] > threshold
    )
    assert got == expected


@pytest.mark.parametrize(
    "col,lo,hi",
    [("c_int8", -1, 127), ("c_uint16", 2, 40000), ("c_f64", 0.0, 7.125)],
)
def test_range_inclusive_per_type(all_types, col, lo, hi):
    """c_<type>_range_inclusive.csv semantics: BETWEEN lo AND hi."""
    got = sorted(col_vals(all_types.filter(F.col(col).between(lo, hi)), col))
    idx = [c for c, _ in COLS].index(col)
    expected = sorted(
        r[idx] for r in ROWS if r[idx] is not None and lo <= r[idx] <= hi
    )
    assert got == expected


def test_cast_float_to_int_truncates(all_types):
    """test_cast.csv / tests/sql.rs:70-77: CAST(double AS int)
    truncates toward zero (ANSI-mode Spark still truncates in-range
    values)."""
    got = col_vals(
        all_types.filter(F.col("c_f64").isNotNull()).select(
            F.col("c_f64").cast("int")
        ),
        "c_f64",
    )
    expected = [int(r[9]) for r in ROWS if r[9] is not None]
    assert got == expected


def test_cast_widening_int_chain(all_types):
    """c_int8_cast-style: every signed int upcasts losslessly."""
    df = all_types.filter(F.col("c_int8").isNotNull())
    out = df.select(
        F.col("c_int8").cast("smallint").alias("a"),
        F.col("c_int8").cast("int").alias("b"),
        F.col("c_int8").cast("bigint").alias("c"),
        F.col("c_int8").cast("double").alias("d"),
    ).collect()
    for r in out:
        assert r.a == r.b == r.c == int(r.d)


def test_uint64_roundtrip_decimal(all_types):
    """c_uint64_cast semantics: full-range uint64 survives via
    DecimalType(20,0) (SURVEY §7.3)."""
    vals = sorted(
        int(v) for v in col_vals(
            all_types.filter(F.col("c_uint64").isNotNull()), "c_uint64"
        )
    )
    assert vals == [0, 4, 5000000000, 10000000000, 18446744073709551615]


def test_modulo_per_type(all_types):
    """numerics_modulo.csv / numerics_modulo_f64.csv: % for ints and
    floats, truncated sign semantics (Rust/Arrow == Java/Spark)."""
    df = all_types.filter(F.col("c_int32").isNotNull())
    out = df.select(
        (F.col("c_int32") % 7).alias("m_i"),
        (F.col("c_f64") % 2.0).alias("m_f"),
    ).collect()
    exp = [
        (r[2] - int(r[2] / 7) * 7, None if r[9] is None else r[9] % 2.0
         if r[9] >= 0 else -((-r[9]) % 2.0))
        for r in ROWS if r[2] is not None
    ]
    for got, (ei, ef) in zip(out, exp):
        assert got.m_i == ei
        assert got.m_f == pytest.approx(ef)


def test_null_predicates(all_types):
    """is_null_csv.csv / is_not_null_csv.csv."""
    assert all_types.filter(F.col("c_utf8").isNull()).count() == 1
    assert all_types.filter(F.col("c_utf8").isNotNull()).count() == 5


def test_boolean_and_utf8_compare(all_types):
    """The reference plans but cannot execute Utf8/Boolean comparisons
    (SURVEY §2.2, expression.rs:410-451 numeric-only); we support them."""
    assert (
        col_vals(all_types.filter(F.col("c_utf8") >= "charlie"), "c_utf8")
        and all_types.filter(F.col("c_bool") == True).count() == 3  # noqa: E712
    )
    got = sorted(col_vals(all_types.filter(F.col("c_utf8") > "bravo"), "c_utf8"))
    assert got == ["charlie", "delta", "echo"]


def test_arithmetic_supertype_coercion(all_types):
    """Mixed-type arithmetic follows the supertype lattice: int8+int64
    computes in int64 (logicalplan.rs:446-554 → types.supertype)."""
    assert ty.supertype("int8", "int64") == "int64"
    df = all_types.filter(F.col("c_int8").isNotNull())
    out = df.select((F.col("c_int8") + F.col("c_int64")).alias("s"))
    assert dict(out.dtypes)["s"] == "bigint"


def test_sum_result_type_policy(all_types):
    """SURVEY §7.4: reference SUM(int8) stays int8; Spark computes wide
    (long) — engine policy is compute-wide + optional downcast, which
    is strictly more correct. Pin the wide result here."""
    out = all_types.agg(F.sum("c_int8").alias("s")).collect()[0]
    assert out.s == -128 - 1 + 0 + 127 + 42  # 40, no overflow
    assert dict(all_types.agg(F.sum("c_int8").alias("s")).dtypes)["s"] == "bigint"
