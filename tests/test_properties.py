"""Property-based tests (hypothesis) for the engine-portable layers:
the supertype lattice, half-up rounding parity vs DuckDB, and the
md5 hash64 construction. These are the pieces whose correctness the
oracle comparisons lean on — fuzz them directly."""

import hashlib
import math

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from datafusion_archive_spark import types as ty
from datafusion_archive_spark.functions.rounding import round_half_up_sql

NUMERIC_TAGS = [
    "int8", "int16", "int32", "int64",
    "uint8", "uint16", "uint32", "uint64",
    "float32", "float64",
]


@given(st.sampled_from(NUMERIC_TAGS), st.sampled_from(NUMERIC_TAGS))
def test_supertype_commutative(a, b):
    assert ty.supertype(a, b) == ty.supertype(b, a)


@given(st.sampled_from(NUMERIC_TAGS))
def test_supertype_idempotent(a):
    assert ty.supertype(a, a) == a


@given(st.sampled_from(NUMERIC_TAGS), st.sampled_from(NUMERIC_TAGS))
def test_supertype_contains_both_ranges(a, b):
    """The supertype's Spark physical type must hold both operands'
    full value ranges (the point of the §7.3 widening policy)."""
    ranges = {
        "int8": (-(2**7), 2**7 - 1),
        "int16": (-(2**15), 2**15 - 1),
        "int32": (-(2**31), 2**31 - 1),
        "int64": (-(2**63), 2**63 - 1),
        "uint8": (0, 2**8 - 1),
        "uint16": (0, 2**16 - 1),
        "uint32": (0, 2**32 - 1),
        "uint64": (0, 2**64 - 1),
    }
    s = ty.supertype(a, b)
    assert s is not None
    if s in ("float32", "float64") or a not in ranges or b not in ranges:
        return
    lo, hi = ranges[s]
    # int64 is the lattice cap: any mix involving uint64 resolves to
    # int64 in the reference's lattice even though uint64's range
    # exceeds it (logicalplan.rs:471 — (UInt64, Int64) → Int64); the
    # physical layer stores standalone uint64 as Decimal(20,0) instead
    if "uint64" in (a, b):
        return
    for t in (a, b):
        assert ranges[t][0] >= lo and ranges[t][1] <= hi, (a, b, s)


@settings(max_examples=200, deadline=None)
@given(
    st.floats(
        min_value=-1e6,
        max_value=1e6,
        allow_nan=False,
        allow_infinity=False,
    ),
    st.integers(min_value=0, max_value=6),
)
def test_round_half_up_sql_parity(x, digits):
    """The Python-side formula and the DuckDB SQL fragment agree on
    arbitrary doubles — this is what keeps ratio columns hash-equal."""
    scale = 10**digits
    py = math.floor(x * scale + 0.5) / float(scale)
    sql = round_half_up_sql(repr(x), digits)
    duck = duckdb.sql(f"SELECT {sql}").fetchone()[0]
    assert duck == pytest.approx(py, abs=0) or duck == py


@settings(max_examples=100, deadline=None)
@given(st.text(min_size=0, max_size=50), st.integers(0, 63))
def test_hash64_duckdb_parity(s, seed):
    """md5-derived 60-bit hash: python == duckdb for arbitrary text
    (the Spark side is pinned in tests/test_functions.py)."""
    py = int(hashlib.md5(f"{s}:{seed}".encode()).hexdigest()[:15], 16)
    duck = duckdb.execute(
        "SELECT ('0x' || substr(md5(? || ?), 1, 15))::BIGINT",
        [s, f":{seed}"],
    ).fetchone()[0]
    assert py == duck


@settings(max_examples=25, deadline=None)
@given(
    st.lists(
        st.decimals(
            min_value="-99999.99", max_value="99999.99", places=2
        ),
        min_size=1,
        max_size=40,
    )
)
def test_decimal_sum_split_integer_exact(vals):
    """decimal_sum's split-integer fast path must equal the exact
    decimal sum of per-term 6dp values, independent of partitioning
    (money values with ≤2dp are exactly representable at 6dp)."""
    import decimal as _d

    from datafusion_archive_spark.functions.rounding import decimal_sum
    from datafusion_archive_spark.session import get_spark
    from pyspark.sql import functions as F

    spark = get_spark("tests")
    floats = [float(v) for v in vals]
    df = spark.createDataFrame(
        [(x,) for x in floats], "x double"
    ).repartition(4)
    got = df.agg(decimal_sum(F.col("x")).alias("s")).collect()[0].s
    want = float(sum(_d.Decimal(str(x)).quantize(_d.Decimal("0.000001"))
                     for x in floats))
    assert got == pytest.approx(want, abs=0.0)


def test_normalize_shingle_hash_spark_duckdb_parity(spark):
    """The full shingling foundation — normalize → split → k-shingles
    → hash64 — agrees between Spark and DuckDB on a deliberately nasty
    corpus (unicode, emoji, tabs/newlines, repeated spaces, quotes,
    long tokens). Every dedup oracle builds on these three fragments;
    a divergence here would silently rot the whole family."""
    import random

    from pyspark.sql import functions as F

    from datafusion_archive_spark.functions import text as TX
    from datafusion_archive_spark.queries.llm import (
        _NORM,
        _WORDS,
        _hash64_sql,
        _shingles_sql,
    )

    rng = random.Random(42)
    alphabet = "abc ABC  123 ,.;:!?\"'\t\n éüñ 中文 🙂 ---"
    corpus = [
        "",
        "   ",
        "one",
        "one two",
        "one  two\tthree\nfour",
        'quotes "inside" here',
        "UPPER lower MiXeD",
        "x" * 300,
        ("tok " * 50).strip(),
    ] + [
        "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 80)))
        for _ in range(150)
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(corpus)], "doc_id LONG, text STRING"
    )
    spark_rows = (
        df.select(
            "doc_id",
            TX.normalize_text(F.col("text")).alias("norm"),
            TX.word_shingles(F.col("text"), 3).alias("sh"),
            TX.hash64(F.col("text"), 7).alias("h"),
        )
        .orderBy("doc_id")
        .collect()
    )

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents (doc_id BIGINT, text VARCHAR)"
    )
    con.executemany(
        "INSERT INTO documents VALUES (?, ?)",
        [(i, t) for i, t in enumerate(corpus)],
    )
    duck_rows = con.execute(
        f"""
        SELECT doc_id, {_NORM} AS norm,
               (SELECT {_shingles_sql(3)} FROM (SELECT {_WORDS} AS w)) AS sh,
               {_hash64_sql("text", 7)} AS h
        FROM documents ORDER BY doc_id
        """
    ).fetchall()

    for s_row, d_row in zip(spark_rows, duck_rows):
        assert s_row.doc_id == d_row[0]
        assert s_row.norm == d_row[1], (s_row.doc_id, s_row.norm, d_row[1])
        assert list(s_row.sh) == list(d_row[2]), (
            s_row.doc_id, s_row.sh, d_row[2],
        )
        assert s_row.h == d_row[3], (s_row.doc_id, corpus[s_row.doc_id])
