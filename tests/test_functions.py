"""Function registry, geo UDT surface, and text-analysis functions."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from datafusion_archive_spark.functions import (
    FunctionMeta,
    FunctionRegistry,
    geo,
)
from datafusion_archive_spark.functions import text as TX


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [
            (1, "The cat and the dog. And the bird!"),
            (2, "der Hund und die Katze und das Haus"),
            (3, "  spaced   out   text  "),
            (4, "x"),
        ],
        ["id", "text"],
    )


def test_registry_native_with_arg_casts(spark):
    reg = FunctionRegistry(spark)
    reg.register_native(
        FunctionMeta("plus_one", arg_types=(T.DoubleType(),)),
        lambda c: c + 1.0,
    )
    df = spark.range(3).select(reg.call("plus_one", F.col("id")).alias("v"))
    assert [r.v for r in df.collect()] == [1.0, 2.0, 3.0]
    meta = reg.get_function_meta("PLUS_ONE")
    assert meta is not None and meta.name == "plus_one"


def test_registry_python_udf(spark):
    reg = FunctionRegistry(spark)
    reg.register_python(
        FunctionMeta("py_rev", return_type=T.StringType()),
        lambda s: s.map(lambda x: x[::-1]),
        vectorized=True,
    )
    out = spark.sql("SELECT py_rev('abc') AS r").collect()[0].r
    assert out == "cba"


def test_geo_point_wkt(spark):
    """Smoke-test shape from the reference: POINT (x y)
    (test/data/smoketest-expected.txt)."""
    df = spark.createDataFrame([(51.5, -0.1)], ["lat", "lng"])
    out = df.select(
        geo.st_astext(geo.st_point(F.col("lat"), F.col("lng"))).alias("wkt")
    ).collect()[0]
    assert out.wkt == "POINT (51.5 -0.1)"


def test_token_counts(spark, docs):
    rows = {
        r.id: r
        for r in docs.select(
            "id",
            TX.token_count(F.col("text")).alias("ws"),
            TX.bpe_ish_token_count(F.col("text")).alias("bpe"),
        ).collect()
    }
    assert rows[1].ws == 8
    # "The cat and the dog . And the bird !" → 8 words + 2 punct
    assert rows[1].bpe == 10
    assert rows[3].ws == 3  # trim + \s+ split collapses padding
    assert rows[4].ws == 1


def test_lang_id_markers(spark, docs):
    rows = {
        r.id: r.lang
        for r in docs.select(
            "id", TX.lang_id(F.col("text")).alias("lang")
        ).collect()
    }
    assert rows[1] == "en"  # ' the ' x3, ' and ' x2
    assert rows[2] == "de"  # ' und ' x2, ' das ' x1
    assert rows[4] == "unknown"


def test_fingerprint_normalization(spark):
    df = spark.createDataFrame(
        [(1, "Hello   World"), (2, "hello world"), (3, "different")],
        ["id", "text"],
    )
    fps = [
        r.fp
        for r in df.select(TX.fingerprint(F.col("text")).alias("fp"))
        .collect()
    ]
    assert fps[0] == fps[1]  # whitespace + case normalized
    assert fps[0] != fps[2]


def test_word_shingles(spark):
    df = spark.createDataFrame([("a b c d",)], ["text"])
    sh = df.select(
        TX.word_shingles(F.col("text"), 3).alias("sh")
    ).collect()[0].sh
    assert sh == ["a b c", "b c d"]
    # shorter than k → single whole-text shingle
    df2 = spark.createDataFrame([("a b",)], ["text"])
    sh2 = df2.select(
        TX.word_shingles(F.col("text"), 3).alias("sh")
    ).collect()[0].sh
    assert sh2 == ["a b"]


def test_hash64_matches_python_md5(spark):
    import hashlib

    df = spark.createDataFrame([("hello",)], ["s"])
    h = df.select(TX.hash64(F.col("s"), 7).alias("h")).collect()[0].h
    assert h == int(hashlib.md5(b"hello:7").hexdigest()[:15], 16)


def test_clean_text_chain(spark):
    raw = (
        '<div class="post">Hello <b>world</b></div> '
        "mail me at john.doe+spam@corp.example.org or visit "
        "https://example.com/a?b=c#frag then stop"
    )
    df = spark.createDataFrame([(raw,)], ["text"])
    out = df.select(TX.clean_text(F.col("text")).alias("c")).collect()[0].c
    assert out == (
        "Hello world mail me at <EMAIL> or visit <URL> then stop"
    )


def test_mask_functions_individually(spark):
    df = spark.createDataFrame(
        [("a@b.io and http://x.y/z plus <i>tag</i>",)], ["text"]
    )
    r = df.select(
        TX.mask_emails(F.col("text")).alias("e"),
        TX.mask_urls(F.col("text")).alias("u"),
        TX.strip_html(F.col("text")).alias("h"),
    ).collect()[0]
    assert "<EMAIL>" in r.e and "a@b.io" not in r.e
    assert "<URL>" in r.u and "http://x.y/z" not in r.u
    assert "<i>" not in r.h and "tag" in r.h


def test_repetition_ratio(spark):
    df = spark.createDataFrame(
        [("buy buy buy buy now",), ("all words here differ fully",)],
        ["text"],
    )
    vals = [
        r.r
        for r in df.select(
            TX.repetition_ratio(F.col("text")).alias("r")
        ).collect()
    ]
    assert vals[0] == 0.8   # 4/5
    assert vals[1] == 0.2   # 1/5
