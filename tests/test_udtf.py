"""Python UDTFs (the reference's 'Array UDFs' roadmap item on Spark 4)."""

import pytest

from datafusion_archive_spark.functions import udtf as U


@pytest.fixture(scope="module", autouse=True)
def registered(spark):
    U.register_all(spark)


def test_tokenize_lateral(spark):
    rows = spark.sql(
        "SELECT t.pos, t.token FROM tokenize('a quick test') AS t ORDER BY pos"
    ).collect()
    assert [(r.pos, r.token) for r in rows] == [
        (0, "a"), (1, "quick"), (2, "test"),
    ]


def test_shingle_matches_column_function(spark):
    rows = spark.sql(
        "SELECT shingle FROM shingle('a b c d', 3)"
    ).collect()
    assert [r.shingle for r in rows] == ["a b c", "b c d"]
    short = spark.sql("SELECT shingle FROM shingle('a b', 3)").collect()
    assert [r.shingle for r in short] == ["a b"]


def test_udtf_lateral_join_over_table(spark, sf_dir):
    out = spark.sql(
        f"""
        SELECT d.doc_id, count(*) AS n_tokens
        FROM (SELECT doc_id, text
              FROM parquet.`{sf_dir}/documents.parquet`
              WHERE doc_id < 5) d,
             LATERAL tokenize(d.text) t
        GROUP BY d.doc_id ORDER BY d.doc_id
        """
    ).collect()
    assert len(out) == 5
    assert all(r.n_tokens > 0 for r in out)
