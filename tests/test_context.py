"""ExecutionContext end-to-end: registry, CSV/NDJSON/parquet sources,
DDL interception, SQL entry point, write path — the reference's
canonical flow (``examples/csv_sql.rs``) on our engine."""

import json
import os

import pytest

from datafusion_archive_spark import ExecutionContext

# uk_cities-shaped fixture (semantics of the reference's canonical
# example — our own data, reference file not copied)
CITIES = [
    ("Northmouth", 57.65, -3.31),
    ("Eastfield", 52.10, 0.12),
    ("Westbrook", 51.45, -2.59),
    ("Southcote", 50.82, -1.09),
    ("Midvale", 52.95, -1.15),
]


@pytest.fixture(scope="module")
def ctx(spark):
    return ExecutionContext(spark)


@pytest.fixture(scope="module")
def cities_csv(tmp_path_factory):
    p = tmp_path_factory.mktemp("csv") / "cities.csv"
    p.write_text(
        "".join(f"{c},{lat},{lng}\n" for c, lat, lng in CITIES)
    )
    return str(p)


def test_canonical_query_headerless_csv(ctx, cities_csv):
    """The reference's minimum slice (SURVEY §7.2):
    SELECT city, lat, lng FROM cities WHERE lat > 51.0 AND lat < 53."""
    ctx.register_csv(
        "cities",
        cities_csv,
        schema=[("city", "utf8"), ("lat", "float64"), ("lng", "float64")],
        header=False,
    )
    rows = ctx.sql(
        "SELECT city, lat, lng FROM cities WHERE lat > 51.0 AND lat < 53"
    ).collect()
    assert sorted(r.city for r in rows) == ["Eastfield", "Midvale", "Westbrook"]


def test_header_flag_honored(ctx, cities_csv):
    """Unlike the reference (hard-coded has_header=true eats the first
    row of headerless files — SURVEY §7.9), header=True must actually
    skip one row."""
    ctx.register_csv(
        "cities_hdr",
        cities_csv,
        schema=[("city", "utf8"), ("lat", "float64"), ("lng", "float64")],
        header=True,
    )
    assert ctx.table("cities_hdr").count() == len(CITIES) - 1


def test_ddl_create_external_table_csv(ctx, cities_csv):
    res = ctx.sql(
        f"CREATE EXTERNAL TABLE ddl_cities (city VARCHAR, lat DOUBLE, "
        f"lng DOUBLE) STORED AS CSV WITHOUT HEADER ROW LOCATION '{cities_csv}'"
    )
    assert res is None  # DDL returns no result set
    assert ctx.sql("SELECT count(*) AS n FROM ddl_cities").collect()[0].n == 5


def test_ddl_create_external_table_ndjson(ctx, tmp_path_factory):
    p = tmp_path_factory.mktemp("nd") / "docs.ndjson"
    with open(p, "w") as f:
        for i in range(4):
            f.write(json.dumps({"id": i, "body": f"doc {i}"}) + "\n")
    ctx.sql(
        f"CREATE EXTERNAL TABLE nd (id BIGINT, body VARCHAR) "
        f"STORED AS NDJSON LOCATION '{p}'"
    )
    assert ctx.table("nd").count() == 4


def test_ddl_create_external_table_parquet(ctx, sf_dir):
    ctx.sql(
        f"CREATE EXTERNAL TABLE pq_nation STORED AS PARQUET "
        f"LOCATION '{sf_dir}/nation.parquet'"
    )
    assert ctx.table("pq_nation").count() == 25


def test_register_testdata_and_join(ctx, sf_dir):
    ctx.register_testdata(sf_dir)
    out = ctx.sql(
        """
        SELECT r_name, count(*) AS n FROM nation
        JOIN region ON n_regionkey = r_regionkey GROUP BY r_name
        """
    ).collect()
    assert sum(r.n for r in out) == 25


def test_write_roundtrip(ctx, sf_dir, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("w") / "nation_out")
    df = ctx.table("nation")
    ctx.write(df, out, "parquet")
    assert ctx.spark.read.parquet(out).count() == 25


def test_select_no_from(ctx):
    row = ctx.sql("SELECT 1 + 2 AS three").collect()[0]
    assert row.three == 3


def test_parquet_schema_evolution_merge(spark, tmp_path_factory):
    """Two batches with drifting schemas union under mergeSchema; the
    older batch reads the new column as NULL."""
    from datafusion_archive_spark.context import ExecutionContext

    base = str(tmp_path_factory.mktemp("evolve") / "t")
    ctx = ExecutionContext(spark)
    spark.createDataFrame([(1, "a")], "id LONG, v STRING").write.parquet(
        f"{base}/b1"
    )
    spark.createDataFrame(
        [(2, "b", 9.5)], "id LONG, v STRING, score DOUBLE"
    ).write.parquet(f"{base}/b2")
    # read both dirs as one evolving table
    import shutil, os

    merged_dir = str(tmp_path_factory.mktemp("evolve2") / "m")
    os.makedirs(merged_dir)
    for b in ("b1", "b2"):
        for f in os.listdir(f"{base}/{b}"):
            if f.endswith(".parquet"):
                shutil.copy(f"{base}/{b}/{f}", f"{merged_dir}/{b}_{f}")
    df = ctx.register_parquet_evolving("evolving_t", merged_dir)
    rows = {
        (r.id, r.v, r.score)
        for r in ctx.sql(
            "SELECT id, v, score FROM evolving_t ORDER BY id"
        ).collect()
    }
    assert rows == {(1, "a", None), (2, "b", 9.5)}
    assert set(df.columns) == {"id", "v", "score"}


def test_ndjson_corrupt_record_quarantine(spark, tmp_path_factory):
    """PERMISSIVE mode quarantines malformed lines into the declared
    corrupt-record column instead of failing the batch."""
    from pyspark.sql import types as T

    from datafusion_archive_spark.context import ExecutionContext

    p = tmp_path_factory.mktemp("nd") / "data.json"
    p.write_text(
        '{"id": 1, "v": "ok"}\n'
        "THIS IS NOT JSON\n"
        '{"id": 2, "v": "fine"}\n'
    )
    ctx = ExecutionContext(spark)
    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("v", T.StringType()),
            T.StructField("_corrupt", T.StringType()),
        ]
    )
    df = ctx.register_ndjson(
        "nd_perm",
        str(p),
        schema=schema,
        mode="PERMISSIVE",
        columnNameOfCorruptRecord="_corrupt",
    )
    df.cache()  # corrupt-column queries need the full row materialized
    good = ctx.sql(
        "SELECT id FROM nd_perm WHERE _corrupt IS NULL ORDER BY id"
    ).collect()
    bad = ctx.sql(
        "SELECT _corrupt FROM nd_perm WHERE _corrupt IS NOT NULL"
    ).collect()
    df.unpersist()
    assert [r.id for r in good] == [1, 2]
    assert len(bad) == 1 and "NOT JSON" in bad[0]._corrupt
