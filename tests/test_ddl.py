"""CREATE EXTERNAL TABLE dialect parser (reference grammar
``src/dfparser.rs:101-208``)."""

import pytest

from datafusion_archive_spark import ddl


def test_parse_csv_with_columns():
    stmt = ddl.parse_create_external_table(
        "CREATE EXTERNAL TABLE cities (city VARCHAR(100), lat DOUBLE, "
        "lng DOUBLE) STORED AS CSV WITHOUT HEADER ROW "
        "LOCATION '/tmp/uk_cities.csv'"
    )
    assert stmt.name == "cities"
    assert stmt.columns == [
        ("city", "VARCHAR(100)"),
        ("lat", "DOUBLE"),
        ("lng", "DOUBLE"),
    ]
    assert stmt.file_format == "CSV"
    assert stmt.header_row is False
    assert stmt.location == "/tmp/uk_cities.csv"


def test_parse_header_default_true():
    # reference hard-codes has_header=true (datasource.rs:41)
    stmt = ddl.parse_create_external_table(
        "CREATE EXTERNAL TABLE t (a INT) STORED AS CSV LOCATION '/x.csv'"
    )
    assert stmt.header_row is True


def test_parse_parquet_no_columns():
    stmt = ddl.parse_create_external_table(
        "CREATE EXTERNAL TABLE t STORED AS PARQUET LOCATION '/data/t.parquet';"
    )
    assert stmt.file_format == "PARQUET"
    assert stmt.columns == []


def test_parse_ndjson():
    stmt = ddl.parse_create_external_table(
        "create external table j (a BIGINT, b VARCHAR) stored as NDJSON "
        "location '/x.ndjson'"
    )
    assert stmt.file_format == "NDJSON"
    assert stmt.columns[0] == ("a", "BIGINT")


def test_is_create_external_table():
    assert ddl.is_create_external_table("  CREATE  EXTERNAL TABLE x ...")
    assert not ddl.is_create_external_table("SELECT 1")
    assert not ddl.is_create_external_table("CREATE TABLE x (a INT)")


def test_malformed_raises():
    with pytest.raises(ValueError):
        ddl.parse_create_external_table(
            "CREATE EXTERNAL TABLE t STORED AS EXCEL LOCATION '/x'"
        )


def test_parse_orc_format():
    from datafusion_archive_spark.ddl import parse_create_external_table

    stmt = parse_create_external_table(
        "CREATE EXTERNAL TABLE t STORED AS ORC LOCATION '/tmp/t_orc'"
    )
    assert stmt.file_format == "ORC"
    assert stmt.columns == []
    assert stmt.location == "/tmp/t_orc"


def test_orc_roundtrip_via_ddl(spark, sf_dir, tmp_path_factory):
    from datafusion_archive_spark.context import ExecutionContext

    path = str(tmp_path_factory.mktemp("orc") / "region_orc")
    ctx = ExecutionContext(spark)
    src = spark.read.parquet(f"{sf_dir}/region.parquet")
    ctx.write(src, path, "orc")
    ctx.sql(f"CREATE EXTERNAL TABLE region_orc_t STORED AS ORC LOCATION '{path}'")
    got = ctx.sql(
        "SELECT r_regionkey, r_name FROM region_orc_t ORDER BY r_regionkey"
    ).collect()
    want = src.select("r_regionkey", "r_name").orderBy("r_regionkey").collect()
    assert got == want


def test_parse_xml_with_rowtag():
    from datafusion_archive_spark import ddl

    stmt = ddl.parse_create_external_table(
        "CREATE EXTERNAL TABLE t (a INT, b VARCHAR) "
        "STORED AS XML ROWTAG 'item' LOCATION '/tmp/t_xml'"
    )
    assert stmt.file_format == "XML"
    assert stmt.row_tag == "item"
    assert stmt.columns == [("a", "INT"), ("b", "VARCHAR")]


def test_xml_roundtrip_via_ddl(spark, sf_dir, tmp_path_factory):
    from datafusion_archive_spark.context import ExecutionContext

    path = str(tmp_path_factory.mktemp("xml") / "region_xml")
    ctx = ExecutionContext(spark)
    src = spark.read.parquet(f"{sf_dir}/region.parquet")
    src.write.format("xml").option("rowTag", "region").save(path)
    ctx.sql(
        f"CREATE EXTERNAL TABLE region_xml_t (r_regionkey BIGINT, "
        f"r_name VARCHAR) STORED AS XML ROWTAG 'region' LOCATION '{path}'"
    )
    got = ctx.sql(
        "SELECT r_regionkey, r_name FROM region_xml_t ORDER BY r_regionkey"
    ).collect()
    want = src.select("r_regionkey", "r_name").orderBy("r_regionkey").collect()
    assert [(r.r_regionkey, r.r_name) for r in got] == [
        (r.r_regionkey, r.r_name) for r in want
    ]
