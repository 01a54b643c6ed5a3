"""Bounded-error verification for `approx_aggs`.

Since round 11b the registered query certifies its own sketches — it
emits deterministic within-bounds flags (as INT) that the DuckDB
oracle asserts as literal 1, so the driver row is exact. This module
keeps the INDEPENDENT check: it recomputes the raw sketch values
directly (not through the query's own flag logic) and bounds them
against exact DuckDB values, so a bug in the flag expressions cannot
self-certify.

- ``approx_count_distinct`` uses HyperLogLog++ with relativeSD=0.02;
  the rsd is a *standard* error, so we assert within 3 sigma (6%)
  with a small absolute floor for tiny groups.
- ``percentile_approx`` (KLL-style quantile sketch, accuracy=1000)
  guarantees a *rank* error of at most n/accuracy = 0.1% of rows; we
  assert the returned value lies between the exact 0.49 and 0.51
  quantiles — a 10× slack on the rank bound.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from datafusion_archive_spark.queries import _ALL_QUERIES


@pytest.fixture(scope="module")
def results(spark, sf_dir):
    raw = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .groupBy("l_returnflag")
        .agg(
            F.approx_count_distinct("l_orderkey", rsd=0.02).alias(
                "approx_orders"
            ),
            F.percentile_approx("l_extendedprice", 0.5, 1000).alias(
                "approx_median_price"
            ),
        )
        .toPandas()
    )
    con = duckdb.connect()
    exact = con.execute(
        f"""
        SELECT l_returnflag,
               count(DISTINCT l_orderkey) AS exact_orders,
               quantile_cont(l_extendedprice, 0.49) AS q49,
               quantile_cont(l_extendedprice, 0.51) AS q51
        FROM read_parquet('{sf_dir}/lineitem.parquet')
        GROUP BY l_returnflag
        """
    ).fetchdf()
    return raw.set_index("l_returnflag"), exact.set_index("l_returnflag")


def test_groups_match(results):
    approx, exact = results
    assert sorted(approx.index) == sorted(exact.index)


def test_approx_count_distinct_within_documented_error(results):
    approx, exact = results
    for flag in exact.index:
        got = approx.loc[flag, "approx_orders"]
        want = exact.loc[flag, "exact_orders"]
        assert abs(got - want) <= max(3 * 0.02 * want, 5), (
            f"{flag}: approx_count_distinct {got} vs exact {want} "
            "exceeds 3 sigma of the rsd=0.02 HLL++ standard error"
        )


def test_approx_median_within_rank_bound(results):
    approx, exact = results
    for flag in exact.index:
        got = approx.loc[flag, "approx_median_price"]
        lo = exact.loc[flag, "q49"]
        hi = exact.loc[flag, "q51"]
        assert lo <= got <= hi, (
            f"{flag}: approx median {got} outside exact "
            f"[p49={lo}, p51={hi}] — rank error above 10x the "
            "accuracy=1000 guarantee"
        )


def test_registered_query_flags_all_pass(spark, sf_dir, results):
    """The certified query's self-check flags agree with this module's
    independent verdict: every group within bounds, exact counts equal
    to DuckDB's."""
    _, exact = results
    rows = _ALL_QUERIES["approx_aggs"](spark, sf_dir).collect()
    assert len(rows) == len(exact)
    for r in rows:
        assert r["approx_orders_ok"] == 1, r
        assert r["approx_median_ok"] == 1, r
        assert (
            r["exact_orders"]
            == exact.loc[r["l_returnflag"], "exact_orders"]
        ), r
