"""Bounded-error oracle for `approx_aggs` (rows-only in the driver).

The sketch outputs are engine-specific, so the driver can only count
rows — but the whole point of an approximate aggregate is a *bounded*
error, and that bound is testable: compare each group's sketch output
against the exact DuckDB value and pin the documented relative error.

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

from datafusion_archive_spark.queries import _ALL_QUERIES


@pytest.fixture(scope="module")
def results(spark, sf_dir):
    sdf = _ALL_QUERIES["approx_aggs"](spark, sf_dir).toPandas()
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
    return sdf.set_index("l_returnflag"), exact.set_index("l_returnflag")


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
