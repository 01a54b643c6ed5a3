"""Round-10 regression pins.

1. The window_ranks ORACLE tie fix: dense_rank must use a VALUE-ONLY
   window. The old oracle ordered dense_rank by (c_acctbal DESC,
   c_custkey); with the unique tiebreak inside the window dense_rank
   degenerates to row_number, which only agrees with the engine's
   value-dense semantics while c_acctbal is collision-free — true at
   sf0.01 (the driver gate), false at sf0.1 where the r10 cross-sf
   sweep caught 11881/15000 divergent rows. This test runs BOTH the
   Spark query and the DuckDB oracle on a tie-HEAVY miniature
   customer table, so the oracle regressing to the tie-buggy form
   fails immediately at any scale.

2. The session factory's local-JVM heap default: the 1g local default
   OOMs in shuffle writes at sf0.1 (scale_probe_r8; reproduced by the
   first r10 sf0.1 registry sweep crashing at the graph queries).
   get_spark must set spark.driver.memory, env-overridable.
"""

from __future__ import annotations

import math
import os

import duckdb
import pandas as pd
import pytest


def test_window_ranks_oracle_agrees_under_value_ties(spark, tmp_path):
    from datafusion_archive_spark.queries import tpch_more

    # 3 segments x 40 customers; acctbal drawn from 6 distinct values
    # -> ties everywhere (the exact shape the old oracle got wrong)
    rows = []
    for i in range(120):
        rows.append(
            {
                "c_custkey": i + 1,
                "c_name": f"c{i}",
                "c_nationkey": i % 5,
                # (i // 3) decorrelates the balance from the i % 3
                # segment so every segment sees all six distinct
                # values, each ~6-7 times (the ties)
                "c_acctbal": float(
                    [10.0, 8.0, 7.5, 5.0, 3.25, -2.25][(i // 3) % 6]
                ),
                "c_mktsegment": ["AUTOMOBILE", "BUILDING", "MACHINERY"][i % 3],
            }
        )
    pd.DataFrame(rows).to_parquet(str(tmp_path / "customer.parquet"))

    got = (
        tpch_more.q_window_ranks(spark, str(tmp_path))
        .toPandas()
        .sort_values("c_custkey")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW customer AS SELECT * FROM "
        f"read_parquet('{tmp_path}/customer.parquet')"
    )
    want = (
        con.execute(tpch_more.ORACLES["window_ranks"])
        .fetchdf()
        .sort_values("c_custkey")
        .reset_index(drop=True)
    )
    assert list(got["c_custkey"]) == list(want["c_custkey"])
    for col in ["drank", "quartile"]:
        assert list(got[col]) == list(want[col].astype(int)), col
    for col in ["prank", "cdist"]:
        assert all(
            math.isclose(a, b, abs_tol=1e-9)
            for a, b in zip(got[col], want[col])
        ), col
    # the tie fix is live: with 6 distinct balances per segment the
    # dense ranks top out at 6, far below the 40-row row_number the
    # buggy oracle produced
    assert got["drank"].max() == 6


def test_session_factory_sets_driver_memory():
    """The conf must be present (8g default, env-overridable) so
    sf0.1-scale iterative queries don't die in a 1g local JVM. Checked
    on the live session's conf rather than by launching a second JVM."""
    from datafusion_archive_spark.session import get_spark

    spark = get_spark("conf_probe")
    want = os.environ.get("SPARK_GRAFT_DRIVER_MEMORY", "8g")
    assert spark.conf.get("spark.driver.memory") == want
