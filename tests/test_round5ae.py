"""Round-5 wave-36 semantics: recursive closure rollup, Hamilton
apportionment (datafusion_archive_spark/queries/pipeline38.py)."""

from __future__ import annotations

import math
from collections import defaultdict

from datafusion_archive_spark.queries import pipeline38 as P38

SF = "/root/testdata/sf0.001"


class TestHierarchyClosure:
    def test_matches_python_closure(self, spark):
        parts = {
            r.p_partkey: float(r.p_retailprice)
            for r in spark.read.parquet(f"{SF}/part.parquet").collect()
        }
        subtree_n = defaultdict(int)
        subtree_v = defaultdict(float)
        for p, price in parts.items():
            a = p // 2
            while a >= 1:
                if a <= P38._CLOSURE_MAX_NODE:
                    subtree_n[a] += 1
                    subtree_v[a] += price
                a //= 2
        got = P38.q_hierarchy_closure_rollup(spark, SF).collect()
        assert [r.ancestor for r in got] == sorted(subtree_n)
        for r in got:
            assert r.n_desc == subtree_n[r.ancestor]
            assert abs(r.subtree_value - round(subtree_v[r.ancestor], 2)) < 0.02

    def test_depth_is_logarithmic(self, spark):
        # node 1's subtree is every node with key >= 2 (partkeys start
        # at 0; node 0 never appears as an ancestor because only keys
        # >= 2 form edges): the closure really reached the root from
        # the deepest leaf
        got = {r.ancestor: r.n_desc for r in
               P38.q_hierarchy_closure_rollup(spark, SF).collect()}
        n_tree = (
            spark.read.parquet(f"{SF}/part.parquet")
            .filter("p_partkey >= 2")
            .count()
        )
        assert got[1] == n_tree
        # children of the root partition the non-root nodes
        assert got[2] + got[3] == got[1] - 2


class TestApportionment:
    def test_exact_total_and_hamilton(self, spark):
        rows = P38.q_apportion_largest_remainder(spark, SF).collect()
        assert sum(r.alloc for r in rows) == P38._APPORTION_SEATS
        total = sum(r.n_customers for r in rows)
        for r in rows:
            quota = P38._APPORTION_SEATS * r.n_customers / total
            assert abs(r.quota_r - round(quota, 6)) < 1e-9
            # Hamilton never deviates from the quota by a full seat
            assert math.floor(quota) <= r.alloc <= math.ceil(quota)
