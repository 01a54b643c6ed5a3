"""Round-5 wave-35 semantics: level-3 itemset mining and hash
surrogate keys (datafusion_archive_spark/queries/pipeline37.py)."""

from __future__ import annotations

from collections import Counter
from itertools import combinations

from datafusion_archive_spark.queries import pipeline37 as P37

SF = "/root/testdata/sf0.001"


class TestAssocTriples:
    def test_matches_python_apriori(self, spark):
        rows = (
            spark.read.parquet(f"{SF}/lineitem.parquet")
            .select("l_orderkey", "l_partkey")
            .collect()
        )
        baskets: dict[int, set[int]] = {}
        for r in rows:
            baskets.setdefault(r.l_orderkey, set()).add(r.l_partkey)
        item_n = Counter(p for b in baskets.values() for p in b)
        freq = {p for p, n in item_n.items() if n >= P37._TRI_MIN_ITEM}
        tri = Counter()
        pair = Counter()
        for b in baskets.values():
            kept = sorted(p for p in b if p in freq)
            pair.update(combinations(kept, 2))
            tri.update(combinations(kept, 3))
        expected = sorted(
            ((t, s) for t, s in tri.items()),
            key=lambda ts: (-ts[1], ts[0]),
        )[: P37._TRI_TOPK]

        got = P37.q_assoc_triples(spark, SF).collect()
        assert len(got) == len(expected)
        for row, ((pa, pb, pc), sup) in zip(got, expected):
            assert (row.pa, row.pb, row.pc) == (pa, pb, pc)
            assert row.support == sup
            want_conf = round(sup / pair[(pa, pb)], 6)
            assert abs(row.conf_ab_c - want_conf) < 1e-9

    def test_antimonotone_prune(self, spark):
        # every item inside a surviving triple must itself be frequent
        got = P37.q_assoc_triples(spark, SF).collect()
        assert got, "sf0.001 should yield frequent triples"
        rows = (
            spark.read.parquet(f"{SF}/lineitem.parquet")
            .select("l_orderkey", "l_partkey")
            .distinct()
            .collect()
        )
        item_n = Counter(r.l_partkey for r in rows)
        for row in got:
            for p in (row.pa, row.pb, row.pc):
                assert item_n[p] >= P37._TRI_MIN_ITEM
            assert row.pa < row.pb < row.pc
            assert 0.0 < row.conf_ab_c <= 1.0


class TestSurrogateKeys:
    def test_zero_collisions_and_determinism(self, spark):
        got = P37.q_surrogate_keys_hash(spark, SF).collect()
        assert len(got) == 1
        r = got[0]
        assert r.n_rows == r.n_distinct_natural
        assert r.n_distinct_surrogate == r.n_distinct_natural
        assert r.n_collisions == 0
        # run twice: the hash family is deterministic, so the audit
        # row is byte-identical across builds
        again = P37.q_surrogate_keys_hash(spark, SF).collect()[0]
        assert again == r
