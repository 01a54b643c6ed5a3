"""Round-5 wave-49 semantics: two-way FE estimator, shuffle-skew
audit (datafusion_archive_spark/queries/pipeline51.py)."""

from __future__ import annotations

import math
from collections import defaultdict

import pytest

from datafusion_archive_spark.queries import pipeline51 as P51


SF = "/root/testdata/sf0.001"


class TestFixedEffects:
    def test_matches_python(self, spark):
        cust = {
            r.c_custkey: r.c_nationkey
            for r in spark.read.parquet(f"{SF}/customer.parquet").collect()
        }
        agg = defaultdict(lambda: [0, 0.0])
        for r in spark.read.parquet(f"{SF}/orders.parquet").collect():
            d = r.o_orderdate
            key = (cust[r.o_custkey], (d.year, d.month))
            agg[key][0] += 1
            agg[key][1] += float(r.o_totalprice)
        cells = {
            k: (math.log(n), math.log(s)) for k, (n, s) in agg.items()
        }
        xi = defaultdict(list)
        xt = defaultdict(list)
        for (i, t), (x, y) in cells.items():
            xi[i].append((x, y))
            xt[t].append((x, y))
        mi = {i: (sum(a for a, _ in v) / len(v),
                  sum(b for _, b in v) / len(v)) for i, v in xi.items()}
        mt = {t: (sum(a for a, _ in v) / len(v),
                  sum(b for _, b in v) / len(v)) for t, v in xt.items()}
        gx = sum(x for x, _ in cells.values()) / len(cells)
        gy = sum(y for _, y in cells.values()) / len(cells)
        sxy = sxx = syy = 0.0
        for (i, t), (x, y) in cells.items():
            xw = x - mi[i][0] - mt[t][0] + gx
            yw = y - mi[i][1] - mt[t][1] + gy
            sxy += xw * yw
            sxx += xw * xw
            syy += yw * yw
        r = P51.q_fixed_effects_within(spark, SF).collect()[0]
        assert r.n_cells == len(cells)
        assert r.beta_fe == pytest.approx(round(sxy / sxx, 6), abs=1e-5)
        assert r.r2_within == pytest.approx(
            round(sxy * sxy / (sxx * syy), 6), abs=1e-5
        )
        assert 0.0 <= r.r2_within <= 1.0


class TestShuffleSkew:
    def test_matches_python_hash(self, spark):
        import hashlib

        counts = defaultdict(int)
        for r in spark.read.parquet(f"{SF}/lineitem.parquet").collect():
            h = hashlib.md5(
                f"{r.l_orderkey}:{P51._SKEW_SEED}".encode()
            ).hexdigest()
            counts[int(h[:15], 16) % P51._N_BUCKETS] += 1
        r = P51.q_shuffle_skew_audit(spark, SF).collect()[0]
        assert r.n_buckets == len(counts)
        assert r.n_rows == sum(counts.values())
        assert r.max_rows == max(counts.values())
        assert r.min_rows == min(counts.values())
        avg = sum(counts.values()) / len(counts)
        assert r.skew_factor == pytest.approx(
            round(max(counts.values()) / avg, 4), abs=1e-4
        )
        # a 60k-row uniform hash over 32 buckets should be balanced
        assert r.skew_factor < 2.0
