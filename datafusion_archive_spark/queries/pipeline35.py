"""Pipeline wave 35 (round 5, thirty-third wave): multiple-testing
control and population estimation.

- ``fdr_bh_nation_tests`` — 25 simultaneous two-proportion z-tests
  (each nation's urgent-order rate vs the rest of the corpus) with
  Benjamini–Hochberg false-discovery-rate control at q = 0.10.
  p-values come from the Abramowitz–Stegun 7.1.26 normal-CDF
  polynomial — pure arithmetic, so both engines produce the
  IDENTICAL p and the identical discovery set (no erf builtin
  needed on either side). The screen every metrics platform needs
  the moment it tests more than one segment.
- ``capture_recapture_users`` — Lincoln–Petersen population
  estimate: treat click-ers and purchase-ers as two independent
  captures, estimate the total user population from the overlap,
  and report it next to the true distinct-user count (the estimator
  validates ONLY under independent captures — the gap is the
  point of printing both).

The reference has no statistical machinery
(``/root/reference/src/execution/expression.rs``).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from datafusion_archive_spark.queries.timeseries import load_events
from datafusion_archive_spark.operators.util import cached, load_table


def _t(spark, sf_dir, name):
    return load_table(spark, sf_dir, name)


_FDR_Q = 0.10

# Abramowitz-Stegun 7.1.26 constants for erf(x), |error| < 1.5e-7
_AS = (0.254829592, -0.284496736, 1.421413741, -1.453152027, 1.061405429)
_AS_P = 0.3275911


def _norm_sf_expr(z):
    """Survival function 1 - Phi(|z|) via the A&S erf polynomial —
    identical closed-form arithmetic on both engines."""
    x = F.abs(z) / F.sqrt(F.lit(2.0))
    t = 1.0 / (1.0 + _AS_P * x)
    poly = (
        _AS[0] * t
        + _AS[1] * t * t
        + _AS[2] * t * t * t
        + _AS[3] * t * t * t * t
        + _AS[4] * t * t * t * t * t
    )
    erf = 1.0 - poly * F.exp(-x * x)
    return (1.0 - erf) / 2.0


def q_fdr_bh_nation_tests(spark, sf):
    """Per nation: urgent rate, two-proportion z vs the rest, the
    two-sided p-value, the BH rank, and the discovery flag at
    FDR 0.10 (BH step-up: reject all ranks ≤ the largest i with
    p(i) ≤ q·i/m).

    Scale: one custkey join + a 25-cell rollup; the BH sweep runs
    over the 25 test rows (two tiny windows)."""
    o = _t(spark, sf, "orders").select(
        "o_custkey",
        F.expr("o_orderpriority = '1-URGENT'").cast("double").alias("y"),
    )
    c = _t(spark, sf, "customer").select("c_custkey", "c_nationkey")
    n = _t(spark, sf, "nation").select("n_nationkey", "n_name")
    # cached: the 25-row rollup fans out to the totals and the test
    # join, and the ranked table fans out again for the BH cutoff —
    # uncached, the orders-customer join would run up to four times
    per = cached(
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(F.count(F.lit(1)).cast("double").alias("ni"), F.sum("y").alias("yi"))
    )
    tot = per.agg(
        F.sum("ni").alias("nt"), F.sum("yi").alias("yt"),
        F.count(F.lit(1)).alias("m"),
    )
    j = per.join(F.broadcast(tot))
    p1 = F.col("yi") / F.col("ni")
    n2 = F.col("nt") - F.col("ni")
    p2 = (F.col("yt") - F.col("yi")) / n2
    pp = F.col("yt") / F.col("nt")
    z = (p1 - p2) / F.sqrt(pp * (1 - pp) * (1 / F.col("ni") + 1 / n2))
    tested = j.select(
        F.col("n_name").alias("nation"),
        F.col("ni").cast("long").alias("n_orders"),
        F.round(p1, 6).alias("urgent_rate"),
        F.round(z, 6).alias("z"),
        (2.0 * _norm_sf_expr(z)).alias("_p"),
        "m",
    )
    w = Window.orderBy("_p", "nation")
    ranked = cached(tested.withColumn("bh_rank", F.row_number().over(w)))
    passes = F.when(
        F.col("_p") <= _FDR_Q * F.col("bh_rank") / F.col("m"),
        F.col("bh_rank"),
    )
    cutoff = ranked.agg(
        F.coalesce(F.max(passes), F.lit(0)).alias("_cut")
    )
    return ranked.join(F.broadcast(cutoff)).select(
        "nation",
        "n_orders",
        "urgent_rate",
        "z",
        F.round("_p", 6).alias("p_value"),
        "bh_rank",
        (F.col("bh_rank") <= F.col("_cut")).alias("significant"),
    )


def q_capture_recapture_users(spark, sf):
    """Lincoln–Petersen: capture 1 = users who clicked, capture 2 =
    users who purchased, overlap m → N̂ = n₁·n₂/m (Chapman
    bias-corrected variant also reported), next to the TRUE distinct
    user count. One row.

    Scale: three distinct-count aggregates over the (user, flag)
    rollup — one user Exchange."""
    e = load_events(spark, sf)
    per_user = e.groupBy("user_id").agg(
        F.max((F.col("event_type") == "click").cast("int")).alias("c1"),
        F.max((F.col("event_type") == "purchase").cast("int")).alias("c2"),
    )
    agg = per_user.agg(
        F.count(F.lit(1)).alias("true_users"),
        F.sum("c1").alias("n1"),
        F.sum("c2").alias("n2"),
        F.sum(F.col("c1") * F.col("c2")).alias("m"),
    )
    lp = F.col("n1") * F.col("n2") / F.col("m")
    chapman = (
        (F.col("n1") + 1) * (F.col("n2") + 1) / (F.col("m") + 1) - 1
    )
    return agg.select(
        "true_users",
        F.col("n1").cast("long").alias("n_capture1"),
        F.col("n2").cast("long").alias("n_capture2"),
        F.col("m").cast("long").alias("n_overlap"),
        F.round(lp, 2).alias("lincoln_petersen"),
        F.round(chapman, 2).alias("chapman"),
    )


QUERIES = {
    "fdr_bh_nation_tests": q_fdr_bh_nation_tests,
    "capture_recapture_users": q_capture_recapture_users,
}


def _norm_sf_sql(z: str) -> str:
    x = f"(abs({z}) / sqrt(2.0))"
    t = f"(1.0 / (1.0 + {_AS_P} * {x}))"
    poly = (
        f"({_AS[0]} * {t} + {_AS[1]} * {t} * {t} "
        f"+ {_AS[2]} * {t} * {t} * {t} "
        f"+ {_AS[3]} * {t} * {t} * {t} * {t} "
        f"+ {_AS[4]} * {t} * {t} * {t} * {t} * {t})"
    )
    return f"((1.0 - (1.0 - {poly} * exp(-{x} * {x}))) / 2.0)"


_Z_SQL = (
    "((yi / ni - (yt - yi) / (nt - ni)) "
    "/ sqrt((yt / nt) * (1 - yt / nt) * (1 / ni + 1 / (nt - ni))))"
)

ORACLES = {
    "fdr_bh_nation_tests": f"""
        WITH per AS (
          SELECT n.n_name AS nation,
                 CAST(count(*) AS DOUBLE) AS ni,
                 sum(CASE WHEN o.o_orderpriority = '1-URGENT'
                          THEN 1.0 ELSE 0.0 END) AS yi
          FROM orders o
          JOIN customer c ON o.o_custkey = c.c_custkey
          JOIN nation n ON c.c_nationkey = n.n_nationkey
          GROUP BY 1
        ),
        tot AS (
          SELECT sum(ni) AS nt, sum(yi) AS yt, count(*) AS m FROM per
        ),
        tested AS (
          SELECT nation,
                 CAST(ni AS BIGINT) AS n_orders,
                 round(yi / ni, 6) AS urgent_rate,
                 round({_Z_SQL}, 6) AS z,
                 2.0 * {_norm_sf_sql(_Z_SQL)} AS p_raw,
                 m
          FROM per CROSS JOIN tot
        ),
        ranked AS (
          SELECT *, CAST(row_number() OVER (ORDER BY p_raw, nation)
                    AS INTEGER) AS bh_rank
          FROM tested
        ),
        cutoff AS (
          SELECT coalesce(max(CASE WHEN p_raw <= {_FDR_Q} * bh_rank / m
                                   THEN bh_rank END), 0) AS cut
          FROM ranked
        )
        SELECT nation, n_orders, urgent_rate, z,
               round(p_raw, 6) AS p_value,
               bh_rank,
               bh_rank <= cut AS significant
        FROM ranked CROSS JOIN cutoff
    """,
    "capture_recapture_users": """
        WITH per_user AS (
          SELECT user_id,
                 max(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                   AS c1,
                 max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                   AS c2
          FROM events GROUP BY user_id
        )
        SELECT count(*) AS true_users,
               CAST(sum(c1) AS BIGINT) AS n_capture1,
               CAST(sum(c2) AS BIGINT) AS n_capture2,
               CAST(sum(c1 * c2) AS BIGINT) AS n_overlap,
               round(CAST(sum(c1) AS DOUBLE) * sum(c2) / sum(c1 * c2), 2)
                 AS lincoln_petersen,
               round((sum(c1) + 1.0) * (sum(c2) + 1.0)
                     / (sum(c1 * c2) + 1.0) - 1, 2) AS chapman
        FROM per_user
    """,
}
