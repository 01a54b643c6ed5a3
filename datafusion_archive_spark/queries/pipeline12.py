"""Pipeline wave 12 (round 5, tenth wave): experiment analysis and
statistical-dependence tests.

- ``ab_test_ztest`` — two-proportion z-test for a hash-randomized
  A/B split on conversion (a ``purchase`` event over a value
  threshold — every user has SOME purchase, so the raw event would
  be a degenerate 100% rate): assignment,
  conversion rates, pooled z statistic, and the 95% verdict in one
  row. The experiment-analysis primitive every product pipeline
  runs; exact because every input is an integer count and both
  engines execute the identical closed-form arithmetic.
- ``contingency_stats`` — χ², mutual information (nats), and
  Cramér's V for the status × priority contingency table: the
  dependence screen of feature selection / data profiling. The
  table collapses to r×c cells before any statistics run.
- ``ks_test_two_sample`` — the two-sample Kolmogorov–Smirnov D
  statistic between open vs filled order price distributions, via
  value-collapsed CDF cumsums (D = max |F1 − F2| at observed
  values); with the 95% critical value. Distribution-shift
  detection between snapshots / cohorts at scale: one sort over
  DISTINCT values, never raw rows.

All three are single-scan → tiny-grid pipelines: the fact table
reduces to counts first, the statistics are arithmetic on the grid.
The reference's aggregate surface stops at MIN/MAX/SUM/COUNT/AVG
(``/root/reference/src/execution/expression.rs:98-107``).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from datafusion_archive_spark.functions import text as TX
from datafusion_archive_spark.queries.llm import _hash64_sql
from datafusion_archive_spark.queries.timeseries import load_events
from datafusion_archive_spark.operators.util import load_table


def _t(spark, sf_dir, name):
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# Two-proportion z-test
# ---------------------------------------------------------------------------

_AB_SEED = 97
_AB_CONVERSION_EVENT = "purchase"
_AB_CONVERSION_MIN_VALUE = 150.0
_AB_Z_CRIT = 1.959963984540054  # two-sided 95%


def q_ab_test_ztest(spark, sf):
    """Hash-randomized A/B assignment (portable md5-hash64 parity on
    user_id — the same deterministic-bucketing family as the
    train/val/test splitter) and the standard pooled two-proportion
    z-test on conversion. One row: group sizes, conversions, rates,
    z, and the 95% two-sided verdict.

    Scale: one pass over events collapses to per-user (variant,
    converted) — a single user_id Exchange — then a 2-row aggregate;
    the test statistic is driver-free closed-form arithmetic."""
    e = load_events(spark, sf)
    per_user = e.groupBy("user_id").agg(
        F.max(
            (
                (F.col("event_type") == _AB_CONVERSION_EVENT)
                & (F.col("value") > _AB_CONVERSION_MIN_VALUE)
            ).cast("int")
        ).alias("converted")
    )
    assigned = per_user.select(
        F.when(
            TX.hash64(F.col("user_id").cast("string"), _AB_SEED) % 2 == 0,
            F.lit("A"),
        )
        .otherwise(F.lit("B"))
        .alias("variant"),
        "converted",
    )
    g = assigned.groupBy("variant").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("converted").cast("long").alias("conv"),
    )
    a = g.filter(F.col("variant") == "A").select(
        F.col("n").alias("n_a"), F.col("conv").alias("conv_a")
    )
    b = g.filter(F.col("variant") == "B").select(
        F.col("n").alias("n_b"), F.col("conv").alias("conv_b")
    )
    j = a.join(F.broadcast(b))
    p_a = F.col("conv_a") / F.col("n_a")
    p_b = F.col("conv_b") / F.col("n_b")
    pooled = (F.col("conv_a") + F.col("conv_b")) / (
        F.col("n_a") + F.col("n_b")
    )
    se = F.sqrt(
        pooled * (1 - pooled) * (1 / F.col("n_a") + 1 / F.col("n_b"))
    )
    z = (p_a - p_b) / se
    return j.select(
        "n_a",
        "conv_a",
        "n_b",
        "conv_b",
        F.round(p_a, 6).alias("p_a"),
        F.round(p_b, 6).alias("p_b"),
        F.round(z, 6).alias("z"),
        (F.abs(z) > F.lit(_AB_Z_CRIT)).alias("significant_95"),
    )


# ---------------------------------------------------------------------------
# Contingency-table dependence statistics
# ---------------------------------------------------------------------------


def q_contingency_stats(spark, sf):
    """χ², mutual information (natural log), and Cramér's V for the
    order status × priority table. The scan collapses to the r×c cell
    grid in one aggregate; marginals broadcast back onto the cells;
    the three statistics are one more tiny aggregate. All
    probabilities are integer-count ratios, so both engines sum the
    same doubles (log parity holds the same way the certified PMI
    collocations row does)."""
    o = _t(spark, sf, "orders")
    cells = o.groupBy(
        F.col("o_orderstatus").alias("s"),
        F.col("o_orderpriority").alias("p"),
    ).agg(F.count(F.lit(1)).alias("c"))
    row_t = cells.groupBy("s").agg(F.sum("c").alias("rs"))
    col_t = cells.groupBy("p").agg(F.sum("c").alias("cs"))
    tot = cells.agg(
        F.sum("c").alias("n"),
        F.count_distinct("s").alias("r_card"),
        F.count_distinct("p").alias("c_card"),
    )
    full = (
        cells.join(F.broadcast(row_t), "s")
        .join(F.broadcast(col_t), "p")
        .join(F.broadcast(tot))
    )
    e = F.col("rs") * F.col("cs") / F.col("n")
    pxy = F.col("c") / F.col("n")
    px = F.col("rs") / F.col("n")
    py = F.col("cs") / F.col("n")
    stats = full.groupBy("n", "r_card", "c_card").agg(
        F.sum((F.col("c") - e) * (F.col("c") - e) / e).alias("_chi2"),
        F.sum(pxy * F.log(pxy / (px * py))).alias("_mi"),
    )
    dof = (F.col("r_card") - 1) * (F.col("c_card") - 1)
    v = F.sqrt(
        F.col("_chi2")
        / (F.col("n") * (F.least("r_card", "c_card") - 1))
    )
    return stats.select(
        F.col("n").alias("n_rows"),
        dof.cast("long").alias("dof"),
        F.round("_chi2", 4).alias("chi2"),
        F.round("_mi", 6).alias("mutual_info_nats"),
        F.round(v, 6).alias("cramers_v"),
    )


# ---------------------------------------------------------------------------
# Two-sample Kolmogorov–Smirnov
# ---------------------------------------------------------------------------

_KS_GROUP_A = "O"
_KS_GROUP_B = "F"


def q_ks_test_two_sample(spark, sf):
    """KS D statistic between the price distributions of open ('O')
    and filled ('F') orders: collapse to per-distinct-value counts for
    each sample, sweep the merged value axis with two cumulative sums,
    D = max |F1 − F2|. Every CDF value is an integer-count ratio —
    exact on both engines — and the sweep runs over DISTINCT prices.
    Since round 8 the two cumulative counts come from the bucketed
    global running sums (operators/ranks): prices are near-unique, so
    the value dictionary grows linearly with the corpus and the old
    unpartitioned window sorted all of it in ONE task — the same
    dictionary-growth argument VERDICT r7 made against the weighted
    quartiles sweep. Integer counts regroup exactly across buckets,
    so the distributed form is bit-identical, no quantization needed.
    One row: n1, n2, D, the 95% critical value, the reject verdict."""
    o = _t(spark, sf, "orders").filter(
        F.col("o_orderstatus").isin(_KS_GROUP_A, _KS_GROUP_B)
    )
    by_val = o.groupBy(F.col("o_totalprice").alias("v")).agg(
        F.sum(
            (F.col("o_orderstatus") == _KS_GROUP_A).cast("long")
        ).alias("ca"),
        F.sum(
            (F.col("o_orderstatus") == _KS_GROUP_B).cast("long")
        ).alias("cb"),
    )
    from datafusion_archive_spark.operators.ranks import bucketed_group_rank

    tots = by_val.agg(
        F.sum("ca").alias("n1"), F.sum("cb").alias("n2")
    )
    swept = (
        bucketed_group_rank(
            by_val,
            [],
            "v",
            tiebreak=["v"],  # v is distinct after the collapse
            running=[("ca", "_f1"), ("cb", "_f2")],
        )
        .join(F.broadcast(tots))
        .select(
            "n1",
            "n2",
            F.abs(
                F.col("_f1") / F.col("n1") - F.col("_f2") / F.col("n2")
            ).alias("_d"),
        )
    )
    crit = F.lit(1.358) * F.sqrt(
        (F.col("n1") + F.col("n2")) / (F.col("n1") * F.col("n2"))
    )
    return swept.groupBy("n1", "n2").agg(
        F.round(F.max("_d"), 6).alias("d_stat"),
        F.round(F.max(crit), 6).alias("d_crit_95"),
        (F.max("_d") > F.max(crit)).alias("reject_same_dist"),
    )


QUERIES = {
    "ab_test_ztest": q_ab_test_ztest,
    "contingency_stats": q_contingency_stats,
    "ks_test_two_sample": q_ks_test_two_sample,
}

ORACLES = {
    "ab_test_ztest": f"""
        WITH per_user AS (
          SELECT user_id,
                 max(CASE WHEN event_type = '{_AB_CONVERSION_EVENT}'
                          AND value > {_AB_CONVERSION_MIN_VALUE}
                     THEN 1 ELSE 0 END) AS converted
          FROM events GROUP BY user_id
        ),
        assigned AS (
          SELECT CASE WHEN
                   {_hash64_sql("CAST(user_id AS VARCHAR)", _AB_SEED)}
                   % 2 = 0 THEN 'A' ELSE 'B' END AS variant,
                 converted
          FROM per_user
        ),
        g AS (
          SELECT variant, count(*) AS n,
                 CAST(sum(converted) AS BIGINT) AS conv
          FROM assigned GROUP BY variant
        ),
        j AS (
          SELECT a.n AS n_a, a.conv AS conv_a,
                 b.n AS n_b, b.conv AS conv_b
          FROM (SELECT n, conv FROM g WHERE variant = 'A') a,
               (SELECT n, conv FROM g WHERE variant = 'B') b
        )
        SELECT n_a, conv_a, n_b, conv_b,
               round(CAST(conv_a AS DOUBLE) / n_a, 6) AS p_a,
               round(CAST(conv_b AS DOUBLE) / n_b, 6) AS p_b,
               round((CAST(conv_a AS DOUBLE) / n_a
                      - CAST(conv_b AS DOUBLE) / n_b)
                     / sqrt((CAST(conv_a + conv_b AS DOUBLE)
                             / (n_a + n_b))
                            * (1 - CAST(conv_a + conv_b AS DOUBLE)
                                   / (n_a + n_b))
                            * (1.0 / n_a + 1.0 / n_b)), 6) AS z,
               abs((CAST(conv_a AS DOUBLE) / n_a
                    - CAST(conv_b AS DOUBLE) / n_b)
                   / sqrt((CAST(conv_a + conv_b AS DOUBLE)
                           / (n_a + n_b))
                          * (1 - CAST(conv_a + conv_b AS DOUBLE)
                                 / (n_a + n_b))
                          * (1.0 / n_a + 1.0 / n_b)))
                 > {_AB_Z_CRIT} AS significant_95
        FROM j
    """,
    "contingency_stats": """
        WITH cells AS (
          SELECT o_orderstatus AS s, o_orderpriority AS p,
                 count(*) AS c
          FROM orders GROUP BY 1, 2
        ),
        row_t AS (SELECT s, sum(c) AS rs FROM cells GROUP BY s),
        col_t AS (SELECT p, sum(c) AS cs FROM cells GROUP BY p),
        tot AS (
          SELECT sum(c) AS n,
                 count(DISTINCT s) AS r_card,
                 count(DISTINCT p) AS c_card
          FROM cells
        ),
        joined AS (
          SELECT c.c, r.rs, t.cs, o.n, o.r_card, o.c_card
          FROM cells c
          JOIN row_t r USING (s) JOIN col_t t USING (p), tot o
        ),
        stats AS (
          SELECT any_value(n) AS n,
                 any_value(r_card) AS r_card,
                 any_value(c_card) AS c_card,
                 sum((c - CAST(rs AS DOUBLE) * cs / n)
                     * (c - CAST(rs AS DOUBLE) * cs / n)
                     / (CAST(rs AS DOUBLE) * cs / n)) AS chi2,
                 sum((CAST(c AS DOUBLE) / n)
                     * ln((CAST(c AS DOUBLE) / n)
                          / ((CAST(rs AS DOUBLE) / n)
                             * (CAST(cs AS DOUBLE) / n)))) AS mi
          FROM joined
        )
        SELECT CAST(n AS BIGINT) AS n_rows,
               CAST((r_card - 1) * (c_card - 1) AS BIGINT) AS dof,
               round(chi2, 4) AS chi2,
               round(mi, 6) AS mutual_info_nats,
               round(sqrt(chi2 / (n * (least(r_card, c_card) - 1))), 6)
                 AS cramers_v
        FROM stats
    """,
    "ks_test_two_sample": f"""
        WITH by_val AS (
          SELECT o_totalprice AS v,
                 sum(CASE WHEN o_orderstatus = '{_KS_GROUP_A}'
                     THEN 1 ELSE 0 END) AS ca,
                 sum(CASE WHEN o_orderstatus = '{_KS_GROUP_B}'
                     THEN 1 ELSE 0 END) AS cb
          FROM orders
          WHERE o_orderstatus IN ('{_KS_GROUP_A}', '{_KS_GROUP_B}')
          GROUP BY 1
        ),
        tots AS (
          SELECT CAST(sum(ca) AS BIGINT) AS n1,
                 CAST(sum(cb) AS BIGINT) AS n2
          FROM by_val
        ),
        swept AS (
          SELECT t.n1, t.n2,
                 abs(CAST(sum(ca) OVER (ORDER BY v
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS DOUBLE) / t.n1
                     - CAST(sum(cb) OVER (ORDER BY v
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS DOUBLE) / t.n2) AS d
          FROM by_val, tots t
        )
        SELECT n1, n2,
               round(max(d), 6) AS d_stat,
               round(max(1.358 * sqrt(CAST(n1 + n2 AS DOUBLE)
                                      / (n1 * n2))), 6) AS d_crit_95,
               max(d) > max(1.358 * sqrt(CAST(n1 + n2 AS DOUBLE)
                                         / (n1 * n2)))
                 AS reject_same_dist
        FROM swept
        GROUP BY n1, n2
    """,
}
