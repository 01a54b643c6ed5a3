"""Pipeline wave 27 (round 5, twenty-fifth wave): sequential testing
and customer-movement analytics.

- ``sprt_ab_sequential`` — Wald's Sequential Probability Ratio Test
  over the purchase-vs-click trial stream: cumulative log-likelihood
  ratio for H1 (p = 0.55) against H0 (p = 0.45), with the first
  boundary crossing (±ln 19 for α = β = 0.05) and the decision. The
  always-valid sequential counterpart of the fixed-horizon
  ``ab_test_ztest``.
- ``decile_migration_matrix`` — customer spend-decile transitions
  between the early (≤ 1997) and late (≥ 1998) periods: the churn /
  upgrade migration grid, both periods bucketed by the broadcast-
  cutpoint fold fitted ON THEIR OWN period.
- ``monthly_new_vs_returning`` — per order month, order counts and
  revenue split into first-ever-order customers vs returning: the
  acquisition-vs-retention decomposition every growth report leads
  with.

The reference has none of: windows, joins, log-likelihoods
(``/root/reference/ROADMAP.md``).
"""

from __future__ import annotations

import math

from pyspark.sql import Window
from pyspark.sql import functions as F

from datafusion_archive_spark.functions.rounding import (
    decimal_sum,
    decimal_sum_sql,
)
from datafusion_archive_spark.queries.timeseries import load_events
from datafusion_archive_spark.operators.util import cached, load_table


def _t(spark, sf_dir, name):
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# SPRT
# ---------------------------------------------------------------------------

_SPRT_P0, _SPRT_P1 = 0.45, 0.55
_SPRT_A = math.log(19.0)  # alpha = beta = 0.05 boundaries: ±ln 19


def q_sprt_ab_sequential(spark, sf):
    """Wald SPRT over the time-ordered click/purchase trial stream
    (success = purchase), run PER EXPERIMENT ARM (arm = user_id
    parity, the stand-in for a real assignment column): within each
    arm, LLR_t = Σ log-likelihood increments; the first index where
    LLR exits ±ln 19 decides. One row per arm: n_trials, final LLR,
    crossing index (NULL if never), decision.

    Scale: an arm column has as many values as the experiment has
    arms (TWO here), so the round-5 partitioned windows still sorted
    half the event stream per task. Since round 8 the trial index and
    the cumulative SUCCESS COUNT come from
    :func:`operators.ranks.bucketed_group_rank` (running sums are
    exact for integer columns — addition regroups freely), and
    LLR_i = successes_i·inc_s + failures_i·inc_f reconstructs the
    path as a scan expression: the increments are two CONSTANTS, so
    the cumsum is a linear function of the integer counts. The
    crossing test is ulp-robust by construction — LLR takes values
    (k·inc) whose nearest approach to ±ln 19 is ~0.066, many orders
    above float error — and final_llr keeps the order-free aggregate
    sum it always used."""
    e = load_events(spark, sf).filter(
        F.col("event_type").isin("click", "purchase")
    )
    inc_s = math.log(_SPRT_P1 / _SPRT_P0)
    inc_f = math.log((1 - _SPRT_P1) / (1 - _SPRT_P0))
    from datafusion_archive_spark.operators.ranks import bucketed_group_rank

    base = e.select(
        F.when(F.col("user_id") % 2 == 0, F.lit("A"))
        .otherwise(F.lit("B"))
        .alias("arm"),
        F.col("ts"),
        F.col("event_id"),
        F.when(F.col("event_type") == "purchase", F.lit(1))
        .otherwise(F.lit(0))
        .cast("int")
        .alias("is_s"),
    )
    ranked = bucketed_group_rank(
        base,
        ["arm"],
        "ts",
        tiebreak=["event_id"],
        rank_col="i",
        running=[("is_s", "cs")],
    )
    cum = ranked.select(
        "arm",
        "i",
        F.when(F.col("is_s") == 1, F.lit(inc_s))
        .otherwise(F.lit(inc_f))
        .alias("inc"),
        (
            F.col("cs") * F.lit(inc_s)
            + (F.col("i") - F.col("cs")) * F.lit(inc_f)
        ).alias("llr"),
    )
    agg = cum.groupBy("arm").agg(
        F.count(F.lit(1)).alias("n_trials"),
        F.round(F.sum("inc"), 6).alias("final_llr"),
        F.min(
            F.when(F.abs(F.col("llr")) >= _SPRT_A, F.col("i"))
        ).alias("crossing_i"),
        F.min(
            F.when(F.col("llr") >= _SPRT_A, F.col("i"))
        ).alias("_up_i"),
        F.min(
            F.when(F.col("llr") <= -_SPRT_A, F.col("i"))
        ).alias("_dn_i"),
    )
    decision = (
        F.when(F.col("crossing_i").isNull(), "continue")
        .when(
            F.coalesce(F.col("_up_i"), F.lit(2**62))
            < F.coalesce(F.col("_dn_i"), F.lit(2**62)),
            "accept_h1",
        )
        .otherwise("accept_h0")
    )
    return agg.select(
        "arm",
        "n_trials",
        "final_llr",
        "crossing_i",
        decision.alias("decision"),
    )


# ---------------------------------------------------------------------------
# Decile migration matrix
# ---------------------------------------------------------------------------

_MIG_SPLIT = "1998-01-01"
_MIG_PCTS = [round(0.1 * i, 1) for i in range(1, 10)]


def q_decile_migration_matrix(spark, sf):
    """Customer spend-decile transition counts from the early period
    (orders before 1998) to the late period: cell (d_early, d_late) =
    customers in early decile d_early who land in late decile d_late;
    customers active in only one period appear with the other decile
    NULL. Each period's deciles are fitted on its own distribution.

    Scale: two customer-level rollups share the o_custkey Exchange;
    cutpoints come from the histogram-pruned exact quantile search
    (operators/quantiles.py) rather than the ``percentile`` aggregate,
    whose final merge would funnel every customer's spend into ONE
    task's buffer at 10^8+ customers; the 9 cut values are then plain
    literals in the bucketing fold. The matrix is ≤ 11×11 cells."""
    from datafusion_archive_spark.operators.quantiles import (
        exact_quantiles_cont,
    )

    o = _t(spark, sf, "orders").select(
        "o_custkey",
        "o_totalprice",
        (F.to_date("o_orderdate") < F.lit(_MIG_SPLIT).cast("date")).alias(
            "early"
        ),
    )

    def deciled(df, label):
        spend = cached(
            df.groupBy("o_custkey").agg(
                decimal_sum(F.col("o_totalprice")).cast("double").alias("x")
            )
        )
        cuts = exact_quantiles_cont(spend, "x", _MIG_PCTS)
        bs = F.array(*[F.lit(c) for c in cuts])
        return spend.select(
            "o_custkey",
            F.aggregate(
                bs,
                F.lit(0),
                lambda acc, b: acc
                + F.when(F.col("x") > b, 1).otherwise(0),
            ).alias(label),
        )

    early = deciled(o.filter("early"), "d_early")
    late = deciled(o.filter("NOT early"), "d_late")
    return (
        early.join(late, "o_custkey", "full_outer")
        .groupBy("d_early", "d_late")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


# ---------------------------------------------------------------------------
# New vs returning
# ---------------------------------------------------------------------------


def q_monthly_new_vs_returning(spark, sf):
    """Per order month: orders and revenue split into first-ever
    orders (acquisition) vs returning customers. A customer's
    earliest order date marks exactly their first order as 'new'
    (earliest-date ties all count as first orders).

    Scale: the first-order date is one o_custkey rollup joined back
    on the same key (AQE reuses the Exchange); the month grid rollup
    is tiny."""
    o = _t(spark, sf, "orders").select(
        "o_custkey", F.to_date("o_orderdate").alias("d"), "o_totalprice"
    )
    first = o.groupBy("o_custkey").agg(F.min("d").alias("d0"))
    flagged = o.join(first, "o_custkey").withColumn(
        "is_new", (F.col("d") == F.col("d0")).cast("int")
    )
    return flagged.groupBy(
        F.date_format("d", "yyyy-MM").alias("month")
    ).agg(
        F.sum("is_new").alias("n_new_orders"),
        F.sum(1 - F.col("is_new")).alias("n_returning_orders"),
        F.round(
            decimal_sum(
                F.when(F.col("is_new") == 1, F.col("o_totalprice")).otherwise(
                    0.0
                )
            ).cast("double"),
            2,
        ).alias("new_revenue"),
        F.round(
            decimal_sum(
                F.when(F.col("is_new") == 0, F.col("o_totalprice")).otherwise(
                    0.0
                )
            ).cast("double"),
            2,
        ).alias("returning_revenue"),
    )


QUERIES = {
    "sprt_ab_sequential": q_sprt_ab_sequential,
    "decile_migration_matrix": q_decile_migration_matrix,
    "monthly_new_vs_returning": q_monthly_new_vs_returning,
}

ORACLES = {
    "sprt_ab_sequential": f"""
        WITH trials AS (
          SELECT CASE WHEN user_id % 2 = 0 THEN 'A' ELSE 'B' END AS arm,
                 row_number() OVER (
                   PARTITION BY CASE WHEN user_id % 2 = 0
                                     THEN 'A' ELSE 'B' END
                   ORDER BY ts, event_id) AS i,
                 CASE WHEN event_type = 'purchase'
                      THEN ln({_SPRT_P1} / {_SPRT_P0})
                      ELSE ln({1 - _SPRT_P1} / {1 - _SPRT_P0}) END AS inc
          FROM events WHERE event_type IN ('click', 'purchase')
        ),
        cum AS (
          SELECT arm, i, inc,
                 sum(inc) OVER (PARTITION BY arm ORDER BY i
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS llr
          FROM trials
        ),
        agg AS (
          SELECT arm,
                 count(*) AS n_trials,
                 round(sum(inc), 6) AS final_llr,
                 min(CASE WHEN abs(llr) >= ln(19.0) THEN i END)
                   AS crossing_i,
                 min(CASE WHEN llr >= ln(19.0) THEN i END) AS up_i,
                 min(CASE WHEN llr <= -ln(19.0) THEN i END) AS dn_i
          FROM cum GROUP BY arm
        )
        SELECT arm, n_trials, final_llr,
               CAST(crossing_i AS BIGINT) AS crossing_i,
               CASE WHEN crossing_i IS NULL THEN 'continue'
                    WHEN coalesce(up_i, 4611686018427387904)
                         < coalesce(dn_i, 4611686018427387904)
                    THEN 'accept_h1' ELSE 'accept_h0' END AS decision
        FROM agg
    """,
    "decile_migration_matrix": f"""
        WITH o AS (
          SELECT o_custkey, o_totalprice,
                 CAST(o_orderdate AS DATE) < DATE '{_MIG_SPLIT}' AS early
          FROM orders
        ),
        se AS (
          SELECT o_custkey,
                 CAST({decimal_sum_sql("o_totalprice")} AS DOUBLE) AS x
          FROM o WHERE early GROUP BY 1
        ),
        sl AS (
          SELECT o_custkey,
                 CAST({decimal_sum_sql("o_totalprice")} AS DOUBLE) AS x
          FROM o WHERE NOT early GROUP BY 1
        ),
        ce AS (SELECT quantile_cont(x,
                 [{", ".join(str(p) for p in _MIG_PCTS)}]) AS bs FROM se),
        cl AS (SELECT quantile_cont(x,
                 [{", ".join(str(p) for p in _MIG_PCTS)}]) AS bs FROM sl),
        de AS (
          SELECT o_custkey,
                 CAST(list_sum(list_transform(ce.bs,
                   b -> CASE WHEN se.x > b THEN 1 ELSE 0 END))
                 AS INTEGER) AS d_early
          FROM se CROSS JOIN ce
        ),
        dl AS (
          SELECT o_custkey,
                 CAST(list_sum(list_transform(cl.bs,
                   b -> CASE WHEN sl.x > b THEN 1 ELSE 0 END))
                 AS INTEGER) AS d_late
          FROM sl CROSS JOIN cl
        )
        SELECT d_early, d_late, count(*) AS n_customers
        FROM de FULL OUTER JOIN dl USING (o_custkey)
        GROUP BY 1, 2
    """,
    "monthly_new_vs_returning": f"""
        WITH o AS (
          SELECT o_custkey, CAST(o_orderdate AS DATE) AS d, o_totalprice
          FROM orders
        ),
        first AS (
          SELECT o_custkey, min(d) AS d0 FROM o GROUP BY 1
        ),
        flagged AS (
          SELECT o.d, o.o_totalprice,
                 CASE WHEN o.d = f.d0 THEN 1 ELSE 0 END AS is_new
          FROM o JOIN first f USING (o_custkey)
        )
        SELECT strftime(d, '%Y-%m') AS month,
               CAST(sum(is_new) AS BIGINT) AS n_new_orders,
               CAST(sum(1 - is_new) AS BIGINT) AS n_returning_orders,
               round(CAST(sum(CASE WHEN is_new = 1
                   THEN CAST(o_totalprice AS DECIMAL(27,6))
                   ELSE CAST(0 AS DECIMAL(27,6)) END) AS DOUBLE), 2)
                 AS new_revenue,
               round(CAST(sum(CASE WHEN is_new = 0
                   THEN CAST(o_totalprice AS DECIMAL(27,6))
                   ELSE CAST(0 AS DECIMAL(27,6)) END) AS DOUBLE), 2)
                 AS returning_revenue
        FROM flagged GROUP BY 1
    """,
}
