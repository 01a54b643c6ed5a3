"""Pipeline wave 41 (round 5, thirty-ninth wave): delete-one-block
jackknife and row-pattern recognition.

- ``jackknife_ratio_se`` — the delete-one-block jackknife standard
  error of the nonlinear ratio statistic R = Σrevenue / Σquantity,
  blocked by order date. The leave-one-out replicates come from the
  SUM-MINUS-ELEMENT identity (R₍d₎ = (S−s_d)/(T−t_d) with the grand
  totals as window constants) — n replicates in ONE pass, where the
  naive formulation re-aggregates the table n times. This is how
  resampling variance gets done at 100 TB: the fact scan happens
  once, the n leave-one-out worlds are algebra.
- ``pattern_rise_drop`` — a MATCH_RECOGNIZE analog
  (``A↑ A↑ A↑ … B↓``): runs of ≥ _RISE_MIN strictly-rising daily
  revenue immediately followed by a > _DROP_PCT fall. Streaks are
  identified by the classic gaps-and-islands trick (run id = running
  count of non-rising days), then each island's tail is tested
  against the next day's change — all lag/partition windows, no
  joins.

The reference has no window functions (``/root/reference/ROADMAP.md``).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F


_RISE_MIN = 3  # rising steps required before the drop
_DROP_PCT = 0.05


def q_jackknife_ratio_se(spark, sf):
    """Jackknife SE of revenue-per-unit, blocked by day."""
    blocks = (
        spark.read.parquet(f"{sf}/lineitem.parquet")
        .groupBy(F.col("l_shipdate").alias("d"))
        .agg(
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("rev"),
            F.sum(F.col("l_quantity").cast("decimal(18,2)"))
            .cast("double")
            .alias("qty"),
        )
    )
    w_all = Window.partitionBy()
    repl = blocks.select(
        F.count(F.lit(1)).over(w_all).alias("n"),
        F.sum("rev").over(w_all).alias("srev"),
        F.sum("qty").over(w_all).alias("sqty"),
        (
            (F.sum("rev").over(w_all) - F.col("rev"))
            / (F.sum("qty").over(w_all) - F.col("qty"))
        ).alias("r_loo"),
    ).withColumn("mean_loo", F.avg("r_loo").over(w_all))
    return repl.agg(
        F.first("n").alias("n_blocks"),
        F.round(F.first("srev") / F.first("sqty"), 6).alias("ratio_full"),
        F.round(
            F.sqrt(
                (F.first("n") - 1).cast("double")
                / F.first("n").cast("double")
                * F.sum(
                    F.pow(F.col("r_loo") - F.col("mean_loo"), F.lit(2.0))
                )
            ),
            8,
        ).alias("se_jack"),
    )


def q_pattern_rise_drop(spark, sf):
    """Rising streaks >= _RISE_MIN steps ended by a >_DROP_PCT fall."""
    daily = (
        spark.read.parquet(f"{sf}/orders.parquet")
        .groupBy(F.col("o_orderdate").alias("d"))
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("rev")
        )
    )
    w = Window.orderBy("d")
    flagged = daily.select(
        "d",
        "rev",
        (F.col("rev") > F.lag("rev").over(w)).alias("rising"),
        (F.lead("rev").over(w) / F.col("rev") - 1.0).alias("next_chg"),
    )
    runs = flagged.select(
        "d",
        "rev",
        "rising",
        "next_chg",
        F.sum(
            F.when(F.col("rising") & F.col("rising").isNotNull(), 0)
            .otherwise(1)
        )
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .alias("run_id"),
    )
    tails = runs.select(
        "d",
        "rev",
        "next_chg",
        "run_id",
        F.row_number()
        .over(
            Window.partitionBy("run_id").orderBy(F.desc("d"))
        )
        .alias("rn_desc"),
        F.count(F.lit(1))
        .over(
            Window.partitionBy("run_id").rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        )
        .alias("run_len"),
        F.min("d").over(
            Window.partitionBy("run_id").rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("start_d"),
    )
    return (
        tails.filter(
            (F.col("rn_desc") == 1)
            & (F.col("run_len") >= _RISE_MIN + 1)
            & (F.col("next_chg") < -_DROP_PCT)
        )
        .select(
            F.col("start_d").alias("start_date"),
            F.col("d").alias("peak_date"),
            (F.col("run_len") - 1).alias("rise_steps"),
            F.round("rev", 2).alias("peak_rev"),
            F.round(F.col("next_chg") * 100.0, 4).alias("drop_pct"),
        )
        .orderBy("peak_date")
    )


QUERIES = {
    "jackknife_ratio_se": q_jackknife_ratio_se,
    "pattern_rise_drop": q_pattern_rise_drop,
}

ORACLES = {
    "jackknife_ratio_se": """
        WITH blocks AS (
          SELECT l_shipdate AS d,
                 CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)))
                      AS DOUBLE) AS rev,
                 CAST(sum(CAST(l_quantity AS DECIMAL(18,2)))
                      AS DOUBLE) AS qty
          FROM lineitem GROUP BY 1
        ),
        repl AS (
          SELECT count(*) OVER () AS n,
                 sum(rev) OVER () AS srev,
                 sum(qty) OVER () AS sqty,
                 (sum(rev) OVER () - rev) / (sum(qty) OVER () - qty)
                   AS r_loo
          FROM blocks
        )
        SELECT CAST(max(n) AS BIGINT) AS n_blocks,
               round(max(srev) / max(sqty), 6) AS ratio_full,
               round(sqrt((max(n) - 1.0) / max(n)
                 * sum((r_loo - (SELECT avg(r_loo) FROM repl)) ** 2)), 8)
                 AS se_jack
        FROM repl
    """,
    "pattern_rise_drop": f"""
        WITH daily AS (
          SELECT o_orderdate AS d,
                 CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                   AS rev
          FROM orders GROUP BY 1
        ),
        flagged AS (
          SELECT d, rev,
                 rev > lag(rev) OVER (ORDER BY d) AS rising,
                 lead(rev) OVER (ORDER BY d) / rev - 1.0 AS next_chg
          FROM daily
        ),
        runs AS (
          SELECT *,
                 sum(CASE WHEN rising THEN 0 ELSE 1 END)
                   OVER (ORDER BY d
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS run_id
          FROM flagged
        ),
        tails AS (
          SELECT d, rev, next_chg, run_id,
                 row_number() OVER (PARTITION BY run_id ORDER BY d DESC)
                   AS rn_desc,
                 count(*) OVER (PARTITION BY run_id) AS run_len,
                 min(d) OVER (PARTITION BY run_id) AS start_d
          FROM runs
        )
        SELECT start_d AS start_date,
               d AS peak_date,
               CAST(run_len - 1 AS BIGINT) AS rise_steps,
               round(rev, 2) AS peak_rev,
               round(next_chg * 100.0, 4) AS drop_pct
        FROM tails
        WHERE rn_desc = 1
          AND run_len >= {_RISE_MIN} + 1
          AND next_chg < -{_DROP_PCT}
        ORDER BY peak_date
    """,
}
