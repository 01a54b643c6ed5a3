"""Pipeline wave 40 (round 5, thirty-eighth wave): rank correlation —
the monotone-association complement to the already-certified Pearson
``corr_matrix``.

- ``spearman_rank_corr`` — Spearman's ρ between per-customer order
  count and total spend: Pearson correlation of tie-aware AVERAGE
  ranks (avg rank = rank() + (tie_count − 1)/2 — the fractional-rank
  convention every stats package uses). Linear work: two window
  ranks + one corr aggregate.
- ``kendall_tau_daily`` — Kendall's τ-b between daily order count
  and daily average order value, with the full tie correction
  τ_b = (P − Q) / √((n₀−n₁)(n₀−n₂)). Counted by a pairwise
  self-join over the AGGREGATED day grid (~2.4k days → ~3M pairs,
  broadcast), never over fact rows, so the cost is scale-invariant
  in SF.

The reference has no window functions or correlation aggregates
(``/root/reference/ROADMAP.md``).
"""

from __future__ import annotations

from pyspark.sql import functions as F


def _avg_ranked(df, col, out):
    """Append the fractional (average) rank of column ``col`` over the
    whole frame as ``out``: min-rank + (ties − 1)/2, the identity the
    previous ``rank() OVER (ORDER BY col)`` form evaluated. Round 8:
    the min-rank comes from the bucketed global rank (operators/ranks)
    — an unpartitioned rank window funnels the whole frame into one
    sort task — and the tie counts come from a plain groupBy joined
    back on the value (a partitionBy(col) count window would buffer
    corpus/|values| rows per task when the column is low-cardinality,
    e.g. small-integer order counts; the aggregate+join distributes
    for any cardinality and the counts are identical integers).
    ``col`` must be non-null (the per-customer rollup guarantees it;
    a null would fall out of the tie-count equi-join)."""
    from datafusion_archive_spark.operators.ranks import bucketed_group_rank
    from datafusion_archive_spark.operators.util import cached

    # cached: the customer-level rollup (and, on the second call, the
    # first rank's output) fans out into the rank's stats/histogram/
    # selection passes — the round-6 fan-out-recompute fix pattern
    df = cached(df)
    ranked = bucketed_group_rank(
        df, [], col, tiebreak=None, rank_col="_mr", n_col="_nn"
    )
    cnts = df.groupBy(col).agg(F.count(F.lit(1)).alias("_ties"))
    return (
        ranked.join(cnts, on=col)
        .withColumn(out, F.col("_mr") + (F.col("_ties") - 1) / 2.0)
        .drop("_mr", "_nn", "_ties")
    )


def q_spearman_rank_corr(spark, sf):
    """Spearman ρ(order count, total spend) per customer.

    Scale: the per-customer aggregate map-side combines; the two
    global min-ranks come from the bucketed search (operators/ranks,
    round 8) — the previous unpartitioned rank windows sorted the
    whole per-customer frame, which grows with the corpus, in one
    task each. Tie counts come from a groupBy joined back on the
    value (see _avg_ranked).

    Round 16: the two ranks run as INDEPENDENT branches off the
    cached rollup, rejoined on the customer key, instead of nesting
    the second rank over the first rank's full output lineage — the
    nested form stacked rank machinery 2 deep in one plan (263 KB
    formatted, the registry's largest) and re-ran the first rank's
    join/window tree inside every pass of the second. Measured
    same-session A/B at sf0.1: 3.91 -> 2.93 s median, identical
    output rows."""
    from datafusion_archive_spark.operators.util import cached

    per_cust = cached(
        spark.read.parquet(f"{sf}/orders.parquet")
        .groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("spend"),
        )
    )
    r1 = _avg_ranked(per_cust, "n_orders", "rx").select("o_custkey", "rx")
    r2 = _avg_ranked(per_cust, "spend", "ry").select("o_custkey", "ry")
    ranked = r1.join(r2, "o_custkey").select("rx", "ry")
    return ranked.agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.round(F.corr("rx", "ry"), 6).alias("spearman_rho"),
    )


def q_kendall_tau_daily(spark, sf):
    """Kendall τ-b between daily order count and daily mean value."""
    daily = (
        spark.read.parquet(f"{sf}/orders.parquet")
        .groupBy(F.col("o_orderdate").alias("d"))
        .agg(
            F.count(F.lit(1)).cast("double").alias("x"),
            F.round(
                F.avg(F.col("o_totalprice").cast("decimal(18,2)")), 2
            )
            .cast("double")
            .alias("y"),
        )
    )
    a = daily.alias("a")
    b = daily.alias("b")
    sgn_x = F.signum(F.col("b.x") - F.col("a.x"))
    sgn_y = F.signum(F.col("b.y") - F.col("a.y"))
    pairs = a.join(F.broadcast(b), F.col("a.d") < F.col("b.d")).select(
        (sgn_x * sgn_y).alias("prod"),
        (sgn_x == 0).cast("long").alias("tie_x"),
        (sgn_y == 0).cast("long").alias("tie_y"),
    )
    agg = pairs.agg(
        F.count(F.lit(1)).alias("n0"),
        F.sum((F.col("prod") > 0).cast("long")).alias("concordant"),
        F.sum((F.col("prod") < 0).cast("long")).alias("discordant"),
        F.sum("tie_x").alias("n1"),
        F.sum("tie_y").alias("n2"),
    )
    return agg.select(
        "concordant",
        "discordant",
        F.round(
            (F.col("concordant") - F.col("discordant"))
            / F.sqrt(
                (F.col("n0") - F.col("n1")).cast("double")
                * (F.col("n0") - F.col("n2")).cast("double")
            ),
            6,
        ).alias("tau_b"),
    )


QUERIES = {
    "spearman_rank_corr": q_spearman_rank_corr,
    "kendall_tau_daily": q_kendall_tau_daily,
}

ORACLES = {
    "spearman_rank_corr": """
        WITH per_cust AS (
          SELECT o_custkey,
                 count(*) AS n_orders,
                 CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                   AS spend
          FROM orders GROUP BY 1
        ),
        ranked AS (
          SELECT rank() OVER (ORDER BY n_orders)
                   + (count(*) OVER (PARTITION BY n_orders) - 1) / 2.0
                   AS rx,
                 rank() OVER (ORDER BY spend)
                   + (count(*) OVER (PARTITION BY spend) - 1) / 2.0
                   AS ry
          FROM per_cust
        )
        SELECT count(*) AS n_customers,
               round(corr(rx, ry), 6) AS spearman_rho
        FROM ranked
    """,
    "kendall_tau_daily": """
        WITH daily AS (
          SELECT o_orderdate AS d,
                 CAST(count(*) AS DOUBLE) AS x,
                 CAST(round(avg(CAST(o_totalprice AS DECIMAL(18,2))), 2)
                      AS DOUBLE) AS y
          FROM orders GROUP BY 1
        ),
        pairs AS (
          SELECT sign(b.x - a.x) * sign(b.y - a.y) AS prod,
                 CASE WHEN b.x = a.x THEN 1 ELSE 0 END AS tie_x,
                 CASE WHEN b.y = a.y THEN 1 ELSE 0 END AS tie_y
          FROM daily a JOIN daily b ON a.d < b.d
        ),
        agg AS (
          SELECT count(*) AS n0,
                 CAST(sum(CASE WHEN prod > 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS concordant,
                 CAST(sum(CASE WHEN prod < 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS discordant,
                 CAST(sum(tie_x) AS BIGINT) AS n1,
                 CAST(sum(tie_y) AS BIGINT) AS n2
          FROM pairs
        )
        SELECT concordant, discordant,
               round((concordant - discordant)
                 / sqrt(CAST(n0 - n1 AS DOUBLE)
                        * CAST(n0 - n2 AS DOUBLE)), 6) AS tau_b
        FROM agg
    """,
}
