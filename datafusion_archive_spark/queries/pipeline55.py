"""Pipeline wave 55 (round 5, fifty-third wave): matching estimators
and survey calibration.

- ``cem_stratified_ate`` — coarsened exact matching: stratify users
  by the (capped) pre-period view count, PRUNE strata that lack
  either arm (the defining CEM step — off-support units never enter
  the estimate), then the ATT as the treated-count-weighted mean of
  within-stratum treated-minus-control gaps in post-period purchase
  value. The matching-based complement of ``diff_in_diff``
  (model-free, support-respecting).
- ``raking_ipf`` — survey raking / iterative proportional fitting on
  the nation × order-priority count table: _IPF_SWEEPS full
  row-then-column sweeps toward customer-share row margins and
  uniform column margins, as 2·_IPF_SWEEPS chained window-normalize
  steps — NO driver loop, the whole fit is one declarative plan on
  the 125-cell table (margins are window sums, so the same plan
  rakes a million-cell table). Reports per-priority achieved vs
  target share and the worst row-margin error.

The reference has no window functions (``/root/reference/ROADMAP.md``).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from datafusion_archive_spark.queries.timeseries import load_events

_SPLIT = "2024-01-16"
_CEM_CAP = 4
_IPF_SWEEPS = 3


def q_cem_stratified_ate(spark, sf):
    """CEM ATT of post purchase value on signup-first treatment."""
    ev = load_events(spark, sf)
    w_first = Window.partitionBy("user_id").orderBy("ts", "event_id")
    treated = (
        ev.select(
            "user_id",
            "event_type",
            F.row_number().over(w_first).alias("rn"),
        )
        .filter((F.col("rn") == 1) & (F.col("event_type") == "signup"))
        .select("user_id")
        .withColumn("treat", F.lit(1))
    )
    split = F.lit(_SPLIT).cast("timestamp")
    per_user = ev.groupBy("user_id").agg(
        F.least(
            F.sum(
                (
                    (F.col("event_type") == "view")
                    & (F.col("ts") < split)
                ).cast("long")
            ),
            F.lit(_CEM_CAP),
        ).alias("stratum"),
        F.sum(
            F.when(
                (F.col("event_type") == "purchase")
                & (F.col("ts") >= split),
                F.col("value"),
            ).otherwise(0.0)
        ).alias("y_post"),
    )
    tagged = per_user.join(F.broadcast(treated), "user_id", "left").select(
        "stratum",
        "y_post",
        F.coalesce("treat", F.lit(0)).alias("treat"),
    )
    cells = tagged.groupBy("stratum", "treat").agg(
        F.count(F.lit(1)).alias("n"), F.avg("y_post").alias("m")
    )
    t = cells.filter(F.col("treat") == 1).select(
        "stratum", F.col("n").alias("nt"), F.col("m").alias("mt")
    )
    c = cells.filter(F.col("treat") == 0).select(
        "stratum", F.col("n").alias("nc"), F.col("m").alias("mc")
    )
    matched = t.join(c, "stratum")  # CEM prune: both arms present
    return matched.agg(
        F.count(F.lit(1)).alias("n_strata_used"),
        F.sum("nt").alias("n_matched_treated"),
        F.sum("nc").alias("n_matched_control"),
        F.round(
            F.sum((F.col("mt") - F.col("mc")) * F.col("nt"))
            / F.sum("nt"),
            4,
        ).alias("att"),
    )


def q_raking_ipf(spark, sf):
    """3-sweep IPF toward customer-share rows, uniform columns."""
    orders = spark.read.parquet(f"{sf}/orders.parquet")
    cust = spark.read.parquet(f"{sf}/customer.parquet")
    cells = (
        orders.join(
            cust.select("c_custkey", "c_nationkey"),
            orders.o_custkey == cust.c_custkey,
        )
        .groupBy(
            F.col("c_nationkey").alias("i"),
            F.col("o_orderpriority").alias("j"),
        )
        .agg(F.count(F.lit(1)).cast("double").alias("w"))
    )
    w_all = Window.partitionBy()
    # target margins scaled to the table total
    cust_share = (
        cust.groupBy(F.col("c_nationkey").alias("i"))
        .agg(F.count(F.lit(1)).alias("nc"))
        .select(
            "i",
            (
                F.col("nc")
                / F.sum("nc").over(w_all).cast("double")
            ).alias("row_share"),
        )
    )
    cur = cells.join(F.broadcast(cust_share), "i").withColumn(
        "total", F.sum("w").over(w_all)
    )
    w_i = Window.partitionBy("i")
    w_j = Window.partitionBy("j")
    for _ in range(_IPF_SWEEPS):
        cur = cur.withColumn(
            "w",
            F.col("w")
            * (F.col("row_share") * F.col("total"))
            / F.sum("w").over(w_i),
        )
        cur = cur.withColumn(
            "w",
            F.col("w")
            * (F.col("total") / 5.0)
            / F.sum("w").over(w_j),
        )
    final = cur.withColumn(
        "row_err",
        F.abs(
            F.sum("w").over(w_i)
            / (F.col("row_share") * F.col("total"))
            - 1.0
        ),
    )
    return (
        final.groupBy("j")
        .agg(
            F.round(
                F.sum("w") / F.first("total"), 6
            ).alias("achieved_share"),
            F.round(F.max("row_err"), 6).alias("max_row_err"),
        )
        .select(
            F.col("j").alias("priority"),
            F.lit(0.2).alias("target_share"),
            "achieved_share",
            "max_row_err",
        )
        .orderBy("priority")
    )


QUERIES = {
    "cem_stratified_ate": q_cem_stratified_ate,
    "raking_ipf": q_raking_ipf,
}


def _ipf_oracle() -> str:
    steps = []
    prev = "w0"
    k = 0
    for _ in range(_IPF_SWEEPS):
        k += 1
        steps.append(
            f"""
        r{k} AS MATERIALIZED (
          SELECT i, j, row_share, total,
                 w * (row_share * total)
                   / sum(w) OVER (PARTITION BY i) AS w
          FROM {prev}
        )"""
        )
        prev = f"r{k}"
        k += 1
        steps.append(
            f"""
        r{k} AS MATERIALIZED (
          SELECT i, j, row_share, total,
                 w * (total / 5.0)
                   / sum(w) OVER (PARTITION BY j) AS w
          FROM {prev}
        )"""
        )
        prev = f"r{k}"
    return f"""
        WITH cells AS (
          SELECT c.c_nationkey AS i, o.o_orderpriority AS j,
                 CAST(count(*) AS DOUBLE) AS w
          FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
          GROUP BY 1, 2
        ),
        shares AS (
          SELECT c_nationkey AS i,
                 CAST(count(*) AS DOUBLE)
                   / (SELECT count(*) FROM customer) AS row_share
          FROM customer GROUP BY 1
        ),
        w0 AS MATERIALIZED (
          SELECT c.i, c.j, s.row_share,
                 (SELECT sum(w) FROM cells) AS total, c.w
          FROM cells c JOIN shares s ON c.i = s.i
        ),{",".join(steps)},
        final AS (
          SELECT *,
                 abs(sum(w) OVER (PARTITION BY i)
                   / (row_share * total) - 1.0) AS row_err
          FROM {prev}
        )
        SELECT j AS priority,
               0.2 AS target_share,
               round(sum(w) / max(total), 6) AS achieved_share,
               round(max(row_err), 6) AS max_row_err
        FROM final
        GROUP BY j
        ORDER BY priority
    """


ORACLES = {
    "cem_stratified_ate": f"""
        WITH firsts AS (
          SELECT user_id, event_type,
                 row_number() OVER (PARTITION BY user_id
                   ORDER BY ts, event_id) AS rn
          FROM events
        ),
        treated AS (
          SELECT user_id FROM firsts
          WHERE rn = 1 AND event_type = 'signup'
        ),
        per_user AS (
          SELECT user_id,
                 LEAST(sum(CASE WHEN event_type = 'view'
                       AND ts < TIMESTAMP '{_SPLIT} 00:00:00'
                       THEN 1 ELSE 0 END), {_CEM_CAP}) AS stratum,
                 sum(CASE WHEN event_type = 'purchase'
                     AND ts >= TIMESTAMP '{_SPLIT} 00:00:00'
                     THEN value ELSE 0.0 END) AS y_post
          FROM events GROUP BY 1
        ),
        tagged AS (
          SELECT u.stratum, u.y_post,
                 CASE WHEN t.user_id IS NULL THEN 0 ELSE 1 END AS treat
          FROM per_user u LEFT JOIN treated t ON u.user_id = t.user_id
        ),
        cells AS (
          SELECT stratum, treat, count(*) AS n, avg(y_post) AS m
          FROM tagged GROUP BY 1, 2
        )
        SELECT count(*) AS n_strata_used,
               CAST(sum(t.n) AS BIGINT) AS n_matched_treated,
               CAST(sum(c.n) AS BIGINT) AS n_matched_control,
               round(sum((t.m - c.m) * t.n) / sum(t.n), 4) AS att
        FROM cells t JOIN cells c
          ON t.stratum = c.stratum AND t.treat = 1 AND c.treat = 0
    """,
    "raking_ipf": _ipf_oracle(),
}
