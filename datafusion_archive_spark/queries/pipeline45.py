"""Pipeline wave 45 (round 5, forty-third wave): monotone calibration
and causal panel estimation.

- ``isotonic_calibration`` — weighted isotonic regression of the
  urgent-order rate on price bins via the EXACT minimax
  representation ``fit_i = max_{k≤i} min_{j≥i} wmean(k..j)``: the
  closed form equal to the PAVA solution, but expressible as prefix
  sums + a (k,i,j) triple join — so BOTH engines compute it
  declaratively and the oracle is exact, where a PAVA loop would
  have forced a rows-only check. The triple join is cubic only in
  the BIN count (~50), never in fact rows; the fact scan is one
  binned aggregate. Monotonicity and the pool-adjacent-violators
  fixpoint are asserted in tests.
- ``diff_in_diff`` — the 2×2 difference-in-differences estimator on
  the events panel: treatment = users whose FIRST event is a signup
  (onboarded-first cohort — "ever signed up" degenerates because
  nearly every active user eventually signs up), periods split
  mid-month, outcome = purchase value. Reports the four cell means,
  the DiD interaction effect, and its large-sample SE √(Σ s²ᵢ/nᵢ) —
  the canonical pre/post × treat/control readout.

The reference has no joins or window functions
(``/root/reference/ROADMAP.md``).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from datafusion_archive_spark.queries.timeseries import load_events

_BIN_W = 10_000.0
_SPLIT = "2024-01-16"


def q_isotonic_calibration(spark, sf):
    """Isotonic (non-decreasing) urgent-rate vs price-bin fit."""
    orders = spark.read.parquet(f"{sf}/orders.parquet")
    bins = orders.groupBy(
        F.floor(F.col("o_totalprice") / _BIN_W).alias("bin")
    ).agg(
        F.count(F.lit(1)).alias("w"),
        F.sum(
            (F.col("o_orderpriority") == "1-URGENT").cast("long")
        ).alias("y"),
    )
    w_ord = Window.orderBy("bin").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    pre = bins.select(
        "bin",
        "w",
        "y",
        F.sum("w").over(w_ord).alias("cw"),
        F.sum("y").over(w_ord).alias("cy"),
    )
    lo = pre.select(
        F.col("bin").alias("k"),
        (F.col("cw") - F.col("w")).alias("cw_before"),
        (F.col("cy") - F.col("y")).alias("cy_before"),
    )
    hi = pre.select(
        F.col("bin").alias("j"),
        F.col("cw").alias("cw_j"),
        F.col("cy").alias("cy_j"),
    )
    spans = lo.join(F.broadcast(hi), F.col("k") <= F.col("j")).select(
        "k",
        "j",
        (
            (F.col("cy_j") - F.col("cy_before")).cast("double")
            / (F.col("cw_j") - F.col("cw_before")).cast("double")
        ).alias("wmean"),
    )
    idx = bins.select(F.col("bin").alias("i"))
    inner = (
        spans.join(
            F.broadcast(idx),
            (F.col("k") <= F.col("i")) & (F.col("i") <= F.col("j")),
        )
        .groupBy("i", "k")
        .agg(F.min("wmean").alias("mn"))
    )
    fitted = inner.groupBy("i").agg(F.max("mn").alias("fit"))
    return (
        bins.join(fitted, bins.bin == fitted.i)
        .select(
            "bin",
            F.col("w").alias("n_orders"),
            F.round(
                F.col("y").cast("double") / F.col("w").cast("double"), 6
            ).alias("raw_rate"),
            F.round("fit", 6).alias("fitted_rate"),
        )
        .orderBy("bin")
    )


def q_diff_in_diff(spark, sf):
    """2x2 DiD of purchase value: signed-up users vs not, pre/post.

    Scale: one user-keyed treatment aggregate (broadcast back — the
    treated-user id list is small relative to the event stream), one
    cell aggregate; all algebra on the 4-row cell table."""
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
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .join(F.broadcast(treated), "user_id", "left")
        .select(
            F.coalesce("treat", F.lit(0)).alias("treat"),
            (F.col("ts") >= F.lit(_SPLIT).cast("timestamp"))
            .cast("int")
            .alias("post"),
            F.col("value").alias("y"),
        )
    )
    cells = purchases.groupBy("treat", "post").agg(
        F.count(F.lit(1)).alias("n"),
        F.avg("y").alias("m"),
        F.var_samp("y").alias("s2"),
    )
    flat = cells.select(
        (F.col("treat") * 2 + F.col("post")).alias("cell"),
        "n",
        "m",
        "s2",
    )
    g = flat.agg(
        F.sum(F.when(F.col("cell") == 0, F.col("m"))).alias("c_pre"),
        F.sum(F.when(F.col("cell") == 1, F.col("m"))).alias("c_post"),
        F.sum(F.when(F.col("cell") == 2, F.col("m"))).alias("t_pre"),
        F.sum(F.when(F.col("cell") == 3, F.col("m"))).alias("t_post"),
        F.sum(F.col("s2") / F.col("n")).alias("var_did"),
        F.sum("n").alias("n_purchases"),
    )
    return g.select(
        "n_purchases",
        F.round("c_pre", 4).alias("control_pre"),
        F.round("c_post", 4).alias("control_post"),
        F.round("t_pre", 4).alias("treated_pre"),
        F.round("t_post", 4).alias("treated_post"),
        F.round(
            (F.col("t_post") - F.col("t_pre"))
            - (F.col("c_post") - F.col("c_pre")),
            4,
        ).alias("did_effect"),
        F.round(F.sqrt("var_did"), 4).alias("se_did"),
    )


QUERIES = {
    "isotonic_calibration": q_isotonic_calibration,
    "diff_in_diff": q_diff_in_diff,
}

ORACLES = {
    "isotonic_calibration": f"""
        WITH bins AS (
          SELECT CAST(floor(o_totalprice / {_BIN_W}) AS BIGINT) AS bin,
                 count(*) AS w,
                 CAST(sum(CASE WHEN o_orderpriority = '1-URGENT'
                          THEN 1 ELSE 0 END) AS BIGINT) AS y
          FROM orders GROUP BY 1
        ),
        pre AS (
          SELECT bin, w, y,
                 sum(w) OVER (ORDER BY bin
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS cw,
                 sum(y) OVER (ORDER BY bin
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS cy
          FROM bins
        ),
        spans AS (
          SELECT lo.bin AS k, hi.bin AS j,
                 CAST(hi.cy - (lo.cy - lo.y) AS DOUBLE)
                   / (hi.cw - (lo.cw - lo.w)) AS wmean
          FROM pre lo JOIN pre hi ON lo.bin <= hi.bin
        ),
        inner_min AS (
          SELECT i.bin AS i, s.k, min(s.wmean) AS mn
          FROM spans s JOIN bins i
            ON s.k <= i.bin AND i.bin <= s.j
          GROUP BY 1, 2
        ),
        fitted AS (
          SELECT i, max(mn) AS fit FROM inner_min GROUP BY 1
        )
        SELECT b.bin,
               b.w AS n_orders,
               round(CAST(b.y AS DOUBLE) / b.w, 6) AS raw_rate,
               round(f.fit, 6) AS fitted_rate
        FROM bins b JOIN fitted f ON b.bin = f.i
        ORDER BY b.bin
    """,
    "diff_in_diff": f"""
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
        purchases AS (
          SELECT CASE WHEN t.user_id IS NULL THEN 0 ELSE 1 END AS treat,
                 CASE WHEN e.ts >= TIMESTAMP '{_SPLIT} 00:00:00'
                      THEN 1 ELSE 0 END AS post,
                 e.value AS y
          FROM events e LEFT JOIN treated t ON e.user_id = t.user_id
          WHERE e.event_type = 'purchase'
        ),
        cells AS (
          SELECT treat * 2 + post AS cell,
                 count(*) AS n, avg(y) AS m, var_samp(y) AS s2
          FROM purchases GROUP BY 1
        )
        SELECT CAST(sum(n) AS BIGINT) AS n_purchases,
               round(sum(CASE WHEN cell = 0 THEN m END), 4)
                 AS control_pre,
               round(sum(CASE WHEN cell = 1 THEN m END), 4)
                 AS control_post,
               round(sum(CASE WHEN cell = 2 THEN m END), 4)
                 AS treated_pre,
               round(sum(CASE WHEN cell = 3 THEN m END), 4)
                 AS treated_post,
               round((sum(CASE WHEN cell = 3 THEN m END)
                 - sum(CASE WHEN cell = 2 THEN m END))
                 - (sum(CASE WHEN cell = 1 THEN m END)
                 - sum(CASE WHEN cell = 0 THEN m END)), 4)
                 AS did_effect,
               round(sqrt(sum(s2 / n)), 4) AS se_did
        FROM cells
    """,
}
