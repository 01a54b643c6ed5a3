"""Pipeline wave 39 (round 5, thirty-seventh wave): robust trend and
nonparametric changepoint detection on the daily revenue series.

- ``theil_sen_slope`` — the Theil–Sen estimator: the median of all
  pairwise slopes between daily revenue points, plus the matching
  median intercept. Robust to ~29% outliers where OLS (already
  certified in ``regression_aggs``) is robust to none. The pairwise
  self-join is quadratic in the number of AGGREGATED daily points
  (~2.4k days → ~3M pairs), never in fact rows — at 100 TB the day
  grid is identical, so the cost is scale-invariant.
- ``pettitt_changepoint`` — the Pettitt test located in
  O(n log n): U_t = Σ_{i≤t} Σ_{j>t} sgn(x_i − x_j) is usually coded
  as the quadratic double sum, but its per-day increment is
  Δ_t = rank_asc(x_t) − rank_desc(x_t) (count-less minus
  count-greater), so U_t is just a running sum of a window-rank
  expression — two sorts instead of n²/2 comparisons, which is the
  difference between feasible and not at a 100k-point series.
  Output: K = max|U_t|, the change date (earliest argmax), and the
  standard approximate p-value 2·exp(−6K²/(n³+n²)).

The reference has no window functions or joins
(``/root/reference/ROADMAP.md``).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from datafusion_archive_spark.operators.util import cached


def _daily_revenue(spark, sf):
    return (
        spark.read.parquet(f"{sf}/orders.parquet")
        .groupBy(F.col("o_orderdate").alias("d"))
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("rev")
        )
    )


def q_theil_sen_slope(spark, sf):
    """Median-of-pairwise-slopes trend, dollars per day.

    Scale: one map-side-combined aggregate to the day grid, then an
    n_days² self-join (broadcast — the day grid is tiny). The median
    of the ~n²/2 slopes uses the distributed histogram-pruned exact
    selection (operators/quantiles.py) instead of the ``percentile``
    aggregate, whose final merge funnels every slope into ONE task's
    buffer (measured 9.4 s for 2.9M doubles — the single-task
    bottleneck a 100 TB day grid would hit hard). The driver-side
    part of the search is B bucket counts per round, not data. The
    intercept's residual median runs over n_days rows — tiny — so the
    plain percentile is right there."""
    from datafusion_archive_spark.operators.quantiles import exact_median

    # cached: the day grid feeds both sides of the pair join and the
    # residual pass; the slope table is scanned once per search round
    daily = cached(
        _daily_revenue(spark, sf).select(
            F.datediff(F.col("d"), F.lit("1992-01-01")).alias("x"),
            F.col("rev").alias("y"),
        )
    )
    a = daily.alias("a")
    b = daily.alias("b")
    slopes = cached(
        a.join(F.broadcast(b), F.col("a.x") < F.col("b.x")).select(
            (
                (F.col("b.y") - F.col("a.y"))
                / (F.col("b.x") - F.col("a.x")).cast("double")
            ).alias("slope")
        )
    )
    n_pairs = slopes.count()
    med = exact_median(slopes, "slope")
    resid = daily.select(
        (F.col("y") - F.lit(med) * F.col("x")).alias("r"),
    )
    return resid.groupBy().agg(
        F.count(F.lit(1)).alias("n_days"),
        F.lit(n_pairs).alias("n_pairs"),
        F.round(F.lit(med), 6).alias("theil_sen_slope"),
        F.round(F.percentile("r", F.lit(0.5)), 4).alias("intercept"),
    )


def q_pettitt_changepoint(spark, sf):
    """Pettitt changepoint via the rank-increment identity.

    Scale: two window sorts over the day grid (value rank asc/desc)
    plus one date-ordered running sum — no pairwise join exists in
    the plan at any scale."""
    daily = _daily_revenue(spark, sf)
    w_asc = Window.orderBy(F.col("rev").asc(), F.col("d").asc())
    w_desc = Window.orderBy(F.col("rev").desc(), F.col("d").asc())
    # rank() = 1 + count(strictly before); with value ties broken the
    # same way in both directions the tie contributions cancel in the
    # subtraction, matching sgn()'s 0-on-equal
    ranked = daily.select(
        "d",
        (F.rank().over(w_asc) - F.rank().over(w_desc)).alias("delta"),
    )
    w_run = Window.orderBy("d").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_all = Window.partitionBy()
    u = ranked.select(
        "d",
        F.sum("delta").over(w_run).alias("u_t"),
        F.count(F.lit(1)).over(w_all).alias("n"),
        F.row_number().over(Window.orderBy("d")).alias("t"),
    ).filter(F.col("t") < F.col("n"))
    best = u.select(
        "d",
        "u_t",
        "n",
        F.row_number()
        .over(Window.orderBy(F.abs(F.col("u_t")).desc(), F.col("d").asc()))
        .alias("rk"),
    ).filter(F.col("rk") == 1)
    return best.select(
        F.col("n").alias("n_days"),
        F.abs(F.col("u_t")).alias("k_stat"),
        F.col("d").alias("change_date"),
        F.round(
            F.lit(2.0)
            * F.exp(
                F.lit(-6.0)
                * F.pow(F.abs(F.col("u_t")).cast("double"), F.lit(2.0))
                / (
                    F.pow(F.col("n").cast("double"), F.lit(3.0))
                    + F.pow(F.col("n").cast("double"), F.lit(2.0))
                )
            ),
            8,
        ).alias("p_approx"),
    )


QUERIES = {
    "theil_sen_slope": q_theil_sen_slope,
    "pettitt_changepoint": q_pettitt_changepoint,
}

_DAILY = """
          SELECT o_orderdate AS d,
                 CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                   AS rev
          FROM orders GROUP BY 1
"""

ORACLES = {
    "theil_sen_slope": f"""
        WITH daily AS ({_DAILY}),
        pts AS (
          SELECT datediff('day', DATE '1992-01-01', d) AS x, rev AS y
          FROM daily
        ),
        slopes AS (
          SELECT (b.y - a.y) / CAST(b.x - a.x AS DOUBLE) AS slope
          FROM pts a JOIN pts b ON a.x < b.x
        ),
        m AS (
          SELECT quantile_cont(slope, 0.5) AS slope,
                 count(*) AS n_pairs
          FROM slopes
        )
        SELECT count(*) AS n_days,
               CAST(max(m.n_pairs) AS BIGINT) AS n_pairs,
               round(max(m.slope), 6) AS theil_sen_slope,
               round(quantile_cont(p.y - m.slope * p.x, 0.5), 4)
                 AS intercept
        FROM pts p CROSS JOIN m
    """,
    "pettitt_changepoint": f"""
        WITH daily AS ({_DAILY}),
        ranked AS (
          SELECT d,
                 rank() OVER (ORDER BY rev ASC, d ASC)
                 - rank() OVER (ORDER BY rev DESC, d ASC) AS delta
          FROM daily
        ),
        u AS (
          SELECT d,
                 sum(delta) OVER (ORDER BY d
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS u_t,
                 count(*) OVER () AS n,
                 row_number() OVER (ORDER BY d) AS t
          FROM ranked
        )
        SELECT CAST(n AS BIGINT) AS n_days,
               CAST(abs(u_t) AS BIGINT) AS k_stat,
               d AS change_date,
               round(2.0 * exp(-6.0 * CAST(abs(u_t) AS DOUBLE) ** 2
                 / (CAST(n AS DOUBLE) ** 3 + CAST(n AS DOUBLE) ** 2)), 8)
                 AS p_approx
        FROM u
        WHERE t < n
        ORDER BY abs(u_t) DESC, d ASC
        LIMIT 1
    """,
}
