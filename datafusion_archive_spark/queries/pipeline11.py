"""Pipeline wave 11 (round 5, ninth wave): interval-union coverage,
weighted median, and moving correlation.

- ``interval_union_time`` — total covered time per user when each
  event opens a 30-minute activity interval and overlaps must not
  double-count: the classic interval-union (a.k.a. coverage)
  problem, solved with the running-max-end sweep that turns overlap
  detection into one ordered window per user.
- ``weighted_median`` — the smallest value whose cumulative weight
  reaches half the total (lower weighted median): the
  robust-statistics twin of ``median_mode_aggs``, exact because
  weights stay integers end-to-end. Since round 8 it runs the
  weighted histogram search (operators/quantiles) rather than a
  cumulative sweep over the per-group price dictionary — the same
  dictionary-growth scale fix as ``weighted_quartiles``.
- ``moving_corr`` — 30-day moving Pearson correlation between daily
  order count and daily revenue: the rolling-relationship signal of
  monitoring dashboards, over the aggregated daily grid (the window
  never touches the fact scan).

All three follow the aggregate-or-collapse-first discipline: windows
run over entity timelines or value-collapsed grids, so partition
sizes stay bounded at 100 TB. The reference has no window surface at
all (``/root/reference/ROADMAP.md``).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from datafusion_archive_spark.functions.rounding import decimal_sum, decimal_sum_sql
from datafusion_archive_spark.queries.timeseries import load_events
from datafusion_archive_spark.operators.util import cached, load_table


def _t(spark, sf_dir, name):
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# Interval union
# ---------------------------------------------------------------------------

_INTERVAL_US = 1800 * 1_000_000  # each event covers 30 minutes


def q_interval_union_time(spark, sf):
    """Per-user covered microseconds and island count when every event
    opens a 30-minute interval. Sweep: order each user's intervals by
    start; an interval starts a new island iff its start exceeds the
    running max end of everything before it; islands then aggregate to
    (max end − min start) and sum. All arithmetic on integer µs —
    engine-exact.

    Scale: one Exchange on user_id; both windows and the island
    aggregate reuse it. Interval data never leaves its user
    partition."""
    e = load_events(spark, sf).select(
        "user_id",
        "event_id",
        F.unix_micros(F.col("ts")).alias("st"),
        (F.unix_micros(F.col("ts")) + F.lit(_INTERVAL_US)).alias("en"),
    )
    w = Window.partitionBy("user_id").orderBy("st", "event_id")
    prev_max_end = F.max("en").over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = e.withColumn(
        "_new",
        F.when(
            prev_max_end.isNull() | (F.col("st") > prev_max_end),
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .cast("long"),
    ).withColumn(
        "_island",
        F.sum("_new").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    islands = flagged.groupBy("user_id", "_island").agg(
        (F.max("en") - F.min("st")).alias("_covered")
    )
    return islands.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_islands"),
        F.sum("_covered").alias("covered_us"),
    )


# ---------------------------------------------------------------------------
# Weighted median
# ---------------------------------------------------------------------------


def q_weighted_median(spark, sf):
    """Quantity-weighted (lower) median price per return flag: the
    smallest price whose cumulative quantity reaches half the group
    total. Exact integer weight arithmetic on both engines (the
    search's threshold is a Python-bigint ceiling of ``total / 2``,
    identical to the oracle's ``cum * 2 >= total``).

    Scale: since round 8 this runs the weighted histogram search
    (operators/quantiles.weighted_lower_quantiles_grouped) — the same
    upgrade as ``weighted_quartiles``: this query previously swept a
    cumulative window over the per-group price dictionary, which
    grows linearly with scale, so the 3-partition window sort was the
    identical 100×-scale killer VERDICT r7 flagged there. Every heavy
    pass is now an ordinary distributed aggregate; the cut price and
    total return as literals."""
    from datafusion_archive_spark.operators.quantiles import (
        weighted_lower_quantiles_grouped,
    )

    l = cached(
        _t(spark, sf, "lineitem").select(
            "l_returnflag", "l_extendedprice", "l_quantity"
        )
    )
    res = weighted_lower_quantiles_grouped(
        l, "l_returnflag", "l_extendedprice", "l_quantity", [(1, 2)]
    )
    rows = [
        (k, float(v[0]), int(total))
        for k, (v, total) in sorted(res.items())
    ]
    return spark.createDataFrame(
        rows,
        "l_returnflag string, weighted_median_price double, "
        "total_weight long",
    )


# ---------------------------------------------------------------------------
# Moving correlation
# ---------------------------------------------------------------------------


def q_moving_corr(spark, sf):
    """30-day moving Pearson correlation between daily order count and
    daily revenue, partitioned by year (frame resets at year
    boundaries by design — a bounded sort per partition, never one
    global sort). Inputs are exact (integer counts, decimal sums cast
    once). The correlation is the explicit co-moment formula over six
    window sums with a guarded denominator — the builtin corr window
    raises DIVIDE_BY_ZERO under ANSI mode on the degenerate
    single-row frame every partition starts with, and the explicit
    form also pins both engines to the same arithmetic (NULL on
    zero-variance frames in both)."""
    o = _t(spark, sf, "orders")
    daily = o.groupBy(
        F.year("o_orderdate").alias("year"),
        F.to_date("o_orderdate").alias("day"),
    ).agg(
        F.count(F.lit(1)).cast("double").alias("n_orders"),
        decimal_sum(F.col("o_totalprice")).cast("double").alias("rev"),
    )
    w = (
        Window.partitionBy("year")
        .orderBy("day")
        .rowsBetween(-29, Window.currentRow)
    )
    x, y = F.col("n_orders"), F.col("rev")
    n = F.count(F.lit(1)).over(w).cast("double")
    sx, sy = F.sum(x).over(w), F.sum(y).over(w)
    sxx = F.sum(x * x).over(w)
    syy = F.sum(y * y).over(w)
    sxy = F.sum(x * y).over(w)
    with_sums = daily.select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        x.cast("long").alias("n_orders"),
        n.alias("_n"),
        sx.alias("_sx"),
        sy.alias("_sy"),
        sxx.alias("_sxx"),
        syy.alias("_syy"),
        sxy.alias("_sxy"),
    )
    vx = F.col("_n") * F.col("_sxx") - F.col("_sx") * F.col("_sx")
    vy = F.col("_n") * F.col("_syy") - F.col("_sy") * F.col("_sy")
    num = F.col("_n") * F.col("_sxy") - F.col("_sx") * F.col("_sy")
    return with_sums.select(
        "day",
        "n_orders",
        F.round(
            F.when(
                (vx > 0) & (vy > 0),
                num / (F.sqrt(vx) * F.sqrt(vy)),
            ),
            6,
        ).alias("corr_30d"),
    )


QUERIES = {
    "interval_union_time": q_interval_union_time,
    "weighted_median": q_weighted_median,
    "moving_corr": q_moving_corr,
}

ORACLES = {
    "interval_union_time": f"""
        WITH iv AS (
          SELECT user_id, event_id,
                 epoch_us(ts) AS st,
                 epoch_us(ts) + {_INTERVAL_US} AS en
          FROM events
        ),
        flagged AS (
          SELECT user_id, event_id, st, en,
                 CASE WHEN max(en) OVER (
                        PARTITION BY user_id ORDER BY st, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                      ) IS NULL
                      OR st > max(en) OVER (
                        PARTITION BY user_id ORDER BY st, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                      ) THEN 1 ELSE 0 END AS new_i
          FROM iv
        ),
        islands AS (
          -- cumsum MUST use the same (st, event_id) tie order as the
          -- flag pass: a same-start duplicate sorted ahead of its
          -- island's opener would be numbered into the previous island
          SELECT user_id, st, en,
                 sum(new_i) OVER (
                   PARTITION BY user_id ORDER BY st, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                 ) AS island
          FROM flagged
        ),
        sized AS (
          SELECT user_id, island,
                 max(en) - min(st) AS covered
          FROM islands GROUP BY 1, 2
        )
        SELECT user_id,
               count(*) AS n_islands,
               CAST(sum(covered) AS BIGINT) AS covered_us
        FROM sized
        GROUP BY user_id
    """,
    "weighted_median": """
        WITH by_price AS (
          SELECT l_returnflag, l_extendedprice AS price,
                 CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS wt
          FROM lineitem
          GROUP BY 1, 2
        ),
        swept AS (
          SELECT l_returnflag, price,
                 sum(wt) OVER (
                   PARTITION BY l_returnflag ORDER BY price
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                 ) AS cum,
                 sum(wt) OVER (PARTITION BY l_returnflag) AS total
          FROM by_price
        )
        SELECT l_returnflag,
               min(price) AS weighted_median_price,
               CAST(max(total) AS BIGINT) AS total_weight
        FROM swept
        WHERE cum * 2 >= total
        GROUP BY l_returnflag
    """,
    "moving_corr": f"""
        WITH daily AS (
          SELECT EXTRACT(year FROM o_orderdate) AS year,
                 CAST(o_orderdate AS DATE) AS day,
                 CAST(count(*) AS DOUBLE) AS n_orders,
                 CAST({decimal_sum_sql("o_totalprice")} AS DOUBLE) AS rev
          FROM orders
          GROUP BY 1, 2
        ),
        sums AS (
          SELECT day, n_orders,
                 CAST(count(*) OVER w AS DOUBLE) AS n,
                 sum(n_orders) OVER w AS sx,
                 sum(rev) OVER w AS sy,
                 sum(n_orders * n_orders) OVER w AS sxx,
                 sum(rev * rev) OVER w AS syy,
                 sum(n_orders * rev) OVER w AS sxy
          FROM daily
          WINDOW w AS (
            PARTITION BY year ORDER BY day
            ROWS BETWEEN 29 PRECEDING AND CURRENT ROW
          )
        )
        SELECT strftime(day, '%Y-%m-%d') AS day,
               CAST(n_orders AS BIGINT) AS n_orders,
               round(CASE WHEN n * sxx - sx * sx > 0
                           AND n * syy - sy * sy > 0
                     THEN (n * sxy - sx * sy)
                          / (sqrt(n * sxx - sx * sx)
                             * sqrt(n * syy - sy * sy))
                     END, 6) AS corr_30d
        FROM sums
    """,
}
