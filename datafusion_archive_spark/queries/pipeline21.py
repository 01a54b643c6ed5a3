"""Pipeline wave 21 (round 5, nineteenth wave): forward as-of joins,
grouped SLA percentiles, one-way ANOVA, and train/test leakage.

- ``events_asof_forward`` — the forward as-of join (next error value
  at-or-after each purchase, per user): the mirror of the certified
  backward ``events_asof_join``, exercising
  ``operators/asof.asof_join_forward`` — time-to-next-failure /
  next-touch attribution semantics.
- ``percentiles_by_month`` — exact p50/p90/p99 of order totals per
  month: the grouped-percentile SLA/latency report (one hash
  aggregate; Spark ``percentile`` and DuckDB ``quantile_cont`` share
  linear interpolation).
- ``anova_weekday_revenue`` — one-way ANOVA F-statistic of daily
  revenue across ISO weekdays (+ η² effect size) from grouped
  second moments: the "does day-of-week matter" test, windowless.
- ``leakage_traintest_overlap`` — train/test contamination detector:
  hash-split the corpus (the certified ``train_val_test_split``
  assignment), fingerprint normalized text, and list every test doc
  whose fingerprint also appears in train. The decontamination gate
  every LLM data pipeline must run before evaluation.

The reference has none of: joins, windows, percentiles, hashing
(``/root/reference/ROADMAP.md``).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from datafusion_archive_spark.functions import text as TX
from datafusion_archive_spark.functions.rounding import (
    decimal_sum,
    decimal_sum_sql,
    round_half_up,
    round_half_up_sql,
)
from datafusion_archive_spark.operators.asof import asof_join_forward
from datafusion_archive_spark.queries.llm import _NORM
from datafusion_archive_spark.queries.timeseries import load_events
from datafusion_archive_spark.operators.quantiles import exact_grouped_quantiles
from datafusion_archive_spark.operators.util import cached, load_table


def _t(spark, sf_dir, name):
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# Forward as-of join
# ---------------------------------------------------------------------------


def q_events_asof_forward(spark, sf):
    """Each purchase picks up the value of the NEXT error event
    at-or-after it for the same user (NULL when none follows) — the
    forward mirror of the certified backward as-of join. Errors are
    pre-reduced to one row per (user, ts) so ordering is unique.

    Scale: one shuffle on user_id (union + descending carry window);
    see operators/asof.asof_join_forward."""
    ev = load_events(spark, sf)
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id"
    )
    errors = (
        ev.filter(F.col("event_type") == "error")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("error_value"))
    )
    joined = asof_join_forward(
        purchases,
        errors,
        key="user_id",
        left_ts="ts",
        right_ts="ts",
        right_value_cols=["error_value"],
        suffix="",
    )
    return joined.select(
        "event_id",
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("ts_s"),
        "error_value",
    )


# ---------------------------------------------------------------------------
# Grouped percentiles
# ---------------------------------------------------------------------------


def q_percentiles_by_month(spark, sf):
    """Exact p50/p90/p99 of order totals per order month — the
    grouped-percentile report behind every SLA/latency dashboard.

    Scale: the per-month cutpoints come from the grouped
    histogram-pruned search (operators/quantiles.
    exact_grouped_quantiles — round 7: every month's percentiles
    resolve together in three distributed passes, with no per-group
    value buffer in the task that finalizes a month; the grouped
    ``percentile`` aggregate held each month's whole value set in one
    task, the failure mode the sketch variants (``approx_aggs``) were
    previously the only escape from). Counts are a plain hash
    aggregate; the search is bit-identical to ``percentile``."""
    o = _t(spark, sf, "orders").select(
        F.date_format(F.to_date("o_orderdate"), "yyyy-MM").alias("month"),
        "o_totalprice",
    )
    qs = exact_grouped_quantiles(
        o, "month", "o_totalprice", [0.5, 0.9, 0.99]
    )
    cuts = spark.createDataFrame(
        [(k, v[0], v[1], v[2]) for k, v in qs.items()],
        "month string, q50 double, q90 double, q99 double",
    )
    monthly = o.groupBy("month").agg(F.count(F.lit(1)).alias("n"))
    # half-up rounding on both engines: interpolated percentiles land
    # on .005 midpoints where round()'s engine default diverges
    return monthly.join(F.broadcast(cuts), "month").select(
        "month",
        "n",
        round_half_up(F.col("q50"), 2).alias("p50"),
        round_half_up(F.col("q90"), 2).alias("p90"),
        round_half_up(F.col("q99"), 2).alias("p99"),
    )


# ---------------------------------------------------------------------------
# One-way ANOVA
# ---------------------------------------------------------------------------


def q_anova_weekday_revenue(spark, sf):
    """One-way ANOVA of daily revenue across ISO weekdays:
    F = (SSB/(k−1)) / (SSW/(n−k)) from grouped second moments, plus
    η² = SSB/SST. One row: k, n, f_stat, eta_sq.

    Scale: the fact scan collapses to the day grid, then to 7 weekday
    cells carrying (n, Σx, Σx²) — the whole test is two tiny
    map-side-combinable aggregates, no window."""
    o = _t(spark, sf, "orders")
    daily = o.groupBy(
        F.to_date("o_orderdate").alias("day")
    ).agg(decimal_sum(F.col("o_totalprice")).cast("double").alias("x"))
    cells = daily.groupBy(
        (F.weekday("day") + 1).alias("isodow")
    ).agg(
        F.count(F.lit(1)).cast("double").alias("ni"),
        F.sum("x").alias("si"),
        F.sum(F.col("x") * F.col("x")).alias("qi"),
    )
    agg = cells.agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("ni").alias("n"),
        F.sum("si").alias("s"),
        F.sum("qi").alias("q"),
        F.sum(F.col("si") * F.col("si") / F.col("ni")).alias("sb"),
    )
    sst = F.col("q") - F.col("s") * F.col("s") / F.col("n")
    ssb = F.col("sb") - F.col("s") * F.col("s") / F.col("n")
    ssw = F.col("q") - F.col("sb")
    f_stat = (ssb / (F.col("k") - 1)) / (ssw / (F.col("n") - F.col("k")))
    return agg.select(
        F.col("k").cast("long").alias("k"),
        F.col("n").cast("long").alias("n"),
        F.round(f_stat, 6).alias("f_stat"),
        F.round(ssb / sst, 6).alias("eta_sq"),
    )


# ---------------------------------------------------------------------------
# Train/test leakage
# ---------------------------------------------------------------------------

_LEAK_BUCKETS = 10_000
_LEAK_TRAIN_CUT = 9_000  # hash bucket < 9000 → train (90/10 split)


def q_leakage_traintest_overlap(spark, sf):
    """Train/test contamination: split the corpus 90/10 by the same
    stable hash the certified ``train_val_test_split`` uses,
    fingerprint normalized text, and report every test doc whose
    fingerprint also appears in train (with the collision count and
    the smallest matching train doc).

    The raw testdata has NO exact duplicates (500 distinct
    fingerprints at sf0.01), so the corpus is salted with copies
    (every doc_id ≡ 3 mod 10 gets a same-text twin at id+100000) —
    the twins' ids hash into the split independently, so ~10 % of
    each duplicate pair crosses the boundary and the detector has
    real positives to find; the rest prove it stays quiet.

    Scale: only (fingerprint, doc_id) pairs shuffle — text never
    moves; the overlap is one equi-join on the fingerprint."""
    base = _t(spark, sf, "documents").filter(F.col("text").isNotNull())
    twins = base.filter(F.col("doc_id") % 10 == 3).select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        *[c for c in base.columns if c != "doc_id"],
    )
    d = base.unionByName(twins)
    # cached: the compact (doc_id, fp, split) projection feeds both
    # the train rollup and the test side — uncached, the corpus would
    # be fingerprinted twice; text itself never leaves the scan
    fp = cached(
        d.select(
            "doc_id",
            TX.fingerprint(F.col("text")).alias("fp"),
            (
                TX.hash64(F.col("doc_id").cast("string")) % _LEAK_BUCKETS
                < _LEAK_TRAIN_CUT
            ).alias("is_train"),
        )
    )
    train = fp.filter("is_train").groupBy("fp").agg(
        F.count(F.lit(1)).alias("n_train_dups"),
        F.min("doc_id").alias("min_train_doc"),
    )
    test = fp.filter(~F.col("is_train")).select(
        F.col("doc_id").alias("test_doc_id"), "fp"
    )
    return test.join(train, "fp").select(
        "test_doc_id", "n_train_dups", "min_train_doc"
    )


QUERIES = {
    "events_asof_forward": q_events_asof_forward,
    "percentiles_by_month": q_percentiles_by_month,
    "anova_weekday_revenue": q_anova_weekday_revenue,
    "leakage_traintest_overlap": q_leakage_traintest_overlap,
}

ORACLES = {
    "events_asof_forward": """
        WITH errors AS (
          SELECT user_id, ts, max(value) AS error_value
          FROM events WHERE event_type = 'error' GROUP BY 1, 2
        ),
        purchases AS (
          SELECT user_id, ts, event_id
          FROM events WHERE event_type = 'purchase'
        ),
        merged AS (
          SELECT user_id, ts, 1 AS is_left, event_id,
                 NULL::DOUBLE AS error_value FROM purchases
          UNION ALL
          SELECT user_id, ts, 0 AS is_left, NULL AS event_id,
                 error_value FROM errors
        ),
        carried AS (
          SELECT user_id, ts, is_left, event_id,
                 last_value(error_value IGNORE NULLS) OVER (
                   PARTITION BY user_id ORDER BY ts DESC, is_left
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                 ) AS error_value
          FROM merged
        )
        SELECT event_id, user_id,
               strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS ts_s,
               error_value
        FROM carried WHERE is_left = 1
    """,
    "percentiles_by_month": f"""
        SELECT strftime(CAST(o_orderdate AS DATE), '%Y-%m') AS month,
               count(*) AS n,
               {round_half_up_sql("quantile_cont(o_totalprice, 0.5)", 2)}
                 AS p50,
               {round_half_up_sql("quantile_cont(o_totalprice, 0.9)", 2)}
                 AS p90,
               {round_half_up_sql("quantile_cont(o_totalprice, 0.99)", 2)}
                 AS p99
        FROM orders GROUP BY 1
    """,
    "anova_weekday_revenue": f"""
        WITH daily AS (
          SELECT CAST(o_orderdate AS DATE) AS day,
                 CAST({decimal_sum_sql("o_totalprice")} AS DOUBLE) AS x
          FROM orders GROUP BY 1
        ),
        cells AS (
          SELECT isodow(day) AS isodow,
                 CAST(count(*) AS DOUBLE) AS ni,
                 sum(x) AS si,
                 sum(x * x) AS qi
          FROM daily GROUP BY 1
        ),
        agg AS (
          SELECT count(*) AS k, sum(ni) AS n, sum(si) AS s,
                 sum(qi) AS q, sum(si * si / ni) AS sb
          FROM cells
        )
        SELECT CAST(k AS BIGINT) AS k,
               CAST(n AS BIGINT) AS n,
               round(((sb - s * s / n) / (k - 1))
                     / ((q - sb) / (n - k)), 6) AS f_stat,
               round((sb - s * s / n) / (q - s * s / n), 6) AS eta_sq
        FROM agg
    """,
    "leakage_traintest_overlap": f"""
        WITH salted AS (
          SELECT doc_id, text FROM documents WHERE text IS NOT NULL
          UNION ALL
          SELECT doc_id + 100000 AS doc_id, text FROM documents
          WHERE text IS NOT NULL AND doc_id % 10 = 3
        ),
        fp AS (
          SELECT doc_id,
                 md5({_NORM}) AS fp,
                 ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':0'),
                   1, 15))::BIGINT % {_LEAK_BUCKETS} < {_LEAK_TRAIN_CUT}
                   AS is_train
          FROM salted
        ),
        train AS (
          SELECT fp, count(*) AS n_train_dups,
                 min(doc_id) AS min_train_doc
          FROM fp WHERE is_train GROUP BY fp
        )
        SELECT t.doc_id AS test_doc_id, tr.n_train_dups,
               tr.min_train_doc
        FROM fp t JOIN train tr USING (fp)
        WHERE NOT t.is_train
    """,
}
