"""Pipeline wave 17 (round 5, fifteenth wave): fuzzy record linkage,
resampling inference, seasonality profiling, and the Lorenz curve.

- ``jaro_winkler_linkage`` — fuzzy record linkage over the part-name
  dictionary: block on the head noun, score candidate pairs with a
  Jaro–Winkler kernel (vectorized Arrow-batched pandas UDF — the
  sanctioned slow path, confined to the blocked DICTIONARY pairs,
  never the row stream). The oracle is DuckDB's independent native
  ``jaro_winkler_similarity`` — a true cross-implementation
  differential, not a self-check.
- ``bootstrap_ci_mean`` — 95 % bootstrap confidence interval for
  mean daily revenue with DETERMINISTIC resampling: draw indices come
  from the engine-portable md5 hash, so both engines materialize the
  identical 200 resamples. Resampling-as-a-join: a (rep, slot) grid
  equi-joins the indexed day table.
- ``seasonal_profile_dow`` — (ISO weekday × hour) event intensity
  profile with the ratio to the uniform expectation: the seasonality
  fingerprint behind load forecasting and anomaly baselines.
- ``lorenz_curve_deciles`` — the Lorenz curve at decile resolution
  (cumulative spend share of customers ordered by spend), via the
  broadcast-cutpoint fold; the 10-point curve that visualizes the
  Gini coefficient (``gini_customer_spend``).

The reference has no string-similarity, sampling, or date-part
machinery (``src/sqlplanner.rs:343-367`` registers only sqrt +
ST_Point/ST_AsText).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from datafusion_archive_spark.functions.rounding import (
    decimal_sum,
    decimal_sum_sql,
)
from datafusion_archive_spark.queries.llm import _hash64_sql
from datafusion_archive_spark.functions import text as TX
from datafusion_archive_spark.queries.timeseries import load_events
from datafusion_archive_spark.operators.quantiles import (
    exact_quantiles_cont,
    lit_cutpoints,
)
from datafusion_archive_spark.operators.util import cached, load_table


def _t(spark, sf_dir, name):
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# Jaro-Winkler record linkage
# ---------------------------------------------------------------------------


def _jaro(a: str, b: str) -> float:
    """Classic Jaro similarity (the definition DuckDB implements —
    including jaro('', '') = 0, found by the hypothesis differential
    in tests/test_properties2.py)."""
    la, lb = len(a), len(b)
    if la == 0 or lb == 0:
        return 0.0
    if a == b:
        return 1.0
    window = max(la, lb) // 2 - 1
    match_b = [False] * lb
    matches = 0
    ma, mb = [], []
    for i, ca in enumerate(a):
        lo, hi = max(0, i - window), min(lb, i + window + 1)
        for j in range(lo, hi):
            if not match_b[j] and b[j] == ca:
                match_b[j] = True
                matches += 1
                ma.append(i)
                break
    if matches == 0:
        return 0.0
    bs = [b[j] for j in range(lb) if match_b[j]]
    transpositions = sum(
        1 for i, j in zip((a[i] for i in ma), bs) if i != j
    ) // 2
    m = float(matches)
    return (m / la + m / lb + (m - transpositions) / m) / 3.0


def _jaro_winkler(a: str, b: str) -> float:
    """Jaro–Winkler with the standard 0.7 boost threshold, prefix
    cap 4, scale 0.1 — DuckDB ``jaro_winkler_similarity`` defaults."""
    j = _jaro(a, b)
    if j <= 0.7:
        return j
    prefix = 0
    for ca, cb in zip(a[:4], b[:4]):
        if ca != cb:
            break
        prefix += 1
    return j + prefix * 0.1 * (1.0 - j)


def _jw_udf():
    """Built lazily: pandas_udf needs an active session to parse its
    DDL return type, and this module imports at package load. The
    kernel function carries NO annotations — this module uses PEP 563
    (`from __future__ import annotations`), which string-izes them and
    breaks pandas_udf's signature inference; the explicit
    SCALAR eval type pins the Series->Series contract instead."""

    def kernel(a, b):
        return pd.Series(
            [_jaro_winkler(x, y) for x, y in zip(a, b)], dtype="float64"
        )

    # real (evaluated) annotations, immune to this module's PEP 563
    kernel.__annotations__ = {
        "a": pd.Series,
        "b": pd.Series,
        "return": pd.Series,
    }
    return pandas_udf(kernel, "double")


def q_jaro_winkler_linkage(spark, sf):
    """Candidate part-name pairs in the same head-noun block with
    Jaro–Winkler ≥ 0.7. The Python kernel is differential-tested
    against DuckDB's NATIVE jaro_winkler_similarity — two independent
    implementations must agree to 6 dp on every pair.

    Scale: linkage runs on the DISTINCT-name dictionary (collapsed
    first — |dict| ≪ |rows|), blocked on the last token; the
    quadratic kernel is confined to within-block dictionary pairs and
    executes as one Arrow batch per partition."""
    names = (
        _t(spark, sf, "part")
        .select(F.col("p_name").alias("name"))
        .distinct()
        .withColumn("block", F.element_at(F.split("name", " "), -1))
    )
    a = names.alias("a")
    b = names.alias("b")
    pairs = a.join(b, "block").filter(F.col("a.name") < F.col("b.name"))
    jw = _jw_udf()
    scored = pairs.select(
        "block",
        F.col("a.name").alias("name1"),
        F.col("b.name").alias("name2"),
        F.round(jw(F.col("a.name"), F.col("b.name")), 6).alias("jw"),
    )
    return scored.filter(F.col("jw") >= 0.7)


# ---------------------------------------------------------------------------
# Deterministic bootstrap CI
# ---------------------------------------------------------------------------

_BOOT_REPS = 200
_BOOT_EPOCH = "1992-01-01"


def q_bootstrap_ci_mean(spark, sf):
    """95 % bootstrap CI for mean daily order revenue, with
    deterministic md5-hash resampling so the 200 resamples are
    identical in any engine: draw (rep, slot) picks day index
    hash64(rep:slot) mod n_days. One row: point estimate, CI bounds,
    n_days, n_reps.

    Scale: the fact scan collapses to the day grid first; the
    resample grid is |days| × 200 with an equi-join back to the
    indexed grid — linear in days, never touching the fact table;
    the final percentile runs over 200 rep-means."""
    o = _t(spark, sf, "orders")
    # cached: the day grid feeds the indexed resample base AND the
    # point estimate; the indexed grid feeds three consumers — both
    # are |days|-sized, and uncached each branch re-runs the fact scan
    daily = cached(
        o.groupBy(
            F.datediff(
                F.to_date("o_orderdate"), F.lit(_BOOT_EPOCH).cast("date")
            ).alias("day")
        ).agg(decimal_sum(F.col("o_totalprice")).cast("double").alias("rev"))
    )
    idx_w = Window.orderBy("day")
    indexed = cached(
        daily.select((F.row_number().over(idx_w) - 1).alias("idx"), "rev")
    )
    n = indexed.agg(F.count(F.lit(1)).alias("n_days"))
    reps = spark.range(_BOOT_REPS).select(F.col("id").alias("rep"))
    slots = indexed.select(F.col("idx").alias("slot"))
    grid = (
        slots.crossJoin(F.broadcast(reps))
        .join(F.broadcast(n))
        .select(
            "rep",
            (
                TX.hash64(
                    F.concat_ws(":", F.col("rep"), F.col("slot"))
                )
                % F.col("n_days")
            ).alias("idx"),
        )
    )
    rep_means = (
        grid.join(indexed, "idx")
        .groupBy("rep")
        .agg(F.avg("rev").alias("m"))
    )
    ci = rep_means.agg(
        F.expr("percentile(m, 0.025)").alias("lo"),
        F.expr("percentile(m, 0.975)").alias("hi"),
    )
    point = daily.agg(
        F.avg("rev").alias("mean_rev"), F.count(F.lit(1)).alias("n_days")
    )
    return point.join(F.broadcast(ci)).select(
        F.round("mean_rev", 2).alias("mean_rev"),
        F.round("lo", 2).alias("ci_lo"),
        F.round("hi", 2).alias("ci_hi"),
        "n_days",
        F.lit(_BOOT_REPS).alias("n_reps"),
    )


# ---------------------------------------------------------------------------
# Seasonality profile
# ---------------------------------------------------------------------------


def q_seasonal_profile_dow(spark, sf):
    """Event intensity by (ISO weekday, hour-of-day) with the ratio
    to the uniform expectation (total/168): the seasonality
    fingerprint. ISO weekday (Mon=1) matches DuckDB ``isodow``.

    Scale: map-only date-part extraction, 168-group rollup, broadcast
    total."""
    e = load_events(spark, sf)
    cells = e.groupBy(
        (F.weekday("ts") + 1).alias("isodow"),
        F.hour("ts").alias("hour"),
    ).agg(F.count(F.lit(1)).alias("n"))
    tot = cells.agg(F.sum("n").alias("tot"))
    return cells.join(F.broadcast(tot)).select(
        "isodow",
        "hour",
        "n",
        F.round(F.col("n") / (F.col("tot") / F.lit(168.0)), 6).alias(
            "intensity_ratio"
        ),
    )


# ---------------------------------------------------------------------------
# Lorenz curve
# ---------------------------------------------------------------------------

_LORENZ_PCTS = [round(0.1 * i, 1) for i in range(1, 10)]


def q_lorenz_curve_deciles(spark, sf):
    """The Lorenz curve at decile resolution: customers bucketed into
    spend deciles by the broadcast-cutpoint fold (equi-depth
    formulation — no global-order window over customers), then
    cumulative customer and spend shares per decile. The curve whose
    area deficit is the Gini coefficient.

    Scale: spend collapses per customer; cutpoints come from the
    histogram-pruned exact order-statistic search
    (operators/quantiles.py — bit-identical to ``percentile(x,
    array(...))`` but with no single-task aggregation buffer over the
    customer dimension) and are inlined as a literal array into a
    scan-side fold; the cumulative window runs over 10 decile rows."""
    o = _t(spark, sf, "orders")
    # cached: the customer-spend rollup feeds both the cutpoint
    # search and the bucketing scan — uncached, the orders Exchange
    # runs once per pass
    spend = cached(
        o.groupBy("o_custkey").agg(
            decimal_sum(F.col("o_totalprice")).cast("double").alias("x")
        )
    )
    cuts = lit_cutpoints(exact_quantiles_cont(spend, "x", _LORENZ_PCTS))
    bucketed = spend.select(
        F.aggregate(
            cuts,
            F.lit(0),
            lambda acc, b: acc + F.when(F.col("x") > b, 1).otherwise(0),
        ).alias("decile"),
        "x",
    )
    per_dec = bucketed.groupBy("decile").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.sum("x").alias("spend"),
    )
    tot = per_dec.agg(
        F.sum("n_customers").alias("tc"), F.sum("spend").alias("ts")
    )
    w = Window.orderBy("decile").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        per_dec.join(F.broadcast(tot))
        .withColumn("cum_n", F.sum("n_customers").over(w))
        .withColumn("cum_s", F.sum("spend").over(w))
        .select(
            "decile",
            "n_customers",
            F.round("spend", 2).alias("spend"),
            F.round(F.col("cum_n") / F.col("tc"), 6).alias(
                "cum_customer_share"
            ),
            F.round(F.col("cum_s") / F.col("ts"), 6).alias(
                "cum_spend_share"
            ),
        )
    )


QUERIES = {
    "jaro_winkler_linkage": q_jaro_winkler_linkage,
    "bootstrap_ci_mean": q_bootstrap_ci_mean,
    "seasonal_profile_dow": q_seasonal_profile_dow,
    "lorenz_curve_deciles": q_lorenz_curve_deciles,
}

ORACLES = {
    "jaro_winkler_linkage": """
        WITH names AS (
          SELECT DISTINCT p_name AS name FROM part
        ),
        blocked AS (
          SELECT name,
                 list_extract(string_split(name, ' '),
                              len(string_split(name, ' '))) AS block
          FROM names
        )
        SELECT a.block,
               a.name AS name1,
               b.name AS name2,
               round(jaro_winkler_similarity(a.name, b.name), 6) AS jw
        FROM blocked a JOIN blocked b
          ON a.block = b.block AND a.name < b.name
        WHERE round(jaro_winkler_similarity(a.name, b.name), 6) >= 0.7
    """,
    "bootstrap_ci_mean": f"""
        WITH daily AS (
          SELECT date_diff('day', DATE '{_BOOT_EPOCH}',
                           CAST(o_orderdate AS DATE)) AS day,
                 CAST({decimal_sum_sql("o_totalprice")} AS DOUBLE) AS rev
          FROM orders GROUP BY 1
        ),
        indexed AS (
          SELECT row_number() OVER (ORDER BY day) - 1 AS idx, rev
          FROM daily
        ),
        n AS (SELECT count(*) AS n_days FROM indexed),
        grid AS (
          SELECT r.range AS rep,
                 {_hash64_sql("(r.range || ':' || s.idx)", 0)}
                   % (SELECT n_days FROM n) AS idx
          FROM range(0, {_BOOT_REPS}) r
          CROSS JOIN indexed s
        ),
        rep_means AS (
          SELECT rep, avg(i.rev) AS m
          FROM grid g JOIN indexed i USING (idx)
          GROUP BY rep
        ),
        ci AS (
          SELECT quantile_cont(m, 0.025) AS lo,
                 quantile_cont(m, 0.975) AS hi
          FROM rep_means
        )
        SELECT round(avg(rev), 2) AS mean_rev,
               round((SELECT lo FROM ci), 2) AS ci_lo,
               round((SELECT hi FROM ci), 2) AS ci_hi,
               (SELECT n_days FROM n) AS n_days,
               {_BOOT_REPS} AS n_reps
        FROM daily
    """,
    "seasonal_profile_dow": """
        WITH cells AS (
          SELECT isodow(ts) AS isodow,
                 CAST(hour(ts) AS INTEGER) AS hour,
                 count(*) AS n
          FROM events GROUP BY 1, 2
        ),
        tot AS (SELECT sum(n) AS tot FROM cells)
        SELECT CAST(isodow AS INTEGER) AS isodow, hour, n,
               round(n / (tot / 168.0), 6) AS intensity_ratio
        FROM cells CROSS JOIN tot
    """,
    "lorenz_curve_deciles": f"""
        WITH spend AS (
          SELECT o_custkey,
                 CAST({decimal_sum_sql("o_totalprice")} AS DOUBLE) AS x
          FROM orders GROUP BY o_custkey
        ),
        cuts AS (
          SELECT quantile_cont(x,
                   [{", ".join(str(p) for p in _LORENZ_PCTS)}]) AS bs
          FROM spend
        ),
        bucketed AS (
          SELECT CAST(list_sum(list_transform(c.bs,
                   b -> CASE WHEN s.x > b THEN 1 ELSE 0 END))
                 AS INTEGER) AS decile,
                 s.x
          FROM spend s CROSS JOIN cuts c
        ),
        per_dec AS (
          SELECT decile, count(*) AS n_customers, sum(x) AS spend
          FROM bucketed GROUP BY decile
        ),
        tot AS (
          SELECT sum(n_customers) AS tc, sum(spend) AS ts FROM per_dec
        )
        SELECT decile, n_customers,
               round(spend, 2) AS spend,
               round(sum(n_customers) OVER (ORDER BY decile
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                     / tc, 6) AS cum_customer_share,
               round(sum(spend) OVER (ORDER BY decile
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                     / ts, 6) AS cum_spend_share
        FROM per_dec CROSS JOIN tot
    """,
}
