"""Pipeline wave 8 (round 5, sixth wave): statistical/bitwise
aggregate surface, rolling-quantile windows, a Deequ-style data
quality suite, sentence segmentation, market-basket pair rules,
gaps-and-islands streaks, and a bloom-prefilter semi join.

- ``regression_aggs`` — the SQL:2016 linear-regression aggregate
  family (REGR_SLOPE / REGR_INTERCEPT / REGR_R2 / REGR_COUNT) per
  group: the "fit a trend line per key" building block.
- ``window_rolling_median`` — exact rolling median (and mean) of
  daily revenue over a 7-row trailing window: the robust-smoothing
  twin of ``window_running``'s cumulative sum. Spark has no
  ``median()`` window builtin; ``percentile(x, 0.5)`` over the same
  frame is the exact equivalent.
- ``bitwise_aggs`` — BIT_AND / BIT_OR / BIT_XOR reductions: flag-mask
  consolidation (which permission bits are common / present / odd).
- ``data_quality_checks`` — a declarative check suite in one scan
  (completeness, key uniqueness, accepted values, bounds, format
  regex), each row a (check, metric, passed) verdict: the contract
  gate a 100 TB ingest runs before promoting a snapshot.
- ``text_sentences`` — regex sentence segmentation + per-language
  sentence/word-length stats: the layout-analysis step before
  sentence-level dedup or quality scoring.
- ``assoc_rules_pairs`` — frequent item pairs with support /
  confidence / lift over order baskets (Apriori's 2-itemset level).
- ``gaps_islands`` — consecutive-day activity streaks via the
  classic date-minus-row_number island key.
- ``bloom_prefilter_semi_join`` — a bloom-filter membership
  prefilter built from pure SQL primitives (hash → bit position →
  BIT_OR word bitmap → broadcast bitmap probe), followed by the
  exact semi join that removes false positives. Semantically a
  no-op (the oracle is the plain semi join); operationally the
  at-scale pattern that keeps 96% of a 100 TB fact scan out of the
  shuffle when the key side is selective — the hand-rolled twin of
  Spark's runtime bloom-filter join
  (``spark.sql.optimizer.runtime.bloomFilter.enabled``).

The reference executes none of these (aggregates stop at
MIN/MAX/SUM/COUNT/AVG, ``/root/reference/src/execution/
expression.rs:98-107``; no window functions or regex utilities,
``/root/reference/ROADMAP.md``); they extend its surface along the
SURVEY.md training-data-pipeline mandate.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from datafusion_archive_spark.functions import text as TX
from datafusion_archive_spark.functions.rounding import (
    decimal_sum,
    decimal_sum_sql,
    round_half_up,
    round_half_up_sql,
)
from datafusion_archive_spark.queries.llm import _hash64_sql
from datafusion_archive_spark.operators.util import cached, load_table


def _t(spark, sf_dir, name):
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# Linear-regression aggregates
# ---------------------------------------------------------------------------


def q_regression_aggs(spark, sf):
    """Per-returnflag trend of price on quantity via the SQL:2016
    REGR_* family. Slope/intercept round to 2 (boundary margin verified > 0.09
    rounding steps at sf0.01 — a 4-digit round left only 5.6e-3 of a
    step on one group, inside plausible cross-engine FP drift), r2
    to 6 (O(1)).

    Scale: one two-phase hash aggregate, partials are six doubles per
    group — the same single-Exchange shape as agg_global."""
    l = _t(spark, sf, "lineitem")
    return l.groupBy("l_returnflag").agg(
        F.round(F.regr_slope("l_extendedprice", "l_quantity"), 2).alias(
            "slope"
        ),
        F.round(
            F.regr_intercept("l_extendedprice", "l_quantity"), 2
        ).alias("intercept"),
        F.round(F.regr_r2("l_extendedprice", "l_quantity"), 6).alias("r2"),
        F.regr_count("l_extendedprice", "l_quantity")
        .cast("long")
        .alias("n_pairs"),
    )


# ---------------------------------------------------------------------------
# Rolling median window
# ---------------------------------------------------------------------------


def q_window_rolling_median(spark, sf):
    """7-day trailing median and mean of daily order revenue,
    partitioned by year. Aggregate-then-window: the raw fact table
    collapses to ~2400 daily rows BEFORE any window runs, so the sort
    is over the tiny daily grid, never the fact scan. Partitioning by
    year bounds each window partition (no single-partition global
    sort at scale); the frame intentionally resets at year boundaries.

    Exactness: daily revenue sums as DECIMAL (order-invariant), then
    the median interpolates two exact doubles — identical arithmetic
    in any engine."""
    o = _t(spark, sf, "orders")
    daily = o.groupBy(
        F.year("o_orderdate").alias("year"),
        F.to_date("o_orderdate").alias("day"),
    ).agg(decimal_sum(F.col("o_totalprice")).alias("_rev"))
    w = (
        Window.partitionBy("year")
        .orderBy("day")
        .rowsBetween(-6, Window.currentRow)
    )
    rev = F.col("_rev").cast("double")
    return daily.select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        F.round(rev, 2).alias("revenue"),
        F.round(F.expr(
            "percentile(CAST(_rev AS DOUBLE), 0.5)"
        ).over(w), 4).alias("med_7d"),
        F.round(F.avg(rev).over(w), 4).alias("avg_7d"),
    )


# ---------------------------------------------------------------------------
# Bitwise aggregates
# ---------------------------------------------------------------------------


def q_bitwise_aggs(spark, sf):
    """BIT_AND / BIT_OR / BIT_XOR over derived 8-bit order flags
    (status/priority/value bits) per priority bucket — the flag-mask
    consolidation shape: which bits hold for ALL rows, for ANY row,
    and the parity word. Map-side combinable, one Exchange."""
    o = _t(spark, sf, "orders")
    flags = (
        F.when(F.col("o_orderstatus") == "F", F.lit(1))
        .otherwise(F.lit(0))
        + F.when(F.col("o_orderstatus") == "O", F.lit(2)).otherwise(F.lit(0))
        + F.when(F.col("o_totalprice") > 150000.0, F.lit(4)).otherwise(
            F.lit(0)
        )
        + F.when(F.month("o_orderdate") <= 6, F.lit(8)).otherwise(F.lit(0))
    ).cast("long")
    return (
        o.withColumn("_flags", flags)
        .groupBy("o_orderpriority")
        .agg(
            F.bit_and("_flags").alias("bits_all"),
            F.bit_or("_flags").alias("bits_any"),
            F.bit_xor("_flags").alias("bits_parity"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


# ---------------------------------------------------------------------------
# Data-quality check suite
# ---------------------------------------------------------------------------

#: (check name, threshold the metric must reach to pass)
_DQ_CHECKS = (
    ("completeness_priority", 1.0),
    ("uniqueness_orderkey", 1.0),
    ("accepted_values_status", 1.0),
    ("nonnegative_totalprice", 1.0),
    ("format_priority", 1.0),
    ("daterange_orderdate", 0.999),
)


def q_data_quality_checks(spark, sf):
    """Deequ-style declarative quality suite over orders: six checks
    (null completeness, key uniqueness, accepted values, bounds,
    format regex, date range) computed in ONE scan as conditional
    aggregates, then unpivoted to (check, metric, passed) verdict
    rows. All metrics are exact integer-count ratios, so the doubles
    are engine-identical.

    Scale: a single global aggregate — partial aggregation makes the
    Exchange six doubles per partition; the unpivot runs on one row.
    This is the pre-promotion contract gate of an ingest pipeline."""
    o = _t(spark, sf, "orders")
    n = F.count(F.lit(1))
    ratio = lambda c: F.round(  # noqa: E731
        F.sum(c.cast("long")) / n, 6
    )
    m = o.agg(
        ratio(F.col("o_orderpriority").isNotNull()).alias(
            "completeness_priority"
        ),
        F.round(F.count_distinct(F.col("o_orderkey")) / n, 6).alias(
            "uniqueness_orderkey"
        ),
        ratio(F.col("o_orderstatus").isin("O", "F", "P")).alias(
            "accepted_values_status"
        ),
        ratio(F.col("o_totalprice") > 0.0).alias("nonnegative_totalprice"),
        ratio(
            F.col("o_orderpriority").rlike("^[1-5]-[A-Z ]+$")
        ).alias("format_priority"),
        ratio(
            F.col("o_orderdate").between("1992-01-01", "1998-12-31")
        ).alias("daterange_orderdate"),
    )
    stack = ", ".join(
        f"'{name}', {name}, CAST({thr} AS DOUBLE)"
        for name, thr in _DQ_CHECKS
    )
    return (
        m.select(
            F.expr(
                f"stack({len(_DQ_CHECKS)}, {stack}) AS "
                "(check, metric, threshold)"
            )
        )
        .withColumn("passed", F.col("metric") >= F.col("threshold"))
        .drop("threshold")
    )


# ---------------------------------------------------------------------------
# Sentence segmentation
# ---------------------------------------------------------------------------


def q_text_sentences(spark, sf):
    """Regex sentence segmentation ([.!?]+ boundaries) with
    per-language sentence counts and words-per-sentence stats — the
    layout-analysis pass before sentence-level dedup/quality scoring.

    Scale: split+explode is scan-side codegen; the explode output
    carries (lang, n_words) only — sentence TEXT never shuffles. One
    Exchange for the per-language aggregate."""
    d = _t(spark, sf, "documents").filter(F.col("text").isNotNull())
    sent = (
        d.select(
            "lang",
            F.explode(F.split(F.col("text"), "[.!?]+")).alias("_s"),
        )
        .select("lang", F.trim(F.col("_s")).alias("_s"))
        .filter(F.length("_s") > 0)
        .select(
            "lang",
            F.size(F.split(F.col("_s"), "\\s+")).alias("_words"),
        )
    )
    return sent.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_sentences"),
        F.round(F.avg("_words"), 6).alias("avg_words"),
        F.max("_words").alias("max_words"),
        F.sum(F.col("_words").cast("long")).alias("total_words"),
    )


# ---------------------------------------------------------------------------
# Frequent pairs (market basket)
# ---------------------------------------------------------------------------

_PAIR_MIN_ITEM = 2  # Apriori prune: item must appear in >= N baskets
_PAIR_MIN_SUPPORT = 2  # pair must co-occur in >= N baskets


def q_assoc_rules_pairs(spark, sf):
    """Apriori level-2: frequent part pairs across order baskets with
    support, confidence (a=>b) and lift. Items below _PAIR_MIN_ITEM
    baskets are pruned BEFORE pairing — the classic anti-monotone cut
    that keeps the self-join linear-ish in baskets rather than
    quadratic in catalog.

    Scale: pair explosion is quadratic in BASKET size, not corpus —
    order baskets are small (≤7 lines). The self-join shuffles on
    basket id (co-partitioned both sides); per-item counts are a
    part-cardinality table joined back by key. Lift/confidence are
    exact integer-count ratios."""
    # cached: the distinct basket rows feed the item counts, the
    # frequent restriction, and the basket total; the pruned rows
    # feed both sides of the pair self-join — uncached, the distinct
    # shuffle would re-run for every branch
    items = cached(
        _t(spark, sf, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    item_n = items.groupBy("l_partkey").agg(
        F.count(F.lit(1)).alias("item_n")
    )
    frequent = cached(
        items.join(
            item_n.filter(F.col("item_n") >= _PAIR_MIN_ITEM), "l_partkey"
        )
    )
    a = frequent.select(
        F.col("l_orderkey").alias("ok"),
        F.col("l_partkey").alias("part_a"),
        F.col("item_n").alias("n_a"),
    )
    b = frequent.select(
        F.col("l_orderkey").alias("ok"),
        F.col("l_partkey").alias("part_b"),
        F.col("item_n").alias("n_b"),
    )
    # one-row basket count, broadcast-cross-joined (never collected
    # on the driver at plan-build time)
    baskets = items.agg(
        F.count_distinct(F.col("l_orderkey")).alias("_n_baskets")
    )
    pairs = (
        a.join(b, "ok")
        .filter(F.col("part_a") < F.col("part_b"))
        .groupBy("part_a", "part_b", "n_a", "n_b")
        .agg(F.count(F.lit(1)).alias("pair_n"))
        .filter(F.col("pair_n") >= _PAIR_MIN_SUPPORT)
        .join(F.broadcast(baskets))
    )
    return pairs.select(
        "part_a",
        "part_b",
        "pair_n",
        "n_a",
        "n_b",
        F.round(F.col("pair_n") / F.col("n_a"), 6).alias("conf_a_b"),
        F.round(
            (F.col("pair_n") * F.col("_n_baskets"))
            / (F.col("n_a") * F.col("n_b")),
            6,
        ).alias("lift"),
    )


# ---------------------------------------------------------------------------
# Gaps and islands
# ---------------------------------------------------------------------------


def q_gaps_islands(spark, sf):
    """Consecutive-day activity streaks per order priority: the
    classic gaps-and-islands via the date-minus-row_number island
    key. Reports islands, longest streak, and total active days.

    Scale: the window runs over DISTINCT (priority, day) — the fact
    table collapses to the small activity grid first, so the
    per-priority sort is thousands of rows regardless of fact size."""
    o = _t(spark, sf, "orders")
    days = o.select(
        "o_orderpriority", F.to_date("o_orderdate").alias("day")
    ).distinct()
    w = Window.partitionBy("o_orderpriority").orderBy("day")
    islands = (
        days.withColumn(
            "_grp", F.date_sub(F.col("day"), F.row_number().over(w))
        )
        .groupBy("o_orderpriority", "_grp")
        .agg(F.count(F.lit(1)).alias("_len"))
    )
    return islands.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_islands"),
        F.max("_len").alias("longest_streak"),
        F.sum("_len").alias("active_days"),
    )


# ---------------------------------------------------------------------------
# Bloom-prefilter semi join
# ---------------------------------------------------------------------------

_BLOOM_BITS = 8192  # m: power of two, 128 64-bit words
_BLOOM_SEEDS = (101, 202)  # k = 2 hash functions


def _bloom_pos(col, seed):
    """Bit position of one bloom hash: portable hash64 mod m."""
    return TX.hash64(col.cast("string"), seed) % _BLOOM_BITS


def q_bloom_prefilter_semi_join(spark, sf):
    """Revenue by return flag for lineitems of suppliers in one
    nation, with a bloom-filter prefilter built from SQL primitives:
    each supplier key sets k=2 bits (portable hash64 mod 8192) in a
    128-word bitmap built by BIT_OR aggregation; the fact side probes
    the broadcast bitmap for both bits before the exact semi join
    removes the bloom's false positives. The oracle is the PLAIN semi
    join — the bloom is semantically a no-op (no false negatives by
    construction), which is exactly the point: at 100 TB the bitmap
    probe drops ~96% of fact rows before any shuffle, the hand-rolled
    twin of Spark's runtime bloom join
    (spark.sql.optimizer.runtime.bloomFilter.enabled).

    Plan shape (asserted in tests/test_round5d.py): both bitmap
    probes and the final key join are broadcast — the fact side
    never shuffles."""
    l = _t(spark, sf, "lineitem")
    s = _t(spark, sf, "supplier")
    n = _t(spark, sf, "nation")
    # cached: the key set feeds the bitmap build and the exact semi
    # join — uncached, the supplier-nation join runs twice
    keys = cached(
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .filter(F.col("n_name") == "NATION_9")
        .select("s_suppkey")
    )
    # build: every key sets one bit per seed; BIT_OR folds them into
    # <=128 (word, bits) rows
    bitmap = (
        keys.select(
            F.explode(
                F.array(
                    *[
                        _bloom_pos(F.col("s_suppkey"), seed)
                        for seed in _BLOOM_SEEDS
                    ]
                )
            ).alias("_pos")
        )
        .select(
            F.expr("CAST(_pos / 64 AS BIGINT)").alias("word"),
            F.expr(
                "shiftleft(CAST(1 AS BIGINT), CAST(_pos % 64 AS INT))"
            ).alias("_bit"),
        )
        .groupBy("word")
        .agg(F.bit_or("_bit").alias("bits"))
    )
    # probe: both bits must be set
    probed = l
    for i, seed in enumerate(_BLOOM_SEEDS):
        probed = (
            probed.withColumn(
                f"_p{i}", _bloom_pos(F.col("l_suppkey"), seed)
            )
            .withColumn(f"_w{i}", F.expr(f"CAST(_p{i} / 64 AS BIGINT)"))
            .withColumn(
                f"_m{i}",
                F.expr(
                    f"shiftleft(CAST(1 AS BIGINT),"
                    f" CAST(_p{i} % 64 AS INT))"
                ),
            )
            .join(
                F.broadcast(
                    bitmap.select(
                        F.col("word").alias(f"_w{i}"),
                        F.col("bits").alias(f"_b{i}"),
                    )
                ),
                f"_w{i}",
            )
            .filter(F.col(f"_b{i}").bitwiseAND(F.col(f"_m{i}")) != 0)
        )
    exact = probed.join(
        F.broadcast(keys), probed.l_suppkey == keys.s_suppkey, "left_semi"
    )
    return exact.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_items"),
        round_half_up(
            decimal_sum(F.col("l_extendedprice")), 2
        ).alias("revenue"),
    )


QUERIES = {
    "regression_aggs": q_regression_aggs,
    "window_rolling_median": q_window_rolling_median,
    "bitwise_aggs": q_bitwise_aggs,
    "data_quality_checks": q_data_quality_checks,
    "text_sentences": q_text_sentences,
    "assoc_rules_pairs": q_assoc_rules_pairs,
    "gaps_islands": q_gaps_islands,
    "bloom_prefilter_semi_join": q_bloom_prefilter_semi_join,
}

ORACLES = {
    "regression_aggs": """
        SELECT l_returnflag,
               round(regr_slope(l_extendedprice, l_quantity), 2) AS slope,
               round(regr_intercept(l_extendedprice, l_quantity), 2)
                 AS intercept,
               round(regr_r2(l_extendedprice, l_quantity), 6) AS r2,
               CAST(regr_count(l_extendedprice, l_quantity) AS BIGINT)
                 AS n_pairs
        FROM lineitem
        GROUP BY l_returnflag
    """,
    "window_rolling_median": f"""
        WITH daily AS (
          SELECT EXTRACT(year FROM o_orderdate) AS year,
                 CAST(o_orderdate AS DATE) AS day,
                 {decimal_sum_sql("o_totalprice")} AS rev
          FROM orders
          GROUP BY 1, 2
        )
        SELECT strftime(day, '%Y-%m-%d') AS day,
               round(CAST(rev AS DOUBLE), 2) AS revenue,
               round(median(CAST(rev AS DOUBLE)) OVER (
                 PARTITION BY year ORDER BY day
                 ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 4) AS med_7d,
               round(avg(CAST(rev AS DOUBLE)) OVER (
                 PARTITION BY year ORDER BY day
                 ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 4) AS avg_7d
        FROM daily
    """,
    "bitwise_aggs": """
        WITH flagged AS (
          SELECT o_orderpriority,
                 CAST(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END
                    + CASE WHEN o_orderstatus = 'O' THEN 2 ELSE 0 END
                    + CASE WHEN o_totalprice > 150000.0 THEN 4 ELSE 0 END
                    + CASE WHEN EXTRACT(month FROM o_orderdate) <= 6
                           THEN 8 ELSE 0 END AS BIGINT) AS flags
          FROM orders
        )
        SELECT o_orderpriority,
               CAST(bit_and(flags) AS BIGINT) AS bits_all,
               CAST(bit_or(flags) AS BIGINT) AS bits_any,
               CAST(bit_xor(flags) AS BIGINT) AS bits_parity,
               count(*) AS n_orders
        FROM flagged
        GROUP BY o_orderpriority
    """,
    "data_quality_checks": "\nUNION ALL\n".join(
        f"""
        SELECT '{name}' AS "check",
               round({metric}, 6) AS metric,
               round({metric}, 6) >= {thr} AS passed
        FROM orders
        """
        for (name, thr), metric in zip(
            _DQ_CHECKS,
            [
                "CAST(sum(CASE WHEN o_orderpriority IS NOT NULL THEN 1"
                " ELSE 0 END) AS BIGINT) / count(*)",
                "count(DISTINCT o_orderkey) / count(*)",
                "CAST(sum(CASE WHEN o_orderstatus IN ('O','F','P')"
                " THEN 1 ELSE 0 END) AS BIGINT) / count(*)",
                "CAST(sum(CASE WHEN o_totalprice > 0.0 THEN 1 ELSE 0"
                " END) AS BIGINT) / count(*)",
                "CAST(sum(CASE WHEN regexp_matches(o_orderpriority,"
                " '^[1-5]-[A-Z ]+$') THEN 1 ELSE 0 END) AS BIGINT)"
                " / count(*)",
                "CAST(sum(CASE WHEN o_orderdate >= TIMESTAMP"
                " '1992-01-01' AND o_orderdate < TIMESTAMP"
                " '1999-01-01' THEN 1 ELSE 0 END) AS BIGINT)"
                " / count(*)",
            ],
        )
    ),
    "text_sentences": """
        WITH sent AS (
          SELECT lang,
                 trim(s) AS s
          FROM documents,
               unnest(string_split_regex(text, '[.!?]+')) AS u(s)
          WHERE text IS NOT NULL
        ),
        words AS (
          SELECT lang,
                 len(string_split_regex(s, '\\s+')) AS n_words
          FROM sent WHERE length(s) > 0
        )
        SELECT lang,
               count(*) AS n_sentences,
               round(avg(n_words), 6) AS avg_words,
               CAST(max(n_words) AS INTEGER) AS max_words,
               CAST(sum(n_words) AS BIGINT) AS total_words
        FROM words
        GROUP BY lang
    """,
    "assoc_rules_pairs": f"""
        WITH items AS (
          SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
        ),
        counts AS (
          SELECT l_partkey, count(*) AS item_n FROM items
          GROUP BY l_partkey HAVING count(*) >= {_PAIR_MIN_ITEM}
        ),
        freq AS (
          SELECT i.l_orderkey, i.l_partkey, c.item_n
          FROM items i JOIN counts c USING (l_partkey)
        ),
        baskets AS (
          SELECT count(DISTINCT l_orderkey) AS n FROM items
        ),
        pairs AS (
          SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
                 a.item_n AS n_a, b.item_n AS n_b,
                 count(*) AS pair_n
          FROM freq a JOIN freq b ON a.l_orderkey = b.l_orderkey
               AND a.l_partkey < b.l_partkey
          GROUP BY 1, 2, 3, 4
          HAVING count(*) >= {_PAIR_MIN_SUPPORT}
        )
        SELECT part_a, part_b, pair_n, n_a, n_b,
               round(CAST(pair_n AS DOUBLE) / n_a, 6) AS conf_a_b,
               round(CAST(pair_n AS DOUBLE) * (SELECT n FROM baskets)
                     / (n_a * n_b), 6) AS lift
        FROM pairs
    """,
    "gaps_islands": """
        WITH days AS (
          SELECT DISTINCT o_orderpriority,
                 CAST(o_orderdate AS DATE) AS day
          FROM orders
        ),
        islands AS (
          SELECT o_orderpriority,
                 day - CAST(row_number() OVER (
                   PARTITION BY o_orderpriority ORDER BY day
                 ) AS INTEGER) AS grp,
                 day
          FROM days
        ),
        sized AS (
          SELECT o_orderpriority, grp, count(*) AS len
          FROM islands GROUP BY 1, 2
        )
        SELECT o_orderpriority,
               count(*) AS n_islands,
               max(len) AS longest_streak,
               CAST(sum(len) AS BIGINT) AS active_days
        FROM sized
        GROUP BY o_orderpriority
    """,
    "bloom_prefilter_semi_join": f"""
        SELECT l_returnflag,
               count(*) AS n_items,
               {round_half_up_sql(decimal_sum_sql("l_extendedprice"), 2)}
                 AS revenue
        FROM lineitem
        WHERE l_suppkey IN (
          SELECT s_suppkey FROM supplier
          JOIN nation ON s_nationkey = n_nationkey
          WHERE n_name = 'NATION_9'
        )
        GROUP BY l_returnflag
    """,
}
