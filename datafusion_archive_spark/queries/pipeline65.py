"""Pipeline wave 65 (round 5, sixty-third wave): Markov-chain
attribution — the path-based complement of the certified Shapley wave.

- ``markov_transition_matrix`` — the estimated first-order journey
  chain: per user, events ordered by (ts, event_id) and truncated at
  the FIRST purchase (absorption); transitions start→e₁, eᵢ→eᵢ₊₁,
  and last→null for never-converting users; empirical probabilities
  per source state. This certifies the estimation layer on its own.
- ``markov_attribution_removal`` — removal-effect attribution: for
  the full chain and for each channel-removed variant (transitions
  INTO the removed channel redirect to null), the absorption
  probability P(purchase | start) computed by _ITERS unrolled
  v ← vP propagation steps over a (variant, state) vector — all
  variants propagate in ONE joined step per iteration, so the
  removal analysis costs one small join chain, not one chain per
  channel. Removal effect share = normalized conversion drop.

The reference has no window functions or joins
(``/root/reference/ROADMAP.md``).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from datafusion_archive_spark.queries.timeseries import load_events


_ITERS = 30
_CHANNELS = ("view", "click", "signup", "error")


def _transitions(spark, sf):
    """(src, dst, n) journey transition counts."""
    ev = load_events(spark, sf).select(
        "user_id", "event_type", "ts", "event_id"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    numbered = ev.select(
        "user_id", "event_type", F.row_number().over(w).alias("rn")
    )
    seq = numbered.select(
        "*",
        F.min(
            F.when(F.col("event_type") == "purchase", F.col("rn"))
        )
        .over(Window.partitionBy("user_id"))
        .alias("first_buy"),
    )
    kept = seq.filter(
        F.col("first_buy").isNull()
        | (F.col("rn") <= F.col("first_buy"))
    )
    w2 = Window.partitionBy("user_id").orderBy("rn")
    steps = kept.select(
        F.coalesce(
            F.lag("event_type").over(w2), F.lit("start")
        ).alias("src"),
        F.col("event_type").alias("dst"),
    )
    last = (
        kept.groupBy("user_id")
        .agg(F.max("rn").alias("last_rn"), F.max("first_buy").alias("fb"))
        .join(
            kept.select("user_id", "rn", "event_type"),
            ["user_id"],
        )
        .filter(F.col("rn") == F.col("last_rn"))
        .filter(F.col("fb").isNull())
        .select(
            F.col("event_type").alias("src"),
            F.lit("null").alias("dst"),
        )
    )
    trans = steps.select("src", "dst").unionByName(last)
    return trans.groupBy("src", "dst").agg(
        F.count(F.lit(1)).alias("n")
    )


def q_markov_transition_matrix(spark, sf):
    """Empirical journey transition probabilities."""
    t = _transitions(spark, sf)
    w_src = Window.partitionBy("src")
    return t.select(
        "src",
        "dst",
        "n",
        F.round(
            F.col("n") / F.sum("n").over(w_src).cast("double"), 6
        ).alias("p"),
    ).orderBy("src", "dst")


def q_markov_attribution_removal(spark, sf):
    """Removal-effect attribution over the journey chain."""
    # single consumer since the round-15 variant-dimension rewrite —
    # caching it would cost a materialization for nothing
    t = _transitions(spark, sf)
    w_src = Window.partitionBy("src")
    base = t.select(
        "src",
        "dst",
        (F.col("n") / F.sum("n").over(w_src).cast("double")).alias(
            "p"
        ),
    )
    # Round 15: the 6 per-variant frames used to be built as a 6-way
    # union (6 separate cache-scan stages + 6× analysis of the window
    # plan); a broadcast 6-row variant dimension produces the same
    # rows in one stage. `removed` is NULL for the full chain, so the
    # filter (removed IS NULL OR src != removed) and the dst rewrite
    # (dst == removed → 'null'; the NULL comparison falls through to
    # otherwise) reproduce the old per-variant selects exactly.
    variants_df = spark.createDataFrame(
        [("none", None)] + [(c, c) for c in _CHANNELS],
        "variant string, removed string",
    )
    # absorbing self-loops keep mass in purchase / null. The variant
    # list is the static enum above — identical to the old
    # edges.select("variant").distinct() whenever the corpus has any
    # transition at all (every variant keeps its src='start' rows),
    # and on an empty corpus both shapes produce an empty result (no
    # start mass ever reaches purchase either way).
    absorb = spark.createDataFrame(
        [
            (v, s, s, 1.0)
            for v in ["none", *_CHANNELS]
            for s in ("purchase", "null")
        ],
        "variant string, src string, dst string, p double",
    )
    edges = (
        base.crossJoin(F.broadcast(variants_df))
        .filter(
            F.col("removed").isNull()
            | (F.col("src") != F.col("removed"))
        )
        .select(
            "variant",
            "src",
            F.when(F.col("dst") == F.col("removed"), F.lit("null"))
            .otherwise(F.col("dst"))
            .alias("dst"),
            "p",
        )
        .groupBy("variant", "src", "dst")
        .agg(F.sum("p").alias("p"))
        .unionByName(absorb)
    )
    # Round 15 (guide §1.2 step 1 — fix the algorithm's distributed
    # shape, not its constants): the chain state space is FIXED
    # ((channels + 3 absorbing states) × variants — bounded by the
    # channel enum, independent of data scale), yet the old loop paid
    # 30 join+agg shuffle stages plus up to 30 eager localCheckpoint
    # job round-trips to propagate it (11.5 s Spark-only at sf0.1;
    # checkpoint cadence alone only reached 9.0 s because the ~60
    # stage launches remained). The v ← vP recurrence now runs as a
    # single scan-stage higher-order-function fold over a per-variant
    # edges-by-source map: each step pushes every present state's
    # mass along its out-edges, building the next mass map — the same
    # synchronous step, same presence semantics (a state appears iff
    # it received mass from a present predecessor; p > 0 always, so
    # presence ≡ reachability, exactly like the join's inner-match).
    # The previous step's map is referenced exactly ONCE per step and
    # OUTSIDE any lambda (as the fold's collection argument), so the
    # collapsed expression grows linearly in _ITERS and evaluation
    # never re-computes a prior step. All array/map orders are
    # sort_array-pinned, so the fold order — and therefore the
    # floating-point summation order — is deterministic on any
    # cluster at any parallelism (the certified outputs round to 6
    # decimals, same tolerance the partition-invariance sweeps
    # already exercise). The data-sized work (the transition counts
    # behind `edges`) keeps its distributed windows; only the
    # constant-size chain math moved into one stage. The loop_session
    # scope is gone because there is no longer a loop to isolate.
    ebs = (
        edges.groupBy("variant", "src")
        .agg(
            F.sort_array(F.collect_list(F.struct("dst", "p"))).alias(
                "outs"
            )
        )
        .groupBy("variant")
        .agg(
            F.map_from_entries(
                F.sort_array(F.collect_list(F.struct("src", "outs")))
            ).alias("ebs")
        )
    )
    def _step(prev: str) -> str:
        # prev appears exactly once, outside every lambda — linear
        # tree growth, single evaluation per step
        return (
            "aggregate("
            f"  map_entries({prev}),"
            "  cast(map() as map<string,double>),"
            "  (acc, ent) -> aggregate("
            "     coalesce(element_at(ebs, ent.key), "
            "              cast(array() as array<struct<dst:string,p:double>>)),"
            "     acc,"
            "     (a, e) -> map_concat("
            "        map_filter(a, (k, v) -> k != e.dst),"
            "        map(e.dst, coalesce(element_at(a, e.dst),"
            "                            cast(0 as double))"
            "                   + ent.value * e.p))))"
        )

    # one nested SQL string, one analysis pass (building it through 30
    # incremental withColumns re-analyzed a growing plan each time —
    # ~2 s of pure driver work at 30 layers)
    fold = "map('start', cast(1.0 as double))"
    for _ in range(_ITERS):
        fold = _step(fold)
    v = ebs.select(
        "variant", F.explode(F.expr(fold)).alias("state", "m")
    )
    conv = v.filter(F.col("state") == "purchase").select(
        "variant", F.col("m").alias("cv")
    )
    base_cv = conv.filter(F.col("variant") == "none").select(
        F.col("cv").alias("base_cv")
    )
    effects = (
        conv.filter(F.col("variant") != "none")
        .crossJoin(F.broadcast(base_cv))
        .select(
            "variant",
            "cv",
            ((F.col("base_cv") - F.col("cv")) / F.col("base_cv")).alias(
                "drop"
            ),
            "base_cv",
        )
    )
    w_all = Window.partitionBy()
    return (
        effects.select(
            F.col("variant").alias("removed_channel"),
            F.round("base_cv", 6).alias("base_conv"),
            F.round("cv", 6).alias("removed_conv"),
            F.round(
                F.col("drop") / F.sum("drop").over(w_all), 6
            ).alias("attribution_share"),
        )
        .orderBy("removed_channel")
    )


QUERIES = {
    "markov_transition_matrix": q_markov_transition_matrix,
    "markov_attribution_removal": q_markov_attribution_removal,
}

_TRANS_SQL = """
        seq AS MATERIALIZED (
          SELECT user_id, event_type,
                 row_number() OVER (PARTITION BY user_id
                   ORDER BY ts, event_id) AS rn,
                 min(CASE WHEN event_type = 'purchase' THEN rn0 END)
                   OVER (PARTITION BY user_id) AS first_buy
          FROM (
            SELECT user_id, event_type, ts, event_id,
                   row_number() OVER (PARTITION BY user_id
                     ORDER BY ts, event_id) AS rn0
            FROM events
          )
        ),
        kept AS MATERIALIZED (
          SELECT * FROM seq
          WHERE first_buy IS NULL OR rn <= first_buy
        ),
        steps AS (
          SELECT COALESCE(lag(event_type) OVER (PARTITION BY user_id
                   ORDER BY rn), 'start') AS src,
                 event_type AS dst
          FROM kept
        ),
        lasts AS (
          SELECT k.event_type AS src, 'null' AS dst
          FROM kept k
          JOIN (
            SELECT user_id, max(rn) AS last_rn,
                   max(first_buy) AS fb
            FROM kept GROUP BY 1
          ) m ON k.user_id = m.user_id AND k.rn = m.last_rn
          WHERE m.fb IS NULL
        ),
        trans AS MATERIALIZED (
          SELECT src, dst, count(*) AS n FROM (
            SELECT src, dst FROM steps
            UNION ALL
            SELECT src, dst FROM lasts
          ) GROUP BY 1, 2
        )
"""


def _attribution_oracle() -> str:
    chans = _CHANNELS
    variant_edges = ["""
        base AS MATERIALIZED (
          SELECT src, dst,
                 CAST(n AS DOUBLE)
                   / sum(n) OVER (PARTITION BY src) AS p
          FROM trans
        ),
        edges AS MATERIALIZED (
          SELECT variant, src, dst, sum(p) AS p FROM (
            SELECT 'none' AS variant, src, dst, p FROM base
"""]
    for c in chans:
        variant_edges.append(f"""
            UNION ALL
            SELECT '{c}', src,
                   CASE WHEN dst = '{c}' THEN 'null' ELSE dst END, p
            FROM base WHERE src != '{c}'
""")
    variant_edges.append("""
          ) GROUP BY 1, 2, 3
          UNION ALL
          SELECT v.variant, s.state, s.state, 1.0
          FROM (SELECT DISTINCT variant FROM (
                  SELECT 'none' AS variant
""")
    for c in chans:
        variant_edges.append(f"                  UNION ALL SELECT '{c}'\n")
    variant_edges.append("""
               )) v
          CROSS JOIN (SELECT 'purchase' AS state
                      UNION ALL SELECT 'null') s
        )""")
    parts = [_TRANS_SQL + "," + "".join(variant_edges)]
    prev = "v0"
    parts.append("""
        ,v0 AS MATERIALIZED (
          SELECT variant, 'start' AS state, 1.0 AS m
          FROM (SELECT DISTINCT variant FROM edges)
        )""")
    for i in range(1, _ITERS + 1):
        parts.append(f"""
        ,v{i} AS MATERIALIZED (
          SELECT e.variant, e.dst AS state, sum(v.m * e.p) AS m
          FROM {prev} v
          JOIN edges e ON v.variant = e.variant AND v.state = e.src
          GROUP BY 1, 2
        )""")
        prev = f"v{i}"
    parts.append(f"""
        ,conv AS (
          SELECT variant, m AS cv FROM {prev}
          WHERE state = 'purchase'
        ),
        basecv AS (SELECT cv AS base_cv FROM conv
                   WHERE variant = 'none'),
        eff AS (
          SELECT c.variant, c.cv, b.base_cv,
                 (b.base_cv - c.cv) / b.base_cv AS drp
          FROM conv c CROSS JOIN basecv b
          WHERE c.variant != 'none'
        )
        SELECT variant AS removed_channel,
               round(base_cv, 6) AS base_conv,
               round(cv, 6) AS removed_conv,
               round(drp / sum(drp) OVER (), 6) AS attribution_share
        FROM eff
        ORDER BY removed_channel""")
    return "WITH" + "".join(parts)


ORACLES = {
    "markov_transition_matrix": f"""
        WITH {_TRANS_SQL}
        SELECT src, dst, CAST(n AS BIGINT) AS n,
               round(CAST(n AS DOUBLE)
                 / sum(n) OVER (PARTITION BY src), 6) AS p
        FROM trans
        ORDER BY src, dst
    """,
    "markov_attribution_removal": _attribution_oracle(),
}
