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

from datafusion_archive_spark.operators.util import cached, loop_session

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
    t = cached(_transitions(spark, sf))
    w_src = Window.partitionBy("src")
    base = t.select(
        "src",
        "dst",
        (F.col("n") / F.sum("n").over(w_src).cast("double")).alias(
            "p"
        ),
    )
    variants = [("none", None)] + [(c, c) for c in _CHANNELS]
    edge_frames = []
    for vname, removed in variants:
        e = base.select(
            F.lit(vname).alias("variant"),
            "src",
            (
                F.when(F.col("dst") == removed, F.lit("null"))
                .otherwise(F.col("dst"))
                if removed
                else F.col("dst")
            ).alias("dst"),
            "p",
        ).filter(F.col("src") != F.lit(removed or "__none__"))
        edge_frames.append(e)
    edges = edge_frames[0]
    for e in edge_frames[1:]:
        edges = edges.unionByName(e)
    # absorbing self-loops keep mass in purchase / null
    absorb = (
        edges.select("variant").distinct().crossJoin(
            spark.createDataFrame(
                [("purchase",), ("null",)], "state string"
            )
        )
        .select(
            "variant",
            F.col("state").alias("src"),
            F.col("state").alias("dst"),
            F.lit(1.0).alias("p"),
        )
    )
    edges = cached(
        edges.groupBy("variant", "src", "dst")
        .agg(F.sum("p").alias("p"))
        .unionByName(absorb)
    )
    # materialize the batched edge table under the caller's conf and
    # take its real size — the chain state space is (channels + 3
    # absorbing states) x variants, a few hundred rows, so the _ITERS
    # power steps are pure fixed overhead without the scoped loop
    # conf (AQE off, 1-partition shuffles)
    n_edges = edges.count()
    v = (
        edges.select("variant")
        .distinct()
        .select(
            "variant",
            F.lit("start").alias("state"),
            F.lit(1.0).alias("m"),
        )
        .localCheckpoint(eager=True)
    )
    with loop_session(spark, n_edges) as ls:
        edges_l = ls.handoff(edges)
        v_l = ls.handoff(v)
        for _ in range(_ITERS):
            vr = v_l.select(
                F.col("variant").alias("v_variant"),
                F.col("state").alias("v_state"),
                "m",
            )
            v_l = (
                vr.join(
                    edges_l,
                    (F.col("v_variant") == F.col("variant"))
                    & (F.col("v_state") == F.col("src")),
                )
                .groupBy("variant", "dst")
                .agg(F.sum(F.col("m") * F.col("p")).alias("m"))
                .withColumnRenamed("dst", "state")
                .localCheckpoint(eager=True)
            )
        v = ls.handback(v_l)
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
