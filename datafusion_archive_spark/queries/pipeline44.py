"""Pipeline wave 44 (round 5, forty-second wave): non-associative
stateful scans and exact Shapley attribution.

- ``inventory_clamped_scan`` — the operator class windows CANNOT
  express: a clamped running balance
  ``b_t = clamp(b_{t-1} + δ_t, 0, cap)`` (per-nation order backlog).
  Clamping makes the scan non-associative, so there is no
  partial-aggregate / window formulation — the Spark path is a
  grouped ``applyInPandas`` (one vectorized pass per nation,
  parallel across the 25 nation groups; at 100 TB the group count is
  the parallelism and each group's day grid stays small), checked
  EXACTLY against a DuckDB recursive CTE that replays the recurrence
  row by row. This certifies the engine's Arrow-batched stateful
  escape hatch against a declarative oracle.
- ``shapley_attribution`` — exact 3-player Shapley values for the
  view/click/signup touch channels on purchase conversion:
  coalition values v(S) = conversion rate of users whose exact touch
  set is S (8 coalitions from one bool_or pass over events), then
  φ_i = Σ_S s!(n−1−s)!/n! · (v(S∪i) − v(S)) unrolled over the 4
  subsets per channel. Efficiency axiom Σφ = v(N) − v(∅) is
  asserted in tests.

The reference has no UDFs-over-groups or joins
(``/root/reference/ROADMAP.md``).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import functions as F

_CAP = 25

_UP = ("1-URGENT", "2-HIGH")
_DOWN = ("4-NOT SPECIFIED", "5-LOW")


def _deltas(spark, sf):
    orders = spark.read.parquet(f"{sf}/orders.parquet")
    cust = spark.read.parquet(f"{sf}/customer.parquet")
    nation = spark.read.parquet(f"{sf}/nation.parquet")
    return (
        orders.join(
            cust.select("c_custkey", "c_nationkey"),
            orders.o_custkey == cust.c_custkey,
        )
        .join(
            F.broadcast(nation.select("n_nationkey", "n_name")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .groupBy(
            F.col("n_name").alias("nation"),
            F.col("o_orderdate").alias("d"),
        )
        .agg(
            (
                F.sum(
                    F.col("o_orderpriority").isin(*_UP).cast("long")
                )
                - F.sum(
                    F.col("o_orderpriority").isin(*_DOWN).cast("long")
                )
            ).alias("delta")
        )
    )


_SCAN_SCHEMA = (
    "nation string, final_backlog long, max_backlog long, "
    "n_days_capped long, n_days_zero long"
)


def _scan_group(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.sort_values("d")
    b = 0
    mx = capped = zero = 0
    for delta in pdf["delta"].to_numpy():
        b = min(_CAP, max(0, b + int(delta)))
        mx = max(mx, b)
        if b == _CAP:
            capped += 1
        if b == 0:
            zero += 1
    return pd.DataFrame(
        {
            "nation": [pdf["nation"].iloc[0]],
            "final_backlog": [b],
            "max_backlog": [mx],
            "n_days_capped": [capped],
            "n_days_zero": [zero],
        }
    )


def q_inventory_clamped_scan(spark, sf):
    """Per-nation clamped backlog scan (grouped applyInPandas)."""
    return (
        _deltas(spark, sf)
        .groupBy("nation")
        .applyInPandas(_scan_group, schema=_SCAN_SCHEMA)
        .orderBy("nation")
    )


_CHANNELS = ("view", "click", "signup")


def _shapley_terms():
    """(channel, weight, base-coalition flags, plus-coalition flags)
    for every channel × subset-of-the-others — shared by the Spark
    build and the SQL oracle so both unroll identical algebra."""
    rows = []
    for i, ch in enumerate(_CHANNELS):
        others = [j for j in range(3) if j != i]
        for s0 in (0, 1):
            for s1 in (0, 1):
                w = 1.0 / 3.0 if (s0 + s1) in (0, 2) else 1.0 / 6.0
                base = {f"c{i}": 0, f"c{others[0]}": s0,
                        f"c{others[1]}": s1}
                plus = dict(base, **{f"c{i}": 1})
                rows.append(
                    (ch, w, base["c0"], base["c1"], base["c2"],
                     plus["c0"], plus["c1"], plus["c2"])
                )
    return rows


def q_shapley_attribution(spark, sf):
    """Exact Shapley conversion attribution over 3 touch channels.

    Scale: one user-keyed bool_or aggregate over the event stream is
    the only wide stage; the Shapley algebra runs on the 8-row
    coalition table (broadcast joins)."""
    ev = spark.read.parquet(f"{sf}/events.parquet")
    flags = ev.groupBy("user_id").agg(
        *[
            F.max((F.col("event_type") == c).cast("int")).alias(f"c{i}")
            for i, c in enumerate(_CHANNELS)
        ],
        F.max((F.col("event_type") == "purchase").cast("int")).alias(
            "conv"
        ),
    )
    coal = (
        flags.groupBy("c0", "c1", "c2")
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.avg(F.col("conv").cast("double")).alias("v"),
        )
    )
    # unroll phi_i over the 4 subsets S of the other two channels:
    # weight = |S|!(2-|S|)!/3!  ->  1/3 for |S| in {0,2}, 1/6 for 1
    terms = spark.createDataFrame(
        _shapley_terms(),
        "channel string, w double, b0 int, b1 int, b2 int, "
        "p0 int, p1 int, p2 int",
    )
    vb = coal.select(
        F.col("c0").alias("b0"), F.col("c1").alias("b1"),
        F.col("c2").alias("b2"), F.col("v").alias("v_base"),
    )
    vp = coal.select(
        F.col("c0").alias("p0"), F.col("c1").alias("p1"),
        F.col("c2").alias("p2"), F.col("v").alias("v_plus"),
    )
    joined = (
        terms.join(F.broadcast(vb), ["b0", "b1", "b2"], "left")
        .join(F.broadcast(vp), ["p0", "p1", "p2"], "left")
        .select(
            "channel",
            (
                F.col("w")
                * (
                    F.coalesce("v_plus", F.lit(0.0))
                    - F.coalesce("v_base", F.lit(0.0))
                )
            ).alias("term"),
        )
    )
    return (
        joined.groupBy("channel")
        .agg(F.round(F.sum("term"), 6).alias("shapley"))
        .orderBy("channel")
    )


QUERIES = {
    "inventory_clamped_scan": q_inventory_clamped_scan,
    "shapley_attribution": q_shapley_attribution,
}

_DELTAS_SQL = f"""
          SELECT n.n_name AS nation, o.o_orderdate AS d,
                 CAST(sum(CASE WHEN o.o_orderpriority IN
                          ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END)
                    - sum(CASE WHEN o.o_orderpriority IN
                          ('4-NOT SPECIFIED', '5-LOW') THEN 1 ELSE 0 END)
                    AS BIGINT) AS delta
          FROM orders o
          JOIN customer c ON o.o_custkey = c.c_custkey
          JOIN nation n ON c.c_nationkey = n.n_nationkey
          GROUP BY 1, 2
"""

ORACLES = {
    "inventory_clamped_scan": f"""
        -- the recurrence b_t = clamp(b_t-1 + δ_t, 0, cap) replayed as
        -- a per-nation ordered-list fold (list_reduce with a struct
        -- accumulator carrying the running balance and the three
        -- counters). One pass over the day grid — the previous
        -- RECURSIVE CTE re-joined the whole (nation, rn) table once
        -- per day-step (~2400 steps at sf0.1 → 151 s in the r10
        -- sweep); the fold is the same row-by-row recurrence without
        -- the per-iteration re-scan
        WITH deltas AS ({_DELTAS_SQL}),
        lst AS (
          SELECT nation, list(delta ORDER BY d) AS ds
          FROM deltas GROUP BY 1
        ),
        folded AS (
          -- field order is load-bearing: DuckDB 1.0 evaluates the
          -- lambda's struct literal with SEQUENTIAL field assignment
          -- (a later field reading acc.X sees the value just assigned
          -- to X, not the pre-step one). Assigning 'b' LAST means
          -- every counter expression reads the pre-update acc.b, so
          -- this fold is correct under both sequential and parallel
          -- lambda semantics
          SELECT nation,
                 list_reduce(
                   list_prepend(
                     {{'d': CAST(0 AS BIGINT), 'mx': CAST(0 AS BIGINT),
                       'capped': CAST(0 AS BIGINT),
                       'zero': CAST(0 AS BIGINT),
                       'b': CAST(0 AS BIGINT)}},
                     list_transform(ds, d ->
                       {{'d': CAST(d AS BIGINT), 'mx': CAST(0 AS BIGINT),
                         'capped': CAST(0 AS BIGINT),
                         'zero': CAST(0 AS BIGINT),
                         'b': CAST(0 AS BIGINT)}})),
                   (acc, x) -> {{
                     'd': CAST(0 AS BIGINT),
                     'mx': greatest(acc.mx,
                       least({_CAP}, greatest(0, acc.b + x.d))),
                     'capped': acc.capped + CASE
                       WHEN least({_CAP}, greatest(0, acc.b + x.d))
                            = {_CAP} THEN 1 ELSE 0 END,
                     'zero': acc.zero + CASE
                       WHEN least({_CAP}, greatest(0, acc.b + x.d))
                            = 0 THEN 1 ELSE 0 END,
                     'b': least({_CAP}, greatest(0, acc.b + x.d))
                   }}) AS st
          FROM lst
        )
        SELECT nation,
               CAST(st.b AS BIGINT) AS final_backlog,
               CAST(st.mx AS BIGINT) AS max_backlog,
               CAST(st.capped AS BIGINT) AS n_days_capped,
               CAST(st.zero AS BIGINT) AS n_days_zero
        FROM folded
        ORDER BY nation
    """,
    "shapley_attribution": f"""
        WITH flags AS (
          SELECT user_id,
                 max(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
                   AS c0,
                 max(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                   AS c1,
                 max(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)
                   AS c2,
                 max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                   AS conv
          FROM events GROUP BY 1
        ),
        coal AS (
          SELECT c0, c1, c2, avg(CAST(conv AS DOUBLE)) AS v
          FROM flags GROUP BY 1, 2, 3
        ),
        terms(channel, w, b0, b1, b2, p0, p1, p2) AS (
          VALUES
            {", ".join(
                f"('{ch}', {w!r}, {b0}, {b1}, {b2}, {p0}, {p1}, {p2})"
                for ch, w, b0, b1, b2, p0, p1, p2 in _shapley_terms()
            )}
        )
        SELECT t.channel,
               round(sum(t.w * (COALESCE(vp.v, 0.0)
                 - COALESCE(vb.v, 0.0))), 6) AS shapley
        FROM terms t
        LEFT JOIN coal vb ON vb.c0 = t.b0 AND vb.c1 = t.b1
                          AND vb.c2 = t.b2
        LEFT JOIN coal vp ON vp.c0 = t.p0 AND vp.c1 = t.p1
                          AND vp.c2 = t.p2
        GROUP BY 1
        ORDER BY 1
    """,
}
