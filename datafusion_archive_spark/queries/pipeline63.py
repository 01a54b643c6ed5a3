"""Pipeline wave 63 (round 5, sixty-first wave): subsequence mining —
the matrix-profile pair of readouts on the daily revenue series.

Both queries share one construction: every _W-day subsequence of the
daily revenue series becomes a row of _W lead() columns; all
non-overlapping subsequence pairs (|i−j| ≥ _W) get an exact euclidean
distance from the unrolled _W-term sum. That is the brute-force
matrix profile — O(n²) in the number of AGGREGATED days (≈3M pairs
at 2.4k days, scale-invariant in SF), the exact baseline the STOMP
family approximates.

- ``matrix_profile_motifs`` — the top-_TOP motif pairs: the most
  similar non-overlapping week-long windows (repeated structure —
  the "this week looks exactly like that week" detector).
- ``matrix_profile_discords`` — the top-_TOP discords: windows whose
  NEAREST non-overlapping neighbor is farthest (the most anomalous
  weeks — the subsequence-level complement of the pointwise
  ``events_anomaly_zscore``).

The reference has no window functions (``/root/reference/ROADMAP.md``).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

_W = 7
_TOP = 3


def _subseqs(spark, sf):
    daily = (
        spark.read.parquet(f"{sf}/orders.parquet")
        .groupBy(F.col("o_orderdate").alias("d"))
        .agg(
            F.round(
                F.sum(F.col("o_totalprice").cast("decimal(18,2)")), 0
            )
            .cast("double")
            .alias("y")
        )
    )
    w = Window.orderBy("d")
    cols = [F.col("y").alias("v0")] + [
        F.lead("y", k).over(w).alias(f"v{k}") for k in range(1, _W)
    ]
    seq = daily.select(
        "d", F.row_number().over(w).alias("t"), *cols
    )
    return seq.filter(F.col(f"v{_W - 1}").isNotNull())


def _pair_dists(spark, sf):
    s = _subseqs(spark, sf)
    a = s.select(
        F.col("d").alias("da"),
        F.col("t").alias("ta"),
        *[F.col(f"v{k}").alias(f"a{k}") for k in range(_W)],
    )
    b = s.select(
        F.col("d").alias("db"),
        F.col("t").alias("tb"),
        *[F.col(f"v{k}").alias(f"b{k}") for k in range(_W)],
    )
    d2 = sum(
        (F.col(f"a{k}") - F.col(f"b{k}"))
        * (F.col(f"a{k}") - F.col(f"b{k}"))
        for k in range(_W)
    )
    return (
        a.join(b, F.col("tb") >= F.col("ta") + _W)
        .select(
            "da", "db", "ta", "tb", F.sqrt(d2).alias("dist")
        )
    )


def q_matrix_profile_motifs(spark, sf):
    """Top-3 most similar non-overlapping week pairs."""
    return (
        _pair_dists(spark, sf)
        .select(
            F.col("da").alias("week_a_start"),
            F.col("db").alias("week_b_start"),
            F.round("dist", 2).alias("dist"),
        )
        .orderBy("dist", "week_a_start", "week_b_start")
        .limit(_TOP)
    )


def q_matrix_profile_discords(spark, sf):
    """Top-3 weeks whose nearest neighbor is farthest."""
    pd_ = _pair_dists(spark, sf)
    sym = pd_.select(
        F.col("ta").alias("t"), F.col("da").alias("d"), "dist"
    ).unionByName(
        pd_.select(
            F.col("tb").alias("t"), F.col("db").alias("d"), "dist"
        )
    )
    nn = sym.groupBy("t", "d").agg(F.min("dist").alias("nn_dist"))
    return (
        nn.select(
            F.col("d").alias("week_start"),
            F.round("nn_dist", 2).alias("nn_dist"),
        )
        .orderBy(F.desc("nn_dist"), "week_start")
        .limit(_TOP)
    )


QUERIES = {
    "matrix_profile_motifs": q_matrix_profile_motifs,
    "matrix_profile_discords": q_matrix_profile_discords,
}

_BASE_SQL = f"""
        daily AS (
          SELECT o_orderdate AS d,
                 CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,2))), 0)
                      AS DOUBLE) AS y
          FROM orders GROUP BY 1
        ),
        seq AS (
          SELECT d, row_number() OVER (ORDER BY d) AS t,
                 {", ".join(
                     f"lead(y, {k}) OVER (ORDER BY d) AS v{k}"
                     if k else "y AS v0"
                     for k in range(_W)
                 )}
          FROM daily
        ),
        subs AS (
          SELECT * FROM seq WHERE v{_W - 1} IS NOT NULL
        ),
        pd AS (
          SELECT a.d AS da, b.d AS db, a.t AS ta, b.t AS tb,
                 sqrt({" + ".join(
                     f"(a.v{k} - b.v{k}) * (a.v{k} - b.v{k})"
                     for k in range(_W)
                 )}) AS dist
          FROM subs a JOIN subs b ON b.t >= a.t + {_W}
        )
"""

ORACLES = {
    "matrix_profile_motifs": f"""
        WITH {_BASE_SQL}
        SELECT da AS week_a_start, db AS week_b_start,
               round(dist, 2) AS dist
        FROM pd
        ORDER BY dist, week_a_start, week_b_start
        LIMIT {_TOP}
    """,
    "matrix_profile_discords": f"""
        WITH {_BASE_SQL},
        sym AS (
          SELECT ta AS t, da AS d, dist FROM pd
          UNION ALL
          SELECT tb AS t, db AS d, dist FROM pd
        ),
        nn AS (
          SELECT t, d, min(dist) AS nn_dist FROM sym GROUP BY 1, 2
        )
        SELECT d AS week_start, round(nn_dist, 2) AS nn_dist
        FROM nn
        ORDER BY nn_dist DESC, week_start
        LIMIT {_TOP}
    """,
}
