"""Pipeline wave 37 (round 5, thirty-fifth wave): level-3 itemset
mining and surrogate-key generation.

- ``assoc_triples`` — Apriori level 3: frequent part TRIPLES across
  order baskets (top 20 by support, deterministic ties), with the
  confidence of the (a, b) ⇒ c rule. Items are pruned by the
  anti-monotone support cut before the 3-way self-join, which is
  cubic in BASKET size (≤ 7 lines), never in catalog size — the
  level-2 ``assoc_rules_pairs`` machinery deepened one level.
- ``surrogate_keys_hash`` — deterministic hash surrogate keys for
  the customer natural key, with the collision audit every
  hash-keyed warehouse must run: n_rows, n_distinct_natural,
  n_distinct_surrogate (equal ⇒ zero collisions at this scale —
  asserted). The portable md5-derived key means any engine
  regenerates identical surrogates — the property that makes
  cross-system joins on surrogates safe.

The reference has no joins or hashing (``/root/reference/ROADMAP.md``).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from datafusion_archive_spark.functions import text as TX
from datafusion_archive_spark.queries.llm import _hash64_sql
from datafusion_archive_spark.operators.util import cached, load_table


def _t(spark, sf_dir, name):
    return load_table(spark, sf_dir, name)


_TRI_MIN_ITEM = 20  # baskets an item must appear in before pairing
_TRI_TOPK = 20


def q_assoc_triples(spark, sf):
    """Top-20 frequent part triples with support and the
    confidence((a,b) ⇒ c) = support(abc)/support(ab) ratio.

    Scale: the frequent-item prune shrinks baskets first; the 3-way
    self-join shuffles on the basket key three co-partitioned ways;
    triple explosion is cubic in basket size only."""
    items = (
        _t(spark, sf, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    freq = (
        items.groupBy("l_partkey")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= _TRI_MIN_ITEM)
        .select("l_partkey")
    )
    # cached: the pruned basket rows are read three co-partitioned
    # ways (a, b, c) — uncached, the distinct+prune re-runs per side
    pruned = cached(
        items.join(freq, "l_partkey").select("l_orderkey", "l_partkey")
    )
    a = pruned.alias("a")
    b = pruned.alias("b")
    c = pruned.alias("c")
    # Materialize the level-2 candidate rows ONCE: both the triple
    # extension and the pair-support denominator derive from it, so
    # the a×b join runs a single time, and every binary join below
    # carries an explicit orderkey equi-key (never an
    # inequality-only pairing that a reordering optimizer could
    # explode into |items|² rows).
    pair_rows = cached(a.join(
        b,
        (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
        & (F.col("a.l_partkey") < F.col("b.l_partkey")),
    ).select(
        F.col("a.l_orderkey").alias("l_orderkey"),
        F.col("a.l_partkey").alias("pa"),
        F.col("b.l_partkey").alias("pb"),
    ))
    triples = (
        pair_rows.alias("p")
        .join(
            c,
            (F.col("p.l_orderkey") == F.col("c.l_orderkey"))
            & (F.col("p.pb") < F.col("c.l_partkey")),
        )
        .groupBy("pa", "pb", F.col("c.l_partkey").alias("pc"))
        .agg(F.count(F.lit(1)).alias("support"))
    )
    pairs = pair_rows.groupBy("pa", "pb").agg(
        F.count(F.lit(1)).alias("support_ab")
    )
    return (
        triples.join(pairs, ["pa", "pb"])
        .select(
            "pa",
            "pb",
            "pc",
            "support",
            F.round(F.col("support") / F.col("support_ab"), 6).alias(
                "conf_ab_c"
            ),
        )
        .orderBy(F.desc("support"), "pa", "pb", "pc")
        .limit(_TRI_TOPK)
    )


def q_surrogate_keys_hash(spark, sf):
    """Hash surrogate keys for customers (portable md5-derived 60-bit
    key of the natural key) with the collision audit. One row:
    n_rows, n_distinct_natural, n_distinct_surrogate, n_collisions.

    Scale: key generation is scan-side codegen; the audit is one
    aggregate (count_distinct over 60-bit longs)."""
    c = _t(spark, sf, "customer").select(
        "c_custkey",
        TX.hash64(F.col("c_custkey").cast("string"), 7).alias("sk"),
    )
    return c.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count_distinct("c_custkey").alias("n_distinct_natural"),
        F.count_distinct("sk").alias("n_distinct_surrogate"),
        (
            F.count_distinct("c_custkey") - F.count_distinct("sk")
        ).alias("n_collisions"),
    )


QUERIES = {
    "assoc_triples": q_assoc_triples,
    "surrogate_keys_hash": q_surrogate_keys_hash,
}

ORACLES = {
    "assoc_triples": f"""
        WITH items AS (
          SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
        ),
        freq AS (
          SELECT l_partkey FROM items
          GROUP BY 1 HAVING count(*) >= {_TRI_MIN_ITEM}
        ),
        pruned AS (
          SELECT i.l_orderkey, i.l_partkey
          FROM items i JOIN freq USING (l_partkey)
        ),
        pair_rows AS (
          -- keep the orderkey so the triple extension below joins on
          -- an equi-key; a join whose only predicate is the partkey
          -- inequality would let the planner build |items|² rows
          SELECT a.l_orderkey, a.l_partkey AS pa, b.l_partkey AS pb
          FROM pruned a
          JOIN pruned b ON a.l_orderkey = b.l_orderkey
                       AND a.l_partkey < b.l_partkey
        ),
        triples AS (
          SELECT p.pa, p.pb, c.l_partkey AS pc, count(*) AS support
          FROM pair_rows p
          JOIN pruned c ON p.l_orderkey = c.l_orderkey
                       AND p.pb < c.l_partkey
          GROUP BY 1, 2, 3
        ),
        pairs AS (
          SELECT pa, pb, count(*) AS support_ab
          FROM pair_rows
          GROUP BY 1, 2
        )
        SELECT t.pa, t.pb, t.pc, t.support,
               round(CAST(t.support AS DOUBLE) / p.support_ab, 6)
                 AS conf_ab_c
        FROM triples t JOIN pairs p USING (pa, pb)
        ORDER BY t.support DESC, t.pa, t.pb, t.pc
        LIMIT {_TRI_TOPK}
    """,
    "surrogate_keys_hash": f"""
        WITH c AS (
          SELECT c_custkey,
                 {_hash64_sql("CAST(c_custkey AS VARCHAR)", 7)} AS sk
          FROM customer
        )
        SELECT count(*) AS n_rows,
               count(DISTINCT c_custkey) AS n_distinct_natural,
               count(DISTINCT sk) AS n_distinct_surrogate,
               count(DISTINCT c_custkey) - count(DISTINCT sk)
                 AS n_collisions
        FROM c
    """,
}
