"""Pipeline wave 38 (round 5, thirty-sixth wave): recursive closure
and exact integer apportionment.

- ``hierarchy_closure_rollup`` — the recursive-CTE surface: an
  ancestor closure computed by ITERATIVE joins over an edges table
  (Spark has no WITH RECURSIVE; the loop-of-joins is the canonical
  translation), checked exactly against DuckDB's native
  ``WITH RECURSIVE``. The hierarchy is the deterministic binary tree
  ``parent(p) = p DIV 2`` over ``part`` — but the Spark side treats
  it as DATA (an edges DataFrame joined per level), never as a
  formula, so the query genuinely exercises transitive closure.
  Rollup: for each shallow ancestor (node ≤ 15, the top 4 levels),
  the size and retail value of its proper-descendant subtree.
- ``apportion_largest_remainder`` — Hamilton / largest-remainder
  apportionment: allocate exactly ``_APPORTION_SEATS`` sample slots
  across nations proportional to customer counts. floor(quota) first,
  then the leftover seats go to the largest fractional remainders
  (ties broken by nation key — deterministic). The invariant every
  stratified-sampling planner needs: ``sum(alloc) == seats`` exactly,
  which naive ``round(quota)`` violates.

The reference has no recursion or window functions
(``/root/reference/ROADMAP.md``).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from datafusion_archive_spark.operators.util import load_table


def _t(spark, sf_dir, name):
    return load_table(spark, sf_dir, name)


_CLOSURE_MAX_NODE = 15  # report ancestors in the top 4 tree levels
_APPORTION_SEATS = 1000


def q_hierarchy_closure_rollup(spark, sf):
    """Subtree rollup over the transitive ancestor closure.

    Scale: each of the ~log2(n) iterations is one shuffle join of the
    shrinking frontier against the edges table on the ancestor key.
    The frontier is ``localCheckpoint``-ed per level — persist alone
    is NOT enough here: cache substitution happens at planning time,
    so every level's logical plan still nests all previous levels and
    the union's plan grows EXPONENTIALLY in depth (measured: a 3.4 MB
    plan text with ~1.5k scan nodes at 11 levels before the fix, the
    same lineage blowup the connected-components operator truncates
    the same way — ``operators/dedup.py``). After checkpointing, the
    union is a flat n-way union of materialized levels: linear in
    depth. At 100 TB the same loop runs with the edges side
    bucket-partitioned on ``node`` so every level joins co-located.
    """
    part = _t(spark, sf, "part")
    edges = (
        part.filter(F.col("p_partkey") >= 2)
        .select(
            F.col("p_partkey").alias("node"),
            F.expr("p_partkey DIV 2").alias("parent"),
        )
    )
    parent_of = edges.select(
        F.col("node").alias("ancestor"), F.col("parent").alias("nxt")
    )

    closure = edges.select("node", F.col("parent").alias("ancestor"))
    frontier = closure.localCheckpoint()
    levels = [frontier]
    while True:
        frontier = (
            frontier.join(parent_of, "ancestor")
            .select("node", F.col("nxt").alias("ancestor"))
            .localCheckpoint()
        )
        if frontier.isEmpty():
            break
        levels.append(frontier)
    full = levels[0]
    for lvl in levels[1:]:
        full = full.unionByName(lvl)

    out = (
        full.filter(F.col("ancestor") <= _CLOSURE_MAX_NODE)
        .join(
            part.select(
                F.col("p_partkey").alias("node"),
                F.col("p_retailprice").alias("price"),
            ),
            "node",
        )
        .groupBy("ancestor")
        .agg(
            F.count(F.lit(1)).alias("n_desc"),
            F.round(F.sum(F.col("price").cast("decimal(18,2)")), 2)
            .cast("double")
            .alias("subtree_value"),
        )
        .orderBy("ancestor")
    )
    return out


def q_apportion_largest_remainder(spark, sf):
    """Hamilton-method seat allocation of _APPORTION_SEATS sample
    slots across nations, proportional to customer counts.

    Scale: the only wide stage is the customer count (map-side
    combine); everything after runs on one 25-row dimension
    partition — the single-partition windows are over the nation
    dim, never the fact table."""
    cust = _t(spark, sf, "customer")
    nation = _t(spark, sf, "nation")
    counts = (
        cust.groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).alias("n_customers"))
        .join(
            nation.select(
                F.col("n_nationkey").alias("c_nationkey"),
                F.col("n_name").alias("nation"),
            ),
            "c_nationkey",
        )
    )
    w_all = Window.partitionBy()
    quota = (
        F.lit(float(_APPORTION_SEATS))
        * F.col("n_customers")
        / F.sum("n_customers").over(w_all)
    )
    with_quota = counts.select(
        "c_nationkey",
        "nation",
        "n_customers",
        quota.alias("quota"),
        F.floor(quota).cast("long").alias("fl"),
    )
    leftover = F.lit(_APPORTION_SEATS) - F.sum("fl").over(w_all)
    rk = F.row_number().over(
        w_all.orderBy(
            F.desc(F.col("quota") - F.col("fl")), F.col("c_nationkey")
        )
    )
    return (
        with_quota.select(
            "nation",
            "n_customers",
            F.round("quota", 6).alias("quota_r"),
            (
                F.col("fl")
                + F.when(rk <= leftover, F.lit(1)).otherwise(F.lit(0))
            ).alias("alloc"),
        )
        .orderBy(F.desc("alloc"), "nation")
    )


QUERIES = {
    "hierarchy_closure_rollup": q_hierarchy_closure_rollup,
    "apportion_largest_remainder": q_apportion_largest_remainder,
}

ORACLES = {
    "hierarchy_closure_rollup": f"""
        WITH RECURSIVE anc AS (
          SELECT p_partkey AS node, p_partkey // 2 AS ancestor
          FROM part WHERE p_partkey >= 2
          UNION ALL
          SELECT a.node, a.ancestor // 2
          FROM anc a WHERE a.ancestor >= 2
        )
        SELECT a.ancestor,
               count(*) AS n_desc,
               CAST(round(sum(CAST(p.p_retailprice AS DECIMAL(18,2))), 2)
                    AS DOUBLE) AS subtree_value
        FROM anc a JOIN part p ON a.node = p.p_partkey
        WHERE a.ancestor <= {_CLOSURE_MAX_NODE}
        GROUP BY 1
        ORDER BY 1
    """,
    "apportion_largest_remainder": f"""
        WITH counts AS (
          SELECT c.c_nationkey, n.n_name AS nation,
                 count(*) AS n_customers
          FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
          GROUP BY 1, 2
        ),
        q AS (
          SELECT c_nationkey, nation, n_customers,
                 {_APPORTION_SEATS}.0 * n_customers
                   / sum(n_customers) OVER () AS quota
          FROM counts
        ),
        f AS (
          SELECT *, CAST(floor(quota) AS BIGINT) AS fl,
                 {_APPORTION_SEATS} - sum(CAST(floor(quota) AS BIGINT))
                   OVER () AS leftover,
                 row_number() OVER (
                   ORDER BY quota - floor(quota) DESC, c_nationkey
                 ) AS rk
          FROM q
        )
        SELECT nation, n_customers,
               round(quota, 6) AS quota_r,
               fl + CASE WHEN rk <= leftover THEN 1 ELSE 0 END AS alloc
        FROM f
        ORDER BY alloc DESC, nation
    """,
}
