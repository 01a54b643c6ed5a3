"""Pipeline wave 9 (round 5, seventh wave): graph analytics over the
part co-purchase graph — triangle census and PageRank.

- ``graph_triangle_count`` — global triangle/wedge census + clustering
  coefficient via compact-forward degree orientation
  (operators/graph.py): the clumpiness measure for co-occurrence and
  near-dup candidate graphs.
- ``graph_pagerank`` — 8-iteration power-method PageRank, ranks
  scaled to mean 1: the link-authority quality prior of web-crawl
  curation. The oracle unrolls the same fixed-point iteration as an
  8-stage CTE chain, so the driver certifies every node's rank, not
  just a summary.

Graph: parts are nodes; an edge joins two parts that appear in at
least one common order (the same basket relation as
``assoc_rules_pairs``). The reference has no graph or iterative
surface (``/root/reference/ROADMAP.md``).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from datafusion_archive_spark.operators import graph as G
from datafusion_archive_spark.operators.util import load_table


def _t(spark, sf_dir, name):
    return load_table(spark, sf_dir, name)


def _part_edges(spark, sf):
    l = _t(spark, sf, "lineitem")
    return G.co_occurrence_edges(l, "l_orderkey", "l_partkey")


def q_graph_triangle_count(spark, sf):
    """Triangle census of the part co-purchase graph. The Spark path
    orients edges by (degree, id) rank so wedge fan-out is bounded by
    out-degree² (hub-proof); the oracle counts the same triangles with
    the naive canonical a<b<c 3-way join — identical totals."""
    return G.triangle_stats(_part_edges(spark, sf))


_PR_DAMPING = 0.85
_PR_ITERS = 8


def q_graph_pagerank(spark, sf):
    """Per-part PageRank over the co-purchase graph, 8 power
    iterations, damping 0.85, scaled to mean 1 and rounded to 6 —
    certifying the full fixed-point vector against the oracle's
    unrolled iteration."""
    ranks = G.pagerank(
        _part_edges(spark, sf),
        damping=_PR_DAMPING,
        iterations=_PR_ITERS,
    )
    return ranks.select("node", F.round("rank", 6).alias("rank"))


_GRAPH_SQL = """
        items AS (
          SELECT DISTINCT l_orderkey AS b, l_partkey AS i FROM lineitem
        ),
        edges AS (
          SELECT DISTINCT a.i AS src, b.i AS dst
          FROM items a JOIN items b ON a.b = b.b AND a.i < b.i
        )"""


def _pagerank_oracle() -> str:
    """Unrolled 8-iteration PageRank as a CTE chain."""
    d = _PR_DAMPING
    stages = [
        f"""
        directed AS (
          SELECT src, dst FROM edges
          UNION ALL
          SELECT dst AS src, src AS dst FROM edges
        ),
        deg AS (
          SELECT src AS node, count(*) AS deg FROM directed GROUP BY 1
        ),
        nn AS (SELECT count(*) AS n FROM deg),
        r0 AS (
          SELECT node, 1.0 / (SELECT n FROM nn) AS r FROM deg
        )"""
    ]
    for i in range(_PR_ITERS):
        stages.append(f"""
        r{i + 1} AS (
          SELECT e.dst AS node,
                 (1.0 - {d}) / (SELECT n FROM nn)
                   + {d} * sum(r.r / dg.deg) AS r
          FROM directed e
          JOIN r{i} r ON r.node = e.src
          JOIN deg dg ON dg.node = e.src
          GROUP BY e.dst
        )""")
    return (
        "WITH"
        + _GRAPH_SQL
        + ","
        + ",".join(stages)
        + f"""
        SELECT node,
               round(r * (SELECT n FROM nn), 6) AS rank
        FROM r{_PR_ITERS}
    """
    )


QUERIES = {
    "graph_triangle_count": q_graph_triangle_count,
    "graph_pagerank": q_graph_pagerank,
}

ORACLES = {
    "graph_triangle_count": f"""
        WITH{_GRAPH_SQL},
        deg AS (
          SELECT node, count(*) AS deg FROM (
            SELECT src AS node FROM edges
            UNION ALL
            SELECT dst AS node FROM edges
          ) GROUP BY node
        ),
        tri AS (
          SELECT count(*) AS n_triangles
          FROM edges e1
          JOIN edges e2 ON e2.src = e1.dst
          JOIN edges e3 ON e3.src = e1.src AND e3.dst = e2.dst
        ),
        totals AS (
          SELECT count(*) AS n_nodes,
                 CAST(sum(deg * (deg - 1)) / 2 AS BIGINT) AS n_wedges
          FROM deg
        ),
        ne AS (SELECT count(*) AS n_edges FROM edges)
        SELECT n_nodes, n_edges, n_wedges, n_triangles,
               round(3.0 * n_triangles / n_wedges, 6)
                 AS clustering_coeff
        FROM totals, ne, tri
    """,
    "graph_pagerank": _pagerank_oracle(),
}
