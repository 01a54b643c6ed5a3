"""Pipeline wave 29 (round 5, twenty-seventh wave): warehouse
integrity auditing and distribution fitting.

- ``referential_integrity_audit`` — the FK/PK invariant sweep every
  warehouse runs after ingestion: orphan counts for each foreign-key
  relationship (orders→customer, lineitem→orders, lineitem→part,
  lineitem→supplier, customer→nation) plus primary-key duplicate
  counts — one verdict row per check.
- ``exponential_fit_gaps`` — fit an exponential law to the global
  event inter-arrival gaps (λ̂ = 1/mean) and measure the KS distance
  between the empirical CDF and the fitted CDF: the
  model-validation pass behind queueing/arrival assumptions.
- ``hill_tail_index`` — the Hill estimator of the Pareto tail index
  over the top-k order totals: α̂ = k / Σ ln(xᵢ/x₍ₖ₎) — the
  heavy-tail diagnostic for revenue concentration risk (finite-mean
  check: α > 1).

The reference has no joins, logs, or order statistics
(``/root/reference/ROADMAP.md``).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from datafusion_archive_spark.queries.timeseries import load_events
from datafusion_archive_spark.operators.util import cached, load_table


def _t(spark, sf_dir, name):
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# Referential integrity
# ---------------------------------------------------------------------------


def q_referential_integrity_audit(spark, sf):
    """One row per invariant: FK orphans (child keys with no parent)
    and PK duplicate counts. All zeros on healthy testdata — the
    checks are the product; a future ingestion bug flips a row.

    Scale: each FK check is a child-side distinct-key projection
    LEFT ANTI JOIN the parent's key column (broadcast where the
    parent is a dim); PK checks are one grouped count per table.
    A table referenced by several checks is scanned ONCE, pruned to
    the union of its key columns, and cached (VERDICT r7 #6: the
    audit previously paid 13 parquet scans, lineitem 3x) — the
    cached projections are key-only, so the working set is a few
    longs per row, never the wide fact row."""
    o = cached(
        _t(spark, sf, "orders").select("o_orderkey", "o_custkey")
    )
    li = cached(
        _t(spark, sf, "lineitem").select(
            "l_orderkey", "l_partkey", "l_suppkey"
        )
    )
    c = cached(
        _t(spark, sf, "customer").select("c_custkey", "c_nationkey")
    )
    p = cached(_t(spark, sf, "part").select("p_partkey"))
    s = _t(spark, sf, "supplier")
    n = _t(spark, sf, "nation")

    def orphans(child, ck, parent, pk, name):
        cnt = (
            child.select(F.col(ck).alias("k"))
            .join(
                parent.select(F.col(pk).alias("k")).distinct(),
                "k",
                "left_anti",
            )
            .agg(F.count(F.lit(1)).alias("n_violations"))
        )
        return cnt.select(
            F.lit(name).alias("check"), "n_violations"
        )

    def dup_pk(df, pk, name):
        cnt = (
            df.groupBy(pk)
            .agg(F.count(F.lit(1)).alias("c"))
            .filter(F.col("c") > 1)
            .agg(F.coalesce(F.sum("c"), F.lit(0)).alias("n_violations"))
        )
        return cnt.select(F.lit(name).alias("check"), "n_violations")

    checks = [
        orphans(o, "o_custkey", c, "c_custkey", "fk_orders_customer"),
        orphans(li, "l_orderkey", o, "o_orderkey", "fk_lineitem_orders"),
        orphans(li, "l_partkey", p, "p_partkey", "fk_lineitem_part"),
        orphans(li, "l_suppkey", s, "s_suppkey", "fk_lineitem_supplier"),
        orphans(c, "c_nationkey", n, "n_nationkey", "fk_customer_nation"),
        dup_pk(o, "o_orderkey", "pk_orders_unique"),
        dup_pk(c, "c_custkey", "pk_customer_unique"),
        dup_pk(p, "p_partkey", "pk_part_unique"),
    ]
    out = checks[0]
    for chk in checks[1:]:
        out = out.unionByName(chk)
    return out


# ---------------------------------------------------------------------------
# Exponential fit + KS distance
# ---------------------------------------------------------------------------


def q_exponential_fit_gaps(spark, sf):
    """Global event inter-arrival gaps (seconds): fitted exponential
    rate λ̂ = 1/mean and the KS distance sup|ECDF(x) − (1−e^{−λ̂x})|.
    One row: n_gaps, mean gap, λ̂, ks distance. A large D rejects the
    Poisson-arrival assumption.

    Scale (round 8): both global windows this query used were
    one-task sorts that grow with the corpus — the lag over the RAW
    event stream (the worst in the registry: fact-scale, no partition
    key at all) and the ECDF cumsum over the gap dictionary. The lag
    now runs through the distributed lag
    (operators/ranks.bucketed_group_lag: plain lag within each value
    bucket, bucket-boundary rows stitched from the bounded grid's
    per-bucket last values), and the ECDF cumsum is an exact integer
    bucketed running sum. The fitted CDF stays closed-form per
    value."""
    from datafusion_archive_spark.operators.ranks import (
        bucketed_group_lag,
        bucketed_group_rank,
    )

    e = load_events(spark, sf).select(
        F.unix_micros("ts").alias("us"), "event_id"
    )
    gaps = (
        bucketed_group_lag(e, [], "us", ["event_id"], [("us", "_us_prev")])
        .select(((F.col("us") - F.col("_us_prev")) / 1e6).alias("gap"))
        .filter(F.col("gap").isNotNull() & (F.col("gap") > 0))
    )
    # cached: the gap dictionary fans out into the totals aggregate
    # and the bucketed running-sum passes — fan-out-recompute fix
    per_val = cached(
        gaps.groupBy("gap").agg(F.count(F.lit(1)).alias("t"))
    )
    tot = per_val.agg(
        F.sum("t").alias("n"),
        (F.sum(F.col("gap") * F.col("t")) / F.sum("t")).alias("mu"),
    )
    ecdf = bucketed_group_rank(
        per_val, [], "gap", tiebreak=["gap"], running=[("t", "cum")]
    ).join(F.broadcast(tot))
    fitted = F.lit(1.0) - F.exp(-F.col("gap") / F.col("mu"))
    # KS over a step ECDF: check both the post-step and pre-step gap
    d_hi = F.abs(F.col("cum") / F.col("n") - fitted)
    d_lo = F.abs((F.col("cum") - F.col("t")) / F.col("n") - fitted)
    return ecdf.agg(
        F.max("n").alias("n_gaps"),
        F.round(F.max("mu"), 6).alias("mean_gap_s"),
        F.round(F.lit(1.0) / F.max("mu"), 6).alias("lambda_hat"),
        F.round(F.max(F.greatest(d_hi, d_lo)), 6).alias("ks_distance"),
    )


# ---------------------------------------------------------------------------
# Hill tail index
# ---------------------------------------------------------------------------

_HILL_K = 200


def q_hill_tail_index(spark, sf):
    """Hill estimator over the top-200 order totals:
    α̂ = k / Σ_{i=1..k} ln(xᵢ / x₍ₖ₊₁₎) with x₍ₖ₊₁₎ the (k+1)-largest
    value. One row: k, the threshold, α̂ (α ≤ 1 would mean an
    infinite-mean tail).

    Scale: the top-(k+1) selection is TakeOrderedAndProject — no
    global sort materializes; the estimator is one aggregate over
    k+1 rows."""
    o = _t(spark, sf, "orders").select(
        F.col("o_totalprice").alias("x"), "o_orderkey"
    )
    top = o.orderBy(F.desc("x"), "o_orderkey").limit(_HILL_K + 1)
    thresh = top.agg(F.min("x").alias("xk"))
    joined = top.join(F.broadcast(thresh)).filter(F.col("x") > F.col("xk"))
    return joined.agg(
        F.count(F.lit(1)).alias("k"),
        F.round(F.max("xk"), 2).alias("threshold"),
        F.round(
            F.count(F.lit(1)) / F.sum(F.log(F.col("x") / F.col("xk"))), 6
        ).alias("hill_alpha"),
    )


QUERIES = {
    "referential_integrity_audit": q_referential_integrity_audit,
    "exponential_fit_gaps": q_exponential_fit_gaps,
    "hill_tail_index": q_hill_tail_index,
}

ORACLES = {
    "referential_integrity_audit": """
        SELECT 'fk_orders_customer' AS "check",
               CAST((SELECT count(*) FROM orders o
                WHERE o.o_custkey NOT IN
                  (SELECT c_custkey FROM customer)) AS BIGINT)
                 AS n_violations
        UNION ALL
        SELECT 'fk_lineitem_orders',
               CAST((SELECT count(*) FROM lineitem l
                WHERE l.l_orderkey NOT IN
                  (SELECT o_orderkey FROM orders)) AS BIGINT)
        UNION ALL
        SELECT 'fk_lineitem_part',
               CAST((SELECT count(*) FROM lineitem l
                WHERE l.l_partkey NOT IN
                  (SELECT p_partkey FROM part)) AS BIGINT)
        UNION ALL
        SELECT 'fk_lineitem_supplier',
               CAST((SELECT count(*) FROM lineitem l
                WHERE l.l_suppkey NOT IN
                  (SELECT s_suppkey FROM supplier)) AS BIGINT)
        UNION ALL
        SELECT 'fk_customer_nation',
               CAST((SELECT count(*) FROM customer c
                WHERE c.c_nationkey NOT IN
                  (SELECT n_nationkey FROM nation)) AS BIGINT)
        UNION ALL
        SELECT 'pk_orders_unique',
               CAST((SELECT coalesce(sum(c), 0) FROM (
                  SELECT count(*) AS c FROM orders
                  GROUP BY o_orderkey HAVING count(*) > 1)) AS BIGINT)
        UNION ALL
        SELECT 'pk_customer_unique',
               CAST((SELECT coalesce(sum(c), 0) FROM (
                  SELECT count(*) AS c FROM customer
                  GROUP BY c_custkey HAVING count(*) > 1)) AS BIGINT)
        UNION ALL
        SELECT 'pk_part_unique',
               CAST((SELECT coalesce(sum(c), 0) FROM (
                  SELECT count(*) AS c FROM part
                  GROUP BY p_partkey HAVING count(*) > 1)) AS BIGINT)
    """,
    "exponential_fit_gaps": """
        WITH ordered AS (
          SELECT (epoch_us(ts) - lag(epoch_us(ts))
                  OVER (ORDER BY epoch_us(ts), event_id)) / 1e6 AS gap
          FROM events
        ),
        gaps AS (
          SELECT gap FROM ordered WHERE gap IS NOT NULL AND gap > 0
        ),
        per_val AS (
          SELECT gap, CAST(count(*) AS DOUBLE) AS t
          FROM gaps GROUP BY gap
        ),
        tot AS (
          SELECT sum(t) AS n, sum(gap * t) / sum(t) AS mu FROM per_val
        ),
        ecdf AS (
          SELECT gap, t,
                 sum(t) OVER (ORDER BY gap
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS cum
          FROM per_val
        )
        SELECT CAST(max(n) AS BIGINT) AS n_gaps,
               round(max(mu), 6) AS mean_gap_s,
               round(1.0 / max(mu), 6) AS lambda_hat,
               round(max(greatest(
                 abs(cum / n - (1.0 - exp(-gap / mu))),
                 abs((cum - t) / n - (1.0 - exp(-gap / mu))))), 6)
                 AS ks_distance
        FROM ecdf CROSS JOIN tot
    """,
    "hill_tail_index": f"""
        WITH top AS (
          SELECT o_totalprice AS x
          FROM orders ORDER BY o_totalprice DESC, o_orderkey
          LIMIT {_HILL_K + 1}
        ),
        th AS (SELECT min(x) AS xk FROM top)
        SELECT count(*) AS k,
               round(max(xk), 2) AS threshold,
               round(count(*) / sum(ln(x / xk)), 6) AS hill_alpha
        FROM top CROSS JOIN th
        WHERE x > xk
    """,
}
