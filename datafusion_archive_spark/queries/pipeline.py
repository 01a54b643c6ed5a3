"""Composed pipeline queries — operators chained the way a real
training-data job uses them, verified end-to-end against one oracle.

``pipeline_clean_corpus`` is the canonical LLM-data shape: quality
gate → length gate → exact dedup (keep lowest id) → enriched output.
At 100 TB every stage is scan-side except the single dedup shuffle.

q7/q8 analogs extend the TPC-H join family with year extraction and
market-share arithmetic.
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from datafusion_archive_spark.functions import text as TX
from datafusion_archive_spark.functions.rounding import decimal_sum, round_half_up
from datafusion_archive_spark.operators.util import load_table


def _t(spark, sf_dir, name):
    return load_table(spark, sf_dir, name)


def q_pipeline_clean_corpus(spark, sf):
    """documents → quality ≥ 0.5 → ≥ 20 ws-tokens → exact dedup
    (survivor = min doc_id per fingerprint) → (doc_id, lang, quality,
    tokens). One shuffle (the dedup groupBy); filters and features are
    scan-side."""
    d = _t(spark, sf, "documents")
    t = F.col("text")
    enriched = d.select(
        "doc_id",
        "lang",
        TX.quality_score(t).alias("quality"),
        TX.token_count(t).alias("tokens"),
        TX.fingerprint(t).alias("fp"),
    ).filter((F.col("quality") >= 0.5) & (F.col("tokens") >= 20))
    w = Window.partitionBy("fp").orderBy("doc_id")
    return (
        enriched.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", "lang", "quality", "tokens")
    )


def q7_volume_between_nations(spark, sf):
    """Q7 shape: shipping volume between supplier-nation and
    customer-nation pairs per year. The year restriction is expressed
    as a shipdate range *before* the joins so it reaches the parquet
    scan as a pushed filter (year(l_shipdate) IN (1997, 1998) post-agg
    would be correct but scans every year through a 4-way join)."""
    l = _t(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01")
        & (F.col("l_shipdate") < "1999-01-01")
    )
    o = _t(spark, sf, "orders")
    c = _t(spark, sf, "customer")
    s = _t(spark, sf, "supplier")
    n1 = _t(spark, sf, "nation").select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    n2 = _t(spark, sf, "nation").select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), s.s_nationkey == F.col("s_nk"))
        .join(F.broadcast(n2), c.c_nationkey == F.col("c_nk"))
        .filter(F.col("supp_nation") < F.col("cust_nation"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").alias("l_year"),
        )
        .agg(
            round_half_up(
                decimal_sum(
                    F.col("l_extendedprice") * (1 - F.col("l_discount"))
                ),
                2,
            ).alias("volume")
        )
    )


def q8_market_share(spark, sf):
    """Q8 shape: one nation's share of regional revenue per year
    (conditional-sum ratio)."""
    l = _t(spark, sf, "lineitem")
    o = _t(spark, sf, "orders")
    c = _t(spark, sf, "customer")
    n = _t(spark, sf, "nation")
    r = _t(spark, sf, "region").filter(F.col("r_name") == "EUROPE")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    joined = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    )
    return (
        joined.groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.round(
                F.sum(F.when(F.col("n_name") == "NATION_3", rev).otherwise(0.0))
                / F.sum(rev),
                6,
            ).alias("mkt_share")
        )
    )


def q_quality_zscore(spark, sf):
    """applyInPandas grouped-map operator: per-language z-score of the
    quality signal (pandas mean/std(ddof=1) == SQL avg/stddev_samp, so
    the oracle is exact)."""
    from datafusion_archive_spark.operators.grouped import zscore_by_group

    d = _t(spark, sf, "documents")
    enriched = d.select(
        "doc_id", "lang", TX.quality_score(F.col("text")).alias("quality")
    )
    return zscore_by_group(enriched, "lang", "quality")


QUERIES = {
    "pipeline_clean_corpus": q_pipeline_clean_corpus,
    "text_quality_zscore": q_quality_zscore,
    "q7_volume_between_nations": q7_volume_between_nations,
    "q8_market_share": q8_market_share,
}

_QUALITY = """floor((
    least(CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS DOUBLE) / 100.0, 1.0) * 0.5
    + (1.0 - length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g'))
             / greatest(length(text), 1)) * 0.3
    + least((length(regexp_replace(trim(text), '\\s+', '', 'g'))
             / greatest(len(regexp_split_to_array(trim(text), '\\s+')), 1)) / 10.0, 1.0) * 0.2
    ) * 10000 + 0.5) / 10000.0"""

ORACLES = {
    "text_quality_zscore": f"""
        WITH q AS (
          SELECT doc_id, lang, {_QUALITY} AS quality FROM documents
        ),
        s AS (
          SELECT lang, avg(quality) AS m, stddev_samp(quality) AS sd
          FROM q GROUP BY lang
        )
        SELECT doc_id, q.lang, quality,
               CASE WHEN sd > 0
                    THEN floor((quality - m) / sd * 10000 + 0.5) / 10000.0
               END AS zscore
        FROM q JOIN s ON q.lang = s.lang
    """,
    "pipeline_clean_corpus": f"""
        WITH enriched AS (
          SELECT doc_id, lang,
                 {_QUALITY} AS quality,
                 CAST(len(regexp_split_to_array(trim(text), '\\s+'))
                      AS INTEGER) AS tokens,
                 md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))))
                   AS fp
          FROM documents
        ),
        gated AS (
          SELECT * FROM enriched WHERE quality >= 0.5 AND tokens >= 20
        ),
        surviving AS (
          SELECT *, row_number() OVER (PARTITION BY fp ORDER BY doc_id)
                   AS rn
          FROM gated
        )
        SELECT doc_id, lang, quality, tokens FROM surviving WHERE rn = 1
    """,
    "q7_volume_between_nations": """
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               CAST(year(l_shipdate) AS INTEGER) AS l_year,
               floor(CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(27,6))) AS DOUBLE) * 100 + 0.5) / 100.0 AS volume
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
        WHERE n1.n_name < n2.n_name
          AND year(l_shipdate) IN (1997, 1998)
        GROUP BY 1, 2, 3
    """,
    "q8_market_share": """
        SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
               round(sum(CASE WHEN n_name = 'NATION_3'
                              THEN l_extendedprice * (1 - l_discount)
                              ELSE 0.0 END)
                     / sum(l_extendedprice * (1 - l_discount)), 6)
                 AS mkt_share
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'EUROPE'
        GROUP BY 1
    """,
}
