"""Pipeline wave 43 (round 5, forty-first wave): unseen-species
estimation and the Mann–Kendall trend test.

- ``species_richness_chao1`` — per-language Chao1 bias-corrected
  richness Ŝ = D + f₁(f₁−1)/(2(f₂+1)) and the Good–Turing unseen
  probability mass f₁/N, from the same portable tokenization the
  vocab waves certify. This is the "how much vocabulary has the
  crawl NOT seen yet" estimator that sizes corpus-coverage curves —
  the forward-looking complement of the retrospective Heaps-law fit
  (``heaps_law_fit``).
- ``mann_kendall_trend`` — the Mann–Kendall monotone-trend test on
  daily revenue: S = Σ_{i<j} sgn(x_j − x_i), tie-corrected variance
  Var(S) = [n(n−1)(2n+5) − Σ t(t−1)(2t+5)]/18, continuity-corrected
  z, and a two-sided p via the shared A&S polynomial. Pairs come
  from a self-join over the AGGREGATED day grid (broadcast), the tie
  spectrum from one value-group aggregate — both scale-invariant in
  SF. Pettitt (``pettitt_changepoint``) locates a break; this tests
  the monotone alternative.

The reference has no aggregates beyond MIN/MAX and no text functions
(``/root/reference/ROADMAP.md``).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from datafusion_archive_spark.functions import text as TX
from datafusion_archive_spark.queries.llm import _WORDS
from datafusion_archive_spark.queries.pipeline35 import (
    _norm_sf_expr,
    _norm_sf_sql,
)


def q_species_richness_chao1(spark, sf):
    """Chao1 richness and Good–Turing unseen mass per language."""
    d = (
        spark.read.parquet(f"{sf}/documents.parquet")
        .filter(F.col("text").isNotNull())
    )
    toks = d.select(
        "lang",
        F.explode(
            F.split(TX.normalize_text(F.col("text")), " ")
        ).alias("token"),
    ).filter(F.length("token") > 0)
    freq = toks.groupBy("lang", "token").agg(
        F.count(F.lit(1)).alias("f")
    )
    f1 = F.sum((F.col("f") == 1).cast("long"))
    f2 = F.sum((F.col("f") == 2).cast("long"))
    return (
        freq.groupBy("lang")
        .agg(
            F.sum("f").alias("n_tokens"),
            F.count(F.lit(1)).alias("n_types"),
            f1.alias("f1"),
            f2.alias("f2"),
            F.round(
                F.count(F.lit(1)).cast("double")
                + f1.cast("double")
                * (f1 - 1).cast("double")
                / (2.0 * (f2 + 1).cast("double")),
                4,
            ).alias("chao1"),
            F.round(
                f1.cast("double") / F.sum("f").cast("double"), 6
            ).alias("gt_unseen_mass"),
        )
        .orderBy("lang")
    )


def q_mann_kendall_trend(spark, sf):
    """Tie-corrected Mann–Kendall z on the daily revenue series."""
    daily = (
        spark.read.parquet(f"{sf}/orders.parquet")
        .groupBy(F.col("o_orderdate").alias("d"))
        .agg(
            F.round(
                F.sum(F.col("o_totalprice").cast("decimal(18,2)")), 0
            )
            .cast("double")
            .alias("rev")
        )
    )
    a = daily.alias("a")
    b = daily.alias("b")
    s_stat = (
        a.join(F.broadcast(b), F.col("a.d") < F.col("b.d"))
        .agg(
            F.sum(
                F.signum(F.col("b.rev") - F.col("a.rev")).cast("long")
            ).alias("s"),
            F.count(F.lit(1)).alias("n_pairs"),
        )
    )
    ties = (
        daily.groupBy("rev")
        .agg(F.count(F.lit(1)).alias("t"))
        .agg(
            F.sum(
                F.col("t")
                * (F.col("t") - 1)
                * (2 * F.col("t") + 5)
            ).alias("tie_term"),
            F.sum("t").alias("n"),
        )
    )
    joined = s_stat.crossJoin(F.broadcast(ties))
    nn = F.col("n").cast("double")
    var = (
        nn * (nn - 1.0) * (2.0 * nn + 5.0)
        - F.col("tie_term").cast("double")
    ) / 18.0
    # continuity correction toward zero; S = 0 -> z = 0 exactly
    z = (
        F.col("s").cast("double")
        - F.signum(F.col("s").cast("double"))
    ) / F.sqrt(var)
    return joined.select(
        F.col("n").alias("n_days"),
        F.col("s").alias("s_stat"),
        F.round(F.sqrt(var), 4).alias("sd_s"),
        F.round(z, 6).alias("z_mk"),
        F.round(2.0 * _norm_sf_expr(z), 8).alias("p_two_sided"),
    )


QUERIES = {
    "species_richness_chao1": q_species_richness_chao1,
    "mann_kendall_trend": q_mann_kendall_trend,
}

ORACLES = {
    "species_richness_chao1": f"""
        WITH toks AS (
          SELECT lang, unnest({_WORDS}) AS token
          FROM documents WHERE text IS NOT NULL
        ),
        freq AS (
          SELECT lang, token, count(*) AS f FROM toks
          WHERE length(token) > 0 GROUP BY 1, 2
        )
        SELECT lang,
               CAST(sum(f) AS BIGINT) AS n_tokens,
               count(*) AS n_types,
               CAST(sum(CASE WHEN f = 1 THEN 1 ELSE 0 END) AS BIGINT)
                 AS f1,
               CAST(sum(CASE WHEN f = 2 THEN 1 ELSE 0 END) AS BIGINT)
                 AS f2,
               round(CAST(count(*) AS DOUBLE)
                 + CAST(sum(CASE WHEN f = 1 THEN 1 ELSE 0 END) AS DOUBLE)
                 * (sum(CASE WHEN f = 1 THEN 1 ELSE 0 END) - 1)
                 / (2.0 * (sum(CASE WHEN f = 2 THEN 1 ELSE 0 END) + 1)),
                 4) AS chao1,
               round(CAST(sum(CASE WHEN f = 1 THEN 1 ELSE 0 END)
                 AS DOUBLE) / sum(f), 6) AS gt_unseen_mass
        FROM freq
        GROUP BY lang
        ORDER BY lang
    """,
    "mann_kendall_trend": f"""
        WITH daily AS (
          SELECT o_orderdate AS d,
                 CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,2))), 0)
                      AS DOUBLE) AS rev
          FROM orders GROUP BY 1
        ),
        s AS (
          SELECT CAST(sum(sign(b.rev - a.rev)) AS BIGINT) AS s_val
          FROM daily a JOIN daily b ON a.d < b.d
        ),
        ties AS (
          SELECT CAST(sum(t * (t - 1) * (2 * t + 5)) AS DOUBLE)
                   AS tie_term,
                 CAST(sum(t) AS BIGINT) AS n
          FROM (SELECT count(*) AS t FROM daily GROUP BY rev)
        )
        SELECT n AS n_days,
               s_val AS s_stat,
               round(sqrt((CAST(n AS DOUBLE) * (n - 1) * (2 * n + 5)
                 - tie_term) / 18.0), 4) AS sd_s,
               round((s_val - sign(s_val))
                 / sqrt((CAST(n AS DOUBLE) * (n - 1) * (2 * n + 5)
                   - tie_term) / 18.0), 6) AS z_mk,
               round(2.0 * {_norm_sf_sql(
                   "((s_val - sign(s_val))"
                   " / sqrt((CAST(n AS DOUBLE) * (n - 1) * (2 * n + 5)"
                   " - tie_term) / 18.0))"
               )}, 8) AS p_two_sided
        FROM s, ties
    """,
}
