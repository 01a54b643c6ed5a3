"""Pipeline wave 16 (round 5, fourteenth wave): corpus-distribution
divergences, supervised categorical encodings, and the hashing trick.

- ``kl_divergence_lang`` — KL(P(token|lang) ‖ P(token|corpus)) per
  language: the language-drift / domain-shift monitor every
  mixed-corpus training pipeline tracks. Exact because every
  language token exists in the corpus distribution by construction
  (no smoothing needed on the q side).
- ``js_divergence_langs`` — pairwise Jensen–Shannon divergence
  between language token distributions: the symmetric, bounded
  corpus-similarity matrix used to pick mixture weights.
- ``target_encoding_nation`` — smoothed mean (target) encoding of
  customer nation against the urgent-order label:
  enc = (n·rate + m·prior)/(n + m), the leakage-controlled
  categorical encoder of tabular ML prep.
- ``woe_iv_price_bins`` — Weight-of-Evidence / Information-Value of
  equi-width price bins vs the high-priority label (Laplace-smoothed
  so empty cells stay finite): the credit-scoring feature screen.
- ``feature_hash_counts`` — the hashing trick: tokens bucketed into
  a fixed 64-dim space via the engine-portable md5 hash; output is
  the sparse (doc, bucket, count) representation that feeds linear
  models without a vocabulary.
- ``simpson_slopes`` — pooled vs per-group regression slope
  (extended price on quantity, by return flag): the Simpson's
  paradox screen — a pooled slope with a different sign than every
  group slope flags a confounded feature.

The reference has no logarithms, regression aggregates, or hashing
functions (``src/execution/expression.rs``; sqrt is its only math
fn, ``src/sqlplanner.rs:343-367``).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from datafusion_archive_spark.functions import text as TX
from datafusion_archive_spark.queries.llm import _WORDS, _hash64_sql
from datafusion_archive_spark.operators.util import cached, load_table


def _t(spark, sf_dir, name):
    return load_table(spark, sf_dir, name)


def _tokens(spark, sf):
    d = _t(spark, sf, "documents").filter(F.col("text").isNotNull())
    return d.select(
        "lang",
        F.explode(F.split(TX.normalize_text(F.col("text")), " ")).alias(
            "token"
        ),
    )


_TOKENS_SQL = f"""
          SELECT lang, unnest({_WORDS}) AS token
          FROM documents WHERE text IS NOT NULL
"""


# ---------------------------------------------------------------------------
# KL divergence: language vs corpus
# ---------------------------------------------------------------------------


def q_kl_divergence_lang(spark, sf):
    """Per language: distinct vocab, token count, and
    KL(P(token|lang) ‖ P(token|corpus)) in nats. Every language token
    occurs in the corpus distribution, so no q-side smoothing is
    needed and the sum is exact.

    Scale: tokens shuffle once as (lang, token) counts (map-side
    combined); the corpus distribution joins back on token (vocab-
    sized); lang totals broadcast."""
    toks = _tokens(spark, sf)
    # cached: the (lang, token) rollup fans out to several consumers;
    # uncached, each branch re-runs the corpus tokenization
    lt = cached(
        toks.groupBy("lang", "token").agg(F.count(F.lit(1)).alias("n"))
    )
    lang_tot = lt.groupBy("lang").agg(F.sum("n").alias("lt_tot"))
    corpus = lt.groupBy("token").agg(F.sum("n").alias("cn"))
    corpus_tot = corpus.agg(F.sum("cn").alias("c_tot"))
    p = F.col("n") / F.col("lt_tot")
    q = F.col("cn") / F.col("c_tot")
    return (
        lt.join(F.broadcast(lang_tot), "lang")
        .join(corpus, "token")
        .join(F.broadcast(corpus_tot))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_vocab"),
            F.sum("n").alias("n_tokens"),
            F.round(F.sum(p * F.log(p / q)), 6).alias("kl_nats"),
        )
    )


# ---------------------------------------------------------------------------
# Pairwise JS divergence between languages
# ---------------------------------------------------------------------------


def q_js_divergence_langs(spark, sf):
    """Jensen–Shannon divergence (nats) for every unordered language
    pair, with shared/union vocab counts. JSD = ½·KL(p‖m) + ½·KL(q‖m),
    m = (p+q)/2; a zero-probability side contributes 0 to its own KL
    term, so the full-outer token alignment reduces to coalesce(…, 0).

    Scale: distributions collapse to (lang, token) first; the pair
    grid is |langs|² (broadcast); token alignment is one hash agg on
    (pair, token) — never a per-pair full-outer join."""
    toks = _tokens(spark, sf)
    # cached: the (lang, token) rollup fans out to several consumers;
    # uncached, each branch re-runs the corpus tokenization
    lt = cached(
        toks.groupBy("lang", "token").agg(F.count(F.lit(1)).alias("n"))
    )
    lang_tot = lt.groupBy("lang").agg(F.sum("n").alias("tot"))
    dist = lt.join(F.broadcast(lang_tot), "lang").select(
        "lang", "token", (F.col("n") / F.col("tot")).alias("prob")
    )
    langs = lang_tot.select("lang")
    pairs = (
        langs.alias("a")
        .crossJoin(langs.alias("b"))
        .filter(F.col("a.lang") < F.col("b.lang"))
        .select(
            F.col("a.lang").alias("lang1"), F.col("b.lang").alias("lang2")
        )
    )
    joined = dist.join(
        F.broadcast(pairs),
        (F.col("lang") == F.col("lang1")) | (F.col("lang") == F.col("lang2")),
    )
    aligned = joined.groupBy("lang1", "lang2", "token").agg(
        F.coalesce(
            F.max(F.when(F.col("lang") == F.col("lang1"), F.col("prob"))),
            F.lit(0.0),
        ).alias("p"),
        F.coalesce(
            F.max(F.when(F.col("lang") == F.col("lang2"), F.col("prob"))),
            F.lit(0.0),
        ).alias("q"),
    )
    m = (F.col("p") + F.col("q")) / 2
    term = lambda x: F.when(
        x > 0, x * F.log(x / m)
    ).otherwise(F.lit(0.0))
    return aligned.groupBy("lang1", "lang2").agg(
        F.round(
            F.sum(0.5 * term(F.col("p")) + 0.5 * term(F.col("q"))), 6
        ).alias("jsd_nats"),
        F.sum(
            F.when((F.col("p") > 0) & (F.col("q") > 0), 1).otherwise(0)
        ).alias("n_shared_vocab"),
        F.count(F.lit(1)).alias("n_union_vocab"),
    )


# ---------------------------------------------------------------------------
# Smoothed target encoding
# ---------------------------------------------------------------------------

_TE_SMOOTH = 20.0


def q_target_encoding_nation(spark, sf):
    """Smoothed mean encoding of customer nation against the
    urgent-order label: enc = (n·rate + m·prior)/(n + m) with m = 20.
    Output per nation: order count, raw rate, encoded value, prior.

    Scale: one custkey shuffle join (AQE-managed) + broadcast nation;
    the label collapses map-side; the prior is a broadcast scalar."""
    o = _t(spark, sf, "orders").select(
        "o_custkey",
        F.when(F.col("o_orderpriority") == "1-URGENT", 1.0)
        .otherwise(0.0)
        .alias("y"),
    )
    c = _t(spark, sf, "customer").select("c_custkey", "c_nationkey")
    n = _t(spark, sf, "nation").select("n_nationkey", "n_name")
    # cached: the 25-row rollup feeds both the prior and the final
    # select; uncached, the orders-customer join runs twice
    per_nation = cached(
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(F.count(F.lit(1)).alias("n_orders"), F.sum("y").alias("ny"))
    )
    prior = per_nation.agg(
        (F.sum("ny") / F.sum("n_orders")).alias("prior")
    )
    rate = F.col("ny") / F.col("n_orders")
    enc = (F.col("ny") + _TE_SMOOTH * F.col("prior")) / (
        F.col("n_orders") + _TE_SMOOTH
    )
    return per_nation.join(F.broadcast(prior)).select(
        F.col("n_name").alias("nation"),
        "n_orders",
        F.round(rate, 6).alias("urgent_rate"),
        F.round(enc, 6).alias("encoded"),
        F.round("prior", 6).alias("prior"),
    )


# ---------------------------------------------------------------------------
# WOE / IV feature screen
# ---------------------------------------------------------------------------

_WOE_LO, _WOE_HI, _WOE_BINS = 0.0, 600000.0, 5


def q_woe_iv_price_bins(spark, sf):
    """Weight-of-Evidence and Information-Value of equi-width
    total-price bins against the high-priority label (URGENT/HIGH),
    Laplace-smoothed (+0.5 per cell) so empty cells stay finite:
    WOE_b = ln(good_share_b / bad_share_b),
    IV_b = (good_share_b − bad_share_b)·WOE_b.

    Scale: bin + label are scan-side codegen; the rollup is 5 groups;
    totals broadcast back."""
    o = _t(spark, sf, "orders").filter(F.col("o_totalprice") > 0)
    width = (_WOE_HI - _WOE_LO) / _WOE_BINS
    bin_of = F.least(
        F.greatest(
            F.floor((F.col("o_totalprice") - _WOE_LO) / width).cast("int"),
            F.lit(0),
        ),
        F.lit(_WOE_BINS - 1),
    )
    good = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    cells = o.groupBy(bin_of.alias("bin")).agg(
        F.sum(F.when(good, 1).otherwise(0)).alias("n_good"),
        F.sum(F.when(good, 0).otherwise(1)).alias("n_bad"),
    )
    tot = cells.agg(
        F.sum("n_good").alias("tg"), F.sum("n_bad").alias("tb")
    )
    gs = (F.col("n_good") + 0.5) / (F.col("tg") + 0.5 * _WOE_BINS)
    bs = (F.col("n_bad") + 0.5) / (F.col("tb") + 0.5 * _WOE_BINS)
    woe = F.log(gs / bs)
    return cells.join(F.broadcast(tot)).select(
        "bin",
        "n_good",
        "n_bad",
        F.round(woe, 6).alias("woe"),
        F.round((gs - bs) * woe, 6).alias("iv_part"),
    )


# ---------------------------------------------------------------------------
# Feature hashing
# ---------------------------------------------------------------------------

_FH_DIM = 64


def q_feature_hash_counts(spark, sf):
    """The hashing trick: tokens bucketed into a fixed 64-dim space
    with the engine-portable md5 hash; output is the sparse
    (doc_id, bucket, count) triplet list — vocabulary-free features
    for linear models. Total output is bounded by docs × 64.

    Scale: hash + modulo are scan-side codegen on the exploded token
    stream; one (doc, bucket) hash agg with map-side combine; doc
    text never shuffles."""
    d = _t(spark, sf, "documents").filter(F.col("text").isNotNull())
    toks = d.select(
        "doc_id",
        F.explode(F.split(TX.normalize_text(F.col("text")), " ")).alias(
            "token"
        ),
    )
    bucket = (TX.hash64(F.col("token")) % _FH_DIM).cast("int")
    return toks.groupBy("doc_id", bucket.alias("bucket")).agg(
        F.count(F.lit(1)).alias("cnt")
    )


# ---------------------------------------------------------------------------
# Simpson's paradox screen
# ---------------------------------------------------------------------------


def q_simpson_slopes(spark, sf):
    """Pooled vs per-group OLS slope of extended price on quantity by
    return flag — the Simpson's-paradox confounding screen (a pooled
    slope outside the range of the group slopes flags aggregation
    bias). 'ALL' is the pooled row.

    Scale: regr_slope/regr_r2 are map-side-combinable second-moment
    folds; the union adds one extra pass over the same pushed-down
    two-column scan."""
    li = _t(spark, sf, "lineitem").select(
        "l_returnflag", "l_quantity", "l_extendedprice"
    )
    grouped = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(
            F.expr("regr_slope(l_extendedprice, l_quantity)"), 4
        ).alias("slope"),
        F.round(F.expr("regr_r2(l_extendedprice, l_quantity)"), 6).alias(
            "r2"
        ),
    )
    pooled = li.agg(
        F.count(F.lit(1)).alias("n"),
        F.round(
            F.expr("regr_slope(l_extendedprice, l_quantity)"), 4
        ).alias("slope"),
        F.round(F.expr("regr_r2(l_extendedprice, l_quantity)"), 6).alias(
            "r2"
        ),
    ).select(F.lit("ALL").alias("l_returnflag"), "n", "slope", "r2")
    return grouped.unionByName(pooled)


QUERIES = {
    "kl_divergence_lang": q_kl_divergence_lang,
    "js_divergence_langs": q_js_divergence_langs,
    "target_encoding_nation": q_target_encoding_nation,
    "woe_iv_price_bins": q_woe_iv_price_bins,
    "feature_hash_counts": q_feature_hash_counts,
    "simpson_slopes": q_simpson_slopes,
}

ORACLES = {
    "kl_divergence_lang": f"""
        WITH toks AS ({_TOKENS_SQL}),
        lt AS (
          SELECT lang, token, count(*) AS n FROM toks GROUP BY 1, 2
        ),
        lang_tot AS (SELECT lang, sum(n) AS lt_tot FROM lt GROUP BY 1),
        corpus AS (SELECT token, sum(n) AS cn FROM lt GROUP BY 1),
        c_tot AS (SELECT sum(cn) AS c_tot FROM corpus)
        SELECT lt.lang,
               count(*) AS n_vocab,
               CAST(sum(lt.n) AS BIGINT) AS n_tokens,
               round(sum((lt.n / g.lt_tot)
                     * ln((lt.n / g.lt_tot) / (c.cn / t.c_tot))), 6)
                 AS kl_nats
        FROM lt
        JOIN lang_tot g USING (lang)
        JOIN corpus c USING (token)
        CROSS JOIN c_tot t
        GROUP BY lt.lang
    """,
    "js_divergence_langs": f"""
        WITH toks AS ({_TOKENS_SQL}),
        lt AS (
          SELECT lang, token, count(*) AS n FROM toks GROUP BY 1, 2
        ),
        lang_tot AS (SELECT lang, sum(n) AS tot FROM lt GROUP BY 1),
        dist AS (
          SELECT lt.lang, token, lt.n / g.tot AS prob
          FROM lt JOIN lang_tot g USING (lang)
        ),
        pairs AS (
          SELECT a.lang AS lang1, b.lang AS lang2
          FROM lang_tot a CROSS JOIN lang_tot b
          WHERE a.lang < b.lang
        ),
        aligned AS (
          SELECT p.lang1, p.lang2, d.token,
                 coalesce(max(CASE WHEN d.lang = p.lang1
                                   THEN d.prob END), 0) AS p,
                 coalesce(max(CASE WHEN d.lang = p.lang2
                                   THEN d.prob END), 0) AS q
          FROM dist d
          JOIN pairs p ON d.lang = p.lang1 OR d.lang = p.lang2
          GROUP BY 1, 2, 3
        )
        SELECT lang1, lang2,
               round(sum(
                 0.5 * CASE WHEN p > 0
                            THEN p * ln(p / ((p + q) / 2)) ELSE 0 END
                 + 0.5 * CASE WHEN q > 0
                              THEN q * ln(q / ((p + q) / 2)) ELSE 0 END
               ), 6) AS jsd_nats,
               CAST(sum(CASE WHEN p > 0 AND q > 0 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_shared_vocab,
               count(*) AS n_union_vocab
        FROM aligned GROUP BY 1, 2
    """,
    "target_encoding_nation": f"""
        WITH per_nation AS (
          SELECT n.n_name AS nation,
                 count(*) AS n_orders,
                 sum(CASE WHEN o.o_orderpriority = '1-URGENT'
                          THEN 1.0 ELSE 0.0 END) AS ny
          FROM orders o
          JOIN customer c ON o.o_custkey = c.c_custkey
          JOIN nation n ON c.c_nationkey = n.n_nationkey
          GROUP BY 1
        ),
        pr AS (SELECT sum(ny) / sum(n_orders) AS prior FROM per_nation)
        SELECT nation, n_orders,
               round(ny / n_orders, 6) AS urgent_rate,
               round((ny + {_TE_SMOOTH} * prior)
                     / (n_orders + {_TE_SMOOTH}), 6) AS encoded,
               round(prior, 6) AS prior
        FROM per_nation CROSS JOIN pr
    """,
    "woe_iv_price_bins": f"""
        WITH cells AS (
          SELECT least(greatest(CAST(floor((o_totalprice - {_WOE_LO})
                   / {(_WOE_HI - _WOE_LO) / _WOE_BINS}) AS INTEGER), 0),
                   {_WOE_BINS - 1}) AS bin,
                 sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                          THEN 1 ELSE 0 END) AS n_good,
                 sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                          THEN 0 ELSE 1 END) AS n_bad
          FROM orders WHERE o_totalprice > 0
          GROUP BY 1
        ),
        tot AS (SELECT sum(n_good) AS tg, sum(n_bad) AS tb FROM cells)
        SELECT bin,
               CAST(n_good AS BIGINT) AS n_good,
               CAST(n_bad AS BIGINT) AS n_bad,
               round(ln(((n_good + 0.5) / (tg + {0.5 * _WOE_BINS}))
                        / ((n_bad + 0.5) / (tb + {0.5 * _WOE_BINS}))), 6)
                 AS woe,
               round(((n_good + 0.5) / (tg + {0.5 * _WOE_BINS})
                      - (n_bad + 0.5) / (tb + {0.5 * _WOE_BINS}))
                     * ln(((n_good + 0.5) / (tg + {0.5 * _WOE_BINS}))
                          / ((n_bad + 0.5) / (tb + {0.5 * _WOE_BINS}))), 6)
                 AS iv_part
        FROM cells CROSS JOIN tot
    """,
    "feature_hash_counts": f"""
        WITH toks AS (
          SELECT doc_id, unnest({_WORDS}) AS token
          FROM documents WHERE text IS NOT NULL
        )
        SELECT doc_id,
               CAST({_hash64_sql("token", 0)} % {_FH_DIM} AS INTEGER)
                 AS bucket,
               count(*) AS cnt
        FROM toks GROUP BY 1, 2
    """,
    "simpson_slopes": """
        SELECT l_returnflag,
               count(*) AS n,
               round(regr_slope(l_extendedprice, l_quantity), 4) AS slope,
               round(regr_r2(l_extendedprice, l_quantity), 6) AS r2
        FROM lineitem GROUP BY 1
        UNION ALL
        SELECT 'ALL' AS l_returnflag,
               count(*) AS n,
               round(regr_slope(l_extendedprice, l_quantity), 4) AS slope,
               round(regr_r2(l_extendedprice, l_quantity), 6) AS r2
        FROM lineitem
    """,
}
