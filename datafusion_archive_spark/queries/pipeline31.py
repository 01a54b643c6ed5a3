"""Pipeline wave 31 (round 5, twenty-ninth wave): corpus linguistics
and index-number analytics.

- ``token_dispersion`` — Church–Gale overdispersion for the top-30
  tokens: variance-to-mean ratio of per-document counts (VMR ≈ 1 →
  Poisson scatter ≈ function word; VMR ≫ 1 → bursty content word).
  The lexical statistic behind stopword induction and keyword
  weighting.
- ``price_index_laspeyres`` — the Laspeyres price index per year
  (base 1995): Σ p_t·q₀ / Σ p₀·q₀ over parts present in the base
  year, unit prices from the (part, year) rollup. The econ
  index-number machinery on the warehouse schema.
- ``heaps_law_fit`` — Heaps' vocabulary-growth law V(N) ≈ k·N^b:
  regress ln V on ln N over the cumulative (tokens-seen,
  vocab-seen) curve in doc_id order. The scaling diagnostic that
  says how much NEW vocabulary more data will buy — directly
  relevant to tokenizer and corpus planning.

The reference has no aggregates beyond SUM/MIN/MAX/COUNT/AVG and no
window functions (``src/execution/expression.rs:98-107``).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from datafusion_archive_spark.functions import text as TX
from datafusion_archive_spark.queries.llm import _WORDS
from datafusion_archive_spark.operators.util import cached, load_table


def _t(spark, sf_dir, name):
    return load_table(spark, sf_dir, name)


_DISP_TOPK = 30


def q_token_dispersion(spark, sf):
    """Top-30 tokens by corpus frequency with their per-document
    variance-to-mean ratio. Docs NOT containing a token contribute
    zero counts: VMR uses E[x²] over ALL docs, computed from the
    per-doc counts of docs that do contain it plus the known doc
    total — no dense doc×token grid is ever materialized.

    Scale: one (token, doc) rollup; the scalar doc count is a
    broadcast one-row aggregate (not a driver-side count action);
    TakeOrdered for the top-k."""
    d = _t(spark, sf, "documents").filter(F.col("text").isNotNull())
    nd = d.agg(F.count_distinct("doc_id").cast("double").alias("n_docs"))
    toks = d.select(
        "doc_id",
        F.explode(F.split(TX.normalize_text(F.col("text")), " ")).alias(
            "token"
        ),
    )
    per_doc = toks.groupBy("token", "doc_id").agg(
        F.count(F.lit(1)).cast("double").alias("c")
    )
    stats = per_doc.groupBy("token").agg(
        F.sum("c").alias("total"),
        F.sum(F.col("c") * F.col("c")).alias("sq"),
        F.count(F.lit(1)).alias("df"),
    )
    mean = F.col("total") / F.col("n_docs")
    # E[x^2] over all docs includes the (n_docs - df) zero cells
    var = F.col("sq") / F.col("n_docs") - mean * mean
    return (
        stats.join(F.broadcast(nd))
        .select(
            "token",
            F.col("total").cast("long").alias("n_occurrences"),
            F.col("df").alias("doc_freq"),
            F.round(var / mean, 6).alias("vmr"),
        )
        .orderBy(F.desc("n_occurrences"), "token")
        .limit(_DISP_TOPK)
    )


_IDX_BASE_YEAR = 1995


def q_price_index_laspeyres(spark, sf):
    """Laspeyres price index per year, base 1995 = 1: unit prices
    p(part, year) = Σ extendedprice / Σ quantity from the lineitem
    rollup; base quantities q₀ fix the basket. Only parts traded in
    BOTH the base year and year t enter year t's index (the standard
    matched-sample convention).

    Scale: one (part, year) rollup; the base-year slice joins back on
    l_partkey (dimension-sized); the index is a per-year fold."""
    li = _t(spark, sf, "lineitem")
    py = li.groupBy(
        "l_partkey", F.year(F.to_date("l_shipdate")).alias("yr")
    ).agg(
        (F.sum("l_extendedprice") / F.sum("l_quantity")).alias("p"),
        F.sum(F.col("l_quantity").cast("long")).alias("q"),
    )
    base = py.filter(F.col("yr") == _IDX_BASE_YEAR).select(
        "l_partkey", F.col("p").alias("p0"), F.col("q").alias("q0")
    )
    joined = py.join(base, "l_partkey")
    return (
        joined.groupBy("yr")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.round(
                F.sum(F.col("p") * F.col("q0"))
                / F.sum(F.col("p0") * F.col("q0")),
                6,
            ).alias("laspeyres_index"),
        )
    )


def q_heaps_law_fit(spark, sf):
    """Heaps'-law fit over the cumulative vocabulary-growth curve:
    scan docs in doc_id order, V(N) = distinct tokens after N total
    tokens; regress ln V on ln N. One row: k, b, r², final N and V.
    b well below 1 = sublinear vocabulary growth (the expected
    regime).

    Scale: first-occurrence flags come from each token's min doc_id
    (a token-dictionary rollup — the corpus never sorts); both
    cumulative sums run over the per-doc curve, which grows with the
    corpus, so since round 8 they are exact integer bucketed running
    sums (operators/ranks) instead of one unpartitioned window task
    sorting every doc_id."""
    d = _t(spark, sf, "documents").filter(F.col("text").isNotNull())
    toks = d.select(
        "doc_id",
        F.explode(F.split(TX.normalize_text(F.col("text")), " ")).alias(
            "token"
        ),
    )
    per_doc = toks.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_toks")
    )
    first_seen = toks.groupBy("token").agg(
        F.min("doc_id").alias("doc_id")
    )
    new_vocab = first_seen.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_new")
    )
    # cached: the per-doc curve fans out into the running-sum
    # machinery's stats/histogram/selection passes, each of which
    # would otherwise re-tokenize the corpus — fan-out-recompute fix
    curve = cached(
        per_doc.join(new_vocab, "doc_id", "left_outer").select(
            "doc_id",
            "n_toks",
            F.coalesce("n_new", F.lit(0)).alias("n_new"),
        )
    )
    from datafusion_archive_spark.operators.ranks import bucketed_group_rank

    cum = bucketed_group_rank(
        curve,
        [],
        "doc_id",
        tiebreak=["doc_id"],  # doc_id is unique on the curve
        running=[("n_toks", "n"), ("n_new", "v")],
    ).select("n", "v")
    logs = cum.select(
        F.log("n").alias("ln_n"), F.log("v").alias("ln_v")
    )
    fit = logs.agg(
        F.expr("regr_slope(ln_v, ln_n)").alias("b"),
        F.expr("regr_intercept(ln_v, ln_n)").alias("lk"),
        F.expr("regr_r2(ln_v, ln_n)").alias("r2"),
    )
    final = cum.agg(F.max("n").alias("n_tokens"), F.max("v").alias("vocab"))
    return fit.join(F.broadcast(final)).select(
        F.round(F.exp("lk"), 6).alias("k"),
        F.round("b", 6).alias("b"),
        F.round("r2", 6).alias("r2"),
        "n_tokens",
        "vocab",
    )


QUERIES = {
    "token_dispersion": q_token_dispersion,
    "price_index_laspeyres": q_price_index_laspeyres,
    "heaps_law_fit": q_heaps_law_fit,
}

ORACLES = {
    "token_dispersion": f"""
        WITH toks AS (
          SELECT doc_id, unnest({_WORDS}) AS token
          FROM documents WHERE text IS NOT NULL
        ),
        nd AS (
          SELECT CAST(count(DISTINCT doc_id) AS DOUBLE) AS n_docs
          FROM documents WHERE text IS NOT NULL
        ),
        per_doc AS (
          SELECT token, doc_id, CAST(count(*) AS DOUBLE) AS c
          FROM toks GROUP BY 1, 2
        ),
        stats AS (
          SELECT token, sum(c) AS total, sum(c * c) AS sq,
                 count(*) AS df
          FROM per_doc GROUP BY 1
        )
        SELECT token,
               CAST(total AS BIGINT) AS n_occurrences,
               CAST(df AS BIGINT) AS doc_freq,
               round((sq / n_docs - (total / n_docs) * (total / n_docs))
                     / (total / n_docs), 6) AS vmr
        FROM stats CROSS JOIN nd
        ORDER BY n_occurrences DESC, token
        LIMIT {_DISP_TOPK}
    """,
    "price_index_laspeyres": f"""
        WITH py AS (
          SELECT l_partkey,
                 year(CAST(l_shipdate AS DATE)) AS yr,
                 sum(l_extendedprice) / sum(l_quantity) AS p,
                 sum(CAST(l_quantity AS BIGINT)) AS q
          FROM lineitem GROUP BY 1, 2
        ),
        base AS (
          SELECT l_partkey, p AS p0, q AS q0
          FROM py WHERE yr = {_IDX_BASE_YEAR}
        )
        SELECT CAST(py.yr AS INTEGER) AS yr,
               count(*) AS n_parts,
               round(sum(py.p * base.q0) / sum(base.p0 * base.q0), 6)
                 AS laspeyres_index
        FROM py JOIN base USING (l_partkey)
        GROUP BY py.yr
    """,
    "heaps_law_fit": f"""
        WITH toks AS (
          SELECT doc_id, unnest({_WORDS}) AS token
          FROM documents WHERE text IS NOT NULL
        ),
        per_doc AS (
          SELECT doc_id, CAST(count(*) AS BIGINT) AS n_toks
          FROM toks GROUP BY 1
        ),
        first_seen AS (
          SELECT token, min(doc_id) AS doc_id FROM toks GROUP BY 1
        ),
        new_vocab AS (
          SELECT doc_id, CAST(count(*) AS BIGINT) AS n_new
          FROM first_seen GROUP BY 1
        ),
        curve AS (
          SELECT p.doc_id, p.n_toks, coalesce(v.n_new, 0) AS n_new
          FROM per_doc p LEFT JOIN new_vocab v USING (doc_id)
        ),
        cum AS (
          SELECT sum(n_toks) OVER w AS n, sum(n_new) OVER w AS v
          FROM curve
          WINDOW w AS (ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        ),
        logs AS (SELECT ln(n) AS ln_n, ln(v) AS ln_v FROM cum),
        fit AS (
          SELECT regr_slope(ln_v, ln_n) AS b,
                 regr_intercept(ln_v, ln_n) AS lk,
                 regr_r2(ln_v, ln_n) AS r2
          FROM logs
        ),
        final AS (
          SELECT CAST(max(n) AS BIGINT) AS n_tokens,
                 CAST(max(v) AS BIGINT) AS vocab
          FROM cum
        )
        SELECT round(exp(lk), 6) AS k,
               round(b, 6) AS b,
               round(r2, 6) AS r2,
               n_tokens, vocab
        FROM fit CROSS JOIN final
    """,
}
