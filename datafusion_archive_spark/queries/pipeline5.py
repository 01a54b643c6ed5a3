"""Pipeline wave 5 (round 5, third wave): the composed end-to-end
curation funnel, per-language score normalization, and snapshot
diffing.

- ``curation_funnel`` — the flagship composition: exact dedup →
  quality gate → benchmark decontamination chained over the corpus,
  reported as a per-stage funnel (docs and tokens surviving each
  stage). Every stage reuses the exact semantics of its individually
  certified query (``dedup_exact``, ``quality_filter_pipeline``,
  ``decontaminate_ngram_overlap``), so this row certifies that the
  stages COMPOSE — the form a real pretraining pipeline runs them in.
- ``quality_quantile_norm`` — per-language percent-rank normalization
  of the quality score: the scale-free form mixing weights and
  filtering thresholds should consume (a 0.7 raw score means something
  different in every language).
- ``snapshot_diff`` — classify rows between two table snapshots
  (added / removed / changed / unchanged) via a single full outer join
  on the key — the data-ops diff a pipeline runs before promoting a
  new snapshot. The "new" snapshot is derived deterministically from
  the base table (simulated deletes / price updates / inserts), and
  the oracle re-derives it, so the classification logic is what's
  being certified.

The reference stops at batch SQL (``/root/reference/ROADMAP.md:36-56``);
this family belongs to the training-data-pipeline extension mandate.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from datafusion_archive_spark.functions import text as TX
from datafusion_archive_spark.functions.rounding import (
    decimal_sum,
    decimal_sum_sql,
    round_half_up,
    round_half_up_sql,
)
from datafusion_archive_spark.operators.util import cached, spread
from datafusion_archive_spark.queries import llm as _llm
from datafusion_archive_spark.queries.pipeline3 import (
    _QF_BIT_LANG,
    _QF_BIT_LENGTH,
    _QF_BIT_QUALITY,
    _QF_BIT_REPETITION,
    _QF_LANGS,
    _QF_MAX_DUP_FRAC,
    _QF_MAX_TOKENS,
    _QF_MIN_QUALITY,
    _QF_MIN_TOKENS,
)
from datafusion_archive_spark.operators.util import load_table


def _t(spark, sf_dir, name):
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# End-to-end curation funnel
# ---------------------------------------------------------------------------

_FUNNEL_STAGES = [
    "raw",
    "after_exact_dedup",
    "after_quality_gate",
    "after_decontamination",
]


def q_curation_funnel(spark, sf):
    """Chain the certified curation stages in pipeline order and
    report the funnel: (stage, n_docs, n_tokens) for raw → exact-dedup
    survivors → quality-gate keepers → decontaminated.

    Stage semantics are byte-identical to the certified standalone
    rows: dedup keeps min(doc_id) per content fingerprint
    (queries/llm.q_dedup_exact), the quality gate is the
    reject-reason chain of pipeline3.q_quality_filter_pipeline, and
    decontamination drops docs sharing any 8-gram with the doc_id<20
    stand-in benchmark (llm.q_decontaminate).

    Plan: per-doc flags are computed in ONE pass over a cached
    signal table — the fingerprint-survivor flag via a window on fp
    (one Exchange, carries no text), the contamination flag via the
    broadcast benchmark-gram probe — then a single global aggregate
    with conditional sums produces the whole funnel; the 4 output
    rows are unpivoted from that one row. At 100 TB: two corpus
    scans (signals + gram probe), one fp shuffle, zero joins on the
    fact side except the broadcast gram probe.
    """
    # spread (round 15): the signal pass (quality score + dup ratio +
    # fingerprint) and the 8-gram probe are both regex/hash-heavy
    # scan kernels — a small-file scan is one task and serialized
    # them on one core; no-op at scale
    d = spread(_t(spark, sf, "documents"))
    w = F.split(TX.normalize_text(F.col("text")), " ")
    q = TX.quality_score(F.col("text"))
    dup = round_half_up(
        F.when(
            F.size(w) > 0,
            1.0 - F.size(F.array_distinct(w)) / F.size(w).cast("double"),
        ).otherwise(F.lit(0.0)),
        6,
    )
    ntok = F.size(w)
    reasons = (
        F.when(q < _QF_MIN_QUALITY, _QF_BIT_QUALITY).otherwise(0)
        + F.when(dup > _QF_MAX_DUP_FRAC, _QF_BIT_REPETITION).otherwise(0)
        + F.when(
            (ntok < _QF_MIN_TOKENS) | (ntok > _QF_MAX_TOKENS),
            _QF_BIT_LENGTH,
        ).otherwise(0)
        + F.when(~F.col("lang").isin(*_QF_LANGS), _QF_BIT_LANG).otherwise(0)
    )
    base = d.select(
        "doc_id",
        TX.fingerprint(F.col("text")).alias("fp"),
        ntok.alias("ntok"),
        (reasons == 0).alias("keep"),
    )
    surv = F.col("doc_id") == F.min("doc_id").over(Window.partitionBy("fp"))
    # contamination probe — same machinery as the certified
    # decontaminate_ngram_overlap row
    grams = d.select(
        F.col("doc_id").alias("id"),
        F.explode(
            F.array_distinct(TX.word_shingles(F.col("text"), 8))
        ).alias("g"),
    ).select("id", TX.hash64(F.col("g"), 0).alias("gh"))
    bench = (
        grams.filter(F.col("id") < 20).select("gh").distinct()
    )
    dirty = (
        grams.join(F.broadcast(bench), "gh").select("id").distinct()
    )
    flags = cached(
        base.withColumn("surv", surv)
        .join(dirty, base.doc_id == dirty.id, "left")
        .select(
            "doc_id",
            "ntok",
            "surv",
            "keep",
            F.col("id").isNotNull().alias("contaminated"),
        )
    )

    def stage_aggs(cond, suffix):
        return [
            F.sum(F.when(cond, 1).otherwise(0))
            .cast("long")
            .alias(f"d{suffix}"),
            F.sum(F.when(cond, F.col("ntok")).otherwise(0))
            .cast("long")
            .alias(f"t{suffix}"),
        ]

    s1 = F.col("surv")
    s2 = s1 & F.col("keep")
    s3 = s2 & ~F.col("contaminated")
    one = flags.agg(
        *stage_aggs(F.lit(True), 0),
        *stage_aggs(s1, 1),
        *stage_aggs(s2, 2),
        *stage_aggs(s3, 3),
    )
    names = ", ".join(
        f"{i}, '{n}', d{i}, t{i}" for i, n in enumerate(_FUNNEL_STAGES)
    )
    return one.selectExpr(
        f"stack(4, {names}) AS (stage, stage_name, n_docs, n_tokens)"
    ).select(
        F.col("stage").cast("int").alias("stage"),
        "stage_name",
        "n_docs",
        "n_tokens",
    )


# ---------------------------------------------------------------------------
# Per-language score normalization
# ---------------------------------------------------------------------------


def q_quality_quantile_norm(spark, sf):
    """Percent-rank normalization of the quality score WITHIN each
    language: a 0.7 raw score is "good" in a low-scoring language and
    mediocre in a high-scoring one, so thresholds and mixture weights
    should consume the per-language quantile, not the raw score.

    Plan: ties share a rank (ordered by the score alone) so the
    result is deterministic and engine-portable. Since round 8 the
    rank comes from :func:`operators.ranks.bucketed_group_rank`
    rather than one window per language: a per-row percent_rank
    cannot drop rows, so the salted top-k escape hatch never applied
    here, and a 90%-one-language corpus concentrated that language's
    whole sort in one task. The bucketed rank's widest sort is
    (lang, score-bucket)-sized; percent_rank derives from (rank, n)
    as a scan expression (differential-pinned in tests/test_round8.py).
    """
    from datafusion_archive_spark.operators.ranks import (
        bucketed_group_rank,
        percent_rank_expr,
    )

    d = _t(spark, sf, "documents")
    q = TX.quality_score(F.col("text"))
    scored = d.select("doc_id", "lang", q.alias("quality"))
    ranked = bucketed_group_rank(scored, ["lang"], "quality", tiebreak=None)
    return ranked.select(
        "doc_id",
        "lang",
        "quality",
        round_half_up(
            percent_rank_expr(F.col("_rank"), F.col("_n")), 6
        ).alias("q_rank"),
    )


# ---------------------------------------------------------------------------
# Snapshot diff
# ---------------------------------------------------------------------------

# deterministic "next snapshot" of orders: delete keys % 97 == 0,
# raise price 10% for keys % 31 == 0, insert key+10_000_000 clones
# for keys % 113 == 0
_DEL_MOD, _UPD_MOD, _INS_MOD = 97, 31, 113
_INS_OFFSET = 10_000_000


def _snapshot_b(d):
    kept = d.filter(F.col("o_orderkey") % _DEL_MOD != 0).select(
        "o_orderkey",
        F.when(
            F.col("o_orderkey") % _UPD_MOD == 0,
            F.col("o_totalprice") * 1.1,
        )
        .otherwise(F.col("o_totalprice"))
        .alias("o_totalprice"),
    )
    inserted = d.filter(F.col("o_orderkey") % _INS_MOD == 0).select(
        (F.col("o_orderkey") + _INS_OFFSET).alias("o_orderkey"),
        "o_totalprice",
    )
    return kept.unionByName(inserted)


def q_snapshot_diff(spark, sf):
    """Classify every key across two snapshots of the orders table —
    added / removed / changed / unchanged — with row counts and the
    (coalesced) price mass per class. The promote-or-rollback check a
    pipeline runs before swapping a new snapshot in.

    Plan: ONE full outer join on the key (both sides shuffle on
    o_orderkey once — at 100 TB this is the minimum possible data
    movement for a diff), then a 4-group aggregate. The change test
    compares the mutated column directly (never a stringified row
    hash — float formatting is engine-specific, equality is not).
    """
    a = _t(spark, sf, "orders").select("o_orderkey", "o_totalprice")
    b = _snapshot_b(_t(spark, sf, "orders"))
    j = a.alias("a").join(
        b.alias("b"), F.col("a.o_orderkey") == F.col("b.o_orderkey"), "full"
    )
    change = (
        F.when(F.col("a.o_orderkey").isNull(), "added")
        .when(F.col("b.o_orderkey").isNull(), "removed")
        .when(
            F.col("a.o_totalprice") != F.col("b.o_totalprice"), "changed"
        )
        .otherwise("unchanged")
    )
    return (
        j.select(
            change.alias("change_type"),
            F.coalesce(F.col("b.o_totalprice"), F.col("a.o_totalprice")).alias(
                "price"
            ),
        )
        .groupBy("change_type")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            round_half_up(decimal_sum(F.col("price")), 2).alias(
                "total_price"
            ),
        )
    )


QUERIES = {
    "curation_funnel": q_curation_funnel,
    "quality_quantile_norm": q_quality_quantile_norm,
    "snapshot_diff": q_snapshot_diff,
}

_QF_REASONS_SQL = f"""(
      (CASE WHEN quality < {_QF_MIN_QUALITY}
            THEN {_QF_BIT_QUALITY} ELSE 0 END)
    + (CASE WHEN dup_frac > {_QF_MAX_DUP_FRAC}
            THEN {_QF_BIT_REPETITION} ELSE 0 END)
    + (CASE WHEN n_tokens < {_QF_MIN_TOKENS}
             OR n_tokens > {_QF_MAX_TOKENS}
            THEN {_QF_BIT_LENGTH} ELSE 0 END)
    + (CASE WHEN lang NOT IN {_QF_LANGS!r}
            THEN {_QF_BIT_LANG} ELSE 0 END))"""

ORACLES = {
    "curation_funnel": f"""
        WITH sig AS (
          SELECT doc_id, lang,
                 md5({_llm._NORM}) AS fp,
                 {_llm._QUALITY_SQL} AS quality,
                 {_llm._WORDS} AS w
          FROM documents
        ),
        scored AS (
          SELECT doc_id, fp, lang, quality,
                 floor((CASE WHEN len(w) > 0
                        THEN 1.0 - len(list_distinct(w))
                                   / CAST(len(w) AS DOUBLE)
                        ELSE 0.0 END) * 1000000 + 0.5) / 1000000.0
                   AS dup_frac,
                 CAST(len(w) AS INTEGER) AS n_tokens
          FROM sig
        ),
        flags0 AS (
          SELECT doc_id, n_tokens AS ntok,
                 doc_id = min(doc_id) OVER (PARTITION BY fp) AS surv,
                 {_QF_REASONS_SQL} = 0 AS keep
          FROM scored
        ),
        wl AS (SELECT doc_id, {_llm._WORDS} AS w FROM documents),
        grams AS (
          SELECT DISTINCT id, {_llm._hash64_sql('s', 0)} AS gh FROM (
            SELECT doc_id AS id, unnest({_llm._shingles_sql(8)}) AS s
            FROM wl
          )
        ),
        bench AS (SELECT DISTINCT gh FROM grams WHERE id < 20),
        dirty AS (
          SELECT DISTINCT id FROM grams JOIN bench USING (gh)
        ),
        flags AS (
          SELECT f.*, d.id IS NOT NULL AS contaminated
          FROM flags0 f LEFT JOIN dirty d ON f.doc_id = d.id
        ),
        one AS (
          SELECT
            CAST(count(*) AS BIGINT) AS d0,
            CAST(sum(ntok) AS BIGINT) AS t0,
            CAST(count(*) FILTER (surv) AS BIGINT) AS d1,
            CAST(coalesce(sum(ntok) FILTER (surv), 0) AS BIGINT) AS t1,
            CAST(count(*) FILTER (surv AND keep) AS BIGINT) AS d2,
            CAST(coalesce(sum(ntok) FILTER (surv AND keep), 0)
                 AS BIGINT) AS t2,
            CAST(count(*) FILTER (surv AND keep AND NOT contaminated)
                 AS BIGINT) AS d3,
            CAST(coalesce(sum(ntok)
                 FILTER (surv AND keep AND NOT contaminated), 0)
                 AS BIGINT) AS t3
          FROM flags
        )
        SELECT CAST(0 AS INTEGER) AS stage, 'raw' AS stage_name,
               d0 AS n_docs, t0 AS n_tokens FROM one
        UNION ALL SELECT 1, 'after_exact_dedup', d1, t1 FROM one
        UNION ALL SELECT 2, 'after_quality_gate', d2, t2 FROM one
        UNION ALL SELECT 3, 'after_decontamination', d3, t3 FROM one
    """,
    "quality_quantile_norm": f"""
        SELECT doc_id, lang, quality,
               {round_half_up_sql(
                   "percent_rank() OVER "
                   "(PARTITION BY lang ORDER BY quality)", 6)} AS q_rank
        FROM (
          SELECT doc_id, lang, {_llm._QUALITY_SQL} AS quality
          FROM documents
        )
    """,
    "snapshot_diff": f"""
        WITH b AS (
          SELECT o_orderkey,
                 CASE WHEN o_orderkey % {_UPD_MOD} = 0
                      THEN o_totalprice * 1.1
                      ELSE o_totalprice END AS o_totalprice
          FROM orders WHERE o_orderkey % {_DEL_MOD} <> 0
          UNION ALL
          SELECT o_orderkey + {_INS_OFFSET}, o_totalprice
          FROM orders WHERE o_orderkey % {_INS_MOD} = 0
        ),
        j AS (
          SELECT CASE WHEN a.o_orderkey IS NULL THEN 'added'
                      WHEN b.o_orderkey IS NULL THEN 'removed'
                      WHEN a.o_totalprice <> b.o_totalprice
                        THEN 'changed'
                      ELSE 'unchanged' END AS change_type,
                 coalesce(b.o_totalprice, a.o_totalprice) AS price
          FROM orders a FULL OUTER JOIN b
            ON a.o_orderkey = b.o_orderkey
        )
        SELECT change_type, count(*) AS n_rows,
               {round_half_up_sql(decimal_sum_sql("price"), 2)}
                 AS total_price
        FROM j GROUP BY 1
    """,
}
