"""Pipeline wave 61 (round 5, fifty-ninth wave): M-estimation and
classifier auditing.

- ``huber_irls_regression`` — Huber M-estimated linear trend of
  daily revenue by _IRLS_ITERS iteratively-reweighted least-squares
  steps: start at OLS, freeze the robust scale s = 1.4826·MAD of
  the OLS residuals, then reweight w = min(1, c·s/|e|) (c = 1.345)
  and re-solve the closed-form weighted normal equations each step.
  Each iteration is one aggregate pass (5 weighted moments); the
  oracle unrolls identical iterations as MATERIALIZED CTEs. Sits
  between OLS (``regression_aggs``, 0% breakdown) and Theil–Sen
  (``theil_sen_slope``, 29%): ~95% Gaussian efficiency AND outlier
  resistance.
- ``langid_confusion_audit`` — the classifier audit for the
  certified marker-word language ID: confusion cells of declared
  lang × predicted lang with per-cell share of the declared lang's
  documents, plus the declared-lang recall on the diagonal. The
  composite that turns the per-doc ``text_lang_id`` surface into a
  quality readout.

The reference has no text functions or aggregates beyond MIN/MAX
(``/root/reference/ROADMAP.md``).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from datafusion_archive_spark.functions import text as TX

from datafusion_archive_spark.operators.util import cached

_IRLS_ITERS = 3
_HUBER_C = 1.345
_MAD_K = 1.4826


def _seq(spark, sf):
    daily = (
        spark.read.parquet(f"{sf}/orders.parquet")
        .groupBy(F.col("o_orderdate").alias("d"))
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("y")
        )
    )
    return daily.select(
        (F.row_number().over(Window.orderBy("d")) - 1)
        .cast("double")
        .alias("t"),
        "y",
    )


def q_huber_irls_regression(spark, sf):
    """Huber M-estimate of the daily-revenue trend line."""
    seq = cached(_seq(spark, sf))
    ols = seq.agg(
        F.count(F.lit(1)).alias("n"),
        F.avg("t").alias("mt"),
        F.avg("y").alias("my"),
        F.covar_samp("t", "y").alias("cv"),
        F.var_samp("t").alias("vt"),
    ).collect()[0]
    b = ols.cv / ols.vt
    a = ols.my - b * ols.mt
    resid = F.col("y") - (F.lit(a) + F.lit(b) * F.col("t"))
    s = (
        seq.agg(
            F.percentile(F.abs(resid), F.lit(0.5)).alias("mad")
        ).collect()[0]
        .mad
        * _MAD_K
    )
    for _ in range(_IRLS_ITERS):
        e = F.col("y") - (F.lit(a) + F.lit(b) * F.col("t"))
        w = F.least(F.lit(1.0), F.lit(_HUBER_C * s) / F.abs(e))
        m = seq.agg(
            F.sum(w).alias("sw"),
            F.sum(w * F.col("t")).alias("swt"),
            F.sum(w * F.col("y")).alias("swy"),
            F.sum(w * F.col("t") * F.col("t")).alias("swtt"),
            F.sum(w * F.col("t") * F.col("y")).alias("swty"),
        ).collect()[0]
        det = m.sw * m.swtt - m.swt * m.swt
        a = (m.swtt * m.swy - m.swt * m.swty) / det
        b = (m.sw * m.swty - m.swt * m.swy) / det
    e = F.col("y") - (F.lit(a) + F.lit(b) * F.col("t"))
    return seq.agg(
        F.count(F.lit(1)).alias("n_days"),
        F.round(F.lit(float(ols.cv / ols.vt)), 4).alias("ols_slope"),
        F.round(F.lit(b), 4).alias("huber_slope"),
        F.round(F.lit(a), 2).alias("huber_intercept"),
        F.round(F.lit(s), 2).alias("robust_scale"),
        F.round(
            F.avg(
                F.least(F.lit(1.0), F.lit(_HUBER_C * s) / F.abs(e))
            ),
            6,
        ).alias("mean_final_weight"),
    )


def q_langid_confusion_audit(spark, sf):
    """Declared × predicted language confusion with recall."""
    d = (
        spark.read.parquet(f"{sf}/documents.parquet")
        .filter(F.col("text").isNotNull())
        .select(
            "lang", TX.lang_id(F.col("text")).alias("lang_pred")
        )
    )
    w_lang = Window.partitionBy("lang")
    cells = d.groupBy("lang", "lang_pred").agg(
        F.count(F.lit(1)).alias("n")
    )
    return cells.select(
        "lang",
        "lang_pred",
        "n",
        F.round(
            F.col("n") / F.sum("n").over(w_lang).cast("double"), 6
        ).alias("share_of_declared"),
    ).orderBy("lang", "lang_pred")


QUERIES = {
    "huber_irls_regression": q_huber_irls_regression,
    "langid_confusion_audit": q_langid_confusion_audit,
}


def _huber_oracle() -> str:
    c, k = _HUBER_C, _MAD_K
    parts = [
        """
        daily AS MATERIALIZED (
          SELECT o_orderdate AS d,
                 CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
                      AS DOUBLE) AS y
          FROM orders GROUP BY 1
        ),
        seq AS MATERIALIZED (
          SELECT CAST(row_number() OVER (ORDER BY d) - 1 AS DOUBLE)
                   AS t, y
          FROM daily
        ),
        ols AS MATERIALIZED (
          SELECT count(*) AS n, avg(t) AS mt, avg(y) AS my,
                 covar_samp(t, y) / var_samp(t) AS b
          FROM seq
        ),
        fit0 AS MATERIALIZED (
          SELECT (SELECT my - b * mt FROM ols) AS a,
                 (SELECT b FROM ols) AS b
        ),
        scale AS MATERIALIZED (
          SELECT quantile_cont(abs(s.y - (f.a + f.b * s.t)), 0.5)
                   * {mad_k} AS s
          FROM seq s CROSS JOIN fit0 f
        )""".format(mad_k=k)
    ]
    prev = "fit0"
    for i in range(1, _IRLS_ITERS + 1):
        parts.append(
            f"""
        m{i} AS MATERIALIZED (
          SELECT sum(w) AS sw, sum(w * t) AS swt,
                 sum(w * y) AS swy, sum(w * t * t) AS swtt,
                 sum(w * t * y) AS swty
          FROM (
            SELECT s.t, s.y,
                   LEAST(1.0, {c} * (SELECT s FROM scale)
                     / abs(s.y - (f.a + f.b * s.t))) AS w
            FROM seq s CROSS JOIN {prev} f
          )
        ),
        fit{i} AS MATERIALIZED (
          SELECT (swtt * swy - swt * swty)
                   / (sw * swtt - swt * swt) AS a,
                 (sw * swty - swt * swy)
                   / (sw * swtt - swt * swt) AS b
          FROM m{i}
        )"""
        )
        prev = f"fit{i}"
    parts.append(
        f"""
        final AS (
          SELECT s.t, s.y, f.a, f.b,
                 LEAST(1.0, {c} * (SELECT s FROM scale)
                   / abs(s.y - (f.a + f.b * s.t))) AS w
          FROM seq s CROSS JOIN {prev} f
        )
        SELECT count(*) AS n_days,
               round((SELECT b FROM ols), 4) AS ols_slope,
               round(max(b), 4) AS huber_slope,
               round(max(a), 2) AS huber_intercept,
               round((SELECT s FROM scale), 2) AS robust_scale,
               round(avg(w), 6) AS mean_final_weight
        FROM final"""
    )
    return "WITH" + ",".join(parts)


def _confusion_oracle() -> str:
    from datafusion_archive_spark.functions.text import LANG_MARKERS

    score_exprs = []
    for lang, markers in LANG_MARKERS.items():
        terms = " + ".join(
            f"CAST((length(p) - length(replace(p, '{m}', '')))"
            f" / {len(m)} AS INT)"
            for m in markers
        )
        score_exprs.append(f"({terms}) AS s_{lang}")
    scores = ",\n                 ".join(score_exprs)
    langs = list(LANG_MARKERS)
    mx = "greatest(" + ", ".join(f"s_{la}" for la in langs) + ")"
    case = " ".join(f"WHEN s_{la} = mx THEN '{la}'" for la in langs)
    return f"""
        WITH padded AS (
          SELECT lang, ' ' || lower(text) || ' ' AS p
          FROM documents WHERE text IS NOT NULL
        ),
        scored AS (
          SELECT lang, {scores} FROM padded
        ),
        mxd AS (
          SELECT lang, {mx} AS mx, * FROM scored
        ),
        pred AS (
          SELECT lang,
                 CASE WHEN mx <= 0 THEN 'unknown' {case}
                      ELSE 'unknown' END AS lang_pred
          FROM mxd
        ),
        cells AS (
          SELECT lang, lang_pred, count(*) AS n
          FROM pred GROUP BY 1, 2
        )
        SELECT lang, lang_pred, n,
               round(CAST(n AS DOUBLE)
                 / sum(n) OVER (PARTITION BY lang), 6)
                 AS share_of_declared
        FROM cells
        ORDER BY lang, lang_pred
    """


ORACLES = {
    "huber_irls_regression": _huber_oracle(),
    "langid_confusion_audit": _confusion_oracle(),
}
