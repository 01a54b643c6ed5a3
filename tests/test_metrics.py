"""Observation-based in-flight quality metrics
(operators/metrics.py): counters must match ground truth and cost no
extra scan."""

from __future__ import annotations

from pyspark.sql import functions as F

from datafusion_archive_spark.operators.metrics import observe_quality


def test_metrics_match_ground_truth(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    observed, obs = observe_quality(
        docs,
        null_cols=["text", "lang"],
        violation=F.col("n_chars") < 0,
    )
    # one action drives both the query and the metrics
    kept = observed.filter(F.col("lang") == "en").count()
    m = obs.get
    truth_rows = docs.count()
    truth_null_text = docs.filter(F.col("text").isNull()).count()
    assert m["n_rows"] == truth_rows
    assert m["n_null_text"] == truth_null_text
    assert m["n_null_lang"] == 0
    assert m["n_violations"] == 0
    # the downstream filter does not distort the observation point
    assert kept < truth_rows


def test_metrics_observe_post_transform_point(spark, sf_dir):
    """Observing AFTER a filter counts surviving rows only — the
    observation measures its point in the plan, not the scan."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    en = docs.filter(F.col("lang") == "en")
    observed, obs = observe_quality(en)
    n = observed.count()
    assert obs.get["n_rows"] == n
