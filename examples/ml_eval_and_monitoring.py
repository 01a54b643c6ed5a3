"""ML-evaluation and monitoring tour over the testdata tables — the
round-5 scoring/monitoring surface in one runnable script:

exact AUC-ROC (rank identity) → cumulative gains/lift → calibration
curve for a smoothed target encoder → PSI distribution drift →
KL divergence per language → bootstrap CI for a daily mean →
Jaro-Winkler fuzzy linkage.

Each block prints a small head of its result; every operator here is
also a certified `queries()` entry with an exact DuckDB oracle (see
`datafusion_archive_spark/queries/pipeline1{6,7,8,9}.py`).

Run: python examples/ml_eval_and_monitoring.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from datafusion_archive_spark.queries import _ALL_QUERIES
from datafusion_archive_spark.session import get_spark


BLOCKS = [
    ("exact AUC-ROC via rank identity", "auc_roc"),
    ("cumulative gains / lift deciles", "cumulative_gains"),
    ("calibration of the nation encoder", "calibration_curve"),
    ("PSI price-distribution drift", "psi_price_drift"),
    ("KL divergence per language", "kl_divergence_lang"),
    ("bootstrap 95% CI, mean daily revenue", "bootstrap_ci_mean"),
    ("Jaro-Winkler fuzzy part linkage", "jaro_winkler_linkage"),
]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("ml_eval_and_monitoring")
    for title, key in BLOCKS:
        print(f"\n== {title} ({key}) ==")
        _ALL_QUERIES[key](spark, sf_dir).show(5, truncate=False)


if __name__ == "__main__":
    main()
