"""Event-analytics tour over the testdata events table — the
round-4 warehouse surface in one runnable script:

hopping-window load curves → gap-filled per-user series with LOCF →
winsorized robust totals → first-week cohort retention → ordered
click→view→purchase funnel.

Each block prints a small head of its result; every operator here is
also a certified `queries()` entry with an exact DuckDB oracle (see
`datafusion_archive_spark/queries/{timeseries,pipeline2}.py`).

Run: python examples/event_analytics.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from datafusion_archive_spark.queries import _ALL_QUERIES
from datafusion_archive_spark.session import get_spark


BLOCKS = [
    ("hopping 1h/30min load curve", "events_hopping_window"),
    ("gap-filled 6h series + LOCF", "events_gapfill_locf"),
    ("winsorized totals (p05-p95 clip)", "winsorized_aggs"),
    ("cohort retention (first week x offset)", "cohort_retention"),
    ("ordered funnel", "events_funnel"),
]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("event_analytics")
    for title, key in BLOCKS:
        print(f"\n== {title} ({key}) ==")
        _ALL_QUERIES[key](spark, sf_dir).show(5, truncate=False)


if __name__ == "__main__":
    main()
