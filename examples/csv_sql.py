"""Canonical end-to-end example — the engine's twin of the reference's
``examples/csv_sql.rs`` (register a CSV with a declared schema, run
the canonical projection+filter query, print rows).

Run: python examples/csv_sql.py [path/to/cities.csv]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import tempfile

from datafusion_archive_spark import ExecutionContext, get_spark

DEMO_ROWS = """Aberdeen,57.15,-2.09
Brighton,50.83,-0.14
Cambridge,52.21,0.12
Durham,54.78,-1.58
Exeter,50.72,-3.53
Lincoln,53.23,-0.54
Oxford,51.75,-1.26
York,53.96,-1.08
"""


def main() -> None:
    if len(sys.argv) > 1:
        path = sys.argv[1]
    else:
        f = tempfile.NamedTemporaryFile(
            "w", suffix=".csv", delete=False
        )
        f.write(DEMO_ROWS)
        f.close()
        path = f.name

    ctx = ExecutionContext(get_spark("csv_sql_example"))
    # reference: examples/csv_sql.rs:33-42 — caller-declared schema,
    # headerless CSV (and unlike the reference, the first row survives)
    ctx.register_csv(
        "cities",
        path,
        schema=[("city", "utf8"), ("lat", "float64"), ("lng", "float64")],
        header=False,
    )
    # reference: examples/csv_sql.rs:45
    df = ctx.sql("SELECT city, lat, lng FROM cities WHERE lat > 51.0 AND lat < 53")
    for row in df.collect():
        print(f"{row.city}\t{row.lat}\t{row.lng}")


if __name__ == "__main__":
    main()
