"""Dump `.explain("formatted")` for named queries to
plans/r16/<query>_<tag>.txt (tag = before/after). Usage:

    python tools/dump_plans_r16.py <tag> <query> [query ...]

Note some query builders run eager actions (loop queries execute their
iterations at build time); their plan text covers the returned frame —
the loop body's shape is documented in OPTIMIZATION_r16.md instead.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, "/root/repo")

from datafusion_archive_spark.queries import QUERIES
from datafusion_archive_spark.session import get_spark


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = "/root/repo/plans/r16"
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("dump_plans_r16")
    for name in names:
        df = QUERIES[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = f"{out_dir}/{name}_{tag}.txt"
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)")


if __name__ == "__main__":
    main()
