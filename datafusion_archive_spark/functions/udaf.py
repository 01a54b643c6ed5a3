"""Pandas GROUPED_AGG UDAFs — the reference's declared-only custom
aggregate surface (``FunctionType::Aggregate``,
``/root/reference/src/logicalplan.rs:25-28``; roadmap UDAF item).

NOTE: no ``from __future__ import annotations`` here on purpose —
PySpark resolves pandas_udf signatures from *evaluated* annotations,
and PEP 563 string-izes them, breaking registration.
"""

import numpy as np
import pandas as pd

from pyspark.sql.functions import pandas_udf


@pandas_udf("double")
def median_udaf(v: pd.Series) -> float:
    """Exact median via np.percentile's linear interpolation — the
    same interpolation as SQL ``quantile_cont``/``percentile``, so an
    external oracle reproduces it exactly. Arrow ships each group's
    values as one batch; use only where per-group cardinality is
    executor-memory bounded (grouped-agg UDAFs are unbounded-state by
    construction)."""
    return float(np.percentile(v, 50))
