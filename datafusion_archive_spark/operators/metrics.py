"""In-flight pipeline metrics via Spark's Observation API: quality
counters collected DURING a query's own execution — no second scan,
no extra job. The lakehouse "data quality as a side effect" pattern:
a 100 TB write can report row counts, null rates, and domain
violations for free, because the observe() node piggybacks on the
rows already flowing through the plan.

``observe_quality`` attaches an observation computing row count,
per-column null counts, and an optional domain-violation count to any
DataFrame; after ONE action on the returned frame, ``Observation.get``
yields the metrics dict.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F
from pyspark.sql.column import Column


def observe_quality(
    df: DataFrame,
    null_cols: list[str] | None = None,
    violation: Column | None = None,
    name: str = "quality",
) -> tuple[DataFrame, Observation]:
    """Attach quality counters to ``df``'s execution.

    Returns ``(observed_df, observation)`` — run exactly one action on
    ``observed_df``, then read ``observation.get``:

    - ``n_rows`` — rows that flowed through this point of the plan
    - ``n_null_<col>`` — nulls per requested column
    - ``n_violations`` — rows where ``violation`` held (if given)

    Scale: metrics are map-side accumulators merged by the driver —
    zero shuffle, zero extra pass; the only cost is the per-row
    counter updates inside the already-running stages."""
    metrics = [F.count(F.lit(1)).alias("n_rows")]
    # coalesce: SUM over zero rows is NULL, and callers compare these
    # counters numerically — an empty input must report 0, not None
    for c in null_cols or []:
        metrics.append(
            F.coalesce(
                F.sum(F.col(c).isNull().cast("long")), F.lit(0)
            ).alias(f"n_null_{c}")
        )
    if violation is not None:
        metrics.append(
            F.coalesce(
                F.sum(violation.cast("long")), F.lit(0)
            ).alias("n_violations")
        )
    obs = Observation(name)
    return df.observe(obs, *metrics), obs
