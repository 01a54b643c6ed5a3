"""Grouped-map (applyInPandas) operators.

The preference order for custom operators is (a) DataFrame composition,
(b) applyInPandas/mapInPandas, (c) mapPartitions. This module is the
canonical (b): per-group pandas transforms for logic that wants a whole
group as a frame. Each group must fit one executor's memory — the
per-group frame is the unit of work, so at 100 TB the groupBy key is
chosen to bound group size (language → fine; user → fine; a global
key → wrong tool).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame


def zscore_by_group(
    df: DataFrame,
    group_col: str,
    value_col: str,
    out_col: str = "zscore",
) -> DataFrame:
    """Per-group z-score normalization via applyInPandas (pandas
    ``mean``/``std(ddof=1)`` — identical definitions to SQL
    avg/stddev_samp, so an exact SQL oracle exists). Groups with a
    single row or zero variance emit NULL."""
    in_fields = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    )
    schema = f"{in_fields}, {out_col} double"

    def normalize(pdf: pd.DataFrame) -> pd.DataFrame:
        std = pdf[value_col].std(ddof=1)
        mean = pdf[value_col].mean()
        if std and std > 0:
            z = ((pdf[value_col] - mean) / std * 10000 + 0.5).apply(
                lambda v: None if pd.isna(v) else __import__("math").floor(v)
            ) / 10000.0
        else:
            z = pd.Series([None] * len(pdf), index=pdf.index, dtype="float64")
        return pdf.assign(**{out_col: z})

    return df.groupBy(group_col).applyInPandas(normalize, schema)
