"""Source/sink layer.

Reading is handled by :class:`~datafusion_archive_spark.context.
ExecutionContext` (CSV/NDJSON/Parquet registration — the reference's
``DataSource`` surface, ``src/execution/datasource.rs``). This package
adds the at-rest layout tools a 100 TB deployment needs:
:mod:`layout` — partitioned writes (partition pruning), bucketed
tables (shuffle-free joins), and compaction.
"""

from datafusion_archive_spark.sources.layout import (
    compact,
    write_bucketed,
    write_partitioned,
)

__all__ = ["compact", "write_bucketed", "write_partitioned"]
