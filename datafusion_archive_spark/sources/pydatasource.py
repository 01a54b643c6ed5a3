"""A custom datasource through Spark's Python DataSource API — the
idiomatic Spark analog of implementing the reference engine's
``trait DataSource { fn schema(); fn scan() }``
(``/root/reference/src/execution/datasource.rs:31-43``): a new file
format plugged into the planner, readable via
``spark.read.format("fixedwidth")`` and the ``CREATE EXTERNAL TABLE …
STORED AS FIXEDWIDTH WIDTHS '…'`` DDL extension.

The format is classic mainframe fixed-width text: each column
occupies a fixed number of characters, no delimiters. Options:

- ``path``   — file or directory of ``.txt``/``.dat`` files
- ``widths`` — comma-separated column widths, e.g. ``'6,12,8'``

Scale notes: one InputPartition per file (the natural split unit for
an unsplittable row-text format — the same per-file parallelism
Spark's own text source falls back to); rows stream through the
reader generator, never materialized per-partition; value parsing is
schema-driven in the worker, so the driver only lists files.
"""

from __future__ import annotations

import os

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)
from pyspark.sql.types import StructType


def _list_files(path: str) -> list[str]:
    if os.path.isfile(path):
        return [path]
    out = []
    for root, _dirs, files in os.walk(path):
        for f in sorted(files):
            if not f.startswith((".", "_")):
                out.append(os.path.join(root, f))
    return sorted(out)


def _convert(raw: str, dt: str):
    s = raw.strip()
    if s == "":
        return None
    if dt in ("integer", "int", "long", "bigint", "short", "smallint"):
        return int(s)
    if dt in ("double", "float"):
        return float(s)
    if dt == "boolean":
        return s.lower() in ("true", "t", "1", "yes")
    return s


class _FixedWidthPartition(InputPartition):
    def __init__(self, file_path: str):
        self.file_path = file_path


class FixedWidthReader(DataSourceReader):
    def __init__(self, schema: StructType, options: dict):
        self.schema = schema
        self.path = options.get("path")
        if not self.path:
            raise ValueError("fixedwidth: the 'path' option is required")
        widths = options.get("widths")
        if not widths:
            raise ValueError("fixedwidth: the 'widths' option is required")
        self.widths = [int(w) for w in str(widths).split(",")]
        if len(self.widths) != len(schema.fields):
            raise ValueError(
                f"fixedwidth: {len(self.widths)} widths for "
                f"{len(schema.fields)} schema fields"
            )

    def partitions(self):
        return [_FixedWidthPartition(f) for f in _list_files(self.path)]

    def read(self, partition):
        types = [f.dataType.simpleString() for f in self.schema.fields]
        offsets = [0]
        for w in self.widths:
            offsets.append(offsets[-1] + w)
        with open(partition.file_path, encoding="utf-8") as fh:
            for line in fh:
                line = line.rstrip("\n")
                if not line.strip():
                    continue
                yield tuple(
                    _convert(line[offsets[i] : offsets[i + 1]], types[i])
                    for i in range(len(self.widths))
                )


class FixedWidthStreamReader(SimpleDataSourceStreamReader):
    """Streaming half of the format: micro-batches are NEW FILES in
    the directory (offset = how many of the sorted listing have been
    consumed — files must arrive append-only with increasing names,
    the standard file-stream contract). ``readBetweenOffsets`` replays
    a committed range deterministically from the same listing, which
    is what makes checkpoint recovery exactly-once."""

    def __init__(self, schema: StructType, options: dict):
        self._batch = FixedWidthReader(schema, options)

    def initialOffset(self) -> dict:
        return {"n_files": 0, "last": ""}

    def _rows_for(self, files):
        # a LIST, not a generator: Spark pickles the returned batch
        # to cache it for commit/replay, and generators can't pickle.
        # Bounded by design — the simple stream-reader API reads on
        # the driver and is for small per-trigger volumes (its
        # documented contract); high-rate sources belong on the
        # partition-planning DataSourceStreamReader instead.
        out = []
        for f in files:
            out.extend(self._batch.read(_FixedWidthPartition(f)))
        return out

    def _rel(self, f: str) -> str:
        """Offset key of a listed file: its path relative to the
        source root — NOT the basename, which would sort differently
        from the full-path-sorted listing once files live in
        subdirectories."""
        return os.path.relpath(f, self._batch.path)

    def _consumed_prefix(self, files, start: dict):
        """Split the listing at the committed offset BY NAME, not by
        position: offsets are (count, max-consumed-name) so a late
        file that sorts before already-consumed names is detected as
        a contract violation instead of silently shifting the index
        space (which would replay or skip rows)."""
        k = start.get("n_files", 0)
        if "last" not in start:
            # v1 offsets were positional-only ({"n_files": k}); a
            # checkpoint committed before the name-based format was
            # introduced must keep working — fall back to the old
            # positional slice for this one transition (read()/
            # readBetweenOffsets() emit name-based offsets from the
            # next commit on). Deriving last from files[:k] here would
            # just re-create the positional assumption with extra
            # steps, so slice directly.
            return files[k:]
        last = start["last"]
        prefix = [f for f in files if self._rel(f) <= last]
        if len(prefix) != k:
            raise RuntimeError(
                "fixedwidth stream: directory is not append-only — "
                f"{len(prefix)} files sort at or before the committed "
                f"offset {last!r} but {k} were consumed; a file "
                "arrived late with an out-of-order name"
            )
        return [f for f in files if self._rel(f) > last]

    def read(self, start: dict):
        files = _list_files(self._batch.path)
        new = self._consumed_prefix(files, start)
        end = {
            "n_files": len(files),
            "last": self._rel(files[-1]) if files else "",
        }
        # iter(): the runner drives the batch with next() and also
        # pickles it for the prefetch cache — a plain list satisfies
        # the pickling but not the iterator protocol
        return iter(self._rows_for(new)), end

    def readBetweenOffsets(self, start: dict, end: dict):
        files = _list_files(self._batch.path)
        unconsumed = self._consumed_prefix(files, start)
        if "last" not in end:
            # v1 end offset (positional-only): the committed batch
            # covered files[start_k:end_k] of the sorted listing
            take = end.get("n_files", 0) - start.get("n_files", 0)
            return iter(self._rows_for(unconsumed[:take]))
        last_end = end["last"]
        return iter(
            self._rows_for(
                [f for f in unconsumed if self._rel(f) <= last_end]
            )
        )


class FixedWidthDataSource(DataSource):
    """``spark.read.format("fixedwidth").schema(...)
    .option("widths", "6,12,8").load(path)``."""

    @classmethod
    def name(cls) -> str:
        return "fixedwidth"

    def schema(self):
        # no header line to infer from: all-string columns, one per
        # width, when the caller supplies no schema
        widths = self.options.get("widths")
        if not widths:
            raise ValueError("fixedwidth: the 'widths' option is required")
        n = len(str(widths).split(","))
        return ", ".join(f"c{i} string" for i in range(n))

    def reader(self, schema: StructType) -> DataSourceReader:
        return FixedWidthReader(schema, dict(self.options))

    def simpleStreamReader(self, schema: StructType):
        return FixedWidthStreamReader(schema, dict(self.options))


def register(spark) -> None:
    """Idempotent registration of the format with a session."""
    spark.dataSource.register(FixedWidthDataSource)
