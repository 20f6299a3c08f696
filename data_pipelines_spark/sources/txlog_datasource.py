"""Spark Python Data Source for txlog tables: `format("txlog")` batch
reads and a STREAMING source over the commit log.

Spark 4's Python Data Source API (SPARK-44076) lets the transactional
format plug into the planner like any built-in source:

- ``spark.read.format("txlog").option("path", p).load()`` — snapshot
  read (``version`` option = time travel), one input partition per
  live data file, rows shipped as Arrow record batches (the vectorized
  path, not row-at-a-time Python).
- ``spark.readStream.format("txlog").option("path", p).load()`` — the
  table AS a stream: each micro-batch emits the rows ADDED to the
  table since the last committed offset, with log versions as the
  offset domain, so a downstream query incrementally consumes a table
  other jobs keep writing — the public Delta streaming-source shape.

Streaming contract (Delta's, adopted deliberately): the source is
append-only. Data-changing commits that REMOVE files (merge, delete,
overwrite) fail the stream by default — silently streaming their adds
would double-emit rewritten rows; pass ``skipChangeCommits=true`` to
ignore those commits entirely (downstream sees inserts only).
Physical-only rewrites (compact, optimize) are always skipped: their
adds duplicate content that already streamed.

Offsets are ``{"version": N}``; replay of a committed range
(``partitions(start, end)``) is deterministic because the log is
immutable, which is exactly the exactly-once property Structured
Streaming needs from a source. Register once per session via
:func:`register_txlog_source`.

Note: Spark's Python micro-batch wrapper does not implement
``Trigger.AvailableNow`` natively and falls back to a single catch-up
batch (one warning per query) — all pending versions land in one
micro-batch instead of several. Incremental offsets and
checkpoint-restart behavior are unaffected (pinned in tests).
"""

from __future__ import annotations

import json
import os

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import StructType

from data_pipelines_spark.sources import txlog

# ops whose adds are NEW logical rows (safe to stream)
_APPEND_OPS = {"create", "append"}
# ops that rewrite existing rows (unsafe to stream adds from)
_CHANGE_OPS = {"merge", "delete", "overwrite"}
# physical-only rewrites (adds duplicate already-streamed content)
_PHYSICAL_OPS = {"compact", "optimize"}


class _FilePartition(InputPartition):
    def __init__(self, abs_path: str):
        self.abs_path = abs_path


def _read_file_batches(abs_path: str, columns: list[str]):
    import pyarrow.parquet as pq

    pf = pq.ParquetFile(abs_path)
    have = set(pf.schema_arrow.names)
    cols = [c for c in columns if c in have]
    for batch in pf.iter_batches(columns=cols):
        if len(cols) < len(columns):
            # schema-evolved old file: missing columns fill NULL
            import pyarrow as pa

            arrays, names = [], []
            for c in columns:
                if c in cols:
                    arrays.append(batch.column(cols.index(c)))
                else:
                    arrays.append(pa.nulls(batch.num_rows))
                names.append(c)
            batch = pa.RecordBatch.from_arrays(arrays, names=names)
        else:
            # enforce requested column order
            batch = batch.select(columns)
        yield batch


class _TxLogBatchReader(DataSourceReader):
    def __init__(self, path: str, version: int | None, columns: list[str]):
        self.path = path
        self.version = version
        self.columns = columns

    def partitions(self):
        state = txlog._load_state(self.path, self.version)
        root = txlog._local(self.path)
        return [
            _FilePartition(os.path.join(root, rel))
            for rel in sorted(state.files)
        ]

    def read(self, partition: _FilePartition):
        yield from _read_file_batches(partition.abs_path, self.columns)


class _TxLogStreamReader(DataSourceStreamReader):
    def __init__(
        self,
        path: str,
        columns: list[str],
        starting_version: int,
        skip_change_commits: bool,
    ):
        self.path = path
        self.columns = columns
        self.starting_version = starting_version
        self.skip_change_commits = skip_change_commits

    def initialOffset(self) -> dict:
        return {"version": self.starting_version - 1}

    def latestOffset(self) -> dict:
        return {"version": txlog.table_version(self.path)}

    def partitions(self, start: dict, end: dict):
        root = txlog._local(self.path)
        out: list[_FilePartition] = []
        for v in range(start["version"] + 1, end["version"] + 1):
            actions = txlog._read_actions(self.path, v)
            op = next(
                (
                    a["commit"].get("op")
                    for a in actions
                    if "commit" in a
                ),
                None,
            )
            if op in _PHYSICAL_OPS:
                continue
            if op in _CHANGE_OPS or (
                op not in _APPEND_OPS
                and any("remove" in a for a in actions)
            ):
                if self.skip_change_commits:
                    continue
                raise ValueError(
                    f"txlog stream over {self.path}: commit {v} ({op}) "
                    f"rewrites existing rows — streaming its adds would "
                    f"double-emit. Set skipChangeCommits=true to ignore "
                    f"data-changing commits (the Delta streaming-source "
                    f"contract)."
                )
            for a in actions:
                if "add" in a:
                    out.append(
                        _FilePartition(os.path.join(root, a["add"]["path"]))
                    )
        return out

    def read(self, partition: _FilePartition):
        yield from _read_file_batches(partition.abs_path, self.columns)

    def commit(self, end: dict) -> None:
        pass  # the streaming checkpoint owns progress; the log is immutable


class TxLogDataSource(DataSource):
    """``format("txlog")``: see module docstring. Options: ``path``
    (required), ``version`` (batch time travel), ``startingVersion``
    (stream from a later version; default 0 = the whole table),
    ``skipChangeCommits`` (stream past merge/delete/overwrite)."""

    @classmethod
    def name(cls) -> str:
        return "txlog"

    def _path(self) -> str:
        path = self.options.get("path")
        if not path:
            raise ValueError("format('txlog') needs .option('path', ...)")
        return path

    def schema(self) -> StructType:
        version = self.options.get("version")
        state = txlog._load_state(
            self._path(), int(version) if version is not None else None
        )
        return StructType.fromJson(json.loads(state.meta["schema"]))

    def reader(self, schema: StructType) -> DataSourceReader:
        version = self.options.get("version")
        return _TxLogBatchReader(
            self._path(),
            int(version) if version is not None else None,
            [f.name for f in schema.fields],
        )

    def streamReader(self, schema: StructType) -> DataSourceStreamReader:
        return _TxLogStreamReader(
            self._path(),
            [f.name for f in schema.fields],
            int(self.options.get("startingVersion", 0)),
            str(self.options.get("skipChangeCommits", "false")).lower()
            == "true",
        )


def register_txlog_source(spark) -> None:
    """Register ``format("txlog")`` on this session (idempotent)."""
    spark.dataSource.register(TxLogDataSource)
