"""Spark Python Data Source for txlog tables: `format("txlog")` batch
reads and a STREAMING source over the commit log.

Spark 4's Python Data Source API (SPARK-44076) lets the transactional
format plug into the planner like any built-in source:

- ``spark.read.format("txlog").option("path", p).load()`` — snapshot
  read (``version`` option = time travel), one input partition per
  live data file, rows shipped as Arrow record batches (the vectorized
  path, not row-at-a-time Python).
- ``spark.readStream.format("txlog").option("path", p).load()`` — the
  table AS a stream: the FIRST batch emits the current snapshot (the
  live file set, reflecting every merge/delete in the table's past),
  then each micro-batch emits the rows ADDED since the last committed
  offset, with log versions as the offset domain — the public Delta
  streaming-source shape.

Streaming contract (Delta's, adopted deliberately): after the initial
snapshot the source is append-only. Data-changing commits that REMOVE
files (merge, delete, overwrite) fail the stream by default —
silently streaming their adds would double-emit rewritten rows; pass
``skipChangeCommits=true`` to ignore those commits entirely
(downstream sees inserts only). A merge/delete/overwrite that removed
NO files (a pure-insert merge — the common txsink CDC shape for
brand-new keys) adds only new logical rows and streams like an
append. Physical-only rewrites (compact, optimize) are always
skipped: their adds duplicate content that already streamed. An
explicit ``startingVersion=N`` (N >= 1) opts out of the snapshot and
replays the commit log from version N.

``readChangeFeed=true`` switches the stream to Delta's CDF shape:
every data-changing commit emits its ROW-LEVEL changes — the snapshot
columns plus ``_change_type`` (insert / delete / update_pre /
update_post, paired by the table's key columns exactly as the batch
:func:`txlog.table_changes` does) and ``_commit_version`` — instead of
failing or skipping. Physical-only rewrites emit nothing. The change
rows for one commit are computed in that commit's task from the
commit's own removed/added file sets (cost ∝ churned files, the same
economics as the merge that produced them); commits land atomically,
so a micro-batch boundary never splits a commit.

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
import math
import os

import uuid
from dataclasses import dataclass, field

from pyspark.sql.datasource import (
    DataSource,
    DataSourceArrowWriter,
    DataSourceReader,
    DataSourceStreamReader,
    EqualNullSafe,
    EqualTo,
    GreaterThan,
    GreaterThanOrEqual,
    In,
    InputPartition,
    IsNull,
    LessThan,
    LessThanOrEqual,
    WriterCommitMessage,
)
from pyspark.sql.types import StructType

from data_pipelines_spark.sources import txlog

# ops whose adds are NEW logical rows (safe to stream)
_APPEND_OPS = {"create", "append"}
# ops that are ALWAYS change commits even with no remove action:
# restore re-references files whose rows already streamed, so even an
# adds-only restore (rolling back a delete) would double-emit
_ALWAYS_CHANGE_OPS = {"restore"}
# physical-only rewrites (adds duplicate already-streamed content)
_PHYSICAL_OPS = {"compact", "optimize"}


class _FilePartition(InputPartition):
    def __init__(
        self,
        abs_path: str,
        rel_path: str | None = None,
        dv_files: list[str] | None = None,
    ):
        self.abs_path = abs_path
        # table-relative path + dv dataset parquet files (globbed on
        # the DRIVER — the task never lists directories): set when the
        # entry carries a deletion vector
        self.rel_path = rel_path
        self.dv_files = dv_files


def _part_from_entry(root: str, entry: dict) -> _FilePartition:
    dv = entry.get("dv")
    return _FilePartition(
        os.path.join(root, entry["path"]),
        entry["path"],
        txlog._dv_files_checked(root, dv) if dv else None,
    )


def _dv_positions(dv_files: list[str], rel_path: str):
    """Sorted int64 row positions deleted from ``rel_path``, read from
    its dv dataset with a (file == rel) predicate pushed into the
    parquet scan (the dataset is written sorted by (file, pos), so the
    filter prunes row groups)."""
    import numpy as np
    import pyarrow.parquet as pq

    parts = [
        # drop_null: a NULL pos (torn/buggy dv writer) must at worst
        # resurrect its one row — matching the SQL and anti-join read
        # paths — not poison the int positions into floats
        pq.read_table(
            f, columns=["pos"], filters=[("file", "==", rel_path)]
        )["pos"].drop_null().to_numpy(zero_copy_only=False)
        for f in dv_files
    ]
    return np.sort(np.concatenate(parts)) if parts else np.array([], "i8")


def _read_file_batches(
    abs_path: str,
    columns: list[str],
    dv_files: list[str] | None = None,
    rel_path: str | None = None,
):
    import pyarrow.parquet as pq

    positions = None
    if dv_files:
        import numpy as np

        positions = _dv_positions(dv_files, rel_path)
    pf = pq.ParquetFile(abs_path)
    have = set(pf.schema_arrow.names)
    cols = [c for c in columns if c in have]
    offset = 0
    for batch in pf.iter_batches(columns=cols):
        n = batch.num_rows
        if positions is not None:
            import numpy as np
            import pyarrow as pa

            lo = np.searchsorted(positions, offset)
            hi = np.searchsorted(positions, offset + n)
            if hi > lo:
                mask = np.ones(n, dtype=bool)
                mask[positions[lo:hi] - offset] = False
                batch = batch.filter(pa.array(mask))
        offset += n
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
        self._pruners: list[tuple] = []  # (kind, col, payload)

    def pushFilters(self, filters):
        """Planner-routed data skipping (SPARK-44076 filter pushdown,
        honored when ``spark.sql.python.filterPushdown.enabled`` is on —
        :func:`register_txlog_source` enables it): supported conjuncts
        on top-level columns are translated into the SAME footer-stats
        pruning `read_table(bounds=...)` uses, so
        ``spark.read.format("txlog").load().where(...)`` plans only
        surviving files. The log's stats are file-granular, so every
        filter — including the translated ones — is returned to Spark
        for row-level post-scan evaluation; pruning here can only drop
        whole files the filter provably rejects, never change results."""
        for f in filters:
            attr = getattr(f, "attribute", None)
            if attr is None or len(attr) != 1:
                continue  # nested field: the log records no stats for it
            col = attr[0]
            if isinstance(f, (EqualTo, EqualNullSafe)):
                if f.value is not None:
                    self._pruners.append(("set", col, [f.value]))
                elif isinstance(f, EqualNullSafe):
                    self._pruners.append(("isnull", col, None))
            elif isinstance(f, In):
                vals = [v for v in f.value if v is not None]
                try:
                    vals = sorted(vals)
                except TypeError:
                    continue  # mixed-type literal list: no pruning
                if vals:
                    self._pruners.append(("set", col, vals))
            elif isinstance(f, GreaterThan):
                if f.value is not None:
                    self._pruners.append(("gt", col, f.value))
            elif isinstance(f, GreaterThanOrEqual):
                if f.value is not None:
                    self._pruners.append(("ge", col, f.value))
            elif isinstance(f, LessThan):
                if f.value is not None:
                    self._pruners.append(("lt", col, f.value))
            elif isinstance(f, LessThanOrEqual):
                if f.value is not None:
                    self._pruners.append(("le", col, f.value))
            elif isinstance(f, IsNull):
                self._pruners.append(("isnull", col, None))
        return filters

    def partitions(self):
        state = txlog._load_state(self.path, self.version)
        if self._pruners:
            txlog._ensure_stats_decoded(state.files)
        root = txlog._local(self.path)
        # the zonemap contract lives in ONE place (txlog's stats
        # helpers) so the datasource and read_table(bounds=...) can
        # never drift in how conservatively they prune
        return [
            _part_from_entry(root, entry)
            for _rel, entry in sorted(state.files.items())
            if txlog._file_survives_constraints(entry, self._pruners)
        ]

    def read(self, partition: _FilePartition | None):
        # an EMPTY table yields zero partitions, which PySpark's worker
        # substitutes with a single None partition — emit nothing
        if partition is None:
            return
        yield from _read_file_batches(
            partition.abs_path, self.columns,
            partition.dv_files, partition.rel_path,
        )



def _offset_key(off: dict) -> tuple:
    """Total order over stream offsets: an index-carrying offset
    ({"version": S, "index": k}, a partially-emitted snapshot) sorts
    BELOW the index-free {"version": S} (fully emitted)."""
    return (off["version"], off.get("index", float("inf")))


class _TxLogStreamReader(DataSourceStreamReader):
    """Snapshot-then-appends stream over the commit log (module
    docstring has the full contract).

    ADMISSION CONTROL (``maxFilesPerTrigger`` / ``maxBytesPerTrigger``
    — the public Delta source's rate-limit options): with a limit set,
    ``latestOffset`` returns a BOUNDED offset instead of the table
    head, so a large backlog drains across many checkpointed
    micro-batches instead of one unbounded catch-up batch (incremental
    progress, bounded redo on failure, bounded sink transactions). The
    initial snapshot is chunked too, via an ``index`` field in the
    offset ({"version": S, "index": k} = the first k files of the
    snapshot at version S have been emitted; an index-free offset is a
    fully-emitted version — exactly the shape checkpoints already
    hold, so old checkpoints replay unchanged). A commit is never
    split (atomic in the offset domain), so a single commit larger
    than the budget still lands whole — the limit bounds batches, it
    does not starve them.

    How the cursor is learned (pyspark's stream-reader API passes no
    start offset to ``latestOffset``, so the reader tracks it): the
    engine hosts this reader in one long-lived worker process and, as
    traced against pyspark 4.1's runner, (a) a FRESH query calls
    ``latestOffset`` before ``initialOffset``, and (b) a RESTART first
    replays the checkpointed range through ``partitions(start, end)``
    (equal offsets when the last batch committed cleanly) before any
    ``latestOffset``. So ``partitions``/``commit`` always teach the
    reader the checkpointed position, and a ``None`` cursor can only
    mean a fresh query — which is bounded from
    ``startingVersion - 1``. If the engine ever violated (b), the
    first bounded offset could regress below the checkpoint; the
    ``partitions`` guard raises loudly on ``end < start`` rather than
    re-emitting data."""

    def __init__(
        self,
        path: str,
        columns: list[str],
        starting_version: int,
        skip_change_commits: bool,
        max_files: int | None = None,
        max_bytes: int | None = None,
    ):
        self.path = path
        self.columns = columns
        self.starting_version = starting_version
        self.skip_change_commits = skip_change_commits
        self.max_files = max_files
        self.max_bytes = max_bytes
        self._cursor: dict | None = None

    def initialOffset(self) -> dict:
        off = {"version": self.starting_version - 1}
        self._cursor = off
        return off

    def _snapshot_entries(self, version: int) -> list[dict]:
        state = txlog._load_state(self.path, version)
        return [e for _rel, e in sorted(state.files.items())]

    def _budget_take(self, entries: list[dict], taken: int) -> int:
        """How many more of ``entries[taken:]`` fit the per-trigger
        budget (always at least one so progress never stalls)."""
        files = bytes_ = 0
        n = 0
        for e in entries[taken:]:
            files += 1
            bytes_ += e.get("bytes", 0)
            if n > 0 and (
                (self.max_files is not None and files > self.max_files)
                or (self.max_bytes is not None and bytes_ > self.max_bytes)
            ):
                break
            n += 1
            if (self.max_files is not None and files >= self.max_files) or (
                self.max_bytes is not None and bytes_ >= self.max_bytes
            ):
                break
        return n

    def latestOffset(self) -> dict:
        head = txlog.table_version(self.path)
        if self.max_files is None and self.max_bytes is None:
            return {"version": head}
        cur = self._cursor
        if cur is None:
            # fresh query (latestOffset precedes initialOffset; a
            # restart would have taught the cursor via partitions() —
            # see class docstring), so bound from the starting version
            cur = {"version": self.starting_version - 1}
        if cur["version"] < 0:
            # snapshot not started: pin it at the current head
            entries = self._snapshot_entries(head)
            n = self._budget_take(entries, 0)
            if n >= len(entries):
                return {"version": head}
            return {"version": head, "index": n}
        if "index" in cur:
            # snapshot partially emitted: continue at the SAME version
            s = cur["version"]
            entries = self._snapshot_entries(s)
            n = cur["index"] + self._budget_take(entries, cur["index"])
            if n >= len(entries):
                return {"version": s}
            return {"version": s, "index": n}
        # steady state: walk commits until the budget fills; at least
        # one commit per batch, never split
        files = bytes_ = 0
        last = cur["version"]
        for v in range(cur["version"] + 1, head + 1):
            actions = txlog._read_actions(self.path, v)
            op = next(
                (a["commit"].get("op") for a in actions if "commit" in a),
                None,
            )
            adds = [a["add"] for a in actions if "add" in a]
            if op not in _PHYSICAL_OPS:
                files += len(adds)
                bytes_ += sum(e.get("bytes", 0) for e in adds)
            if last > cur["version"] and (
                (self.max_files is not None and files > self.max_files)
                or (self.max_bytes is not None and bytes_ > self.max_bytes)
            ):
                break
            last = v
        return {"version": last}

    def partitions(self, start: dict, end: dict):
        if _offset_key(end) < _offset_key(start) or (
            "index" in end and "index" not in start and start["version"] >= 0
        ):
            # Either a bounded latestOffset regressed below the
            # checkpointed start, or it proposed a snapshot CHUNK after
            # a fully-emitted version (a chunked end is only legal
            # following the initial offset or another chunk of the same
            # snapshot — continuing one would re-emit snapshot rows the
            # commit walk already delivered). Both are only possible if
            # the engine skipped the restart replay this design relies
            # on (class docstring); fail loudly instead of emitting
            # duplicates.
            raise ValueError(
                f"txlog stream over {self.path}: offset regression "
                f"{start} -> {end}; restart the query without rate "
                f"limits to recover, and report this ordering."
            )
        self._cursor = end
        root = txlog._local(self.path)
        out: list[_FilePartition] = []
        if start["version"] < 0:
            # Initial catch-up from "the beginning": emit the SNAPSHOT
            # at the end offset (the live file set) instead of replaying
            # commit history — the public Delta streaming-source
            # behavior. This is what makes a table with merges in its
            # PAST streamable and non-stale: the first batch reflects
            # every rewrite up to stream start, and the append-only
            # contract below applies only to commits AFTER it.
            # A chunked end offset emits the snapshot's first `index`
            # files; later batches continue the slice.
            entries = self._snapshot_entries(end["version"])
            return [
                _part_from_entry(root, e)
                for e in entries[: end.get("index", len(entries))]
            ]
        first = start["version"] + 1
        if "index" in start:
            # resume a partially-emitted snapshot at start's version
            entries = self._snapshot_entries(start["version"])
            stop = (
                end.get("index", len(entries))
                if end["version"] == start["version"]
                else len(entries)
            )
            out.extend(
                _part_from_entry(root, e)
                for e in entries[start["index"]: stop]
            )
            if end["version"] == start["version"]:
                return out
        for v in range(first, end["version"] + 1):
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
            # a change commit is one that REMOVES files (its adds carry
            # rewritten rows) — gate on that, not the op label alone: a
            # pure-insert merge (no file matched, e.g. the txsink CDC
            # path landing brand-new keys) removes nothing and its adds
            # are new logical rows, exactly as streamable as an append
            # (the Delta source streams removal-free adds the same way).
            # Restore is change-always: its adds re-reference files
            # whose rows already streamed, remove actions or not.
            if op not in _APPEND_OPS and (
                op in _ALWAYS_CHANGE_OPS
                or any("remove" in a for a in actions)
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
                    out.append(_part_from_entry(root, a["add"]))
        return out

    def read(self, partition: _FilePartition | None):
        if partition is None:
            return  # empty range (see batch reader note)
        yield from _read_file_batches(
            partition.abs_path, self.columns,
            partition.dv_files, partition.rel_path,
        )

    def commit(self, end: dict) -> None:
        # the streaming checkpoint owns progress (the log is
        # immutable); the cursor feeds admission control only
        self._cursor = end


class _CDCPartition(InputPartition):
    def __init__(
        self,
        version: int,
        removed: list[dict],
        added: list[dict],
        key_col: str | None = None,
        lo=None,
        hi=None,
        nulls_only: bool = False,
        n_buckets: int | None = None,
        bucket: int | None = None,
    ):
        self.version = version
        # per side: {"abs": data file path, "rel": table-relative path,
        # "dv": dv dataset parquet files or None} — removes carry the
        # OLD deletion vector (from the remove action), adds the new
        # one, so each side reads the file minus ITS dv and exactly
        # the newly-changed rows survive the multiset diff
        self.removed = removed
        self.added = added
        # key-range slice of ONE commit (bounded per-task CDF): rows
        # route to exactly one slice by key_col value — [lo, hi) with
        # open ends when None, or the dedicated NULL-key slice — so the
        # per-slice multiset diffs union to the whole commit's diff
        # (equal rows share the key, hence the slice; update pairing
        # joins on the full key list, whose first column this is)
        self.key_col = key_col
        self.lo = lo
        self.hi = hi
        self.nulls_only = nulls_only
        # residual HASH slice (when range slicing is impossible): rows
        # route by hash(key_col) % n_buckets == bucket on BOTH sides
        self.n_buckets = n_buckets
        self.bucket = bucket


# Residual hash slicing reads every churned file once per bucket (the
# row filter can't prune files or row groups), so the bucket count is
# capped: per-task MEMORY stays ~total/n while scan amplification stays
# bounded at n×. Range slicing (no amplification) remains the primary.
_HASH_SLICE_MAX_BUCKETS = 64


def _split_cdc_hash(
    version: int,
    removed: list[dict],
    added: list[dict],
    key: str,
    n_parts: int,
) -> list[_CDCPartition]:
    """Residual slicing for commits range slicing can't handle (a
    stats-less file, one distinct file start over a non-numeric key,
    stats types with no safe SQL literal): route ROWS by
    ``hash(key) % n`` — both sides identically. DuckDB's ``hash()`` is
    deterministic across connections for a given DuckDB version (both
    sides of one partition hash inside ONE task process), and
    ``hash(NULL)`` is a non-NULL constant, so NULL keys land in one
    bucket consistently. Identical rows share a key, hence a bucket,
    so the per-bucket multiset diffs union to the commit's diff and
    update pairing (key equality ⇒ equal hash) stays within a bucket."""
    n = min(max(2, n_parts), _HASH_SLICE_MAX_BUCKETS)
    return [
        _CDCPartition(
            version, removed, added, key, n_buckets=n, bucket=b
        )
        for b in range(n)
    ]


def _split_cdc_commit(
    version: int,
    removed: list[dict],
    removed_entries: list[dict],
    added: list[dict],
    added_entries: list[dict],
    key_cols: list[str],
    max_bytes: int,
) -> list[_CDCPartition] | None:
    """Slice one commit's change derivation into key-range partitions
    so no single task holds more than ~``max_bytes`` of churned files —
    the bounded-memory answer for giant commits (a backfill MERGE, an
    overwrite). Key-RANGE slicing is the primary (files join only the
    slices their footer stats overlap, so scans don't amplify); when
    ranges are impossible (missing/incomparable stats, one distinct
    start on a non-numeric key) it falls back to hash-of-key row
    routing (:func:`_split_cdc_hash`). Returns None only when there is
    no key column at all or the commit fits one task — the caller then
    runs the single-task diff. Slicing is an optimization only: each
    slice filters BOTH sides identically, every row lands in exactly
    one slice, and the slice diffs union to the commit's diff."""
    if not key_cols:
        return None
    k = key_cols[0]
    sides = list(zip(removed, removed_entries)) + list(
        zip(added, added_entries)
    )
    total = sum(e.get("bytes", 0) for _f, e in sides)
    n_parts = max(1, math.ceil(total / max_bytes))
    if n_parts <= 1:
        return None
    ranged = _split_cdc_ranges(
        version, removed, removed_entries, added, added_entries, k, n_parts
    )
    if ranged is not None:
        return ranged
    return _split_cdc_hash(version, removed, added, k, n_parts)


def _split_cdc_ranges(
    version: int,
    removed: list[dict],
    removed_entries: list[dict],
    added: list[dict],
    added_entries: list[dict],
    k: str,
    n_parts: int,
) -> list[_CDCPartition] | None:
    sides = list(zip(removed, removed_entries)) + list(
        zip(added, added_entries)
    )
    starts = []
    nulls_possible = False
    for _f, e in sides:
        st = txlog._entry_stats(e).get(k)
        if st is None:
            return None  # a stats-less file would join every slice
        lo_v = txlog._decode_val(st["min"])
        starts.append(lo_v)
        if st.get("nulls") != 0:
            nulls_possible = True
    if not all(_sql_sliceable(v) for v in starts):
        return None  # no safe SQL literal for this type: don't slice
    try:
        starts = sorted(set(starts))
    except TypeError:
        return None  # cross-type stats: no total order to slice on
    if len(starts) >= 2:
        # cut points from the file-start distribution: ranges then
        # hold roughly equal numbers of files (and, for similar file
        # sizes, roughly equal bytes)
        n_parts = min(n_parts, len(starts))
        cuts = [
            starts[(i * len(starts)) // n_parts]
            for i in range(1, n_parts)
        ]
    else:
        # one distinct file start (e.g. a single giant removed file):
        # for NUMERIC keys, cut its [min, max] span into equal ranges
        # instead — row-level work still divides because each slice's
        # key filter pushes into the parquet row groups
        lo_all, hi_all = None, None
        for _f, e in sides:
            st = txlog._entry_stats(e).get(k)
            fmin = txlog._decode_val(st["min"])
            fmax = txlog._decode_val(st["max"])
            lo_all = fmin if lo_all is None or fmin < lo_all else lo_all
            hi_all = fmax if hi_all is None or fmax > hi_all else hi_all
        if (
            not isinstance(lo_all, (int, float))
            or isinstance(lo_all, bool)
            or not isinstance(hi_all, (int, float))
            or hi_all <= lo_all
        ):
            return None
        step = (hi_all - lo_all) / n_parts
        cuts = [lo_all + i * step for i in range(1, n_parts)]
        if isinstance(lo_all, int) and isinstance(hi_all, int):
            cuts = [int(c) for c in cuts]
    cuts = sorted(set(cuts))
    if not cuts:
        return None
    ranges = []
    prev = None
    for c in cuts:
        ranges.append((prev, c))
        prev = c
    ranges.append((prev, None))

    def overlap(e, lo, hi) -> bool:
        st = txlog._entry_stats(e).get(k)
        fmin = txlog._decode_val(st["min"])
        fmax = txlog._decode_val(st["max"])
        if lo is not None and fmax < lo:
            return False
        if hi is not None and fmin >= hi:
            return False
        return True

    out = []
    for lo, hi in ranges:
        rem = [f for f, e in zip(removed, removed_entries) if overlap(e, lo, hi)]
        add = [f for f, e in zip(added, added_entries) if overlap(e, lo, hi)]
        if rem or add:
            out.append(_CDCPartition(version, rem, add, k, lo, hi))
    if nulls_possible:
        rem = [
            f
            for f, e in zip(removed, removed_entries)
            if (txlog._entry_stats(e).get(k) or {}).get("nulls") != 0
        ]
        add = [
            f
            for f, e in zip(added, added_entries)
            if (txlog._entry_stats(e).get(k) or {}).get("nulls") != 0
        ]
        if rem or add:
            out.append(_CDCPartition(version, rem, add, k, nulls_only=True))
    return out if len(out) > 1 else None


def _qid(name: str) -> str:
    return '"' + name.replace('"', '""') + '"'


def _duck_type(dt) -> str:
    """DuckDB type for a Spark type — needed only to CAST NULL for a
    column absent from EVERY file of a CDC commit (pre-evolution
    commits), so the emitted Arrow schema still matches the stream's.
    An unmapped type raises rather than silently emitting VARCHAR (the
    worker would reject the mismatched Arrow schema anyway — raise with
    the cause, not a schema riddle)."""
    from pyspark.sql import types as T

    if isinstance(dt, T.ArrayType):
        return f"{_duck_type(dt.elementType)}[]"
    if isinstance(dt, T.MapType):
        return f"MAP({_duck_type(dt.keyType)}, {_duck_type(dt.valueType)})"
    if isinstance(dt, T.StructType):
        inner = ", ".join(
            f"{_qid(f.name)} {_duck_type(f.dataType)}" for f in dt.fields
        )
        return f"STRUCT({inner})"
    if isinstance(dt, T.DecimalType):
        return f"DECIMAL({dt.precision},{dt.scale})"
    mapped = {
        T.StringType: "VARCHAR",
        T.LongType: "BIGINT",
        T.IntegerType: "INTEGER",
        T.ShortType: "SMALLINT",
        T.ByteType: "TINYINT",
        T.DoubleType: "DOUBLE",
        T.FloatType: "FLOAT",
        T.BooleanType: "BOOLEAN",
        T.DateType: "DATE",
        T.TimestampType: "TIMESTAMPTZ",
        T.TimestampNTZType: "TIMESTAMP",
        T.BinaryType: "BLOB",
    }.get(type(dt))
    if mapped is None:
        raise NotImplementedError(
            f"CDC NULL-fill has no DuckDB type mapping for Spark type "
            f"{dt.simpleString()} — consume this commit range through "
            f"the batch txlog.table_changes instead"
        )
    return mapped


def _sql_paths(paths: list[str]) -> str:
    """Proper SQL string-literal list for read_parquet — repr() is not
    an escaper (a path with a single quote flips repr to double quotes,
    which DuckDB parses as identifiers)."""
    quoted = ", ".join("'" + p.replace("'", "''") + "'" for p in paths)
    return f"[{quoted}]"


def _sql_sliceable(v) -> bool:
    """True when ``v`` has a safe DuckDB literal (:func:`_sql_lit`) —
    checked at SPLIT time so an unsupported stats type falls back to
    the single-task diff instead of failing in the task."""
    import datetime

    if isinstance(v, float):
        return math.isfinite(v)
    return isinstance(
        v, (bool, int, str, datetime.date, datetime.datetime)
    )


def _sql_lit(v) -> str:
    import datetime

    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, (int, float)):
        return repr(v)
    if isinstance(v, str):
        return "'" + v.replace("'", "''") + "'"
    if isinstance(v, datetime.datetime):
        kind = "TIMESTAMPTZ" if v.tzinfo is not None else "TIMESTAMP"
        return f"{kind} '{v.isoformat(sep=' ')}'"
    if isinstance(v, datetime.date):
        return f"DATE '{v.isoformat()}'"
    raise NotImplementedError(f"no SQL literal for {type(v).__name__}")


def _cdc_partitions(
    path: str,
    first_version: int,
    last_version: int,
    key_cols: list[str] | None = None,
    max_bytes: int | None = None,
) -> list[_CDCPartition]:
    """One partition per data-changing commit in [first, last] —
    sliced into key-range partitions when the commit's churned bytes
    exceed ``max_bytes`` (see :func:`_split_cdc_commit`), so a giant
    backfill commit no longer funnels through one task. Physical
    rewrites and metadata-only commits contribute nothing."""
    root = txlog._local(path)

    def _side_file(entry: dict) -> dict:
        dv = entry.get("dv")
        return {
            "abs": os.path.join(root, entry["path"]),
            "rel": entry["path"],
            "dv": txlog._dv_files_checked(root, dv) if dv else None,
        }

    out: list[_CDCPartition] = []
    # Rolling file map for sizing removed sides: materialized by ONE
    # snapshot replay at the first remove-bearing commit, then rolled
    # forward commit-by-commit (apply each commit's removes/adds —
    # including physical rewrites', which change the file set without
    # emitting rows). Before this, planning a merge/delete-heavy range
    # re-replayed the prior snapshot per commit: O(commits × replay).
    prev_files: dict[str, dict] | None = None
    for v in range(first_version, last_version + 1):
        actions = txlog._read_actions(path, v)
        op = next(
            (a["commit"].get("op") for a in actions if "commit" in a), None
        )
        removed_rels = [a["remove"] for a in actions if "remove" in a]
        added_entries = [a["add"] for a in actions if "add" in a]
        # physical rewrite: rows cancel, no change rows; no removes and
        # no adds: metadata-only commit (constraints, schema)
        if op not in _PHYSICAL_OPS and (removed_rels or added_entries):
            removed = [_side_file(r) for r in removed_rels]
            added = [_side_file(e) for e in added_entries]
            split = None
            if max_bytes and key_cols:
                adds_bytes = sum(e.get("bytes", 0) for e in added_entries)
                # remove actions carry no stats/bytes, so a commit WITH
                # removes sizes its removed side from the rolling map
                # (a remove-heavy commit — an overwrite of a big table,
                # a whole-file dv delete — is exactly the one that must
                # not funnel through one task); adds-only commits are
                # sized from their own entries and stay O(1)
                if adds_bytes > max_bytes or removed_rels:
                    if prev_files is None:
                        prev_files = (
                            dict(txlog._load_state(path, v - 1).files)
                            if v
                            else {}
                        )
                    removed_entries = [
                        prev_files.get(r["path"], r) for r in removed_rels
                    ]
                    split = _split_cdc_commit(
                        v, removed, removed_entries, added, added_entries,
                        key_cols, max_bytes,
                    )
            if split is not None:
                out.extend(split)
            else:
                out.append(_CDCPartition(v, removed, added))
        if prev_files is not None:
            for r in removed_rels:
                prev_files.pop(r["path"], None)
            for e in added_entries:
                prev_files[e["path"]] = e
    return out


def _read_cdc_partition(
    partition: _CDCPartition,
    columns: list[str],
    schema_json: str,
    key_cols: list[str],
):
    """Derive one commit's row-level changes from its removed/added file
    sets — the multiset semantics of batch :func:`txlog.table_changes`
    (deletes = old EXCEPT ALL new, inserts = new EXCEPT ALL old,
    non-null keys on both sides pair as update_pre/update_post) —
    computed by task-side DuckDB and yielded as Arrow record batches."""
    import duckdb

    schema = StructType.fromJson(json.loads(schema_json))
    # the multiset diff runs over the FULL table schema, never the
    # requested projection: if a future Spark adds column pruning for
    # Python data sources, an update whose changed columns were pruned
    # out would otherwise cancel in the EXCEPT ALL and its change rows
    # silently disappear — `columns` is applied only in the final
    # projection below
    data_cols = [
        f.name
        for f in schema.fields
        if f.name not in ("_change_type", "_commit_version")
    ]
    con = duckdb.connect()

    def side_view(name: str, files: list[dict], other: list[dict]) -> None:
        # union_by_name aligns physical schemas across evolution; an
        # empty side borrows the other side's shape, WHERE false. A
        # side with deletion vectors reads each dv-carrying file
        # through its OWN subquery: the file's table-relative path is
        # known statically, so only `file_row_number` (the physical
        # row index the dv records) is ever injected — no `filename`
        # column, which DuckDB 1.0 cannot rename and which would
        # collide with a table column of that name.
        src, borrowed = (files, False) if files else (other, True)
        dv_parts = [f for f in src if not borrowed and f["dv"]]
        if dv_parts and "file_row_number" in {c.lower() for c in data_cols}:
            # The one remaining collision: a table column literally
            # named file_row_number. Mask the dv rows in pyarrow (no
            # injected columns at all) and register the result; plain
            # files still stream through read_parquet. Memory note:
            # the partition's dv-carrying files materialize fully —
            # bounded by maxBytesPerTask under range slicing, but NOT
            # under the hash-slice residual (every bucket carries
            # every churned file); that corner-of-a-corner trades
            # memory for correctness rather than failing the read.
            import pyarrow as pa
            import pyarrow.parquet as pq

            masked = []
            for f in dv_parts:
                t = pq.read_table(f["abs"])
                pos = set()
                for dvf in f["dv"]:
                    dt = pq.read_table(dvf, columns=["file", "pos"])
                    for fi, po in zip(
                        dt.column("file").to_pylist(),
                        dt.column("pos").to_pylist(),
                    ):
                        if fi == f["rel"]:
                            pos.add(po)
                if pos:
                    t = t.filter(
                        pa.array(
                            [i not in pos for i in range(t.num_rows)]
                        )
                    )
                masked.append(t)
            arrow_tbl = (
                masked[0]
                if len(masked) == 1
                else pa.concat_tables(masked, promote_options="default")
            )
            con.register(f"{name}_dvarrow", arrow_tbl)
            plain = [f["abs"] for f in src if not f["dv"]]
            if plain:
                con.execute(
                    f"CREATE VIEW {name} AS SELECT * FROM read_parquet("
                    f"{_sql_paths(plain)}, union_by_name=true) "
                    f"UNION ALL BY NAME SELECT * FROM {name}_dvarrow"
                )
            else:
                con.execute(
                    f"CREATE VIEW {name} AS "
                    f"SELECT * FROM {name}_dvarrow"
                )
            return
        plain = [f["abs"] for f in src if borrowed or not f["dv"]]
        selects = []
        if plain:
            guard = " WHERE false" if borrowed else ""
            selects.append(
                f"SELECT * FROM read_parquet({_sql_paths(plain)}, "
                f"union_by_name=true){guard}"
            )
        for f in dv_parts:
            rel_lit = "'" + f["rel"].replace("'", "''") + "'"
            # pos IS NOT NULL: a NULL in a torn/buggy dv parquet would
            # make NOT IN evaluate NULL for EVERY row and silently
            # empty the whole file — with the filter, the worst a
            # corrupt position can do is resurrect its one row (the
            # old ANTI JOIN's behavior), never lose data
            selects.append(
                f"SELECT * EXCLUDE (file_row_number) FROM read_parquet("
                f"{_sql_paths([f['abs']])}, file_row_number=true) "
                f"WHERE file_row_number NOT IN (SELECT pos FROM "
                f"read_parquet({_sql_paths(f['dv'])}) "
                f"WHERE file = {rel_lit} AND pos IS NOT NULL)"
            )
        con.execute(
            f"CREATE VIEW {name} AS "
            + " UNION ALL BY NAME ".join(selects)
        )

    side_view("old_raw", partition.removed, partition.added)
    side_view("new_raw", partition.added, partition.removed)
    # per-side select lists: a side whose files predate a schema
    # evolution lacks the evolved column and NULL-fills it (typed,
    # so the emitted Arrow schema still matches the stream's)
    for raw, aligned in (("old_raw", "old_v"), ("new_raw", "new_v")):
        present = {
            r[0] for r in con.execute(f"DESCRIBE {raw}").fetchall()
        }
        sel = ", ".join(
            _qid(c)
            if c in present
            else (
                f"CAST(NULL AS {_duck_type(schema[c].dataType)}) "
                f"AS {_qid(c)}"
            )
            for c in data_cols
        )
        con.execute(f"CREATE VIEW {aligned} AS SELECT {sel} FROM {raw}")
    # key-range slice of a big commit: BOTH sides restrict to the
    # slice's rows before diffing, so per-task work is bounded by the
    # slice, not the commit (the slices partition the key domain —
    # their diffs union to the whole commit's diff)
    old_side, new_side = "old_v", "new_v"
    if partition.key_col is not None:
        kq = _qid(partition.key_col)
        if partition.bucket is not None:
            # residual hash slice: hash() is NULL-safe (hash(NULL) is a
            # non-NULL constant), so one bucket owns the NULL keys too
            cond = (
                f"hash({kq}) % {int(partition.n_buckets)} = "
                f"{int(partition.bucket)}"
            )
        elif partition.nulls_only:
            cond = f"{kq} IS NULL"
        else:
            parts = []
            if partition.lo is not None:
                parts.append(f"{kq} >= {_sql_lit(partition.lo)}")
            if partition.hi is not None:
                parts.append(f"{kq} < {_sql_lit(partition.hi)}")
            parts.append(f"{kq} IS NOT NULL")
            cond = " AND ".join(parts)
        for side in ("old_v", "new_v"):
            con.execute(
                f"CREATE VIEW {side}_f AS "
                f"SELECT * FROM {side} WHERE {cond}"
            )
        old_side, new_side = "old_v_f", "new_v_f"
    con.execute(
        f"CREATE VIEW delr AS "
        f"SELECT * FROM {old_side} EXCEPT ALL SELECT * FROM {new_side}"
    )
    con.execute(
        f"CREATE VIEW insr AS "
        f"SELECT * FROM {new_side} EXCEPT ALL SELECT * FROM {old_side}"
    )
    keys = [k for k in key_cols if k in data_cols]
    if keys:
        klist = ", ".join(_qid(k) for k in keys)
        notnull = " AND ".join(f"{_qid(k)} IS NOT NULL" for k in keys)
        # non-null keys on BOTH sides pair as an update; NULL keys
        # never join (SEMI/ANTI null semantics), so NULL-key rows
        # classify as plain delete/insert — table_changes' rule
        con.execute(
            f"CREATE VIEW updk AS "
            f"SELECT DISTINCT {klist} FROM delr WHERE {notnull} "
            f"INTERSECT "
            f"SELECT DISTINCT {klist} FROM insr WHERE {notnull}"
        )
        body = f"""
            SELECT *, 'update_pre' AS _change_type
            FROM delr SEMI JOIN updk USING ({klist})
            UNION ALL BY NAME
            SELECT *, 'delete' AS _change_type
            FROM delr ANTI JOIN updk USING ({klist})
            UNION ALL BY NAME
            SELECT *, 'update_post' AS _change_type
            FROM insr SEMI JOIN updk USING ({klist})
            UNION ALL BY NAME
            SELECT *, 'insert' AS _change_type
            FROM insr ANTI JOIN updk USING ({klist})
        """
    else:
        body = """
            SELECT *, 'delete' AS _change_type FROM delr
            UNION ALL BY NAME
            SELECT *, 'insert' AS _change_type FROM insr
        """
    out_cols = ", ".join(
        f"CAST({int(partition.version)} AS BIGINT) AS _commit_version"
        if c == "_commit_version"
        else _qid(c)
        for c in columns
    )
    res = con.execute(f"SELECT {out_cols} FROM ({body})")
    reader = res.fetch_record_batch(65_536)
    for batch in reader:
        if batch.num_rows:
            yield batch


class _TxLogCDCBatchReader(DataSourceReader):
    """Batch change-feed read (the public Delta batch CDF shape):
    ``spark.read.format("txlog").option("readChangeFeed", "true")
    .option("startingVersion", a)[.option("endingVersion", b)]`` emits
    the per-commit row-level changes for every data-changing commit in
    [a, b] (b defaults to the latest version), with the same columns
    and semantics as the streaming feed and `txlog.table_changes`."""

    def __init__(
        self,
        path: str,
        columns: list[str],
        schema: StructType,
        starting_version: int,
        ending_version: int | None,
        key_cols: list[str],
        max_bytes: int,
    ):
        self.path = path
        self.columns = columns
        self.schema_json = schema.json()
        self.starting_version = starting_version
        self.ending_version = ending_version
        self.key_cols = key_cols
        self.max_bytes = max_bytes

    def partitions(self):
        latest = txlog.table_version(self.path)
        last = (
            self.ending_version
            if self.ending_version is not None
            else latest
        )
        if not 0 <= self.starting_version <= last <= latest:
            raise ValueError(
                f"readChangeFeed version range [{self.starting_version}, "
                f"{last}] is not within [0, {latest}] at {self.path}"
            )
        return _cdc_partitions(
            self.path, self.starting_version, last,
            self.key_cols, self.max_bytes,
        )

    def read(self, partition: _CDCPartition | None):
        if partition is None:
            return  # empty range (see batch reader note)
        yield from _read_cdc_partition(
            partition, self.columns, self.schema_json, self.key_cols
        )


class _TxLogCDCStreamReader(DataSourceStreamReader):
    """``readChangeFeed=true``: the commit log AS a row-level change
    stream (the public Delta CDF streaming shape). One input partition
    per data-changing commit; the partition's task derives the commit's
    changes from its own removed/added file sets with the SAME multiset
    semantics as the batch :func:`txlog.table_changes` — deletes = old
    EXCEPT ALL new, inserts = new EXCEPT ALL old, non-null keys present
    on both sides pair as update_pre/update_post. The diff runs in
    DuckDB inside the task (no SparkSession exists there; the engine
    already uses task-side DuckDB for write-path CHECK constraints) and
    streams out as Arrow record batches.

    Scale shape: cost ∝ the commit's churned files, the same economics
    as the merge that produced them. A commit whose churn exceeds
    ``maxBytesPerTask`` (default 256 MiB) is SLICED into key-range
    partitions (:func:`_split_cdc_commit`) so per-task work stays
    bounded no matter how big a backfill commit is; commits that
    cannot be sliced (no key columns / no usable stats) fall back to
    the single-task diff. Vacuuming a version's files makes its change
    feed unreadable (fails loudly on the missing file — Delta CDF has
    the same retention coupling)."""

    def __init__(
        self,
        path: str,
        columns: list[str],
        schema: StructType,
        starting_version: int,
        key_cols: list[str],
        max_bytes: int,
        max_commits: int | None = None,
    ):
        self.path = path
        self.columns = columns
        self.schema_json = schema.json()
        self.starting_version = starting_version
        self.key_cols = key_cols
        self.max_bytes = max_bytes
        # maxCommitsPerBatch admission control: bound how many commits
        # one micro-batch derives changes for, so a CDF stream starting
        # against a deep commit backlog checkpoints incremental
        # progress instead of diffing the whole history in one batch.
        # Cursor protocol identical to _TxLogStreamReader (see its
        # docstring): fresh queries bound from startingVersion - 1,
        # restarts re-learn the cursor from the engine's checkpointed
        # partitions() replay, and partitions() raises on regression.
        self.max_commits = max_commits
        self._cursor: dict | None = None

    def initialOffset(self) -> dict:
        off = {"version": self.starting_version - 1}
        self._cursor = off
        return off

    def latestOffset(self) -> dict:
        head = txlog.table_version(self.path)
        if self.max_commits is None:
            return {"version": head}
        cur = self._cursor
        if cur is None:
            cur = {"version": self.starting_version - 1}
        return {"version": min(head, cur["version"] + self.max_commits)}

    def partitions(self, start: dict, end: dict):
        if end["version"] < start["version"]:
            raise ValueError(
                f"txlog change-feed stream over {self.path}: offset "
                f"regression {start} -> {end}; restart the query "
                f"without maxCommitsPerBatch to recover."
            )
        self._cursor = end
        return _cdc_partitions(
            self.path, max(start["version"] + 1, 0), end["version"],
            self.key_cols, self.max_bytes,
        )

    def read(self, partition: _CDCPartition | None):
        if partition is None:
            return
        yield from _read_cdc_partition(
            partition, self.columns, self.schema_json, self.key_cols
        )

    def commit(self, end: dict) -> None:
        # the streaming checkpoint owns progress (the log is
        # immutable); the cursor feeds admission control only
        self._cursor = end


@dataclass
class _TxAdds(WriterCommitMessage):
    entries: list = field(default_factory=list)


class _TxLogWriter(DataSourceArrowWriter):
    """The real table-format writer split: every TASK writes its Arrow
    batches as one immutable parquet file (plus footer stats) and
    reports the add entry in its commit message; the DRIVER turns the
    collected messages into ONE atomic log commit. Failed/speculative
    task attempts leave orphaned files that never enter the log —
    age-guarded vacuum collects them, the same lifecycle as a failed
    writer anywhere else in the format."""

    def __init__(
        self,
        path: str,
        overwrite: bool,
        stat_cols: list[str],
        schema_json: str,
        constraints: dict[str, str],
        bootstrap_meta: dict | None = None,
    ):
        self.path = path
        self.overwrite = overwrite
        self.stat_cols = stat_cols
        self.schema_json = schema_json
        self.constraints = constraints
        # table absent at PLAN time: creation is deferred into commit()
        # so meta + first data land as ONE atomic commit 0 — a failed or
        # aborted first write leaves NO table behind (create-as-select
        # atomicity; a schema-only bootstrap at plan time would survive
        # the abort and make a later create_table fail)
        self.bootstrap_meta = bootstrap_meta
        self._duck = None  # lazy per-task DuckDB connection
        # one staging dir per WRITE JOB, fixed on the driver so all
        # tasks co-locate their files under it
        self.rel_dir = f"{txlog._DATA_DIR}/c{uuid.uuid4().hex[:12]}"

    def _check_batch(self, batch) -> None:
        """CHECK constraints on the Arrow write path, evaluated per
        batch by DuckDB IN THE TASK (no SparkSession exists in the
        write-commit worker). CHECK expressions therefore must stay in
        the common SQL subset — the same standard the engine's oracle
        SQL already holds every query to; NULL passes (SQL semantics).
        A violation raises in the task, Spark aborts the job, and
        abort() removes the staging dir."""
        if not self.constraints:
            return
        import duckdb
        import pyarrow as pa

        con = self._duck
        if con is None:
            con = self._duck = duckdb.connect()  # once per task, not per batch
        con.register("batch_tbl", pa.Table.from_batches([batch]))
        for name, sql in self.constraints.items():
            bad = con.execute(
                f"SELECT count(*) FROM batch_tbl "
                f"WHERE NOT coalesce(({sql}), true)"
            ).fetchone()[0]
            if bad:
                raise ValueError(
                    f"CHECK constraint violated on write to {self.path}: "
                    f"{name} ({sql}) — {bad} row(s)"
                )

    def write(self, iterator):
        import pyarrow as pa
        import pyarrow.parquet as pq

        root = txlog._local(self.path)
        out_dir = os.path.join(root, self.rel_dir)
        os.makedirs(out_dir, exist_ok=True)
        name = f"part-{uuid.uuid4().hex}.parquet"
        fpath = os.path.join(out_dir, name)
        writer = None
        for batch in iterator:
            self._check_batch(batch)
            if writer is None:
                writer = pq.ParquetWriter(fpath, batch.schema)
            writer.write_table(pa.Table.from_batches([batch]))
        if writer is None:
            return _TxAdds(entries=[])  # empty partition: no file
        writer.close()
        nrows, stats = txlog._file_stats(fpath, self.stat_cols)
        return _TxAdds(
            entries=[
                {
                    "path": f"{self.rel_dir}/{name}",
                    "rows": nrows,
                    "bytes": os.path.getsize(fpath),
                    "stats": stats,
                }
            ]
        )

    def commit(self, messages):
        adds = [e for m in messages if m is not None for e in m.entries]
        for _attempt in range(6):
            if not txlog.table_exists(self.path):
                meta = self.bootstrap_meta or {
                    "schema": self.schema_json,
                    "key_cols": [],
                    "cluster_by": [],
                    "stat_cols": [],
                }
                lines = [{"meta": meta}, txlog._commit_line("create")]
                lines += [{"add": e} for e in adds]
                try:
                    txlog._write_commit_exclusive(self.path, 0, lines)
                    return
                except FileExistsError:
                    continue  # concurrently created: retry as a normal write
            state = txlog._load_state(self.path)
            if not self.overwrite:
                # strict-append contract, re-checked per attempt so a
                # concurrent schema commit cannot be bypassed. (A
                # constraint added AFTER the tasks validated cannot be
                # re-checked here — no SparkSession exists in this
                # worker — so that narrow race is accepted on the
                # write-API path; txlog.append_table re-validates.)
                want = StructType.fromJson(
                    json.loads(state.meta["schema"])
                )
                got = StructType.fromJson(json.loads(self.schema_json))
                if {
                    (f.name, txlog._norm_nullability(f.dataType))
                    for f in want.fields
                } != {
                    (f.name, txlog._norm_nullability(f.dataType))
                    for f in got.fields
                }:
                    self.abort(messages)
                    raise ValueError(
                        f"append schema {got.simpleString()} does not "
                        f"match table schema at {self.path}"
                    )
            removes = (
                list(state.files.values()) if self.overwrite else []
            )
            op = "overwrite" if self.overwrite else "append"
            meta = (
                dict(state.meta, schema=self.schema_json)
                if self.overwrite
                else None
            )
            try:
                txlog._commit_rmw(
                    self.path, state.version, op, adds, removes, meta
                )
                return
            except txlog._Conflict:
                continue  # files are already on disk; re-base and retry
        self.abort(messages)
        raise txlog.ConcurrentWriteError(
            f"write to {self.path} lost the commit race repeatedly"
        )

    def abort(self, messages):
        root = txlog._local(self.path)
        import shutil as _shutil

        _shutil.rmtree(os.path.join(root, self.rel_dir), ignore_errors=True)


class TxLogDataSource(DataSource):
    """``format("txlog")``: see module docstring. Options: ``path``
    (required), ``version`` (batch time travel), ``startingVersion``
    (stream from a later version; default 0 = the whole table),
    ``skipChangeCommits`` (stream past merge/delete/overwrite),
    ``readChangeFeed`` (row-level changes with ``_change_type`` +
    ``_commit_version`` — Delta's CDF shape; streaming, or batch with
    ``startingVersion`` required and ``endingVersion`` optional),
    ``maxFilesPerTrigger``/``maxBytesPerTrigger`` (streaming admission
    control: bound each micro-batch's file count / bytes, chunking the
    initial snapshot too), ``maxCommitsPerBatch`` (CDF-stream
    admission control: commits per micro-batch),
    ``maxBytesPerTask`` (CDF: slice one commit's diff across tasks)."""

    @classmethod
    def name(cls) -> str:
        return "txlog"

    def _path(self) -> str:
        path = self.options.get("path")
        if not path:
            raise ValueError("format('txlog') needs .option('path', ...)")
        return path

    def _cdf(self) -> bool:
        return (
            str(self.options.get("readchangefeed", "false")).lower()
            == "true"
        )

    def _max_bytes_per_task(self) -> int:
        """``maxBytesPerTask`` (default 256 MiB): a change-feed commit
        whose churned files exceed this is SLICED into key-range
        partitions so no single task diffs more than ~this many bytes
        — the bound that keeps a giant backfill commit's CDF
        derivation inside one executor's memory."""
        return int(
            self.options.get("maxbytespertask", 256 * 1024 * 1024)
        )

    def _version(self) -> int | None:
        """Resolve the snapshot pin: ``version`` or ``timestampAsOf``
        (epoch seconds — Delta's option, resolved through
        :func:`txlog.version_at_timestamp`). Memoized — Spark calls
        schema() and reader() on the same instance within one plan, and
        a timestamp resolution walks commit files."""
        if hasattr(self, "_version_cache"):
            return self._version_cache
        version = self.options.get("version")
        ts = self.options.get("timestampasof")
        if self._cdf() and (version is not None or ts is not None):
            # a half-applied pin would be silent wrongness: schema()
            # would freeze the OLD schema while the feed ranges to the
            # latest commit, dropping evolved columns from change rows
            raise ValueError(
                "readChangeFeed takes startingVersion/endingVersion, "
                "not version/timestampAsOf"
            )
        if version is not None and ts is not None:
            raise ValueError(
                "pass option version OR timestampAsOf, not both"
            )
        if ts is not None:
            resolved = txlog.version_at_timestamp(self._path(), float(ts))
        else:
            resolved = int(version) if version is not None else None
        self._version_cache = resolved
        return resolved

    def _state(self) -> "txlog.Snapshot":
        """One log replay per plan: schema(), reader(), and
        streamReader() all need the snapshot meta — memoized on the
        instance (a DataSource instance lives for one plan, so the memo
        can never serve a stale snapshot across plans)."""
        if not hasattr(self, "_state_cache"):
            self._state_cache = txlog._load_state(
                self._path(), self._version()
            )
        return self._state_cache

    def schema(self) -> StructType:
        state = self._state()
        base = StructType.fromJson(json.loads(state.meta["schema"]))
        base = self._project(base)
        if self._cdf():
            from pyspark.sql.types import LongType, StringType, StructField

            return StructType(
                list(base.fields)
                + [
                    StructField("_change_type", StringType()),
                    StructField("_commit_version", LongType()),
                ]
            )
        return base

    def _project(self, base: StructType) -> StructType:
        """``option("columns", "a,b")`` — EXPLICIT column projection.

        Spark 4.1's Python Data Source API has no planner column
        pruning: ``.select(one_col)`` still ships every column through
        the Arrow stream because the reader only ever sees the full
        schema. The task-side reader already reads column subsets
        (pyarrow ``iter_batches(columns=...)`` fetches only those
        column chunks); this option is the escape hatch that makes the
        saving reachable from the plan until Spark exposes pruning —
        the projected schema flows to every reader (batch, stream,
        change feed; CDF's diff still runs over the full table schema
        so change semantics never depend on the projection). Unknown
        names fail at plan time against the snapshot schema."""
        spec = self.options.get("columns")
        if spec is None:
            return base
        want = [c.strip() for c in str(spec).split(",") if c.strip()]
        have = {f.name: f for f in base.fields}
        unknown = [c for c in want if c not in have]
        if not want or unknown:
            raise ValueError(
                f"option('columns', {spec!r}): unknown column(s) "
                f"{unknown or ['<empty>']} — table columns are "
                f"{sorted(have)}"
            )
        return StructType([have[c] for c in want])

    def reader(self, schema: StructType) -> DataSourceReader:
        if self._cdf():
            sv = self.options.get("startingversion")
            if sv is None:
                raise ValueError(
                    "batch readChangeFeed needs .option('startingVersion',"
                    " N); endingVersion is optional (default: latest) — "
                    "the Delta batch-CDF contract. Equivalent API: "
                    "txlog.table_changes(...)"
                )
            ev = self.options.get("endingversion")
            state = self._state()
            # the diff schema is ALWAYS the full table schema — the
            # planner hands us the PROJECTED schema when
            # option("columns") is set, and a diff over the projection
            # would cancel updates confined to non-projected columns
            full = StructType.fromJson(json.loads(state.meta["schema"]))
            return _TxLogCDCBatchReader(
                self._path(),
                [f.name for f in schema.fields],
                full,
                int(sv),
                int(ev) if ev is not None else None,
                list(state.meta.get("key_cols", [])),
                self._max_bytes_per_task(),
            )
        return _TxLogBatchReader(
            self._path(),
            self._version(),
            [f.name for f in schema.fields],
        )

    def writer(self, schema: StructType, overwrite: bool):
        """``df.write.format("txlog").mode("append"|"overwrite")``.
        A nonexistent table bootstraps ATOMICALLY: table meta (pass
        ``keyCols`` to set the merge key / stat columns) and the job's
        data files land together as commit 0 inside the driver-side
        commit, so a failed/aborted first write leaves no table behind.
        Appends enforce the strict schema contract and CHECK
        constraints (re-validated on commit-race retries); MERGE and
        schema evolution stay API-level (`txlog.merge_upsert`)."""
        path = self._path()
        if txlog.table_exists(path):
            state = txlog._load_state(path)
            return _TxLogWriter(
                path,
                overwrite,
                state.meta.get("stat_cols", []),
                schema.json(),
                dict(state.meta.get("constraints") or {}),
            )
        keys = [
            c.strip()
            for c in self.options.get("keycols", "").split(",")
            if c.strip()
        ]
        meta = {
            "schema": schema.json(),
            "key_cols": keys,
            "cluster_by": keys,
            "stat_cols": keys,
        }
        return _TxLogWriter(
            path, overwrite, keys, schema.json(), {}, bootstrap_meta=meta
        )

    def streamReader(self, schema: StructType) -> DataSourceStreamReader:
        if self._cdf():
            state = self._state()
            # full table schema for the diff (see reader(): the planner
            # passes the PROJECTED schema under option("columns"))
            full = StructType.fromJson(json.loads(state.meta["schema"]))
            mc = self._positive_option("maxCommitsPerBatch")
            return _TxLogCDCStreamReader(
                self._path(),
                [f.name for f in schema.fields],
                full,
                int(self.options.get("startingVersion", 0)),
                list(state.meta.get("key_cols", [])),
                self._max_bytes_per_task(),
                mc,
            )
        return _TxLogStreamReader(
            self._path(),
            [f.name for f in schema.fields],
            int(self.options.get("startingVersion", 0)),
            str(self.options.get("skipChangeCommits", "false")).lower()
            == "true",
            self._positive_option("maxFilesPerTrigger"),
            self._positive_option("maxBytesPerTrigger"),
        )

    def _positive_option(self, name: str) -> int | None:
        """An admission-control limit must be a positive int: 0 would
        either stall the stream forever (a commit cursor that never
        advances) or silently behave as 1 — both worse than an error
        at plan time."""
        v = self.options.get(name)
        if v is None:
            return None
        iv = int(v)
        if iv <= 0:
            raise ValueError(
                f"option {name} must be a positive integer, got {v!r}"
            )
        return iv


def register_txlog_source(spark) -> None:
    """Register ``format("txlog")`` on this session (idempotent), and
    enable Python-datasource filter pushdown (off by default in Spark
    4.1) so WHERE clauses reach :meth:`_TxLogBatchReader.pushFilters`
    and prune files by the log's footer stats."""
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(TxLogDataSource)
