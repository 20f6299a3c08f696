"""Model-based (stateful) testing of the transactional table protocol:
Hypothesis drives a random interleaving of create/append/merge/delete/
compact/optimize/vacuum against `sources/txlog.py`, mirrored on a plain
Python dict model, with invariants after every step:

- latest table content == model content (exact multiset);
- a randomly retained HISTORICAL snapshot still reads back exactly the
  model state captured when it was committed (time travel under later
  physical rewrites);
- `table_history` version numbering stays gapless and monotone.

This is the strongest check a log-structured format can get short of
fault injection: protocol bugs (a remove action dropped, a checkpoint
serialization miss, stats pruning skipping a file it must rewrite, a
compaction losing rows) surface as model divergence on SOME random
sequence, not just on the handwritten scenarios. Kept to few/short
sequences because every step is a Spark job round-trip; the unit suite
(`test_txlog.py`) covers the targeted edges deterministically."""

from __future__ import annotations

import shutil
import tempfile

import pytest
from hypothesis import HealthCheck, settings
from hypothesis import strategies as st
from hypothesis.stateful import (
    RuleBasedStateMachine,
    initialize,
    invariant,
    precondition,
    rule,
)
from pyspark.sql import functions as F

from data_pipelines_spark.session import get_spark
from data_pipelines_spark.sources import txlog

KEYS = st.integers(min_value=0, max_value=39)
VALS = st.text(
    alphabet="abcdefgh", min_size=1, max_size=6
)


def _spark():
    return get_spark(app_name="data-pipelines-spark-tests")


class TxLogMachine(RuleBasedStateMachine):
    def __init__(self):
        super().__init__()
        self.spark = _spark()
        self.dir = tempfile.mkdtemp(prefix="txlog_state_")
        self.path = f"{self.dir}/tbl"
        self.model: dict[int, str] = {}
        self.snapshots: dict[int, dict[int, str]] = {}

    def _df(self, rows):
        return self.spark.createDataFrame(
            [(k, v) for k, v in rows], "k long, v string"
        )

    def _record(self):
        self.snapshots[txlog.table_version(self.path)] = dict(self.model)

    @initialize(rows=st.dictionaries(KEYS, VALS, max_size=8))
    def create(self, rows):
        txlog.create_table(
            self.spark, self._df(sorted(rows.items())), self.path,
            key_cols=["k"], num_files=2,
        )
        self.model = dict(rows)
        self._record()

    @rule(
        rows=st.dictionaries(KEYS, VALS, min_size=1, max_size=6),
        mode=st.sampled_from(["cow", "dv"]),
    )
    def merge(self, rows, mode):
        # copy-on-write and merge-on-read (deletion vectors) must be
        # indistinguishable to the model under ANY interleaving
        txlog.merge_upsert(
            self.spark, self._df(sorted(rows.items())), self.path,
            mode=mode,
        )
        self.model.update(rows)
        self._record()

    @rule(
        lo=KEYS,
        span=st.integers(min_value=0, max_value=10),
        mode=st.sampled_from(["cow", "dv"]),
    )
    def delete_range(self, lo, span, mode):
        hi = lo + span
        txlog.delete_where(
            self.spark, self.path,
            (F.col("k") >= lo) & (F.col("k") <= hi),
            bounds={"k": (lo, hi)},
            mode=mode,
        )
        self.model = {k: v for k, v in self.model.items() if not lo <= k <= hi}
        self._record()

    @rule(threshold=st.sampled_from([None, 500]))
    def compact(self, threshold):
        txlog.compact_table(
            self.spark, self.path, target_file_rows=1000,
            min_file_rows=threshold,
        )
        # physical only: model unchanged; no snapshot entry needed

    @rule()
    def describe_consistent(self):
        # DESCRIBE's log-derived row count must equal the model's at
        # every point (live rows = physical minus deletion vectors)
        desc = txlog.describe_table(self.path)
        assert desc["total_rows"] == len(self.model), (
            desc["total_rows"], len(self.model),
        )
        assert desc["version"] == txlog.table_version(self.path)

    @precondition(lambda self: len(self.snapshots) > 0)
    @rule(data=st.data())
    def timestamp_resolves_to_version(self, data):
        # timestampAsOf at a retained version's exact commit ts must
        # resolve to that version or a LATER one carrying the same ts
        # (commits within one test step can share a wall-clock stamp);
        # reading at the resolved version equals reading at the asked
        # version whenever the ts was unique
        v = data.draw(st.sampled_from(sorted(self.snapshots)))
        ts = txlog._commit_ts(self.path, v)
        if ts is None:
            return
        got = txlog.version_at_timestamp(self.path, ts)
        assert got >= v, (got, v)
        assert txlog._commit_ts(self.path, got) <= ts

    @rule()
    def vacuum_dry_run_touches_nothing(self):
        before = {
            rel: e["rows"]
            for rel, e in txlog._load_state(self.path).files.items()
        }
        txlog.vacuum_table(
            self.path, retain_versions=1, min_age_seconds=0, dry_run=True
        )
        # a dry run deletes no file and changes no snapshot
        got = {
            r["k"]: r["v"]
            for r in txlog.read_table(self.spark, self.path).collect()
        }
        assert got == self.model
        after = {
            rel: e["rows"]
            for rel, e in txlog._load_state(self.path).files.items()
        }
        assert after == before

    @precondition(lambda self: len(self.snapshots) > 0)
    @rule(data=st.data())
    def restore(self, data):
        # restore to any RETAINED snapshot (vacuum prunes self.snapshots
        # in lockstep with the files it deletes, so the target's files
        # exist); model rolls back to the captured state and the restore
        # itself becomes a new recorded version
        v = data.draw(st.sampled_from(sorted(self.snapshots)))
        txlog.restore_table(self.spark, self.path, v)
        self.model = dict(self.snapshots[v])
        self._record()

    @rule()
    def optimize(self):
        txlog.optimize_table(
            self.spark, self.path, zorder_by=["k"], target_file_rows=1000,
            bits=6,
        )

    @rule()
    def vacuum(self):
        # age floor 0 = the aggressive path; retained snapshots must
        # stay readable (checked by the invariant below against the
        # LATEST version, which is always retained)
        txlog.vacuum_table(self.path, retain_versions=1, min_age_seconds=0)
        # older snapshots may now be gone
        latest = txlog.table_version(self.path)
        self.snapshots = {
            v: s for v, s in self.snapshots.items() if v == latest
        }

    @precondition(lambda self: len(self.snapshots) > 1)
    @rule()
    def check_time_travel(self):
        # read back the OLDEST retained snapshot exactly
        v = min(self.snapshots)
        got = {
            r["k"]: r["v"]
            for r in txlog.read_table(self.spark, self.path, version=v)
            .collect()
        }
        assert got == self.snapshots[v], (v, got, self.snapshots[v])

    @invariant()
    def latest_matches_model(self):
        if not txlog.table_exists(self.path):
            return
        got = {
            r["k"]: r["v"]
            for r in txlog.read_table(self.spark, self.path).collect()
        }
        assert got == self.model, (got, self.model)

    @invariant()
    def history_is_gapless(self):
        if not txlog.table_exists(self.path):
            return
        hist = txlog.table_history(self.path)
        versions = [h["version"] for h in hist]
        assert versions == list(range(versions[0], versions[0] + len(versions)))

    def teardown(self):
        shutil.rmtree(self.dir, ignore_errors=True)


TxLogMachine.TestCase.settings = settings(
    max_examples=5,
    stateful_step_count=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.data_too_large],
)
TestTxLogStateMachine = TxLogMachine.TestCase


class TxLogMemStoreMachine(TxLogMachine):
    """The SAME randomized protocol model run against the
    InMemoryLogStore mock coordinator: proves the LogStore seam —
    every invariant the file-backed log holds must hold when commit
    coordination routes through the put-if-absent contract alone (the
    log never touches disk; data files still do)."""

    def __init__(self):
        super().__init__()
        self.store = txlog.InMemoryLogStore()
        txlog.register_log_store(self.dir, self.store)

    @invariant()
    def log_never_touches_disk(self):
        import os

        assert not os.path.isdir(os.path.join(self.path, "_txlog"))

    def teardown(self):
        txlog.register_log_store(self.dir, txlog.FileLogStore())
        super().teardown()


TxLogMemStoreMachine.TestCase.settings = settings(
    max_examples=3,
    stateful_step_count=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.data_too_large],
)
TestTxLogMemStoreStateMachine = TxLogMemStoreMachine.TestCase


class TxLogCondPutMachine(TxLogMachine):
    """The SAME randomized protocol model against the deployable
    object-store coordinator: ConditionalPutLogStore over the local
    conditional-put emulator. Every invariant must hold when the only
    atomicity the log gets is one conditional PUT per commit object —
    the S3/GCS deployment pattern, proven by the full state machine
    rather than by the lifecycle test alone."""

    def __init__(self):
        super().__init__()
        self.store = txlog.ConditionalPutLogStore(
            txlog.LocalObjectStoreEmulator(f"{self.dir}/objstore")
        )
        txlog.register_log_store(self.dir, self.store)

    @invariant()
    def log_never_touches_disk(self):
        import os

        assert not os.path.isdir(os.path.join(self.path, "_txlog"))

    def teardown(self):
        txlog.register_log_store(self.dir, txlog.FileLogStore())
        super().teardown()


TxLogCondPutMachine.TestCase.settings = settings(
    max_examples=3,
    stateful_step_count=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.data_too_large],
)
TestTxLogCondPutStateMachine = TxLogCondPutMachine.TestCase


@pytest.mark.usefixtures("spark")
def test_placeholder_session_shared():
    """The machine reuses the session-scoped SparkSession via
    get_spark's singleton, so the stateful test does not pay a JVM
    boot per example."""
    assert _spark() is not None
