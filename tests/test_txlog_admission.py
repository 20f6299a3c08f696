"""Streaming admission control for the txlog sources (round 13):
``maxFilesPerTrigger`` / ``maxBytesPerTrigger`` on the file stream
(initial snapshot chunked via the offset's ``index`` field, commits
never split) and ``maxCommitsPerBatch`` on the CDF stream. A backlog
must drain across MULTIPLE micro-batches whose union is byte-identical
to the unbounded drain — incremental checkpoint progress instead of
one giant catch-up batch."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_pipelines_spark.sources import txlog
from data_pipelines_spark.sources.txlog_datasource import (
    _TxLogCDCStreamReader,
    _TxLogStreamReader,
    register_txlog_source,
)


@pytest.fixture()
def backlog_table(spark, tmp_path):
    """create (2 files, 20 rows) + 3 single-file appends (2 rows
    each): a 5-file backlog across 4 commits."""
    register_txlog_source(spark)
    path = str(tmp_path / "tbl")
    df = spark.createDataFrame(
        [(i, f"v{i}") for i in range(20)], "k long, v string"
    )
    txlog.create_table(spark, df, path, key_cols=["k"], num_files=2)
    for j in range(3):
        txlog.append_table(
            spark,
            spark.createDataFrame(
                [(100 + 2 * j, "a"), (101 + 2 * j, "b")], "k long, v string"
            ),
            path,
            num_files=1,
        )
    return path


def _drain_offsets(reader) -> list[tuple[dict, dict, int]]:
    """Drive the reader exactly as a micro-batch loop does: latestOffset
    / partitions / commit until no progress. Returns (start, end,
    n_partitions) per batch."""
    out = []
    cur = reader.initialOffset()
    for _ in range(50):
        end = reader.latestOffset()
        if end == cur:
            break
        parts = reader.partitions(cur, end)
        reader.commit(end)
        out.append((cur, end, len(parts)))
        cur = end
    else:
        raise AssertionError("drain did not converge")
    return out


def test_max_files_chunks_snapshot_and_commits(spark, backlog_table):
    """The snapshot pins at the head (version 3: create + 3 appends =
    5 live files) and drains one file per trigger via index offsets;
    commits landing AFTER the snapshot drain one per trigger as plain
    version offsets (checkpoint-compatible shape)."""
    r = _TxLogStreamReader(backlog_table, ["k", "v"], 0, False, max_files=1)
    batches = _drain_offsets(r)
    assert len(batches) == 5
    assert all(n == 1 for _s, _e, n in batches)
    assert [b[1] for b in batches] == [
        {"version": 3, "index": 1},
        {"version": 3, "index": 2},
        {"version": 3, "index": 3},
        {"version": 3, "index": 4},
        {"version": 3},
    ]
    # steady state: two more commits drain one per trigger
    for j in (0, 1):
        txlog.append_table(
            spark,
            spark.createDataFrame([(200 + j, "z")], "k long, v string"),
            backlog_table,
            num_files=1,
        )
    cur = {"version": 3}
    steady = []
    while True:
        end = r.latestOffset()
        if end == cur:
            break
        steady.append((end, len(r.partitions(cur, end))))
        r.commit(end)
        cur = end
    assert steady == [({"version": 4}, 1), ({"version": 5}, 1)]


def test_max_files_two_per_trigger(spark, backlog_table):
    r = _TxLogStreamReader(backlog_table, ["k", "v"], 0, False, max_files=2)
    batches = _drain_offsets(r)
    # the 5-file pinned snapshot drains two files per trigger
    assert [n for _s, _e, n in batches] == [2, 2, 1]


def test_max_bytes_never_splits_a_commit(spark, backlog_table):
    # 1-byte budget: every batch still makes progress, one file per
    # batch (a commit bigger than the budget lands whole)
    r = _TxLogStreamReader(backlog_table, ["k", "v"], 0, False, max_bytes=1)
    batches = _drain_offsets(r)
    assert len(batches) == 5
    assert all(n == 1 for _s, _e, n in batches)


def test_unbounded_reader_offsets_unchanged(spark, backlog_table):
    """No limits -> one catch-up batch to the head, offset shape
    identical to pre-admission rounds (checkpoint compatibility)."""
    r = _TxLogStreamReader(backlog_table, ["k", "v"], 0, False)
    batches = _drain_offsets(r)
    assert len(batches) == 1
    assert batches[0][1] == {"version": 3}
    assert batches[0][2] == 5


def test_restart_with_pending_batch_stays_bounded(spark, backlog_table):
    """A restarted reader that replays a checkpointed pending batch
    (partitions() called with the stored offsets) learns the cursor
    from it and bounds every subsequent batch."""
    # simulate restart mid-drain: the checkpoint holds the pending
    # batch ({-1} -> {3, index 1}); a fresh reader replays it
    r2 = _TxLogStreamReader(backlog_table, ["k", "v"], 0, False, max_files=1)
    parts = r2.partitions({"version": -1}, {"version": 3, "index": 1})
    assert len(parts) == 1
    nxt = r2.latestOffset()
    assert nxt == {"version": 3, "index": 2}  # bounded continuation
    # clean-commit restart: the engine replays partitions(c, c) first
    # (equal offsets, empty batch) — the cursor is learned from it and
    # the next planned batch is bounded
    r3 = _TxLogStreamReader(backlog_table, ["k", "v"], 0, False, max_files=1)
    assert r3.partitions({"version": 0}, {"version": 0}) == []
    assert r3.latestOffset() == {"version": 1}
    # a FRESH query (no cursor at all) is bounded too, from
    # startingVersion - 1 — here the first snapshot chunk
    r4 = _TxLogStreamReader(backlog_table, ["k", "v"], 0, False, max_files=1)
    assert r4.latestOffset() == {"version": 3, "index": 1}


def test_offset_regression_raises(spark, backlog_table):
    """If the engine ever planned a batch whose end offset sits below
    its start (the one ordering that could re-emit committed data),
    partitions() must fail loudly, not return duplicates."""
    r = _TxLogStreamReader(backlog_table, ["k", "v"], 0, False, max_files=1)
    with pytest.raises(ValueError, match="offset regression"):
        r.partitions({"version": 2}, {"version": 1})
    with pytest.raises(ValueError, match="offset regression"):
        # same version: index-carrying end < index-free start
        r.partitions({"version": 3}, {"version": 3, "index": 2})
    full_schema = txlog.read_table(spark, backlog_table).schema
    cols = [f.name for f in full_schema.fields]
    rc = _TxLogCDCStreamReader(
        backlog_table, cols, full_schema, 0, ["k"], 1 << 30, max_commits=1
    )
    with pytest.raises(ValueError, match="offset regression"):
        rc.partitions({"version": 2}, {"version": 1})


def test_bounded_union_matches_unbounded_content(spark, backlog_table):
    """The batches' emitted file sets union to exactly the unbounded
    drain's — no row lost, none duplicated."""

    def emitted(reader):
        files = []
        cur = reader.initialOffset()
        while True:
            end = reader.latestOffset()
            if end == cur:
                return files
            for p in reader.partitions(cur, end):
                files.append(p.abs_path)
            reader.commit(end)
            cur = end

    bounded = emitted(
        _TxLogStreamReader(backlog_table, ["k", "v"], 0, False, max_files=1)
    )
    unbounded = emitted(
        _TxLogStreamReader(backlog_table, ["k", "v"], 0, False)
    )
    assert sorted(bounded) == sorted(unbounded)
    assert len(bounded) == len(set(bounded))


def test_e2e_stream_drains_backlog_across_micro_batches(
    spark, backlog_table, tmp_path
):
    """Through the real engine: a maxFilesPerTrigger=1 stream over the
    5-file backlog produces >1 micro-batch and the full row set, and a
    checkpointed restart emits only newer commits exactly once."""
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")

    def drain():
        q = (
            spark.readStream.format("txlog")
            .option("path", backlog_table)
            .option("maxFilesPerTrigger", "1")
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .start()
        )
        try:
            q.processAllAvailable()
            progresses = [
                p
                for p in q.recentProgress
                if p["numInputRows"] and p["numInputRows"] > 0
            ]
        finally:
            q.stop()
        return progresses

    progresses = drain()
    assert len(progresses) >= 4  # 5 single-file batches (>=4 seen)
    assert max(p["numInputRows"] for p in progresses) <= 10
    got = {r["k"] for r in spark.read.parquet(out).collect()}
    assert got == set(range(20)) | {100, 101, 102, 103, 104, 105}
    # restart leg: two more commits drain incrementally, exactly once
    for j in (3, 4):
        txlog.append_table(
            spark,
            spark.createDataFrame(
                [(100 + 2 * j, "a"), (101 + 2 * j, "b")], "k long, v string"
            ),
            backlog_table,
            num_files=1,
        )
    drain()
    rows = [r["k"] for r in spark.read.parquet(out).collect()]
    assert len(rows) == 30 and len(set(rows)) == 30


def test_cdf_max_commits_per_batch(spark, backlog_table):
    full_schema = txlog.read_table(spark, backlog_table).schema
    cols = [f.name for f in full_schema.fields] + [
        "_change_type",
        "_commit_version",
    ]
    r = _TxLogCDCStreamReader(
        backlog_table, cols, full_schema, 0, ["k"], 1 << 30, max_commits=2
    )
    batches = _drain_offsets(r)
    # versions 0..3 drain two commits per micro-batch
    assert [b[1]["version"] for b in batches] == [1, 3]
    # and the per-batch partitions cover only that commit range
    r2 = _TxLogCDCStreamReader(
        backlog_table, cols, full_schema, 0, ["k"], 1 << 30
    )
    unbounded = _drain_offsets(r2)
    assert unbounded[0][1] == {"version": 3}
    total_bounded = sum(n for _s, _e, n in batches)
    assert total_bounded == unbounded[0][2]


def test_e2e_cdf_stream_bounded_matches_unbounded(
    spark, backlog_table, tmp_path
):
    txlog.delete_where(
        spark, backlog_table, F.col("k") == 5, bounds={"k": (5, 5)}
    )

    def drain(name, **opts):
        r = (
            spark.readStream.format("txlog")
            .option("path", backlog_table)
            .option("readChangeFeed", "true")
        )
        for k, v in opts.items():
            r = r.option(k, v)
        q = (
            r.load()
            .writeStream.format("memory")
            .queryName(name)
            .option(
                "checkpointLocation", str(tmp_path / f"ckpt_{name}")
            )
            .start()
        )
        try:
            q.processAllAvailable()
            n_batches = len(
                [
                    p
                    for p in q.recentProgress
                    if p["numInputRows"] and p["numInputRows"] > 0
                ]
            )
        finally:
            q.stop()
        rows = {
            tuple(r)
            for r in spark.table(name)
            .select("k", "v", "_change_type", "_commit_version")
            .collect()
        }
        return rows, n_batches

    bounded, nb = drain("cdf_bounded", maxCommitsPerBatch="1")
    unbounded, nu = drain("cdf_unbounded")
    assert bounded == unbounded and len(bounded) > 0
    assert nb > nu


def test_snapshot_chunk_after_full_version_raises(spark, backlog_table):
    """Review fix (r13): an index-carrying END offset is only legal
    after the initial offset or another chunk of the same snapshot —
    following an index-free start >= 0 it would re-emit snapshot rows
    the commit walk already delivered, so partitions() must refuse."""
    r = _TxLogStreamReader(backlog_table, ["k", "v"], 0, False, max_files=1)
    with pytest.raises(ValueError, match="offset regression"):
        r.partitions({"version": 2}, {"version": 3, "index": 1})


def test_zero_rate_limit_options_rejected(spark, backlog_table):
    """maxCommitsPerBatch=0 would stall the stream forever (the cursor
    never advances); all three admission options reject <= 0 at plan
    time instead."""
    from data_pipelines_spark.sources.txlog_datasource import (
        TxLogDataSource,
    )

    for opt in ("maxFilesPerTrigger", "maxBytesPerTrigger",
                "maxCommitsPerBatch"):
        ds = TxLogDataSource({"path": backlog_table, opt: "0"})
        with pytest.raises(ValueError, match="positive integer"):
            ds._positive_option(opt)
        ds_ok = TxLogDataSource({"path": backlog_table, opt: "3"})
        assert ds_ok._positive_option(opt) == 3
    assert TxLogDataSource({"path": backlog_table})._positive_option(
        "maxFilesPerTrigger"
    ) is None
