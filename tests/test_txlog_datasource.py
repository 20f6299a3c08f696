"""`format("txlog")` Python Data Source (`sources/txlog_datasource.py`):
batch snapshot/time-travel reads through the planner, and the
streaming source over the commit log (append-only contract, offset
replay, skipChangeCommits)."""

from __future__ import annotations

import os

import pytest
from pyspark.errors.exceptions.captured import StreamingQueryException
from pyspark.sql import functions as F

from data_pipelines_spark.sources import txlog
from data_pipelines_spark.sources.txlog_datasource import (
    register_txlog_source,
)


@pytest.fixture()
def table(spark, tmp_path):
    register_txlog_source(spark)
    path = str(tmp_path / "tbl")
    df = spark.createDataFrame(
        [(i, f"v{i}") for i in range(20)], "k long, v string"
    )
    txlog.create_table(spark, df, path, key_cols=["k"], num_files=2)
    return path


def _batch(spark, path, **opts):
    r = spark.read.format("txlog").option("path", path)
    for k, v in opts.items():
        r = r.option(k, v)
    return r.load()


def test_batch_read_matches_read_table(spark, table):
    got = {(r["k"], r["v"]) for r in _batch(spark, table).collect()}
    want = {(r["k"], r["v"]) for r in txlog.read_table(spark, table).collect()}
    assert got == want and len(got) == 20


def test_batch_time_travel_and_projection(spark, table):
    txlog.append_table(
        spark, spark.createDataFrame([(99, "new")], "k long, v string"), table
    )
    assert _batch(spark, table).count() == 21
    assert _batch(spark, table, version=0).count() == 20
    # column pruning through the planner: selecting one column works
    ks = {r["k"] for r in _batch(spark, table).select("k").collect()}
    assert 99 in ks and len(ks) == 21


def test_batch_read_across_schema_evolution(spark, table):
    ev = spark.createDataFrame(
        [(1, "evolved", "extra")], "k long, v string, note string"
    )
    txlog.merge_upsert(spark, ev, table, evolve_schema=True)
    out = _batch(spark, table)
    assert set(out.columns) == {"k", "v", "note"}
    rows = {r["k"]: r["note"] for r in out.collect()}
    assert rows[1] == "extra" and rows[2] is None


def _drain_stream(spark, path, ckpt, out_table, **opts):
    r = spark.readStream.format("txlog").option("path", path)
    for k, v in opts.items():
        r = r.option(k, v)
    q = (
        r.load()
        .writeStream.format("memory")
        .queryName(out_table)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def test_stream_incremental_appends(spark, table, tmp_path):
    """Two drains over one checkpoint: the second emits ONLY the rows
    of commits newer than the first drain's committed offset (memory
    sink can't recover a checkpoint, so the restart leg uses parquet)."""
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")

    def drain():
        q = (
            spark.readStream.format("txlog").option("path", table).load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    drain()
    assert spark.read.parquet(out).count() == 20
    txlog.append_table(
        spark, spark.createDataFrame([(100, "a"), (101, "b")],
                                     "k long, v string"), table
    )
    txlog.append_table(
        spark, spark.createDataFrame([(102, "c")], "k long, v string"), table
    )
    drain()
    got = [r["k"] for r in spark.read.parquet(out).collect()]
    # exactly once: 23 rows total, no re-emission of the first 20
    assert len(got) == 23
    assert set(got) == set(range(20)) | {100, 101, 102}


def _drain_parquet(spark, table, ckpt, out, **opts):
    r = spark.readStream.format("txlog").option("path", table)
    for k, v in opts.items():
        r = r.option(k, v)
    q = (
        r.load()
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def test_stream_initial_snapshot_reflects_past_merges(spark, table, tmp_path):
    """A merge BEFORE stream start is reflected in the first batch (the
    Delta initial-snapshot behavior) — no stale pre-merge rows, no
    change-commit error for history that predates the stream."""
    txlog.merge_upsert(
        spark,
        spark.createDataFrame([(1, "rewritten"), (50, "ins")],
                              "k long, v string"),
        table,
    )
    _drain_stream(spark, table, str(tmp_path / "c0"), "txs_snap")
    got = {r["k"]: r["v"] for r in spark.table("txs_snap").collect()}
    assert len(got) == 21 and got[1] == "rewritten" and got[50] == "ins"


def test_stream_fails_on_change_commit_by_default(spark, table, tmp_path):
    """A merge AFTER stream start fails the stream (its adds would
    re-emit rewritten rows past the already-streamed snapshot)."""
    ckpt, out = str(tmp_path / "c1"), str(tmp_path / "o1")
    _drain_parquet(spark, table, ckpt, out)
    assert spark.read.parquet(out).count() == 20
    txlog.merge_upsert(
        spark,
        spark.createDataFrame([(1, "rewritten")], "k long, v string"),
        table,
    )
    with pytest.raises(StreamingQueryException, match="skipChangeCommits"):
        _drain_parquet(spark, table, ckpt, out)


def test_stream_skip_change_commits(spark, table, tmp_path):
    """skipChangeCommits: post-snapshot merges are skipped wholesale
    (downstream keeps the stale value by explicit choice), appends
    still flow, and compaction never re-emits."""
    ckpt, out = str(tmp_path / "c2"), str(tmp_path / "o2")
    _drain_parquet(spark, table, ckpt, out, skipChangeCommits="true")
    txlog.merge_upsert(
        spark,
        spark.createDataFrame([(1, "rewritten"), (50, "ins")],
                              "k long, v string"),
        table,
    )
    txlog.compact_table(spark, table, target_file_rows=10_000)
    txlog.append_table(
        spark, spark.createDataFrame([(60, "app")], "k long, v string"), table
    )
    _drain_parquet(spark, table, ckpt, out, skipChangeCommits="true")
    got = {r["k"]: r["v"] for r in spark.read.parquet(out).collect()}
    # snapshot's 20 + the append; the merge commit never emits (neither
    # its rewrite nor its insert) and compaction re-emits nothing
    assert len(got) == 21 and got[1] == "v1" and 50 not in got
    assert got[60] == "app"


def test_stream_starting_version(spark, table, tmp_path):
    txlog.append_table(
        spark, spark.createDataFrame([(200, "late")], "k long, v string"),
        table,
    )
    _drain_stream(
        spark, table, str(tmp_path / "c3"), "txs_sv", startingVersion="1"
    )
    got = {r["k"] for r in spark.table("txs_sv").collect()}
    assert got == {200}


def test_write_api_bootstrap_append_overwrite(spark, tmp_path):
    register_txlog_source(spark)
    path = str(tmp_path / "wtbl")
    df = spark.createDataFrame(
        [(i, f"v{i}") for i in range(30)], "k long, v string"
    )
    # bootstrap via the write API, with key columns for stats
    (
        df.repartition(2).write.format("txlog")
        .option("path", path).option("keyCols", "k").mode("append").save()
    )
    assert {r["k"] for r in txlog.read_table(spark, path).collect()} == set(
        range(30)
    )
    # task-side footer stats feed merge pruning like any other commit
    report = txlog.merge_upsert(
        spark,
        spark.createDataFrame([(0, "upd")], "k long, v string"),
        path,
        key_cols=["k"],
    )
    assert report["files_skipped"] >= 1
    # append more rows through the API
    spark.createDataFrame([(100, "a")], "k long, v string").write.format(
        "txlog"
    ).option("path", path).mode("append").save()
    assert txlog.read_table(spark, path).count() == 31
    # schema drift rejected
    with pytest.raises(Exception, match="does not match table schema"):
        spark.createDataFrame([(1, 2)], "k long, v long").write.format(
            "txlog"
        ).option("path", path).mode("append").save()
    # overwrite replaces content atomically; old snapshot time-travels
    v_before = txlog.table_version(path)
    spark.createDataFrame([(7, "only")], "k long, v string").write.format(
        "txlog"
    ).option("path", path).mode("overwrite").save()
    assert [
        (r["k"], r["v"]) for r in txlog.read_table(spark, path).collect()
    ] == [(7, "only")]
    assert txlog.read_table(spark, path, version=v_before).count() == 31


def test_write_api_enforces_constraints(spark, tmp_path):
    from data_pipelines_spark.sources.txlog import add_constraint

    register_txlog_source(spark)
    path = str(tmp_path / "ctbl")
    base = spark.createDataFrame([(1, "a")], "k long, v string")
    txlog.create_table(spark, base, path, key_cols=["k"])
    add_constraint(spark, path, "k_nonneg", "k >= 0")
    with pytest.raises(Exception, match="k_nonneg"):
        spark.createDataFrame([(-1, "bad")], "k long, v string").write.format(
            "txlog"
        ).option("path", path).mode("append").save()
    # nothing landed, and the aborted write's staging files are gone
    assert txlog.read_table(spark, path).count() == 1
    spark.createDataFrame([(2, "ok")], "k long, v string").write.format(
        "txlog"
    ).option("path", path).mode("append").save()
    assert txlog.read_table(spark, path).count() == 2


def test_batch_read_empty_table(spark, tmp_path):
    """Zero live files -> zero partitions; PySpark hands read() a None
    partition, which must emit nothing (was a crash)."""
    register_txlog_source(spark)
    path = str(tmp_path / "etbl")
    txlog.create_table(
        spark,
        spark.createDataFrame([(1, "a")], "k long, v string"),
        path,
        key_cols=["k"],
    )
    txlog.delete_where(spark, path, F.lit(True))
    out = spark.read.format("txlog").option("path", path).load()
    assert out.count() == 0 and out.columns == ["k", "v"]


def test_write_api_failed_first_write_leaves_no_table(spark, tmp_path):
    """Atomic create-as-select: a first write whose job fails must
    leave NO table behind (bootstrap meta commits together with the
    data), so the path stays fully reusable — including by
    create_table, which refuses existing tables."""
    register_txlog_source(spark)
    path = str(tmp_path / "atomic")
    bad = spark.range(4).select(
        F.col("id").alias("k"),
        F.assert_true(F.col("id") < 3).cast("string").alias("v"),
    )
    with pytest.raises(Exception):
        bad.write.format("txlog").option("path", path).mode(
            "append"
        ).save()
    assert not txlog.table_exists(path)
    txlog.create_table(
        spark,
        spark.createDataFrame([(1, "a")], "k long, v string"),
        path,
        key_cols=["k"],
    )
    assert txlog.read_table(spark, path).count() == 1


def test_write_api_bootstrap_is_one_commit(spark, tmp_path):
    register_txlog_source(spark)
    path = str(tmp_path / "one")
    spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string").write.format(
        "txlog"
    ).option("path", path).option("keyCols", "k").mode("append").save()
    # meta + data landed as a single atomic commit 0
    assert txlog.table_version(path) == 0
    hist = txlog.table_history(path)
    assert hist[0]["op"] == "create" and hist[0]["rows_added"] == 2


def test_stream_allows_pure_insert_merge(spark, table, tmp_path):
    """A merge that removed NO files (brand-new keys — the txsink CDC
    shape) adds only new logical rows: it must stream like an append,
    not fail the append-only contract (the Delta source streams
    removal-free adds the same way)."""
    ckpt, out = str(tmp_path / "c4"), str(tmp_path / "o4")
    _drain_parquet(spark, table, ckpt, out)
    rep = txlog.merge_upsert(
        spark,
        spark.createDataFrame(
            [(100, "i100"), (101, "i101")], "k long, v string"
        ),
        table,
    )
    assert rep["files_rewritten"] == 0  # genuinely pure-insert
    _drain_parquet(spark, table, ckpt, out)
    got = {r["k"]: r["v"] for r in spark.read.parquet(out).collect()}
    assert len(got) == 22 and got[100] == "i100" and got[101] == "i101"


def test_pushfilters_prunes_like_read_table_bounds(spark, tmp_path):
    """Planner filter pushdown (DataSourceReader.pushFilters) reuses
    the log's footer-stats zonemap: partitions() must plan exactly the
    files read_table(bounds=...) would read, and every filter goes back
    to Spark for row-level post-scan evaluation."""
    from pyspark.sql.datasource import (
        GreaterThanOrEqual,
        In,
        IsNull,
        LessThanOrEqual,
    )

    from data_pipelines_spark.sources.txlog_datasource import (
        _TxLogBatchReader,
    )

    register_txlog_source(spark)
    path = str(tmp_path / "zcl")
    df = spark.createDataFrame(
        [(i, f"v{i}") for i in range(200)], "k long, v string"
    )
    txlog.create_table(spark, df, path, key_cols=["k"], num_files=20)
    state = txlog._load_state(path)

    reader = _TxLogBatchReader(path, None, ["k", "v"])
    filters = [
        GreaterThanOrEqual(("k",), 10),
        LessThanOrEqual(("k",), 11),
    ]
    returned = list(reader.pushFilters(filters))
    assert returned == filters  # file-granular pruning: Spark re-checks rows
    want = [
        e
        for e in state.files.values()
        if not txlog._file_disjoint(e, {"k": (10, 11)})
    ]
    assert len(reader.partitions()) == len(want) < 20

    # In-list stabbing: two values in two distant files -> 2 partitions
    r2 = _TxLogBatchReader(path, None, ["k", "v"])
    r2.pushFilters([In(("k",), (5, 195))])
    assert len(r2.partitions()) == 2

    # IsNull on a column with zero recorded nulls prunes everything
    r3 = _TxLogBatchReader(path, None, ["k", "v"])
    r3.pushFilters([IsNull(("k",))])
    assert len(r3.partitions()) == 0

    # a filter on a column with NO stats prunes nothing
    r4 = _TxLogBatchReader(path, None, ["k", "v"])
    r4.pushFilters([GreaterThanOrEqual(("v",), "zzz")])
    assert len(r4.partitions()) == 20


def test_pushfilters_end_to_end_through_planner(spark, tmp_path):
    """spark.read.format('txlog').load().where(...) plans only the
    surviving files (scan-stage task count), returns exactly the right
    rows, and evaluates unsupported conjuncts post-scan."""
    register_txlog_source(spark)
    path = str(tmp_path / "e2e")
    df = spark.createDataFrame(
        [(i, f"v{i}") for i in range(200)], "k long, v string"
    )
    txlog.create_table(spark, df, path, key_cols=["k"], num_files=20)
    sc = spark.sparkContext
    tracker = sc.statusTracker()

    def scan_tasks(frame, group):
        sc.setJobGroup(group, group)
        try:
            rows = frame.collect()
        finally:
            sc.setJobGroup(None, None)
        total = 0
        for j in tracker.getJobIdsForGroup(group):
            info = tracker.getJobInfo(j)
            for sid in info.stageIds:
                si = tracker.getStageInfo(sid)
                if si:
                    total += si.numTasks
        return rows, total

    base = spark.read.format("txlog").option("path", path).load()
    _, full_tasks = scan_tasks(base, "txpf-full")
    assert full_tasks == 20
    out = base.where((F.col("k") >= 10) & (F.col("k") <= 12))
    rows, pruned_tasks = scan_tasks(out, "txpf-pruned")
    assert {(r["k"], r["v"]) for r in rows} == {
        (i, f"v{i}") for i in (10, 11, 12)
    }
    assert pruned_tasks == 1
    # partially-supported conjunction: the modulo term is Spark's
    mixed = base.where(
        (F.col("k") >= 10) & (F.col("k") <= 12) & (F.col("k") % 2 == 0)
    )
    assert {r["k"] for r in mixed.collect()} == {10, 12}


def test_stream_change_feed_matches_batch_table_changes(spark, table, tmp_path):
    """readChangeFeed=true streams row-level CDC (Delta's CDF shape):
    per-commit changes with pre/post image pairing must equal the batch
    table_changes over the same version range, checkpoint restarts are
    exactly-once, physical rewrites emit nothing, and pre-evolution
    commits NULL-fill evolved columns."""
    ckpt, out = str(tmp_path / "cdc_ck"), str(tmp_path / "cdc_out")
    # v1: evolving merge BEFORE the stream starts — commit 0's change
    # rows must NULL-fill `note` (absent from every v0 file)
    txlog.merge_upsert(
        spark,
        spark.createDataFrame(
            [(1, "r1", "n1"), (50, "i50", "n50")],
            "k long, v string, note string",
        ),
        table,
        evolve_schema=True,
    )

    def drain():
        q = (
            spark.readStream.format("txlog").option("path", table)
            .option("readChangeFeed", "true").load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    def changes(frame, version):
        return sorted(
            (r["k"], r["v"], r["note"], r["_change_type"])
            for r in frame.where(
                F.col("_commit_version") == version
            ).collect()
        )

    drain()
    got = spark.read.parquet(out)
    assert set(got.columns) == {
        "k", "v", "note", "_change_type", "_commit_version"
    }
    v0 = changes(got, 0)
    assert len(v0) == 20 and all(
        t[2] is None and t[3] == "insert" for t in v0
    )
    # v2: delete, v3: append, v4: compact (physical — must emit nothing)
    txlog.delete_where(spark, table, F.col("k") == 5, bounds={"k": (5, 5)})
    txlog.append_table(
        spark,
        spark.createDataFrame([(60, "a60", None)],
                              "k long, v string, note string"),
        table,
    )
    txlog.compact_table(spark, table, target_file_rows=10_000)
    drain()
    got = spark.read.parquet(out)
    # exactly-once across the restart: commit 0 emitted exactly once
    assert got.where(F.col("_commit_version") == 0).count() == 20
    for v in (1, 2, 3, 4):
        want = sorted(
            (r["k"], r["v"], r["note"], r["_change_type"])
            for r in txlog.table_changes(spark, table, v - 1, v).collect()
        )
        assert changes(got, v) == want, f"version {v} diverged"
    assert got.where(F.col("_commit_version") == 4).count() == 0
    # pre/post pairing visible: the evolving merge updated k=1
    v1 = changes(got, 1)
    assert (1, "v1", None, "update_pre") in v1
    assert (1, "r1", "n1", "update_post") in v1
    assert (50, "i50", "n50", "insert") in v1
    # a third drain with nothing new emits nothing
    drain()
    assert spark.read.parquet(out).count() == got.count()


def test_batch_read_rejects_change_feed_option(spark, table):
    register_txlog_source(spark)
    with pytest.raises(Exception, match="table_changes"):
        (
            spark.read.format("txlog").option("path", table)
            .option("readChangeFeed", "true").load().collect()
        )


def test_stream_restore_is_change_commit_even_adds_only(spark, table, tmp_path):
    """An adds-only restore (rolling back a whole-file delete) re-
    references files whose rows already streamed — it must gate as a
    change commit despite having zero remove actions, or the stream
    double-emits."""
    # ckpt A: starts at v0 with skipChangeCommits
    _drain_parquet(
        spark, table, str(tmp_path / "cka"), str(tmp_path / "oa"),
        skipChangeCommits="true",
    )
    # v1: delete an entire file's rows — remove with no add
    txlog.delete_where(spark, table, F.col("k") <= 9, bounds={"k": (0, 9)})
    # ckpt B: starts AFTER the delete (initial snapshot = 10 rows)
    _drain_parquet(spark, table, str(tmp_path / "ckb"), str(tmp_path / "ob"))
    assert spark.read.parquet(str(tmp_path / "ob")).count() == 10
    # v2: adds-only restore back to v0
    rep = txlog.restore_table(spark, table, 0)
    assert rep["files_removed"] == 0 and rep["files_added"] >= 1
    # stream B (no skip): the restore is its only new commit and must
    # fail the append-only contract even though it removes nothing
    with pytest.raises(StreamingQueryException, match="skipChangeCommits"):
        _drain_parquet(
            spark, table, str(tmp_path / "ckb"), str(tmp_path / "ob")
        )
    # stream A (skip): both the delete and the restore skip wholesale —
    # nothing re-emits, still exactly the original 20 rows
    _drain_parquet(
        spark, table, str(tmp_path / "cka"), str(tmp_path / "oa"),
        skipChangeCommits="true",
    )
    assert spark.read.parquet(str(tmp_path / "oa")).count() == 20


def test_batch_change_feed_matches_table_changes(spark, table):
    """Batch CDF: readChangeFeed + startingVersion[/endingVersion]
    through spark.read emits the same per-commit changes as
    txlog.table_changes over the same range."""
    register_txlog_source(spark)
    txlog.merge_upsert(
        spark,
        spark.createDataFrame([(1, "r1"), (50, "i50")], "k long, v string"),
        table,
    )  # v1
    txlog.delete_where(spark, table, F.col("k") == 5, bounds={"k": (5, 5)})
    txlog.compact_table(spark, table, target_file_rows=10_000)  # v3 physical
    txlog.append_table(
        spark, spark.createDataFrame([(60, "a")], "k long, v string"), table
    )  # v4
    cdf = (
        spark.read.format("txlog").option("path", table)
        .option("readChangeFeed", "true")
        .option("startingVersion", "1").load()
    )
    assert set(cdf.columns) == {"k", "v", "_change_type", "_commit_version"}
    for v in (1, 2, 3, 4):
        want = sorted(
            (r["k"], r["v"], r["_change_type"])
            for r in txlog.table_changes(spark, table, v - 1, v).collect()
        )
        got = sorted(
            (r["k"], r["v"], r["_change_type"])
            for r in cdf.where(F.col("_commit_version") == v).collect()
        )
        assert got == want, f"version {v}"
    # endingVersion bounds the range; version 0 emits the creates
    head = (
        spark.read.format("txlog").option("path", table)
        .option("readChangeFeed", "true")
        .option("startingVersion", "0").option("endingVersion", "0").load()
    )
    assert head.count() == 20
    assert {r["_change_type"] for r in head.collect()} == {"insert"}


def test_batch_timestamp_as_of(spark, table):
    import time as _time

    register_txlog_source(spark)
    t0 = _time.time()
    _time.sleep(0.05)
    txlog.append_table(
        spark, spark.createDataFrame([(99, "new")], "k long, v string"), table
    )
    old = (
        spark.read.format("txlog").option("path", table)
        .option("timestampAsOf", str(t0)).load()
    )
    assert old.count() == 20  # pre-append snapshot
    assert _batch(spark, table).count() == 21


def test_change_feed_rejects_version_pins(spark, table):
    """A version/timestampAsOf pin with readChangeFeed would be
    half-applied (schema frozen old, feed ranging to latest) — the
    combination is rejected outright."""
    register_txlog_source(spark)
    for opt, val in (("version", "0"), ("timestampAsOf", "1")):
        with pytest.raises(Exception, match="startingVersion"):
            (
                spark.read.format("txlog").option("path", table)
                .option("readChangeFeed", "true").option(opt, val)
                .load().collect()
            )


def _sorted_rows(df):
    return sorted(
        tuple((v is None, v) for v in row) for row in df.collect()
    )


def test_cdf_key_range_slicing_bounds_task_work(spark, tmp_path):
    """Bounded per-task CDF: a commit whose churned bytes exceed
    maxBytesPerTask is SLICED into key-range partitions — the sliced
    read must equal the single-task read exactly (rows route to one
    slice by key; NULL keys get a dedicated slice), and per-slice file
    bytes must actually shrink (the memory bound)."""
    from data_pipelines_spark.sources.txlog_datasource import (
        _cdc_partitions,
    )

    register_txlog_source(spark)
    path = str(tmp_path / "big")
    base = spark.createDataFrame(
        [(i, f"v{i}") for i in range(5000)], "k long, v string"
    )
    txlog.create_table(spark, base, path, key_cols=["k"], num_files=10)
    upd = spark.createDataFrame(
        [(i, "U") for i in range(0, 5000, 7)]
        + [(None, "NK"), (99_999, "NEW")],
        "k long, v string",
    )
    txlog.merge_upsert(spark, upd, path, mode="cow")  # big churn commit
    txlog.delete_where(spark, path, F.col("k") % 11 == 0, mode="dv")

    def read_cdf(**opts):
        r = (
            spark.read.format("txlog").option("path", path)
            .option("readChangeFeed", "true")
            .option("startingVersion", "1")
        )
        for k, v in opts.items():
            r = r.option(k, v)
        return r.load()

    def side_bytes(p):
        return sum(
            os.path.getsize(f["abs"]) for f in p.removed + p.added
        )

    # Size maxBytesPerTask from the commit's REAL churn so the slicer
    # still splits (>4 slices incl. the NULL slice) but the slice count
    # stays bounded: each slice pays a full per-task diff, so the old
    # maxBytesPerTask="1" produced thousands of slices and a ~17-minute
    # test for assertions that 7 slices prove identically.
    whole = _cdc_partitions(path, 1, 1, ["k"], None)
    budget = max(1, side_bytes(whole[0]) // 6)
    single = _sorted_rows(read_cdf())
    sliced = _sorted_rows(read_cdf(maxBytesPerTask=str(budget)))
    assert sliced == single
    # partition-level observables: slicing multiplies partitions,
    # bounds per-task bytes, and carves a NULL-key slice
    parts = _cdc_partitions(path, 1, 1, ["k"], budget)
    assert len(whole) == 1 and len(parts) > 4
    assert sum(1 for p in parts if p.nulls_only) == 1

    assert max(side_bytes(p) for p in parts) < side_bytes(whole[0])
    # every slice of one commit reports the same _commit_version
    assert {p.version for p in parts} == {1}


def test_cdf_slicing_falls_back_without_keys(spark, tmp_path):
    """No key columns -> no slicing axis: the reader falls back to the
    single-task diff rather than guessing, and stays correct."""
    from data_pipelines_spark.sources.txlog_datasource import (
        _cdc_partitions,
    )

    register_txlog_source(spark)
    path = str(tmp_path / "nokeys")
    base = spark.createDataFrame(
        [(i, f"v{i}") for i in range(100)], "k long, v string"
    )
    txlog.create_table(spark, base, path, num_files=4)  # no key_cols
    txlog.overwrite_table(
        spark,
        spark.createDataFrame([(1, "only")], "k long, v string"),
        path,
    )
    assert len(_cdc_partitions(path, 1, 1, [], 1)) == 1
    feed = (
        spark.read.format("txlog").option("path", path)
        .option("readChangeFeed", "true").option("startingVersion", "1")
        .option("maxBytesPerTask", "1").load()
    )
    kinds = {r["_change_type"] for r in feed.collect()}
    assert kinds == {"insert", "delete"}


def test_stream_cdf_with_slicing_matches_default(spark, table, tmp_path):
    """The STREAMING change feed slices big commits the same way; a
    drained sliced stream equals a drained default stream."""
    register_txlog_source(spark)
    txlog.merge_upsert(
        spark,
        spark.createDataFrame(
            [(i, "U") for i in range(0, 20, 3)], "k long, v string"
        ),
        table,
        mode="dv",
    )
    outs = {}
    for name, opts in (
        ("default", {}),
        ("sliced", {"maxBytesPerTask": "1"}),
    ):
        out = str(tmp_path / f"out_{name}")
        ckpt = str(tmp_path / f"ckpt_{name}")
        reader = (
            spark.readStream.format("txlog").option("path", table)
            .option("readChangeFeed", "true")
            .option("startingVersion", "1")
        )
        for k, v in opts.items():
            reader = reader.option(k, v)
        q = (
            reader.load().writeStream.format("parquet")
            .option("path", out).option("checkpointLocation", ckpt)
            .trigger(availableNow=True).start()
        )
        q.awaitTermination(120)
        outs[name] = _sorted_rows(spark.read.parquet(out))
    assert outs["sliced"] == outs["default"] and outs["default"]


def test_columns_option_projects_and_validates(spark, table):
    """option('columns', ...) — the explicit-projection escape hatch
    for the Python-DS column-pruning gap: the PLAN's schema carries
    only the asked columns (so only those column chunks cross the
    Arrow stream — the task reader fetches subsets via pyarrow), the
    values match a full read's projection, unknown names fail at plan
    time, and deletion vectors still apply under the projection."""
    register_txlog_source(spark)
    txlog.delete_where(spark, table, F.col("k") % 5 == 0, mode="dv")
    out = (
        spark.read.format("txlog").option("path", table)
        .option("columns", "v").load()
    )
    assert out.schema.simpleString() == "struct<v:string>"
    expect = sorted(
        r["v"]
        for r in txlog.read_table(spark, table).select("v").collect()
    )
    assert sorted(r["v"] for r in out.collect()) == expect
    # column order follows the option, not the table
    kv = (
        spark.read.format("txlog").option("path", table)
        .option("columns", "v, k").load()
    )
    assert kv.columns == ["v", "k"]
    with pytest.raises(Exception, match="unknown column"):
        (
            spark.read.format("txlog").option("path", table)
            .option("columns", "v,nope").load()
        )
    # CDF composes: projected change rows keep exact change semantics
    # (the diff runs over the FULL schema; projection applies at emit)
    feed = (
        spark.read.format("txlog").option("path", table)
        .option("readChangeFeed", "true").option("startingVersion", "1")
        .option("columns", "k").load()
    )
    assert feed.columns == ["k", "_change_type", "_commit_version"]
    got = sorted((r["k"], r["_change_type"]) for r in feed.collect())
    assert got == [(k, "delete") for k in range(0, 20, 5)]


def test_reader_fetches_only_requested_columns(spark, table):
    """The worker-side read path requests only the projected columns
    from pyarrow (iter_batches(columns=...) fetches only those column
    chunks — the actual I/O saving), pinned by driving the reader
    class directly."""
    from data_pipelines_spark.sources.txlog_datasource import (
        _TxLogBatchReader,
    )

    reader = _TxLogBatchReader(table, None, ["v"])
    parts = reader.partitions()
    assert parts
    for batch in reader.read(parts[0]):
        assert batch.schema.names == ["v"]


def test_cdf_with_columns_projection_keeps_hidden_updates(spark, table):
    """Review regression: combining option('columns') with
    readChangeFeed must diff over the FULL table schema — an update
    confined to a NON-projected column used to cancel in the EXCEPT
    ALL (both sides identical under the projection) and silently
    vanish from the feed."""
    register_txlog_source(spark)
    # change only v for k=3: invisible under a k-only projection
    txlog.merge_upsert(
        spark,
        spark.createDataFrame([(3, "CHANGED")], "k long, v string"),
        table,
        mode="dv",
    )
    feed = (
        spark.read.format("txlog").option("path", table)
        .option("readChangeFeed", "true").option("startingVersion", "1")
        .option("columns", "k").load()
    )
    got = sorted((r["k"], r["_change_type"]) for r in feed.collect())
    assert got == [(3, "update_post"), (3, "update_pre")]


def test_writer_overwrite_of_dv_table_keeps_cdf_pre_image(spark, table):
    """Review regression: the write-API overwrite's remove actions must
    carry the removed entries' deletion vectors — without them the
    change feed reads the full physical file as the pre-image and
    emits already-deleted rows as spurious deletes (diverging from the
    snapshot-diff table_changes)."""
    register_txlog_source(spark)
    txlog.delete_where(spark, table, F.col("k") < 5, mode="dv")  # v1
    v_before = txlog.table_version(table)
    (
        spark.createDataFrame([(100, "only")], "k long, v string")
        .write.format("txlog").mode("overwrite").save(table)
    )
    v_after = txlog.table_version(table)
    feed = (
        spark.read.format("txlog").option("path", table)
        .option("readChangeFeed", "true")
        .option("startingVersion", str(v_after))
        .option("endingVersion", str(v_after)).load()
    )
    got = _sorted_rows(feed.select("k", "v", "_change_type"))
    expect = _sorted_rows(
        txlog.table_changes(spark, table, v_before, v_after).select(
            "k", "v", "_change_type"
        )
    )
    assert got == expect
    # the dv-deleted keys 0..4 were ALREADY gone before the overwrite:
    # they must not reappear as deletes in the overwrite's change rows
    ks = {row[0][1] for row in got}
    assert ks.isdisjoint(set(range(5)))


def test_datasource_fails_loudly_behind_memory_log_store(spark, tmp_path):
    """The LogStore registry is process-local: format('txlog') plans in
    Spark-spawned workers where it is empty. For an in-memory store the
    table's log is invisible there — the read must fail LOUDLY (no
    table found), never silently serve a stale/partial view."""
    prefix = str(tmp_path)
    store = txlog.InMemoryLogStore()
    txlog.register_log_store(prefix, store)
    path = str(tmp_path / "tbl")
    try:
        txlog.create_table(
            spark,
            spark.createDataFrame([(1, "a")], "k long, v string"),
            path,
            key_cols=["k"],
        )
        register_txlog_source(spark)
        with pytest.raises(Exception, match="no txlog table"):
            spark.read.format("txlog").option("path", path).load().collect()
    finally:
        txlog.register_log_store(prefix, txlog.FileLogStore())


def test_cdf_slices_remove_heavy_and_single_file_commits(spark, tmp_path):
    """Review regression: the slicing gate must consider REMOVE-side
    bytes (an overwrite of a big table has tiny adds), and a commit
    churning ONE giant file still slices via numeric-span cuts on the
    key — sliced output stays exactly equal to the single-task read."""
    from data_pipelines_spark.sources.txlog_datasource import (
        _cdc_partitions,
    )

    register_txlog_source(spark)
    path = str(tmp_path / "t")
    base = spark.createDataFrame(
        [(i, f"v{i}") for i in range(4000)], "k long, v string"
    )
    # ONE data file: slicing must fall back to numeric-span cuts
    txlog.create_table(spark, base, path, key_cols=["k"], num_files=1)
    # remove-heavy commit: overwrite with a tiny frame
    txlog.overwrite_table(
        spark,
        spark.createDataFrame([(9, "only")], "k long, v string"),
        path,
    )
    parts = _cdc_partitions(path, 1, 1, ["k"], 1)
    assert len(parts) > 1  # the old gate left this at one task
    def read_cdf(**opts):
        r = (
            spark.read.format("txlog").option("path", path)
            .option("readChangeFeed", "true")
            .option("startingVersion", "1")
        )
        for kk, vv in opts.items():
            r = r.option(kk, vv)
        return _sorted_rows(r.load())

    assert read_cdf(maxBytesPerTask="1") == read_cdf()


def test_cdf_hash_slicing_string_single_start(spark, tmp_path):
    """Round-13 residual slicing: a STRING-keyed commit whose churned
    files share one distinct footer min (range cut points impossible)
    now slices by hash(key) — the sliced read equals the single-task
    read, and the partitions carry hash buckets, not ranges."""
    from data_pipelines_spark.sources.txlog_datasource import (
        _cdc_partitions,
    )

    register_txlog_source(spark)
    path = str(tmp_path / "strkey")
    base = spark.createDataFrame(
        [(f"key{i:05d}", i) for i in range(3000)], "k string, n long"
    )
    txlog.create_table(spark, base, path, key_cols=["k"], num_files=1)
    upd = spark.createDataFrame(
        [(f"key{i:05d}", -i) for i in range(0, 3000, 5)]
        + [("zzz_new", 1)],
        "k string, n long",
    )
    txlog.merge_upsert(spark, upd, path, mode="cow")  # v1: rewrites file 0

    def read_cdf(**opts):
        r = (
            spark.read.format("txlog").option("path", path)
            .option("readChangeFeed", "true")
            .option("startingVersion", "1")
        )
        for kk, vv in opts.items():
            r = r.option(kk, vv)
        return _sorted_rows(r.load())

    assert read_cdf(maxBytesPerTask="1") == read_cdf()
    parts = _cdc_partitions(path, 1, 1, ["k"], 1)
    assert len(parts) >= 2
    assert all(p.bucket is not None and p.lo is None for p in parts)
    assert sorted(p.bucket for p in parts) == list(range(len(parts)))
    assert len({p.n_buckets for p in parts}) == 1


def test_cdf_hash_slicing_missing_stats(spark, tmp_path):
    """A commit whose files carry NO footer stats for the key (a
    legacy/imported writer — stats are optional by contract) slices by
    hash instead of falling back to one task."""
    import json as _json

    from data_pipelines_spark.sources.txlog_datasource import (
        _cdc_partitions,
    )

    register_txlog_source(spark)
    path = str(tmp_path / "nostats")
    base = spark.createDataFrame(
        [(i, f"v{i}") for i in range(2000)], "k long, v string"
    )
    txlog.create_table(spark, base, path, key_cols=["k"], num_files=3)
    txlog.overwrite_table(
        spark,
        spark.createDataFrame(
            [(i, "OW") for i in range(500)], "k long, v string"
        ),
        path,
    )  # v1: removes 3 files, adds new ones
    # strip every add action's stats from the log, as a writer that
    # records none would have produced it
    log_dir = os.path.join(path, "_txlog")
    for name in os.listdir(log_dir):
        if not name.endswith(".json") or "checkpoint" in name:
            continue
        fp = os.path.join(log_dir, name)
        with open(fp) as fh:
            lines = [_json.loads(ln) for ln in fh if ln.strip()]
        for ln in lines:
            if "add" in ln:
                ln["add"].pop("stats", None)
        with open(fp, "w") as fh:
            fh.writelines(_json.dumps(ln) + "\n" for ln in lines)

    def read_cdf(**opts):
        r = (
            spark.read.format("txlog").option("path", path)
            .option("readChangeFeed", "true")
            .option("startingVersion", "1")
        )
        for kk, vv in opts.items():
            r = r.option(kk, vv)
        return _sorted_rows(r.load())

    assert read_cdf(maxBytesPerTask="1") == read_cdf()
    parts = _cdc_partitions(path, 1, 1, ["k"], 1)
    assert len(parts) >= 2
    assert all(p.bucket is not None for p in parts)


def test_cdf_with_reserved_duckdb_column_names(spark, tmp_path):
    """A table whose SCHEMA contains DuckDB's injected column names
    (`filename`, `file_row_number`) previously broke change-feed reads
    of dv-carrying commits (binder error on read_parquet filename=true)
    — the pyarrow dv-mask fallback keeps them readable, matching batch
    table_changes exactly."""
    register_txlog_source(spark)
    path = str(tmp_path / "reserved")
    base = spark.createDataFrame(
        [(i, f"f{i}", i * 10) for i in range(200)],
        "k long, filename string, file_row_number long",
    )
    txlog.create_table(spark, base, path, key_cols=["k"], num_files=2)
    txlog.merge_upsert(
        spark,
        spark.createDataFrame(
            [(7, "UPD", 70), (201, "NEW", 2010)],
            "k long, filename string, file_row_number long",
        ),
        path,
        mode="dv",
    )  # v1: dv-carrying merge
    txlog.delete_where(spark, path, F.col("k") % 50 == 3, mode="dv")  # v2
    cdf = (
        spark.read.format("txlog").option("path", path)
        .option("readChangeFeed", "true")
        .option("startingVersion", "1").load()
    )
    got = sorted(
        (r["k"], r["filename"], r["file_row_number"],
         r["_change_type"], r["_commit_version"])
        for r in cdf.collect()
    )
    want = []
    for v in (1, 2):
        want += [
            (r["k"], r["filename"], r["file_row_number"],
             r["_change_type"], v)
            for r in txlog.table_changes(spark, path, v - 1, v).collect()
        ]
    assert got == sorted(want) and len(got) > 0
    assert {"update_pre", "update_post", "insert", "delete"} == {
        t[3] for t in got
    }


def test_cdc_planning_rolls_snapshot_forward(spark, tmp_path, monkeypatch):
    """Advice r12: CDF planning re-replayed the prior snapshot once PER
    remove-bearing commit (O(commits × replay) on merge/delete-heavy
    histories). The planner now materializes the file map once and
    rolls it forward across the range — at most ONE _load_state call —
    while still sizing every commit's removed side."""
    from data_pipelines_spark.sources.txlog_datasource import (
        _cdc_partitions,
    )

    register_txlog_source(spark)
    path = str(tmp_path / "churny")
    txlog.create_table(
        spark,
        spark.createDataFrame(
            [(i, f"v{i}") for i in range(1000)], "k long, v string"
        ),
        path,
        key_cols=["k"],
        num_files=4,
    )
    for j in range(3):  # remove-bearing commits v1..v3
        txlog.merge_upsert(
            spark,
            spark.createDataFrame(
                [(i, f"m{j}") for i in range(j, 1000, 9)],
                "k long, v string",
            ),
            path,
            mode="cow",
        )
    txlog.delete_where(spark, path, F.col("k") % 13 == 0, mode="dv")  # v4
    head = txlog.table_version(path)
    assert head == 4
    calls = []
    orig = txlog._load_state

    def counting(p, version=None):
        calls.append(version)
        return orig(p, version)

    monkeypatch.setattr(txlog, "_load_state", counting)
    parts = _cdc_partitions(path, 1, head, ["k"], 1)
    assert calls == [0]  # one replay for the whole 4-commit range
    # every commit still planned (and sliced — removed sides were sized)
    assert {p.version for p in parts} == {1, 2, 3, 4}
    assert len(parts) > 4


def test_cdf_with_filename_column_uses_sql_path(spark, tmp_path):
    """Review pin (r13): a table whose schema has ONLY a `filename`
    column must read dv-carrying commits through the per-file SQL
    subqueries (no injected filename column, no pyarrow fallback) —
    matching batch table_changes exactly."""
    register_txlog_source(spark)
    path = str(tmp_path / "fnonly")
    base = spark.createDataFrame(
        [(i, f"f{i}") for i in range(200)], "k long, filename string"
    )
    txlog.create_table(spark, base, path, key_cols=["k"], num_files=2)
    txlog.merge_upsert(
        spark,
        spark.createDataFrame(
            [(7, "UPD"), (201, "NEW")], "k long, filename string"
        ),
        path,
        mode="dv",
    )  # v1
    txlog.delete_where(spark, path, F.col("k") % 50 == 3, mode="dv")  # v2
    cdf = (
        spark.read.format("txlog").option("path", path)
        .option("readChangeFeed", "true")
        .option("startingVersion", "1").load()
    )
    got = sorted(
        (r["k"], r["filename"], r["_change_type"], r["_commit_version"])
        for r in cdf.collect()
    )
    want = []
    for v in (1, 2):
        want += [
            (r["k"], r["filename"], r["_change_type"], v)
            for r in txlog.table_changes(spark, path, v - 1, v).collect()
        ]
    assert got == sorted(want) and len(got) > 0
    assert {"update_pre", "update_post", "insert", "delete"} == {
        t[2] for t in got
    }


def test_cdf_null_dv_position_never_empties_a_file(spark, tmp_path):
    """Review pin (r13): a NULL position in a torn/buggy dv parquet
    must not silently EMPTY the file's change rows (NOT IN over a
    NULL-bearing set evaluates NULL for every row) — the pos IS NOT
    NULL guard bounds the damage to resurrecting that one row."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    register_txlog_source(spark)
    path = str(tmp_path / "nullpos")
    base = spark.createDataFrame(
        [(i, f"v{i}") for i in range(100)], "k long, v string"
    )
    txlog.create_table(spark, base, path, key_cols=["k"], num_files=1)
    txlog.delete_where(
        spark, path, F.col("k").isin(5, 50), mode="dv"
    )  # v1: dv with 2 positions
    # corrupt the dv dataset: append a NULL position row
    state = txlog._load_state(path)
    dv_rel = next(e["dv"]["path"] for e in state.files.values() if e.get("dv"))
    dv_dir = os.path.join(path, dv_rel)
    part = next(
        f for f in sorted(os.listdir(dv_dir)) if f.endswith(".parquet")
    )
    fp = os.path.join(dv_dir, part)
    t = pq.read_table(fp)
    rel_file = t.column("file")[0].as_py()
    nullable = pa.schema(
        [pa.field(f.name, f.type, nullable=True) for f in t.schema]
    )
    corrupted = pa.concat_tables(
        [
            t.cast(nullable),
            pa.table(
                {
                    "file": pa.array([rel_file], pa.string()),
                    "pos": pa.array([None], t.schema.field("pos").type),
                },
                schema=nullable,
            ),
        ]
    )
    pq.write_table(corrupted, fp)
    cdf = (
        spark.read.format("txlog").option("path", path)
        .option("readChangeFeed", "true")
        .option("startingVersion", "1").load()
    )
    rows = [(r["k"], r["_change_type"]) for r in cdf.collect()]
    # the two real deletions still surface — the file was NOT emptied
    assert sorted(rows) == [(5, "delete"), (50, "delete")]
    # the Arrow-mask snapshot path tolerates the NULL identically
    snap = spark.read.format("txlog").option("path", path).load()
    ks = sorted(r["k"] for r in snap.collect())
    assert ks == [k for k in range(100) if k not in (5, 50)]
