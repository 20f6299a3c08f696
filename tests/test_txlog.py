"""Transactional table format (`sources/txlog.py`): commit protocol,
snapshot isolation + time travel, stats-pruned MERGE/DELETE (files the
batch cannot touch are carried forward by reference), optimistic
concurrency under real thread races, checkpoint-bounded log replay,
compaction, vacuum. The MERGE semantics are additionally pinned
equivalent to `materialize.upsert_partitioned` on the same batches."""

from __future__ import annotations

import json
import os
import threading

import pytest
from pyspark.sql import functions as F

from data_pipelines_spark.sources import txlog
from data_pipelines_spark.sources.txlog import (
    ConcurrentWriteError,
    append_table,
    compact_table,
    create_table,
    delete_where,
    merge_upsert,
    optimize_table,
    overwrite_table,
    read_table,
    table_history,
    table_version,
    vacuum_table,
)


def _df(spark, rows, schema="k long, v string"):
    return spark.createDataFrame(rows, schema=schema)


def _content(df):
    return sorted(
        (tuple(r) for r in df.collect()),
        key=lambda t: tuple((v is None, v) for v in t),
    )


def _live_files(path, version=None):
    state = txlog._load_state(path, version)
    return state.files


@pytest.fixture()
def table(spark, tmp_path):
    path = str(tmp_path / "tbl")
    base = _df(spark, [(i, f"v{i}") for i in range(100)])
    create_table(spark, base, path, key_cols=["k"], num_files=4)
    return path


def test_create_read_round_trip(spark, table):
    out = read_table(spark, table)
    assert _content(out) == [(i, f"v{i}") for i in range(100)]
    assert table_version(table) == 0
    hist = table_history(table)
    assert hist[0]["op"] == "create"
    assert hist[0]["rows_added"] == 100
    # key-clustered create: 4 files with tight, disjoint k ranges
    assert hist[0]["files_added"] == 4


def test_create_refuses_existing(spark, table):
    with pytest.raises(FileExistsError):
        create_table(spark, _df(spark, [(1, "x")]), table, key_cols=["k"])


def test_append_and_time_travel(spark, table):
    append_table(spark, _df(spark, [(100, "v100"), (101, "v101")], ), table)
    assert table_version(table) == 1
    assert len(_content(read_table(spark, table))) == 102
    # snapshot at version 0 is unchanged
    assert _content(read_table(spark, table, version=0)) == [
        (i, f"v{i}") for i in range(100)
    ]


def test_merge_semantics_and_pruning(spark, table):
    files_before = set(_live_files(table))
    # batch touches only keys 0..9: on a 4-file range-clustered table
    # exactly one file overlaps
    upd = _df(spark, [(k, f"new{k}") for k in range(5)] + [(200, "ins")])
    report = merge_upsert(spark, upd, table)
    # range boundaries are sample-placed, so allow 1-2 overlapping files
    # — the point is that MOST of the table is provably skipped
    assert report["files_rewritten"] <= 2
    assert report["files_skipped"] >= 2
    assert report["files_rewritten"] + report["files_skipped"] == 4
    out = dict(_content(read_table(spark, table)))
    for k in range(5):
        assert out[k] == f"new{k}"
    for k in range(5, 100):
        assert out[k] == f"v{k}"
    assert out[200] == "ins"
    # the skipped files are carried forward by reference: identical
    # relpaths live before and after
    files_after = set(_live_files(table))
    assert len(files_before & files_after) == report["files_skipped"]


def test_merge_versioned_and_null_keys(spark, table):
    # stored rows have no version column -> build a fresh table with one
    path = table + "_ver"
    base = _df(
        spark,
        [(1, "a", 5), (2, "b", 5), (None, "nullk", 5)],
        "k long, v string, ver long",
    )
    create_table(spark, base, path, key_cols=["k"], num_files=1)
    upd = _df(
        spark,
        [(1, "newer", 7), (2, "stale", 3), (None, "nullk2", 9)],
        "k long, v string, ver long",
    )
    merge_upsert(spark, upd, path, version_col="ver")
    got = set(_content(read_table(spark, path)))
    # newer wins, stale loses, NULL keys never match: both survive
    assert got == {
        (1, "newer", 7), (2, "b", 5), (None, "nullk", 5), (None, "nullk2", 9)
    }


def test_merge_equivalent_to_upsert_partitioned(spark, tmp_path):
    """Same batches through txlog merge and materialize's MERGE -> same
    content (the two implementations pin each other)."""
    from data_pipelines_spark.sources.materialize import upsert_partitioned

    base = _df(
        spark,
        [(i, f"b{i}", 1) for i in range(50)],
        "k long, v string, ver long",
    )
    upd = _df(
        spark,
        [(i, f"u{i}", 2) for i in range(0, 20)]
        + [(i, f"stale{i}", 0) for i in range(20, 30)]
        + [(i, f"n{i}", 1) for i in range(50, 60)],
        "k long, v string, ver long",
    )
    tx = str(tmp_path / "tx")
    create_table(spark, base, tx, key_cols=["k"], num_files=2)
    merge_upsert(spark, upd, tx, version_col="ver")

    plain = str(tmp_path / "plain")
    upsert_partitioned(spark, base, plain, ["k"], version_col="ver")
    upsert_partitioned(spark, upd, plain, ["k"], version_col="ver")

    assert _content(read_table(spark, tx)) == _content(
        spark.read.parquet(plain)
    )


def test_merge_empty_and_all_null_batch_touches_nothing(spark, table):
    files_before = set(_live_files(table))
    report = merge_upsert(
        spark, _df(spark, [], "k long, v string"), table
    )
    assert report["files_rewritten"] == 0
    report = merge_upsert(
        spark, _df(spark, [(None, "nk")], "k long, v string"), table
    )
    assert report["files_rewritten"] == 0
    assert files_before <= set(_live_files(table))
    out = _content(read_table(spark, table))
    assert (None, "nk") in out and len(out) == 101


def test_merge_evolve_schema(spark, table):
    ev = _df(spark, [(1, "evolved", "extra")], "k long, v string, note string")
    merge_upsert(spark, ev, table, evolve_schema=True)
    out = read_table(spark, table)
    assert set(out.columns) == {"k", "v", "note"}
    rows = {r["k"]: r for r in out.collect()}
    assert rows[1]["note"] == "extra" and rows[2]["note"] is None
    # old snapshot still reads with its own schema
    assert set(read_table(spark, table, version=0).columns) == {"k", "v"}


def test_read_bounds_zonemap_prunes_files(spark, table):
    # bounds inside one range-cluster: only that file should be read
    state = txlog._load_state(table)
    pruned = [
        e for e in state.files.values()
        if not txlog._file_disjoint(e, {"k": (10, 12)})
    ]
    assert len(pruned) < 4  # stats genuinely skip files
    out = read_table(spark, table, bounds={"k": (10, 12)})
    assert _content(out) == [(10, "v10"), (11, "v11"), (12, "v12")]
    # and the scan's file list is the pruned one, not all four
    files_read = {os.path.basename(f) for f in out.inputFiles()}
    assert files_read == {os.path.basename(e["path"]) for e in pruned}


def test_delete_where_prunes_and_drops_empty_files(spark, table):
    report = delete_where(
        spark, table, F.col("k") < 25, bounds={"k": (0, 24)}
    )
    assert report["files_skipped"] >= 2
    assert report["rows_deleted"] == 25
    out = _content(read_table(spark, table))
    assert len(out) == 75 and out[0] == (25, "v25")
    # the rewritten file kept 0..24's file's survivors; deleting ALL
    # remaining rows of a file removes it without an add
    report2 = delete_where(spark, table, F.lit(True))
    assert report2["rows_deleted"] == 75
    assert _content(read_table(spark, table)) == []
    # schema survives an empty table
    assert read_table(spark, table).columns == ["k", "v"]


def test_overwrite_atomic_replace(spark, table):
    overwrite_table(spark, _df(spark, [(7, "only")]), table)
    assert _content(read_table(spark, table)) == [(7, "only")]
    assert len(_content(read_table(spark, table, version=0))) == 100


def test_concurrent_appends_no_lost_update(spark, table):
    """Two threads race blind appends: both must commit, all rows land."""
    errs = []

    def work(tag):
        try:
            append_table(
                spark, _df(spark, [(1000 + tag, f"t{tag}")]), table
            )
        except Exception as exc:  # noqa: BLE001
            errs.append(exc)

    threads = [threading.Thread(target=work, args=(i,)) for i in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errs
    assert table_version(table) == 4
    out = dict(_content(read_table(spark, table)))
    for i in range(4):
        assert out[1000 + i] == f"t{i}"
    # commit timestamps stay monotone ACROSS the race: every retry
    # re-stamps its commit line, so a loser that lands at a bumped
    # version can never publish a timestamp older than the commit that
    # beat it (version_at_timestamp's early-stop relies on this)
    ts = [h["ts"] for h in table_history(table)]
    assert all(a <= b for a, b in zip(ts, ts[1:])), ts


def test_merge_retries_after_conflicting_append(spark, table):
    """A commit that lands between a merge's snapshot and its commit
    forces the merge to re-run from the new snapshot — the late append's
    rows must survive the merge (no lost update)."""
    orig = txlog._write_data_files
    fired = {"done": False}

    def sabotage(spark_, df, path, *args, **kwargs):
        result = orig(spark_, df, path, *args, **kwargs)
        if not fired["done"]:
            fired["done"] = True
            # sneak a commit in AFTER the merge wrote its files but
            # BEFORE it commits: claims the next version
            append_table(spark_, _df(spark_, [(999, "race")]), path)
        return result

    txlog._write_data_files = sabotage
    try:
        merge_upsert(spark, _df(spark, [(0, "merged")]), table)
    finally:
        txlog._write_data_files = orig
    out = dict(_content(read_table(spark, table)))
    assert out[0] == "merged"
    assert out[999] == "race"
    ops = [h["op"] for h in table_history(table)]
    assert ops == ["create", "append", "merge"]


def test_conflict_exhaustion_raises(spark, table):
    next_v = table_version(table) + 1
    blocker = os.path.join(
        table, "_txlog", txlog._fmt_version(next_v) + ".json"
    )

    def always_block(path, snapshot_version, *a, **kw):
        raise txlog._Conflict()

    orig = txlog._commit_rmw
    txlog._commit_rmw = always_block
    try:
        with pytest.raises(ConcurrentWriteError):
            merge_upsert(
                spark, _df(spark, [(0, "x")]), table, max_retries=1
            )
    finally:
        txlog._commit_rmw = orig
    assert not os.path.exists(blocker)


def test_checkpoint_bounds_log_replay(spark, table):
    for i in range(12):
        append_table(spark, _df(spark, [(500 + i, f"a{i}")]), table)
    log_dir = os.path.join(table, "_txlog")
    cps = [n for n in os.listdir(log_dir) if n.endswith(".checkpoint.json")]
    assert cps == [txlog._fmt_version(10) + ".checkpoint.json"]
    with open(os.path.join(log_dir, cps[0])) as fh:
        payload = json.load(fh)
    assert payload["version"] == 10
    # the checkpoint is genuinely used: delete every pre-checkpoint
    # commit file and the latest read still reconstructs fully
    for v in range(0, 10):
        os.unlink(os.path.join(log_dir, txlog._fmt_version(v) + ".json"))
    out = _content(read_table(spark, table))
    assert len(out) == 112
    # a version below the (now vacuumed) checkpoint fails loudly
    with pytest.raises(FileNotFoundError):
        read_table(spark, table, version=5)


def test_compact_preserves_content_and_snapshots(spark, table):
    for i in range(5):
        append_table(spark, _df(spark, [(300 + i, f"c{i}")]), table)
    before = _content(read_table(spark, table))
    n_before = len(_live_files(table))
    report = compact_table(spark, table, target_file_rows=10_000)
    assert report["files_after"] < n_before
    assert _content(read_table(spark, table)) == before
    # pre-compaction snapshot still readable (old files not deleted)
    assert len(_content(read_table(spark, table, version=2))) == 102


def test_vacuum_removes_unreferenced_and_breaks_old_reads_loudly(
    spark, table
):
    overwrite_table(spark, _df(spark, [(1, "new")]), table)
    compact_table(spark, table, target_file_rows=10_000)
    # default min_age guard protects everything this young
    assert vacuum_table(table, retain_versions=1) == 0
    assert len(_content(read_table(spark, table, version=0))) == 100
    removed = vacuum_table(table, retain_versions=1, min_age_seconds=0)
    assert removed >= 4  # the 4 create files at least
    assert _content(read_table(spark, table)) == [(1, "new")]
    with pytest.raises(Exception):
        read_table(spark, table, version=0).collect()


def test_object_store_scheme_raises(spark):
    with pytest.raises(NotImplementedError):
        txlog._local("s3a://bucket/tbl")


def test_upsert_partitioned_txn_seam(spark, tmp_path):
    """`materialize.upsert_partitioned(format='txn')` bootstraps and
    merges through the transactional backend with identical content to
    the parquet path on the same batches."""
    from data_pipelines_spark.sources.materialize import upsert_partitioned

    base = _df(spark, [(i, f"b{i}", 1) for i in range(30)],
               "k long, v string, ver long")
    upd = _df(spark, [(5, "u5", 2), (40, "n40", 1)],
              "k long, v string, ver long")
    tx = str(tmp_path / "txn_seam")
    upsert_partitioned(spark, base, tx, ["k"], version_col="ver", format="txn")
    upsert_partitioned(spark, upd, tx, ["k"], version_col="ver", format="txn")
    plain = str(tmp_path / "plain_seam")
    upsert_partitioned(spark, base, plain, ["k"], version_col="ver")
    upsert_partitioned(spark, upd, plain, ["k"], version_col="ver")
    assert _content(read_table(spark, tx)) == _content(
        spark.read.parquet(plain)
    )
    assert table_version(tx) == 1


def test_empty_table_create_and_read(spark, tmp_path):
    path = str(tmp_path / "empty")
    create_table(
        spark, _df(spark, [], "k long, v string"), path, key_cols=["k"]
    )
    out = read_table(spark, path)
    assert out.columns == ["k", "v"] and out.count() == 0
    merge_upsert(spark, _df(spark, [(1, "first")]), path)
    assert _content(read_table(spark, path)) == [(1, "first")]


def test_optimize_zorder_multidim_pruning(spark, tmp_path):
    """Z-order optimize makes footer stats prune on BOTH dimensions of
    a 2-D predicate; a 1-D range-clustered layout can only prune on its
    cluster column. Content is unchanged and the pre-optimize snapshot
    stays readable."""
    path = str(tmp_path / "grid")
    grid = spark.range(64 * 64).select(
        (F.col("id") % 64).alias("x"),
        (F.col("id") / 64).cast("long").alias("y"),
        F.col("id").alias("payload"),
    )
    # x-clustered baseline layout: 16 files of x-ranges
    create_table(spark, grid, path, key_cols=["x"], num_files=16)
    before = _content(read_table(spark, path))

    def files_touched(box):
        out = read_table(spark, path, bounds=box)
        return len(out.inputFiles()), out

    box = {"x": (8, 15), "y": (8, 15)}  # 64 cells of 4096
    touched_linear, out = files_touched(box)
    assert out.count() == 64
    # a y-only bound prunes NOTHING on the x-clustered layout
    touched_y_only, _ = files_touched({"y": (8, 15)})
    assert touched_y_only == 16

    report = optimize_table(
        spark, path, zorder_by=["x", "y"], target_file_rows=256, bits=6
    )
    assert report["files_after"] == 16
    touched_z, out2 = files_touched(box)
    assert out2.count() == 64
    assert _content(read_table(spark, path)) == before
    # the z-layout localizes the 2-D box into a small file neighborhood
    assert touched_z <= 4
    assert touched_z < touched_linear or touched_linear <= 4
    # y-only bounds now prune too (stats recorded for y after optimize)
    touched_y_after, _ = files_touched({"y": (8, 15)})
    assert touched_y_after < 16
    # pre-optimize snapshot still readable
    assert len(_content(read_table(spark, path, version=0))) == 4096


def test_table_changes_cdc(spark, table):
    """Change feed between snapshots: updates classified pre/post by
    key, inserts/deletes labeled, and physical-only rewrites
    (compaction/optimize) produce NO phantom changes."""
    from data_pipelines_spark.sources.txlog import table_changes

    merge_upsert(spark, _df(spark, [(1, "NEW"), (200, "ins")]), table)  # v1
    delete_where(spark, table, F.col("k") == 50, bounds={"k": (50, 50)})  # v2
    changes = table_changes(spark, table, 0)
    by_type = {}
    for r in changes.collect():
        by_type.setdefault(r["_change_type"], []).append((r["k"], r["v"]))
    assert by_type["update_pre"] == [(1, "v1")]
    assert by_type["update_post"] == [(1, "NEW")]
    assert by_type["insert"] == [(200, "ins")]
    assert by_type["delete"] == [(50, "v50")]
    # the untouched 97 rows appear nowhere in the feed
    assert changes.count() == 4

    # physical-only rewrite: zero changes
    v_before = table_version(table)
    compact_table(spark, table, target_file_rows=10_000)
    assert table_changes(spark, table, v_before).count() == 0

    # no-key classification: insert/delete only
    raw = table_changes(spark, table, 0, key_cols=[])
    kinds = {r["_change_type"] for r in raw.collect()}
    assert kinds <= {"insert", "delete"}
    # inverted version order is loud
    with pytest.raises(ValueError):
        table_changes(spark, table, table_version(table), 0)


def test_append_rejects_schema_drift(spark, table):
    with pytest.raises(ValueError, match="does not match table schema"):
        append_table(
            spark, _df(spark, [(1, 2)], "k long, v long"), table
        )
    # column ORDER is not drift — names+types match, append reorders
    append_table(
        spark,
        spark.createDataFrame([("re", 300)], "v string, k long"),
        table,
    )
    assert dict(_content(read_table(spark, table)))[300] == "re"


def test_check_constraints(spark, table):
    """CHECK constraints: validated against existing data on add,
    enforced on append/merge/overwrite, NULL passes (SQL semantics),
    droppable."""
    from data_pipelines_spark.sources.txlog import (
        add_constraint,
        drop_constraint,
    )

    # existing data violates -> refused, nothing committed
    with pytest.raises(ValueError, match="existing rows"):
        add_constraint(spark, table, "k_small", "k < 50")
    add_constraint(spark, table, "k_nonneg", "k >= 0")
    with pytest.raises(ValueError, match="already exists"):
        add_constraint(spark, table, "k_nonneg", "k >= 0")

    with pytest.raises(ValueError, match="k_nonneg"):
        append_table(spark, _df(spark, [(-1, "bad")]), table)
    with pytest.raises(ValueError, match="k_nonneg"):
        merge_upsert(spark, _df(spark, [(5, "ok"), (-2, "bad")]), table)
    with pytest.raises(ValueError, match="k_nonneg"):
        overwrite_table(spark, _df(spark, [(-3, "bad")]), table)
    # failed writes committed nothing
    assert len(_content(read_table(spark, table))) == 100

    # NULL passes a CHECK (SQL semantics); valid writes proceed
    append_table(spark, _df(spark, [(None, "nullk")]), table)
    merge_upsert(spark, _df(spark, [(1, "upd")]), table)
    assert dict(_content(read_table(spark, table)))[1] == "upd"

    drop_constraint(spark, table, "k_nonneg")
    append_table(spark, _df(spark, [(-9, "now ok")]), table)
    with pytest.raises(ValueError, match="no constraint"):
        drop_constraint(spark, table, "k_nonneg")


def test_append_retry_detects_concurrent_metadata_change(spark, table):
    """An append that loses the commit race to a METADATA commit must
    re-validate: a concurrently added constraint re-checks the staged
    batch (violation aborts); a concurrent schema change aborts."""
    from data_pipelines_spark.sources.txlog import add_constraint

    orig = txlog._write_commit_exclusive
    fired = {"n": 0}

    def sabotage(path, version, lines):
        # on the append's FIRST commit attempt only: sneak in a
        # constraint the staged batch violates
        if fired["n"] == 0 and any(
            line.get("commit", {}).get("op") == "append" for line in lines
        ):
            fired["n"] = 1
            txlog._write_commit_exclusive = orig
            add_constraint(spark, path, "k_nonneg", "k >= 0")
            txlog._write_commit_exclusive = sabotage
        return orig(path, version, lines)

    txlog._write_commit_exclusive = sabotage
    try:
        with pytest.raises(ValueError, match="k_nonneg"):
            append_table(spark, _df(spark, [(-5, "bad")]), table)
    finally:
        txlog._write_commit_exclusive = orig
    # nothing landed: the violating batch is absent
    assert len(_content(read_table(spark, table))) == 100
    # a batch satisfying the now-present constraint appends normally
    append_table(spark, _df(spark, [(500, "ok")]), table)
    assert dict(_content(read_table(spark, table)))[500] == "ok"


def test_vacuum_age_guard_protects_staged_files(spark, table):
    """Files younger than min_age_seconds are never vacuumed even when
    unreferenced — the in-flight-writer protection."""
    import os as _os

    overwrite_table(spark, _df(spark, [(1, "new")]), table)
    # simulate an in-flight writer's staging: an unreferenced young file
    staged_dir = os.path.join(table, "data", "cinflight")
    _os.makedirs(staged_dir)
    staged = os.path.join(staged_dir, "part-inflight.parquet")
    with open(staged, "wb") as fh:
        fh.write(b"not yet committed")
    assert vacuum_table(table, retain_versions=1, min_age_seconds=3600) == 0
    assert os.path.exists(staged)
    removed = vacuum_table(table, retain_versions=1, min_age_seconds=0)
    assert removed >= 1
    assert not os.path.exists(staged)


def test_crash_artifacts_are_invisible(spark, table):
    """A crashed writer's leftovers — a .tmp commit file in _txlog and
    an orphaned staging dir under data/ — are invisible to readers,
    history, and new commits; age-expired orphans are vacuumable."""
    log_dir = os.path.join(table, "_txlog")
    with open(os.path.join(log_dir, ".tmp-deadbeef.json"), "w") as fh:
        fh.write('{"commit": {"op": "torn"}}\n')
    orphan_dir = os.path.join(table, "data", "ccrashed")
    os.makedirs(orphan_dir)
    with open(os.path.join(orphan_dir, "part-orphan.parquet"), "wb") as fh:
        fh.write(b"half-written garbage")
    # readers, version resolution, and history ignore both artifacts
    assert txlog.table_version(table) == 0
    assert len(_content(read_table(spark, table))) == 100
    assert [h["op"] for h in table_history(table)] == ["create"]
    # new commits proceed normally
    append_table(spark, _df(spark, [(777, "after")]), table)
    assert len(_content(read_table(spark, table))) == 101
    # the orphaned data file is vacuumable once age-expired (removed
    # count also includes Spark's non-data markers like _SUCCESS, so
    # assert the orphan specifically and that live data survives)
    removed = vacuum_table(table, retain_versions=5, min_age_seconds=0)
    assert removed >= 1
    assert not os.path.exists(os.path.join(orphan_dir, "part-orphan.parquet"))
    assert len(_content(read_table(spark, table))) == 101


def test_merge_rejects_type_change(spark, table):
    """A widened-type batch (v double vs stored v bigint/string) must
    never COMMIT: rewritten files would carry the new physical type
    while stats-skipped files keep the old one, leaving the latest
    snapshot unreadable (CANNOT_MERGE_SCHEMAS on every read) — a
    committed transaction that bricks the table. The merge enforces the
    append path's (name, dataType) contract up front instead."""
    bad = _df(spark, [(1, 1.5)], "k long, v double")
    v_before = table_version(table)
    with pytest.raises(ValueError, match="column type"):
        merge_upsert(spark, bad, table)
    # evolve_schema admits NEW columns, never a type change (Delta rule)
    with pytest.raises(ValueError, match="column type"):
        merge_upsert(spark, bad, table, evolve_schema=True)
    badkey = _df(spark, [(1, "x")], "k int, v string")
    with pytest.raises(ValueError, match="column type"):
        merge_upsert(spark, badkey, table)
    assert table_version(table) == v_before
    # the table is untouched and still fully readable
    assert len(_content(read_table(spark, table))) == 100


def test_merge_rejects_column_drift_without_evolve(spark, table):
    extra = _df(spark, [(1, "x", "n")], "k long, v string, note string")
    with pytest.raises(ValueError, match="evolve_schema"):
        merge_upsert(spark, extra, table)
    missing = _df(spark, [(1,)], "k long")
    with pytest.raises(ValueError, match="evolve_schema"):
        merge_upsert(spark, missing, table)
    assert table_version(table) == 0


def test_corrupt_checkpoint_falls_back_to_replay(spark, table):
    """A checkpoint torn by a crash (rename survived, content truncated
    before reaching disk) is a corrupted CACHE of replayable state —
    reads must degrade to an older checkpoint / full log replay, not
    fail every _load_state at or above it."""
    for i in range(11):
        append_table(spark, _df(spark, [(700 + i, f"t{i}")]), table)
    log_dir = os.path.join(table, "_txlog")
    cp = os.path.join(log_dir, txlog._fmt_version(10) + ".checkpoint.json")
    content = open(cp).read()
    with open(cp, "w") as fh:
        fh.write(content[: len(content) // 2])  # truncated mid-JSON
    out = _content(read_table(spark, table))
    assert len(out) == 111 and (705, "t5") in out
    assert table_version(table) == 11
    # commits keep working past the corrupt checkpoint
    append_table(spark, _df(spark, [(900, "after")]), table)
    assert len(_content(read_table(spark, table))) == 112


def test_compact_large_files_survive_by_reference(spark, tmp_path):
    """Compaction cost ∝ small-file mass: files at/above the threshold
    are carried forward with IDENTICAL relpaths (by reference, never
    rewritten), only the undersized tail is read and packed."""
    path = str(tmp_path / "bp")
    create_table(
        spark, _df(spark, [(i, "b") for i in range(3000)]), path,
        key_cols=["k"], num_files=1,
    )
    for i in range(6):
        append_table(spark, _df(spark, [(10_000 + i, "s")]), path)
    big_rels = [
        rel for rel, e in _live_files(path).items() if e["rows"] >= 1000
    ]
    assert len(big_rels) == 1
    report = compact_table(spark, path, target_file_rows=1000)
    live = _live_files(path)
    assert big_rels[0] in live  # untouched, same relpath
    assert report["files_before"] == 7 and report["files_after"] == 2
    assert len(_content(read_table(spark, path))) == 3006


def test_compact_noop_when_packing_cannot_reduce(spark, tmp_path):
    """Two near-target files must NOT churn forever: when bin-packing
    cannot reduce the file count, compaction commits nothing."""
    path = str(tmp_path / "noop")
    create_table(
        spark, _df(spark, [(i, "x") for i in range(1800)]), path,
        key_cols=["k"], num_files=2,
    )
    before = set(_live_files(path))
    v = table_version(path)
    report = compact_table(spark, path, target_file_rows=1000)
    assert report["files_before"] == report["files_after"] == 2
    assert table_version(path) == v  # no commit at all
    assert set(_live_files(path)) == before


def test_compact_min_file_rows_selects_below_threshold_only(spark, tmp_path):
    """min_file_rows splits selection from the packing target (Delta's
    minFileSize/maxFileSize): an 800-row file below the 1000-row TARGET
    but above the 100-row THRESHOLD is left alone."""
    path = str(tmp_path / "sel")
    create_table(
        spark, _df(spark, [(i, "m") for i in range(800)]), path,
        key_cols=["k"], num_files=1,
    )
    append_table(spark, _df(spark, [(9000 + i, "s") for i in range(50)]), path)
    append_table(spark, _df(spark, [(9500 + i, "s") for i in range(50)]), path)
    mid_rel = [
        rel for rel, e in _live_files(path).items() if e["rows"] == 800
    ]
    report = compact_table(
        spark, path, target_file_rows=1000, min_file_rows=100
    )
    live = _live_files(path)
    assert mid_rel[0] in live  # 800 < target but >= threshold: untouched
    assert report["files_after"] == 2
    assert len(_content(read_table(spark, path))) == 900


def test_restore_table_rolls_back_as_new_commit(spark, table):
    """RESTORE: the target snapshot's files AND meta become current
    again as one new commit — no data rewrite, history preserved, the
    undone commits still time-travelable; CDC over the restore commit
    reports the logical rollback."""
    merge_upsert(
        spark, _df(spark, [(1, "changed"), (500, "ins")]), table
    )  # v1
    merge_upsert(
        spark,
        _df(spark, [(2, "evolved", "x")], "k long, v string, note string"),
        table,
        evolve_schema=True,
    )  # v2: schema now has note
    rep = txlog.restore_table(spark, table, 0)  # back to creation
    assert rep["version"] == 3 and rep["files_added"] > 0
    out = read_table(spark, table)
    assert set(out.columns) == {"k", "v"}  # pre-evolution schema restored
    assert _content(out) == [(i, f"v{i}") for i in range(100)]
    # history preserved: the undone versions still read
    assert len(_content(read_table(spark, table, version=2))) == 101
    hist = table_history(table)
    assert hist[-1]["op"] == "restore"
    # CDC across the restore shows the rollback as row-level changes
    ch = {
        (r["k"], r["_change_type"])
        for r in txlog.table_changes(spark, table, 2, 3).collect()
    }
    assert (500, "delete") in ch and (1, "update_post") in ch
    # restoring to the current state is a no-op (no commit)
    rep2 = txlog.restore_table(spark, table, 3)
    assert rep2 == {"version": 3, "files_added": 0, "files_removed": 0}
    assert table_version(table) == 3
    # appends continue normally against the restored schema
    append_table(spark, _df(spark, [(999, "after")]), table)
    assert len(_content(read_table(spark, table))) == 101


def test_restore_refuses_vacuumed_target(spark, table):
    overwrite_table(spark, _df(spark, [(1, "only")]), table)  # v1
    vacuum_table(table, retain_versions=1, min_age_seconds=0)
    with pytest.raises(FileNotFoundError, match="vacuumed"):
        txlog.restore_table(spark, table, 0)
    # table is untouched by the failed restore
    assert table_version(table) == 1
    assert _content(read_table(spark, table)) == [(1, "only")]


def test_merge_accepts_nested_nullability_difference(spark, tmp_path):
    """Nested nullability flags (array containsNull etc.) don't change
    the physical parquet type: a batch built with F.array(lit(..))
    (containsNull=false) must merge into a table created from
    createDataFrame (containsNull=true) — only REAL type changes are
    rejected."""
    path = str(tmp_path / "nul")
    base = spark.createDataFrame(
        [(i, ["a"]) for i in range(3)], "k long, tags array<string>"
    )
    create_table(spark, base, path, key_cols=["k"])
    upd = spark.range(1).select(
        F.col("id").alias("k"), F.array(F.lit("b")).alias("tags")
    )
    merge_upsert(spark, upd, path)  # must not raise
    append_table(spark, upd.withColumn("k", F.lit(7).cast("long")), path)
    rows = {r["k"]: list(r["tags"]) for r in read_table(spark, path).collect()}
    assert rows[0] == ["b"] and rows[7] == ["b"] and len(rows) == 4
    bad = spark.range(1).select(
        F.col("id").alias("k"), F.array(F.lit(1)).alias("tags")
    )
    with pytest.raises(ValueError, match="column type"):
        merge_upsert(spark, bad, path)


def test_timestamp_time_travel_and_describe(spark, table):
    """timestampAsOf: commit timestamps resolve to the newest version
    at-or-before the asked time (Delta's rule; version numbers stay the
    order source of truth). describe_table summarizes from the log
    alone; vacuum dry_run counts without deleting."""
    import time as _time

    t_after_create = _time.time()
    _time.sleep(0.05)
    append_table(spark, _df(spark, [(200, "later")]), table)
    assert txlog.version_at_timestamp(table, t_after_create) == 0
    assert txlog.version_at_timestamp(table, _time.time()) == 1
    out = read_table(spark, table, timestamp=t_after_create)
    assert len(_content(out)) == 100  # pre-append snapshot
    with pytest.raises(ValueError, match="not both"):
        read_table(spark, table, version=1, timestamp=t_after_create)
    with pytest.raises(ValueError, match="first commit is newer"):
        txlog.version_at_timestamp(table, t_after_create - 10_000)
    hist = table_history(table)
    assert all(h["ts"] is not None for h in hist)
    assert hist[0]["ts"] <= hist[1]["ts"]
    desc = txlog.describe_table(table)
    assert desc["version"] == 1 and desc["num_files"] == 5
    assert desc["total_rows"] == 101 and desc["key_cols"] == ["k"]
    assert "k:bigint" in desc["schema"].replace(" ", "")
    # dry_run: counts the same set a real vacuum would delete, deletes
    # nothing
    overwrite_table(spark, _df(spark, [(1, "only")]), table)
    would = vacuum_table(
        table, retain_versions=1, min_age_seconds=0, dry_run=True
    )
    assert would >= 5
    assert len(_content(read_table(spark, table, version=0))) == 100
    removed = vacuum_table(table, retain_versions=1, min_age_seconds=0)
    assert removed == would
    with pytest.raises(Exception):
        read_table(spark, table, version=0).collect()


def test_restore_occ_race_rolls_back_racing_append(spark, table):
    """RESTORE under a commit race: an append sneaking in between the
    restore's snapshot and its commit forces an OCC retry from the
    fresh snapshot, and the restore still lands — state becomes EXACTLY
    the target version (the raced append's rows are rolled back too;
    RESTORE is point-in-time, not a relative undo). Nothing is lost:
    the append's version stays time-travelable, and a second restore
    can bring it back."""
    orig_rmw = txlog._commit_rmw
    fired = {"done": False}

    def sneaky(path, snapshot_version, op, adds, removes, meta, txn=None):
        if not fired["done"] and op == "restore":
            fired["done"] = True
            append_table(spark, _df(spark, [(999, "race")]), path)
        return orig_rmw(
            path, snapshot_version, op, adds, removes, meta, txn=txn
        )

    overwrite_table(spark, _df(spark, [(1, "new")]), table)  # v1
    txlog._commit_rmw = sneaky
    try:
        rep = txlog.restore_table(spark, table, 0)
    finally:
        txlog._commit_rmw = orig_rmw
    assert fired["done"]
    ops = [h["op"] for h in table_history(table)]
    assert ops == ["create", "overwrite", "append", "restore"]
    assert rep["version"] == 3
    # exactly the v0 snapshot — the raced append is rolled back...
    assert _content(read_table(spark, table)) == [
        (i, f"v{i}") for i in range(100)
    ]
    # ...but not lost: its version still reads, and restoring to it
    # recovers the row
    assert dict(_content(read_table(spark, table, version=2)))[999] == "race"
    txlog.restore_table(spark, table, 2)
    assert dict(_content(read_table(spark, table)))[999] == "race"


def test_concurrent_mixed_op_storm(spark, table):
    """Appends, a versioned merge, and compactions race from real
    threads: every append's rows must land (appends retry the version
    bump), the merge's winners must hold (RMW re-runs from fresh
    snapshots), compaction stays content-invariant, and the log stays
    gapless — the multi-writer storm none of the single-race tests
    cover."""
    errs: list[Exception] = []

    def run(fn):
        def inner():
            try:
                fn()
            except Exception as exc:  # noqa: BLE001
                errs.append(exc)
        return inner

    def appender(lo):
        for j in range(3):
            append_table(
                spark,
                _df(spark, [(lo + j, f"a{lo + j}")]),
                table,
                max_retries=60,
            )

    def merger():
        merge_upsert(
            spark,
            _df(spark, [(k, f"m{k}") for k in range(5)]),
            table,
            max_retries=60,
        )

    def compactor():
        for _ in range(2):
            compact_table(spark, table, target_file_rows=10_000,
                          max_retries=60)

    threads = [
        threading.Thread(target=run(lambda: appender(2000))),
        threading.Thread(target=run(lambda: appender(3000))),
        threading.Thread(target=run(merger)),
        threading.Thread(target=run(compactor)),
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errs, errs
    out = dict(_content(read_table(spark, table)))
    # every append landed exactly once
    for lo in (2000, 3000):
        for j in range(3):
            assert out[lo + j] == f"a{lo + j}"
    # the merge's winners hold no matter where it interleaved
    for k in range(5):
        assert out[k] == f"m{k}"
    # nothing else changed; no duplicates (dict covers keys, count rows)
    assert len(_content(read_table(spark, table))) == 106
    versions = [h["version"] for h in table_history(table)]
    assert versions == list(range(len(versions)))
    ts = [h["ts"] for h in table_history(table)]
    assert all(a <= b for a, b in zip(ts, ts[1:])), ts


def test_isnull_pruner_requires_known_null_count():
    """The `col IS NULL` pruner skips a file only when its null count is
    KNOWN to be exactly 0 — stats recorded by a writer whose footers
    lack null_count omit the key entirely (never a silent 0), and the
    absent key must not prune (the 'absent stats never prune'
    contract)."""
    isnull = [("isnull", "k", None)]
    mk = lambda st: {"path": "data/x/p.parquet", "rows": 1, "stats": st}
    known_zero = mk({"k": {"min": {"t": "i", "v": 1},
                           "max": {"t": "i", "v": 9}, "nulls": 0}})
    known_some = mk({"k": {"min": {"t": "i", "v": 1},
                           "max": {"t": "i", "v": 9}, "nulls": 3}})
    unknown = mk({"k": {"min": {"t": "i", "v": 1},
                        "max": {"t": "i", "v": 9}}})
    assert txlog._file_survives_constraints(known_zero, isnull) is False
    assert txlog._file_survives_constraints(known_some, isnull) is True
    assert txlog._file_survives_constraints(unknown, isnull) is True


def test_timestamp_resolution_survives_clock_skew(spark, table):
    """Concurrent writers stamp commits from their own wall clocks, so
    published timestamps can be NON-monotone across writers; the
    resolution must still return the newest qualifying VERSION instead
    of stopping at the first commit whose skewed ts looks newer."""
    append_table(spark, _df(spark, [(201, "a")]), table)  # v1
    append_table(spark, _df(spark, [(202, "b")]), table)  # v2

    def _rewrite_ts(version, ts):
        fname = os.path.join(
            txlog._log_dir(table), txlog._fmt_version(version) + ".json"
        )
        lines = []
        with open(fname, encoding="utf-8") as fh:
            for line in fh:
                action = json.loads(line)
                if "commit" in action:
                    action["commit"]["ts"] = ts
                lines.append(json.dumps(action, separators=(",", ":")))
        with open(fname, "w", encoding="utf-8") as fh:
            fh.write("\n".join(lines) + "\n")

    # v1's writer had a fast clock: ts order is 100, 300, 200
    _rewrite_ts(0, 100.0)
    _rewrite_ts(1, 300.0)
    _rewrite_ts(2, 200.0)
    # newest version with ts <= 250 is v2 (a monotone early-stop at
    # v1's skewed 300 would wrongly resolve to v0)
    assert txlog.version_at_timestamp(table, 250.0) == 2
    with pytest.raises(ValueError, match="first commit is newer"):
        txlog.version_at_timestamp(table, 99.0)
    assert txlog.version_at_timestamp(table, 1e12) == 2
