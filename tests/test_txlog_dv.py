"""Deletion vectors (merge-on-read) for the txlog table format:
`delete_where(mode="dv")` / `merge_upsert(mode="dv")` record replaced
rows as (file, position) deletion vectors instead of rewriting the
touched files — the scattered-key answer to copy-on-write's write
amplification (the public Delta/Iceberg deletion-vector capability).
Pinned here: logical equality with copy-on-write, dv application on
EVERY read path (read_table, format("txlog") batch + stream, batch and
streaming change feeds, CoW rewrites of dv'd files), materialization
by compaction/optimize, vacuum/restore lifecycle coupling, and the
write-amplification probe that motivates the whole feature."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from data_pipelines_spark.sources import txlog
from data_pipelines_spark.sources.txlog import (
    compact_table,
    create_table,
    delete_where,
    merge_upsert,
    optimize_table,
    read_table,
    restore_table,
    table_changes,
    vacuum_table,
)


def _df(spark, rows, schema="k long, v string"):
    return spark.createDataFrame(rows, schema=schema)


def _content(df):
    return sorted(
        (tuple(r) for r in df.collect()),
        key=lambda t: tuple((v is None, v) for v in t),
    )


def _data_bytes_added(path, from_version):
    """Bytes physically WRITTEN by commits after from_version — the
    write-amplification observable. A dv commit RE-ADDS existing data
    files (same relpath, new dv), so only paths absent from the
    from_version snapshot count, plus each new dv dataset once."""
    total = 0
    latest = txlog.table_version(path)
    root = txlog._local(path)
    prev = set(txlog._load_state(path, from_version).files)
    seen_dv = set()
    for v in range(from_version + 1, latest + 1):
        for a in txlog._read_actions(path, v):
            if "add" in a:
                if a["add"]["path"] not in prev:
                    total += a["add"]["bytes"]
                dv = a["add"].get("dv")
                if dv and dv["path"] not in seen_dv:
                    seen_dv.add(dv["path"])
                    total += sum(
                        os.path.getsize(f)
                        for f in txlog._dv_parquet_files(root, dv["path"])
                    )
    return total


@pytest.fixture()
def table(spark, tmp_path):
    path = str(tmp_path / "tbl")
    base = _df(spark, [(i, f"v{i}") for i in range(100)])
    create_table(spark, base, path, key_cols=["k"], num_files=4)
    return path


def test_dv_delete_touches_no_data_file(spark, table):
    """A scattered dv delete rewrites NOTHING: every surviving entry
    keeps its exact data file (same relpath), only gaining a dv — and
    all read paths agree on the remaining content."""
    before = dict(txlog._load_state(table).files)
    r = delete_where(spark, table, F.col("k") % 10 == 3, mode="dv")
    assert r["rows_deleted"] == 10
    assert r["files_rewritten"] == 0 and r["files_removed"] == 0
    assert r["files_dv"] == 4  # every file holds some k%10==3 rows
    after = dict(txlog._load_state(table).files)
    assert set(after) == set(before)  # identical data file paths
    for rel, e in after.items():
        assert e["dv"]["rows"] > 0
        assert e["rows"] == before[rel]["rows"]  # physical rows intact
    expect = [(i, f"v{i}") for i in range(100) if i % 10 != 3]
    assert _content(read_table(spark, table)) == expect
    # time travel to the pre-delete snapshot is exact
    assert len(_content(read_table(spark, table, version=0))) == 100
    desc = txlog.describe_table(table)
    assert desc["total_rows"] == 90 and desc["dv_rows"] == 10
    assert desc["dv_files"] == 4


def test_dv_delete_unions_into_full_deletion_set(spark, table):
    """A second dv delete on an already-dv'd file unions the old
    positions into the fresh dataset (an entry's dv is always the
    file's FULL deletion set) and a file losing its last live row is
    dropped from the log outright."""
    delete_where(spark, table, F.col("k") % 2 == 0, mode="dv")
    delete_where(spark, table, F.col("k") % 2 == 1, bounds={"k": (0, 24)},
                 mode="dv")
    out = _content(read_table(spark, table))
    assert out == [(i, f"v{i}") for i in range(25, 100) if i % 2 == 1]
    state = txlog._load_state(table)
    # the file(s) covering [0, 24] lost every live row -> removed
    assert all(
        txlog._live_rows(e) > 0 for e in state.files.values()
    )
    desc = txlog.describe_table(table)
    assert desc["total_rows"] == len(out)


def test_dv_zero_match_delete_commits_nothing(spark, table):
    v = txlog.table_version(table)
    r = delete_where(spark, table, F.col("k") > 10_000, mode="dv")
    assert r["rows_deleted"] == 0
    assert txlog.table_version(table) == v  # no commit at all


def test_dv_merge_matches_cow_merge(spark, tmp_path):
    """mode='dv' and mode='cow' produce the same logical table on the
    same batches — including version_col winners/losers, NULL-key
    routing, and schema evolution."""
    rows = [(i, f"v{i}", 1) for i in range(60)]
    paths = {}
    for mode in ("cow", "dv"):
        p = str(tmp_path / mode)
        create_table(
            spark, _df(spark, rows, "k long, v string, ver int"), p,
            key_cols=["k"], num_files=3,
        )
        # update wins (ver 5), existing wins (ver 0), tie -> update,
        # NULL key -> pure insert, new key -> insert
        batch = _df(
            spark,
            [
                (3, "WIN3", 5),
                (7, "LOSE7", 0),
                (9, "TIE9", 1),
                (None, "NULLK", 2),
                (600, "NEW600", 2),
            ],
            "k long, v string, ver int",
        )
        merge_upsert(spark, batch, p, version_col="ver", mode=mode)
        # evolving second batch adds a column
        batch2 = _df(
            spark,
            [(5, "EV5", 6, "x")],
            "k long, v string, ver int, extra string",
        )
        merge_upsert(
            spark, batch2, p, version_col="ver", evolve_schema=True,
            mode=mode,
        )
        paths[mode] = p
    cow = read_table(spark, paths["cow"])
    dv = read_table(spark, paths["dv"])
    assert sorted(cow.columns) == sorted(dv.columns)
    assert _content(cow.select(*sorted(cow.columns))) == _content(
        dv.select(*sorted(cow.columns))
    )
    got = {r["k"]: (r["v"], r["extra"]) for r in dv.collect() if r["k"] is not None}
    assert got[3] == ("WIN3", None)
    assert got[7] == ("v7", None)  # existing ver 1 beats update ver 0
    assert got[9] == ("TIE9", None)  # ties go to the update
    assert got[5] == ("EV5", "x")
    assert got[600] == ("NEW600", None)


def test_dv_merge_without_version_col_replaces_all_matches(spark, table):
    r = merge_upsert(
        spark, _df(spark, [(1, "N1"), (500, "N500")]), table, mode="dv"
    )
    assert r["files_rewritten"] == 0 and r["files_dv"] == 1
    out = dict(_content(read_table(spark, table)))
    assert out[1] == "N1" and out[500] == "N500" and len(out) == 101


def test_cow_rewrite_of_dv_file_does_not_resurrect(spark, table):
    """Copy-on-write operations over files that carry a dv must apply
    it when reading — a CoW merge/delete that rewrote the raw file
    would silently resurrect dv-deleted rows."""
    delete_where(spark, table, F.col("k") == 10, mode="dv")
    # CoW merge touching the same file region
    merge_upsert(spark, _df(spark, [(11, "N11")]), table, mode="cow")
    out = dict(_content(read_table(spark, table)))
    assert 10 not in out and out[11] == "N11" and len(out) == 99
    # CoW delete over a dv'd candidate: rows_deleted counts live rows
    r = delete_where(spark, table, F.col("k") < 5, mode="cow")
    assert r["rows_deleted"] == 5
    assert len(_content(read_table(spark, table))) == 94


def test_compact_materializes_dv(spark, table):
    delete_where(spark, table, F.col("k") % 4 == 0, mode="dv")
    expect = _content(read_table(spark, table))
    r = compact_table(spark, table, target_file_rows=1000)
    assert r["files_after"] < r["files_before"]
    desc = txlog.describe_table(table)
    assert desc["dv_files"] == 0 and desc["dv_rows"] == 0
    assert _content(read_table(spark, table)) == expect
    # dv'd history still reads exactly (materialization is physical)
    assert _content(read_table(spark, table, version=1)) == expect


def test_compact_purges_dv_even_when_not_small(spark, tmp_path):
    """A file whose dv covers >= dv_min_ratio of its rows is rewritten
    even though its live size is above the selection threshold — and
    even when packing cannot reduce the file count (purging the
    scan-time anti-join is the point)."""
    p = str(tmp_path / "t")
    create_table(
        spark, _df(spark, [(i, "x") for i in range(1000)]), p,
        key_cols=["k"], num_files=1,
    )
    delete_where(spark, p, F.col("k") < 100, mode="dv")
    # one file, live 900 >= threshold 500; dv ratio 10% >= 5%
    r = compact_table(spark, p, target_file_rows=2000, min_file_rows=500)
    assert r["files_after"] == 1 and r["version"] > 1
    desc = txlog.describe_table(p)
    assert desc["dv_files"] == 0 and desc["total_rows"] == 900
    # below the ratio: left alone
    delete_where(spark, p, F.col("k") == 500, mode="dv")
    r2 = compact_table(
        spark, p, target_file_rows=2000, min_file_rows=500,
        dv_min_ratio=0.05,
    )
    assert r2["files_after"] == r2["files_before"]
    assert txlog.describe_table(p)["dv_files"] == 1


def test_optimize_materializes_dv(spark, table):
    delete_where(spark, table, F.col("k") % 5 == 0, mode="dv")
    expect = _content(read_table(spark, table))
    optimize_table(spark, table, zorder_by=["k"], target_file_rows=1000)
    assert txlog.describe_table(table)["dv_files"] == 0
    assert _content(read_table(spark, table)) == expect


def test_table_changes_across_dv_commits(spark, table):
    """The change feed derives deletes/updates from dv identity
    changes: same data file, different dv = old-minus-new rows."""
    delete_where(spark, table, F.col("k").isin(3, 7), mode="dv")  # v1
    merge_upsert(spark, _df(spark, [(9, "N9"), (901, "NEW")]), table,
                 mode="dv")  # v2
    ch = table_changes(spark, table, 0, 1)
    assert sorted((r["k"], r["_change_type"]) for r in ch.collect()) == [
        (3, "delete"), (7, "delete"),
    ]
    ch2 = table_changes(spark, table, 1, 2)
    got = sorted((r["k"], r["v"], r["_change_type"]) for r in ch2.collect())
    assert got == [
        (9, "N9", "update_post"), (9, "v9", "update_pre"),
        (901, "NEW", "insert"),
    ]
    # compaction after the dv commits: physical only, no phantom rows
    compact_table(spark, table, target_file_rows=1000)
    v = txlog.table_version(table)
    assert _content(table_changes(spark, table, 2, v)) == []


def test_datasource_batch_read_applies_dv(spark, table):
    from data_pipelines_spark.sources.txlog_datasource import (
        register_txlog_source,
    )

    register_txlog_source(spark)
    delete_where(spark, table, F.col("k") % 3 == 0, mode="dv")
    out = (
        spark.read.format("txlog").option("path", table).load()
    )
    expect = [(i, f"v{i}") for i in range(100) if i % 3 != 0]
    assert _content(out) == expect
    # filter pushdown pruning composes with dv application
    got = _content(
        spark.read.format("txlog").option("path", table).load()
        .where(F.col("k") < 10)
    )
    assert got == [(i, f"v{i}") for i in range(10) if i % 3 != 0]
    # time travel through the datasource sees the pre-delete snapshot
    v0 = (
        spark.read.format("txlog").option("path", table)
        .option("version", "0").load()
    )
    assert v0.count() == 100


def test_datasource_cdf_batch_over_dv_commits(spark, table):
    from data_pipelines_spark.sources.txlog_datasource import (
        register_txlog_source,
    )

    register_txlog_source(spark)
    delete_where(spark, table, F.col("k").isin(4, 44), mode="dv")  # v1
    merge_upsert(spark, _df(spark, [(44, "RES44")]), table, mode="dv")  # v2
    feed = (
        spark.read.format("txlog").option("path", table)
        .option("readChangeFeed", "true").option("startingVersion", "1")
        .load()
    )
    got = sorted(
        (r["k"], r["v"], r["_change_type"], r["_commit_version"])
        for r in feed.collect()
    )
    assert got == [
        (4, "v4", "delete", 1),
        (44, "RES44", "insert", 2),
        (44, "v44", "delete", 1),
    ]


def test_stream_cdf_over_dv_commits(spark, table, tmp_path):
    from data_pipelines_spark.sources.txlog_datasource import (
        register_txlog_source,
    )

    register_txlog_source(spark)
    delete_where(spark, table, F.col("k") == 2, mode="dv")
    merge_upsert(spark, _df(spark, [(6, "N6")]), table, mode="dv")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    q = (
        spark.readStream.format("txlog").option("path", table)
        .option("readChangeFeed", "true").option("startingVersion", "1")
        .load()
        .writeStream.format("parquet")
        .option("path", out_dir).option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(
        (r["k"], r["v"], r["_change_type"], r["_commit_version"])
        for r in spark.read.parquet(out_dir).collect()
    )
    assert got == [
        (2, "v2", "delete", 1),
        (6, "N6", "update_post", 2),
        (6, "v6", "update_pre", 2),
    ]


def test_vacuum_protects_live_dv_and_collects_dead_ones(spark, table):
    delete_where(spark, table, F.col("k") % 2 == 0, mode="dv")
    state = txlog._load_state(table)
    dv_dirs = {e["dv"]["path"] for e in state.files.values() if e.get("dv")}
    assert dv_dirs
    root = txlog._local(table)
    # the dv is referenced by the LATEST snapshot: vacuum must keep it
    vacuum_table(table, retain_versions=1, min_age_seconds=0)
    for d in dv_dirs:
        assert txlog._dv_parquet_files(root, d)
    assert len(_content(read_table(spark, table))) == 50
    # compaction materializes the dv; a further vacuum collects it
    compact_table(spark, table, target_file_rows=1000)
    vacuum_table(table, retain_versions=1, min_age_seconds=0)
    for d in dv_dirs:
        assert not os.path.isdir(os.path.join(root, d)) or not (
            txlog._dv_parquet_files(root, d)
        )
    assert len(_content(read_table(spark, table))) == 50


def test_restore_across_dv_history_and_vacuumed_dv_refusal(spark, table):
    # scattered predicates so every file gets a dv (a range predicate
    # covering whole files would drop them without any dv)
    delete_where(spark, table, F.col("k") % 10 == 0, mode="dv")  # v1
    delete_where(spark, table, F.col("k") % 10 == 5, mode="dv")  # v2
    assert txlog.describe_table(table)["dv_files"] == 4
    # restore to v1: files regain their v1 identity (dv without the
    # v2 deletions)
    restore_table(spark, table, 1)
    assert len(_content(read_table(spark, table))) == 90
    restore_table(spark, table, 0)
    assert len(_content(read_table(spark, table))) == 100
    assert txlog.describe_table(table)["dv_files"] == 0
    # after vacuum collects the v1 dv dataset, restoring to v1 fails
    # loudly instead of silently resurrecting the deleted rows
    vacuum_table(table, retain_versions=1, min_age_seconds=0)
    with pytest.raises(FileNotFoundError, match="vacuumed"):
        restore_table(spark, table, 1)
    # and a time-travel read of the vacuumed dv snapshot fails loudly
    # too — never silently partial
    with pytest.raises(Exception, match="vacuumed|missing"):
        read_table(spark, table, version=1).collect()


def test_dv_checkpoint_round_trip(spark, table):
    """Entries carrying dvs survive the checkpoint serialization: 10+
    commits force a checkpoint; a reader starting from it must still
    apply the dv."""
    delete_where(spark, table, F.col("k") == 1, mode="dv")
    for i in range(10):
        merge_upsert(
            spark, _df(spark, [(200 + i, f"m{i}")]), table, mode="dv"
        )
    assert txlog.table_version(table) >= txlog.CHECKPOINT_EVERY
    out = dict(_content(read_table(spark, table)))
    assert 1 not in out and len(out) == 109


def test_dv_write_amplification_probe(spark, tmp_path):
    """THE motivating number: a scattered-key merge touching every
    file writes ~the full table under copy-on-write but only the batch
    + positions under merge-on-read. Pinned at a conservative 5x here
    (the gap grows linearly with file size — at 100 TB it is ~100x)."""
    rows = [(i, "x" * 64) for i in range(40_000)]
    written = {}
    for mode in ("cow", "dv"):
        p = str(tmp_path / mode)
        create_table(
            spark, _df(spark, rows), p, key_cols=["k"], num_files=8,
        )
        v0 = txlog.table_version(p)
        # 0.1% of keys, uniformly scattered -> every file matches
        batch = _df(spark, [(i, "UPDATED") for i in range(0, 40_000, 1000)])
        merge_upsert(spark, batch, p, mode=mode)
        written[mode] = _data_bytes_added(p, v0)
        out = dict(_content(read_table(spark, p)))
        assert len(out) == 40_000 and out[1000] == "UPDATED"
    assert written["dv"] * 5 < written["cow"], written


def test_dv_merge_version_col_same_as_key(spark, tmp_path):
    """Review regression: version_col may BE a key column — the dv
    merge's slim scan must not select it twice (ambiguous window)."""
    p = str(tmp_path / "t")
    create_table(
        spark, _df(spark, [(1, "a"), (2, "b")]), p, key_cols=["k"],
    )
    r = merge_upsert(
        spark, _df(spark, [(2, "B2"), (3, "c")]), p,
        key_cols=["k"], version_col="k", mode="dv",
    )
    assert r["version"] == 1
    out = dict(_content(read_table(spark, p)))
    assert out == {1: "a", 2: "B2", 3: "c"}


def test_dv_merge_enforces_check_constraints(spark, table):
    """A dv merge validates CHECK constraints on the INSERTED rows
    (replaced rows only lose positions — deletion cannot violate a
    constraint): a violating batch raises, commits nothing, and leaves
    no staged litter in the live state."""
    txlog.add_constraint(spark, table, "k_nonneg", "k >= 0")
    v = txlog.table_version(table)
    with pytest.raises(ValueError, match="k_nonneg"):
        merge_upsert(
            spark, _df(spark, [(-5, "bad"), (1, "upd")]), table, mode="dv"
        )
    assert txlog.table_version(table) == v  # nothing committed
    out = dict(_content(read_table(spark, table)))
    assert out[1] == "v1" and -5 not in out and len(out) == 100
    # a clean batch passes and the dv commit lands
    r = merge_upsert(spark, _df(spark, [(1, "ok")]), table, mode="dv")
    assert r["files_dv"] == 1
    assert dict(_content(read_table(spark, table)))[1] == "ok"


def test_datasource_reads_dv_plus_schema_evolution(spark, table):
    """The Arrow-batch reader composes its two transforms correctly on
    one file: position masking (dv) AND NULL-fill of columns a later
    evolution added — old files read minus their deleted rows with the
    evolved column NULL."""
    from data_pipelines_spark.sources.txlog_datasource import (
        register_txlog_source,
    )

    register_txlog_source(spark)
    merge_upsert(
        spark,
        _df(spark, [(7, "EV7", "x")], "k long, v string, extra string"),
        table,
        evolve_schema=True,
        mode="dv",
    )
    delete_where(spark, table, F.col("k").isin(2, 8), mode="dv")
    api = read_table(spark, table).select("k", "v", "extra")
    ds = (
        spark.read.format("txlog").option("path", table).load()
        .select("k", "v", "extra")
    )
    assert _content(api) == _content(ds)
    got = {r["k"]: (r["v"], r["extra"]) for r in ds.collect()}
    assert got[7] == ("EV7", "x") and got[3] == ("v3", None)
    assert 2 not in got and 8 not in got and len(got) == 98
