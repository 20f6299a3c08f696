"""Exactly-once streaming ingest into txlog tables
(`streaming/txsink.py` + the txn watermark in `sources/txlog.py`):
idempotent (app, batch) commits, checkpoint replay after a simulated
crash, merge-mode streaming CDC."""

from __future__ import annotations

import os
import shutil

from pyspark.sql import functions as F

from data_pipelines_spark.sources import txlog
from data_pipelines_spark.streaming.txsink import stream_txlog_sink


def _write_manifest(d: str, name: str, rows: list[str]) -> None:
    os.makedirs(d, exist_ok=True)
    tmp = os.path.join(d, f".{name}.tmp")
    with open(tmp, "w") as fh:
        fh.write("\n".join(rows) + "\n")
    os.replace(tmp, os.path.join(d, name))


def _stream(spark, src_dir):
    return (
        spark.readStream.format("text")
        .option("maxFilesPerTrigger", 1)
        .load(src_dir)
        .select(
            F.split("value", ",")[0].cast("long").alias("k"),
            F.split("value", ",")[1].alias("v"),
        )
    )


def _drain(spark, src, table, ckpt, mode="append", **kw):
    q = stream_txlog_sink(
        _stream(spark, src), table, app_id="q1", mode=mode,
        checkpoint=ckpt, **kw
    ).start()
    q.awaitTermination(120)


def test_txn_append_idempotent(spark, tmp_path):
    path = str(tmp_path / "t")
    df = spark.createDataFrame([(1, "a")], "k long, v string")
    txlog.create_table(spark, df, path, key_cols=["k"])
    txlog.append_table(spark, df, path, txn=("app", 5))
    assert txlog.last_committed_batch(path, "app") == 5
    # replaying batch 5 (and anything older) is a no-op
    v = txlog.append_table(spark, df, path, txn=("app", 5))
    txlog.append_table(spark, df, path, txn=("app", 3))
    assert txlog.read_table(spark, path).count() == 2
    assert txlog.table_version(path) == v == 1
    # a NEWER batch lands
    txlog.append_table(spark, df, path, txn=("app", 6))
    assert txlog.read_table(spark, path).count() == 3
    # independent apps have independent watermarks
    txlog.append_table(spark, df, path, txn=("other", 0))
    assert txlog.read_table(spark, path).count() == 4


def test_txn_merge_idempotent(spark, tmp_path):
    path = str(tmp_path / "t")
    base = spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string")
    txlog.create_table(spark, base, path, key_cols=["k"])
    upd = spark.createDataFrame([(1, "A"), (3, "c")], "k long, v string")
    r1 = txlog.merge_upsert(spark, upd, path, txn=("app", 0))
    r2 = txlog.merge_upsert(spark, upd, path, txn=("app", 0))
    assert r2.get("already_committed") is True
    assert r2["version"] == r1["version"]
    got = {r["k"]: r["v"] for r in txlog.read_table(spark, path).collect()}
    assert got == {1: "A", 2: "b", 3: "c"}


def test_stream_append_exactly_once_across_restarts(spark, tmp_path):
    """Three manifest waves through an availableNow query; then the
    STREAMING checkpoint is deleted so a fresh query re-delivers every
    batch from scratch (at-least-once made concrete) — the table's txn
    watermarks must absorb the replay with zero duplicate rows."""
    src = str(tmp_path / "src")
    table = str(tmp_path / "table")
    ckpt = str(tmp_path / "ckpt")
    _write_manifest(src, "w0.txt", ["1,a", "2,b"])
    _write_manifest(src, "w1.txt", ["3,c"])
    _drain(spark, src, table, ckpt)
    assert txlog.read_table(spark, table).count() == 3

    _write_manifest(src, "w2.txt", ["4,d"])
    _drain(spark, src, table, ckpt)  # incremental: only w2 ingested
    assert txlog.read_table(spark, table).count() == 4

    versions_before = txlog.table_version(table)
    shutil.rmtree(ckpt)  # crash-lose the streaming checkpoint entirely
    _drain(spark, src, table, ckpt)  # fresh query replays batches 0..N
    out = txlog.read_table(spark, table)
    assert out.count() == 4  # no duplicate ingestion
    assert {r["k"] for r in out.collect()} == {1, 2, 3, 4}
    # the replayed batches were all recognized: no new data commits
    hist = txlog.table_history(table)
    new_rows = sum(
        h["rows_added"] for h in hist if h["version"] > versions_before
    )
    assert new_rows == 0


def test_stream_merge_cdc(spark, tmp_path):
    """Merge-mode: later micro-batches upsert keys from earlier ones —
    the streaming-CDC shape a partition-overwrite sink cannot express."""
    src = str(tmp_path / "src")
    table = str(tmp_path / "table")
    ckpt = str(tmp_path / "ckpt")
    # two waves with a drain between them: the file source only
    # guarantees batch order by arrival, not by name — same-instant
    # files can deliver in either order, which for a MERGE matters
    _write_manifest(src, "w0.txt", ["1,old", "2,keep"])
    _drain(spark, src, table, ckpt, mode="merge", key_cols=["k"])
    _write_manifest(src, "w1.txt", ["1,new", "3,ins"])
    _drain(spark, src, table, ckpt, mode="merge", key_cols=["k"])
    got = {r["k"]: r["v"] for r in txlog.read_table(spark, table).collect()}
    assert got == {1: "new", 2: "keep", 3: "ins"}
    # replay the whole stream: content unchanged
    shutil.rmtree(ckpt)
    _drain(spark, src, table, ckpt, mode="merge", key_cols=["k"])
    got = {r["k"]: r["v"] for r in txlog.read_table(spark, table).collect()}
    assert got == {1: "new", 2: "keep", 3: "ins"}


def test_stream_sink_auto_compacts_every_n_batches(spark, tmp_path):
    """compact_every: the sink bin-packs the table's micro-batch file
    litter every N batches — content invariant, and the physical
    commits interleave with the txn-watermarked data commits without
    disturbing exactly-once."""
    src = str(tmp_path / "src")
    table = str(tmp_path / "t")
    ckpt = str(tmp_path / "ck")
    for i in range(6):
        _write_manifest(src, f"w{i}.txt", [f"{10 * i + j},v{i}" for j in range(3)])
    q = stream_txlog_sink(
        _stream(spark, src), table, app_id="ac", mode="append",
        checkpoint=ckpt, compact_every=3, compact_target_rows=10_000,
    ).start()
    q.awaitTermination(120)
    hist = txlog.table_history(table)
    assert "compact" in {h["op"] for h in hist}
    assert txlog.read_table(spark, table).count() == 18
    # packed layout: far fewer live files than one-per-batch litter
    assert len(txlog._load_state(table).files) < 6
    # exactly-once held: every batch landed exactly once
    got = {r["k"] for r in txlog.read_table(spark, table).collect()}
    assert got == {10 * i + j for i in range(6) for j in range(3)}


def test_stream_merge_cdc_dv_mode_matches_cow(spark, tmp_path):
    """Streaming CDC with merge_mode='dv' (merge-on-read): replaces by
    key without rewriting matched files, stays idempotent across a
    checkpoint-lost replay, and the periodic compaction pass
    materializes the accumulated deletion vectors — final content
    pinned equal to the cow-mode sink on the same batches."""
    # two waves with a drain between them (same hazard the cdc test
    # above documents: same-instant files can batch in either order,
    # which matters for a merge)
    src = str(tmp_path / "src")
    _write_manifest(src, "w1.txt", [f"{k},base{k}" for k in range(40)])
    tables = {}
    for mm in ("cow", "dv"):
        table = str(tmp_path / f"t_{mm}")
        ckpt = str(tmp_path / f"ckpt_{mm}")
        _drain(
            spark, src, table, ckpt, mode="merge", key_cols=["k"],
            merge_mode=mm,
        )
        tables[mm] = table
    _write_manifest(src, "w2.txt", [f"{k},upd{k}" for k in range(0, 40, 7)])
    for mm in ("cow", "dv"):
        _drain(
            spark, src, tables[mm], str(tmp_path / f"ckpt_{mm}"),
            mode="merge", key_cols=["k"], merge_mode=mm,
        )
    read = lambda t: sorted(
        tuple(r) for r in txlog.read_table(spark, t).collect()
    )
    assert read(tables["dv"]) == read(tables["cow"])
    got = dict(read(tables["dv"]))
    assert got[7] == "upd7" and got[1] == "base1" and len(got) == 40
    # dv commits accumulated deletion vectors; a compaction pass (what
    # compact_every runs) materializes them without changing content
    assert txlog.describe_table(tables["dv"])["dv_rows"] > 0
    before = read(tables["dv"])
    txlog.compact_table(
        spark, tables["dv"], target_file_rows=1000, min_file_rows=500
    )
    assert txlog.describe_table(tables["dv"])["dv_files"] == 0
    assert read(tables["dv"]) == before
    # checkpoint-lost replay with a fresh app id: dv merge re-ingest is
    # idempotent by keys — zero duplicates
    ckpt2 = str(tmp_path / "ckpt_dv2")
    q = stream_txlog_sink(
        _stream(spark, src), tables["dv"], app_id="q2", mode="merge",
        key_cols=["k"], checkpoint=ckpt2, merge_mode="dv",
    ).start()
    q.awaitTermination(120)
    assert read(tables["dv"]) == before
