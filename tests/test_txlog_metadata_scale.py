"""Round-13 metadata-scale hardening of the txlog store: parquet
sidecar checkpoints, lazily/batch-decoded stats, directory-grouped
scan paths, and the validated snapshot cache.

The motivating probe (examples/scale_probe_r13_metadata.py, recorded
in NOTES_r13): an all-JSON checkpoint at 1M files costs 187 MB and
7.6 s to parse, and a per-file scan path list costs 36.7 s of plan
construction at 100k files. The sidecar + grouped paths bound both;
these tests pin the MECHANISMS (which form a checkpoint takes, when a
directory may be grouped, when the cache may serve) and a loose
linear-shape bound on cold-load time — never a wall-clock number.
"""

from __future__ import annotations

import json
import os
import shutil
import time

import pytest

from data_pipelines_spark.sources import txlog


def _synth_entries(n: int, files_per_dir: int = 500) -> list[dict]:
    return [
        {
            "path": f"data/c{i // files_per_dir:08x}/part-{i % files_per_dir:05d}.parquet",
            "rows": 1000,
            "bytes": 10_000,
            "stats": {
                "k": {
                    "min": {"t": "i", "v": i * 1000},
                    "max": {"t": "i", "v": (i + 1) * 1000 - 1},
                    "nulls": 0,
                }
            },
        }
        for i in range(n)
    ]


_META = {
    "schema": json.dumps(
        {
            "type": "struct",
            "fields": [
                {"name": "k", "type": "long", "nullable": True, "metadata": {}}
            ],
        }
    ),
    "key_cols": ["k"],
    "cluster_by": ["k"],
    "stat_cols": ["k"],
}


def _build_log(root: str, n: int) -> None:
    """Commits 0..10 with the bulk at 10, checkpointed there — a
    long-lived table's shape, without writing n real data files."""
    entries = _synth_entries(n)
    for v in range(10):
        txlog._write_commit_exclusive(
            root, v,
            [{"meta": _META}, {"commit": {"op": "append", "ts": float(v)}}],
        )
    txlog._write_commit_exclusive(
        root, 10,
        [{"commit": {"op": "append", "ts": 10.0}}]
        + [{"add": e} for e in entries],
    )
    txlog._maybe_checkpoint(root, 10)


@pytest.fixture(autouse=True)
def _fresh_cache():
    txlog._snapshot_cache.clear()
    yield
    txlog._snapshot_cache.clear()


def test_small_table_checkpoint_stays_json(tmp_path):
    root = str(tmp_path / "t")
    os.makedirs(os.path.join(root, txlog._LOG_DIR))
    _build_log(root, 50)
    payload = json.loads(
        open(
            os.path.join(
                root, txlog._LOG_DIR,
                txlog._fmt_version(10) + ".checkpoint.json",
            )
        ).read()
    )
    assert "files" in payload and "files_parquet" not in payload
    assert not os.path.isdir(os.path.join(root, txlog._CKPT_DIR))


def test_sidecar_checkpoint_roundtrip_and_lazy_stats(tmp_path, monkeypatch):
    monkeypatch.setattr(txlog, "_CKPT_PARQUET_MIN", 100)
    root = str(tmp_path / "t")
    os.makedirs(os.path.join(root, txlog._LOG_DIR))
    _build_log(root, 300)
    cp = json.loads(
        open(
            os.path.join(
                root, txlog._LOG_DIR,
                txlog._fmt_version(10) + ".checkpoint.json",
            )
        ).read()
    )
    assert cp["files_parquet"].startswith(txlog._CKPT_DIR + "/")
    assert cp["files_count"] == 300
    assert "files" not in cp
    state = txlog._load_state(root)
    assert len(state.files) == 300
    # stats arrive as raw strings and decode on demand, to the same
    # dicts a replayed load produces
    some = next(iter(state.files.values()))
    assert isinstance(some["stats"], str)
    assert txlog._entry_stats(some)["k"]["min"]["t"] == "i"
    assert isinstance(some["stats"], dict)  # cached in place
    # the batch decoder brings the whole map to decoded form
    txlog._ensure_stats_decoded(state.files)
    assert all(
        not isinstance(e.get("stats"), str) for e in state.files.values()
    )
    # pruning over sidecar-loaded entries matches the zonemap contract
    kept = [
        e
        for e in state.files.values()
        if not txlog._file_disjoint(e, {"k": (0, 9_999)})
    ]
    assert len(kept) == 10


def test_sidecar_corruption_degrades_to_replay(tmp_path, monkeypatch):
    monkeypatch.setattr(txlog, "_CKPT_PARQUET_MIN", 100)
    root = str(tmp_path / "t")
    os.makedirs(os.path.join(root, txlog._LOG_DIR))
    _build_log(root, 150)
    ckpt_dir = os.path.join(root, txlog._CKPT_DIR)
    for name in os.listdir(ckpt_dir):
        # truncate: manifest row count no longer matches
        with open(os.path.join(ckpt_dir, name), "r+b") as fh:
            fh.truncate(100)
    state = txlog._load_state(root)  # degrades to full replay
    assert len(state.files) == 150
    assert state.meta["key_cols"] == ["k"]


def test_replayed_and_sidecar_entries_compare_equal(tmp_path, monkeypatch):
    """table_changes-style identity: a sidecar-loaded entry (raw stats
    string) must compare equal to its replayed twin, or unchanged
    files would enter the change-feed diff as phantom churn."""
    monkeypatch.setattr(txlog, "_CKPT_PARQUET_MIN", 100)
    root = str(tmp_path / "t")
    os.makedirs(os.path.join(root, txlog._LOG_DIR))
    _build_log(root, 150)
    from_sidecar = txlog._load_state(root, 10)
    txlog._snapshot_cache.clear()
    # force the replay path by hiding the checkpoint
    cp = os.path.join(
        root, txlog._LOG_DIR, txlog._fmt_version(10) + ".checkpoint.json"
    )
    os.rename(cp, cp + ".bak")
    replayed = txlog._load_state(root, 10)
    os.rename(cp + ".bak", cp)
    assert set(from_sidecar.files) == set(replayed.files)
    assert all(
        txlog._entry_same(from_sidecar.files[rel], replayed.files[rel])
        for rel in replayed.files
    )


def test_entry_scan_paths_grouping_rules(tmp_path):
    root = str(tmp_path / "t")
    old = time.time() - 2 * txlog._DIR_GROUP_MIN_AGE

    def mkdir_files(d, names, age=True):
        absdir = os.path.join(root, d)
        os.makedirs(absdir)
        for n in names:
            open(os.path.join(absdir, n), "w").write("x")
        if age:
            os.utime(absdir, (old, old))

    # full dir -> grouped; _SUCCESS-style non-parquet files don't block
    mkdir_files("data/full", ["a.parquet", "b.parquet", "_SUCCESS"])
    # partial dir (one live of two on disk) -> per-file
    mkdir_files("data/partial", ["a.parquet", "b.parquet"])
    # orphan dir (straggler task file on disk, not in log) -> per-file
    mkdir_files("data/orphan", ["a.parquet", "b.parquet", "c.parquet"])
    # fresh dir (recent mtime: a writer may still be landing files)
    mkdir_files("data/fresh", ["a.parquet", "b.parquet"], age=False)
    entries = [
        {"path": "data/full/a.parquet"},
        {"path": "data/full/b.parquet"},
        {"path": "data/partial/a.parquet"},
        {"path": "data/orphan/a.parquet"},
        {"path": "data/orphan/b.parquet"},
        {"path": "data/fresh/a.parquet"},
        {"path": "data/fresh/b.parquet"},
    ]
    paths = txlog._entry_scan_paths(root, entries)
    j = os.path.join
    assert paths == [
        j(root, "data/fresh/a.parquet"),
        j(root, "data/fresh/b.parquet"),
        j(root, "data/full"),
        j(root, "data/orphan/a.parquet"),
        j(root, "data/orphan/b.parquet"),
        j(root, "data/partial/a.parquet"),
    ]


def test_grouped_scan_reads_correctly_end_to_end(spark, tmp_path):
    """A real table whose data dirs are old enough to group must read
    byte-identically, and an orphan straggler file dropped into a
    grouped dir must force the per-file fallback (never be read)."""
    path = str(tmp_path / "t")
    df = spark.range(1000).selectExpr("id as k", "id * 2 as v")
    txlog.create_table(spark, df, path, key_cols=["k"], num_files=4)
    data_root = os.path.join(path, "data")
    old = time.time() - 2 * txlog._DIR_GROUP_MIN_AGE
    for d in os.listdir(data_root):
        os.utime(os.path.join(data_root, d), (old, old))
    state = txlog._load_state(path)
    grouped = txlog._entry_scan_paths(
        txlog._local(path), list(state.files.values())
    )
    assert len(grouped) == 1 and grouped[0].endswith(
        tuple(os.listdir(data_root))
    )
    assert txlog.read_table(spark, path).count() == 1000
    # drop an orphan parquet (failed-task shape) into the dir
    d = grouped[0]
    src = next(n for n in os.listdir(d) if n.endswith(".parquet"))
    shutil.copy(os.path.join(d, src), os.path.join(d, "zz-orphan.parquet"))
    os.utime(d, (old, old))
    paths2 = txlog._entry_scan_paths(
        txlog._local(path), list(state.files.values())
    )
    assert all(p.endswith(".parquet") for p in paths2)  # per-file again
    assert txlog.read_table(spark, path).count() == 1000


def test_snapshot_cache_hit_and_staleness_guard(tmp_path, monkeypatch):
    monkeypatch.setattr(txlog, "_CKPT_PARQUET_MIN", 100)
    root = str(tmp_path / "t")
    os.makedirs(os.path.join(root, txlog._LOG_DIR))
    _build_log(root, 150)
    s1 = txlog._load_state(root)
    assert txlog._load_state(root) is s1  # cache hit, validated by stat
    # version pin misses the cache but loads correctly
    assert txlog._load_state(root, 9).files == {}
    # drop + recreate the table at the same path: the sidecar uuid
    # changes, so the stat guard must refuse the stale snapshot
    shutil.rmtree(root)
    os.makedirs(os.path.join(root, txlog._LOG_DIR))
    entries = _synth_entries(120)
    for v in range(10):
        txlog._write_commit_exclusive(
            root, v,
            [{"meta": _META}, {"commit": {"op": "append", "ts": float(v)}}],
        )
    txlog._write_commit_exclusive(
        root, 10,
        [{"commit": {"op": "append", "ts": 10.0}}]
        + [{"add": e} for e in entries],
    )
    txlog._maybe_checkpoint(root, 10)
    s2 = txlog._load_state(root)
    assert s2 is not s1
    assert len(s2.files) == 120


def test_vacuum_collects_orphan_sidecars(tmp_path, monkeypatch):
    monkeypatch.setattr(txlog, "_CKPT_PARQUET_MIN", 100)
    root = str(tmp_path / "t")
    os.makedirs(os.path.join(root, txlog._LOG_DIR))
    _build_log(root, 150)
    # re-checkpoint the same version: put_replace points the manifest
    # at a NEW sidecar, orphaning the first
    txlog._maybe_checkpoint(root, 10)
    ckpt_dir = os.path.join(root, txlog._CKPT_DIR)
    assert len(os.listdir(ckpt_dir)) == 2
    old = time.time() - 7200
    for n in os.listdir(ckpt_dir):
        os.utime(os.path.join(ckpt_dir, n), (old, old))
    # dry run counts, touches nothing
    n_dry = txlog.vacuum_table(root, min_age_seconds=3600, dry_run=True)
    assert n_dry == 1 and len(os.listdir(ckpt_dir)) == 2
    removed = txlog.vacuum_table(root, min_age_seconds=3600)
    assert removed == 1
    live = os.listdir(ckpt_dir)
    assert len(live) == 1
    cp = json.loads(
        open(
            os.path.join(
                root, txlog._LOG_DIR,
                txlog._fmt_version(10) + ".checkpoint.json",
            )
        ).read()
    )
    assert cp["files_parquet"] == f"{txlog._CKPT_DIR}/{live[0]}"
    txlog._snapshot_cache.clear()
    assert len(txlog._load_state(root).files) == 150


def test_cold_load_shape_is_linear(tmp_path, monkeypatch):
    """Shape pin, not a wall-clock pin: 5x the entries must cost less
    than ~2.5x the linear ratio in cold-load time (generous slack for
    box noise; quadratic behavior would blow straight through it)."""
    monkeypatch.setattr(txlog, "_CKPT_PARQUET_MIN", 100)

    def timed_load(n: int) -> float:
        root = str(tmp_path / f"t{n}")
        os.makedirs(os.path.join(root, txlog._LOG_DIR))
        _build_log(root, n)
        txlog._snapshot_cache.clear()
        best = float("inf")
        for _ in range(3):
            txlog._snapshot_cache.clear()
            t0 = time.perf_counter()
            state = txlog._load_state(root)
            best = min(best, time.perf_counter() - t0)
            assert len(state.files) == n
        return best

    t_small, t_big = timed_load(20_000), timed_load(100_000)
    assert t_big / max(t_small, 1e-4) < 5 * 2.5, (t_small, t_big)


def test_snapshot_cache_refuses_repointed_checkpoint(tmp_path, monkeypatch):
    """Review fix (r13): the sidecar-size stat alone misses a
    wipe-and-rebuild that leaves _txlog_ckpt behind (the old uuid file
    lingers, unchanged). The cache also re-reads the checkpoint JSON:
    one that no longer references the cached sidecar is a different
    table — refuse the hit."""
    monkeypatch.setattr(txlog, "_CKPT_PARQUET_MIN", 100)
    root = str(tmp_path / "t")
    os.makedirs(os.path.join(root, txlog._LOG_DIR))
    _build_log(root, 150)
    s1 = txlog._load_state(root)
    assert txlog._load_state(root) is s1
    # simulate the rebuild: log wiped and re-made to the same version,
    # referencing a NEW sidecar, while the old sidecar file survives
    shutil.rmtree(os.path.join(root, txlog._LOG_DIR))
    os.makedirs(os.path.join(root, txlog._LOG_DIR))
    entries = _synth_entries(120)
    for v in range(10):
        txlog._write_commit_exclusive(
            root, v,
            [{"meta": _META}, {"commit": {"op": "append", "ts": float(v)}}],
        )
    txlog._write_commit_exclusive(
        root, 10,
        [{"commit": {"op": "append", "ts": 10.0}}]
        + [{"add": e} for e in entries],
    )
    txlog._maybe_checkpoint(root, 10)  # new checkpoint, new sidecar uuid
    s2 = txlog._load_state(root)
    assert s2 is not s1
    assert len(s2.files) == 120
