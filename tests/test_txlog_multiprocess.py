"""Cross-PROCESS OCC for the txlog store (round 13). Prior rounds
proved the commit race across threads in one process; these tests race
separate OS processes — where the create-exclusive contract actually
matters, because nothing but the filesystem arbitrates between two
drivers committing to one table.

Two legs: the raw ``FileLogStore.put_if_absent`` primitive (exactly
one winner per name, losers see FileExistsError, winner's payload
intact), and the full read-modify-write commit loop (every process's
appends land exactly once, versions contiguous, final table
model-consistent) driven by real ``_commit_rmw`` calls over real
parquet data files — Spark-free in the workers, verified by a Spark
read in the parent."""

from __future__ import annotations

import json
import os
import subprocess
import sys

from data_pipelines_spark.sources import txlog
from data_pipelines_spark.sources.txlog import create_table, read_table

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Each worker process claims versions in a tight loop: stage a payload
# naming (worker, attempt), try the version after the current head,
# retry on loss. Prints JSON {"wins": [...versions...]} at the end.
_RAW_WORKER = r"""
import json, sys
from data_pipelines_spark.sources.txlog import FileLogStore

log_dir, wid, n_claims = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
store = FileLogStore()
wins, attempt = [], 0
while len(wins) < n_claims:
    head = max(
        (int(n.split(".")[0]) for n in store.list_names(log_dir)
         if n.endswith(".json") and n.split(".")[0].isdigit()),
        default=-1,
    )
    v = head + 1
    attempt += 1
    try:
        store.put_if_absent(
            log_dir, f"{v:020d}.json", f'{{"w": {wid}, "a": {attempt}}}\n'
        )
        wins.append(v)
    except FileExistsError:
        continue
print(json.dumps({"wins": wins}))
"""

# Each worker appends one-row parquet files through the REAL commit
# protocol (_load_state + _commit_rmw retry on _Conflict) — the same
# loop append_table runs, minus Spark (pyarrow writes the data file).
_COMMIT_WORKER = r"""
import json, os, sys, uuid
import pyarrow as pa, pyarrow.parquet as pq
from data_pipelines_spark.sources import txlog

path, wid, n_commits = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
root = txlog._local(path)
committed = []
for i in range(n_commits):
    k = wid * 1000 + i
    rel_dir = f"data/w{wid}c{i}-{uuid.uuid4().hex[:8]}"
    os.makedirs(os.path.join(root, rel_dir), exist_ok=True)
    rel = f"{rel_dir}/part-00000.parquet"
    fpath = os.path.join(root, rel)
    pq.write_table(
        pa.table({"k": pa.array([k], pa.int64()),
                  "v": pa.array([f"w{wid}-{i}"], pa.string())}),
        fpath,
    )
    rows, stats = txlog._file_stats(fpath, ["k"])
    entry = {"path": rel, "rows": rows,
             "bytes": os.path.getsize(fpath), "stats": stats}
    while True:
        state = txlog._load_state(path)
        try:
            v = txlog._commit_rmw(
                path, state.version, "append", [entry], [], None
            )
            committed.append(v)
            break
        except txlog._Conflict:
            continue
print(json.dumps({"versions": committed}))
"""


def _run_workers(code: str, args_per_worker: list[list[str]]) -> list[dict]:
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", code, *args],
            cwd=_REPO,
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            text=True,
        )
        for args in args_per_worker
    ]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=300)
        assert p.returncode == 0, f"worker failed: {err[-2000:]}"
        outs.append(json.loads(out.strip().splitlines()[-1]))
    return outs


def test_put_if_absent_across_processes(tmp_path):
    """4 OS processes, 6 version claims each, one shared log dir: the
    24 claimed versions are exactly 0..23 with no duplicates, and
    every published payload is intact JSON naming its single winner."""
    log_dir = str(tmp_path / "_txlog")
    outs = _run_workers(
        _RAW_WORKER, [[log_dir, str(w), "6"] for w in range(4)]
    )
    all_wins = [v for o in outs for v in o["wins"]]
    assert sorted(all_wins) == list(range(24))  # contiguous, no dups
    store = txlog.FileLogStore()
    for v in range(24):
        payload = json.loads(
            "".join(store.read_lines(log_dir, f"{v:020d}.json"))
        )
        # the winner recorded for v is the process that claimed v
        winner = next(w for w, o in enumerate(outs) if v in o["wins"])
        assert payload["w"] == winner
    # no stray temp files leaked by losing attempts
    assert all(
        not n.startswith(".tmp-") for n in store.list_names(log_dir)
    )


def test_commit_rmw_race_across_processes(spark, tmp_path):
    """3 OS processes × 5 real append commits against one table: the
    versions they won are contiguous and disjoint, history replays
    cleanly, and the final table holds every row exactly once —
    model-consistent under true multi-driver OCC."""
    path = str(tmp_path / "tbl")
    df = spark.createDataFrame([(i, f"seed{i}") for i in range(10)],
                               "k long, v string")
    create_table(spark, df, path, key_cols=["k"], num_files=2)
    v0 = txlog.table_version(path)
    outs = _run_workers(
        _COMMIT_WORKER, [[path, str(w), "5"] for w in range(3)]
    )
    versions = sorted(v for o in outs for v in o["versions"])
    assert versions == list(range(v0 + 1, v0 + 16))
    # every process committed exactly its 5 appends
    assert all(len(o["versions"]) == 5 for o in outs)
    rows = {(r["k"], r["v"]) for r in read_table(spark, path).collect()}
    expect = {(i, f"seed{i}") for i in range(10)} | {
        (w * 1000 + i, f"w{w}-{i}") for w in range(3) for i in range(5)
    }
    assert rows == expect
    # replay at every intermediate version stays consistent: row count
    # grows by exactly one per commit (each append adds one row)
    for dv, v in enumerate(versions):
        assert read_table(spark, path, version=v).count() == 10 + dv + 1
