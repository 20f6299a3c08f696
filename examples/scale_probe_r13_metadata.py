"""Round-13 probe: txlog METADATA scale — snapshot load + scan-plan
construction at 100k / 500k / 1M file entries.

The one unproven 100-TB claim from round 12: snapshot state is a JSON
checkpoint + driver-side dict replay, and `_scan_files` passes one
explicit path per live file to `spark.read.parquet`. A real 100 TB
table holds ~1M files (100 MB each); this probe measures what those
two paths cost at that count, before and after the round-13 fixes
(parquet-sidecar checkpoints, lazily decoded stats, directory-grouped
scan paths).

Synthetic by construction: entries are generated in-process (writing
1M real parquet files is a filesystem benchmark, not a metadata one);
one real parquet file backs the plan-construction timing so analysis
runs against readable footers.

Run: python examples/scale_probe_r13_metadata.py [counts...]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_pipelines_spark.sources import txlog


def synth_entries(n: int, files_per_dir: int = 1000) -> list[dict]:
    """Add entries shaped like real commits: one stats column (bigint
    key), contiguous key ranges per file — what a clustered write
    produces."""
    out = []
    for i in range(n):
        d = i // files_per_dir
        out.append(
            {
                "path": f"data/c{d:08x}/part-{i % files_per_dir:05d}.parquet",
                "rows": 100_000,
                "bytes": 100 * 1024 * 1024,
                "stats": {
                    "k": {
                        "min": {"t": "i", "v": i * 100_000},
                        "max": {"t": "i", "v": (i + 1) * 100_000 - 1},
                        "nulls": 0,
                    }
                },
            }
        )
    return out


def build_table(root: str, n: int) -> None:
    """A log whose checkpoint holds n entries (checkpoint at version
    10 + two small tail commits — the shape a long-lived table has)."""
    os.makedirs(os.path.join(root, txlog._LOG_DIR), exist_ok=True)
    entries = synth_entries(n)
    meta = {
        "schema": json.dumps(
            {
                "type": "struct",
                "fields": [
                    {
                        "name": "k",
                        "type": "long",
                        "nullable": True,
                        "metadata": {},
                    }
                ],
            }
        ),
        "key_cols": ["k"],
        "cluster_by": ["k"],
        "stat_cols": ["k"],
    }
    # commits 0..10 exist so replay-from-zero is possible; the
    # checkpoint at 10 carries the bulk
    for v in range(10):
        txlog._write_commit_exclusive(
            root, v,
            [{"meta": meta}, {"commit": {"op": "append", "ts": float(v)}}],
        )
    txlog._write_commit_exclusive(
        root, 10,
        [{"commit": {"op": "append", "ts": 10.0}}]
        + [{"add": e} for e in entries],
    )
    txlog._maybe_checkpoint(root, 10)
    for v in (11, 12):
        txlog._write_commit_exclusive(
            root, v,
            [
                {"commit": {"op": "append", "ts": float(v)}},
                {"add": synth_entries(1)[0] | {"path": f"data/tail/{v}.parquet"}},
            ],
        )


def probe(n: int, spark=None) -> dict:
    root = tempfile.mkdtemp(prefix=f"txmeta{n}_")
    try:
        t0 = time.perf_counter()
        build_table(root, n)
        t_build = time.perf_counter() - t0

        cp = os.path.join(
            root, txlog._LOG_DIR, txlog._fmt_version(10) + ".checkpoint.json"
        )
        cp_bytes = os.path.getsize(cp) if os.path.exists(cp) else 0
        side_bytes = 0
        parts_dir = os.path.join(root, "_txlog_ckpt")
        if os.path.isdir(parts_dir):
            side_bytes = sum(
                os.path.getsize(os.path.join(parts_dir, f))
                for f in os.listdir(parts_dir)
            )

        t0 = time.perf_counter()
        state = txlog._load_state(root)
        t_load = time.perf_counter() - t0
        assert len(state.files) == n + 2, len(state.files)
        t0 = time.perf_counter()
        txlog._load_state(root)  # snapshot cache (validated os.stat hit)
        t_warm = time.perf_counter() - t0

        # merge-shaped pruning pass: batch stats decode + per-entry
        # zonemap check — what a merge candidate selection costs
        bounds = {"k": (0, 50_000_000)}
        t0 = time.perf_counter()
        txlog._ensure_stats_decoded(state.files)
        kept = [
            e
            for e in state.files.values()
            if not txlog._file_disjoint(e, bounds)
        ]
        t_prune = time.perf_counter() - t0

        out = {
            "n": n,
            "build_s": round(t_build, 3),
            "checkpoint_mb": round(cp_bytes / 1e6, 1),
            "sidecar_mb": round(side_bytes / 1e6, 1),
            "cold_load_s": round(t_load, 3),
            "warm_load_s": round(t_warm, 4),
            "prune_pass_s": round(t_prune, 3),
            "pruned_to": len(kept),
        }

        if spark is not None:
            # plan construction: every path must reach the reader; back
            # them all with ONE real parquet file via symlinked names so
            # footers resolve (metadata cost is the same as distinct
            # files; we never execute the scan)
            real = os.path.join(root, "seed.parquet")
            spark.range(10).selectExpr("id as k").coalesce(
                1
            ).write.mode("overwrite").parquet(
                os.path.join(root, "seeddir")
            )
            src = next(
                f
                for f in os.listdir(os.path.join(root, "seeddir"))
                if f.endswith(".parquet")
            )
            shutil.copy(os.path.join(root, "seeddir", src), real)
            first_in_dir: dict[str, str] = {}
            for e in list(state.files.values()):
                p = os.path.join(root, e["path"])
                d = os.path.dirname(p)
                os.makedirs(d, exist_ok=True)
                if os.path.exists(p):
                    continue
                # one real copy per dir, hard links within (the ~65k
                # links-per-inode cap rules out linking one seed)
                if d not in first_in_dir:
                    shutil.copy(real, p)
                    first_in_dir[d] = p
                else:
                    os.link(first_in_dir[d], p)
            # age the dirs past _DIR_GROUP_MIN_AGE so the probe
            # exercises the directory-grouped plan (the steady state
            # of a table whose files weren't written seconds ago)
            old = time.time() - 3600
            for d in first_in_dir:
                os.utime(d, (old, old))
            t0 = time.perf_counter()
            df = txlog._scan_files(
                spark, root, list(state.files.values()), state.meta
            )
            _ = df.schema
            out["plan_construct_s"] = round(time.perf_counter() - t0, 3)
        return out
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    counts = [int(a) for a in sys.argv[1:]] or [100_000, 500_000, 1_000_000]
    use_spark = os.environ.get("PROBE_SPARK", "0") == "1"
    spark = None
    if use_spark:
        from pyspark.sql import SparkSession

        spark = (
            SparkSession.builder.master("local[8]")
            .config("spark.sql.shuffle.partitions", "8")
            .config("spark.driver.memory", "16g")
            .getOrCreate()
        )
    for n in counts:
        print(json.dumps(probe(n, spark)), flush=True)
