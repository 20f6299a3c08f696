"""Round-12 scale probe: merge-on-read (deletion vectors) vs
copy-on-write write amplification on a SCATTERED update.

The scenario copy-on-write cannot survive at 100 TB: a 0.1% update
batch whose keys are uniformly scattered, so every file's key range
overlaps the batch and stats pruning saves nothing. CoW rewrites every
touched file in full; dv mode writes the batch's rows plus a tiny
(file, position) list.

Run:  python examples/scale_probe_r12_dv.py [rows] [rows_10x]
Defaults 200_000 and 2_000_000 (10x), 20 files either way — the
observable is bytes ADDED by the merge commit (new data files + dv
dataset), read straight from the commit log. Expectation: CoW bytes
grow ~10x with table size (it rewrites all 20 files); dv bytes stay
~flat (the batch is the same 0.1%), so the ratio grows ~10x — ~100x
at this probe's 10x point, unbounded at real scale.
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from data_pipelines_spark.session import get_spark  # noqa: E402
from data_pipelines_spark.sources import txlog  # noqa: E402


def _bytes_added(path: str, from_version: int) -> int:
    # bytes physically WRITTEN: a dv commit re-adds existing data
    # files (same relpath, new dv) — only new paths count, plus each
    # dv dataset once
    total = 0
    root = txlog._local(path)
    prev = set(txlog._load_state(path, from_version).files)
    seen_dv = set()
    for v in range(from_version + 1, txlog.table_version(path) + 1):
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


def probe(spark, rows: int, files: int = 20) -> dict:
    out = {"rows": rows}
    batch_keys = list(range(0, rows, 1000))  # 0.1%, uniformly scattered
    for mode in ("cow", "dv"):
        d = tempfile.mkdtemp(prefix=f"dvprobe_{mode}_")
        path = os.path.join(d, "t")
        try:
            base = spark.range(rows).select(
                F.col("id").alias("k"),
                F.concat(F.lit("payload-" * 16), F.col("id")).alias("v"),
            )
            txlog.create_table(spark, base, path, key_cols=["k"],
                               num_files=files)
            batch = spark.createDataFrame(
                [(k, "UPDATED") for k in batch_keys], "k long, v string"
            )
            v0 = txlog.table_version(path)
            t0 = time.perf_counter()
            txlog.merge_upsert(spark, batch, path, mode=mode)
            wall = time.perf_counter() - t0
            n = txlog.read_table(spark, path).count()
            assert n == rows, (n, rows)
            out[mode] = {
                "bytes_written": _bytes_added(path, v0),
                "wall_s": round(wall, 2),
            }
        finally:
            shutil.rmtree(d, ignore_errors=True)
    out["cow_over_dv_bytes"] = round(
        out["cow"]["bytes_written"] / out["dv"]["bytes_written"], 1
    )
    return out


def cdf_probe(spark, rows: int, files: int = 20) -> dict:
    """Bounded per-task CDF: one overwrite-scale merge commit at this
    size, read through the change feed with a FIXED maxBytesPerTask —
    the observable is max bytes any single task diffs. Flat across a
    10x commit-size growth = the per-task memory bound holds (slices
    multiply instead)."""
    from data_pipelines_spark.sources.txlog_datasource import (
        _cdc_partitions,
    )

    d = tempfile.mkdtemp(prefix="cdfprobe_")
    path = os.path.join(d, "t")
    try:
        base = spark.range(rows).select(
            F.col("id").alias("k"),
            F.concat(F.lit("payload-" * 16), F.col("id")).alias("v"),
        )
        txlog.create_table(spark, base, path, key_cols=["k"],
                           num_files=files)
        # touch HALF the keys -> a giant churn commit
        batch = spark.range(0, rows, 2).select(
            F.col("id").alias("k"), F.lit("UPDATED").alias("v")
        )
        txlog.merge_upsert(spark, batch, path, mode="cow")
        max_bytes = 2 * 1024 * 1024
        parts = _cdc_partitions(path, 1, 1, ["k"], max_bytes)

        def task_bytes(p):
            return sum(
                os.path.getsize(f["abs"]) for f in p.removed + p.added
            )

        return {
            "rows": rows,
            "slices": len(parts),
            "max_task_bytes": max(task_bytes(p) for p in parts),
        }
    finally:
        shutil.rmtree(d, ignore_errors=True)


def main():
    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    rows10 = int(sys.argv[2]) if len(sys.argv) > 2 else rows * 10
    spark = get_spark(app_name="dv-scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    r1 = probe(spark, rows)
    r10 = probe(spark, rows10)
    print("1x :", r1)
    print("10x:", r10)
    growth_cow = r10["cow"]["bytes_written"] / r1["cow"]["bytes_written"]
    growth_dv = r10["dv"]["bytes_written"] / r1["dv"]["bytes_written"]
    print(
        f"bytes growth at 10x table size: cow {growth_cow:.1f}x, "
        f"dv {growth_dv:.1f}x; cow/dv ratio at 10x: "
        f"{r10['cow_over_dv_bytes']}x"
    )
    c1 = cdf_probe(spark, rows)
    c10 = cdf_probe(spark, rows10)
    print("cdf 1x :", c1)
    print("cdf 10x:", c10)
    print(
        f"cdf max per-task bytes growth at 10x commit churn: "
        f"{c10['max_task_bytes'] / c1['max_task_bytes']:.2f}x "
        f"(slices {c1['slices']} -> {c10['slices']})"
    )


if __name__ == "__main__":
    main()
