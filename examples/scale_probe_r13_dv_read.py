"""Round-13 probe: deletion-vector READ-side overhead vs dv density,
and the compaction knob that removes it.

Round 12 proved the dv WRITE win (bytes written ∝ batch, 760-1402× less
than cow on scattered keys). The open question was the read side: a
dv-carrying table scans through a broadcast anti-join on
(_metadata.file_path, _metadata.row_index) — what does that cost at
0.1% / 1% / 10% deleted rows, and does `compact_table(dv_min_ratio=…)`
actually restore the plain-read plan?

Method: one table per density (4M rows, 16 files, bigint key), rows
deleted by a scattered predicate (`k % step == 0` hits every file), a
full-scan aggregate timed plain / with dvs / after compaction
(min-of-3, warm session), and the physical plan checked for the
anti-join's presence before compaction and absence after.

Run: python examples/scale_probe_r13_dv_read.py [row_count]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from data_pipelines_spark.session import get_spark
from data_pipelines_spark.sources import txlog


def timed(fn, n=3):
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def scan_plan(spark, path) -> str:
    return (
        txlog.read_table(spark, path)
        ._jdf.queryExecution().executedPlan().toString()
    )


def full_scan(spark, path):
    # touches every row and both columns — the read the dv must filter
    return (
        txlog.read_table(spark, path)
        .agg(F.sum("k"), F.count("v"))
        .collect()
    )


def main() -> None:
    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000
    spark = get_spark(app_name="dv-read-probe")
    base = tempfile.mkdtemp(prefix="dvread_")
    out = {"rows": rows, "densities": []}
    try:
        for frac in (0.001, 0.01, 0.10):
            path = f"{base}/tbl_{int(frac * 1000)}"
            df = spark.range(rows).select(
                F.col("id").alias("k"),
                F.concat(F.lit("v"), F.col("id")).alias("v"),
            )
            txlog.create_table(spark, df, path, key_cols=["k"], num_files=16)
            t_plain = timed(lambda: full_scan(spark, path))
            step = round(1 / frac)
            txlog.delete_where(
                spark, path, F.col("k") % step == 0, mode="dv"
            )
            assert "LeftAnti" in scan_plan(spark, path), "dv scan shape"
            t_dv = timed(lambda: full_scan(spark, path))
            # keep the file count (and so scan parallelism) comparable
            # to the pre-compaction table — the probe measures dv
            # overhead, not task-count effects
            res = txlog.compact_table(
                spark, path, target_file_rows=rows // 16,
                dv_min_ratio=0.0005,
            )
            plan_after = scan_plan(spark, path)
            assert "LeftAnti" not in plan_after, "compaction left dvs"
            t_compacted = timed(lambda: full_scan(spark, path))
            out["densities"].append(
                {
                    "deleted_frac": frac,
                    "plain_s": round(t_plain, 3),
                    "dv_scan_s": round(t_dv, 3),
                    "dv_overhead_x": round(t_dv / t_plain, 2),
                    "compacted_s": round(t_compacted, 3),
                    "files_before": res.get("files_before"),
                    "files_after": res.get("files_after"),
                }
            )
            print(json.dumps(out["densities"][-1]))
    finally:
        shutil.rmtree(base, ignore_errors=True)
        spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
