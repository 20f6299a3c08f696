"""Round-10 scale probe: txlog MERGE cost vs TABLE size.

The claim under test is the transactional format's whole point: a
MERGE batch touching a fixed slice of the key space costs the touched
files, not the table. Protocol: build key-clustered txlog tables at 1×
(1M rows) and 10× (10M rows) with the same ~50k-row file grain, then
merge the SAME 10k-key contiguous batch into each and measure
steady-state wall time (min of 2 on a warmed JVM), files rewritten,
and files skipped. Expect files_rewritten ~flat and wall time growing
far slower than 10× (the residual growth is the driver-side log/stats
scan, which is checkpoint-bounded).

A second leg measures the read side: `read_table(bounds=...)` over a
1%-of-keyspace range must touch ~1% of files at both scales (the
zonemap claim).

Run: python examples/scale_probe_r10_txlog.py
"""

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, ".")

from pyspark.sql import SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from data_pipelines_spark.session import tune  # noqa: E402
from data_pipelines_spark.sources import txlog  # noqa: E402

FILE_ROWS = 50_000


def build(spark, path: str, rows: int) -> None:
    df = spark.range(rows).select(
        F.col("id").alias("k"),
        (F.col("id") % 97).alias("payload_a"),
        F.md5(F.col("id").cast("string")).alias("payload_b"),
    )
    txlog.create_table(
        spark, df, path, key_cols=["k"], num_files=rows // FILE_ROWS
    )


def probe(spark, path: str, rows: int) -> dict:
    # fixed-size batch: 10k contiguous keys in the middle + 100 inserts
    lo = rows // 2
    batch = spark.range(lo, lo + 10_000).select(
        F.col("id").alias("k"),
        F.lit(-1).cast("long").alias("payload_a"),
        F.lit("updated").alias("payload_b"),
    ).unionAll(
        spark.range(rows, rows + 100).select(
            F.col("id").alias("k"),
            F.lit(-2).cast("long").alias("payload_a"),
            F.lit("inserted").alias("payload_b"),
        )
    )
    best = None
    report = None
    for _ in range(2):
        t0 = time.perf_counter()
        report = txlog.merge_upsert(spark, batch, path)
        dt = time.perf_counter() - t0
        best = dt if best is None or dt < best else best
    n_files = len(txlog._load_state(path).files)
    # zonemap read leg: 1% of the key space
    span = rows // 100
    t0 = time.perf_counter()
    out = txlog.read_table(spark, path, bounds={"k": (0, span - 1)})
    touched = len(out.inputFiles())
    got = out.count()
    read_s = time.perf_counter() - t0
    assert got == span, (got, span)
    return {
        "rows": rows,
        "merge_s": round(best, 3),
        "files_rewritten": report["files_rewritten"],
        "files_skipped": report["files_skipped"],
        "table_files": n_files,
        "read_1pct_s": round(read_s, 3),
        "read_1pct_files_touched": touched,
    }


def main() -> None:
    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
        )
        .appName("txlog-scale-probe")
        .getOrCreate()
    )
    tune(spark)
    spark.sparkContext.setLogLevel("ERROR")
    d = tempfile.mkdtemp(prefix="txlog_probe_")
    try:
        results = []
        for rows in (1_000_000, 10_000_000):
            path = os.path.join(d, f"t{rows}")
            build(spark, path, rows)
            results.append(probe(spark, path, rows))
        print(json.dumps({"probe": "txlog_merge_scale", "legs": results}))
        r1, r10 = results
        print(
            f"merge time ratio at 10x table: "
            f"{r10['merge_s'] / max(r1['merge_s'], 1e-9):.2f}x; "
            f"files rewritten {r1['files_rewritten']} -> "
            f"{r10['files_rewritten']}; "
            f"1% read touched {r1['read_1pct_files_touched']}/"
            f"{r1['table_files']} -> {r10['read_1pct_files_touched']}/"
            f"{r10['table_files']} files"
        )
    finally:
        shutil.rmtree(d, ignore_errors=True)


if __name__ == "__main__":
    main()
