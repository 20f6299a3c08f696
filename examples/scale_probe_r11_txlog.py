"""Round-11 scale probes: streaming txsink MERGE at 10x (two axes),
bin-packing compaction cost vs table size, and the streaming change
feed at 10x churn.

Protocol (VERDICT r10 #7 + #3): fixed clustered CDC micro-batches
through `stream_txlog_sink(mode="merge")` into a key-clustered txlog
table; scale the TABLE 10x with fixed batches, then the BATCH VOLUME
10x with a fixed table. Done = wall-time band and files_rewritten
flatness. Batches are key-clustered (contiguous ~1% key windows) — the
shape footer-stats pruning exists for; scattered-key batches match
every file by construction (no layout can prune a scatter), which the
first probe attempt demonstrated and NOTES_r11 §7 records.

Run:  PYTHONPATH=. python examples/scale_probe_r11_txlog.py

Representative output (local[32], this environment):
  merge A-1x-table:  keys=200000  wall=7.7s  files_rewritten=[1,1,1,1,2]
  merge A-10x-table: keys=2000000 wall=5.9s  files_rewritten=[1,1,1,1,2]
  merge B-10x-vol:   5000 rows/b  wall=6.0s  (1.04x of 500 rows/b)
  compact 1x/10x:    44->2 files 0.58s / 44->5 files 0.37s (flat)
"""

from __future__ import annotations

import os
import random
import shutil
import tempfile
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from data_pipelines_spark.sources import txlog
from data_pipelines_spark.streaming.txsink import stream_txlog_sink


def _mk_manifests(d, n_batches, rows_per_batch, key_space):
    os.makedirs(d, exist_ok=True)
    rnd = random.Random(42)
    window = max(rows_per_batch, key_space // 100)
    for b in range(n_batches):
        lo = (b * window) % max(1, key_space - window)
        lines = [
            f"{lo + rnd.randrange(window)},b{b}r{j},{b}"
            for j in range(rows_per_batch)
        ]
        tmp = os.path.join(d, f".w{b}.tmp")
        with open(tmp, "w") as fh:
            fh.write("\n".join(lines) + "\n")
        os.replace(tmp, os.path.join(d, f"w{b}.txt"))


def _stream_df(spark, src):
    return (
        spark.readStream.format("text")
        .option("maxFilesPerTrigger", 1)
        .load(src)
        .select(
            F.split("value", ",")[0].cast("long").alias("k"),
            F.split("value", ",")[1].alias("v"),
            F.split("value", ",")[2].cast("long").alias("ver"),
        )
    )


def merge_probe(spark, tag, key_space, rows_per_batch, n_batches=5):
    d = tempfile.mkdtemp()
    table, src, ck = (os.path.join(d, n) for n in ("t", "src", "ck"))
    base = spark.range(key_space).select(
        F.col("id").alias("k"),
        F.lit("base").alias("v"),
        F.lit(-1).cast("long").alias("ver"),
    )
    txlog.create_table(spark, base, table, key_cols=["k"], num_files=20)
    _mk_manifests(src, n_batches, rows_per_batch, key_space)
    t0 = time.monotonic()
    q = stream_txlog_sink(
        _stream_df(spark, src), table, app_id="p", mode="merge",
        version_col="ver", checkpoint=ck,
    ).start()
    q.awaitTermination(600)
    wall = time.monotonic() - t0
    merges = [h for h in txlog.table_history(table) if h["op"] == "merge"]
    print(
        f"merge {tag}: keys={key_space} rows/batch={rows_per_batch} "
        f"wall={wall:.2f}s "
        f"files_rewritten={[h['files_removed'] for h in merges]} "
        f"rows={txlog.read_table(spark, table).count()}"
    )
    shutil.rmtree(d, ignore_errors=True)
    return wall


def compact_probe(spark, tag, big_rows):
    d = tempfile.mkdtemp()
    table = os.path.join(d, "t")
    base = spark.range(big_rows).select(
        F.col("id").alias("k"), F.lit("x").alias("v")
    )
    txlog.create_table(spark, base, table, key_cols=["k"], num_files=4)
    for i in range(40):
        txlog.append_table(
            spark,
            spark.createDataFrame(
                [(big_rows + 100 * i + j, "s") for j in range(100)],
                "k long, v string",
            ),
            table,
        )
    t0 = time.monotonic()
    rep = txlog.compact_table(
        spark, table, target_file_rows=200_000, min_file_rows=100_000
    )
    wall = time.monotonic() - t0
    print(
        f"compact {tag}: big_rows={big_rows} "
        f"files {rep['files_before']}->{rep['files_after']} wall={wall:.2f}s"
    )
    shutil.rmtree(d, ignore_errors=True)
    return wall


def cdc_probe(spark, tag, churn_rows):
    """Drain the readChangeFeed stream over a table whose single merge
    commit churned `churn_rows` rows — CDC cost rides the churn."""
    from data_pipelines_spark.sources.txlog_datasource import (
        register_txlog_source,
    )

    register_txlog_source(spark)
    d = tempfile.mkdtemp()
    table, ck, out = (os.path.join(d, n) for n in ("t", "ck", "out"))
    base = spark.range(churn_rows * 10).select(
        F.col("id").alias("k"), F.lit("base").alias("v")
    )
    txlog.create_table(spark, base, table, key_cols=["k"], num_files=20)
    upd = spark.range(churn_rows).select(
        F.col("id").alias("k"), F.lit("upd").alias("v")
    )
    txlog.merge_upsert(spark, upd, table)
    t0 = time.monotonic()
    q = (
        spark.readStream.format("txlog").option("path", table)
        .option("readChangeFeed", "true")
        .option("startingVersion", "1")  # changes only, skip the snapshot
        .load()
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(600)
    wall = time.monotonic() - t0
    n = spark.read.parquet(out).count()
    print(f"cdc {tag}: churn={churn_rows} change_rows={n} wall={wall:.2f}s")
    shutil.rmtree(d, ignore_errors=True)
    return wall


if __name__ == "__main__":
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    w1 = merge_probe(spark, "A-1x-table", 200_000, 500)
    w2 = merge_probe(spark, "A-10x-table", 2_000_000, 500)
    print(f"A ratio (10x table, fixed clustered batches): {w2 / w1:.2f}x")
    w3 = merge_probe(spark, "B-1x-vol", 2_000_000, 500)
    w4 = merge_probe(spark, "B-10x-vol", 2_000_000, 5000)
    print(f"B ratio (10x batch volume, fixed table): {w4 / w3:.2f}x")
    c1 = compact_probe(spark, "1x", 300_000)
    c2 = compact_probe(spark, "10x", 3_000_000)
    print(f"C ratio (10x table, same small-file mass): {c2 / c1:.2f}x")
    d1 = cdc_probe(spark, "1x", 20_000)
    d2 = cdc_probe(spark, "10x", 200_000)
    print(f"D ratio (10x churn): {d2 / d1:.2f}x")
    spark.stop()
