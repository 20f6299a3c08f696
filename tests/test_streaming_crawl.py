"""Streaming crawl ingest (`streaming/crawl.py`): manifest-driven WARC
ingestion end to end — two arrival waves, extraction fused, replay
idempotence at rest, comment/blank manifest lines."""

import os

from data_pipelines_spark.sources.warc import (
    encode_http_response,
    encode_warc_record,
    write_warc,
)
from data_pipelines_spark.streaming.crawl import (
    read_path_manifest_stream,
    stream_warc_ingest,
)


def _warc_file(path: str, keys: list[int]) -> None:
    recs = []
    for k in keys:
        html = (
            f"<html><head><title>T{k}</title></head>"
            f"<body><p>body {k}</p></body></html>"
        )
        recs.append(
            encode_warc_record(
                "response",
                encode_http_response(html.encode()),
                record_id=f"r-{k}",
                target_uri=f"http://ex.org/p{k}",
                content_type="application/http; msgtype=response",
            )
        )
    write_warc(path, recs, gzip_members=True)


def _run_wave(spark, manifest_dir, store, ckpt) -> None:
    stream = read_path_manifest_stream(spark, manifest_dir)
    q = stream_warc_ingest(
        stream, store, checkpoint=ckpt, available_now=True
    ).start()
    q.awaitTermination(120)


def test_stream_warc_ingest_waves_and_extraction(spark, tmp_path):
    warc_dir = tmp_path / "warcs"
    manifest = tmp_path / "manifest"
    store = str(tmp_path / "store")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(warc_dir)
    os.makedirs(manifest)

    # wave 1: two files via one manifest entry each (+ comment noise)
    _warc_file(str(warc_dir / "a.warc.gz"), [1, 2])
    _warc_file(str(warc_dir / "b.warc.gz"), [3])
    (manifest / "m1.txt").write_text(
        f"# arrivals\n{warc_dir}/a.warc.gz\n\n{warc_dir}/b.warc.gz\n"
    )
    _run_wave(spark, str(manifest), store, ckpt)

    out = spark.read.parquet(store)
    rows = {r["target_uri"]: r for r in out.collect()}
    assert set(rows) == {f"http://ex.org/p{k}" for k in (1, 2, 3)}
    r1 = rows["http://ex.org/p1"]
    assert r1["extracted_text"] == "T1\nbody 1"
    assert r1["title"] == "T1"
    assert r1["batch_id"] == 0

    # wave 2: a later manifest file lands a new batch partition; the
    # checkpoint ensures wave-1 files are NOT re-read
    _warc_file(str(warc_dir / "c.warc.gz"), [4])
    (manifest / "m2.txt").write_text(f"{warc_dir}/c.warc.gz\n")
    _run_wave(spark, str(manifest), store, ckpt)

    out2 = spark.read.parquet(store)
    assert out2.count() == 4
    got = {r["target_uri"]: r["batch_id"] for r in out2.collect()}
    assert got["http://ex.org/p4"] == 1
    assert {v for k, v in got.items() if k != "http://ex.org/p4"} == {0}

    # replay idempotence AT REST: simulate a batch replay by rewriting
    # batch 1's partition through the same write mode — row count holds
    from pyspark.sql import functions as F

    replay = out2.where(F.col("batch_id") == 1).drop("batch_id")
    (
        replay.withColumn("batch_id", F.lit(1).cast("long"))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch_id")
        .parquet(store)
    )
    assert spark.read.parquet(store).count() == 4
