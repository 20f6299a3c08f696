"""Continuous crawl ingestion: WARC files → the relational store as
they land.

A production crawl never arrives as one batch: `.warc.gz` files appear
continuously (object-store notifications / a manifest feed). The
streaming source here is a TEXT stream of file PATHS — one path per
line, the shape a notification relay or the crawler's own manifest
writer produces — because a WARC file itself is not a splittable
streaming format (gzip members per record, no line structure), while a
path manifest is exactly what Structured Streaming's file source
tracks incrementally and exactly-once.

Each micro-batch collects its (file-list-sized) path set, fans the
files out through the STREAMING WARC reader (`sources.warc.read_warc`:
one task per file, member-at-a-time decode), optionally extracts text
from HTML responses, and appends the rows under a ``batch_id=<n>``
partition — the same replay-idempotence contract as the sketch sinks
(`streaming/sketches.py`): foreachBatch is at-least-once, so a
replayed batch dynamically overwrites exactly its own partition and
the store stays exactly-once at rest. Downstream curation reads the
store as plain partitioned parquet.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_path_manifest_stream(
    spark: SparkSession, manifest_dir: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-source stream over a manifest directory: each arriving text
    file lists newly-landed WARC paths (one per line, ``#`` comments
    tolerated). Returns a stream of ``(warc_file string)`` rows."""
    reader = spark.readStream.format("text")
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    lines = reader.load(manifest_dir)
    return lines.select(
        F.trim(F.regexp_replace("value", r"#.*$", "")).alias("warc_file")
    ).where(F.col("warc_file") != "")


def stream_warc_ingest(
    stream_paths: DataFrame,
    store_path: str,
    record_types: tuple[str, ...] = ("response",),
    extract_text: bool = True,
    checkpoint: str | None = None,
    available_now: bool = True,
):
    """foreachBatch sink: read each micro-batch's WARC files and land
    the records under ``batch_id=<n>`` in ``store_path``.

    - Rows carry WARC_READ_SCHEMA plus (when ``extract_text`` and the
      payload is HTML) ``extracted_text`` / ``title`` from the native
      extraction chain — the WET conversion fused into ingest.
    - The per-batch path list is collected driver-side: it is
      manifest-sized (one row per FILE, ~100k rows for a full monthly
      crawl), never record-sized.
    - A batch whose files are missing/corrupt RAISES (the loud-failure
      read contract); the checkpoint retries the batch, which is the
      recovery path — a half-ingested batch partition is simply
      overwritten on the retry.

    Returns the un-started ``DataStreamWriter``.

    Hash-checked end-to-end by the ``stream_warc`` tier of
    `suite.maintenance.fetch_task_suite`: an availableNow manifest
    stream over the suite's WARC fixtures must land byte-identical
    extraction aggregates to the batch `read_warc` of the same files.
    """
    from data_pipelines_spark.functions.web import extract_title, html_to_text
    from data_pipelines_spark.sources.warc import read_warc

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        paths = [r["warc_file"] for r in batch_df.collect()]  # file-list
        if not paths:
            return
        spark = batch_df.sparkSession
        recs = read_warc(spark, paths, record_types=record_types)
        if extract_text:
            is_html = F.col("http_content_type").contains("text/html")
            recs = recs.withColumn(
                "extracted_text",
                F.when(is_html, html_to_text(F.col("text"))),
            ).withColumn(
                "title", F.when(is_html, extract_title(F.col("text")))
            )
        (
            recs.withColumn("batch_id", F.lit(int(batch_id)).cast("long"))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(store_path)
        )

    writer = (
        stream_paths.writeStream.foreachBatch(_apply).outputMode("append")
    )
    if checkpoint is not None:
        writer = writer.option("checkpointLocation", checkpoint)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer
