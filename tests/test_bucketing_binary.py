"""Scale-mechanism tests: bucketed co-located joins (no shuffle) and
binaryFile blob ingestion (sentinel-pipeline shape)."""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest

from pyspark.sql import functions as F

from data_pipelines_spark.operators.multimodal import (
    extract_features,
    read_binary_dir,
)


def test_bucketed_join_has_no_shuffle(spark):
    """Pre-bucketed tables on the join key join WITHOUT an exchange —
    the co-located join strategy ARCHITECTURE.md prescribes for
    repeated large-fact joins (reference's dask equivalent is manual
    subarea partitioning)."""
    tmp = tempfile.mkdtemp(prefix="dps_bucket_")
    old_warehouse = spark.conf.get("spark.sql.warehouse.dir", None)
    try:
        fact = spark.range(10_000).select(
            F.col("id").alias("k"), (F.col("id") % 97).alias("v")
        )
        dim = spark.range(10_000).select(
            F.col("id").alias("k"), (F.col("id") % 7).alias("grp")
        )
        fact.write.bucketBy(8, "k").sortBy("k").mode("overwrite").option(
            "path", f"{tmp}/fact"
        ).saveAsTable("bkt_fact")
        dim.write.bucketBy(8, "k").sortBy("k").mode("overwrite").option(
            "path", f"{tmp}/dim"
        ).saveAsTable("bkt_dim")

        # disable auto-broadcast so the join would otherwise shuffle
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = spark.table("bkt_fact").join(spark.table("bkt_dim"), "k")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, "bucketed join must not shuffle"
        assert joined.count() == 10_000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        spark.sql("DROP TABLE IF EXISTS bkt_fact")
        spark.sql("DROP TABLE IF EXISTS bkt_dim")
        shutil.rmtree(tmp, ignore_errors=True)


def test_binary_file_ingestion_to_features(spark):
    """Sentinel-shaped blob pipeline: directory of opaque files →
    binaryFile source → media frame → Arrow-batched feature extraction
    (reference raw_ingest + preprocessing chain, SURVEY.md §3.3)."""
    tmp = tempfile.mkdtemp(prefix="dps_blob_")
    try:
        payloads = {"a.bin": b"\x01\x02\x03\x04" * 10, "b.bin": b"\xff" * 7}
        for name, data in payloads.items():
            with open(os.path.join(tmp, name), "wb") as f:
                f.write(data)

        raw = read_binary_dir(spark, tmp, glob="*.bin")
        assert raw.count() == 2
        media = raw.select(
            F.monotonically_increasing_id().alias("media_id"),
            F.lit("image").alias("kind"),
            F.col("content"),
            F.element_at(F.split(F.col("path"), r"\."), -1).alias("format"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.col("length").alias("n_bytes"),
        )
        feats = extract_features(media, dim=4).collect()
        assert len(feats) == 2
        assert all(len(r["feature"]) == 4 for r in feats)
        by_bytes = {r["n_bytes"]: r["feature"] for r in feats}
        assert by_bytes[7] == [255.0 * 2 / 7, 255.0 * 2 / 7, 255.0 * 2 / 7, 255.0 / 7]
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
