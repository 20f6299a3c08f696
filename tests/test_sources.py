"""Ingestion-boundary tests: grid flattening, partitioned sinks with
pruning, import-gated codec readers."""

from __future__ import annotations

import os
import shutil
import tempfile

import numpy as np
import pytest

from pyspark.sql import functions as F

from data_pipelines_spark.sources.raster import (
    grid_to_long_form,
    read_geotiff,
    write_partitioned,
)


def test_grid_to_long_form_flattens_and_drops_nan(spark):
    values = np.array(
        [
            [[1.0, np.nan], [3.0, 4.0]],   # member 0
            [[5.0, 6.0], [np.nan, 8.0]],   # member 1
        ]
    )
    coords = {
        "number": np.array([0, 1]),
        "latitude": np.array([10.025, 9.975]),
        "longitude": np.array([20.025, 20.075]),
    }
    df = grid_to_long_form(spark, values, coords)
    rows = {(r["number"], r["latitude"], r["longitude"]): r["dis24"] for r in df.collect()}
    assert len(rows) == 6  # two NaN cells dropped
    assert rows[(0, 10.025, 20.025)] == 1.0
    assert rows[(1, 9.975, 20.075)] == 8.0
    assert (0, 10.025, 20.075) not in rows


def test_grid_to_long_form_shape_mismatch(spark):
    with pytest.raises(ValueError, match="do not match"):
        grid_to_long_form(
            spark, np.zeros((2, 3)), {"a": np.arange(2), "b": np.arange(4)}
        )


def test_write_partitioned_and_partition_pruning(spark):
    tmp = tempfile.mkdtemp(prefix="dps_sink_")
    try:
        df = spark.range(100).select(
            F.col("id"),
            (F.col("id") % 4).alias("leadtime_hour"),
            (F.col("id") * 2.0).alias("value"),
        )
        write_partitioned(df, f"{tmp}/t", ["leadtime_hour"])
        # partition dirs exist (Hive layout)
        assert sorted(
            d for d in os.listdir(f"{tmp}/t") if d.startswith("leadtime_hour=")
        ) == [f"leadtime_hour={i}" for i in range(4)]

        back = spark.read.parquet(f"{tmp}/t").where(F.col("leadtime_hour") == 2)
        assert back.count() == 25
        # pruning: only one of four partitions is scanned
        plan = back._jdf.queryExecution().executedPlan().toString()
        assert "PartitionFilters: [isnotnull(leadtime_hour" in plan
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_codec_readers_gated(spark):
    """Without codec libs the readers raise NotImplementedError with an
    actionable message instead of crashing at import time."""
    try:
        import rasterio  # noqa: F401

        pytest.skip("rasterio installed; gate not exercised")
    except ImportError:
        pass
    with pytest.raises(NotImplementedError, match="rasterio"):
        read_geotiff(spark, "/nonexistent.tif")


def test_json_manifest_roundtrip(spark):
    """S8: JSON manifest write/read (reference io_managers.py:226-236)."""
    import json

    tmp = tempfile.mkdtemp(prefix="dps_json_")
    try:
        manifest = [
            {"tile": "10N_020W", "files": 3, "done": True},
            {"tile": "00N_010E", "files": 5, "done": False},
        ]
        with open(f"{tmp}/manifest.json", "w") as f:
            for rec in manifest:
                f.write(json.dumps(rec) + "\n")
        df = spark.read.json(f"{tmp}/manifest.json")
        got = {r["tile"]: (r["files"], r["done"]) for r in df.collect()}
        assert got == {"10N_020W": (3, True), "00N_010E": (5, False)}
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
