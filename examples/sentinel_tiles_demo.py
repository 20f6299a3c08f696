#!/usr/bin/env python
"""Worked example: the sentinel tile-preparation chain, Spark-first.

Mirrors the reference's preprocessing assets
(`assets/sentinel/preprocessing.py`): a synthetic band mosaic is
retiled with overlap, all-nodata tiles are dropped, and every
surviving tile is exported IN PARALLEL as a real COG (tiled layout +
overview chain + DEFLATE + md5 naming) with a relational manifest —
where the reference loops `gdal_retile.py` / `gdal_translate -of COG`
on one machine, each tile here is one Spark task.

    python examples/sentinel_tiles_demo.py
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from pyspark.sql import functions as F

from data_pipelines_spark.operators.tiles import (
    drop_empty_tiles,
    export_tiles_cog,
    retile_with_overlap,
)
from data_pipelines_spark.session import get_spark
from data_pipelines_spark.sources.raster import read_tiff_minimal


def main() -> None:
    spark = get_spark(app_name="sentinel-tiles-demo")
    spark.sparkContext.setLogLevel("ERROR")
    nodata = -32768.0

    # Synthetic mosaic: a 200x120 band with a nodata hole (the swath
    # edge) — built relationally, as the ingested band table would be.
    rng = np.random.default_rng(7)
    vals = rng.integers(0, 10000, size=(120, 200)).astype("f8")
    vals[:, 160:] = nodata  # right edge: no coverage
    rows = [
        (int(x), int(y), float(vals[y, x]))
        for y in range(120)
        for x in range(200)
    ]
    mosaic = spark.createDataFrame(rows, "x long, y long, value double")

    tiled = retile_with_overlap(mosaic, tile_size=64, overlap=8)
    kept = drop_empty_tiles(tiled, "value", nodata)

    with tempfile.TemporaryDirectory(prefix="sentinel_tiles_") as out:
        manifest = export_tiles_cog(
            kept, out, tile_size=64, overlap=8,
            value_col="value", nodata=nodata,
            overviews=(2, 4), cog_tile=(32, 32),
        ).orderBy("tile_x", "tile_y")
        manifest.select(
            "tile_x", "tile_y", "n_px", "n_valid", "n_bytes", "content_md5"
        ).show(truncate=False)

        first = manifest.first()
        arr, xs, ys = read_tiff_minimal(first.path)
        ov, _, _ = read_tiff_minimal(first.path, overview=1)
        print(
            f"tile ({first.tile_x},{first.tile_y}): {arr.shape} full, "
            f"{ov.shape} overview, {first.n_bytes} bytes on disk"
        )
        n_dropped = (
            tiled.select("tile_x", "tile_y").distinct().count()
            - manifest.count()
        )
        print(f"dropped {n_dropped} all-nodata tiles")

        # Upscale stage (reference upscaling.py): one model task per
        # tile; the stub doubles resolution, a real SR model plugs in
        # via the same factory contract.
        from data_pipelines_spark.operators.tiles import upscale_tiles

        up_dir = os.path.join(out, "upscaled")
        os.makedirs(up_dir, exist_ok=True)
        up = upscale_tiles(manifest, up_dir).first()
        up_arr, _, _ = read_tiff_minimal(up.upscaled_path)
        print(
            f"upscaled tile ({up.tile_x},{up.tile_y}): "
            f"{arr.shape} -> {up_arr.shape}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
