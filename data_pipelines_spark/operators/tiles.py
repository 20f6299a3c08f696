"""Mosaic retiling with overlap + per-tile COG export — the sentinel
preprocessing chain, Spark-first.

The reference's imagery pipeline shells out to GDAL in a driver loop
(`/root/reference/data_pipelines/assets/sentinel/preprocessing.py`):
`gdal_retile.py -ps <tilesize> -overlap 86` cuts the mosaic into
overlapping tiles (:103-133), all-nodata tiles are dropped (:136-159),
and each survivor becomes a COG named by the md5 of its source tile
(:163-199). Re-expressed on the relational core:

- :func:`retile_with_overlap` — each pixel row is exploded to every
  tile whose (tile_size, overlap) window covers it. A pixel belongs to
  tile ``t`` on an axis iff ``t*ts - ov <= x <= (t+1)*ts - 1 + ov``,
  i.e. ``t ∈ [floor((x-ov)/ts), floor((x+ov)/ts)]`` — pure per-row
  arithmetic, no join, fan-out factor ``(1 + 2*ov/ts)^2`` (~1.03 for
  the reference's 86/10008 geometry). Catalyst keeps it a narrow map.
- :func:`drop_empty_tiles` — the all-nodata filter as an aggregate
  semi-join: keep tiles where at least one covered pixel is valid.
- :func:`export_tiles_cog` — one applyInPandas task per tile densifies
  its pixel halo into an array and writes a real COG via
  `sources/raster_encode.encode_geotiff` (tiled layout, overview
  chain, DEFLATE), returning a relational manifest (tile key, path,
  md5, sizes). Where the reference runs `gdal_translate -of COG` one
  file at a time on the driver, this exports every tile in parallel —
  the 100 TB shape: the mosaic never assembles in one place; each
  task sees only its tile's rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _tile_range(col: Column, tile_size: int, overlap: int) -> Column:
    lo = F.floor((col - overlap) / F.lit(tile_size)).cast("long")
    hi = F.floor((col + overlap) / F.lit(tile_size)).cast("long")
    return F.sequence(lo, hi)


def retile_with_overlap(
    df: DataFrame,
    tile_size: int,
    overlap: int = 0,
    x_col: str = "x",
    y_col: str = "y",
) -> DataFrame:
    """Assign every pixel row to each overlapping tile it falls in,
    adding ``tile_x``/``tile_y``. Integer pixel coordinates; tile
    ``(tx, ty)`` covers ``[t*ts - ov, (t+1)*ts - 1 + ov]`` per axis
    (reference `gdal_retile.py -overlap` semantics: interior pixels
    within ``overlap`` of a tile edge appear in both neighbors).
    """
    if tile_size <= 0:
        raise ValueError(f"tile_size must be positive, got {tile_size}")
    if not 0 <= overlap < tile_size:
        raise ValueError(
            f"overlap must be in [0, tile_size), got {overlap}"
        )
    return (
        df.withColumn(
            "tile_x", F.explode(_tile_range(F.col(x_col), tile_size, overlap))
        )
        .withColumn(
            "tile_y", F.explode(_tile_range(F.col(y_col), tile_size, overlap))
        )
    )


def drop_empty_tiles(
    tiled: DataFrame,
    value_col: str,
    nodata: float,
) -> DataFrame:
    """Drop tiles whose every covered pixel equals ``nodata`` (the
    reference's `preprocess_filter_nodata`, :136-159 — there a full
    read of each tile on the driver; here one aggregate + semi-join).
    """
    keep = (
        tiled.groupBy("tile_x", "tile_y")
        .agg(
            F.max(
                (F.col(value_col) != F.lit(nodata)).cast("int")
            ).alias("any_valid")
        )
        .where(F.col("any_valid") == 1)
        .select("tile_x", "tile_y")
    )
    return tiled.join(keep, ["tile_x", "tile_y"], "left_semi")


def export_tiles_cog(
    tiled: DataFrame,
    out_dir: str,
    tile_size: int,
    overlap: int = 0,
    x_col: str = "x",
    y_col: str = "y",
    value_col: str = "value",
    nodata: float = -32768.0,
    pixel_w: float = 1.0,
    pixel_h: float = 1.0,
    overviews: tuple[int, ...] = (2,),
    cog_tile: tuple[int, int] = (256, 256),
    epsg: int | None = None,
) -> DataFrame:
    """Write one COG per tile, in parallel, and return the manifest.

    One applyInPandas task per (tile_x, tile_y): the task densifies its
    pixel rows (including the overlap halo) into a
    ``(tile_size + 2*overlap)``-square int32 array with ``nodata``
    fill, encodes a tiled+overviewed+DEFLATE GeoTIFF, and writes it to
    ``out_dir`` under the md5 of the tile key (the reference names
    uploads by content-path md5, `preprocessing.py:181`). Output: one
    manifest row per tile — (tile_x, tile_y, path, n_px, n_valid,
    n_bytes, content_md5) — which downstream bookkeeping joins
    relationally, like the reference's returned s3 path list.

    ``out_dir`` must be visible to the executors (shared filesystem or
    an object-store mount); at scale each task uploads its own tile,
    so the mosaic never funnels through the driver.
    """
    import hashlib
    import os

    import numpy as np
    import pandas as pd

    from data_pipelines_spark.sources.raster_encode import encode_geotiff

    span = tile_size + 2 * overlap

    def write_tile(key, pdf: pd.DataFrame):
        tx, ty = int(key[0]), int(key[1])
        x0 = tx * tile_size - overlap
        y0 = ty * tile_size - overlap
        arr = np.full((span, span), nodata, dtype="<i4")
        xs = pdf[x_col].to_numpy(dtype="int64") - x0
        ys = pdf[y_col].to_numpy(dtype="int64") - y0
        vals = pdf[value_col].to_numpy()
        ok = (xs >= 0) & (xs < span) & (ys >= 0) & (ys < span)
        arr[ys[ok], xs[ok]] = vals[ok].astype("<i4")
        blob = encode_geotiff(
            arr,
            origin_x=float(x0) * pixel_w,
            origin_y=-float(y0) * pixel_h,
            pixel_w=pixel_w,
            pixel_h=pixel_h,
            tile=cog_tile if span >= cog_tile[0] else None,
            overviews=overviews,
            compression="deflate",
            predictor=True,
            epsg=epsg,
        )
        name = hashlib.md5(f"tile_{tx}_{ty}".encode()).hexdigest()
        path = os.path.join(out_dir, f"{name}.tif")
        with open(path, "wb") as f:
            f.write(blob)
        return pd.DataFrame(
            {
                "tile_x": [tx],
                "tile_y": [ty],
                "path": [path],
                "n_px": [len(pdf)],
                "n_valid": [int((vals != nodata).sum())],
                "n_bytes": [len(blob)],
                "content_md5": [hashlib.md5(blob).hexdigest()],
            }
        )

    return tiled.groupBy("tile_x", "tile_y").applyInPandas(
        write_tile,
        "tile_x long, tile_y long, path string, n_px long, "
        "n_valid long, n_bytes long, content_md5 string",
    )


def build_pyramid(
    df: DataFrame,
    levels: int,
    x_col: str = "x",
    y_col: str = "y",
    value_col: str = "value",
) -> DataFrame:
    """Reduced-resolution pyramid (the reference's
    `gdal_retile.py -levels 11` serving pyramid,
    `assets/sentinel/postprocessing.py:56-71`): level ``l`` buckets
    pixels at ``floor(coord / 2^l)`` with the value SUM and pixel
    COUNT per bucket (mean = val_sum / px_cnt downstream — kept as
    two exact columns so levels merge associatively).

    Built ITERATIVELY — each level aggregates the PREVIOUS level, not
    the base — so the work is a log-depth chain of 4x-shrinking
    groupBys instead of ``levels`` full scans of the base table: at
    100 TB the base is touched once, and every later level runs on a
    quarter of the previous one. Output: (level, x, y, val_sum,
    px_cnt); level 0 is the input aggregated to one row per pixel
    coordinate (overlapping source rows merge there, like a mosaic
    VRT resolves duplicate coverage).
    """
    if levels < 0:
        raise ValueError(f"levels must be >= 0, got {levels}")
    cur = (
        df.groupBy(
            F.col(x_col).cast("long").alias("x"),
            F.col(y_col).cast("long").alias("y"),
        )
        .agg(
            F.sum(value_col).alias("val_sum"),
            F.count(F.lit(1)).alias("px_cnt"),
        )
        .select(F.lit(0).alias("level"), "x", "y", "val_sum", "px_cnt")
    )
    out = cur
    for level in range(1, levels + 1):
        cur = (
            cur.groupBy(
                F.floor(F.col("x") / 2).cast("long").alias("x"),
                F.floor(F.col("y") / 2).cast("long").alias("y"),
            )
            .agg(
                F.sum("val_sum").alias("val_sum"),
                F.sum("px_cnt").alias("px_cnt"),
            )
            .select(
                F.lit(level).alias("level"), "x", "y", "val_sum", "px_cnt"
            )
        )
        out = out.unionByName(cur)
    return out


def upscale_tiles(
    manifest: DataFrame,
    out_dir: str,
    make_model=None,
    factor: int = 2,
    path_col: str = "path",
) -> DataFrame:
    """Upscale every tile in a COG manifest, one task per tile — the
    reference's GPU super-resolution asset
    (`assets/sentinel/upscaling.py:16-62`: list tiles → submit one
    Dask task per tile → model → write back → return paths),
    re-expressed over `operators/inference.batch_infer` so the model
    loads ONCE per partition and amortizes across that partition's
    tiles.

    ``make_model()`` must return ``model(arr: np.ndarray) ->
    np.ndarray`` mapping an (h, w) tile to (h*factor, w*factor). The
    default is a deterministic nearest-neighbor stub (the real
    sentinel2sr weights are a GPU package; the Spark-side plumbing —
    per-partition amortization, file IO on executors, manifest
    bookkeeping — is real and tested). Output: (tile_x, tile_y,
    upscaled_path); each upscaled tile is written as a COG with the
    pixel size divided by ``factor`` so world extents are preserved.
    """
    from data_pipelines_spark.operators.inference import batch_infer

    if factor < 1:
        raise ValueError(f"factor must be >= 1, got {factor}")

    def default_factory():
        import numpy as np

        def model(arr):
            return np.repeat(np.repeat(arr, factor, 0), factor, 1)

        return model

    inner_factory = make_model or default_factory

    def io_factory():
        import os

        from data_pipelines_spark.sources.raster import read_tiff_minimal
        from data_pipelines_spark.sources.raster_encode import encode_geotiff

        model = inner_factory()  # once per PARTITION

        def run(pdf):
            out = []
            for path in pdf.iloc[:, 0]:
                arr, xs, ys = read_tiff_minimal(path)
                up = model(arr)
                px_w = float(xs[1] - xs[0]) if len(xs) > 1 else 1.0
                px_h = float(ys[0] - ys[1]) if len(ys) > 1 else 1.0
                blob = encode_geotiff(
                    up.astype("<i4"),
                    origin_x=float(xs[0]),
                    origin_y=float(ys[0]),
                    pixel_w=px_w / factor,
                    pixel_h=px_h / factor,
                    tile=(256, 256) if up.shape[0] >= 256 else None,
                    overviews=(2,),
                    compression="deflate",
                    predictor=True,
                )
                dst = os.path.join(out_dir, os.path.basename(path))
                with open(dst, "wb") as f:
                    f.write(blob)
                out.append(dst)
            return out

        return run

    return batch_infer(
        manifest,
        io_factory,
        input_cols=[path_col],
        output_col="upscaled_path",
        output_type="string",
        keep_cols=["tile_x", "tile_y"],
    )
