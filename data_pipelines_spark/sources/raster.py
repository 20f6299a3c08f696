"""Raster → long-form ingestion (the engine's non-tabular boundary).

The reference ingests GRIB ensembles, NetCDF grids, and GeoTIFF/COG
rasters with xarray/rioxarray (`resources/io_managers.py:103-223`) and
immediately flattens them to tabular form for analytics
(`utils/flood/raster_converter.py:40-77`). This engine keeps that
boundary explicit: ingestion happens OUTSIDE the relational core, here,
producing long-form DataFrames; the engine contract starts at parquet
(SURVEY.md §7.4).

The codec libraries (cfgrib/h5netcdf/rasterio) are not available in
this environment, so the file readers are import-gated; the array →
long-form conversion itself (`grid_to_long_form`) is pure
numpy/Arrow and fully tested. At scale, ingestion parallelizes per
*file* (one task per GRIB/tile via `operators/taskmap.py`), each task
writing one partition of the long-form parquet dataset — Spark then
reads the directory as one table with partition pruning.
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import DataFrame, SparkSession


def grid_to_long_form(
    spark: SparkSession,
    values: np.ndarray,
    coords: dict[str, np.ndarray],
    value_col: str = "dis24",
    drop_nan: bool = True,
) -> DataFrame:
    """Flatten an N-D grid to one row per cell (reference
    `raster_converter.py:40-77`).

    ``values``: N-D array. ``coords``: ordered {dim_name: 1-D coords}
    matching values.shape. NaN cells are dropped (reference P5,
    `raster_converter.py:33-34`). Data transfers via Arrow in columnar
    batches — no Python row loop.
    """
    import pandas as pd

    if tuple(len(c) for c in coords.values()) != values.shape:
        raise ValueError(
            f"coords {tuple(len(c) for c in coords.values())} do not match "
            f"values shape {values.shape}"
        )
    mesh = np.meshgrid(*coords.values(), indexing="ij")
    flat = {name: m.ravel() for name, m in zip(coords.keys(), mesh)}
    flat[value_col] = values.ravel()
    pdf = pd.DataFrame(flat)
    if drop_nan:
        pdf = pdf[~np.isnan(pdf[value_col])]
    return spark.createDataFrame(pdf)


def read_grib_ensemble(
    spark: SparkSession,
    path: str,
    value_var: str = "dis24",
    use_control_member: bool = True,
):
    """GRIB ensemble → long-form DataFrame (reference S4,
    `io_managers.py:193-210`: opens control (`cf`) and perturbed (`pf`)
    datasets and concatenates along the member axis).

    Requires cfgrib/xarray — not installed here; the conversion path it
    feeds (`grid_to_long_form`) is fully tested without them.
    """
    try:
        import xarray as xr  # noqa: F401
    except ImportError as e:  # pragma: no cover - env without codecs
        raise NotImplementedError(
            "GRIB ingestion requires xarray+cfgrib; convert externally to "
            "parquet or install the codecs"
        ) from e
    datasets = []
    kinds = (["cf", "pf"] if use_control_member else ["pf"])
    for kind in kinds:  # pragma: no cover - env without codecs
        ds = xr.open_dataset(
            path, engine="cfgrib",
            backend_kwargs={"filter_by_keys": {"dataType": kind}},
        )
        datasets.append(ds)
    merged = xr.concat(datasets, dim="number")  # pragma: no cover
    da = merged[value_var]  # pragma: no cover
    return grid_to_long_form(  # pragma: no cover
        spark,
        da.values,
        {d: merged[d].values for d in da.dims},
        value_col=value_var,
    )


def read_netcdf_grid(
    spark: SparkSession, path: str, value_var: str
):
    """NetCDF grid → long-form (reference S5, `io_managers.py:222-223`)."""
    try:
        import xarray as xr
    except ImportError as e:  # pragma: no cover
        raise NotImplementedError(
            "NetCDF ingestion requires xarray+h5netcdf"
        ) from e
    ds = xr.open_dataset(path)  # pragma: no cover
    da = ds[value_var]  # pragma: no cover
    return grid_to_long_form(  # pragma: no cover
        spark, da.values, {d: ds[d].values for d in da.dims}, value_col=value_var
    )


_TIFF_DTYPES = {
    # (SampleFormat, BitsPerSample) -> numpy dtype char
    (1, 8): "u1", (1, 16): "u2", (1, 32): "u4",
    (2, 8): "i1", (2, 16): "i2", (2, 32): "i4",
    (3, 32): "f4", (3, 64): "f8",
}


def read_tiff_minimal(path: str) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Baseline single-band uncompressed (Geo)TIFF → (array, xs, ys).

    A dependency-free reader for the simplest profile GDAL emits
    (`gdal_translate -co COMPRESS=NONE`): classic TIFF, one band,
    strip-organized, Compression=1. Parses the IFD directly with
    struct/numpy and applies the GeoTIFF ModelPixelScale/ModelTiepoint
    tags for cell-center coordinates. Anything fancier (tiles,
    compression, BigTIFF) raises with a pointer to the rasterio path —
    this is the smoke-proof that S6 ingestion runs end-to-end, not a
    GDAL replacement.
    """
    import struct

    with open(path, "rb") as f:
        data = f.read()
    if data[:2] == b"II":
        e = "<"
    elif data[:2] == b"MM":
        e = ">"
    else:
        raise ValueError("not a TIFF file")
    magic, ifd_off = struct.unpack(e + "HI", data[2:8])
    if magic != 42:
        raise ValueError("not a classic TIFF (BigTIFF unsupported)")

    (n_entries,) = struct.unpack(e + "H", data[ifd_off : ifd_off + 2])
    tags: dict[int, tuple[int, int, bytes]] = {}
    type_size = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 11: 4, 12: 8}
    for i in range(n_entries):
        off = ifd_off + 2 + i * 12
        tag, typ, cnt = struct.unpack(e + "HHI", data[off : off + 8])
        size = type_size.get(typ, 1) * cnt
        raw = (
            data[off + 8 : off + 8 + size]
            if size <= 4
            else data[
                struct.unpack(e + "I", data[off + 8 : off + 12])[0] :
            ][:size]
        )
        tags[tag] = (typ, cnt, raw)

    def ints(tag: int, default=None):
        if tag not in tags:
            return default
        typ, cnt, raw = tags[tag]
        fmt = {3: "H", 4: "I"}[typ]
        return list(struct.unpack(e + fmt * cnt, raw))

    def doubles(tag: int):
        if tag not in tags:
            return None
        _, cnt, raw = tags[tag]
        return list(struct.unpack(e + "d" * cnt, raw))

    width, height = ints(256)[0], ints(257)[0]
    bits = ints(258, [32])[0]
    compression = ints(259, [1])[0]
    if compression != 1:
        raise NotImplementedError(
            "compressed TIFF: use the rasterio path or re-emit with "
            "COMPRESS=NONE"
        )
    samples = ints(277, [1])[0]
    if samples != 1:
        raise NotImplementedError("multi-band TIFF: use the rasterio path")
    sample_format = ints(339, [1])[0]
    dt = np.dtype(e + _TIFF_DTYPES[(sample_format, bits)])
    offsets = ints(273)
    counts = ints(279)
    raster = np.frombuffer(
        b"".join(data[o : o + c] for o, c in zip(offsets, counts)), dtype=dt
    ).reshape(height, width)

    scale = doubles(33550) or [1.0, 1.0, 0.0]
    tie = doubles(33922) or [0.0, 0.0, 0.0, 0.0, 0.0, 0.0]
    # GDAL geotransform from the GeoTIFF tags (north-up): origin at the
    # tiepoint, y decreasing.
    xs = tie[3] + np.arange(width) * scale[0]
    ys = tie[4] - np.arange(height) * scale[1]
    return raster.astype("float64"), xs, ys


def read_geotiff(
    spark: SparkSession, path: str, value_col: str = "value"
):
    """GeoTIFF/COG → long-form (x, y, value) (reference S6,
    `io_managers.py:108-110`).

    Prefers rasterio (full GDAL format coverage); without it, falls
    back to :func:`read_tiff_minimal` for baseline uncompressed
    single-band files — which keeps this reader genuinely runnable
    (and tested end-to-end) in codec-free environments."""
    try:
        import rasterio
    except ImportError:
        arr, xs, ys = read_tiff_minimal(path)
        return grid_to_long_form(
            spark, arr, {"y": ys, "x": xs}, value_col=value_col
        )
    with rasterio.open(path) as src:  # pragma: no cover
        arr = src.read(1).astype("float64")
        xs = np.arange(src.width) * src.transform.a + src.transform.c
        ys = np.arange(src.height) * src.transform.e + src.transform.f
    return grid_to_long_form(  # pragma: no cover
        spark, arr, {"y": ys, "x": xs}, value_col=value_col
    )


def write_partitioned(
    df: DataFrame, path: str, partition_cols: list[str], mode: str = "overwrite"
) -> None:
    """Hive-style partitioned parquet sink (reference D4/S3: per-
    partition-key independent materialization, `partitions.py:3-53`).
    Readers filtering on the partition columns get partition pruning."""
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)
