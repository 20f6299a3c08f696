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


def read_geotiff(
    spark: SparkSession, path: str, value_col: str = "value"
):
    """GeoTIFF/COG → long-form (x, y, value) (reference S6,
    `io_managers.py:108-110`)."""
    try:
        import rasterio
    except ImportError as e:  # pragma: no cover
        raise NotImplementedError(
            "GeoTIFF ingestion requires rasterio; convert externally"
        ) from e
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
