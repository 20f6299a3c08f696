"""Ingestion-boundary robustness: every binary parser must fail
LOUDLY on truncated input — an exception, never a hang and never a
silently wrong array. Truncation points sit inside the payload region
(30% / 60% of the blob), where data is certainly gone.

At 100 TB these parsers run one-per-file inside task maps
(`operators/taskmap.py`), whose retry/failure accounting only works
if a bad object raises instead of producing plausible garbage.
"""

from __future__ import annotations

import os

import numpy as np
import pytest

from data_pipelines_spark.operators.jpeg import (
    decode_jpeg,
    encode_jpeg_baseline,
    encode_jpeg_progressive,
)
from data_pipelines_spark.operators.multimodal import (
    decode_png,
    decode_pnm,
    encode_pgm,
    encode_png,
)
from data_pipelines_spark.sources.raster import (
    read_grib_minimal,
    read_netcdf_minimal,
    read_tiff_minimal,
    read_zarr_minimal,
)
from data_pipelines_spark.sources.raster_encode import (
    encode_geotiff,
    encode_grib1,
    encode_grib2,
    encode_netcdf,
    write_zarr_store,
)

_RNG = np.random.default_rng(3)
_GRID = _RNG.integers(0, 4000, (40, 50)).astype("f8")


def _blob_cases():
    img8 = (_GRID % 256).astype("u1")
    tiff_kw = dict(origin_x=0.0, origin_y=0.0, pixel_w=1.0, pixel_h=1.0)
    grib_kw = dict(lat0=50.0, lon0=0.0, dlat=0.5, dlon=0.5)
    holes = _GRID.copy()
    holes[::7, ::5] = np.nan
    return [
        ("pnm", encode_pgm(img8)),
        ("png", encode_png(img8)),
        ("png_adam7", encode_png(img8, interlace=True)),
        ("jpeg", encode_jpeg_baseline(img8, quality_divisor=1)),
        ("jpeg_prog", encode_jpeg_progressive(img8, quality_divisor=1)),
        ("tiff", encode_geotiff(_GRID, compression="deflate",
                                predictor=True, tile=(16, 16), **tiff_kw)),
        ("bigtiff", encode_geotiff(_GRID, bigtiff=True, **tiff_kw)),
        ("tiff_jpeg", encode_geotiff(img8, compression="jpeg",
                                     jpeg_tables=True, **tiff_kw)),
        ("grib1", encode_grib1([(0, _GRID)], nbits=12, **grib_kw)),
        ("grib2_simple", encode_grib2([(None, _GRID)], nbits=12,
                                      **grib_kw)),
        ("grib2_cx_mvm", encode_grib2([(None, holes)],
                                      packing="complex_sd",
                                      missing="mvm", **grib_kw)),
        ("grib2_png", encode_grib2([(None, _GRID)], nbits=12,
                                   packing="png", **grib_kw)),
        ("netcdf", encode_netcdf(
            {"y": 40, "x": 50},
            {"v": (("y", "x"), _GRID.astype("<f4"), {})},
        )),
    ]


_DECODERS = {
    "pnm": decode_pnm,
    "png": decode_png,
    "png_adam7": decode_png,
    "jpeg": decode_jpeg,
    "jpeg_prog": decode_jpeg,
}


def _decode(kind: str, blob: bytes, tmp_path) -> object:
    if kind in _DECODERS:
        return _DECODERS[kind](blob)
    path = str(tmp_path / f"{kind}.bin")
    with open(path, "wb") as f:
        f.write(blob)
    if kind.startswith("grib"):
        return read_grib_minimal(path)
    if kind == "netcdf":
        return read_netcdf_minimal(path)
    return read_tiff_minimal(path)


@pytest.mark.parametrize("kind,blob", _blob_cases())
@pytest.mark.parametrize("frac", [0.3, 0.6])
def test_truncated_payload_raises(tmp_path, kind, blob, frac):
    # sanity: the full blob decodes
    _decode(kind, blob, tmp_path)
    cut = blob[: int(len(blob) * frac)]
    with pytest.raises(Exception):
        _decode(kind, cut, tmp_path)


def test_truncated_zarr_chunk_raises(tmp_path):
    store = str(tmp_path / "z.zarr")
    write_zarr_store(
        store, "v", _GRID.astype("<f8"),
        {"y": np.arange(40.0), "x": np.arange(50.0)},
        chunks=(40, 50), compressor="zlib",
    )
    arr, _ = read_zarr_minimal(f"{store}/v")
    assert np.array_equal(arr, _GRID)
    chunk = f"{store}/v/0.0"
    raw = open(chunk, "rb").read()
    with open(chunk, "wb") as f:
        f.write(raw[: len(raw) // 2])
    with pytest.raises(Exception):
        read_zarr_minimal(f"{store}/v")


def test_truncated_zarr_raw_chunk_raises(tmp_path):
    """Uncompressed chunks have no codec checksum — the shape/byte-count
    mismatch must still raise instead of reshaping garbage."""
    store = str(tmp_path / "zr.zarr")
    write_zarr_store(
        store, "v", _GRID.astype("<f8"),
        {"y": np.arange(40.0), "x": np.arange(50.0)},
        chunks=(40, 50), compressor=None,
    )
    chunk = f"{store}/v/0.0"
    raw = open(chunk, "rb").read()
    with open(chunk, "wb") as f:
        f.write(raw[: len(raw) // 2])
    with pytest.raises(Exception):
        read_zarr_minimal(f"{store}/v")
