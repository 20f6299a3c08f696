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


def test_truncated_shapefile_raises(tmp_path):
    from data_pipelines_spark.sources.shapefile import (
        read_dbf_minimal,
        read_shp_minimal,
        write_dbf,
        write_shp,
    )

    shp = str(tmp_path / "z.shp")
    dbf = str(tmp_path / "z.dbf")
    rings = [
        [[(0.0, 0.0), (4.0, 0.0), (4.0, 4.0), (0.0, 4.0), (0.0, 0.0)]]
        for _ in range(6)
    ]
    write_shp(shp, rings)
    write_dbf(dbf, [("NAME", "C", 10, 0)], [[f"zone{i}"] for i in range(6)])
    assert len(read_shp_minimal(shp)) == 6
    assert len(read_dbf_minimal(dbf)[1]) == 6
    for path, reader in ((shp, read_shp_minimal), (dbf, read_dbf_minimal)):
        raw = open(path, "rb").read()
        with open(path, "wb") as f:
            f.write(raw[: int(len(raw) * 0.5)])
        with pytest.raises(Exception):
            reader(path)


def test_truncated_wav_raises():
    import io
    import wave

    from data_pipelines_spark.operators.multimodal import decode_wav

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(8000)
        w.writeframes(
            (np.sin(np.arange(4000) / 8.0) * 20000).astype("<i2").tobytes()
        )
    blob = buf.getvalue()
    samples, _sr, _ch = decode_wav(blob)
    assert len(samples) == 4000
    for frac in (0.3, 0.6):
        cut = blob[: int(len(blob) * frac)]
        try:
            got, _sr, _ch = decode_wav(cut)
        except Exception:
            continue  # loud failure: fine
        # stdlib wave tolerates a short data chunk; the decode must
        # then be an honest prefix, never padded/garbage samples
        n = len(got)
        assert n < 4000
        assert np.array_equal(got, samples[:n])


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
