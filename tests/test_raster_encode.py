"""Write→read round-trips for the raster encoders: every writer in
`sources/raster_encode.py` must reproduce its array bit-for-bit through
the matching minimal reader in `sources/raster.py` (the same pairing
the reference gets from rioxarray/xarray doing both halves,
`resources/io_managers.py:103-223`)."""

from __future__ import annotations

import numpy as np
import pytest

from data_pipelines_spark.sources.raster import (
    read_grib2_minimal,
    read_netcdf_minimal,
    read_tiff_minimal,
    read_zarr_minimal,
)
from data_pipelines_spark.sources.raster_encode import (
    encode_geotiff,
    encode_grib2,
    encode_netcdf,
    write_zarr_store,
)


@pytest.mark.parametrize("dtype", ["u1", "u2", "i2", "i4", "f4", "f8"])
def test_geotiff_roundtrip_dtypes(tmp_path, dtype):
    rng = np.random.default_rng(7)
    arr = rng.integers(0, 200, size=(5, 7)).astype(dtype)
    path = str(tmp_path / f"t_{dtype}.tif")
    with open(path, "wb") as f:
        f.write(
            encode_geotiff(
                arr, origin_x=10.0, origin_y=60.0, pixel_w=0.25, pixel_h=0.5
            )
        )
    got, xs, ys = read_tiff_minimal(path)
    assert np.array_equal(got, arr.astype("f8"))
    assert np.array_equal(xs, 10.0 + np.arange(7) * 0.25)
    assert np.array_equal(ys, 60.0 - np.arange(5) * 0.5)


def test_geotiff_rejects_bad_shape():
    with pytest.raises(ValueError, match="2-D"):
        encode_geotiff(
            np.zeros(3), origin_x=0, origin_y=0, pixel_w=1, pixel_h=1
        )


def test_netcdf_roundtrip_with_cf_attrs(tmp_path):
    lat = np.array([10.0, 10.5, 11.0])
    lon = np.array([20.0, 20.25, 20.5, 20.75])
    vals = np.arange(12, dtype="f8").reshape(3, 4)
    vals[1, 2] = -999.0
    blob = encode_netcdf(
        {"lat": 3, "lon": 4},
        {
            "lat": (("lat",), lat, {}),
            "lon": (("lon",), lon, {}),
            "dis24": (
                ("lat", "lon"),
                vals,
                {"_FillValue": -999.0, "units": "m3 s-1"},
            ),
        },
    )
    path = str(tmp_path / "g.nc")
    with open(path, "wb") as f:
        f.write(blob)
    dims, variables = read_netcdf_minimal(path)
    assert dims == {"lat": 3, "lon": 4}
    dim_names, arr, vatts = variables["dis24"]
    assert dim_names == ("lat", "lon")
    assert np.array_equal(arr, vals)
    assert vatts["_FillValue"] == -999.0
    assert vatts["units"] == "m3 s-1"
    assert np.array_equal(variables["lat"][1], lat)
    assert np.array_equal(variables["lon"][1], lon)


def test_netcdf_roundtrip_int_scale_offset(tmp_path):
    """Packed-integer variable with scale/offset — the CF profile
    climate archives actually use — survives the reader's unpacking."""
    from data_pipelines_spark.sources.raster import _apply_cf_attrs

    vals = np.array([[0, 100], [2000, 32767]], dtype="i2")
    blob = encode_netcdf(
        {"y": 2, "x": 2},
        {
            "t2m": (
                ("y", "x"),
                vals,
                {
                    "scale_factor": 0.5,
                    "add_offset": 250.0,
                    "_FillValue": np.array([32767], dtype="i2"),
                },
            )
        },
    )
    path = str(tmp_path / "p.nc")
    with open(path, "wb") as f:
        f.write(blob)
    _dims, variables = read_netcdf_minimal(path)
    _dn, arr, vatts = variables["t2m"]
    unpacked = _apply_cf_attrs(arr, vatts)
    assert unpacked[0, 0] == 250.0
    assert unpacked[0, 1] == 300.0
    assert unpacked[1, 0] == 1250.0
    assert np.isnan(unpacked[1, 1])


def test_netcdf_shape_mismatch_raises():
    with pytest.raises(ValueError, match="does not match dims"):
        encode_netcdf(
            {"lat": 3}, {"v": (("lat",), np.zeros(4), {})}
        )


def test_grib2_roundtrip_ensemble_12bit(tmp_path):
    """Two ensemble members, 12-bit packing (bit fields crossing byte
    boundaries), D=1 decimal scaling, descending lats."""
    rng = np.random.default_rng(11)
    v0 = rng.integers(0, 4000, size=(4, 6)).astype("f8") / 10.0
    v1 = rng.integers(0, 4000, size=(4, 6)).astype("f8") / 10.0
    blob = encode_grib2(
        [(0, v0), (1, v1)],
        lat0=50.0, lon0=10.0, dlat=0.5, dlon=0.25,
        nbits=12, d_scale=1,
    )
    path = str(tmp_path / "e.grib2")
    with open(path, "wb") as f:
        f.write(blob)
    msgs = read_grib2_minimal(path)
    assert [m["member"] for m, *_ in msgs] == [0, 1]
    for (meta, vals, lats, lons), expect in zip(msgs, (v0, v1)):
        assert meta["pdt"] == 1
        assert np.array_equal(vals, expect)
        assert np.array_equal(lats, 50.0 - np.arange(4) * 0.5)
        assert np.array_equal(lons, 10.0 + np.arange(6) * 0.25)


def test_grib2_bitmap_and_negative_lat0(tmp_path):
    """NaN cells travel through a real section-6 bitmap; southern-
    hemisphere origin exercises the sign-magnitude lat encoding."""
    vals = np.array([[1.0, np.nan, 3.0], [np.nan, 5.0, 6.0]])
    blob = encode_grib2(
        [(None, vals)], lat0=-12.5, lon0=30.0, dlat=0.5, dlon=0.5,
        nbits=8, lat_ascending=True,
    )
    path = str(tmp_path / "b.grib2")
    with open(path, "wb") as f:
        f.write(blob)
    [(meta, got, lats, lons)] = read_grib2_minimal(path)
    assert meta["pdt"] == 0
    assert np.array_equal(np.isnan(got), np.isnan(vals))
    assert np.array_equal(got[~np.isnan(got)], vals[~np.isnan(vals)])
    assert np.array_equal(lats, -12.5 + np.arange(2) * 0.5)


def test_grib2_rejects_out_of_range():
    with pytest.raises(ValueError, match="outside 4-bit range"):
        encode_grib2(
            [(0, np.array([[0.0, 100.0]]))],
            lat0=0, lon0=0, dlat=1, dlon=1, nbits=4,
        )


@pytest.mark.parametrize("packing,sd_order", [
    ("complex", 2), ("complex_sd", 1), ("complex_sd", 2),
])
def test_grib2_complex_packing_roundtrip(tmp_path, packing, sd_order):
    """Data templates 5.2/5.3 (complex packing, spatial differencing
    orders 1 and 2): exact round-trip with a bitmap, an ensemble pair,
    decimal scaling, and a group length that leaves a ragged last
    group."""
    rng = np.random.default_rng(5)
    base = np.round(
        np.cumsum(rng.normal(0, 0.02, size=(9, 13)), axis=1) + 2.0, 3
    )
    withnan = base.copy()
    withnan[2:4, 5:9] = np.nan
    blob = encode_grib2(
        [(0, base), (1, withnan)],
        lat0=48.0, lon0=5.0, dlat=0.05, dlon=0.05,
        d_scale=3, packing=packing, group_len=7, sd_order=sd_order,
    )
    path = str(tmp_path / "cx.grib2")
    with open(path, "wb") as f:
        f.write(blob)
    msgs = read_grib2_minimal(path)
    assert [m["member"] for m, *_ in msgs] == [0, 1]
    for (_meta, got, _lats, _lons), expect in zip(msgs, (base, withnan)):
        assert np.array_equal(np.isnan(got), np.isnan(expect))
        assert np.allclose(
            got[~np.isnan(got)], expect[~np.isnan(expect)], atol=1e-9
        )


def test_grib2_complex_packing_known_bytes():
    """Pin the template-5.2 wire layout on a hand-computed case so a
    symmetric encode/decode bug can't hide behind round-trips:
    x=[5,7,6,9], groups of 2 → refs [5,6] (3 bits: 101 110 → 0xB8),
    uniform widths/lengths collapse their blocks to zero bits, data
    rel=[0,2,0,3] at 2 bits → 00 10 00 11 → 0x23."""
    from data_pipelines_spark.sources.raster_encode import _complex_pack

    gref_bits, sec5_tail, sec7 = _complex_pack(
        np.array([5, 7, 6, 9], dtype=np.int64), 0, 2
    )
    assert gref_bits == 3
    assert sec7 == bytes([0xB8, 0x23])
    assert sec5_tail == (
        bytes([0, 1, 0]) + b"\0" * 8
        + (2).to_bytes(4, "big")            # NG
        + bytes([2, 0])                     # width ref / width bits
        + (2).to_bytes(4, "big") + bytes([1])  # length ref / increment
        + (2).to_bytes(4, "big") + bytes([0])  # last length / len bits
    )


def test_grib2_complex_sd_shrinks_smooth_fields(tmp_path):
    """On a smooth field, template 5.3 should beat both 5.2 and 5.0 —
    the reason operational centers use it."""
    x = np.linspace(0, 40, 120)
    vals = np.round(
        10.0 + 5.0 * np.sin(x)[None, :] + 0.01 * x[None, :] ** 2, 2
    ).repeat(40, axis=0)
    sizes = {}
    for packing in ("simple", "complex", "complex_sd"):
        blob = encode_grib2(
            [(None, vals)], lat0=0.0, lon0=0.0, dlat=0.1, dlon=0.1,
            d_scale=2, packing=packing,
        )
        sizes[packing] = len(blob)
        path = str(tmp_path / f"{packing}.grib2")
        with open(path, "wb") as f:
            f.write(blob)
        [(_m, got, _la, _lo)] = read_grib2_minimal(path)
        assert np.allclose(got, vals, atol=1e-9)
    assert sizes["complex_sd"] < sizes["complex"] < sizes["simple"]


def test_grib2_complex_constant_and_tiny_fields(tmp_path):
    """Degenerate shapes: a constant field (every group width 0), a
    single-point grid, and group_len larger than the field."""
    for packing, vals in [
        ("complex", np.full((3, 4), 7.0)),
        ("complex", np.array([[5.0]])),
        ("complex_sd", np.full((3, 4), 7.0)),
        ("complex", np.arange(6.0).reshape(2, 3)),
    ]:
        blob = encode_grib2(
            [(None, vals)], lat0=0.0, lon0=0.0, dlat=1.0, dlon=1.0,
            packing=packing, group_len=100,
        )
        path = str(tmp_path / "t.grib2")
        with open(path, "wb") as f:
            f.write(blob)
        [(_m, got, _la, _lo)] = read_grib2_minimal(path)
        assert np.array_equal(got, vals)
    with pytest.raises(ValueError, match="needs more than"):
        encode_grib2(
            [(None, np.array([[1.0, 2.0]]))],
            lat0=0, lon0=0, dlat=1, dlon=1, packing="complex_sd",
        )


@pytest.mark.parametrize("packing", ["complex", "complex_sd"])
def test_grib2_missing_value_management_roundtrip(tmp_path, packing):
    """Templates 5.2/5.3 with octet 23 = 1: NaNs ride as in-group
    all-ones patterns (no bitmap section), whole-group gaps as the
    reference-width pattern, and the differencing chain skips missing
    points — decode must put every NaN back and every present value
    back exactly."""
    rng = np.random.default_rng(11)
    vals = rng.integers(0, 500, (8, 15)).astype("f8")
    vals[0, 3] = np.nan            # isolated hole
    vals[2, :] = np.nan            # a run spanning whole groups
    vals[5, 5:9] = np.nan
    vals[7, 14] = np.nan           # last point
    blob = encode_grib2(
        [(None, vals)], lat0=0.0, lon0=0.0, dlat=1.0, dlon=1.0,
        packing=packing, group_len=5, missing="mvm",
    )
    path = str(tmp_path / "mvm.grib2")
    with open(path, "wb") as f:
        f.write(blob)
    [(_m, got, _la, _lo)] = read_grib2_minimal(path)
    assert np.array_equal(np.isnan(got), np.isnan(vals))
    assert np.array_equal(got[~np.isnan(vals)], vals[~np.isnan(vals)])
    # parity with the bitmap spelling of the same field
    blob_bm = encode_grib2(
        [(None, vals)], lat0=0.0, lon0=0.0, dlat=1.0, dlon=1.0,
        packing=packing, group_len=5, missing="bitmap",
    )
    with open(path, "wb") as f:
        f.write(blob_bm)
    [(_m, got_bm, _la, _lo)] = read_grib2_minimal(path)
    assert np.array_equal(np.isnan(got_bm), np.isnan(got))
    assert np.array_equal(
        got_bm[~np.isnan(got)], got[~np.isnan(got)]
    )


def test_grib2_mvm_degenerate_shapes(tmp_path):
    """MVM corner cases: constant present values inside a group with
    missing (width forced to 1), width-0 reference colliding with the
    all-ones pattern (gref_bits must bump), and an all-missing-but-one
    field."""
    path = str(tmp_path / "t.grib2")
    cases = [
        # constant 3.0 everywhere + holes: grefs 3 == 2^2-1 collision
        np.where(np.arange(12).reshape(3, 4) % 5 == 0, np.nan, 3.0),
        np.where(np.arange(12).reshape(3, 4) > 0, np.nan, 9.0),
        np.full((2, 2), 4.0),  # no missing at all, mvm still legal
    ]
    for vals in cases:
        blob = encode_grib2(
            [(None, vals)], lat0=0.0, lon0=0.0, dlat=1.0, dlon=1.0,
            packing="complex", group_len=4, missing="mvm",
        )
        with open(path, "wb") as f:
            f.write(blob)
        [(_m, got, _la, _lo)] = read_grib2_minimal(path)
        assert np.array_equal(np.isnan(got), np.isnan(vals))
        assert np.array_equal(got[~np.isnan(vals)], vals[~np.isnan(vals)])


def test_grib2_mvm_secondary_pattern_read(tmp_path):
    """MVM = 2 (read-side only — the writer emits 1): patch octet 23
    of an MVM-1 message to 2, with data chosen so one in-group value
    equals the SECONDARY pattern 2^w-2. Under MVM 1 it decodes as a
    real value; under MVM 2 the same bits must surface as NaN."""
    vals = np.array([[0.0, 1.0, 2.0, 6.0]])  # rel max 6 -> width 3, m2 = 6
    blob = bytearray(
        encode_grib2(
            [(None, vals)], lat0=0.0, lon0=0.0, dlat=1.0, dlon=1.0,
            packing="complex", group_len=4, missing="mvm",
        )
    )
    # walk the sections to section 5; its octet 23 is body[22]
    pos = 16  # after the 16-byte indicator
    while blob[pos + 4] != 5:
        pos += int.from_bytes(blob[pos : pos + 4], "big")
    assert blob[pos + 22] == 1
    path = str(tmp_path / "m1.grib2")
    with open(path, "wb") as f:
        f.write(bytes(blob))
    [(_m, got1, _la, _lo)] = read_grib2_minimal(path)
    assert np.array_equal(got1, vals)  # 6 is a real value at MVM 1

    blob[pos + 22] = 2
    with open(path, "wb") as f:
        f.write(bytes(blob))
    [(_m, got2, _la, _lo)] = read_grib2_minimal(path)
    expect = vals.copy()
    expect[0, 3] = np.nan  # same bits, now the secondary pattern
    assert np.array_equal(np.isnan(got2), np.isnan(expect))
    assert np.array_equal(got2[:, :3], vals[:, :3])


def test_grib2_mvm_validation():
    with pytest.raises(ValueError, match="complex-packing feature"):
        encode_grib2(
            [(None, np.zeros((2, 2)))],
            lat0=0, lon0=0, dlat=1, dlon=1, packing="simple",
            missing="mvm",
        )
    with pytest.raises(ValueError, match="missing mode"):
        encode_grib2(
            [(None, np.zeros((2, 2)))],
            lat0=0, lon0=0, dlat=1, dlon=1, missing="nope",
        )


@pytest.mark.parametrize("compressor", [None, "zlib", "gzip", "bz2", "lzma"])
def test_zarr_roundtrip_compressors(tmp_path, compressor):
    vals = np.arange(12, dtype="<f8").reshape(3, 4) * 1.5
    store = str(tmp_path / f"s_{compressor}.zarr")
    write_zarr_store(
        store, "dis24", vals,
        {"lat": np.array([1.0, 2.0, 3.0]), "lon": np.arange(4.0)},
        chunks=(2, 3), compressor=compressor,
    )
    arr, attrs = read_zarr_minimal(f"{store}/dis24")
    assert np.array_equal(arr, vals)
    assert attrs["_ARRAY_DIMENSIONS"] == ["lat", "lon"]


def test_zarr_foreign_lzma_bz2_chunks_decode(tmp_path):
    """Chunks written by numcodecs-shaped metadata (not our writer)
    decode: lzma with the config keys numcodecs emits (format/check/
    preset/filters, format absent -> FORMAT_XZ default) and bz2 with a
    different level than the writer's own."""
    import bz2
    import json
    import lzma
    import os

    vals = np.arange(6, dtype="<i4").reshape(2, 3)
    for comp_id, blob in [
        ("lzma", lzma.compress(vals.tobytes(), preset=6)),
        ("bz2", bz2.compress(vals.tobytes(), 9)),
    ]:
        d = str(tmp_path / f"f_{comp_id}.zarr/v")
        os.makedirs(d)
        compressor = {"id": comp_id}
        if comp_id == "lzma":
            compressor.update({"check": -1, "preset": 6, "filters": None})
        else:
            compressor["level"] = 9
        with open(f"{d}/.zarray", "w") as f:
            json.dump(
                {
                    "zarr_format": 2,
                    "shape": [2, 3],
                    "chunks": [2, 3],
                    "dtype": "<i4",
                    "order": "C",
                    "filters": None,
                    "fill_value": 0,
                    "compressor": compressor,
                },
                f,
            )
        with open(f"{d}/0.0", "wb") as f:
            f.write(blob)
        arr, _ = read_zarr_minimal(d)
        assert np.array_equal(arr, vals)


def test_zarr_omitted_chunk_reads_as_fill(tmp_path):
    vals = np.arange(24, dtype="<f8").reshape(4, 6)
    store = str(tmp_path / "sparse.zarr")
    write_zarr_store(
        store, "v", vals,
        {"a": np.arange(4.0), "b": np.arange(6.0)},
        chunks=(2, 2), fill_value=-1.0, omit_chunks={(1, 2)},
    )
    arr, _ = read_zarr_minimal(f"{store}/v")
    expect = vals.copy()
    expect[2:4, 4:6] = -1.0
    assert np.array_equal(arr, expect)


def test_zarr_f_order_roundtrip(tmp_path):
    vals = np.arange(24, dtype="<f8").reshape(4, 6) * 0.5
    store = str(tmp_path / "forder.zarr")
    write_zarr_store(
        store, "v", vals,
        {"a": np.arange(4.0), "b": np.arange(6.0)},
        chunks=(3, 4), order="F",
    )
    arr, _ = read_zarr_minimal(f"{store}/v")
    assert np.array_equal(arr, vals)


@pytest.mark.parametrize(
    "filters",
    [
        [{"id": "delta", "dtype": "<i4"}],
        [{"id": "delta", "dtype": "<i4", "astype": "<i2"}],
        [{"id": "shuffle", "elementsize": 4}],
        [{"id": "delta", "dtype": "<i4"}, {"id": "shuffle", "elementsize": 4}],
    ],
)
def test_zarr_filter_roundtrips(tmp_path, filters):
    """numcodecs delta/shuffle filters, alone and chained, survive the
    write -> read pipeline bit-exactly (integer dtypes, where the
    delta transform is exact)."""
    vals = (np.arange(24, dtype="<i4").reshape(4, 6) * 7) % 100
    store = str(tmp_path / "filt.zarr")
    write_zarr_store(
        store, "v", vals,
        {"a": np.arange(4.0), "b": np.arange(6.0)},
        chunks=(2, 3), filters=filters,
    )
    arr, _ = read_zarr_minimal(f"{store}/v")
    assert np.array_equal(arr, vals)
    assert arr.dtype == np.dtype("<i4")


def test_zarr_f_order_delta_combined(tmp_path):
    """F-order serialization composes with the delta filter: the diff
    stream runs over the F-order element sequence."""
    vals = np.arange(30, dtype="<i4").reshape(5, 6)
    store = str(tmp_path / "fd.zarr")
    write_zarr_store(
        store, "v", vals,
        {"a": np.arange(5.0), "b": np.arange(6.0)},
        chunks=(2, 2), order="F",
        filters=[{"id": "delta", "dtype": "<i4"}],
    )
    arr, _ = read_zarr_minimal(f"{store}/v")
    assert np.array_equal(arr, vals)


def test_zarr_unknown_filter_still_gated(tmp_path):
    import json
    import os

    store = str(tmp_path / "bad.zarr")
    os.makedirs(f"{store}/v")
    with open(f"{store}/v/.zarray", "w") as f:
        json.dump(
            {
                "zarr_format": 2, "shape": [2], "chunks": [2],
                "dtype": "<f8", "order": "C",
                "filters": [{"id": "fixedscaleoffset"}],
                "fill_value": 0, "compressor": None,
            },
            f,
        )
    with pytest.raises(NotImplementedError, match="fixedscaleoffset"):
        read_zarr_minimal(f"{store}/v")


def test_grib1_roundtrip_ensemble(tmp_path):
    """GRIB edition 1: two ECMWF-local-def-1 ensemble members, 10-bit
    packing, IBM-float reference value, D=0/E=0 integer-exact."""
    from data_pipelines_spark.sources.raster import (
        read_grib1_minimal,
        read_grib_minimal,
    )
    from data_pipelines_spark.sources.raster_encode import encode_grib1

    rng = np.random.default_rng(3)
    v0 = rng.integers(5, 1000, size=(3, 5)).astype("f8")
    v1 = rng.integers(5, 1000, size=(3, 5)).astype("f8")
    path = str(tmp_path / "e.grib1")
    with open(path, "wb") as f:
        f.write(
            encode_grib1(
                [(0, v0), (1, v1)],
                lat0=50.0, lon0=10.0, dlat=0.5, dlon=0.25, nbits=10,
            )
        )
    msgs = read_grib1_minimal(path)
    assert [m["member"] for m, *_ in msgs] == [0, 1]
    for (meta, vals, lats, lons), expect in zip(msgs, (v0, v1)):
        assert meta["edition"] == 1
        assert np.array_equal(vals, expect)
        assert np.array_equal(lats, 50.0 - np.arange(3) * 0.5)
        assert np.array_equal(lons, 10.0 + np.arange(5) * 0.25)
    # the edition sniffer dispatches to the same parser
    assert len(read_grib_minimal(path)) == 2


def test_grib1_bitmap_and_scaling(tmp_path):
    """D=1 decimal scaling + NaN cells through a real GRIB1 bitmap."""
    from data_pipelines_spark.sources.raster import read_grib1_minimal
    from data_pipelines_spark.sources.raster_encode import encode_grib1

    vals = np.array([[1.5, np.nan, 3.1], [np.nan, 5.0, 6.9]])
    path = str(tmp_path / "b.grib1")
    with open(path, "wb") as f:
        f.write(
            encode_grib1(
                [(None, vals)], lat0=-2.5, lon0=30.0, dlat=0.5, dlon=0.5,
                nbits=8, d_scale=1, lat_ascending=True,
            )
        )
    [(meta, got, lats, lons)] = read_grib1_minimal(path)
    assert meta.get("member") is None
    assert np.array_equal(np.isnan(got), np.isnan(vals))
    assert np.allclose(got[~np.isnan(got)], vals[~np.isnan(vals)],
                       rtol=0, atol=1e-12)
    assert np.array_equal(lats, -2.5 + np.arange(2) * 0.5)


def test_grib_ensemble_reads_edition1(spark, tmp_path):
    """S4 end-to-end on edition 1: the ensemble reader stacks GRIB1
    members onto the number axis exactly like GRIB2."""
    from data_pipelines_spark.sources.raster import read_grib_ensemble
    from data_pipelines_spark.sources.raster_encode import encode_grib1

    v0 = np.arange(6, dtype="f8").reshape(2, 3)
    path = str(tmp_path / "ens.grib1")
    with open(path, "wb") as f:
        f.write(encode_grib1([(0, v0), (1, v0 + 10)],
                             lat0=10.0, lon0=0.0, dlat=1.0, dlon=1.0))
    df = read_grib_ensemble(spark, path, value_var="dis24")
    rows = {(r["number"], r["latitude"], r["longitude"]): r["dis24"]
            for r in df.collect()}
    assert len(rows) == 12
    assert rows[(0.0, 10.0, 0.0)] == 0.0
    assert rows[(1.0, 9.0, 2.0)] == 15.0


def test_ibm_float_roundtrip_values():
    from data_pipelines_spark.sources.raster import _ibm_to_float
    from data_pipelines_spark.sources.raster_encode import _ibm_float_bytes

    for v in (0.0, 1.0, -1.0, 123456.0, 2.0**23, -37.5, 0.25):
        assert _ibm_to_float(_ibm_float_bytes(v)) == v
    with pytest.raises(ValueError, match="not exactly"):
        _ibm_float_bytes(0.1)


def test_tiff_tiled_roundtrip_edge_tiles(tmp_path):
    """Tile-organized TIFF (the COG interior layout) with edge tiles
    that need padding: 7x5 image, 4x3 tiles."""
    arr = np.arange(35, dtype="<f4").reshape(5, 7) * 2.0
    path = str(tmp_path / "tiled.tif")
    with open(path, "wb") as f:
        f.write(
            encode_geotiff(
                arr, origin_x=0.0, origin_y=10.0, pixel_w=1.0, pixel_h=1.0,
                tile=(4, 3),
            )
        )
    got, xs, ys = read_tiff_minimal(path)
    assert np.array_equal(got, arr.astype("f8"))
    assert np.array_equal(ys, 10.0 - np.arange(5))


def test_tiff_multiband_strip_roundtrip(tmp_path):
    """Pixel-interleaved 3-band image (the satellite shape) in one
    strip; the reader returns (h, w, s)."""
    rng = np.random.default_rng(5)
    arr = rng.integers(0, 4000, size=(4, 6, 3)).astype("<u2")
    path = str(tmp_path / "mb.tif")
    with open(path, "wb") as f:
        f.write(
            encode_geotiff(
                arr, origin_x=5.0, origin_y=9.0, pixel_w=0.5, pixel_h=0.5
            )
        )
    got, xs, ys = read_tiff_minimal(path)
    assert got.shape == (4, 6, 3)
    assert np.array_equal(got, arr.astype("f8"))


def test_tiff_multiband_tiled_roundtrip(tmp_path):
    arr = np.arange(4 * 6 * 2, dtype="<i2").reshape(4, 6, 2)
    path = str(tmp_path / "mbt.tif")
    with open(path, "wb") as f:
        f.write(
            encode_geotiff(
                arr, origin_x=0.0, origin_y=0.0, pixel_w=1.0, pixel_h=1.0,
                tile=(4, 2),
            )
        )
    got, _, _ = read_tiff_minimal(path)
    assert np.array_equal(got, arr.astype("f8"))


def test_geotiff_multiband_long_form(spark, tmp_path):
    """read_geotiff emits one row per (band, y, x) for multi-band
    files — bands become a first-class dimension column."""
    from data_pipelines_spark.sources.raster import read_geotiff

    arr = np.zeros((2, 2, 2), dtype="<f4")
    arr[:, :, 0] = [[1, 2], [3, 4]]
    arr[:, :, 1] = [[10, 20], [30, 40]]
    path = str(tmp_path / "bands.tif")
    with open(path, "wb") as f:
        f.write(
            encode_geotiff(
                arr, origin_x=0.0, origin_y=1.0, pixel_w=1.0, pixel_h=1.0
            )
        )
    df = read_geotiff(spark, path, value_col="v")
    rows = {(r["band"], r["y"], r["x"]): r["v"] for r in df.collect()}
    assert len(rows) == 8
    assert rows[(1.0, 1.0, 0.0)] == 1.0
    assert rows[(2.0, 0.0, 1.0)] == 40.0


def test_tiff_overview_chain_roundtrip(tmp_path):
    """COG overview chain: tiled full-res + 2x and 4x reduced IFDs;
    each level decodes with the geotransform scaled by its factor."""
    arr = np.arange(8 * 12, dtype="<f4").reshape(8, 12)
    path = str(tmp_path / "cog.tif")
    with open(path, "wb") as f:
        f.write(
            encode_geotiff(
                arr, origin_x=100.0, origin_y=60.0, pixel_w=0.5, pixel_h=0.25,
                tile=(4, 4), overviews=(2, 4),
            )
        )
    full, xs0, ys0 = read_tiff_minimal(path)
    assert np.array_equal(full, arr.astype("f8"))
    assert xs0[1] - xs0[0] == 0.5

    ov1, xs1, ys1 = read_tiff_minimal(path, overview=1)
    assert np.array_equal(ov1, arr[::2, ::2].astype("f8"))
    assert xs1[1] - xs1[0] == 1.0          # pixel size x factor
    assert ys1[0] == 60.0                  # same origin

    ov2, xs2, _ = read_tiff_minimal(path, overview=2)
    assert np.array_equal(ov2, arr[::4, ::4].astype("f8"))
    assert xs2[1] - xs2[0] == 2.0

    with pytest.raises(ValueError, match="overview 3 not present"):
        read_tiff_minimal(path, overview=3)


def test_tiff_overview_strip_multiband(tmp_path):
    arr = np.arange(6 * 8 * 2, dtype="<u2").reshape(6, 8, 2)
    path = str(tmp_path / "ovmb.tif")
    with open(path, "wb") as f:
        f.write(
            encode_geotiff(
                arr, origin_x=0.0, origin_y=0.0, pixel_w=1.0, pixel_h=1.0,
                overviews=(2,),
            )
        )
    full, _, _ = read_tiff_minimal(path)
    ov, _, _ = read_tiff_minimal(path, overview=1)
    assert np.array_equal(full, arr.astype("f8"))
    assert np.array_equal(ov, arr[::2, ::2].astype("f8"))


@pytest.mark.parametrize("tiled", [False, True])
def test_tiff_deflate_roundtrip(tmp_path, tiled):
    """COMPRESS=DEFLATE strips/tiles decompress bit-exactly."""
    rng = np.random.default_rng(9)
    arr = rng.integers(0, 255, size=(6, 9)).astype("<u1")
    path = str(tmp_path / f"defl_{tiled}.tif")
    with open(path, "wb") as f:
        f.write(
            encode_geotiff(
                arr, origin_x=0.0, origin_y=0.0, pixel_w=1.0, pixel_h=1.0,
                tile=(4, 4) if tiled else None, compression="deflate",
            )
        )
    got, _, _ = read_tiff_minimal(path)
    assert np.array_equal(got, arr.astype("f8"))


@pytest.mark.parametrize("tiled", [False, True])
def test_tiff_zstd_roundtrip(tmp_path, tiled):
    """COMPRESS=ZSTD (GDAL tag 50000, via pyarrow's bundled libzstd):
    strips/tiles round-trip bit-exactly, predictors compose, and the
    tag really says 50000."""
    import pyarrow as pa

    if not pa.Codec.is_available("zstd"):
        pytest.skip("pyarrow build without zstd")
    import struct

    rng = np.random.default_rng(17)
    arr = rng.integers(0, 60000, size=(6, 9, 2)).astype("<u2")
    path = str(tmp_path / f"zstd_{tiled}.tif")
    with open(path, "wb") as f:
        f.write(
            encode_geotiff(
                arr, origin_x=0.0, origin_y=0.0, pixel_w=1.0, pixel_h=1.0,
                tile=(4, 4) if tiled else None, compression="zstd",
            )
        )
    got, _, _ = read_tiff_minimal(path)
    assert np.array_equal(got, arr.astype("f8"))
    with open(path, "rb") as f:
        data = f.read()
    # classic TIFF little-endian: walk IFD entries for tag 259
    (ifd_off,) = struct.unpack_from("<I", data, 4)
    (n,) = struct.unpack_from("<H", data, ifd_off)
    tags = {
        struct.unpack_from("<H", data, ifd_off + 2 + 12 * i)[0]:
        struct.unpack_from("<H", data, ifd_off + 2 + 12 * i + 8)[0]
        for i in range(n)
    }
    assert tags[259] == 50000

    # predictor 2 (int) and 3 (float) compose with zstd chunks
    smooth = (np.arange(48, dtype="<u2").reshape(6, 8) * 3).astype("<u2")
    fl = (np.arange(48, dtype="<f4").reshape(6, 8) / 7.0).astype("<f4")
    for a, dt in ((smooth, "u2"), (fl, "f4")):
        p = str(tmp_path / f"zp_{dt}.tif")
        with open(p, "wb") as f:
            f.write(
                encode_geotiff(
                    a, origin_x=0.0, origin_y=0.0, pixel_w=1.0,
                    pixel_h=1.0, compression="zstd", predictor=True,
                )
            )
        got, _, _ = read_tiff_minimal(p)
        assert np.array_equal(got, a.astype("f8"))


def test_tiff_jpeg_wrapper_is_transparent(tmp_path):
    """COMPRESS=JPEG (new-style, compression 7): the TIFF layer must
    hand back EXACTLY what the JPEG kernel decodes from the same
    stream — lossiness lives in the codec, not the wrapper."""
    from data_pipelines_spark.operators.jpeg import (
        decode_jpeg,
        encode_jpeg_baseline,
    )

    rng = np.random.default_rng(41)
    arr = (
        np.arange(17, dtype="f8")[None, :] * 3
        + np.arange(11, dtype="f8")[:, None] * 5
        + rng.normal(0, 2, (11, 17))
    ).clip(0, 255).astype("u1")
    path = str(tmp_path / "jpeg.tif")
    with open(path, "wb") as f:
        f.write(
            encode_geotiff(
                arr, origin_x=4.0, origin_y=9.0, pixel_w=0.5, pixel_h=0.25,
                compression="jpeg", jpeg_quality_divisor=2,
            )
        )
    got, xs, ys = read_tiff_minimal(path)
    expect = decode_jpeg(encode_jpeg_baseline(arr, quality_divisor=2))
    assert np.array_equal(got, expect.astype("f8"))
    assert np.max(np.abs(got - arr)) <= 3  # near-lossless at divisor 2
    assert xs[0] == 4.0 and ys[0] == 9.0 and xs[1] - xs[0] == 0.5


def test_tiff_jpeg_tables_tag_and_tiles(tmp_path):
    """jpeg_tables=True factors shared DQT/DHT into tag 347 with
    abbreviated per-tile streams: pixels identical to the
    tables-inline file bit for bit, file smaller once several tiles
    share the tables. RGB rides the YCbCr transform both ways."""
    import os

    rng = np.random.default_rng(43)
    base = np.zeros((20, 28, 3), "f8")
    base[..., 0] = np.arange(28)[None, :] * 4
    base[..., 1] = np.arange(20)[:, None] * 6
    base[..., 2] = 80.0
    arr = (base + rng.normal(0, 1.5, base.shape)).clip(0, 255).astype("u1")
    blobs = {}
    for tag, tbl in (("inline", False), ("shared", True)):
        blobs[tag] = encode_geotiff(
            arr, origin_x=0.0, origin_y=0.0, pixel_w=1.0, pixel_h=1.0,
            tile=(16, 16), compression="jpeg", jpeg_quality_divisor=1,
            jpeg_tables=tbl,
        )
        with open(str(tmp_path / f"{tag}.tif"), "wb") as f:
            f.write(blobs[tag])
    got_inline, _, _ = read_tiff_minimal(str(tmp_path / "inline.tif"))
    got_shared, _, _ = read_tiff_minimal(str(tmp_path / "shared.tif"))
    assert np.array_equal(got_inline, got_shared)
    assert got_inline.shape == (20, 28, 3)
    assert np.max(np.abs(got_inline - arr)) <= 4  # YCbCr+DCT rounding
    # structure: inline carries 2 DQT segments (luma+chroma) in each of
    # the 4 tiles; shared factors them into ONE JPEGTables stream
    assert blobs["inline"].count(b"\xff\xdb") == 8
    assert blobs["shared"].count(b"\xff\xdb") == 2
    assert blobs["inline"].count(b"\xff\xc4") == 16  # 4 DHT x 4 tiles
    assert blobs["shared"].count(b"\xff\xc4") == 4
    assert os.path.getsize(str(tmp_path / "shared.tif")) > 0


def test_tiff_jpeg_overviews_compose(tmp_path):
    """JPEG chunks compose with the overview IFD chain: each level is
    its own set of complete/abbreviated streams."""
    from data_pipelines_spark.operators.jpeg import (
        decode_jpeg,
        encode_jpeg_baseline,
    )

    arr = (
        (np.arange(24)[:, None] * 7 + np.arange(32)[None, :] * 3) % 256
    ).astype("u1")
    path = str(tmp_path / "ov.tif")
    with open(path, "wb") as f:
        f.write(
            encode_geotiff(
                arr, origin_x=0.0, origin_y=0.0, pixel_w=1.0, pixel_h=1.0,
                overviews=(2,), compression="jpeg", jpeg_quality_divisor=1,
                jpeg_tables=True,
            )
        )
    full, _, _ = read_tiff_minimal(path)
    ov, _, _ = read_tiff_minimal(path, overview=1)
    assert np.array_equal(
        ov,
        decode_jpeg(
            encode_jpeg_baseline(arr[::2, ::2], quality_divisor=1)
        ).astype("f8"),
    )
    assert full.shape == (24, 32) and ov.shape == (12, 16)


def test_tiff_jpeg_validation_gates():
    arr8 = np.zeros((4, 4), "u1")
    for kwargs, msg in [
        (dict(values=np.zeros((4, 4), "f4")), "uint8"),
        (dict(values=np.zeros((4, 4, 2), "u1")), "bands"),
        (dict(values=np.zeros((4, 4, 3), "u1"), planar=True), "chunky"),
        (dict(values=arr8, predictor=2), "predictors"),
    ]:
        with pytest.raises(ValueError, match=msg):
            encode_geotiff(
                origin_x=0.0, origin_y=0.0, pixel_w=1.0, pixel_h=1.0,
                compression="jpeg", **kwargs,
            )
    with pytest.raises(ValueError, match="jpeg_tables"):
        encode_geotiff(
            arr8, origin_x=0.0, origin_y=0.0, pixel_w=1.0, pixel_h=1.0,
            compression="deflate", jpeg_tables=True,
        )


def test_tiff_deflate_predictor_roundtrip_and_shrinks(tmp_path):
    """PREDICTOR=2 + DEFLATE on a smooth integer gradient: exact
    round-trip (modular diff/cumsum), and the predictor actually
    reduces the compressed size — the point of using it."""
    arr = (np.arange(64, dtype="<u2")[None, :] * 7
           + np.arange(48, dtype="<u2")[:, None] * 3)
    p_plain = str(tmp_path / "plain.tif")
    p_pred = str(tmp_path / "pred.tif")
    import os
    for path, pred in ((p_plain, False), (p_pred, True)):
        with open(path, "wb") as f:
            f.write(
                encode_geotiff(
                    arr.astype("<u2"), origin_x=0.0, origin_y=0.0,
                    pixel_w=1.0, pixel_h=1.0,
                    compression="deflate", predictor=pred,
                )
            )
        got, _, _ = read_tiff_minimal(path)
        assert np.array_equal(got, arr.astype("f8"))
    assert os.path.getsize(p_pred) < os.path.getsize(p_plain)


def test_tiff_deflate_predictor_multiband_wraparound(tmp_path):
    """Per-sample differencing with values that wrap the uint8 range."""
    arr = np.array(
        [[[250, 5], [3, 250], [255, 0]],
         [[0, 255], [128, 1], [64, 200]]],
        dtype="<u1",
    )
    path = str(tmp_path / "wrap.tif")
    with open(path, "wb") as f:
        f.write(
            encode_geotiff(
                arr, origin_x=0.0, origin_y=0.0, pixel_w=1.0, pixel_h=1.0,
                compression="deflate", predictor=True, tile=(2, 2),
            )
        )
    got, _, _ = read_tiff_minimal(path)
    assert np.array_equal(got, arr.astype("f8"))


def test_tiff_predictor_dtype_gates():
    """Explicit predictor numbers are validated against the dtype:
    2 is integer-only, 3 is float-only (the TIFF spec's own rule)."""
    with pytest.raises(ValueError, match="integer dtypes only"):
        encode_geotiff(
            np.zeros((2, 2), dtype="<f4"), origin_x=0, origin_y=0,
            pixel_w=1, pixel_h=1, predictor=2,
        )
    with pytest.raises(ValueError, match="float dtypes only"):
        encode_geotiff(
            np.zeros((2, 2), dtype="<u2"), origin_x=0, origin_y=0,
            pixel_w=1, pixel_h=1, predictor=3,
        )


def test_tiff_float_predictor_known_bytes():
    """Pin the PREDICTOR=3 wire transform to the libtiff fpDiff
    definition on a hand-computed case: row [1.0f, 2.0f] → big-endian
    byte planes 3F 40 | 80 00 | 00 00 | 00 00 → byte-diffed
    3F 01 40 80 00 00 00 00. Catches any symmetric encode/decode bug
    the round-trip tests alone would miss."""
    blob = encode_geotiff(
        np.array([[1.0, 2.0]], dtype="<f4"), origin_x=0, origin_y=0,
        pixel_w=1, pixel_h=1, predictor=True,
    )
    # Uncompressed single-strip layout: pixel bytes start right after
    # the 8-byte classic header.
    assert blob[8:16] == bytes([0x3F, 0x01, 0x40, 0x80, 0, 0, 0, 0])


def test_tiff_float_predictor_roundtrip_and_shrinks(tmp_path):
    """PREDICTOR=3 + DEFLATE on a smooth float gradient: exact
    round-trip and a real size win, f4 and f8, strip and tile."""
    import os

    base = (np.arange(64, dtype="f8")[None, :] * 0.37
            + np.arange(48, dtype="f8")[:, None] * 1.13)
    for dtype in ("<f4", "<f8"):
        arr = base.astype(dtype)
        sizes = {}
        for name, pred in (("plain", False), ("pred", True)):
            for tile in (None, (16, 16)):
                path = str(tmp_path / f"{dtype[1:]}-{name}-{bool(tile)}.tif")
                with open(path, "wb") as f:
                    f.write(
                        encode_geotiff(
                            arr, origin_x=0.0, origin_y=0.0,
                            pixel_w=1.0, pixel_h=1.0,
                            compression="deflate", predictor=pred,
                            tile=tile,
                        )
                    )
                got, _, _ = read_tiff_minimal(path)
                assert np.array_equal(got, arr.astype("f8"))
                sizes[(name, bool(tile))] = os.path.getsize(path)
        assert sizes[("pred", False)] < sizes[("plain", False)]


def test_tiff_float_predictor_multiband(tmp_path):
    """PREDICTOR=3 with pixel-interleaved samples: the byte-diff
    stride is samples-per-pixel, so channels difference independently."""
    rng = np.random.default_rng(7)
    arr = rng.normal(size=(5, 7, 3)).astype("<f4")
    path = str(tmp_path / "mb.tif")
    with open(path, "wb") as f:
        f.write(
            encode_geotiff(
                arr, origin_x=0.0, origin_y=0.0, pixel_w=1.0, pixel_h=1.0,
                compression="lzw", predictor=True, tile=(4, 2),
            )
        )
    got, _, _ = read_tiff_minimal(path)
    assert np.array_equal(got, arr.astype("f8"))


def test_netcdf_record_variables_roundtrip(tmp_path):
    """UNLIMITED-dimension variables: two record vars interleaved per
    record (time coord + a time x lat x lon grid) next to fixed coord
    vars — the append-friendly climate-archive layout."""
    from data_pipelines_spark.sources.raster import read_netcdf_minimal

    lat = np.array([10.0, 10.5, 11.0])
    lon = np.array([20.0, 20.25])
    times = np.array([0.0, 24.0, 48.0, 72.0])
    vals = np.arange(4 * 3 * 2, dtype="f8").reshape(4, 3, 2) * 1.5
    blob = encode_netcdf(
        {"time": 0, "lat": 3, "lon": 2},
        {
            "lat": (("lat",), lat, {}),
            "lon": (("lon",), lon, {}),
            "time": (("time",), times, {"units": "hours"}),
            "dis24": (("time", "lat", "lon"), vals, {}),
        },
    )
    path = str(tmp_path / "rec.nc")
    with open(path, "wb") as f:
        f.write(blob)
    dims, variables = read_netcdf_minimal(path)
    assert dims == {"time": 4, "lat": 3, "lon": 2}
    assert np.array_equal(variables["time"][1], times)
    assert variables["time"][2]["units"] == "hours"
    assert np.array_equal(variables["dis24"][1], vals)
    assert np.array_equal(variables["lat"][1], lat)


def test_netcdf_single_record_var_no_padding(tmp_path):
    """The spec's exception: with exactly one record variable the
    per-record slab is NOT padded to 4 bytes — an i2 slab of 3
    elements (6 bytes) must stride at 6, not 8."""
    from data_pipelines_spark.sources.raster import read_netcdf_minimal

    vals = np.arange(5 * 3, dtype="i2").reshape(5, 3)
    blob = encode_netcdf(
        {"t": 0, "x": 3},
        {"v": (("t", "x"), vals, {})},
    )
    path = str(tmp_path / "single.nc")
    with open(path, "wb") as f:
        f.write(blob)
    dims, variables = read_netcdf_minimal(path)
    assert dims == {"t": 5, "x": 3}
    assert np.array_equal(variables["v"][1], vals)


def test_netcdf_record_grid_long_form(spark, tmp_path):
    """read_netcdf_grid flattens a record variable with the time
    coordinate as a first-class dimension column."""
    from data_pipelines_spark.sources.raster import read_netcdf_grid

    times = np.array([1.0, 2.0])
    vals = np.array([[[1.0, 2.0]], [[3.0, 4.0]]])  # (t=2, y=1, x=2)
    blob = encode_netcdf(
        {"time": 0, "y": 1, "x": 2},
        {
            "time": (("time",), times, {}),
            "x": (("x",), np.array([5.0, 6.0]), {}),
            "v": (("time", "y", "x"), vals, {}),
        },
    )
    path = str(tmp_path / "grid.nc")
    with open(path, "wb") as f:
        f.write(blob)
    df = read_netcdf_grid(spark, path, "v")
    rows = {(r["time"], r["y"], r["x"]): r["v"] for r in df.collect()}
    assert len(rows) == 4
    assert rows[(1.0, 0.0, 5.0)] == 1.0
    assert rows[(2.0, 0.0, 6.0)] == 4.0


@pytest.mark.parametrize("tiled", [False, True])
@pytest.mark.parametrize("pred", [False, True])
def test_tiff_lzw_roundtrip(tmp_path, tiled, pred):
    """COMPRESS=LZW strips/tiles (with and without PREDICTOR=2)
    decompress bit-exactly through the TIFF-variant codec."""
    rng = np.random.default_rng(17)
    arr = rng.integers(0, 1 << 14, size=(9, 13)).astype("<u2")
    path = str(tmp_path / f"lzw_{tiled}_{pred}.tif")
    with open(path, "wb") as f:
        f.write(
            encode_geotiff(
                arr, origin_x=0.0, origin_y=0.0, pixel_w=1.0, pixel_h=1.0,
                tile=(4, 4) if tiled else None,
                compression="lzw", predictor=pred,
            )
        )
    got, _, _ = read_tiff_minimal(path)
    assert np.array_equal(got, arr.astype("f8"))


def test_lzw_codec_width_boundaries_and_clear():
    """Direct codec fuzz across the 9->10->11->12-bit width boundaries
    and a table-full Clear reset."""
    from data_pipelines_spark.sources.raster import _lzw_decode
    from data_pipelines_spark.sources.raster_encode import _lzw_encode

    rng = np.random.default_rng(2)
    for n in (0, 1, 300, 5_000, 400_000):
        payload = bytes(bytearray(rng.integers(0, 256, n, dtype=np.uint8)))
        assert _lzw_decode(_lzw_encode(payload)) == payload
    rep = b"xyz" * 300_000  # low-entropy: dense table growth + Clears
    assert _lzw_decode(_lzw_encode(rep)) == rep


def test_bigtiff_roundtrip_full_profile(tmp_path):
    """BigTIFF (version 43, 8-byte offsets, LONG8 chunk offsets) with
    tiles + overview + deflate + predictor + multi-band all at once."""
    rng = np.random.default_rng(23)
    arr = rng.integers(0, 60000, size=(10, 14, 2)).astype("<u2")
    path = str(tmp_path / "big.tif")
    with open(path, "wb") as f:
        f.write(
            encode_geotiff(
                arr, origin_x=7.0, origin_y=9.0, pixel_w=0.25, pixel_h=0.5,
                tile=(8, 4), overviews=(2,),
                compression="deflate", predictor=True, bigtiff=True,
            )
        )
    got, xs, ys = read_tiff_minimal(path)
    assert got.shape == (10, 14, 2)
    assert np.array_equal(got, arr.astype("f8"))
    assert xs[0] == 7.0 and ys[0] == 9.0
    ov, _, _ = read_tiff_minimal(path, overview=1)
    assert np.array_equal(ov, arr[::2, ::2].astype("f8"))


def test_bigtiff_strip_plain(tmp_path):
    arr = np.arange(12, dtype="<f8").reshape(3, 4)
    path = str(tmp_path / "bigs.tif")
    with open(path, "wb") as f:
        f.write(
            encode_geotiff(
                arr, origin_x=0.0, origin_y=0.0, pixel_w=1.0, pixel_h=1.0,
                bigtiff=True,
            )
        )
    got, _, _ = read_tiff_minimal(path)
    assert np.array_equal(got, arr)


@pytest.mark.parametrize("compressor", [None, "gzip"])
def test_zarr_v3_roundtrip(tmp_path, compressor):
    """Zarr v3: zarr.json metadata, c/i/j chunk keys, bytes(+gzip)
    codec chain, first-class dimension_names, missing-chunk fill."""
    vals = np.arange(24, dtype="<i4").reshape(4, 6) * 3
    store = str(tmp_path / f"v3_{compressor}.zarr")
    write_zarr_store(
        store, "dis24", vals,
        {"lat": np.arange(4.0), "lon": np.arange(6.0)},
        chunks=(2, 4), compressor=compressor, fill_value=-9,
        omit_chunks={(1, 1)}, zarr_format=3,
    )
    import os

    assert os.path.exists(f"{store}/dis24/zarr.json")
    assert os.path.exists(f"{store}/dis24/c/0/0")
    arr, attrs = read_zarr_minimal(f"{store}/dis24")
    expect = vals.copy()
    expect[2:4, 4:6] = -9
    assert np.array_equal(arr, expect)
    assert attrs["_ARRAY_DIMENSIONS"] == ["lat", "lon"]


def test_zarr_v3_grid_long_form(spark, tmp_path):
    from data_pipelines_spark.sources.raster import read_zarr_grid

    vals = np.arange(6, dtype="<f8").reshape(2, 3)
    store = str(tmp_path / "v3g.zarr")
    write_zarr_store(
        store, "v", vals,
        {"y": np.array([1.0, 2.0]), "x": np.array([5.0, 6.0, 7.0])},
        zarr_format=3, compressor="gzip",
    )
    df = read_zarr_grid(spark, store, "v")
    rows = {(r.y, r.x): r.v for r in df.collect()}
    assert len(rows) == 6
    assert rows[(2.0, 7.0)] == 5.0


def test_zarr_v3_gates(tmp_path):
    import json
    import os

    with pytest.raises(ValueError, match="v2 knobs"):
        write_zarr_store(
            str(tmp_path / "bad"), "v", np.zeros((2, 2)),
            {"a": np.arange(2.0), "b": np.arange(2.0)},
            zarr_format=3, filters=[{"id": "delta", "dtype": "<f8"}],
        )
    store = str(tmp_path / "blosc.zarr/v")
    os.makedirs(store)
    with open(f"{store}/zarr.json", "w") as f:
        json.dump(
            {
                "zarr_format": 3, "node_type": "array", "shape": [2],
                "data_type": "int32",
                "chunk_grid": {"name": "regular",
                               "configuration": {"chunk_shape": [2]}},
                "fill_value": 0,
                "codecs": [{"name": "blosc"}],
            },
            f,
        )
    with pytest.raises(NotImplementedError, match="blosc"):
        read_zarr_minimal(store)


def test_crc32c_known_vectors():
    """Pin the CRC-32C implementation to the published check values
    (RFC 3720 appendix / the standard 'check' input), independent of
    our own writer."""
    from data_pipelines_spark.sources.raster import _crc32c

    assert _crc32c(b"123456789") == 0xE3069283
    assert _crc32c(b"") == 0
    assert _crc32c(bytes(32)) == 0x8A9136AA


@pytest.mark.parametrize("compressor", [None, "gzip"])
def test_zarr_v3_sharded_roundtrip(tmp_path, compressor):
    """sharding_indexed: shards (outer chunks) hold 2x2 grids of inner
    chunks behind a crc32c-checked end index; omitted inner chunks
    read as fill, and an all-omitted shard produces no object at all."""
    import os

    rng = np.random.default_rng(3)
    vals = rng.integers(0, 1000, size=(11, 14)).astype("<f8")
    store = str(tmp_path / "sh.zarr")
    omit = {(0, 0), (2, 3), (4, 0), (4, 1), (5, 0), (5, 1)}
    write_zarr_store(
        store, "v", vals,
        {"lat": np.arange(11.0), "lon": np.arange(14.0)},
        chunks=(2, 3), shards=(4, 6), compressor=compressor,
        fill_value=-5.0, omit_chunks=omit, zarr_format=3,
    )
    # inner chunks (4,0),(4,1),(5,0),(5,1) cover shard (2,0) entirely
    assert not os.path.exists(f"{store}/v/c/2/0")
    assert os.path.exists(f"{store}/v/c/0/0")
    got, attrs = read_zarr_minimal(f"{store}/v")
    expect = vals.copy()
    for ci, cj in omit:
        expect[ci * 2 : (ci + 1) * 2, cj * 3 : (cj + 1) * 3] = -5.0
    assert np.array_equal(got, expect)
    assert attrs["_ARRAY_DIMENSIONS"] == ["lat", "lon"]


def test_zarr_v3_shard_index_corruption_detected(tmp_path):
    """A flipped byte in the shard index fails the crc32c check loudly
    instead of mis-addressing inner chunks."""
    store = str(tmp_path / "c.zarr")
    write_zarr_store(
        store, "v", np.arange(16.0).reshape(4, 4),
        {"a": np.arange(4.0), "b": np.arange(4.0)},
        chunks=(2, 2), shards=(4, 4), zarr_format=3, compressor=None,
    )
    fp = f"{store}/v/c/0/0"
    blob = bytearray(open(fp, "rb").read())
    blob[-6] ^= 0xFF  # inside the index, outside the stored CRC
    with open(fp, "wb") as f:
        f.write(bytes(blob))
    with pytest.raises(ValueError, match="crc32c mismatch"):
        read_zarr_minimal(f"{store}/v")


def test_zarr_v3_shard_validation():
    with pytest.raises(ValueError, match="v3 feature"):
        write_zarr_store(
            "/tmp/nope", "v", np.zeros((4, 4)),
            {"a": np.arange(4.0), "b": np.arange(4.0)},
            chunks=(2, 2), shards=(4, 4), zarr_format=2,
        )
    with pytest.raises(ValueError, match="divide shard shape"):
        write_zarr_store(
            "/tmp/nope", "v", np.zeros((4, 4)),
            {"a": np.arange(4.0), "b": np.arange(4.0)},
            chunks=(3, 2), shards=(4, 4), zarr_format=3, compressor=None,
        )


@pytest.mark.parametrize("nbits", [8, 12, 16, 24, 30])
def test_grib2_png_packing_roundtrip(tmp_path, nbits):
    """Data template 5.41 (PNG packing, the NOAA MRMS-style encoding):
    exact round-trip across every PNG depth tier the template maps to
    (gray 8/16, RGB 24, RGBA 32), with an ensemble pair, decimal
    scaling, and a bitmap (present points packed as an Nx1 image)."""
    rng = np.random.default_rng(9)
    cap = ((1 << nbits) - 1) / 1000.0
    vals = np.round(
        rng.uniform(0, cap * 0.9, size=(8, 11)), 3
    )
    withnan = vals.copy()
    withnan[1:3, 4:7] = np.nan
    blob = encode_grib2(
        [(0, vals), (1, withnan)],
        lat0=35.0, lon0=355.0, dlat=0.1, dlon=0.1,
        d_scale=3, nbits=nbits, packing="png",
    )
    path = str(tmp_path / "p.grib2")
    with open(path, "wb") as f:
        f.write(blob)
    msgs = read_grib2_minimal(path)
    assert [m["member"] for m, *_ in msgs] == [0, 1]
    for (_m, got, _la, _lo), expect in zip(msgs, (vals, withnan)):
        assert np.array_equal(np.isnan(got), np.isnan(expect))
        assert np.allclose(
            got[~np.isnan(got)], expect[~np.isnan(expect)], atol=1e-9
        )


def test_grib2_png_packing_rejects_wide_values():
    with pytest.raises(ValueError, match="caps at 32"):
        encode_grib2(
            [(None, np.array([[1.0]]))],
            lat0=0, lon0=0, dlat=1, dlon=1, nbits=33, packing="png",
        )


def test_zarr_v3_transpose_codec_roundtrip(tmp_path):
    """order="F" at zarr_format=3 becomes the spec's transpose codec
    (axes reversed); round-trips through plain, gzip, and sharded
    layouts, including an omitted inner chunk."""
    import json
    import os

    rng = np.random.default_rng(4)
    vals = rng.integers(0, 500, size=(9, 14)).astype("<i4")
    for comp in (None, "gzip"):
        for shards in (None, (4, 6)):
            store = str(tmp_path / f"t_{comp}_{bool(shards)}.zarr")
            write_zarr_store(
                store, "v", vals,
                {"a": np.arange(9.0), "b": np.arange(14.0)},
                chunks=(2, 3), shards=shards, compressor=comp,
                order="F", zarr_format=3, fill_value=0,
                omit_chunks={(1, 1)},
            )
            got, _ = read_zarr_minimal(f"{store}/v")
            expect = vals.copy()
            expect[2:4, 3:6] = 0
            assert np.array_equal(got, expect), (comp, shards)
            meta = json.load(open(os.path.join(store, "v", "zarr.json")))
            c0 = meta["codecs"][0]
            chain = (
                c0["configuration"]["codecs"]
                if c0["name"] == "sharding_indexed" else meta["codecs"]
            )
            assert chain[0]["name"] == "transpose"
            assert chain[0]["configuration"]["order"] == [1, 0]


def test_tiff_planar_configuration_roundtrip(tmp_path):
    """PlanarConfiguration=2 (band-separate chunks, band-major order):
    strip and tile layouts, both predictors, overviews — each band's
    chunks decode with stride 1 and restack pixel-interleaved."""
    rng = np.random.default_rng(6)
    for dtype, comp, pred, tile in [
        ("<u2", None, False, None),
        ("<i4", "deflate", True, (3, 4)),
        ("<f4", "deflate", True, (4, 4)),
        ("<u1", "lzw", True, None),
    ]:
        arr = rng.integers(0, 200, size=(9, 13, 3)).astype(dtype)
        path = str(tmp_path / f"p_{dtype[1:]}_{comp}.tif")
        with open(path, "wb") as f:
            f.write(
                encode_geotiff(
                    arr, origin_x=0.0, origin_y=0.0, pixel_w=1.0,
                    pixel_h=1.0, compression=comp, predictor=pred,
                    tile=tile, planar=True,
                    overviews=(2,) if tile else (),
                )
            )
        got, _, _ = read_tiff_minimal(path)
        assert np.array_equal(got, arr.astype("f8")), (dtype, comp)
        if tile:
            ov, _, _ = read_tiff_minimal(path, overview=1)
            assert np.array_equal(ov, arr[::2, ::2].astype("f8"))


def test_geotiff_crs_geokeys_roundtrip(tmp_path):
    """GeoKeyDirectory (tag 34735): epsg= writes GeographicType (4326)
    or ProjectedCSType (e.g. 32632) keys; read_tiff_crs recovers the
    code from classic AND BigTIFF files; files without the tag (and
    user-defined codes) return None. The pixel payload is untouched."""
    from data_pipelines_spark.sources.raster import read_tiff_crs

    arr = np.arange(12, dtype="<i2").reshape(3, 4)
    kw = dict(origin_x=10.0, origin_y=50.0, pixel_w=0.25, pixel_h=0.5)
    cases = [
        (dict(epsg=4326), 4326),
        (dict(epsg=32632, projected=True), 32632),
        (dict(epsg=4326, bigtiff=True), 4326),
        (dict(), None),
    ]
    for i, (extra, want) in enumerate(cases):
        path = str(tmp_path / f"c{i}.tif")
        with open(path, "wb") as f:
            f.write(encode_geotiff(arr, **kw, **extra))
        assert read_tiff_crs(path) == want, extra
        got, xs, _ys = read_tiff_minimal(path)
        assert np.array_equal(got, arr.astype("f8"))
        assert xs[0] == 10.0
    bad = str(tmp_path / "bad.tif")
    with open(bad, "wb") as f:
        f.write(b"JUNKFILE")
    with pytest.raises(ValueError, match="not a TIFF"):
        read_tiff_crs(bad)
