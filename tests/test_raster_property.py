"""Property-based write→read round-trips for the raster boundary:
hypothesis drives random shapes, dtypes, layouts, and packing
parameters through every encoder/parser pair. Deadlines are disabled
(first-example JIT warmup) and example counts kept modest — these are
pure-python/numpy kernels, no Spark session involved."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

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

DIMS = st.tuples(st.integers(1, 9), st.integers(1, 9))


@settings(max_examples=25, deadline=None)
@given(
    dims=DIMS,
    dtype=st.sampled_from(["u1", "u2", "i2", "i4", "f4", "f8"]),
    tiled=st.booleans(),
    compression=st.sampled_from([None, "deflate", "lzw"]),
    bigtiff=st.booleans(),
    bands=st.sampled_from([1, 3]),
    planar=st.booleans(),
    seed=st.integers(0, 2**31 - 1),
)
def test_tiff_roundtrip_property(tmp_path_factory, dims, dtype, tiled,
                                 compression, bigtiff, bands, planar,
                                 seed):
    h, w = dims
    rng = np.random.default_rng(seed)
    shape = (h, w) if bands == 1 else (h, w, bands)
    arr = rng.integers(0, 200, size=shape).astype(dtype)
    # True auto-selects PREDICTOR=2 on integers, PREDICTOR=3 on floats.
    predictor = compression is not None
    blob = encode_geotiff(
        arr, origin_x=1.0, origin_y=2.0, pixel_w=0.5, pixel_h=0.25,
        tile=(3, 2) if tiled else None,
        compression=compression,
        predictor=predictor,
        bigtiff=bigtiff,
        planar=planar,
    )
    path = tmp_path_factory.mktemp("tiff") / "t.tif"
    path.write_bytes(blob)
    got, xs, ys = read_tiff_minimal(str(path))
    assert np.array_equal(got, arr.astype("f8"))
    assert np.array_equal(xs, 1.0 + np.arange(w) * 0.5)
    assert np.array_equal(ys, 2.0 - np.arange(h) * 0.25)


@settings(max_examples=25, deadline=None)
@given(
    dims=DIMS,
    edition=st.sampled_from([1, 2]),
    nbits=st.sampled_from([4, 8, 11, 12, 16, 24]),
    members=st.integers(1, 3),
    nan_frac=st.floats(0.0, 0.5),
    packing=st.sampled_from(["simple", "complex", "complex_sd", "png"]),
    group_len=st.integers(1, 30),
    sd_order=st.integers(1, 2),
    use_mvm=st.booleans(),
    seed=st.integers(0, 2**31 - 1),
)
def test_grib_roundtrip_property(tmp_path_factory, dims, edition, nbits,
                                 members, nan_frac, packing, group_len,
                                 sd_order, use_mvm, seed):
    nj, ni = dims
    rng = np.random.default_rng(seed)
    msgs = []
    min_present = nj * ni
    for m in range(members):
        vals = rng.integers(
            0, (1 << nbits) - 1, size=(nj, ni)
        ).astype("f8")
        mask = rng.random((nj, ni)) < nan_frac
        if mask.all():
            mask[0, 0] = False  # keep one present value
        vals[mask] = np.nan
        min_present = min(min_present, int((~mask).sum()))
        msgs.append((m, vals))
    if edition == 1:
        blob = encode_grib1(msgs, lat0=50.0, lon0=10.0, dlat=0.5,
                            dlon=0.25, nbits=nbits)
    else:
        if packing == "complex_sd" and min_present <= sd_order:
            packing = "complex"  # differencing needs > order points
        missing = (
            "mvm"
            if use_mvm and packing in ("complex", "complex_sd")
            else "bitmap"
        )
        blob = encode_grib2(msgs, lat0=50.0, lon0=10.0, dlat=0.5,
                            dlon=0.25, nbits=nbits, packing=packing,
                            group_len=group_len, sd_order=sd_order,
                            missing=missing)
    path = tmp_path_factory.mktemp("grib") / f"g.grib{edition}"
    path.write_bytes(blob)
    out = read_grib_minimal(str(path))
    assert len(out) == members
    for (meta, got, lats, lons), (m, vals) in zip(out, msgs):
        assert meta.get("member", 0) == m
        assert np.array_equal(np.isnan(got), np.isnan(vals))
        assert np.array_equal(got[~np.isnan(got)], vals[~np.isnan(vals)])


@settings(max_examples=20, deadline=None)
@given(
    dims=DIMS,
    chunks=st.tuples(st.integers(1, 4), st.integers(1, 4)),
    order=st.sampled_from(["C", "F"]),
    compressor=st.sampled_from([None, "zlib", "gzip", "bz2", "lzma"]),
    use_delta=st.booleans(),
    zarr_format=st.sampled_from([2, 3]),
    shard_mult=st.tuples(st.integers(1, 3), st.integers(1, 3)),
    use_shards=st.booleans(),
    seed=st.integers(0, 2**31 - 1),
)
def test_zarr_roundtrip_property(tmp_path_factory, dims, chunks, order,
                                 compressor, use_delta, zarr_format,
                                 shard_mult, use_shards, seed):
    h, w = dims
    rng = np.random.default_rng(seed)
    vals = rng.integers(-1000, 1000, size=(h, w)).astype("<i4")
    store = str(tmp_path_factory.mktemp("zarr") / "s.zarr")
    if zarr_format == 3:
        # v3 path: no filters, gzip-or-raw, optional shards (outer
        # chunk = inner chunk × sampled multiplier per axis); order="F"
        # becomes the transpose codec.
        use_delta = False
        if compressor in ("zlib", "bz2", "lzma"):
            compressor = "gzip"
        shards = (
            tuple(c * m for c, m in zip(chunks, shard_mult))
            if use_shards else None
        )
    else:
        shards = None
    write_zarr_store(
        store, "v", vals,
        {"a": np.arange(h, dtype="f8"), "b": np.arange(w, dtype="f8")},
        chunks=chunks, order=order, compressor=compressor,
        filters=[{"id": "delta", "dtype": "<i4"}] if use_delta else None,
        zarr_format=zarr_format, shards=shards,
    )
    arr, _ = read_zarr_minimal(f"{store}/v")
    assert np.array_equal(arr, vals)


@settings(max_examples=20, deadline=None)
@given(
    n_fixed=st.integers(1, 6),
    n_rec=st.integers(0, 5),
    rec_vars=st.integers(1, 3),
    dtype=st.sampled_from(["i2", "i4", "f4", "f8"]),
    seed=st.integers(0, 2**31 - 1),
)
def test_netcdf_record_roundtrip_property(tmp_path_factory, n_fixed, n_rec,
                                          rec_vars, dtype, seed):
    rng = np.random.default_rng(seed)
    dims = {"t": 0, "x": n_fixed}
    variables = {
        "x": (("x",), np.arange(n_fixed, dtype="f8"), {}),
    }
    for i in range(rec_vars):
        arr = rng.integers(-100, 100, size=(n_rec, n_fixed)).astype(dtype)
        variables[f"v{i}"] = (("t", "x"), arr, {})
    path = str(tmp_path_factory.mktemp("nc") / "r.nc")
    with open(path, "wb") as f:
        f.write(encode_netcdf(dims, variables))
    got_dims, got_vars = read_netcdf_minimal(path)
    assert got_dims == {"t": n_rec, "x": n_fixed}
    for i in range(rec_vars):
        assert np.array_equal(got_vars[f"v{i}"][1], variables[f"v{i}"][1])
    assert np.array_equal(got_vars["x"][1], variables["x"][1])
