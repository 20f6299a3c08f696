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


def test_write_partitioned_file_count_control(spark):
    """files_per_partition bounds the small-files explosion; combined
    with max_records_per_file a skewed hive partition still splits."""

    def parquet_files(root, part):
        d = os.path.join(root, f"leadtime_hour={part}")
        return [f for f in os.listdir(d) if f.endswith(".parquet")]

    df = (
        spark.range(1000)
        .repartition(16)  # many upstream tasks touching every partition
        .select(
            F.col("id"),
            (F.col("id") % 4).alias("leadtime_hour"),
            (F.col("id") * 2.0).alias("value"),
        )
    )
    tmp = tempfile.mkdtemp(prefix="dps_sink_files_")
    try:
        # naive write: each of 16 tasks writes each of 4 partitions
        write_partitioned(df, f"{tmp}/naive", ["leadtime_hour"])
        assert len(parquet_files(f"{tmp}/naive", 0)) > 1

        write_partitioned(
            df, f"{tmp}/one", ["leadtime_hour"], files_per_partition=1
        )
        for p in range(4):
            assert len(parquet_files(f"{tmp}/one", p)) == 1
        assert spark.read.parquet(f"{tmp}/one").count() == 1000

        write_partitioned(
            df, f"{tmp}/two", ["leadtime_hour"], files_per_partition=2
        )
        for p in range(4):
            assert 1 <= len(parquet_files(f"{tmp}/two", p)) <= 2
        assert spark.read.parquet(f"{tmp}/two").count() == 1000

        # skew escape hatch: a 250-row partition capped at 100 rows/file
        write_partitioned(
            df,
            f"{tmp}/capped",
            ["leadtime_hour"],
            files_per_partition=1,
            max_records_per_file=100,
        )
        assert len(parquet_files(f"{tmp}/capped", 0)) == 3  # ceil(250/100)
        assert spark.read.parquet(f"{tmp}/capped").count() == 1000

        with pytest.raises(ValueError, match="files_per_partition"):
            write_partitioned(
                df, f"{tmp}/bad", ["leadtime_hour"], files_per_partition=0
            )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_codec_readers_gated(spark):
    """Unsupported format profiles raise with an actionable message
    instead of crashing mid-parse."""
    from data_pipelines_spark.sources.raster import (
        read_grib2_minimal,
        read_netcdf_minimal,
    )

    # Both S4/S5 readers now have real dependency-free fallbacks for the
    # simple profiles; what stays gated (with an actionable pointer to
    # the codec path) is the fancy formats those fallbacks reject.
    with pytest.raises(ValueError, match="classic NetCDF"):
        read_netcdf_minimal(__file__)          # not a CDF file
    with pytest.raises(ValueError, match="GRIB indicator"):
        read_grib2_minimal(__file__)           # not a GRIB file


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


def _write_tiny_geotiff(path: str) -> "np.ndarray":
    """Hand-assemble a baseline little-endian single-band float32
    GeoTIFF (the COMPRESS=NONE profile gdal_translate emits) so the S6
    reader can be exercised end-to-end without rasterio."""
    import struct

    import numpy as np

    w, h = 4, 3
    arr = np.arange(w * h, dtype="<f4").reshape(h, w) * 1.5
    pixels = arr.tobytes()
    data_off = 8
    ifd_off = data_off + len(pixels)

    entries = []

    def entry(tag, typ, cnt, value_bytes):
        entries.append(struct.pack("<HHI", tag, typ, cnt) + value_bytes.ljust(4, b"\0"))

    n = 12
    ext_off = ifd_off + 2 + n * 12 + 4
    entry(256, 3, 1, struct.pack("<H", w))            # ImageWidth
    entry(257, 3, 1, struct.pack("<H", h))            # ImageLength
    entry(258, 3, 1, struct.pack("<H", 32))           # BitsPerSample
    entry(259, 3, 1, struct.pack("<H", 1))            # Compression=none
    entry(262, 3, 1, struct.pack("<H", 1))            # Photometric
    entry(273, 4, 1, struct.pack("<I", data_off))     # StripOffsets
    entry(277, 3, 1, struct.pack("<H", 1))            # SamplesPerPixel
    entry(278, 4, 1, struct.pack("<I", h))            # RowsPerStrip
    entry(279, 4, 1, struct.pack("<I", len(pixels)))  # StripByteCounts
    entry(339, 3, 1, struct.pack("<H", 3))            # SampleFormat=float
    entry(33550, 12, 3, struct.pack("<I", ext_off))   # ModelPixelScale
    entry(33922, 12, 6, struct.pack("<I", ext_off + 24))  # ModelTiepoint

    scale = struct.pack("<3d", 0.25, 0.5, 0.0)
    # raster (0,0) pinned to world (10.0, 60.0)
    tiepoint = struct.pack("<6d", 0.0, 0.0, 0.0, 10.0, 60.0, 0.0)

    blob = (
        b"II" + struct.pack("<HI", 42, ifd_off)
        + pixels
        + struct.pack("<H", n) + b"".join(entries) + struct.pack("<I", 0)
        + scale + tiepoint
    )
    with open(path, "wb") as f:
        f.write(blob)
    return arr


def test_geotiff_ingestion_end_to_end(spark, tmp_path):
    """S6 smoke-proof: a real (baseline) GeoTIFF file on disk, read by
    the engine's reader into long-form rows with world coordinates."""
    import numpy as np

    from data_pipelines_spark.sources.raster import read_geotiff, read_tiff_minimal

    path = str(tmp_path / "tiny.tif")
    arr = _write_tiny_geotiff(path)

    raw, xs, ys = read_tiff_minimal(path)
    assert np.allclose(raw, arr)
    assert np.allclose(xs, 10.0 + np.arange(4) * 0.25)
    assert np.allclose(ys, 60.0 - np.arange(3) * 0.5)

    df = read_geotiff(spark, path, value_col="elev")
    rows = {(r["y"], r["x"]): r["elev"] for r in df.collect()}
    assert len(rows) == 12
    assert rows[(60.0, 10.0)] == 0.0
    assert rows[(60.0 - 0.5, 10.0 + 0.25)] == arr[1, 1]
    assert rows[(59.0, 10.75)] == arr[2, 3]


def _write_tiny_netcdf(path: str) -> "np.ndarray":
    """Assemble a classic (CDF-1) NetCDF byte-for-byte: dims lat(3) x
    lon(4); coordinate vars lat/lon (f8); data var dis24 (f8, lat x lon)
    with a _FillValue attribute and one filled cell."""
    import struct

    import numpy as np

    lat = np.array([10.0, 10.5, 11.0])
    lon = np.array([20.0, 20.25, 20.5, 20.75])
    vals = np.arange(12, dtype="f8").reshape(3, 4)
    vals[1, 2] = -999.0  # masked by _FillValue

    def nc_name(s: str) -> bytes:
        b = s.encode()
        return struct.pack(">I", len(b)) + b + b"\x00" * ((4 - len(b) % 4) % 4)

    def build(begins: dict[str, int]) -> bytes:
        h = b"CDF\x01" + struct.pack(">I", 0)          # magic + numrecs
        h += struct.pack(">II", 0x0A, 2)               # NC_DIMENSION x2
        h += nc_name("lat") + struct.pack(">I", 3)
        h += nc_name("lon") + struct.pack(">I", 4)
        h += struct.pack(">II", 0, 0)                  # global attrs ABSENT
        h += struct.pack(">II", 0x0B, 3)               # NC_VARIABLE x3
        # lat(f8[lat]) / lon(f8[lon]) — no attrs
        h += nc_name("lat") + struct.pack(">II", 1, 0)
        h += struct.pack(">II", 0, 0)
        h += struct.pack(">III", 6, 24, begins.get("lat", 0))
        h += nc_name("lon") + struct.pack(">II", 1, 1)
        h += struct.pack(">II", 0, 0)
        h += struct.pack(">III", 6, 32, begins.get("lon", 0))
        # dis24(f8[lat,lon]) with _FillValue = -999.0
        h += nc_name("dis24") + struct.pack(">III", 2, 0, 1)
        h += struct.pack(">II", 0x0C, 1)
        h += nc_name("_FillValue") + struct.pack(">II", 6, 1)
        h += struct.pack(">d", -999.0)
        h += struct.pack(">III", 6, 96, begins.get("dis24", 0))
        return h

    hdr_len = len(build({}))
    begins = {"lat": hdr_len, "lon": hdr_len + 24, "dis24": hdr_len + 56}
    body = (
        lat.astype(">f8").tobytes()
        + lon.astype(">f8").tobytes()
        + vals.astype(">f8").tobytes()
    )
    with open(path, "wb") as f:
        f.write(build(begins) + body)
    return vals


def test_netcdf_ingestion_end_to_end(spark, tmp_path):
    import numpy as np

    from data_pipelines_spark.sources.raster import (
        read_netcdf_grid,
        read_netcdf_minimal,
    )

    path = str(tmp_path / "grid.nc")
    vals = _write_tiny_netcdf(path)

    dims, variables = read_netcdf_minimal(path)
    assert dims == {"lat": 3, "lon": 4}
    dim_names, arr, vatts = variables["dis24"]
    assert dim_names == ("lat", "lon")
    assert np.array_equal(arr, vals)
    assert vatts["_FillValue"] == -999.0

    df = read_netcdf_grid(spark, path, "dis24")
    rows = {(r["lat"], r["lon"]): r["dis24"] for r in df.collect()}
    assert len(rows) == 11                      # fill cell dropped as NaN
    assert rows[(10.0, 20.0)] == 0.0
    assert rows[(11.0, 20.75)] == 11.0
    assert (10.5, 20.5) not in rows             # the filled cell


def _grib2_message(member: int, x_vals: "np.ndarray", ni: int, nj: int) -> bytes:
    """Assemble one GRIB2 message: regular lat/lon grid (template 3.0),
    ensemble product (template 4.1), simple packing (template 5.0,
    8 bits, R=1.5, E=-1, D=1), no bitmap."""
    import struct

    n = ni * nj
    sec1 = struct.pack(">IB", 21, 1) + b"\x00" * 16
    body3 = bytearray(72)
    body3[0:4] = struct.pack(">I", 72)
    body3[4] = 3
    body3[6:10] = struct.pack(">I", n)
    body3[12:14] = struct.pack(">H", 0)              # template 3.0
    body3[30:34] = struct.pack(">I", ni)
    body3[34:38] = struct.pack(">I", nj)
    body3[46:50] = struct.pack(">I", 50_000_000)     # la1 = 50.0
    body3[50:54] = struct.pack(">I", 10_000_000)     # lo1 = 10.0
    body3[63:67] = struct.pack(">I", 500_000)        # di = 0.5
    body3[67:71] = struct.pack(">I", 500_000)        # dj = 0.5
    body3[71] = 0                                    # scan: -j (lats desc)
    sec4 = (
        struct.pack(">IBHH", 37, 4, 0, 1)            # template 4.1
        + b"\x00" * 25                               # octets 10-34
        + bytes([0, member, 2])                      # type, pert no, n members
    )
    sec5 = (
        struct.pack(">IBIH", 21, 5, n, 0)
        + struct.pack(">f", 1.5)                     # reference value R
        + struct.pack(">H", 0x8001)                  # E = -1 (sign-magnitude)
        + struct.pack(">H", 0x0001)                  # D = 1
        + bytes([8, 0])                              # 8 bits, float field
    )
    sec6 = struct.pack(">IBB", 6, 6, 255)
    packed = bytes(int(v) for v in x_vals)
    sec7 = struct.pack(">IB", 5 + len(packed), 7) + packed
    payload = sec1 + bytes(body3) + sec4 + sec5 + sec6 + sec7 + b"7777"
    sec0 = b"GRIB\x00\x00\x00\x02" + struct.pack(">Q", 16 + len(payload))
    return sec0 + payload


def test_grib2_ensemble_ingestion_end_to_end(spark, tmp_path):
    import numpy as np

    from data_pipelines_spark.sources.raster import (
        read_grib2_minimal,
        read_grib_ensemble,
    )

    ni, nj = 3, 2
    x0 = np.array([0, 10, 20, 30, 40, 250])
    x1 = np.array([5, 15, 25, 35, 45, 255])
    path = str(tmp_path / "ens.grib2")
    with open(path, "wb") as f:
        f.write(_grib2_message(0, x0, ni, nj) + _grib2_message(1, x1, ni, nj))

    msgs = read_grib2_minimal(path)
    assert [m["member"] for m, *_ in msgs] == [0, 1]
    meta, vals, lats, lons = msgs[0]
    # simple packing: Y = (R + X*2^E) / 10^D with R=1.5, E=-1, D=1
    expect = (1.5 + x0 * 0.5) / 10.0
    assert np.allclose(vals.ravel(), expect)
    assert np.allclose(lats, [50.0, 49.5])           # -j scan: descending
    assert np.allclose(lons, [10.0, 10.5, 11.0])

    df = read_grib_ensemble(spark, path, value_var="dis24")
    rows = {
        (r["number"], r["latitude"], r["longitude"]): r["dis24"]
        for r in df.collect()
    }
    assert len(rows) == 12                           # 2 members x 6 cells
    assert abs(rows[(0.0, 50.0, 10.0)] - 0.15) < 1e-12
    assert abs(rows[(1.0, 49.5, 11.0)] - (1.5 + 255 * 0.5) / 10.0) < 1e-12


def _write_tiny_zarr(store: str) -> "np.ndarray":
    """Assemble a Zarr v2 store by hand: value array dis24(lat=3, lon=4)
    with zlib chunks (2x2 chunking, one chunk MISSING -> fill_value) and
    xarray-style _ARRAY_DIMENSIONS + coordinate arrays."""
    import json
    import os
    import zlib

    import numpy as np

    vals = np.arange(12, dtype="<f8").reshape(3, 4)

    def arr_dir(name: str, meta: dict, attrs: dict | None = None) -> str:
        d = os.path.join(store, name)
        os.makedirs(d, exist_ok=True)
        with open(os.path.join(d, ".zarray"), "w") as f:
            json.dump(meta, f)
        if attrs is not None:
            with open(os.path.join(d, ".zattrs"), "w") as f:
                json.dump(attrs, f)
        return d

    d = arr_dir(
        "dis24",
        {
            "zarr_format": 2, "shape": [3, 4], "chunks": [2, 2],
            "dtype": "<f8", "order": "C", "filters": None,
            "fill_value": -1.0, "compressor": {"id": "zlib", "level": 1},
        },
        {"_ARRAY_DIMENSIONS": ["lat", "lon"]},
    )
    for ci in range(2):
        for cj in range(2):
            if (ci, cj) == (1, 1):
                continue  # missing chunk -> fill_value
            block = np.full((2, 2), -1.0)
            src = vals[ci * 2 : ci * 2 + 2, cj * 2 : cj * 2 + 2]
            block[: src.shape[0], : src.shape[1]] = src
            with open(os.path.join(d, f"{ci}.{cj}"), "wb") as f:
                f.write(zlib.compress(block.astype("<f8").tobytes()))

    for name, coord in (("lat", [10.0, 10.5, 11.0]), ("lon", [20.0, 20.25, 20.5, 20.75])):
        cd = arr_dir(
            name,
            {
                "zarr_format": 2, "shape": [len(coord)], "chunks": [len(coord)],
                "dtype": "<f8", "order": "C", "filters": None,
                "fill_value": None, "compressor": None,
            },
        )
        with open(os.path.join(cd, "0"), "wb") as f:
            f.write(np.array(coord, dtype="<f8").tobytes())
    expected = vals.copy()
    expected[2:3, 2:4] = -1.0  # the missing (1,1) chunk region
    return expected


def test_zarr_ingestion_end_to_end(spark, tmp_path):
    import numpy as np

    from data_pipelines_spark.sources.raster import read_zarr_grid, read_zarr_minimal

    store = str(tmp_path / "store.zarr")
    expected = _write_tiny_zarr(store)

    arr, attrs = read_zarr_minimal(f"{store}/dis24")
    assert np.array_equal(arr, expected)
    assert attrs["_ARRAY_DIMENSIONS"] == ["lat", "lon"]

    df = read_zarr_grid(spark, store, "dis24")
    rows = {(r["lat"], r["lon"]): r["dis24"] for r in df.collect()}
    assert len(rows) == 12
    assert rows[(10.0, 20.0)] == 0.0
    assert rows[(11.0, 20.75)] == -1.0  # filled from the missing chunk


def test_fetch_binary_with_retries(spark, tmp_path):
    from data_pipelines_spark.sources.fetch import fetch_binary

    p = tmp_path / "payload.bin"
    p.write_bytes(b"grib-bytes")
    urls = [p.as_uri(), (tmp_path / "missing.bin").as_uri()]
    rows = {r["url"]: r for r in fetch_binary(spark, urls, max_retries=1).collect()}
    good, bad = rows[urls[0]], rows[urls[1]]
    assert good["ok"] and bytes(good["content"]) == b"grib-bytes"
    assert good["n_bytes"] == 10 and good["attempts"] == 1
    assert not bad["ok"] and bad["content"] is None
    assert bad["attempts"] == 2  # initial try + 1 retry
    assert "Error" in bad["error"] or "error" in bad["error"].lower()


def test_fsutils_roundtrip(spark, tmp_path):
    from data_pipelines_spark.sources import fsutils

    base = f"file://{tmp_path}"
    assert fsutils.mkdirs(spark, f"{base}/a")
    (tmp_path / "a" / "x.parquet").write_bytes(b"0123456789")
    (tmp_path / "a" / "y.parquet").write_bytes(b"01")
    (tmp_path / "a" / "z.txt").write_bytes(b"0")

    assert fsutils.exists(spark, f"{base}/a/x.parquet")
    assert not fsutils.exists(spark, f"{base}/a/missing")

    listed = fsutils.list_objects(spark, f"{base}/a")
    assert [f.path.rsplit("/", 1)[1] for f in listed] == [
        "x.parquet", "y.parquet", "z.txt",
    ]
    assert listed[0].size == 10 and not listed[0].is_dir

    globbed = fsutils.glob_objects(spark, f"{base}/a/*.parquet")
    assert [f.path.rsplit("/", 1)[1] for f in globbed] == [
        "x.parquet", "y.parquet",
    ]
    assert fsutils.glob_objects(spark, f"{base}/nope/*.parquet") == []

    fsutils.copy(spark, f"{base}/a/x.parquet", f"{base}/b/x.parquet")
    assert fsutils.exists(spark, f"{base}/b/x.parquet")
    assert (tmp_path / "b" / "x.parquet").read_bytes() == b"0123456789"

    assert fsutils.delete(spark, f"{base}/b/x.parquet")
    assert not fsutils.delete(spark, f"{base}/b/x.parquet")  # already gone
    assert fsutils.delete(spark, f"{base}/a", recursive=True)
    assert not fsutils.exists(spark, f"{base}/a")


def test_scheduler_pool_sets_and_restores(spark):
    from data_pipelines_spark.session import scheduler_pool

    sc = spark.sparkContext
    assert sc.getLocalProperty("spark.scheduler.pool") is None
    with scheduler_pool(spark, "sequential_backfill") as s:
        assert sc.getLocalProperty("spark.scheduler.pool") == "sequential_backfill"
        # jobs actually run under the pool assignment
        assert s.range(10).count() == 10
        with scheduler_pool(spark, "inner"):
            assert sc.getLocalProperty("spark.scheduler.pool") == "inner"
        assert sc.getLocalProperty("spark.scheduler.pool") == "sequential_backfill"
    assert sc.getLocalProperty("spark.scheduler.pool") is None


def test_jsonl_corpus_roundtrip(spark, tmp_path):
    import json

    from data_pipelines_spark.sources import corpus_io

    src = tmp_path / "corpus"
    src.mkdir()
    rows = [
        {"text": "the quick brown fox", "source": "crawl",
         "lang": "en", "url": "http://a.example/1"},
        {"text": "der schnelle fuchs", "source": "books",
         "lang": "de", "url": None},
    ]
    lines = [json.dumps(r) for r in rows] + ['{"text": broken']
    (src / "part0.jsonl").write_text("\n".join(lines))

    df = corpus_io.read_jsonl(spark, str(src))
    good = df.where(F.col("_corrupt").isNull())
    assert good.count() == 2
    out = {r["text"]: r for r in good.collect()}
    assert out["the quick brown fox"]["source"] == "crawl"
    # corrupt line captured, not fatal (must co-select a data column —
    # Spark disallows corrupt-column-only queries on raw JSON scans)
    assert df.select("text", "_corrupt").where(
        F.col("_corrupt").isNotNull()).count() == 1
    # content-derived ids are stable across re-reads
    a = sorted(r["doc_id"] for r in corpus_io.read_jsonl(spark, str(src))
               .where(F.col("_corrupt").isNull()).collect())
    b = sorted(r["doc_id"] for r in good.collect())
    assert a == b and len(set(a)) == 2

    # roundtrip through write_jsonl (before the source file is mutated
    # below -- the frames above are lazy views over it)
    curated = good.select("doc_id", "text", "source")
    corpus_io.write_jsonl(curated, f"file://{tmp_path}/out", compression=None,
                          partitions=1)
    back = spark.read.json(f"file://{tmp_path}/out")
    assert back.count() == 2
    assert sorted(r["doc_id"] for r in back.collect()) == a

    # explicit id field wins
    (src / "part0.jsonl").write_text(
        json.dumps({"id": 7, "text": "x", "source": "s"}))
    with_id = corpus_io.read_jsonl(
        spark, str(src), schema="id long, text string, source string",
        id_field="id")
    assert with_id.collect()[0]["doc_id"] == 7


def test_text_dir_whole_file_documents(spark, tmp_path):
    from data_pipelines_spark.sources import corpus_io

    d = tmp_path / "txt"
    d.mkdir()
    (d / "a.txt").write_text("doc one line one\nline two")
    (d / "b.txt").write_text("doc two")
    df = corpus_io.read_text_dir(spark, str(d), source="dump")
    got = {r["text"] for r in df.collect()}
    assert got == {"doc one line one\nline two", "doc two"}
    assert df.count() == 2
    row = df.where(F.col("text") == "doc two").collect()[0]
    assert row["source"] == "dump" and row["path"].endswith("b.txt")


def test_stream_jsonl_incremental_curation(spark, tmp_path):
    """Streaming corpus pickup: new JSONL drops are parsed, quality-
    gated, and stream-deduplicated exactly once per content hash —
    the daily-ingest shape for a growing corpus."""
    import json

    from data_pipelines_spark.functions.text import passes_gopher_rules
    from data_pipelines_spark.sources.corpus_io import stream_jsonl

    src = tmp_path / "drops"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")

    def drop(name, rows):
        (src / name).write_text("\n".join(json.dumps(r) for r in rows))

    good = {"text": "the quick brown fox jumps over the lazy dog near it",
            "source": "crawl", "lang": "en", "url": "https://a.ex/1"}
    drop("a.jsonl", [good,
                     {**good, "text": "x", "url": "https://a.ex/junk"},  # fails gate
                     ])

    stream = stream_jsonl(spark, f"file://{src}/*", max_files_per_trigger=1)
    curated = (
        stream.where(F.col("_corrupt").isNull())
        .where(passes_gopher_rules(F.col("text"), min_words=5,
                                   min_stopword_hits=1))
        .withColumn("text_md5", F.md5(F.encode(F.col("text"), "UTF-8")))
        .dropDuplicates(["text_md5"])
    )
    q = (
        curated.writeStream.format("memory").queryName("corpus_stream")
        .outputMode("append").option("checkpointLocation", ckpt).start()
    )
    q.processAllAvailable()
    got1 = spark.sql("SELECT url FROM corpus_stream").collect()
    assert [r["url"] for r in got1] == ["https://a.ex/1"]

    # second drop: one exact duplicate (suppressed by stream dedup
    # state), one genuinely new doc
    drop("b.jsonl", [
        {**good, "url": "https://mirror.ex/1"},     # same text -> deduped
        {**good, "text": good["text"] + " again and again it goes on",
         "url": "https://a.ex/2"},
    ])
    q.processAllAvailable()
    got2 = sorted(r["url"] for r in
                  spark.sql("SELECT url FROM corpus_stream").collect())
    q.stop()
    assert got2 == ["https://a.ex/1", "https://a.ex/2"]


def test_jsonl_corrupt_rows_keep_distinct_ids(spark, tmp_path):
    """Probe regression: every malformed line hashes its raw content
    into doc_id — a shared sentinel id would collapse distinct corrupt
    rows under downstream dedup."""
    from data_pipelines_spark.sources import corpus_io

    src = tmp_path / "c"
    src.mkdir()
    (src / "p.jsonl").write_text(
        '{"text":"ok","source":"s","lang":"en","url":"u"}\n'
        "{bad one\n{bad two\n"
    )
    df = corpus_io.read_jsonl(spark, str(src))
    assert df.count() == 3
    assert df.select("doc_id").distinct().count() == 3
