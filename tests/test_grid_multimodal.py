"""Grid canonicalization, geometry, and multimodal plumbing tests."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_pipelines_spark.functions.geo import haversine_km, parse_tile_name
from data_pipelines_spark.functions.grid import (
    cell_wkt,
    restrict_area,
    round_grid_keys,
    snap_to_grid,
)
from data_pipelines_spark.operators.multimodal import (
    extract_features,
    filter_nodata,
)


def test_snap_to_grid_cell_centers(spark):
    df = spark.createDataFrame(
        [(5.725,), (5.73,), (5.749,), (-0.01,)], "c double"
    )
    out = [r["s"] for r in df.select(snap_to_grid("c").alias("s")).collect()]
    assert out == [5.725, 5.725, 5.725, -0.025]


def test_round_grid_keys_and_restrict(spark):
    df = spark.createDataFrame(
        [(1.0250000001, 2.0), (8.0, 2.0)], "latitude double, longitude double"
    )
    rounded = round_grid_keys(df).collect()
    assert rounded[0]["latitude"] == 1.025
    within = restrict_area(df, 0.0, 5.0, 0.0, 5.0).collect()
    assert len(within) == 1


def test_cell_wkt_fixed_precision(spark):
    df = spark.createDataFrame([(2.025, 0.025)], "latitude double, longitude double")
    wkt = df.select(cell_wkt("latitude", "longitude").alias("w")).collect()[0]["w"]
    assert wkt == (
        "POLYGON ((0.000 2.000,0.000 2.050,0.050 2.050,0.050 2.000,0.000 2.000))"
    )


def test_haversine_known_distance(spark):
    # London (51.5074, -0.1278) → Paris (48.8566, 2.3522) ≈ 343.5 km
    df = spark.createDataFrame([(51.5074, -0.1278, 48.8566, 2.3522)],
                               "a double, b double, c double, d double")
    km = df.select(
        haversine_km(F.col("a"), F.col("b"), F.col("c"), F.col("d")).alias("km")
    ).collect()[0]["km"]
    assert 340 < km < 347


def test_parse_tile_name(spark):
    df = spark.createDataFrame([("10N_020W",), ("00S_130E",)], "tile string")
    lat, lon = parse_tile_name("tile")
    out = df.select(lat.alias("lat"), lon.alias("lon")).collect()
    assert (out[0]["lat"], out[0]["lon"]) == (10.0, -20.0)
    assert (out[1]["lat"], out[1]["lon"]) == (0.0, 130.0)


def _media(spark):
    rows = [
        (0, "image", bytearray(b"\x01\x02\x03\x04"), "png", 2, 2, 4),
        (1, "image", bytearray(b""), "png", 0, 0, 0),
        (2, "audio", bytearray(b"\xff\xfe"), "wav", None, None, 2),
    ]
    from data_pipelines_spark.operators.multimodal import MEDIA_SCHEMA

    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def test_multimodal_filter_and_features(spark):
    media = filter_nodata(_media(spark))
    assert media.count() == 2  # empty payload dropped
    feats = extract_features(media, dim=4).collect()
    by_id = {r["media_id"]: r["feature"] for r in feats}
    assert len(by_id[0]) == 4
    # deterministic fake: byte histogram / len
    assert by_id[0][0] == (1 + 0) / 4 + 0  # bytes 1 and (none) at positions 0,4


def test_frame_sampling_and_resize_plumbing(spark):
    from data_pipelines_spark.operators.multimodal import resize_stub, sample_frames

    media = _media(spark)  # ids 0 (4 bytes), 1 (empty), 2 (2 bytes)
    frames = sample_frames(media, num_frames=2, frame_bytes=2)
    rows = sorted(
        (r["media_id"], r["frame_no"], r["frame_offset"], bytes(r["frame"]))
        for r in frames.collect()
    )
    # empty payload contributes no frames; 4-byte payload → offsets 0,2
    assert rows == [
        (0, 0, 0, b"\x01\x02"),
        (0, 1, 2, b"\x03\x04"),
        (2, 0, 0, b"\xff\xfe"),
        (2, 1, 1, b"\xfe"),
    ]
    resized = resize_stub(frames, 64, 64)
    assert resized.select("target_width").first()[0] == 64


def test_pnm_decode_and_image_stats(spark):
    """Real image decode end-to-end: hand-assembled P5/P6 payloads →
    dimensions + intensity stats through the Spark operator."""
    import numpy as np

    from data_pipelines_spark.operators.multimodal import (
        decode_pnm,
        encode_pgm,
        image_stats,
    )

    gray = np.arange(12, dtype=np.uint8).reshape(3, 4) * 20
    p5 = encode_pgm(gray)
    assert np.array_equal(decode_pnm(p5), gray)

    rgb = np.zeros((2, 2, 3), dtype=np.uint8); rgb[..., 0] = 200
    p6 = b"P6\n2 2\n255\n" + rgb.tobytes()
    assert decode_pnm(p6).shape == (2, 2, 3)

    media = spark.createDataFrame(
        [(1, bytearray(p5)), (2, bytearray(p6))], "media_id long, content binary"
    )
    got = {r["media_id"]: r for r in image_stats(media).collect()}
    assert (got[1]["width"], got[1]["height"], got[1]["channels"]) == (4, 3, 1)
    assert abs(got[1]["mean_intensity"] - float(gray.mean())) < 1e-9
    assert (got[2]["width"], got[2]["height"], got[2]["channels"]) == (2, 2, 3)
    assert abs(got[2]["mean_intensity"] - 200 / 3) < 1e-6


def test_resize_images_real_kernel(spark):
    import numpy as np

    from data_pipelines_spark.operators.multimodal import (
        decode_pnm,
        encode_pgm,
        resize_images,
    )

    big = np.arange(64, dtype=np.uint8).reshape(8, 8)
    media = spark.createDataFrame(
        [(7, bytearray(encode_pgm(big)))], "media_id long, content binary"
    )
    out = resize_images(media, width=4, height=4).collect()
    assert len(out) == 1 and out[0]["width"] == 4
    small = decode_pnm(bytes(out[0]["content"]))
    assert small.shape == (4, 4)
    # nearest-neighbor: pixel (0,0) keeps the original corner value
    assert small[0, 0] == big[0, 0]
    assert small[3, 3] == big[6, 6]


def test_wav_decode_and_audio_features(spark):
    """Real audio decode: a stdlib-written 16-bit WAV → duration/RMS/ZCR
    through the Spark operator."""
    import io
    import math
    import struct
    import wave

    from data_pipelines_spark.operators.multimodal import audio_features

    rate, seconds, freq = 8000, 1, 440
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1); w.setsampwidth(2); w.setframerate(rate)
        for i in range(rate * seconds):
            v = int(32767 * 0.5 * math.sin(2 * math.pi * freq * i / rate))
            w.writeframes(struct.pack("<h", v))
    payload = buf.getvalue()

    media = spark.createDataFrame(
        [(1, bytearray(payload))], "media_id long, content binary"
    )
    row = audio_features(media).collect()[0]
    assert row["sample_rate"] == 8000 and row["channels"] == 1
    assert abs(row["duration_sec"] - 1.0) < 1e-9
    # sine at amplitude 0.5 → RMS ~ 0.5/sqrt(2)
    assert abs(row["rms"] - 0.5 / math.sqrt(2)) < 0.01
    # 440 Hz sine crosses zero ~880 times/sec → ZCR ~ 880/8000
    assert abs(row["zero_crossing_rate"] - 2 * freq / rate) < 0.01


def _encode_png(arr: "np.ndarray", color: int, plte: bytes | None = None) -> bytes:
    """Test-side PNG encoder, independent of the engine's: cycles
    through all five scanline filters so the decoder's
    Sub/Up/Average/Paeth paths all get exercised. Filters operate on
    the raw byte stream with the left neighbor one pixel-byte-width
    back (the spec's rule), so 8- and 16-bit samples share the path."""
    import struct
    import zlib

    import numpy as np

    def chunk(typ: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + typ
            + body
            + struct.pack(">I", zlib.crc32(typ + body) & 0xFFFFFFFF)
        )

    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, c = arr.shape
    depth = arr.dtype.itemsize * 8
    bpp = c * arr.dtype.itemsize
    ihdr = struct.pack(">IIBBBBB", w, h, depth, color, 0, 0, 0)
    byte_rows = (
        arr.astype(">u2" if depth == 16 else "u1").view("u1").reshape(h, -1)
    )
    raw = bytearray()
    prev = np.zeros(w * bpp, dtype=np.int32)
    for y in range(h):
        line = byte_rows[y].astype(np.int32)
        f = y % 5
        if f == 0:
            filt = line
        elif f == 1:  # Sub
            a = np.concatenate([np.zeros(bpp, np.int32), line[:-bpp]])
            filt = line - a
        elif f == 2:  # Up
            filt = line - prev
        elif f == 3:  # Average
            a = np.concatenate([np.zeros(bpp, np.int32), line[:-bpp]])
            filt = line - ((a + prev) >> 1)
        else:  # Paeth
            a = np.concatenate([np.zeros(bpp, np.int32), line[:-bpp]])
            b = prev
            cc = np.concatenate([np.zeros(bpp, np.int32), prev[:-bpp]])
            p = a + b - cc
            pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - cc)
            pred = np.where(
                (pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, cc)
            )
            filt = line - pred
        raw.append(f)
        raw.extend((filt & 0xFF).astype("u1").tobytes())
        prev = line
    out = b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
    if plte is not None:
        out += chunk(b"PLTE", plte)
    out += chunk(b"IDAT", zlib.compress(bytes(raw))) + chunk(b"IEND", b"")
    return out


def test_pnm_full_family_decodes(spark):
    """P1-P4 complete the netpbm family beside the existing P5/P6:
    ASCII bitmaps with run-together digits and mid-body comments,
    ASCII gray/RGB (incl. 16-bit maxval), packed binary bitmaps with
    row padding."""
    import numpy as np

    from data_pipelines_spark.operators.multimodal import decode_pnm

    p1 = b"P1\n# c\n5 2\n01101 # t\n10#x\n011\n"
    assert np.array_equal(
        decode_pnm(p1), np.array([[0, 1, 1, 0, 1], [1, 0, 0, 1, 1]], "u1")
    )
    p2 = b"P2\n3 2\n255\n0 128 255\n7 8 9\n"
    assert np.array_equal(
        decode_pnm(p2), np.array([[0, 128, 255], [7, 8, 9]], "u1")
    )
    p3 = b"P3\n2 1\n65535\n1 2 3 60000 5 6\n"
    assert np.array_equal(
        decode_pnm(p3), np.array([[[1, 2, 3], [60000, 5, 6]]], "u2")
    )
    rows = np.array(
        [[1, 0, 1, 0, 1, 0, 1, 0, 1, 0], [0, 1, 0, 1, 0, 1, 0, 1, 0, 1]],
        dtype="u1",
    )
    p4 = b"P4\n10 2\n" + np.packbits(rows, axis=1).tobytes()
    assert np.array_equal(decode_pnm(p4), rows)
    import pytest as _pytest

    with _pytest.raises(ValueError, match="samples"):
        decode_pnm(b"P2\n3 2\n255\n1 2 3\n")  # short ASCII body
    with _pytest.raises(ValueError, match="unknown PNM"):
        decode_pnm(b"P7\n...")


def test_png_decode_all_filters_rgb(spark):
    import numpy as np

    from data_pipelines_spark.operators.multimodal import decode_image, decode_png

    rng = np.random.default_rng(7)
    arr = rng.integers(0, 256, size=(7, 5, 3), dtype=np.uint8)
    png = _encode_png(arr, color=2)
    assert np.array_equal(decode_png(png), arr)
    assert np.array_equal(decode_image(png), arr)   # signature dispatch


def test_png_decode_gray_and_rgba(spark):
    import numpy as np

    from data_pipelines_spark.operators.multimodal import decode_png

    rng = np.random.default_rng(8)
    gray = rng.integers(0, 256, size=(6, 4), dtype=np.uint8)
    assert np.array_equal(decode_png(_encode_png(gray, color=0)), gray)
    rgba = rng.integers(0, 256, size=(6, 4, 4), dtype=np.uint8)
    assert np.array_equal(decode_png(_encode_png(rgba, color=6)), rgba)


def test_png_decode_palette(spark):
    import numpy as np

    from data_pipelines_spark.operators.multimodal import decode_png

    palette = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255]], dtype=np.uint8)
    idx = np.array([[0, 1], [2, 0]], dtype=np.uint8)
    png = _encode_png(idx, color=3, plte=palette.tobytes())
    assert np.array_equal(decode_png(png), palette[idx])


def test_png_invalid_profiles_raise(spark):
    import struct
    import zlib

    import pytest as _pytest

    from data_pipelines_spark.operators.multimodal import decode_png

    def header_only(depth, color, interlace=0):
        ihdr = struct.pack(">IIBBBBB", 2, 2, depth, color, 0, 0, interlace)
        return (
            b"\x89PNG\r\n\x1a\n"
            + struct.pack(">I", len(ihdr)) + b"IHDR" + ihdr
            + struct.pack(">I", zlib.crc32(b"IHDR" + ihdr) & 0xFFFFFFFF)
        )

    with _pytest.raises(ValueError, match="depth"):
        decode_png(header_only(3, 0))  # 3 is not a legal PNG depth
    with _pytest.raises(ValueError, match="gray/palette-only"):
        decode_png(header_only(4, 2))  # sub-byte RGB is illegal
    with _pytest.raises(ValueError, match="not a PNG"):
        decode_png(b"JFIF....")


def test_png_subbyte_depths(spark):
    """1/2/4-bit PNGs — hand-pinned packed bytes (independent of the
    encoder's own bit packing) plus encoder round-trips for gray and
    palette at every sub-byte depth, odd widths crossing byte
    boundaries."""
    import struct
    import zlib

    import numpy as np

    from data_pipelines_spark.operators.multimodal import (
        decode_png,
        encode_png,
    )

    # hand-built 1-bit gray, 10 px wide: 1010101010 packs (MSB-first,
    # zero row padding) to AA 80 exactly — pins bit order and padding.
    def chunk(typ, body):
        return (
            struct.pack(">I", len(body)) + typ + body
            + struct.pack(">I", zlib.crc32(typ + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", 10, 1, 1, 0, 0, 0, 0)
    png = (
        b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(b"\x00\xaa\x80"))
        + chunk(b"IEND", b"")
    )
    assert np.array_equal(
        decode_png(png), np.array([[1, 0, 1, 0, 1, 0, 1, 0, 1, 0]], "u1")
    )

    rng = np.random.default_rng(31)
    for depth in (1, 2, 4):
        gray = rng.integers(0, 1 << depth, (7, 11)).astype("u1")
        assert np.array_equal(
            decode_png(encode_png(gray, depth=depth)), gray
        ), depth
        palette = rng.integers(0, 256, (1 << depth, 3)).astype("u1")
        idx = rng.integers(0, 1 << depth, (5, 9)).astype("u1")
        got = decode_png(encode_png(idx, depth=depth, palette=palette))
        assert np.array_equal(got, palette[idx]), depth


def test_png_adam7_interlace(spark):
    """Adam7: a hand-built 2x2 file pins the pass order/geometry
    (passes 1, 6, 7 carry one, one, and two pixels; empty passes emit
    no bytes), then encoder round-trips cover every pass non-empty
    (9x10), 16-bit RGB, RGBA, and sub-byte palette interlaced."""
    import struct
    import zlib

    import numpy as np

    from data_pipelines_spark.operators.multimodal import (
        decode_png,
        encode_png,
    )

    def chunk(typ, body):
        return (
            struct.pack(">I", len(body)) + typ + body
            + struct.pack(">I", zlib.crc32(typ + body) & 0xFFFFFFFF)
        )

    # scanlines: pass1 [11], pass6 [22], pass7 [33 44] — each with
    # filter byte 0; decoded image must be [[11, 22], [33, 44]].
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 1)
    payload = b"\x00\x0b" + b"\x00\x16" + b"\x00\x21\x2c"
    png = (
        b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(payload)) + chunk(b"IEND", b"")
    )
    assert np.array_equal(
        decode_png(png), np.array([[11, 22], [33, 44]], "u1")
    )

    rng = np.random.default_rng(37)
    cases = [
        rng.integers(0, 256, (9, 10)).astype("u1"),     # all 7 passes hit
        rng.integers(0, 256, (1, 1)).astype("u1"),      # only pass 1
        rng.integers(0, 65536, (6, 7, 3)).astype("u2"),  # 16-bit RGB
        rng.integers(0, 256, (5, 3, 4)).astype("u1"),   # RGBA
    ]
    for arr in cases:
        blob = encode_png(arr, interlace=True)
        assert np.array_equal(decode_png(blob), arr), (arr.shape, arr.dtype)
        # interlace is a transport detail: same pixels as progressive=off
        assert np.array_equal(
            decode_png(blob), decode_png(encode_png(arr))
        )
    palette = rng.integers(0, 256, (4, 3)).astype("u1")
    idx = rng.integers(0, 4, (6, 11)).astype("u1")
    got = decode_png(encode_png(idx, depth=2, palette=palette,
                                interlace=True))
    assert np.array_equal(got, palette[idx])


def test_image_stats_over_png_payloads(spark):
    import numpy as np

    from data_pipelines_spark.operators.multimodal import image_stats

    rng = np.random.default_rng(9)
    arr = rng.integers(0, 256, size=(8, 6, 3), dtype=np.uint8)
    media = spark.createDataFrame(
        [(1, bytearray(_encode_png(arr, color=2)))], "media_id long, content binary"
    )
    row = image_stats(media).first()
    assert (row["width"], row["height"], row["channels"]) == (6, 8, 3)
    assert abs(row["mean_intensity"] - float(arr.mean())) < 1e-9


def test_zorder_key_matches_python_reference(spark):
    from pyspark.sql import Row

    from data_pipelines_spark.functions.grid import zorder_key

    def py_z(lat, lon, bits=16):
        scale = (1 << bits) - 1
        y = min(scale, max(0, int((lat + 90.0) / 180.0 * (1 << bits))))
        x = min(scale, max(0, int((lon + 180.0) / 360.0 * (1 << bits))))
        z = 0
        for i in range(bits):
            z |= ((x >> i) & 1) << (2 * i)
            z |= ((y >> i) & 1) << (2 * i + 1)
        return z

    pts = [(-90.0, -180.0), (0.0, 0.0), (89.99, 179.99), (45.125, -120.375),
           (-33.87, 151.21), (60.17, 24.94)]
    df = spark.createDataFrame(
        [Row(lat=a, lon=b) for a, b in pts]
    ).select("lat", "lon", zorder_key("lat", "lon").alias("z"))
    for r in df.collect():
        assert r.z == py_z(r.lat, r.lon), (r.lat, r.lon)


def _py_hilbert(x, y, bits):
    """Plain-Python xy2d (rotate-and-reflect recurrence)."""
    n = 1 << bits
    d = 0
    s = n >> 1
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x = n - 1 - x
                y = n - 1 - y
            x, y = y, x
        s >>= 1
    return d


def test_hilbert_key_is_a_hilbert_curve(spark):
    """First-principles check, exhaustive at bits=4 (256 cells): the
    keys over all grid cells are a permutation of 0..n^2-1 AND
    consecutive keys sit at Manhattan distance exactly 1 — the
    defining Hilbert property Z-order lacks. Also pins the Spark
    expression against the plain-Python recurrence."""
    from pyspark.sql import Row

    from data_pipelines_spark.functions.grid import hilbert_key

    bits, n = 4, 16
    cells = [
        Row(
            xi=xi,
            yi=yi,
            lat=-90.0 + (yi + 0.5) * 180.0 / n,
            lon=-180.0 + (xi + 0.5) * 360.0 / n,
        )
        for yi in range(n)
        for xi in range(n)
    ]
    rows = (
        spark.createDataFrame(cells)
        .select("xi", "yi", hilbert_key("lat", "lon", bits=bits).alias("h"))
        .collect()
    )
    by_key = {}
    for r in rows:
        assert r.h == _py_hilbert(r.xi, r.yi, bits), (r.xi, r.yi)
        by_key[r.h] = (r.xi, r.yi)
    assert sorted(by_key) == list(range(n * n))  # a permutation
    for k in range(1, n * n):
        (x0, y0), (x1, y1) = by_key[k - 1], by_key[k]
        assert abs(x1 - x0) + abs(y1 - y0) == 1, k


def test_hilbert_key_null_nan_and_default_bits(spark):
    from pyspark.sql import functions as F

    from data_pipelines_spark.functions.grid import hilbert_key

    df = spark.createDataFrame(
        [
            (0, 45.0, 9.0),
            (1, None, 9.0),
            (2, float("nan"), 9.0),
            (3, -90.0, -180.0),
            (4, 90.0, 180.0),  # clamps to the far corner cell
        ],
        "i long, lat double, lon double",
    )
    got = {
        r["i"]: r["h"]
        for r in df.select(
            "i", hilbert_key("lat", "lon").alias("h")
        ).collect()
    }
    assert got[1] is None and got[2] is None
    assert got[0] == _py_hilbert(
        int((9.0 + 180.0) / 360.0 * (1 << 16)),
        int((45.0 + 90.0) / 180.0 * (1 << 16)),
        16,
    )
    assert got[3] == _py_hilbert(0, 0, 16)
    assert got[4] == _py_hilbert((1 << 16) - 1, (1 << 16) - 1, 16)


def test_spatial_cluster_hilbert_shrinks_bboxes(spark):
    """The hilbert curve option clusters at least as well as the bar
    set for zorder: per-partition bbox area shrinks by > 8x vs random
    arrival order."""
    import random

    from pyspark.sql import Row
    from pyspark.sql import functions as F

    from data_pipelines_spark.functions.grid import spatial_cluster

    rng = random.Random(11)
    rows = [
        Row(latitude=rng.uniform(-60, 60), longitude=rng.uniform(-150, 150))
        for _ in range(4000)
    ]
    df = spark.createDataFrame(rows).repartition(8)

    def mean_bbox_area(frame):
        return (
            frame.withColumn("__p", F.spark_partition_id())
            .groupBy("__p")
            .agg(
                (F.max("latitude") - F.min("latitude")).alias("dlat"),
                (F.max("longitude") - F.min("longitude")).alias("dlon"),
            )
            .select(F.avg(F.col("dlat") * F.col("dlon")).alias("a"))
            .first()
            .a
        )

    random_area = mean_bbox_area(df)
    hilbert_area = mean_bbox_area(
        spatial_cluster(df, partitions=32, curve="hilbert")
    )
    assert hilbert_area < random_area / 8

    import pytest

    with pytest.raises(ValueError, match="unknown curve"):
        spatial_cluster(df, curve="peano")


def test_spatial_cluster_shrinks_partition_bboxes(spark):
    import random

    from pyspark.sql import Row
    from pyspark.sql import functions as F

    from data_pipelines_spark.functions.grid import spatial_cluster

    rng = random.Random(7)
    rows = [
        Row(latitude=rng.uniform(-60, 60), longitude=rng.uniform(-150, 150))
        for _ in range(4000)
    ]
    df = spark.createDataFrame(rows).repartition(8)  # arrival order: random

    def mean_bbox_area(frame):
        per = (
            frame.withColumn("__p", F.spark_partition_id())
            .groupBy("__p")
            .agg(
                (F.max("latitude") - F.min("latitude")).alias("dlat"),
                (F.max("longitude") - F.min("longitude")).alias("dlon"),
            )
            .select(F.avg(F.col("dlat") * F.col("dlon")).alias("a"))
            .first()
        )
        return per.a

    random_area = mean_bbox_area(df)
    clustered_area = mean_bbox_area(spatial_cluster(df, partitions=32))
    # Z-order clustering should shrink per-partition coverage by a lot;
    # random partitions each span essentially the whole domain. (At
    # very coarse partition counts the curve's quadrant jumps widen
    # boxes — locality sharpens as files get more numerous/smaller,
    # which is the regime that matters for row-group skipping.)
    assert clustered_area < random_area / 8


def test_zorder_key_null_nan_coordinates_yield_null(spark):
    """Probe regression: NULL/NaN coordinates previously quantized to
    the south-pole corner (greatest(0, NULL) -> 0) and shared a real
    cell's key; nodata must map to a NULL key instead."""
    from pyspark.sql import functions as F

    from data_pipelines_spark.functions.grid import zorder_key

    df = spark.createDataFrame(
        [
            (0, 45.0, 9.0),
            (1, float("nan"), 9.0),
            (2, None, 9.0),
            (3, 45.0, float("nan")),
            (4, 45.0, None),
            (5, -90.0, -180.0),  # real pole corner keeps its key
        ],
        "i long, lat double, lon double",
    )
    got = {
        r["i"]: r["z"]
        for r in df.select("i", zorder_key("lat", "lon").alias("z")).collect()
    }
    assert got[0] is not None and got[5] == 0
    for i in (1, 2, 3, 4):
        assert got[i] is None, i


def test_png_decode_16bit_all_filters(spark):
    """16-bit gray and RGBA through the INDEPENDENT test-side filterer
    (all five filters, byte-granularity left neighbor): the decoder
    must reconstruct the uint16 samples exactly."""
    import numpy as np

    from data_pipelines_spark.operators.multimodal import decode_png

    rng = np.random.default_rng(23)
    gray = rng.integers(0, 65536, (11, 7)).astype("u2")
    assert np.array_equal(decode_png(_encode_png(gray, color=0)), gray)
    rgba = rng.integers(0, 65536, (9, 5, 4)).astype("u2")
    assert np.array_equal(decode_png(_encode_png(rgba, color=6)), rgba)


def test_png_encode_decode_roundtrip(spark):
    """The engine's own encoder (Up filter, CRC-checked chunks) against
    its decoder, every shape/depth combination."""
    import numpy as np

    from data_pipelines_spark.operators.multimodal import (
        decode_png,
        encode_png,
    )

    rng = np.random.default_rng(5)
    for arr in [
        rng.integers(0, 256, (7, 9)).astype("u1"),
        rng.integers(0, 65536, (5, 4)).astype("u2"),
        rng.integers(0, 256, (6, 3, 3)).astype("u1"),
        rng.integers(0, 65536, (4, 5, 3)).astype("u2"),
        rng.integers(0, 256, (3, 2, 4)).astype("u1"),
        rng.integers(0, 256, (3, 2, 2)).astype("u1"),
    ]:
        got = decode_png(encode_png(arr))
        assert np.array_equal(got, arr), (arr.shape, arr.dtype)


def test_png_encode_validation(spark):
    import numpy as np
    import pytest

    from data_pipelines_spark.operators.multimodal import encode_png

    with pytest.raises(ValueError, match="uint8/uint16"):
        encode_png(np.zeros((2, 2), dtype="f4"))
    with pytest.raises(ValueError, match="shape"):
        encode_png(np.zeros((2, 2, 5), dtype="u1"))


def test_wav_encoder_roundtrips_all_widths(spark):
    """encode_wav is decode_wav's exact inverse for on-grid samples:
    every PCM width and both IEEE-float widths, mono and stereo."""
    import numpy as np

    from data_pipelines_spark.operators.multimodal import (
        decode_wav,
        encode_wav,
    )

    rng = np.random.default_rng(51)
    for width, scale in ((1, 128.0), (2, 32768.0), (3, 8388608.0),
                         (4, 2147483648.0)):
        for ch in (1, 2):
            q = rng.integers(
                -int(scale), int(scale) - 1, size=(200, ch)
            ).astype("f8")
            x = (q / scale) if width != 1 else ((q + 0.0) / scale)
            got, sr, nch = decode_wav(encode_wav(x, 8000, width=width))
            assert (sr, nch) == (8000, ch)
            assert np.allclose(got, x, atol=0.5 / scale), (width, ch)
    # IEEE float: bit-exact, no quantization at all
    x = rng.normal(0, 0.3, (300, 2)).clip(-1, 1)
    for width in (4, 8):
        got, sr, nch = decode_wav(
            encode_wav(x, 44100, width=width, ieee_float=True)
        )
        ref = x.astype("<f4").astype("f8") if width == 4 else x
        assert np.array_equal(got, ref), width
    import pytest as _pytest

    with _pytest.raises(ValueError, match="width"):
        encode_wav(x, 8000, width=5)
    with _pytest.raises(ValueError, match="IEEE"):
        encode_wav(x, 8000, width=2, ieee_float=True)


def test_wav_wide_pcm_and_float_formats(spark):
    """24/32-bit PCM through the stdlib path and IEEE-float /
    WAVE_FORMAT_EXTENSIBLE payloads through the manual RIFF fallback —
    all recover the same sine within each width's quantization."""
    import io
    import struct
    import wave

    import numpy as np

    from data_pipelines_spark.operators.multimodal import decode_wav

    rate = 8000
    t = np.arange(rate) / rate
    sig = 0.5 * np.sin(2 * np.pi * 440 * t)

    def pcm_wav(width, data_bytes):
        buf = io.BytesIO()
        with wave.open(buf, "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(width)
            w.setframerate(rate)
            w.writeframes(data_bytes)
        return buf.getvalue()

    v24 = np.clip((sig * 8388608).astype(np.int64), -8388608, 8388607)
    b24 = b"".join(int(x & 0xFFFFFF).to_bytes(3, "little") for x in v24)
    s, r, c = decode_wav(pcm_wav(3, b24))
    assert (r, c) == (rate, 1)
    assert np.allclose(s[:, 0], sig, atol=2e-7)

    v32 = (sig * 2147483648).astype("<i4")
    s, _r, _c = decode_wav(pcm_wav(4, v32.tobytes()))
    assert np.allclose(s[:, 0], sig, atol=1e-9)

    def riff_wav(arr, fmt_tag, bits, sub=None):
        data = arr.astype("<f4" if bits == 32 else "<f8").tobytes()
        fmt = struct.pack(
            "<HHIIHH", fmt_tag, 1, rate, rate * bits // 8, bits // 8, bits
        )
        if sub is not None:  # extensible: subformat tag at offset 24
            fmt += struct.pack("<HHI", 22, bits, 0)
            fmt += struct.pack("<H", sub) + bytes(14)
        body = b"fmt " + struct.pack("<I", len(fmt)) + fmt
        body += b"data" + struct.pack("<I", len(data)) + data
        return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body

    s, r, _c = decode_wav(riff_wav(sig, 3, 32))
    assert r == rate and np.allclose(s[:, 0], sig, atol=1e-7)
    s, _r, _c = decode_wav(riff_wav(sig, 3, 64))
    assert np.allclose(s[:, 0], sig)
    s, _r, _c = decode_wav(riff_wav(sig, 0xFFFE, 32, sub=3))
    assert np.allclose(s[:, 0], sig, atol=1e-7)

    import pytest

    with pytest.raises(NotImplementedError, match="format tag"):
        decode_wav(riff_wav(sig, 7, 32))  # mu-law stays gated
