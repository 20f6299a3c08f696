"""Baseline JPEG codec tests (`operators/jpeg.py`).

Every payload is produced by our own encoder — byte-assembled, no
codec library — and decoded by our own decoder, so the round trip
pins both halves of the T.81 baseline profile: canonical DHT
reconstruction, DQT dequantization, DC prediction, ZRL/EOB runs,
restart markers, 4:2:0 upsampling, and YCbCr conversion.
"""

import numpy as np
import pytest

from data_pipelines_spark.operators.jpeg import (
    decode_jpeg,
    encode_jpeg_baseline,
)


def _maxerr(a, b):
    return int(np.abs(a.astype(int) - b.astype(int)).max())


def test_gray_near_lossless_roundtrip():
    rng = np.random.default_rng(3)
    g = rng.integers(0, 256, (40, 56), dtype=np.uint8)
    dec = decode_jpeg(encode_jpeg_baseline(g, quality_divisor=1))
    assert dec.shape == g.shape and dec.dtype == np.uint8
    # q=1 quantization error is <=0.5 per coefficient; after the IDCT
    # the pixel error stays within a couple of levels even on noise.
    assert _maxerr(g, dec) <= 2


def test_gray_odd_dimensions_and_heavy_quantization():
    g = (np.add.outer(np.arange(13), np.arange(21)) * 5 % 256).astype(np.uint8)
    dec = decode_jpeg(encode_jpeg_baseline(g, quality_divisor=32))
    assert dec.shape == (13, 21)  # padding trimmed exactly


def test_rgb_444_roundtrip():
    rng = np.random.default_rng(4)
    c = rng.integers(0, 256, (17, 31, 3), dtype=np.uint8)
    dec = decode_jpeg(encode_jpeg_baseline(c, quality_divisor=1))
    assert dec.shape == c.shape
    assert _maxerr(c, dec) <= 3  # YCbCr forward/back adds rounding


def test_rgb_420_subsampled_roundtrip():
    # smooth image: chroma varies slowly, so 2x2-averaged chroma should
    # reconstruct closely; luma is untouched by subsampling.
    y, x = np.mgrid[0:32, 0:48]
    c = np.stack(
        [(x * 3) % 256, (y * 3) % 256, ((x + y) * 2) % 256], axis=-1
    ).astype(np.uint8)
    dec = decode_jpeg(encode_jpeg_baseline(c, quality_divisor=2, subsample=True))
    assert dec.shape == c.shape
    assert np.abs(c.astype(int) - dec.astype(int)).mean() < 6.0


@pytest.mark.parametrize("interval", [1, 2, 3])
def test_restart_intervals(interval):
    rng = np.random.default_rng(interval)
    g = rng.integers(0, 256, (24, 40), dtype=np.uint8)
    enc = encode_jpeg_baseline(g, quality_divisor=1, restart_interval=interval)
    assert b"\xff\xdd" in enc  # DRI segment present
    assert _maxerr(g, decode_jpeg(enc)) <= 2


def test_restart_intervals_rgb_subsampled():
    rng = np.random.default_rng(11)
    c = rng.integers(0, 256, (33, 41, 3), dtype=np.uint8)
    enc = encode_jpeg_baseline(
        c, quality_divisor=1, restart_interval=2
    )
    assert _maxerr(c, decode_jpeg(enc)) <= 3
    # 4:2:0 with restarts: structural round trip only
    enc = encode_jpeg_baseline(
        c, quality_divisor=4, subsample=True, restart_interval=2
    )
    assert decode_jpeg(enc).shape == c.shape


def test_unsupported_profiles_raise():
    g = np.zeros((8, 8), np.uint8)
    enc = bytearray(encode_jpeg_baseline(g))
    sof = enc.index(b"\xff\xc0")
    enc[sof + 1] = 0xC2  # rewrite SOF0 -> SOF2 (progressive)
    with pytest.raises(NotImplementedError, match="baseline"):
        decode_jpeg(bytes(enc))
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"\x89PNG....")


def test_decode_image_dispatch(spark):
    from data_pipelines_spark.operators.multimodal import decode_image

    rng = np.random.default_rng(5)
    g = rng.integers(0, 256, (16, 16), dtype=np.uint8)
    dec = decode_image(encode_jpeg_baseline(g, quality_divisor=1))
    assert _maxerr(g, dec) <= 2


def test_image_stats_and_resize_over_jpeg_payloads(spark):
    from data_pipelines_spark.operators.multimodal import (
        decode_pnm,
        image_stats,
        resize_images,
    )

    rng = np.random.default_rng(6)
    gray = rng.integers(0, 256, (32, 24), dtype=np.uint8)
    rgb = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
    media = spark.createDataFrame(
        [
            (1, bytearray(encode_jpeg_baseline(gray, quality_divisor=2))),
            (2, bytearray(encode_jpeg_baseline(rgb, quality_divisor=2))),
        ],
        "media_id long, content binary",
    )
    stats = {r["media_id"]: r for r in image_stats(media).collect()}
    assert (stats[1]["width"], stats[1]["height"], stats[1]["channels"]) == (24, 32, 1)
    assert (stats[2]["width"], stats[2]["height"], stats[2]["channels"]) == (16, 16, 3)
    assert abs(stats[1]["mean_intensity"] - float(gray.mean())) < 3.0

    out = {r["media_id"]: r for r in resize_images(media, 8, 8).collect()}
    small = decode_pnm(bytes(out[1]["content"]))
    assert small.shape == (8, 8)
