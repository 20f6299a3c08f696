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
    enc[sof + 1] = 0xC9  # rewrite SOF0 -> SOF9 (arithmetic sequential)
    with pytest.raises(NotImplementedError, match="arithmetic"):
        decode_jpeg(bytes(enc))
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"\x89PNG....")


def test_12bit_gray_roundtrip_and_wire_shape():
    """12-bit extended sequential (SOF1): uint16 samples survive the
    DCT round-trip at divisor 1 within quantization rounding, the
    stream advertises SOF1 + precision 12, and the decoder hands back
    uint16."""
    rng = np.random.default_rng(17)
    g = (
        np.arange(24, dtype="f8")[:, None] * 130
        + np.arange(17, dtype="f8")[None, :] * 7
        + rng.normal(0, 3, (24, 17))
    ).clip(0, 4095).astype(np.uint16)
    enc = encode_jpeg_baseline(g, quality_divisor=1, precision=12)
    assert b"\xff\xc1" in enc and b"\xff\xc0" not in enc
    sof = enc.index(b"\xff\xc1")
    assert enc[sof + 4] == 12  # sample precision byte
    dec = decode_jpeg(enc)
    assert dec.dtype == np.uint16
    assert _maxerr(g, dec) <= 2


def test_12bit_rgb_and_fixed_tables():
    """12-bit RGB rides the same YCbCr transform scaled to the wider
    range; fixed_tables composes (widened T.81 magnitude-category
    universes)."""
    rng = np.random.default_rng(19)
    c = rng.integers(0, 4096, (9, 11, 3)).astype(np.uint16)
    for fixed in (False, True):
        enc = encode_jpeg_baseline(
            c, quality_divisor=1, precision=12, fixed_tables=fixed
        )
        dec = decode_jpeg(enc)
        assert dec.dtype == np.uint16
        # YCbCr forward/back rounding scales with the sample range
        assert _maxerr(c.astype("f8"), dec.astype("f8")) <= 40, fixed


def test_12bit_validation():
    with pytest.raises(ValueError, match="uint16"):
        encode_jpeg_baseline(np.zeros((4, 4), np.uint8), precision=12)
    with pytest.raises(ValueError, match="4096"):
        encode_jpeg_baseline(
            np.full((4, 4), 5000, np.uint16), precision=12
        )
    with pytest.raises(ValueError, match="uint8"):
        encode_jpeg_baseline(np.zeros((4, 4), np.uint16))
    with pytest.raises(ValueError, match="precision"):
        encode_jpeg_baseline(np.zeros((4, 4), np.uint8), precision=10)


def test_progressive_equals_baseline_bitwise():
    """The headline progressive contract: both encoders quantize to the
    SAME coefficients, so the progressive stream (DC first/refine, AC
    first/refine per component, EOB runs, successive approximation)
    must decode to pixels BIT-IDENTICAL to the baseline stream —
    across shapes, odd dimensions, subsampling, and quantization."""
    from data_pipelines_spark.operators.jpeg import encode_jpeg_progressive

    rng = np.random.default_rng(3)
    cases = [
        (rng.integers(0, 256, (16, 24)).astype("u1"), False),
        (rng.integers(0, 256, (13, 19)).astype("u1"), False),
        (rng.integers(0, 256, (24, 16, 3)).astype("u1"), False),
        (rng.integers(0, 256, (21, 18, 3)).astype("u1"), True),
        ((np.outer(np.arange(32), np.arange(40)) % 256).astype("u1"), False),
        (np.full((16, 16), 128, "u1"), False),
        (np.zeros((8, 8), "u1"), False),
    ]
    for arr, sub in cases:
        for qd in (1, 8, 32):
            b = decode_jpeg(
                encode_jpeg_baseline(arr, qd, subsample=sub)
            )
            p = decode_jpeg(
                encode_jpeg_progressive(arr, qd, subsample=sub)
            )
            assert np.array_equal(b, p), (arr.shape, sub, qd)


def test_progressive_eob_runs_and_sparse_blocks():
    """Sparse content exercises the EOB-run machinery hard: most
    blocks are all-zero (multi-block EOBRUN in the AC first pass) and
    the content blocks carry large coefficients whose refinement bits
    ride the cross-block correction-bit buffer."""
    from data_pipelines_spark.operators.jpeg import encode_jpeg_progressive

    arr = np.zeros((48, 64), np.uint8)
    arr[4:12, 8:16] = 255  # one hot block
    arr[36:44, 48:60] = np.arange(8 * 12).reshape(8, 12) % 256  # another
    for qd in (1, 8):
        b = decode_jpeg(encode_jpeg_baseline(arr, qd))
        p = decode_jpeg(encode_jpeg_progressive(arr, qd))
        assert np.array_equal(b, p), qd
    # the progressive stream should also be sane under heavy content
    dense = (np.indices((40, 40)).sum(0) * 7 % 256).astype("u1")
    assert np.array_equal(
        decode_jpeg(encode_jpeg_baseline(dense, 4)),
        decode_jpeg(encode_jpeg_progressive(dense, 4)),
    )


def test_progressive_coefficients_reconstruct_exactly():
    """Stronger than pixel equality: the decoder's accumulated
    coefficient store must equal the encoder's quantized coefficients
    value-for-value (DC successive approximation must be exact for
    negative DCs too, AC magnitudes exact through first+refine)."""
    import data_pipelines_spark.operators.jpeg as J

    rng = np.random.default_rng(17)
    arr = rng.integers(0, 256, (19, 27)).astype("u1")
    _g, _h, _w, _s, _q, zz, _hm, _vm = J._component_zz_blocks(arr, 8, False)
    blob = J.encode_jpeg_progressive(arr, 8)
    captured = {}
    orig = J._finish_progressive

    def capture(frame, coeff, qt):
        captured["c"] = [c.copy() for c in coeff]
        return orig(frame, coeff, qt)

    J._finish_progressive = capture
    try:
        decode_jpeg(blob)
    finally:
        J._finish_progressive = orig
    assert np.array_equal(captured["c"][0], zz[0])


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
