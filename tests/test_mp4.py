"""ISO-BMFF (MP4) container: box walk, sample-table demux, writer
round-trips, Motion-JPEG frame decode, distributed kernels."""

from __future__ import annotations

import numpy as np
import pytest

from data_pipelines_spark.operators.jpeg import (
    decode_jpeg,
    encode_jpeg_baseline,
)
from data_pipelines_spark.operators.mp4 import (
    encode_mp4,
    extract_samples,
    iter_boxes,
    parse_mp4,
    sample_frames_mp4,
    video_metadata,
)


def _frames(n=7, h=16, w=24):
    rng = np.random.default_rng(11)
    return [
        encode_jpeg_baseline(
            rng.integers(0, 256, (h, w)).astype("u1"), quality_divisor=1
        )
        for _ in range(n)
    ]


def test_roundtrip_metadata_and_demux():
    frames = _frames()
    blob = encode_mp4(frames, width=24, height=16, timescale=1000,
                      sample_delta=40, samples_per_chunk=3)
    info = parse_mp4(blob)
    assert info["brand"] == "isom"
    assert info["duration_s"] == pytest.approx(7 * 40 / 1000)
    [t] = info["tracks"]
    assert (t["handler"], t["codec"]) == ("vide", "jpeg")
    assert (t["width"], t["height"]) == (24, 16)
    assert t["n_samples"] == 7
    assert t["sample_deltas"] == [40] * 7
    # demux returns the EXACT encoded frames (7 samples over 3 chunks:
    # the stsc/stco walk is genuinely exercised, incl. the short tail)
    got = extract_samples(blob, t)
    assert [b for _, _, b in got] == frames
    # every sample lives inside mdat, in order
    offs = [o for _, o, _ in got]
    assert offs == sorted(offs)


@pytest.mark.parametrize("co64", [False, True])
def test_chunk_offset_widths_agree(co64):
    frames = _frames(5)
    blob = encode_mp4(frames, samples_per_chunk=2, co64=co64)
    [t] = parse_mp4(blob)["tracks"]
    assert [b for _, _, b in extract_samples(blob, t)] == frames


def test_mjpeg_frames_decode_to_pixels():
    rng = np.random.default_rng(5)
    imgs = [rng.integers(0, 256, (8, 8)).astype("u1") for _ in range(3)]
    blob = encode_mp4(
        [encode_jpeg_baseline(im, quality_divisor=1) for im in imgs],
        width=8, height=8,
    )
    [t] = parse_mp4(blob)["tracks"]
    for i, _, payload in extract_samples(blob, t):
        dec = decode_jpeg(payload)
        assert dec.shape == (8, 8)
        # quality_divisor=1 is near-lossless
        assert np.abs(dec.astype(int) - imgs[i].astype(int)).max() <= 24


def test_audio_track_and_largesize_read():
    blob = encode_mp4([b"\x00\x01" * 100] * 4, codec="sowt",
                      handler="soun", sample_delta=100)
    [t] = parse_mp4(blob)["tracks"]
    assert (t["handler"], t["codec"]) == ("soun", "sowt")
    assert t["width"] is None
    # a 64-bit largesize box header parses (synthetic free box)
    import struct
    big = struct.pack(">I", 1) + b"free" + struct.pack(">Q", 16) + b"\0" * 0
    boxes = list(iter_boxes(big + blob))
    assert boxes[0][0] == b"free"


def test_truncation_and_malformed_raise():
    blob = encode_mp4(_frames(3))
    for frac in (0.3, 0.6):
        with pytest.raises(ValueError):
            parse_mp4(blob[: int(len(blob) * frac)])
    with pytest.raises(ValueError, match="no moov"):
        parse_mp4(blob[: blob.index(b"moov") - 4])
    # stsc/stsz disagreement raises, not silently truncates: shrink
    # samples_per_chunk to 1 so the chunk map covers 1 of 3 samples
    bad = bytearray(blob)
    i = bad.rindex(b"stsc")
    bad[i + 16 : i + 20] = (1).to_bytes(4, "big")
    with pytest.raises(ValueError, match="stsc/stco map"):
        parse_mp4(bytes(bad))


def test_video_kernels_distributed(spark):
    frames = _frames(6, h=8, w=8)
    blob = encode_mp4(frames, width=8, height=8, samples_per_chunk=2)
    media = spark.createDataFrame(
        [(i, bytearray(blob)) for i in range(3)],
        "media_id long, content binary",
    )
    meta = video_metadata(media).orderBy("media_id").collect()
    assert len(meta) == 3
    assert all(
        (m["handler"], m["codec"], m["width"], m["n_samples"], m["fps"])
        == ("vide", "jpeg", 8, 6, 25.0)
        for m in meta
    )
    out = sample_frames_mp4(media, num_frames=3).collect()
    assert len(out) == 9
    by_media = {}
    for r in out:
        by_media.setdefault(r["media_id"], []).append(r)
    for rows in by_media.values():
        nos = sorted(r["frame_no"] for r in rows)
        assert nos == [0, 2, 4]
        for r in rows:
            assert bytes(r["frame"]) == frames[r["frame_no"]]
