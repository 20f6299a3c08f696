"""Video near-dup (`operators.vdedup`): end-to-end over real MJPEG
MP4s (re-encoded copy collapses, distinct content does not), signature
assembly determinism, banded-candidate parity with brute force, and
the recall-bound validation."""

import numpy as np
import pytest

from data_pipelines_spark.operators.vdedup import (
    video_frame_phashes,
    video_near_duplicates,
    video_signatures,
)


def _frame(seed: int, h: int = 40, w: int = 56) -> np.ndarray:
    rng = np.random.default_rng(seed)
    y, x = np.mgrid[0:h, 0:w]
    img = 30.0 + 150.0 * x / w + 40.0 * y / h
    for _ in range(4):
        cy, cx = rng.integers(0, h), rng.integers(0, w)
        r = int(rng.integers(6, 15))
        img[(y - cy) ** 2 + (x - cx) ** 2 < r * r] += float(
            rng.integers(-70, 70)
        )
    return np.clip(img, 0, 255).astype(np.uint8)


def _clip(seed: int, quality: int) -> bytes:
    from data_pipelines_spark.operators.jpeg import encode_jpeg_baseline
    from data_pipelines_spark.operators.mp4 import encode_mp4

    frames = [
        encode_jpeg_baseline(_frame(seed * 10 + j), quality)
        for j in range(4)
    ]
    return encode_mp4(frames, width=56, height=40)


def test_video_near_dup_end_to_end(spark):
    # clips 0-2: distinct content at q=4; clips 100-102: the SAME
    # content re-encoded coarser (q=8) — the transcode-copy case
    rows = [(i, bytearray(_clip(i, 4))) for i in range(3)]
    rows += [(100 + i, bytearray(_clip(i, 8))) for i in range(3)]
    media = spark.createDataFrame(rows, "media_id long, content binary")

    sigs = video_signatures(video_frame_phashes(media, num_frames=4))
    got = {r["media_id"]: (list(r["sig"]), r["n_frames"])
           for r in sigs.collect()}
    assert all(n == 4 for _, n in got.values())

    pairs = video_near_duplicates(sigs, max_frame_hamming=7).collect()
    found = {(r["id_a"], r["id_b"]) for r in pairs}
    assert found == {(0, 100), (1, 101), (2, 102)}, found
    for r in pairs:
        assert r["max_hamming"] <= 7
        assert r["mean_hamming"] <= r["max_hamming"]


def test_signature_assembly_partition_invariant(spark):
    rows = [
        (1, 2, 555), (1, 0, 111), (1, 1, 333),
        (2, 0, 999), (2, 1, 777),
    ]
    df = spark.createDataFrame(
        rows, "media_id long, frame_no int, frame_phash long"
    )
    a = {r["media_id"]: list(r["sig"])
         for r in video_signatures(df).collect()}
    b = {r["media_id"]: list(r["sig"])
         for r in video_signatures(df.repartition(4)).collect()}
    assert a == b == {1: [111, 333, 555], 2: [999, 777]}


def _flip(h: int, pos: list[int]) -> int:
    u = h & ((1 << 64) - 1)
    for p in pos:
        u ^= 1 << int(p)
    return u - (1 << 64) if u >= (1 << 63) else u


def test_banded_candidates_match_brute_force(spark):
    rng = np.random.default_rng(5)
    sigs = []
    for i in range(6):
        base = [int(rng.integers(-(1 << 62), 1 << 62)) for _ in range(3)]
        sigs.append((i, base))
        # copy with <=2 flips/frame (near-dup) and one far copy
        near = [_flip(h, list(rng.choice(64, 2, replace=False))) for h in base]
        sigs.append((100 + i, near))
        far = [_flip(h, list(rng.choice(64, 20, replace=False))) for h in base]
        sigs.append((200 + i, far))
    df = spark.createDataFrame(sigs, "media_id long, sig array<long>")
    got = {(r["id_a"], r["id_b"]) for r in
           video_near_duplicates(df, max_frame_hamming=6).collect()}

    def ham(a, b):
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")

    want = set()
    for i, (ia, sa) in enumerate(sigs):
        for ib, sb in sigs[i + 1 :]:
            if len(sa) == len(sb) and all(
                ham(x, y) <= 6 for x, y in zip(sa, sb)
            ):
                want.add((min(ia, ib), max(ia, ib)))
    assert got == want
    assert {(i, 100 + i) for i in range(6)} <= got


def test_recall_bound_validation(spark):
    df = spark.createDataFrame(
        [(1, [1, 2])], "media_id long, sig array<long>"
    )
    with pytest.raises(ValueError, match="pigeonhole"):
        video_near_duplicates(df, max_frame_hamming=8)
