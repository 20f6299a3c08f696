"""Perceptual hash (`operators.phash`): kernel goldens, re-encode
stability (the property the hash exists for), banded-join parity with
brute force (exact recall at the pigeonhole band count), the bucket
guard, and partition invariance."""

import numpy as np
import pytest

from data_pipelines_spark.operators.phash import (
    hamming64,
    image_phash,
    phash64,
    phash_near_duplicates,
)


def _gradient(seed: int, h: int = 40, w: int = 56) -> np.ndarray:
    """Deterministic structured test image: low-frequency gradient plus
    a seeded blob pattern (pure noise has no low-frequency structure
    for a perceptual hash to latch onto)."""
    rng = np.random.default_rng(seed)
    y, x = np.mgrid[0:h, 0:w]
    img = 40.0 + 140.0 * x / w + 50.0 * y / h
    for _ in range(4):
        cy, cx = rng.integers(0, h), rng.integers(0, w)
        r = int(rng.integers(5, 14))
        mask = (y - cy) ** 2 + (x - cx) ** 2 < r * r
        img[mask] += float(rng.integers(-60, 60))
    return np.clip(img, 0, 255).astype(np.uint8)


def test_phash_deterministic_and_distinct():
    a, b = _gradient(1), _gradient(2)
    ha, hb = phash64(a), phash64(b)
    assert ha == phash64(a.copy())  # pure function
    assert isinstance(ha, int) and -(1 << 63) <= ha < (1 << 63)
    assert hamming64(ha, hb) > 10  # different images are far apart


def test_phash_stable_under_jpeg_reencode():
    from data_pipelines_spark.operators.jpeg import (
        decode_jpeg,
        encode_jpeg_baseline,
    )

    img = _gradient(7)
    h_orig = phash64(img)
    for q in (4, 8):
        rt = np.asarray(decode_jpeg(encode_jpeg_baseline(img, q)))
        d = hamming64(h_orig, phash64(rt))
        assert d <= 6, f"quality_divisor={q}: hamming {d}"
    # brightness shift barely moves it (DC excluded from the median)
    shifted = np.clip(img.astype(int) + 25, 0, 255).astype(np.uint8)
    assert hamming64(h_orig, phash64(shifted)) <= 6


def test_phash_rgb_luma_path():
    g = _gradient(3)
    rgb = np.stack([g, g, g], axis=2)
    assert phash64(rgb) == phash64(g)  # equal channels -> same luma


def test_image_phash_distributed_matches_kernel(spark):
    from data_pipelines_spark.operators.multimodal import encode_pgm

    imgs = {i: _gradient(i) for i in range(6)}
    df = spark.createDataFrame(
        [(i, bytearray(encode_pgm(a))) for i, a in imgs.items()],
        "media_id long, content binary",
    )
    got = {r["media_id"]: r["phash"]
           for r in image_phash(df.repartition(5)).collect()}
    assert got == {i: phash64(a) for i, a in imgs.items()}


def _flip_bits(h: int, positions) -> int:
    u = h & ((1 << 64) - 1)
    for p in positions:
        u ^= 1 << int(p)  # numpy ints from rng.choice upcast poorly
    return u - (1 << 64) if u >= (1 << 63) else u


def test_banded_join_exact_recall_vs_brute_force(spark):
    rng = np.random.default_rng(11)
    base = [phash64(_gradient(s)) for s in range(8)]
    rows = [(i, h) for i, h in enumerate(base)]
    # planted near-dups at known distances around the threshold
    nid = 100
    for i, h in enumerate(base):
        for d in (1, 4, 6, 7, 9):
            pos = rng.choice(64, size=d, replace=False)
            rows.append((nid, _flip_bits(h, pos)))
            nid += 1
    df = spark.createDataFrame(rows, "media_id long, phash long")

    got = {
        (r["id_a"], r["id_b"], r["hamming"])
        for r in phash_near_duplicates(df, max_hamming=6).collect()
    }
    want = set()
    for i, (ia, ha) in enumerate(rows):
        for ib, hb in rows[i + 1 :]:
            d = hamming64(ha, hb)
            if d <= 6:
                lo, hi = min(ia, ib), max(ia, ib)
                want.add((lo, hi, d))
    assert got == want  # exact recall: bands = max_hamming + 1
    assert len(want) >= 16  # the d<=6 plants are all in


def test_banded_join_partition_invariant(spark):
    rows = [(i, phash64(_gradient(i))) for i in range(6)]
    rows += [(100 + i, _flip_bits(h, [i])) for i, (_, h) in enumerate(rows)]
    df = spark.createDataFrame(rows, "media_id long, phash long")
    a = sorted(map(tuple, phash_near_duplicates(df).collect()))
    b = sorted(map(tuple,
                   phash_near_duplicates(df.repartition(13)).collect()))
    assert a == b


def test_bucket_guard_raises(spark):
    # 50 identical hashes: every band bucket holds 50 > max_bucket=10
    df = spark.createDataFrame(
        [(i, 12345) for i in range(50)], "media_id long, phash long"
    )
    with pytest.raises(Exception, match="max_bucket"):
        phash_near_duplicates(df, max_bucket=10).collect()


def test_band_count_validation(spark):
    df = spark.createDataFrame([(1, 2)], "media_id long, phash long")
    with pytest.raises(ValueError, match="pigeonhole"):
        phash_near_duplicates(df, max_hamming=6, bands=4)
    with pytest.raises(ValueError, match="max_hamming"):
        phash_near_duplicates(df, max_hamming=64)


def test_incremental_phash_matches_full_run(spark):
    from data_pipelines_spark.operators.phash import (
        incremental_phash_near_duplicates,
        phash_bands,
        phash_near_duplicates,
    )

    store_rows = [(i, phash64(_gradient(i))) for i in range(8)]
    batch_rows = [
        (100, _flip_bits(store_rows[2][1], [3, 9])),   # near store id 2
        (101, phash64(_gradient(50))),                 # novel
        (102, _flip_bits(phash64(_gradient(50)), [7])),  # near 101
    ]
    store = spark.createDataFrame(store_rows, "media_id long, phash long")
    batch = spark.createDataFrame(batch_rows, "media_id long, phash long")

    pairs, new_bands = incremental_phash_near_duplicates(batch, store)
    got = {(r["id_a"], r["id_b"]): r["hamming"] for r in pairs.collect()}
    assert set(got) == {(100, 2), (101, 102)}, got
    assert got[(100, 2)] == 2 and got[(101, 102)] == 1

    # equals the batch-touching subset of a full run over store+batch
    full = phash_near_duplicates(store.unionByName(batch))
    batch_ids = {100, 101, 102}
    want = {
        (b, a) if b in batch_ids else (a, b)
        for a, b in ((r["id_a"], r["id_b"]) for r in full.collect())
        if a in batch_ids or b in batch_ids
    }
    # full-run orientation: id_a < id_b; incremental: batch id first
    assert {tuple(sorted(p)) for p in got} == {
        tuple(sorted(p)) for p in want
    }

    # stored-bands path gives the same pairs
    sb = phash_bands(store)
    pairs2, _ = incremental_phash_near_duplicates(
        batch, store, store_bands=sb
    )
    assert {(r["id_a"], r["id_b"]) for r in pairs2.collect()} == set(got)
    # new_bands rows cover every batch id across all 7 bands
    nb = new_bands.groupBy("id").count().collect()
    assert {r["id"]: r["count"] for r in nb} == {
        100: 7, 101: 7, 102: 7,
    }
