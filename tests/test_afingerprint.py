"""Acoustic fingerprint (`operators.afingerprint`): determinism,
robustness (noise / gain / 16→24-bit re-encode keep BER small; distinct
audio is far), distributed == kernel, candidate-join near-dup parity."""

import numpy as np
import pytest

from data_pipelines_spark.operators.afingerprint import (
    audio_fingerprint,
    audio_near_duplicates,
    fingerprint_wav,
)

RATE = 8000


def _tone_mix(seed: int, seconds: float = 2.0) -> np.ndarray:
    """Deterministic 'music': seeded sine partials with slow amplitude
    envelopes PLUS a broadband texture floor — real audio is broadband,
    and without it near-zero-energy bands flip their derivative sign
    under any perturbation (measured: sparse 6-tone fixtures showed
    noise BER ~0.17-0.33; with the floor it is ~0.02-0.11 against an
    unrelated-audio BER of ~0.53)."""
    rng = np.random.default_rng(seed)
    t = np.arange(int(RATE * seconds)) / RATE
    out = np.zeros_like(t)
    for _ in range(12):
        f = float(rng.uniform(320, 2800))
        phase = float(rng.uniform(0, 2 * np.pi))
        env = 0.5 + 0.5 * np.sin(2 * np.pi * rng.uniform(0.2, 1.5) * t)
        out += env * np.sin(2 * np.pi * f * t + phase)
    tex = np.convolve(
        rng.standard_normal(len(t)), np.ones(8) / 8, mode="same"
    )
    return (0.09 * out + 0.05 * tex).astype(np.float64)


def _ber(a: list[int], b: list[int]) -> float:
    assert len(a) == len(b)
    return sum(bin(x ^ y).count("1") for x, y in zip(a, b)) / (16.0 * len(a))


def test_fingerprint_deterministic_and_shaped():
    a = _tone_mix(1)
    fp = fingerprint_wav(a, RATE)
    assert fp == fingerprint_wav(a.copy(), RATE)
    assert len(fp) == (len(a) - 2048) // 1024  # frames - 1
    assert all(0 <= v < (1 << 16) for v in fp)


def test_fingerprint_robust_and_discriminative():
    a = _tone_mix(2)
    fp_a = fingerprint_wav(a, RATE)
    rng = np.random.default_rng(0)
    noisy = a + 0.01 * rng.standard_normal(len(a))
    assert _ber(fp_a, fingerprint_wav(noisy, RATE)) < 0.12
    assert _ber(fp_a, fingerprint_wav(0.5 * a, RATE)) < 0.02  # gain
    fp_b = fingerprint_wav(_tone_mix(3), RATE)
    assert _ber(fp_a, fp_b) > 0.35  # unrelated audio is far


def test_fingerprint_survives_bit_depth_reencode():
    from data_pipelines_spark.operators.multimodal import (
        decode_wav,
        encode_wav,
    )

    a = _tone_mix(4)
    fp = fingerprint_wav(a, RATE)
    for width in (2, 3):
        rt, rate, _ = decode_wav(encode_wav(a, RATE, width=width))
        assert _ber(fp, fingerprint_wav(rt, rate)) < 0.05, width


def test_fingerprint_too_short_raises():
    with pytest.raises(ValueError, match="need >="):
        fingerprint_wav(np.zeros(1000), RATE)


def test_audio_fingerprint_distributed_matches_kernel(spark):
    from data_pipelines_spark.operators.multimodal import encode_wav

    clips = {i: _tone_mix(i) for i in range(4)}
    df = spark.createDataFrame(
        [(i, bytearray(encode_wav(a, RATE, width=2))) for i, a in clips.items()],
        "media_id long, content binary",
    )
    got = {r["media_id"]: (list(r["fp"]), r["n_frames"])
           for r in audio_fingerprint(df.repartition(3)).collect()}
    from data_pipelines_spark.operators.multimodal import decode_wav

    for i, a in clips.items():
        rt, rate, _ = decode_wav(encode_wav(a, RATE, width=2))
        want = fingerprint_wav(rt, rate)
        assert got[i] == (want, len(want)), i


def test_audio_near_duplicates(spark):
    rng = np.random.default_rng(9)
    rows = []
    for i in range(5):
        a = _tone_mix(10 + i)
        rows.append((i, fingerprint_wav(a, RATE)))
        # planted near-dup: light noise copy
        noisy = a + 0.005 * rng.standard_normal(len(a))
        rows.append((100 + i, fingerprint_wav(noisy, RATE)))
    df = spark.createDataFrame(rows, "media_id long, fp array<int>")
    got = {(r["id_a"], r["id_b"]): r["bit_error_rate"]
           for r in audio_near_duplicates(df).collect()}
    for i in range(5):
        assert (i, 100 + i) in got, (i, sorted(got))
        assert got[(i, 100 + i)] < 0.12
    # no cross-pair between unrelated clips
    assert all(b - a == 100 for a, b in got)

    # partition invariance
    again = {(r["id_a"], r["id_b"]): r["bit_error_rate"]
             for r in audio_near_duplicates(df.repartition(7)).collect()}
    assert got == again
