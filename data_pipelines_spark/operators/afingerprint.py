"""Acoustic fingerprinting + near-duplicate detection.

Completes the modality-dedup matrix (text: MinHash `operators/dedup`;
image: pHash `operators/phash`; video: `operators/vdedup`): re-encoded
or slightly-degraded copies of the same recording must collapse before
an audio corpus trains anything. The fingerprint is the
Haitsma-Kalker construction (the Philips robust hash; chromaprint is
its descendant):

1. decode to mono float (mean over channels);
2. frame: 2048-sample windows, 1024 hop, Hann;
3. rFFT magnitude energy in 17 log-spaced bands over 300-3000 Hz
   (log spacing matches pitch perception; the band edges derive from
   the clip's own sample rate so the same audio fingerprints the same
   at any rate ≥ 8 kHz);
4. bit(b, t) = sign of the band-energy difference's TIME derivative:
   (E[b,t] − E[b+1,t]) − (E[b,t−1] − E[b+1,t−1]) > 0 — 16 bits per
   frame from t=1, packed into one int32 per frame.

The per-frame sub-fingerprints are small-Hamming-stable under noise
and amplitude changes (energy DIFFERENCES cancel gain; the sign
survives small perturbations). Near-dup search mirrors the pHash tier:
frame-hash equality is the candidate generator (two copies of one
recording share many EXACT sub-fingerprints), then the aligned
bit-error rate verifies — never all-pairs.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FRAME = 2048
HOP = 1024
N_BANDS = 17  # 17 edges-1 = 16 band differences = 16 bits/frame
F_LO, F_HI = 300.0, 3000.0


def fingerprint_wav(samples: np.ndarray, rate: int) -> list[int]:
    """Mono-ized samples (n,) or (n, ch) in [-1, 1] → per-frame 16-bit
    sub-fingerprints (one int per frame, from the 2nd frame on).
    Deterministic: fixed window/hop, Hann from numpy, exact band-edge
    arithmetic. Clips shorter than 2 frames raise — a fingerprint of
    nothing is a correctness bug upstream, not an empty result."""
    a = np.asarray(samples, dtype=np.float64)
    if a.ndim == 2:
        a = a.mean(axis=1)
    if a.ndim != 1:
        raise ValueError(f"samples must be (n,) or (n, ch), got {a.shape}")
    if len(a) < FRAME + HOP:
        raise ValueError(
            f"fingerprint_wav: need >= {FRAME + HOP} samples, got {len(a)}"
        )
    n_frames = 1 + (len(a) - FRAME) // HOP
    win = np.hanning(FRAME)
    freqs = np.fft.rfftfreq(FRAME, 1.0 / rate)
    edges = np.geomspace(F_LO, min(F_HI, rate / 2.0 - 1.0), N_BANDS)
    band_of = np.searchsorted(edges, freqs) - 1  # -1 below, N_BANDS-1 above

    energies = np.zeros((n_frames, N_BANDS - 1))
    for t in range(n_frames):
        frame = a[t * HOP : t * HOP + FRAME] * win
        mag = np.abs(np.fft.rfft(frame)) ** 2
        for b in range(N_BANDS - 1):
            sel = band_of == b
            if sel.any():
                energies[t, b] = mag[sel].sum()
    # bit(b,t): d(E_b - E_{b+1})/dt > 0  → 16 bits; band count is 16
    diff = energies[:, :-1] - energies[:, 1:]  # (n_frames, 15)... see below
    # N_BANDS-1 = 16 energy bands → 15 differences; pad with the last
    # band's own derivative to keep a full 16-bit word
    dt = np.diff(
        np.concatenate([diff, energies[:, -1:]], axis=1), axis=0
    ) > 0  # (n_frames-1, 16)
    out = []
    for row in dt:
        v = 0
        for bit in row:
            v = (v << 1) | int(bit)
        out.append(v)
    return out


AUDIO_FP_SCHEMA = "media_id long, fp array<int>, n_frames int"


def audio_fingerprint(media: DataFrame) -> DataFrame:
    """(media_id, content binary WAV) → (media_id, fp array<int>,
    n_frames). Payload-grain mapInPandas over the engine's own WAV
    decoder; decode or too-short clips raise (taskmap retry path)."""
    import pandas as pd

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        from data_pipelines_spark.operators.multimodal import decode_wav

        for pdf in batches:
            ids, fps, ns = [], [], []
            for mid, blob in zip(pdf["media_id"], pdf["content"]):
                samples, rate, _ = decode_wav(bytes(blob))
                fp = fingerprint_wav(samples, rate)
                ids.append(mid)
                fps.append(fp)
                ns.append(len(fp))
            yield pd.DataFrame(
                {"media_id": ids, "fp": fps, "n_frames": ns}
            )

    return media.select("media_id", "content").mapInPandas(
        run, AUDIO_FP_SCHEMA
    )


def audio_near_duplicates(
    fps: DataFrame,
    max_bit_error_rate: float = 0.15,
    min_exact_frames: int = 1,
    id_col: str = "media_id",
    fp_col: str = "fp",
) -> DataFrame:
    """Near-duplicate pairs among equal-length fingerprints →
    ``(id_a, id_b, bit_error_rate)``.

    Candidates: pairs sharing ≥ ``min_exact_frames`` (frame_idx,
    sub-fingerprint) EXACT matches — an equi-join on the exploded
    frame stream (copies of one recording share many exact frames; two
    unrelated clips share a 16-bit frame value by chance at ~n/65536).
    Verify: aligned bit-error rate over the full arrays via
    zip_with + popcount, kept when ≤ ``max_bit_error_rate`` (the
    Haitsma-Kalker decision threshold; their paper uses 0.35 on 256
    frames — 0.15 is the conservative corpus-dedup setting).

    Different-length clips never pair (alignment would need a search
    over offsets — out of scope; trim/segment upstream).
    """
    base = fps.select(
        F.col(id_col).alias("id"),
        F.col(fp_col).alias("fp"),
        F.size(fp_col).alias("n"),
    )
    frames = base.select(
        "id", "n", F.posexplode("fp").alias("idx", "sub")
    )
    a = frames.alias("a")
    b = frames.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.idx") == F.col("b.idx"))
            & (F.col("a.sub") == F.col("b.sub"))
            & (F.col("a.n") == F.col("b.n"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .groupBy(
            F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b")
        )
        .agg(F.count(F.lit(1)).alias("__hits"))
        .where(F.col("__hits") >= min_exact_frames)
        .select("id_a", "id_b")
    )
    withs = (
        cand.join(base.select(F.col("id").alias("id_a"),
                              F.col("fp").alias("fp_a"),
                              F.col("n").alias("n_a")), "id_a")
        .join(base.select(F.col("id").alias("id_b"),
                          F.col("fp").alias("fp_b")), "id_b")
    )
    ber = (
        F.aggregate(
            F.zip_with(
                "fp_a", "fp_b",
                lambda x, y: F.bit_count(x.bitwiseXOR(y)).cast("long"),
            ),
            F.lit(0).cast("long"),
            lambda acc, v: acc + v,
        ).cast("double")
        / (F.col("n_a").cast("double") * 16.0)
    )
    return withs.select(
        "id_a",
        "id_b",
        F.round(ber, 6).alias("bit_error_rate"),
    ).where(F.col("bit_error_rate") <= max_bit_error_rate)
