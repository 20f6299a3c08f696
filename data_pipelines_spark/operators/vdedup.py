"""Video near-duplicate detection: per-frame perceptual hashes.

The fourth corner of the modality-dedup matrix (text MinHash, image
pHash, audio fingerprint): a re-encoded / re-quality-compressed copy of
a clip must collapse before a video corpus trains anything. A clip's
signature is the pHash of each sampled frame (`operators.mp4.
sample_frames_mp4` demux → `operators.phash.phash64`), and two clips
are near-dups when every aligned frame is within a small Hamming
distance — re-encoding perturbs each frame slightly; different content
diverges on (almost) every frame.

Candidate generation mirrors the pHash tier: each frame hash splits
into 8×8-bit bands and candidates share (frame position, band, value);
by pigeonhole a frame pair within Hamming ≤ 7 ALWAYS shares a band, so
recall is exact for ``max_frame_hamming <= 7`` (the default 6). Never
all-pairs; the shuffle carries (pos, band, key, id) rows.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

VIDEO_SIG_SCHEMA = "media_id long, frame_no int, frame_phash long"


def video_frame_phashes(media: DataFrame, num_frames: int = 4) -> DataFrame:
    """(media_id, content binary MP4) → one row per sampled frame
    ``(media_id, frame_no, frame_phash)``: real ISO-BMFF demux, frames
    decoded by the native JPEG tier (MJPEG clips), pHashed. Payload-
    grain; non-MJPEG samples raise through `decode_image`'s codec gate.
    """
    import pandas as pd

    from data_pipelines_spark.operators.mp4 import sample_frames_mp4

    frames = sample_frames_mp4(media, num_frames=num_frames)

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        from data_pipelines_spark.operators.multimodal import decode_image
        from data_pipelines_spark.operators.phash import phash64

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "frame_no": pdf["frame_no"],
                    "frame_phash": [
                        phash64(decode_image(bytes(b))) for b in pdf["frame"]
                    ],
                }
            )

    return frames.mapInPandas(run, VIDEO_SIG_SCHEMA)


def video_signatures(frame_hashes: DataFrame) -> DataFrame:
    """Frame rows → one ``(media_id, sig array<long>, n_frames)`` row,
    frames ordered by position (sort_array over (frame_no, hash)
    structs — deterministic under any partitioning)."""
    return frame_hashes.groupBy("media_id").agg(
        F.transform(
            F.array_sort(
                F.collect_list(F.struct("frame_no", "frame_phash"))
            ),
            lambda s: s["frame_phash"],
        ).alias("sig"),
        F.count(F.lit(1)).cast("int").alias("n_frames"),
    )


def video_near_duplicates(
    signatures: DataFrame,
    max_frame_hamming: int = 6,
    id_col: str = "media_id",
    sig_col: str = "sig",
) -> DataFrame:
    """Near-duplicate clip pairs → ``(id_a, id_b, max_hamming,
    mean_hamming)`` where EVERY aligned frame pair is within
    ``max_frame_hamming`` bits. Clips with different frame counts never
    pair. Exact recall for ``max_frame_hamming <= 7`` (see module
    docstring); larger thresholds raise rather than silently losing
    recall."""
    if not 0 <= max_frame_hamming <= 7:
        raise ValueError(
            "max_frame_hamming must be in [0, 7]: 8x8-bit bands only "
            "pigeonhole-guarantee recall up to 7; use operators.phash "
            "directly with more bands for looser thresholds"
        )
    base = signatures.select(
        F.col(id_col).alias("id"),
        F.col(sig_col).alias("sig"),
        F.size(sig_col).alias("n"),
    )
    frames = base.select(
        "id", "n", F.posexplode("sig").alias("pos", "h")
    )
    bands = frames.select(
        "id",
        "n",
        "pos",
        F.explode(F.sequence(F.lit(0), F.lit(7))).alias("band"),
        F.col("h").alias("h"),
    ).select(
        "id",
        "n",
        "pos",
        "band",
        # shiftrightunsigned's PySpark wrapper wants a literal shift;
        # the SQL form takes a column
        F.expr("shiftrightunsigned(h, band * 8) & 255").alias("key"),
    )
    a = bands.alias("a")
    b = bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.pos") == F.col("b.pos"))
            & (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.n") == F.col("b.n"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b")
        )
        .distinct()
    )
    paired = (
        cand.join(
            base.select(F.col("id").alias("id_a"),
                        F.col("sig").alias("sig_a")), "id_a"
        ).join(
            base.select(F.col("id").alias("id_b"),
                        F.col("sig").alias("sig_b"),
                        F.col("n").alias("n_b")), "id_b"
        )
    )
    dists = F.zip_with(
        "sig_a", "sig_b",
        lambda x, y: F.bit_count(x.bitwiseXOR(y)).cast("long"),
    )
    return paired.select(
        "id_a",
        "id_b",
        F.array_max(dists).cast("int").alias("max_hamming"),
        F.round(
            F.aggregate(
                dists, F.lit(0).cast("long"), lambda acc, v: acc + v
            ).cast("double")
            / F.col("n_b").cast("double"),
            4,
        ).alias("mean_hamming"),
    ).where(F.col("max_hamming") <= max_frame_hamming)
