"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as `binary` columns with a
metadata struct; decode / feature-extraction steps are Arrow-batched
`mapInPandas` stages. The decode kernels themselves are STUBBED here
(codec libraries are not available in this environment — marked
clearly below); the Spark-side contract — schema, batch shape, UDF
signature, partitioning — is real and tested.

Reference analogue: the sentinel imagery pipeline (SURVEY.md §3.3) is
exactly this shape — opaque blobs moved through per-file task maps with
a GPU inference step in the middle (`assets/sentinel/upscaling.py`).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),  # image | audio | video
        StructField("content", BinaryType()),
        StructField("format", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_bytes", LongType()),
    ]
)

FEATURE_SCHEMA = (
    "media_id long, kind string, format string, n_bytes long, "
    "feature array<double>"
)


def read_binary_dir(spark, path: str, glob: str = "*") -> DataFrame:
    """Ingest a directory of media files as (path, modificationTime,
    length, content) via the binaryFile source (reference S-blob
    ingestion, `assets/sentinel/raw_ingest.py`)."""
    return (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(path)
    )


def decode_image(content: bytes) -> "object":
    """STUB: image decode requires a codec library (PIL/opencv) that is
    not available in this environment."""
    raise NotImplementedError(
        "image decode requires a codec library; wire PIL/opencv here"
    )


def _fake_feature(content: bytes, dim: int = 8) -> list[float]:
    """Deterministic stand-in for a decoded-media feature vector: a
    byte-histogram projection. Keeps the pipeline testable end-to-end
    without codecs; swap for a real embedding model in production."""
    if content is None:
        return [0.0] * dim
    acc = [0] * dim
    for i, b in enumerate(content):
        acc[i % dim] += b
    n = max(len(content), 1)
    return [a / n for a in acc]


def extract_features(
    media: DataFrame, batch_feature_fn=None, dim: int = 8
) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    ``mapInPandas`` so each Python batch handles many rows (vectorized
    transfer); partitioning of the input (e.g. by kind or size bucket)
    is preserved. Pass a real ``batch_feature_fn(pd.Series)->pd.Series``
    to replace the deterministic fake."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if batch_feature_fn is not None:
                feats = batch_feature_fn(pdf["content"])
            else:
                feats = pdf["content"].map(lambda c: _fake_feature(c, dim))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "format": pdf["format"],
                    "n_bytes": pdf["n_bytes"],
                    "feature": feats,
                }
            )

    return media.mapInPandas(run, FEATURE_SCHEMA)


FRAME_SCHEMA = (
    "media_id long, frame_no int, frame_offset long, frame bytes".replace(
        "bytes", "binary"
    )
)


def sample_frames(
    media: DataFrame, num_frames: int = 4, frame_bytes: int = 1024
) -> DataFrame:
    """Evenly-spaced frame sampling from video/audio payloads.

    One input row fans out to ``num_frames`` rows of (media_id,
    frame_no, frame_offset, frame). Real deployments put a demuxer
    (ffmpeg/pyav — not available here) where the byte-window slice is;
    the fan-out shape, offsets, schema, and Arrow batching are the real
    plumbing either way. Deterministic: offsets depend only on payload
    length.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "frame_no": [], "frame_offset": [], "frame": []}
            for _, row in pdf.iterrows():
                content = row["content"] or b""
                n = len(content)
                if n == 0:
                    continue
                step = max(n // num_frames, 1)
                for i in range(num_frames):
                    off = min(i * step, max(n - 1, 0))
                    out["media_id"].append(row["media_id"])
                    out["frame_no"].append(i)
                    out["frame_offset"].append(off)
                    out["frame"].append(bytes(content[off : off + frame_bytes]))
            yield pd.DataFrame(out)

    return media.select("media_id", "content").mapInPandas(run, FRAME_SCHEMA)


def resize_stub(frames: DataFrame, width: int, height: int) -> DataFrame:
    """STUB: raster resize needs a codec/imaging library. The engine
    carries the contract (adds target dims, passes payload through) so
    pipelines can be wired and tested before the kernel lands."""
    return frames.withColumn("target_width", F.lit(width)).withColumn(
        "target_height", F.lit(height)
    )


def filter_nodata(media: DataFrame, min_bytes: int = 1) -> DataFrame:
    """Drop empty/placeholder payloads (reference
    `preprocess_filter_nodata`, `preprocessing.py:136-159` — drops
    all-nodata tiles)."""
    return media.where(
        F.col("content").isNotNull() & (F.col("n_bytes") >= min_bytes)
    )
