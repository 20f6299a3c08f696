"""Round-9 scale probe: the MJPEG frame pipeline
(`sample_frames_mp4` demux → `decode_jpeg` pixels) on the per-payload
kernel axis — 1e3 → 1e4 clips (VERDICT r8 Next #7, the same axis as
the jpeg-in-tiff probe in NOTES_r7 §23a). Steady-state min of 2,
local[32]. Expect linear-in-clips (payload-grain mapInPandas fan-out,
no shuffle between demux and decode); any super-linear step means a
hidden collect or re-parse.

Run: python examples/scale_probe_r9.py
"""

import sys
import time

sys.path.insert(0, ".")

import numpy as np  # noqa: E402

from data_pipelines_spark.operators.jpeg import encode_jpeg_baseline  # noqa: E402
from data_pipelines_spark.operators.mp4 import encode_mp4, sample_frames_mp4  # noqa: E402
from data_pipelines_spark.session import get_spark  # noqa: E402

FRAMES_PER_CLIP = 4
SIDE = 16


def build_clips(n_clips: int) -> list[tuple[int, bytearray]]:
    """n MJPEG clips. Eight distinct JPEG frames are encoded once and
    clips rotate through them, so fixture build time stays O(n) cheap
    while every clip still demuxes 4 genuinely different samples."""
    rng = np.random.default_rng(9)
    pool = [
        encode_jpeg_baseline(
            (rng.integers(0, 255, (SIDE, SIDE)).astype(np.uint8))
        )
        for _ in range(8)
    ]
    out = []
    for i in range(n_clips):
        frames = [pool[(i + j) % 8] for j in range(FRAMES_PER_CLIP)]
        out.append((i, bytearray(encode_mp4(frames, width=SIDE, height=SIDE))))
    return out


def run_pipeline(spark, clips) -> float:
    import pandas as pd

    df = spark.createDataFrame(
        clips, "media_id long, content binary"
    ).repartition(32)
    frames = sample_frames_mp4(df, num_frames=FRAMES_PER_CLIP)

    def decode(batches):
        from data_pipelines_spark.operators.jpeg import decode_jpeg

        for pdf in batches:
            sums = [
                float(np.asarray(decode_jpeg(bytes(b))).sum())
                for b in pdf["frame"]
            ]
            yield pd.DataFrame(
                {"media_id": pdf["media_id"], "pix_sum": sums}
            )

    from pyspark.sql import functions as F

    out = frames.mapInPandas(decode, "media_id long, pix_sum double").agg(
        F.count(F.lit(1)).alias("n"), F.sum("pix_sum").alias("s")
    )
    start = time.perf_counter()
    [row] = out.collect()
    elapsed = time.perf_counter() - start
    assert row["n"] == len(clips) * FRAMES_PER_CLIP, row
    return elapsed


def main() -> None:
    spark = get_spark(app_name="scale-probe-r9")
    spark.sparkContext.setLogLevel("ERROR")
    # worker-pool warmup (same rationale as bench.py)
    import pandas as _pd  # noqa: F401

    spark.range(64).repartition(32).mapInPandas(
        lambda it: it, "id long"
    ).write.format("noop").mode("overwrite").save()

    for n in (1_000, 10_000):
        clips = build_clips(n)
        times = [run_pipeline(spark, clips) for _ in range(2)]
        print(
            f"clips={n:6d} frames={n * FRAMES_PER_CLIP:6d} "
            f"min={min(times):.2f}s runs={[round(t, 2) for t in times]}",
            flush=True,
        )


if __name__ == "__main__":
    main()
