"""Round-9b scale probe: the new banded hamming joins on the
corpus-size axis. phash_near_duplicates at 10k → 100k hashes (10% of
items have a planted ≤4-bit near-dup), video_near_duplicates at
2k → 20k clips × 4 frames. Steady-state min of 2, local[32]. Expect
roughly linear in items at constant near-dup density — the candidate
join volume is Σ bucket² per (band, key), which stays linear while
hashes are near-uniform; a super-linear step means bucket degeneracy.

Run: python examples/scale_probe_r9b.py
"""

import sys
import time

sys.path.insert(0, ".")

import numpy as np  # noqa: E402

from pyspark.sql import functions as F  # noqa: E402

from data_pipelines_spark.operators.phash import phash_near_duplicates  # noqa: E402
from data_pipelines_spark.operators.vdedup import video_near_duplicates  # noqa: E402
from data_pipelines_spark.session import get_spark  # noqa: E402


def _hashes(n: int, seed: int):
    rng = np.random.default_rng(seed)
    base = rng.integers(-(1 << 62), 1 << 62, size=n, dtype=np.int64)
    rows = [(int(i), int(h)) for i, h in enumerate(base)]
    for i in range(0, n, 10):  # 10% planted near-dups
        h = int(base[i])
        u = h & ((1 << 64) - 1)
        for p in rng.choice(64, 4, replace=False):
            u ^= 1 << int(p)
        rows.append((1_000_000 + i, u - (1 << 64) if u >= (1 << 63) else u))
    return rows


def probe_phash(spark, n: int) -> tuple[float, int]:
    df = spark.createDataFrame(
        _hashes(n, seed=n), "media_id long, phash long"
    ).repartition(32).persist()
    df.count()
    times, cnt = [], 0
    for _ in range(2):
        t = time.perf_counter()
        cnt = phash_near_duplicates(df, max_hamming=6).count()
        times.append(time.perf_counter() - t)
    df.unpersist()
    return min(times), cnt


def probe_video(spark, n: int) -> tuple[float, int]:
    rng = np.random.default_rng(n)
    sig = rng.integers(-(1 << 62), 1 << 62, size=(n, 4), dtype=np.int64)
    rows = [(int(i), [int(x) for x in sig[i]]) for i in range(n)]
    for i in range(0, n, 10):
        near = []
        for x in sig[i]:
            u = int(x) & ((1 << 64) - 1)
            for p in rng.choice(64, 2, replace=False):
                u ^= 1 << int(p)
            near.append(u - (1 << 64) if u >= (1 << 63) else u)
        rows.append((1_000_000 + i, near))
    df = spark.createDataFrame(
        rows, "media_id long, sig array<long>"
    ).repartition(32).persist()
    df.count()
    times, cnt = [], 0
    for _ in range(2):
        t = time.perf_counter()
        cnt = video_near_duplicates(df, max_frame_hamming=6).count()
        times.append(time.perf_counter() - t)
    df.unpersist()
    return min(times), cnt


def main() -> None:
    spark = get_spark(app_name="scale-probe-r9b")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(64).repartition(32).mapInPandas(
        lambda it: it, "id long"
    ).write.format("noop").mode("overwrite").save()

    for n in (10_000, 100_000):
        t, cnt = probe_phash(spark, n)
        print(f"phash  n={n:7d} pairs={cnt:6d} min={t:.2f}s", flush=True)
    for n in (2_000, 20_000):
        t, cnt = probe_video(spark, n)
        print(f"video  n={n:7d} pairs={cnt:6d} min={t:.2f}s", flush=True)


if __name__ == "__main__":
    main()
