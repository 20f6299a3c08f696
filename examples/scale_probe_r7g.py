"""Scale probes for the sixth-session additions: JPEG-in-TIFF,
GRIB2 missing-value management, PNG Adam7/sub-byte, and the
Kneser-Ney bigram LM.

Codec probes time the PER-TASK kernel (one file) at growing pixel
counts — at 100 TB these run one-per-file under `operators/taskmap.py`,
so the kernel's scaling IS the job's scaling. The KN-LM probe times
the distributed train+score pipeline on local[32] over the documents
table at sf0.01 -> sf0.1 -> sf0.1 replicated x5 (shifted ids, so
vocabulary structure repeats rather than degenerates). Steady state:
min of 2 runs. Run:

    python examples/scale_probe_r7g.py
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def best_of(fn, n=2):
    times = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        times.append(time.perf_counter() - t0)
    return min(times)


def probe_codecs() -> None:
    from data_pipelines_spark.operators.multimodal import (
        decode_png,
        encode_png,
    )
    from data_pipelines_spark.sources.raster import (
        read_grib_minimal,
        read_tiff_minimal,
    )
    from data_pipelines_spark.sources.raster_encode import (
        encode_geotiff,
        encode_grib2,
    )

    rng = np.random.default_rng(0)
    for n in (1_000_000, 4_000_000):
        side = int(np.sqrt(n))
        tmp = tempfile.mkdtemp(prefix="probe_r7g_")
        try:
            # JPEG-in-TIFF: tiled, shared tables (the COG-with-JPEG
            # profile). The kernel is the python-loop entropy coder —
            # the known-slow axis, parallel per tile at scale.
            img8 = (
                np.cumsum(rng.normal(0, 0.3, (side, side)), axis=1) + 128
            ).clip(0, 255).astype("u1")
            path = os.path.join(tmp, "t.tif")

            def enc_jpeg():
                blob = encode_geotiff(
                    img8, origin_x=0.0, origin_y=0.0, pixel_w=1.0,
                    pixel_h=1.0, tile=(256, 256), compression="jpeg",
                    jpeg_quality_divisor=8, jpeg_tables=True,
                )
                with open(path, "wb") as f:
                    f.write(blob)

            t_enc = best_of(enc_jpeg)
            t_dec = best_of(lambda: read_tiff_minimal(path))
            print(f"jpeg-in-tiff {n:>9}px  enc {t_enc:6.2f}s  "
                  f"dec {t_dec:6.2f}s  "
                  f"size {os.path.getsize(path) / n:.2f} B/px")

            # GRIB2 complex_sd with missing-value management vs bitmap
            vals = np.round(
                np.cumsum(rng.normal(0, 0.01, (side, side)), axis=1) + 5.0,
                2,
            )
            vals[rng.random((side, side)) < 0.1] = np.nan
            for missing in ("bitmap", "mvm"):
                gpath = os.path.join(tmp, f"{missing}.grib2")

                def enc_grib(missing=missing, gpath=gpath):
                    blob = encode_grib2(
                        [(None, vals)], lat0=50.0, lon0=0.0, dlat=0.01,
                        dlon=0.01, d_scale=2, packing="complex_sd",
                        missing=missing,
                    )
                    with open(gpath, "wb") as f:
                        f.write(blob)

                t_enc = best_of(enc_grib)
                t_dec = best_of(lambda p=gpath: read_grib_minimal(p))
                print(f"grib2 cx {missing:>6} {n:>9}px  enc {t_enc:6.2f}s"
                      f"  dec {t_dec:6.2f}s  "
                      f"size {os.path.getsize(gpath) / n:.2f} B/px")

            # PNG: Adam7 + 4-bit palette vs plain 8-bit
            idx = (img8 >> 4).astype("u1")
            palette = rng.integers(0, 256, (16, 3)).astype("u1")
            for tag, kw in (
                ("plain8", dict()),
                ("adam7", dict(interlace=True)),
                ("pal4", dict(depth=4, palette=palette)),
            ):
                arr = img8 if tag != "pal4" else idx
                blob = encode_png(arr, **kw)
                t_enc = best_of(lambda a=arr, k=kw: encode_png(a, **k))
                t_dec = best_of(lambda b=blob: decode_png(b))
                print(f"png {tag:>7} {n:>9}px  enc {t_enc:6.2f}s  "
                      f"dec {t_dec:6.2f}s  size {len(blob) / n:.2f} B/px")
        finally:
            shutil.rmtree(tmp, ignore_errors=True)


def probe_kn_lm() -> None:
    from pyspark.sql import SparkSession, functions as F

    from data_pipelines_spark.operators.corpus import (
        kneser_ney_bigram_logprob,
    )
    from data_pipelines_spark.session import tune

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "24g")
        .getOrCreate()
    )
    tune(spark)
    spark.sparkContext.setLogLevel("ERROR")

    def run(docs, label):
        t = best_of(
            lambda: kneser_ney_bigram_logprob(docs)
            .agg(F.count(F.lit(1)), F.sum("kn_logprob10"))
            .collect()
        )
        print(f"kn_bigram_lm {label:>8}  {t:6.2f}s  ({docs.count()} docs)")

    small = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    big = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    run(small, "sf0.01")
    run(big, "sf0.1")
    n = big.agg(F.max("doc_id")).first()[0] + 1
    rep = big
    for i in range(1, 5):
        rep = rep.unionByName(
            big.withColumn("doc_id", F.col("doc_id") + F.lit(i * n))
        )
    run(rep, "sf0.1x5")

    from data_pipelines_spark.operators.tokenizer import (
        bpe_encode,
        train_bpe,
    )

    for label, frame in (("sf0.01", small), ("sf0.1", big), ("sf0.1x5", rep)):
        t0 = time.perf_counter()
        merges = train_bpe(frame, num_merges=200)
        t_train = time.perf_counter() - t0
        t0 = time.perf_counter()
        total = (
            bpe_encode(frame, merges)
            .groupBy()
            .sum("bpe_tokens_n")
            .first()[0]
        )
        t_enc = time.perf_counter() - t0
        print(f"bpe {label:>8}  train {t_train:6.2f}s  encode {t_enc:6.2f}s"
              f"  ({total} subword tokens)")
    spark.stop()


if __name__ == "__main__":
    probe_codecs()
    probe_kn_lm()
