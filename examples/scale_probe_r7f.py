"""Scale probes for the fifth-session additions: GRIB2 complex
packing, TIFF float predictor, sharded Zarr v3, and the DDSketch
quantile store.

The codec probes time the PER-TASK kernel (one message/tile/shard
set) at 1e6 -> 1e7 elements — at 100 TB these run one-per-file under
`operators/taskmap.py`, so the kernel's scaling IS the job's scaling.
The DDSketch probe times the distributed store build at 1e6 -> 1e7
rows on local[32]. Steady state: min of 2 runs. Run:

    python examples/scale_probe_r7f.py
"""

from __future__ import annotations

import time

import numpy as np


def best_of(fn, n=2):
    times = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        times.append(time.perf_counter() - t0)
    return min(times)


def probe_codecs() -> None:
    from data_pipelines_spark.sources.raster import (
        read_grib_minimal,
        read_tiff_minimal,
        read_zarr_minimal,
    )
    from data_pipelines_spark.sources.raster_encode import (
        encode_geotiff,
        encode_grib2,
        write_zarr_store,
    )
    import os
    import shutil
    import tempfile

    rng = np.random.default_rng(0)
    for n in (1_000_000, 10_000_000):
        side = int(np.sqrt(n))
        vals = np.round(
            np.cumsum(rng.normal(0, 0.01, size=(side, side)), axis=1) + 5.0,
            3,
        )
        tmp = tempfile.mkdtemp(prefix="probe_r7f_")
        try:
            # GRIB2: simple vs complex_sd, encode and decode
            for packing in ("simple", "complex_sd"):
                path = os.path.join(tmp, f"{packing}.grib2")

                def enc(packing=packing, path=path):
                    blob = encode_grib2(
                        [(None, vals)], lat0=50.0, lon0=0.0,
                        dlat=0.01, dlon=0.01, d_scale=3, packing=packing,
                    )
                    with open(path, "wb") as f:
                        f.write(blob)

                te = best_of(enc)
                td = best_of(lambda path=path: read_grib_minimal(path))
                size = os.path.getsize(path)
                print(
                    f"grib2[{packing}]  n={n:>8}  encode={te:6.2f}s  "
                    f"decode={td:6.2f}s  size={size/1e6:7.2f}MB"
                )

            # TIFF PREDICTOR=3 + DEFLATE tiles
            tifp = os.path.join(tmp, "f.tif")

            def enc_tif():
                blob = encode_geotiff(
                    vals.astype("<f4"), origin_x=0, origin_y=0,
                    pixel_w=1.0, pixel_h=1.0, tile=(256, 256),
                    compression="deflate", predictor=True,
                )
                with open(tifp, "wb") as f:
                    f.write(blob)

            te = best_of(enc_tif)
            td = best_of(lambda: read_tiff_minimal(tifp))
            print(
                f"tiff[pred3+defl]  n={n:>8}  encode={te:6.2f}s  "
                f"decode={td:6.2f}s  size={os.path.getsize(tifp)/1e6:7.2f}MB"
            )

            # Zarr v3 sharded: 512-square inner chunks, 4x4-chunk shards
            store = os.path.join(tmp, "s.zarr")

            def enc_zarr():
                shutil.rmtree(store, ignore_errors=True)
                write_zarr_store(
                    store, "v", vals,
                    {"y": np.arange(side, dtype="f8"),
                     "x": np.arange(side, dtype="f8")},
                    chunks=(256, 256), shards=(1024, 1024),
                    compressor="gzip", zarr_format=3,
                )

            te = best_of(enc_zarr)
            td = best_of(lambda: read_zarr_minimal(os.path.join(store, "v")))
            du = sum(
                os.path.getsize(os.path.join(dp, f))
                for dp, _, fs in os.walk(store) for f in fs
            )
            print(
                f"zarr3[sharded]    n={n:>8}  encode={te:6.2f}s  "
                f"decode={td:6.2f}s  size={du/1e6:7.2f}MB"
            )
        finally:
            shutil.rmtree(tmp, ignore_errors=True)


def probe_ddsketch() -> None:
    from pyspark.sql import SparkSession, functions as F

    from data_pipelines_spark.operators.sketches import (
        quantile_sketch,
        quantile_sketch_values,
    )

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    for n in (1_000_000, 10_000_000):
        df = spark.range(n).select(
            (F.col("id") % 16).alias("g"),
            F.exp(F.pmod(F.xxhash64("id"), 1000) / F.lit(100.0)).alias("v"),
        )
        t = best_of(
            lambda df=df: quantile_sketch(df, ["g"], "v", alpha=0.01)
            .agg(F.sum("cnt"))
            .collect()
        )
        store = quantile_sketch(df, ["g"], "v", alpha=0.01).cache()
        rows = store.count()
        tq = best_of(
            lambda store=store: quantile_sketch_values(
                store, ["g"], [0.5, 0.95, 0.99], 0.01
            ).collect()
        )
        store.unpersist()
        print(
            f"ddsketch build     n={n:>8}  sketch={t:6.2f}s  "
            f"store_rows={rows}  readback={tq:6.2f}s"
        )
    spark.stop()


def probe_dsir() -> None:
    from pyspark.sql import SparkSession, functions as F

    from data_pipelines_spark.operators.corpus import dsir_importance_weights

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    words = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    target = spark.range(1000).select(
        F.col("id").alias("doc_id"),
        F.lit(words + " target domain phrase").alias("text"),
    )
    for n in (100_000, 1_000_000):
        raw = spark.range(n).select(
            F.col("id").alias("doc_id"),
            F.concat(
                F.lit(words + " "), (F.col("id") % 9973).cast("string"),
                F.lit(" "), (F.col("id") % 97).cast("string"),
            ).alias("text"),
        )
        t = best_of(
            lambda raw=raw: dsir_importance_weights(raw, target)
            .agg(F.sum("dsir_logweight"))
            .collect(),
            n=2,
        )
        print(f"dsir weights       n={n:>8}  score={t:6.2f}s")
    spark.stop()


if __name__ == "__main__":
    probe_codecs()
    probe_ddsketch()
    probe_dsir()
