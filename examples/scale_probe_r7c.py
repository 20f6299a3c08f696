"""Round-7 (session 3) scale probes:

- zonal treeloss chain (masks -> dense counts -> areas join): one wide
  shuffle at pixel grain plus a broadcast — must scale ~linearly in
  pixels with the dense universe fixed.
- incremental minhash dedup with a FIXED daily batch against a GROWING
  store: the whole point of the incremental shape is that cost follows
  |batch| x bucket occupancy, not |store| — the store side must stay
  sub-linear as the store replicates 1x -> 5x.
- the same join with the store as a bucketed table vs a plain parquet
  table: the bucketed read skips the store-side shuffle.

Same protocol as scale_probe_r7.py: min of 2 runs, local[32].

Usage: python examples/scale_probe_r7c.py
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from data_pipelines_spark.session import get_spark
from data_pipelines_spark.sources.tables import load_table

SF_SMALL = "/root/testdata/sf0.01"
SF_BIG = "/root/testdata/sf0.1"


def timed(fn):
    best, n = None, None
    for _ in range(2):
        t0 = time.monotonic()
        n = fn()
        dt = time.monotonic() - t0
        best = dt if best is None else min(best, dt)
    return round(best, 3), n


def probe_zonal(spark, sf):
    from data_pipelines_spark.operators.zonal import (
        coarsen_sum,
        treeloss_per_basin,
        yearly_loss_masks,
    )

    li = load_table(spark, sf, "lineitem")
    zoned = li.select(
        ((F.col("l_partkey") % 340) - 170).cast("long").alias("x"),
        ((F.col("l_suppkey") % 160) - 80).cast("long").alias("y"),
        (F.col("l_linenumber") - 1).cast("long").alias("lossyear"),
        (F.col("l_orderkey") % 37).cast("long").alias("id"),
        F.col("l_quantity"),
    )

    def run():
        n = coarsen_sum(zoned, 10, 5, value_col="l_quantity").count()
        n += coarsen_sum(
            yearly_loss_masks(zoned), 10, 5, value_col="mask",
            extra_keys=("year",),
        ).count()
        n += treeloss_per_basin(zoned, zoned, 0.25, id_col="id").count()
        return n

    return timed(run)


def replicate_docs(spark, sf_dir, copies, id_shift=10_000_000):
    docs = load_table(spark, sf_dir, "documents")
    out = docs.select(
        (F.col("doc_id") + F.lit(0)).alias("doc_id"), "text"
    )
    for i in range(1, copies):
        out = out.unionByName(
            docs.select(
                (F.col("doc_id") + F.lit(i * id_shift)).alias("doc_id"), "text"
            )
        )
    return out.repartition(32).localCheckpoint(eager=True)


def probe_incremental(spark):
    from data_pipelines_spark.operators.dedup import (
        incremental_near_duplicates,
        minhash_band_buckets,
        minhash_signatures,
    )
    from data_pipelines_spark.sources.bucketed import write_bucketed

    batch = load_table(spark, SF_BIG, "documents").select(
        (F.col("doc_id") + 90_000_000).alias("doc_id"), "text"
    ).localCheckpoint(eager=True)

    for copies in (1, 5):
        store_docs = replicate_docs(spark, SF_BIG, copies)
        sigs = minhash_signatures(store_docs).localCheckpoint(eager=True)
        t, n = timed(
            lambda: incremental_near_duplicates(
                batch, sigs, jaccard_threshold=0.5
            )[0].count()
        )
        print(f"store x{copies}: incremental (derived buckets) {t}s "
              f"({n} pairs)", flush=True)

        with tempfile.TemporaryDirectory() as d:
            buckets = minhash_band_buckets(sigs)
            write_bucketed(
                buckets, "probe_bands", os.path.join(d, "bands"),
                ["band", "band_hash"], 32,
            )
            plain_path = os.path.join(d, "plain")
            buckets.write.parquet(plain_path)
            t, n = timed(
                lambda: incremental_near_duplicates(
                    batch, sigs,
                    corpus_buckets=spark.table("probe_bands"),
                    jaccard_threshold=0.5,
                )[0].count()
            )
            print(f"store x{copies}: incremental (bucketed store) {t}s "
                  f"({n} pairs)", flush=True)
            t, n = timed(
                lambda: incremental_near_duplicates(
                    batch, sigs,
                    corpus_buckets=spark.read.parquet(plain_path),
                    jaccard_threshold=0.5,
                )[0].count()
            )
            print(f"store x{copies}: incremental (plain store table) {t}s "
                  f"({n} pairs)", flush=True)
            spark.sql("DROP TABLE IF EXISTS probe_bands")


def main():
    spark = get_spark("scale-probe-r7c")
    spark.sparkContext.setLogLevel("ERROR")

    for name, sf in (("sf0.01", SF_SMALL), ("sf0.1", SF_BIG)):
        t, n = probe_zonal(spark, sf)
        print(f"{name}: zonal chain {t}s ({n} rows)", flush=True)

    probe_incremental(spark)
    spark.stop()


if __name__ == "__main__":
    main()
