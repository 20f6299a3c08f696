"""Round-7 scale probes for the round-5 additions (VERDICT task #7).

Measures wall time at sf0.01 vs sf0.1 (10x rows) and, for the
data-dependent operators, at a synthetic ~5x replication of sf0.1
("sf~0.5": ids shifted per replica so dedup structure repeats rather
than degenerates). The pass bar: growth within ~2x of linear per 10x
data (i.e. sub-quadratic with honest headroom). Results are recorded
in NOTES_r7.md.

Usage: python examples/scale_probe_r7.py
"""

from __future__ import annotations

import time

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


def replicate_docs(spark, sf_dir, copies):
    docs = load_table(spark, sf_dir, "documents")
    reps = [
        docs.select(
            (F.col("doc_id") + F.lit(i * 10_000_000)).alias("doc_id"),
            "text", "source",
        )
        for i in range(copies)
    ]
    out = reps[0]
    for r in reps[1:]:
        out = out.unionByName(r)
    return out.repartition(32).localCheckpoint(eager=True)


def replicate_embeddings(spark, sf_dir, copies):
    emb = load_table(spark, sf_dir, "embeddings")
    reps = [
        emb.select(
            (F.col("vec_id") + F.lit(i * 10_000_000)).alias("vec_id"),
            "embedding",
        )
        for i in range(copies)
    ]
    out = reps[0]
    for r in reps[1:]:
        out = out.unionByName(r)
    return out.repartition(32).localCheckpoint(eager=True)


def main():
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    results = []

    # warm the JVM/codegen/scan paths so the first measured label does
    # not absorb session start-up cost
    load_table(spark, SF_SMALL, "documents").count()
    load_table(spark, SF_SMALL, "embeddings").count()

    # ---- knn_join_ivf ----
    from data_pipelines_spark.operators.similarity import (
        kmeans_centroids,
        knn_join_ivf,
    )

    def ivf_on(emb):
        cents = kmeans_centroids(emb, k=8, max_iterations=5)
        return knn_join_ivf(
            emb.where(F.col("vec_id") % 100 < 5), emb, cents, k=10
        ).count()

    for label, emb in (
        ("sf0.01", load_table(spark, SF_SMALL, "embeddings")),
        ("sf0.1", load_table(spark, SF_BIG, "embeddings")),
        ("sf0.1x5", replicate_embeddings(spark, SF_BIG, 5)),
    ):
        t, n = timed(lambda: ivf_on(emb))
        results.append(("knn_join_ivf", label, t, n))

    # ---- interval_overlap_join (events sessions x maintenance windows) ----
    from data_pipelines_spark.operators.joins import interval_overlap_join
    from data_pipelines_spark.sources.tables import load_events

    def overlap_on(sf_dir):
        ev = load_events(spark, sf_dir)
        s = ev.select(
            "user_id",
            F.unix_micros("ts").alias("s"),
            (F.unix_micros("ts") + 600_000_000).alias("e"),
        ).withColumn("lid", F.monotonically_increasing_id())
        lo, hi = ev.agg(
            F.min(F.unix_micros("ts")), F.max(F.unix_micros("ts"))
        ).first()
        windows = spark.range(200).select(
            F.col("id").alias("rid"),
            (F.lit(lo) + F.col("id") * ((hi - lo) // 200)).alias("rs"),
            (F.lit(lo) + (F.col("id") + 1) * ((hi - lo) // 200)).alias("re"),
        )
        return interval_overlap_join(
            s, windows, ("s", "e"), ("rs", "re"),
            bin_width=3_600_000_000, left_id_col="lid",
        ).count()

    for label, sf in (("sf0.01", SF_SMALL), ("sf0.1", SF_BIG)):
        t, n = timed(lambda: overlap_on(sf))
        results.append(("interval_overlap_join", label, t, n))

    # ---- sample_token_budget ----
    from data_pipelines_spark.functions.text import token_count
    from data_pipelines_spark.operators.corpus import sample_token_budget

    def budget_on(docs):
        d = docs.withColumn("n_tokens", token_count(F.col("text")))
        return sample_token_budget(
            d, 50_000, group_col="source"
        ).count()

    for label, docs in (
        ("sf0.01", load_table(spark, SF_SMALL, "documents")),
        ("sf0.1", load_table(spark, SF_BIG, "documents")),
        ("sf0.1x5", replicate_docs(spark, SF_BIG, 5)),
    ):
        t, n = timed(lambda: budget_on(docs))
        results.append(("sample_token_budget", label, t, n))

    # ---- weighted histogram store (sketch + quantiles-from-store) ----
    from data_pipelines_spark.operators.sketches import (
        histogram_quantiles,
        histogram_sketch,
    )

    def whist_on(docs):
        d = docs.select(
            "source",
            F.length("text").cast("double").alias("len"),
            (F.length("text") / 4).cast("long").alias("w"),
        )
        sk = histogram_sketch(d, ["source"], "len", 0.0, 4096.0, 64, weight_col="w")
        return histogram_quantiles(sk, ["source"], [0.5, 0.9], 0.0, 4096.0, 64).count()

    for label, docs in (
        ("sf0.01", load_table(spark, SF_SMALL, "documents")),
        ("sf0.1", load_table(spark, SF_BIG, "documents")),
        ("sf0.1x5", replicate_docs(spark, SF_BIG, 5)),
    ):
        t, n = timed(lambda: whist_on(docs))
        results.append(("weighted_histogram", label, t, n))

    # ---- span-level dedup (stats + removal) ----
    from data_pipelines_spark.operators.dedup import duplicate_span_stats

    def span_on(docs):
        # .first() on the 1-row aggregate: a bare .count() would let
        # column pruning collapse the whole span computation
        return int(
            duplicate_span_stats(docs, hash_grams=True)
            .agg(F.sum("n_dup_grams")).first()[0]
        )

    for label, docs in (
        ("sf0.01", load_table(spark, SF_SMALL, "documents")),
        ("sf0.1", load_table(spark, SF_BIG, "documents")),
        ("sf0.1x5", replicate_docs(spark, SF_BIG, 5)),
    ):
        t, n = timed(lambda: span_on(docs))
        results.append(("duplicate_span_stats", label, t, n))

    print("\nPROBE RESULTS")
    for op, label, t, n in results:
        print(f"{op:24s} {label:8s} {t:8.3f}s rows={n}")


if __name__ == "__main__":
    main()
