"""Round-7 (session 2) scale probes for the new operators:

- chunk_documents: narrow map — must scale linearly with corpus bytes.
- knn_classify (exact back-end): corpus-of-queries x fixed seed — must
  scale linearly in queries with the seed broadcast (shuffle is one
  k-sized row per query).
- doc_profile's multimodal tier (image construct/decode/resize + WAV
  decode): mapInPandas over doc-derived payloads — linear per doc.

Same protocol as scale_probe_r7.py: wall time at sf0.01 vs sf0.1
(10x docs) and a 5x replication of sf0.1; bar = within ~2x of linear.

Usage: python examples/scale_probe_r7b.py
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
            "text", "source", "lang",
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
            "embedding", "label",
        )
        for i in range(copies)
    ]
    out = reps[0]
    for r in reps[1:]:
        out = out.unionByName(r)
    return out.repartition(32).localCheckpoint(eager=True)


def probe_chunk(spark, docs):
    from data_pipelines_spark.operators.corpus import chunk_documents

    return timed(lambda: chunk_documents(docs, 64, 16).count())


def probe_knn_classify(spark, queries, labeled):
    from data_pipelines_spark.operators.similarity import knn_classify

    return timed(lambda: knn_classify(queries, labeled, k=5).count())


def probe_multimodal(spark, docs):
    from data_pipelines_spark.operators.multimodal import (
        audio_features, image_stats, resize_images,
    )

    w = (F.lit(8) + F.col("doc_id") % 5).cast("int")
    h = (F.lit(6) + F.col("doc_id") % 4).cast("int")
    pix = F.repeat(F.md5(F.encode(F.col("text"), "UTF-8")), 4).substr(
        F.lit(1), w * h
    )
    media = docs.select(
        F.col("doc_id").alias("media_id"),
        F.encode(
            F.concat(F.lit("P5\n"), w.cast("string"), F.lit(" "),
                     h.cast("string"), F.lit("\n255\n"), pix),
            "UTF-8",
        ).alias("content"),
    )
    wav_header = (
        "52494646" "64000000" "57415645" "666d7420" "10000000"
        "0100" "0100" "401f0000" "803e0000" "0200" "1000"
        "64617461" "40000000"
    )
    wav = docs.select(
        F.col("doc_id").alias("media_id"),
        F.to_binary(
            F.concat(F.lit(wav_header),
                     F.repeat(F.md5(F.encode(F.col("text"), "UTF-8")), 4)),
            F.lit("hex"),
        ).alias("content"),
    )

    def run():
        a = image_stats(resize_images(media, 4, 3)).count()
        a += audio_features(wav).count()
        return a

    return timed(run)


def main():
    spark = get_spark("scale-probe-r7b")
    spark.sparkContext.setLogLevel("ERROR")

    for name, sf in (("sf0.01", SF_SMALL), ("sf0.1", SF_BIG)):
        docs = load_table(spark, sf, "documents")
        emb = load_table(spark, sf, "embeddings")
        seed = emb.where(F.col("vec_id") < 200)   # fixed-size labeled seed
        qs = emb.where(F.col("vec_id") >= 200)
        t1, n1 = probe_chunk(spark, docs)
        t2, n2 = probe_knn_classify(spark, qs, seed)
        t3, n3 = probe_multimodal(spark, docs)
        print(f"{name}: chunk {t1}s ({n1} rows) | knn_classify {t2}s "
              f"({n2} rows) | multimodal {t3}s ({n3} rows)", flush=True)

    docs5 = replicate_docs(spark, SF_BIG, 5)
    emb5 = replicate_embeddings(spark, SF_BIG, 5)
    # fixed-size seed, 5x queries — the production shape (seed stays
    # dimension-sized while the corpus grows).
    seed1 = emb5.where(F.col("vec_id") < 200)
    qs = emb5.where(F.col("vec_id") % 10_000_000 >= 200)
    t1, n1 = probe_chunk(spark, docs5)
    t2, n2 = probe_knn_classify(spark, qs, seed1)
    t3, n3 = probe_multimodal(spark, docs5)
    print(f"sf0.1x5: chunk {t1}s ({n1} rows) | knn_classify {t2}s "
          f"({n2} rows) | multimodal {t3}s ({n3} rows)", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
