#!/usr/bin/env python
"""Worked example: an end-to-end training-data curation pipeline.

The complete corpus story this engine provides, stage by stage, on a
tiny synthetic JSONL crawl — every stage is the 100 TB shape (broadcast
dimension joins, hash-coin filters, banded LSH, two-phase running
sums), just exercised small:

    ingest JSONL  →  URL blocklist + per-domain cap  →  Gopher quality
    gate  →  exact dedup  →  MinHash near-dup dedup (exact-verified)  →
    benchmark decontamination (Bloom-prefiltered)  →  stratified mixing
    →  unigram-LM scoring  →  per-source quantile quality floor  →
    per-source token budget  →  sequence packing  →  curated JSONL +
    packing manifest; then day-2 incremental ingest against the
    signature store, store compaction, and a PSI drift gate from
    histogram sketches

    python examples/corpus_pipeline.py
"""

from __future__ import annotations

import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_pipelines_spark.functions.text import passes_gopher_rules
from data_pipelines_spark.functions.web import (
    domain_cap_sample,
    filter_blocked_domains,
)
from data_pipelines_spark.operators.corpus import (
    contamination_check,
    filter_by_group_quantile,
    pack_sequences,
    stratified_sample,
    unigram_logprob,
)
from data_pipelines_spark.operators.dedup import (
    exact_duplicates,
    minhash_near_duplicates,
)
from data_pipelines_spark.sources import corpus_io


def curate(
    spark: SparkSession,
    raw: DataFrame,
    benchmark: DataFrame,
    blocklist: DataFrame,
    seq_len: int = 128,
) -> tuple[DataFrame, DataFrame]:
    """Run the full curation dataflow; returns (curated docs with
    quality/packing columns, near-dup pair audit trail)."""
    # 1. URL gates — cheapest first, fused into the scan.
    docs = filter_blocked_domains(raw, blocklist)
    docs = domain_cap_sample(docs, max_frac_per_domain=0.9)

    # 2. Rule-based quality gate (Gopher A1). Tiny docs in this demo, so
    #    relax the word-count floor; production keeps the defaults.
    docs = docs.where(passes_gopher_rules(F.col("text"), min_words=5,
                                          min_stopword_hits=0))

    # Stage-boundary plan truncation (guide §3.3): most stages below
    # JOIN a derived frame back onto `docs`, so every reference
    # duplicates the upstream subtree and the LOGICAL plan grows
    # exponentially with stage count — by the packing stage every new
    # action re-ANALYZES a tree with thousands of copies of the ingest
    # scan (measured: the 23-doc e2e test spent ~4 min, almost all of
    # it Catalyst re-analysis; a persist() alone does NOT help because
    # cache substitution happens after analysis). localCheckpoint
    # materializes the stage output and replaces the plan with a leaf;
    # the lost lineage fault-tolerance is irrelevant for a checkpointed
    # pipeline stage, exactly the guide's trade.
    docs = docs.localCheckpoint()

    # 3. Exact dedup: min-id representative per content hash.
    keepers = exact_duplicates(docs).select(F.col("keeper_id").alias("doc_id"))
    docs = docs.join(keepers, "doc_id", "left_semi")

    # 4. Near-dup dedup: banded MinHash-LSH candidates; drop the larger
    #    id of every confirmed pair (min-id representative policy).
    pairs = minhash_near_duplicates(docs, shingle_k=3,
                                    jaccard_threshold=0.6).persist()
    docs = docs.join(pairs.select(F.col("doc_b").alias("doc_id")).distinct(),
                     "doc_id", "left_anti")

    # 5. Decontamination: no benchmark 8-gram may survive into training.
    #    Bloom mode is the shape for benchmark suites too large to
    #    broadcast exactly; results are identical to the exact join.
    flagged = contamination_check(docs, benchmark, ngram_n=8,
                                  prefilter="bloom", bench_ngrams=1_000)
    docs = docs.join(flagged, "doc_id", "left_anti").localCheckpoint()

    # 6. Data mixing: deterministic per-source rates.
    docs = stratified_sample(docs, {"books": 1.0, "crawl": 0.5},
                             default_rate=0.2)

    # 7. Quality score + token counts from the corpus's own unigram LM.
    lm = unigram_logprob(docs)
    docs = docs.join(lm, "doc_id", "left").withColumn(
        "n_tokens", F.coalesce(F.col("n_tokens"), F.lit(0))
    )

    # 7b. The CCNet-shaped version of the same filter: interpolated
    #     Kneser-Ney BIGRAM perplexity, model trained in-engine on the
    #     surviving corpus. High perplexity = unusual token sequences
    #     (not just unusual tokens) = gibberish candidate.
    from data_pipelines_spark.operators.corpus import (
        kneser_ney_bigram_logprob,
    )

    kn = kneser_ney_bigram_logprob(docs)
    docs = docs.join(
        kn.select("doc_id", "kn_logprob10", "kn_ppl10"), "doc_id", "left"
    )

    # 8. Per-source quality floor: drop each source's worst-scoring
    #    decile (approx-percentile cutoff, groups-sized join back).
    docs = filter_by_group_quantile(docs, "lm_logprob10", ["source"],
                                    q=0.1, keep="above").localCheckpoint()

    # 9. Train a BPE tokenizer ON the curated corpus (distributed
    #    word histogram → bounded merge loop) and re-tokenize every
    #    survivor with it — n_tokens becomes the REAL subword count,
    #    BEFORE any token-denominated budgeting consumes it.
    from data_pipelines_spark.operators.tokenizer import (
        bpe_encode,
        train_bpe,
    )

    merges = train_bpe(docs, num_merges=64)
    docs = bpe_encode(docs, merges).drop("n_tokens").withColumnRenamed(
        "bpe_tokens_n", "n_tokens"
    )
    print(f"BPE: {len(merges)} merges; first five "
          f"{[''.join(m) for m in merges[:5]]}")

    # 9b. Token budget: cap each source's contribution ("take N
    #     SUBWORD tokens per source") as a deterministic coin-order
    #     prefix — the budget-constrained mixing knob beside the
    #     rate-based one, now denominated in the tokenizer's units.
    from data_pipelines_spark.operators.corpus import sample_token_budget

    docs = sample_token_budget(docs, 2_000, group_col="source",
                               include_overflow=True)

    # 10. Pack the survivors into fixed-length training sequences.
    packed = pack_sequences(docs, seq_len)
    return packed, pairs


def main() -> None:
    from data_pipelines_spark.session import get_spark

    spark = get_spark(app_name="corpus-pipeline-demo", master="local[4]")
    spark.sparkContext.setLogLevel("ERROR")

    with tempfile.TemporaryDirectory() as d:
        src = os.path.join(d, "crawl")
        os.makedirs(src)
        import random

        rng = random.Random(7)
        vocab = [f"term{k}" for k in range(400)]
        rows = []
        for i in range(40):
            body = " ".join(rng.choice(vocab) for _ in range(40))
            src_name = "crawl" if i % 2 else "books"
            rows.append({
                "text": f"the article {i} is about {body} and more of that",
                "source": src_name,
                "url": f"https://site{i % 5}.example.com/{src_name}/page{i}",
            })
        # a near-duplicate mirror (one word changed) and a blocked domain
        rows.append(rows[0] | {
            "text": rows[0]["text"].replace("more", "extra"),
            "url": "https://mirror.example.net/crawl/copy",
        })
        rows.append({"text": "spam spam spam", "source": "crawl",
                     "url": "https://blocked.bad/crawl/x"})

        # --- Stage 0, the crawl boundary: the corpus arrives as WARC
        # files of HTML responses (the Common Crawl shape), not as
        # clean JSONL. Everything downstream derives from the archive:
        # text via the native extraction chain, source from the URL
        # path, language guessed from the text.
        from data_pipelines_spark.functions.text import lang_guess
        from data_pipelines_spark.functions.web import html_to_text
        from data_pipelines_spark.sources.warc import (
            encode_http_response,
            encode_warc_record,
            read_warc,
            write_warc,
        )

        shards = {0: [], 1: []}
        for i, r in enumerate(rows):
            html = f"<html><body><p>{r['text']}</p></body></html>"
            shards[i % 2].append(encode_warc_record(
                "response",
                encode_http_response(html.encode()),
                record_id=f"resp-{i}",
                target_uri=r["url"],
                content_type="application/http; msgtype=response",
            ))
        warc_paths = []
        for s, recs in shards.items():
            p = os.path.join(src, f"crawl-{s:02d}.warc.gz")
            write_warc(p, recs)
            warc_paths.append(p)

        pages = read_warc(spark, warc_paths).where(F.col("http_status") == 200)
        raw = pages.select(
            F.regexp_extract("record_id", r"(\d+)$", 1).cast("long")
            .alias("doc_id"),
            html_to_text(F.col("text")).alias("text"),
            F.col("target_uri").alias("url"),
            F.regexp_extract("target_uri", r"://[^/]+/([a-z]+)/", 1)
            .alias("source"),
            lang_guess(html_to_text(F.col("text"))).alias("lang"),
        )
        print(f"crawl boundary: {len(warc_paths)} WARC files -> "
              f"{raw.count()} extracted pages")
        benchmark = spark.createDataFrame(
            [(0, "held out eval question that must not leak " * 3)],
            "qid long, text string",
        )
        blocklist = spark.createDataFrame([("blocked.bad",)], "domain string")

        curated, pairs = curate(spark, raw, benchmark, blocklist)
        # D1 discipline: the curated frame feeds several actions below
        # (write, counts, the signature store, the drift baseline) —
        # persist it once instead of re-running the whole curation DAG
        # per consumer.
        curated = curated.persist()
        out = os.path.join(d, "curated")
        corpus_io.write_jsonl(
            curated.select("doc_id", "text", "source", "n_tokens",
                           "lm_logprob10", "seq_id", "seq_off"),
            out, compression=None, partitions=1,
        )
        n = curated.count()
        n_seq = curated.agg(F.max("seq_id")).first()[0]
        print(f"curated {n} docs into ~{(n_seq or 0) + 1} sequences per stream; "
              f"near-dup pairs dropped: {pairs.count()}")

        # WET export: the curated text goes back out in the crawl
        # interchange format (sharded conversion records, one writer
        # task per shard, deterministic bytes).
        from data_pipelines_spark.sources.warc import write_warc_shards

        wet_dir = os.path.join(d, "wet")
        os.makedirs(wet_dir)
        wet_man = write_warc_shards(
            curated.select("doc_id", "text", "url"), wet_dir, 2,
            uri_col="url",
        ).collect()
        print("WET export: " + ", ".join(
            f"shard {m['shard']}: {m['n_records']} recs "
            f"{m['n_bytes']}B md5={m['content_md5'][:8]}"
            for m in sorted(wet_man, key=lambda m: m["shard"])))
        curated.orderBy("source", "doc_id").show(8)

        # --- Targeted data selection (DSIR): score every curated doc
        # by how target-like its hashed n-gram features are (here the
        # "target domain" is the docs mentioning the rarest source's
        # vocabulary), then Gumbel-resample a fixed-size selection
        # proportional to exp(weight) — deterministic end to end.
        from data_pipelines_spark.operators.corpus import (
            dsir_importance_weights,
            importance_resample,
        )

        target = curated.orderBy("doc_id").limit(8)
        weights = dsir_importance_weights(
            curated, target, num_buckets=1024
        )
        picked = importance_resample(weights, "dsir_logweight", k=5)
        print(
            "DSIR selection: "
            f"{picked.count()} of {weights.count()} docs kept "
            "(top gumbel keys "
            f"{[round(r['gumbel_key'], 2) for r in picked.collect()][:3]}...)"
        )

        # --- Retrieval prep: chunk the curated docs into overlapping
        # token windows (narrow map), embed every chunk (batched
        # inference — model constructed once per partition; the
        # encoder here is the deterministic stub, a real model plugs
        # into the same factory), and QA the ANN configuration with
        # recall@k against the exact baseline BEFORE shipping the
        # index — the go/no-go metric for probe settings.
        from data_pipelines_spark.operators.corpus import chunk_documents
        from data_pipelines_spark.operators.inference import embed_texts
        from data_pipelines_spark.operators.similarity import (
            exact_knn_join,
            knn_join,
            recall_at_k,
        )

        # chunk ids must stay collision-free under ANSI: doc ids here
        # are full-range hashed longs, so arithmetic composition would
        # overflow — hash the (doc, chunk) pair instead.
        chunks = chunk_documents(
            curated, chunk_tokens=16, overlap_tokens=4
        ).select(
            F.xxhash64("doc_id", "chunk_id").alias("cid"),
            "chunk_text",
        )
        emb = embed_texts(
            chunks, dim=16, text_col="chunk_text", id_col="cid"
        ).persist()
        probe = emb.where(F.col("cid") % 5 == 0)
        approx = knn_join(
            probe, emb, k=3, dim=16, num_planes=2,
            left_id_col="cid", right_id_col="cid",
            left_vec_col="embedding", right_vec_col="embedding",
        )
        exact = exact_knn_join(
            probe, emb, k=3, left_id_col="cid", right_id_col="cid",
        )
        rec = recall_at_k(approx, exact, "left_cid", "right_cid")
        mean_recall = rec.agg(F.avg("recall")).first()[0]
        print(f"retrieval index: {emb.count()} chunk embeddings; "
              f"LSH recall@3 over {rec.count()} probe queries: "
              f"{mean_recall:.3f}")

        # Topic-label the embedding space: k-means clusters over the
        # chunk embeddings, each cluster described by its BERTopic
        # c-TF-IDF top terms — the human-readable map of what the
        # index contains.
        from data_pipelines_spark.operators.corpus import cluster_top_terms
        from data_pipelines_spark.operators.similarity import (
            ivf_assign,
            kmeans_centroids,
        )

        cents = kmeans_centroids(
            emb, k=3, max_iterations=4, id_col="cid"
        )
        assigned = ivf_assign(emb, cents).select(
            F.col("cid").alias("doc_id"), "cluster"
        )
        topics = cluster_top_terms(
            chunks.withColumnRenamed("cid", "doc_id"),
            assigned,
            text_col="chunk_text",
            top_n=3,
        )
        shown = topics.orderBy("cluster", "rank").collect()
        by_c = {}
        for r in shown:
            by_c.setdefault(r["cluster"], []).append(r["term"])
        for c, terms in sorted(by_c.items()):
            print(f"  topic {c}: {' / '.join(terms)}")

        # --- Day 2: incremental ingest. The curated corpus's MinHash
        # signatures persist as the dedup store; a new batch is checked
        # against ALL prior history without re-hashing it (join work
        # scales with the batch, not the corpus), then its surviving
        # signatures append to the store. streaming/dedup.py wraps this
        # same loop as a foreachBatch sink for a continuous feed.
        from data_pipelines_spark.operators.dedup import (
            incremental_near_duplicates,
            minhash_signatures,
        )

        store = os.path.join(d, "sig_store")
        minhash_signatures(curated, shingle_k=3).write.parquet(store)
        batch = spark.createDataFrame(
            [
                (1000, rows[0]["text"].replace("that", "this"), "crawl"),
                (1001, "genuinely novel day-two content about glaciers "
                       "and meadows and shepherds", "crawl"),
            ],
            "doc_id long, text string, source string",
        )
        inc_pairs, new_sigs = incremental_near_duplicates(
            batch, spark.read.parquet(store), shingle_k=3,
            jaccard_threshold=0.6,
        )
        dupes = inc_pairs.select(F.col("doc_a").alias("doc_id")).distinct()
        fresh = batch.join(dupes, "doc_id", "left_anti")
        new_sigs.join(fresh, "doc_id", "left_semi").write.mode("append").parquet(store)
        print(f"day-2 batch: {batch.count()} docs, "
              f"{dupes.count()} near-dup of stored history, "
              f"{fresh.count()} ingested")

        # --- Monitoring (BEFORE compaction: `fresh`'s lazy lineage
        # reads the signature store, and compaction rewrites those
        # files — the read-after-overwrite hazard compact_dataset's
        # docstring warns about): histogram-sketch the curated
        # corpus's token
        # distribution once (a few hundred longs), then gate each new
        # batch with a PSI drift report against it — no rescan of the
        # history, ever. streaming/sketches.py maintains the same store
        # incrementally from a stream.
        from data_pipelines_spark.operators.sketches import (
            histogram_drift,
            histogram_sketch,
        )

        lo, hi, n_bins = 0.0, 256.0, 32
        base_sk = histogram_sketch(
            curated.withColumn("day", F.lit("day1")),
            ["day"], "n_tokens", lo, hi, n_bins,
        )
        batch_sk = histogram_sketch(
            fresh.withColumn(
                "n_tokens", F.size(F.split(F.col("text"), r"\s+"))
            ).withColumn("day", F.lit("day2")),
            ["day"], "n_tokens", lo, hi, n_bins,
        )
        psi = histogram_drift(
            base_sk.drop("day"), batch_sk.drop("day"), [], n_bins
        ).first()
        print(f"day-2 token-length drift: PSI={psi['psi']} "
              f"(baseline n={psi['n_baseline']}, batch n={psi['n_current']};"
              " <0.1 stable, >0.25 shifted)")
        # --- Maintenance: every append accretes files; a periodic
        # compaction pass rewrites only fragmented directories (healthy
        # ones keep their files byte-identical), keeping the store's
        # scan cost flat as days accumulate.
        from data_pipelines_spark.sources.materialize import compact_dataset

        report = compact_dataset(spark, store, min_files=2)
        print(f"signature store compacted: {report['files_before']} -> "
              f"{report['files_after']} files "
              f"({report['dirs_compacted']} dirs)")

    spark.stop()


if __name__ == "__main__":
    main()
