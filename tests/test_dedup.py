"""Dedup-stack tests with planted duplicates/near-duplicates."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_pipelines_spark.operators.dedup import (
    exact_duplicates,
    hamming_distance,
    minhash_near_duplicates,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash_signatures,
)

BASE = (
    "the quick brown fox jumps over the lazy dog while the cat watches "
    "from the warm windowsill and the rain taps gently on the glass"
)
NEAR = BASE.replace("gently", "softly")  # one-word edit → near-dup
FAR = (
    "completely different content about distributed query engines and "
    "columnar shuffle services running on large compute clusters"
)


def _docs(spark):
    return spark.createDataFrame(
        [(0, BASE), (1, NEAR), (2, FAR), (3, BASE)],
        "doc_id long, text string",
    )


def test_exact_duplicates(spark):
    out = {r["keeper_id"]: r["dup_cnt"] for r in exact_duplicates(_docs(spark)).collect()}
    assert out[0] == 2      # docs 0 and 3 identical
    assert out[1] == 1 and out[2] == 1


def test_minhash_signature_identical_docs_equal(spark):
    sigs = {r["doc_id"]: r["minhash"] for r in minhash_signatures(_docs(spark)).collect()}
    assert sigs[0] == sigs[3]
    assert sigs[0] != sigs[2]


def test_minhash_finds_planted_near_dup(spark):
    pairs = {
        (r["doc_a"], r["doc_b"]): r["est_jaccard"]
        for r in minhash_near_duplicates(_docs(spark), jaccard_threshold=0.5).collect()
    }
    assert (0, 3) in pairs and pairs[(0, 3)] == 1.0
    assert (0, 1) in pairs and pairs[(0, 1)] >= 0.5
    assert (0, 2) not in pairs and (1, 2) not in pairs


def test_ngram_jaccard_exact_verification(spark):
    pairs = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(_docs(spark), threshold=0.5).collect()
    }
    assert pairs[(0, 3)] == 1.0
    assert 0.5 <= pairs[(0, 1)] < 1.0


def test_simhash_hamming_orders_similarity(spark):
    sigs = simhash_signatures(_docs(spark))
    a = sigs.alias("a")
    b = sigs.alias("b")
    d = (
        a.crossJoin(b)
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("da"),
            F.col("b.doc_id").alias("db"),
            hamming_distance(F.col("a.simhash"), F.col("b.simhash")).alias("ham"),
        )
        .collect()
    )
    ham = {(r["da"], r["db"]): r["ham"] for r in d}
    assert ham[(0, 3)] == 0                 # identical docs
    assert ham[(0, 1)] < ham[(0, 2)]        # near-dup closer than far doc
    assert ham[(0, 1)] < 16


def test_duplicate_clusters_and_survivors(spark):
    """Transitive closure: a~b, b~c ⇒ {a,b,c} one cluster with min-id
    keeper; isolated docs are their own singleton clusters."""
    from data_pipelines_spark.operators.dedup import (
        dedup_survivors,
        duplicate_clusters,
    )

    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(6)], "doc_id long, text string"
    )
    pairs = spark.createDataFrame(
        [(1, 3), (3, 5), (0, 4)], "doc_a long, doc_b long"
    )
    clusters = duplicate_clusters(docs, pairs)
    got = {r["doc_id"]: r["cluster_id"] for r in clusters.collect()}
    assert got == {0: 0, 1: 1, 2: 2, 3: 1, 4: 0, 5: 1}
    survivors = sorted(r["doc_id"] for r in dedup_survivors(docs, clusters).collect())
    assert survivors == [0, 1, 2]


def test_full_dedup_pipeline_end_to_end(spark):
    """minhash pairs → clusters → survivors over planted duplicates."""
    from data_pipelines_spark.operators.dedup import (
        dedup_survivors,
        duplicate_clusters,
        minhash_near_duplicates,
    )

    docs = _docs(spark)  # 0 == 3 exact, 1 near-dup of both, 2 distinct
    pairs = minhash_near_duplicates(docs, jaccard_threshold=0.5)
    clusters = duplicate_clusters(docs, pairs)
    survivors = sorted(r["doc_id"] for r in dedup_survivors(docs, clusters).collect())
    assert survivors == [0, 2]  # 1 and 3 collapse into cluster 0
