"""Batched-inference plumbing: per-partition model amortization, Arrow
batch shapes, null routing, determinism, and the chunk->embed->index
composition."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_pipelines_spark.operators.inference import batch_infer, embed_texts


def test_model_constructed_once_per_partition(spark):
    """The whole point of the operator: make_model amortizes across a
    partition's batches — loads == partitions, not batches or rows."""
    sc = spark.sparkContext
    loads = sc.accumulator(0)

    def make_model():
        loads.add(1)
        return lambda pdf: [len(str(t)) for t in pdf.iloc[:, 0]]

    df = spark.range(0, 1000).select(
        F.col("id"), F.concat(F.lit("t"), F.col("id")).alias("text")
    ).repartition(4)
    out = batch_infer(
        df, make_model, ["text"], "n", "int", keep_cols=["id"]
    )
    got = {r.id: r.n for r in out.collect()}
    assert got[7] == len("t7") and len(got) == 1000
    assert loads.value == 4


def test_null_inputs_skip_the_model(spark):
    def make_model():
        def m(pdf):
            assert not pdf.iloc[:, 0].isna().all(), "model saw all-null batch"
            return [str(t).upper() for t in pdf.iloc[:, 0]]

        return m

    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "c")], "id long, text string"
    )
    out = {r.id: r.up for r in batch_infer(
        df, make_model, ["text"], "up", "string", keep_cols=["id"]
    ).collect()}
    assert out == {1: "A", 2: None, 3: "C"}


def test_batch_infer_validates_columns(spark):
    df = spark.range(3)
    with pytest.raises(ValueError, match="not in frame"):
        batch_infer(df, lambda: (lambda p: []), ["nope"], "o", "int")


def test_embed_texts_deterministic_and_unit_norm(spark):
    docs = spark.createDataFrame(
        [(1, "hello world"), (2, "hello world"), (3, "other"), (4, None)],
        "doc_id long, text string",
    )
    for parts in (1, 5):
        emb = {r.doc_id: r.embedding for r in
               embed_texts(docs.repartition(parts), dim=16).collect()}
        assert emb[1] == emb[2] != emb[3]
        assert emb[4] is None
        assert len(emb[1]) == 16
        assert abs(sum(v * v for v in emb[1]) - 1.0) < 1e-9


def test_chunk_embed_index_composition(spark):
    """chunk -> embed -> exact k-NN: duplicate chunk text retrieves
    itself at cosine 1.0 — the end-to-end retrieval-prep pipeline."""
    from data_pipelines_spark.operators.corpus import chunk_documents
    from data_pipelines_spark.operators.similarity import exact_knn_join

    docs = spark.createDataFrame(
        [(1, " ".join(f"w{i}" for i in range(20))),
         (2, " ".join(f"w{i}" for i in range(20))),  # exact dup of 1
         (3, " ".join(f"x{i}" for i in range(20)))],
        "doc_id long, text string",
    )
    chunks = chunk_documents(docs, chunk_tokens=8, overlap_tokens=0).select(
        (F.col("doc_id") * 1000 + F.col("chunk_id")).alias("cid"),
        F.col("chunk_text"),
    )
    emb = embed_texts(chunks, dim=16, text_col="chunk_text", id_col="cid")
    nn = exact_knn_join(
        emb, emb, k=1,
        left_id_col="cid", right_id_col="cid",
    )
    top = {r["left_cid"]: (r["right_cid"], r["cosine"]) for r in nn.collect()}
    # doc 2's chunks are byte-identical to doc 1's: nearest neighbor is
    # the twin chunk at cosine 1.0.
    for cid, (near, cos) in top.items():
        if cid // 1000 in (1, 2):
            assert near % 1000 == cid % 1000 and near // 1000 in (1, 2)
            assert cos == 1.0


def test_batch_infer_guards_collisions_and_empty_inputs(spark):
    df = spark.range(3).select(F.col("id"), F.lit("t").alias("text"))
    with pytest.raises(ValueError, match="non-empty"):
        batch_infer(df, lambda: (lambda p: []), [], "o", "int")
    with pytest.raises(ValueError, match="collides"):
        batch_infer(
            df, lambda: (lambda p: []), ["text"], "id", "int", keep_cols=["id"]
        )
