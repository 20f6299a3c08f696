"""Robustness: every query family must run (not crash) on zero-row
inputs — empty partitions are routine at 100 TB (a tile with no data,
a day with no events)."""

from __future__ import annotations

import shutil
import tempfile

import pytest

import __spark_entry__ as entry_mod
from data_pipelines_spark.sources.tables import (
    DRIVER_TABLES,
    load_events,
    load_table,
)

# One representative per family; global aggregates return a single row
# (count=0 / NULL mins) rather than zero rows.
EMPTY_OK = [
    "flood_detailed_forecast",
    "flood_summary_forecast",
    "roi_restrict_projection",
    "argmax_per_group",
    "dense_group_count",
    "semi_join_filter",
    "asof_join_purchases",
    "spatial_join_zones",
    "events_windowed_agg",
    "events_resample_fill",
    "session_windows_suite",
    "event_window_frames",   # interval-join fusion: empty both sides
    "corpus_doc_curation",   # bloom prefilter over an empty benchmark
    "exact_dedup_docs",
    "minhash_near_dup_pairs",
    "dedup_clusters",
    "embedding_cosine_topk",
    "embedding_lsh_topk",     # k-NN join: empty both sides
    "corpus_split_shuffle",   # token-budget flag over an empty corpus
    "text_stats",
    "q1_pricing_summary",
    "rollup_region_nation",
    "subquery_pivot_suite",   # skew-split anti join: empty hot count job
    "quality_report",
    "upsert_readback",
]


def test_incremental_near_duplicates_empty_sides(spark):
    """Both degenerate shapes: an empty batch against a real store, and
    a real batch against an empty store."""
    from data_pipelines_spark.operators.dedup import (
        incremental_near_duplicates,
        minhash_signatures,
    )

    docs = spark.createDataFrame(
        [(1, "some reasonably long text for shingling here")],
        "doc_id long, text string",
    )
    store = minhash_signatures(docs)
    p1, s1 = incremental_near_duplicates(docs.limit(0), store)
    assert p1.count() == 0 and s1.count() == 0
    p2, s2 = incremental_near_duplicates(docs, store.limit(0))
    assert p2.count() == 0 and s2.count() == 1


@pytest.fixture(scope="module")
def empty_sf_dir(spark):
    tmp = tempfile.mkdtemp(prefix="dps_empty_")
    for t in DRIVER_TABLES:
        if t == "events":  # nanos timestamps need the normalizing loader
            df = load_events(spark, "/root/testdata/sf0.001")
        else:
            df = load_table(spark, "/root/testdata/sf0.001", t)
        df.limit(0).write.parquet(f"{tmp}/{t}.parquet")
    yield tmp
    shutil.rmtree(tmp, ignore_errors=True)


@pytest.mark.parametrize("name", EMPTY_OK)
def test_query_survives_empty_tables(spark, empty_sf_dir, name):
    df = entry_mod.queries()[name](spark, empty_sf_dir)
    n = df.count()
    assert n >= 0  # executed without error; empties stay empty,
    # global aggregates may legitimately emit their single NULL/0 row


def test_recall_at_k_empty_sides(spark):
    from data_pipelines_spark.operators.similarity import recall_at_k

    empty = spark.createDataFrame([], "left_vec_id long, right_vec_id long")
    full = spark.createDataFrame(
        [(1, 10), (1, 11)], "left_vec_id long, right_vec_id long"
    )
    # empty exact baseline -> no queries to score
    assert recall_at_k(full, empty).count() == 0
    # empty ANN result -> every query scores 0.0, none vanish
    rows = recall_at_k(empty, full).collect()
    assert [(r.left_vec_id, r.n_hit, r.recall) for r in rows] == [(1, 0, 0.0)]


def test_batch_infer_and_embed_empty_frame(spark):
    from data_pipelines_spark.operators.inference import batch_infer, embed_texts

    empty = spark.createDataFrame([], "doc_id long, text string")
    assert embed_texts(empty, dim=8).count() == 0
    out = batch_infer(
        empty, lambda: (lambda p: []), ["text"], "o", "int", keep_cols=["doc_id"]
    )
    assert out.count() == 0 and out.columns == ["doc_id", "o"]


def test_write_bucketed_empty_frame_roundtrip(spark, tmp_path):
    from data_pipelines_spark.sources.bucketed import bucket_spec, write_bucketed

    empty = spark.createDataFrame([], "k long, v long")
    write_bucketed(empty, "bt_empty", str(tmp_path / "e"), ["k"], 4)
    try:
        assert spark.table("bt_empty").count() == 0
        assert bucket_spec(spark, "bt_empty")["num_buckets"] == 4
    finally:
        spark.sql("DROP TABLE IF EXISTS bt_empty")


def test_chunk_documents_empty_frame(spark):
    from data_pipelines_spark.operators.corpus import chunk_documents

    empty = spark.createDataFrame([], "doc_id long, text string")
    out = chunk_documents(empty, chunk_tokens=4, overlap_tokens=1)
    assert out.count() == 0
    assert out.columns == [
        "doc_id", "chunk_id", "chunk_start", "chunk_n_tokens", "chunk_text"
    ]
