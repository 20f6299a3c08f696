"""Partitioning-invariance audit: the entries whose plans involve
two-phase ranking, windowing, sampling, packing, sketching, or salting
must produce bit-identical (oracle-matching) results under a pathological
shuffle-partition count. A leak of `spark_partition_id`-style state into
results would pass the default-config parity run and fail here.

Uses a sibling SparkSession (`newSession()` — own SQLConf, shared
context) pinned to 7 shuffle partitions; `session.tune()` only replaces
the stock 200, so the override survives into the queries.
"""

from __future__ import annotations

import pytest

from tests.test_oracle_parity import SF_DIR, _ORACLES, _QUERIES, _canon, _duck

# Entries where partitioning could plausibly leak: global/two-phase
# ranks, per-group windows, seeded sampling + shuffling + packing,
# LSH/sketch pipelines, connected components, distinct-sketch aggs.
_SENSITIVE = [
    "vocabulary_stats",
    "corpus_split_shuffle",
    "corpus_doc_curation",
    "ranking_windows_suite",
    "argmax_per_group",
    "dedup_clusters",
    "minhash_near_dup_pairs",
    "global_agg_distinct",
    "event_window_frames",
    # hot/cold split join (idle branch): union of a broadcast and a
    # shuffle anti join must not depend on partition counts
    "subquery_pivot_suite",
    # round-5 fusions: duplicated-span islands (per-doc window over a
    # gram-shuffled semi join) + BM25 (single-row stats broadcast)
    "text_stats",
    # round-7 additions: batch-vs-corpus LSH (bucket join + OPH
    # estimate + exact verify), streamed sketch stores merged across
    # whatever batch split availableNow picked, and the evolving
    # MERGE + compaction lifecycle (range of writers under 7 shuffle
    # partitions)
    "incremental_near_dup",
    "stream_sink_readback",
    "upsert_readback",
    # round-7 session 3: the recall tier's exact top-k is a map-side
    # collect_list/array_sort aggregation (partial-agg order must not
    # leak), and the zonal suite's first-cell argmin + dense fill are
    # min_by/key-universe shapes
    "embedding_lsh_topk",
    "zonal_treeloss_suite",
    # round-7 session 4: the raster entry seeds its grid from a
    # partial-agg collect (per-bucket sums) and aggregates dyadic
    # doubles — both must be layout-independent
    "raster_roundtrip",
]


@pytest.fixture(scope="module")
def spark7(spark):
    s = spark.newSession()
    s.conf.set("spark.sql.shuffle.partitions", "7")
    return s


@pytest.mark.parametrize("name", _SENSITIVE)
def test_oracle_parity_under_7_shuffle_partitions(spark7, name):
    sdf = _QUERIES[name](spark7, SF_DIR)
    assert spark7.conf.get("spark.sql.shuffle.partitions") == "7"
    spark_rows = [tuple(r) for r in sdf.collect()]
    con = _duck(SF_DIR)
    res = con.execute(_ORACLES[name])
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()
    assert len(spark_rows) == len(duck_rows), name
    assert _canon(spark_rows, sdf.columns) == _canon(duck_rows, duck_cols), name
