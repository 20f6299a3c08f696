"""Bucketed-table layout: the write-once-shuffle-once contract.

The load-bearing claims are physical-plan properties, so they are
pinned against the executed plan, not inferred: a co-bucketed
sort-merge join must show ZERO Exchange on either side, and an
equality filter on the bucket column must prune to one bucket's files.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_pipelines_spark.plans.audit import assert_plan, plan_string
from data_pipelines_spark.sources.bucketed import (
    bucket_spec,
    bucketed_scan_forced,
    cobucketed,
    write_bucketed,
)

N_BUCKETS = 8


@pytest.fixture()
def two_tables(spark, tmp_path):
    facts = spark.range(0, 2000).select(
        F.col("id").alias("k"), (F.col("id") * 3 % 97).alias("v")
    )
    dims = spark.range(0, 500).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("grp")
    )
    write_bucketed(facts, "bt_facts", str(tmp_path / "facts"), ["k"], N_BUCKETS, sort_cols=["k"])
    write_bucketed(dims, "bt_dims", str(tmp_path / "dims"), ["k"], N_BUCKETS, sort_cols=["k"])
    yield "bt_facts", "bt_dims"
    spark.sql("DROP TABLE IF EXISTS bt_facts")
    spark.sql("DROP TABLE IF EXISTS bt_dims")


def test_cobucketed_join_has_no_exchange(spark, two_tables):
    ta, tb = two_tables
    with _forced_smj(spark):
        joined = spark.table(ta).join(spark.table(tb), "k")
        joined.collect()  # materialize under AQE before reading the plan
        assert_plan(joined, forbid=["Exchange"], require=["SortMergeJoin"])


def test_cobucketed_join_matches_unbucketed(spark, two_tables):
    ta, tb = two_tables
    facts = spark.range(0, 2000).select(
        F.col("id").alias("k"), (F.col("id") * 3 % 97).alias("v")
    )
    dims = spark.range(0, 500).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("grp")
    )
    expected = sorted(facts.join(dims, "k").collect())
    with _forced_smj(spark):
        got = sorted(spark.table(ta).join(spark.table(tb), "k").collect())
    assert got == expected


def test_groupby_on_bucket_col_has_no_exchange(spark, two_tables):
    ta, _ = two_tables
    agg = spark.table(ta).groupBy("k").agg(F.sum("v").alias("s"))
    agg.collect()
    assert_plan(agg, forbid=["Exchange"])


def test_bucket_pruning_on_equality_filter(spark, two_tables):
    ta, _ = two_tables
    # Without the forced bucketed scan, the planner's auto heuristic
    # drops the layout for a bare filter and reads all 8 buckets.
    plain = plan_string(spark.table(ta).where(F.col("k") == 42))
    assert "SelectedBucketsCount" not in plain
    with bucketed_scan_forced(spark):
        pruned = spark.table(ta).where(F.col("k") == 42)
        plan = plan_string(pruned)
        assert f"SelectedBucketsCount: 1 out of {N_BUCKETS}" in plan, plan
        assert pruned.count() == 1


def test_one_file_per_bucket(spark, two_tables, tmp_path):
    files = [
        p for p in (tmp_path / "facts").iterdir() if p.name.endswith(".parquet")
    ]
    assert len(files) == N_BUCKETS, sorted(p.name for p in files)


def test_bucket_spec_and_cobucketed(spark, two_tables, tmp_path):
    ta, tb = two_tables
    spec = bucket_spec(spark, ta)
    assert spec == {"num_buckets": N_BUCKETS, "bucket_cols": ["k"], "sort_cols": ["k"]}
    assert cobucketed(spark, ta, tb, ["k"])
    # A mismatched bucket count must not claim co-location.
    other = spark.range(0, 100).select(F.col("id").alias("k"))
    write_bucketed(other, "bt_other", str(tmp_path / "other"), ["k"], N_BUCKETS * 2)
    try:
        assert not cobucketed(spark, ta, "bt_other", ["k"])
    finally:
        spark.sql("DROP TABLE IF EXISTS bt_other")
    # An unbucketed table reports an empty spec.
    spark.range(5).write.mode("overwrite").option(
        "path", str(tmp_path / "plain")
    ).saveAsTable("bt_plain")
    try:
        assert bucket_spec(spark, "bt_plain")["num_buckets"] == 0
        assert not cobucketed(spark, ta, "bt_plain", ["k"])
    finally:
        spark.sql("DROP TABLE IF EXISTS bt_plain")


def test_bucketed_minhash_store_one_sided_shuffle(spark, tmp_path):
    """The incremental-dedup store contract end-to-end: a band-bucket
    table written bucketed by (band, band_hash) must (a) give identical
    pairs through incremental_near_duplicates, and (b) join against a
    plain batch side with exactly ONE shuffle — the batch's — where the
    same data as a plain table costs two."""
    from data_pipelines_spark.operators.dedup import (
        incremental_near_duplicates,
        minhash_band_buckets,
        minhash_signatures,
    )

    base = " ".join(f"w{i}" for i in range(60))
    corpus = spark.createDataFrame(
        [(0, base), (1, "totally different content " * 8)],
        "doc_id long, text string",
    )
    batch = spark.createDataFrame(
        [(10, base + " tail"), (11, "novel text nothing shares")],
        "doc_id long, text string",
    )
    store_sigs = minhash_signatures(corpus)
    store_buckets = minhash_band_buckets(store_sigs)
    write_bucketed(
        store_buckets, "bt_bands", str(tmp_path / "bands"),
        ["band", "band_hash"], N_BUCKETS,
    )
    batch_path = str(tmp_path / "batch_buckets")
    minhash_band_buckets(minhash_signatures(batch)).write.parquet(batch_path)
    try:
        base_pairs, _ = incremental_near_duplicates(
            batch, store_sigs, jaccard_threshold=0.5
        )
        buck_pairs, _ = incremental_near_duplicates(
            batch, store_sigs, jaccard_threshold=0.5,
            corpus_buckets=spark.table("bt_bands"),
        )
        base_rows = sorted(map(tuple, base_pairs.collect()))
        assert sorted(map(tuple, buck_pairs.collect())) == base_rows
        # single-collect: the count() re-executed the whole est chain
        assert len(base_rows) > 0, "fixture must plant a cross pair"

        def shuffles(right):
            with _forced_smj(spark):
                j = spark.read.parquet(batch_path).withColumnRenamed(
                    "doc_id", "doc_a"
                ).join(
                    right.withColumnRenamed("doc_id", "doc_b"),
                    ["band", "band_hash"],
                )
                j.collect()
                return plan_string(j, final_only=True).count(
                    "Exchange hashpartitioning"
                )

        n_bucketed = shuffles(spark.table("bt_bands"))
        n_plain = shuffles(spark.read.parquet(str(tmp_path / "bands")))
        assert n_bucketed == 1, f"bucketed store join shuffled {n_bucketed} sides"
        assert n_plain == 2
    finally:
        spark.sql("DROP TABLE IF EXISTS bt_bands")


def test_write_bucketed_validates_args(spark, tmp_path):
    df = spark.range(3)
    with pytest.raises(ValueError, match="num_buckets"):
        write_bucketed(df, "bt_bad", str(tmp_path / "bad"), ["id"], 0)
    with pytest.raises(ValueError, match="bucket_cols"):
        write_bucketed(df, "bt_bad", str(tmp_path / "bad"), [], 4)


class _forced_smj:
    """Force a sort-merge join (disable broadcast) and restore the
    session threshold afterwards — per-test, not session-global."""

    def __init__(self, spark):
        self.spark = spark

    def __enter__(self):
        self.prev = self.spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        self.spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        return self

    def __exit__(self, *exc):
        self.spark.conf.set("spark.sql.autoBroadcastJoinThreshold", self.prev)
