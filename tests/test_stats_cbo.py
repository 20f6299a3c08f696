"""Statistics hooks (`plans/stats.py`): ANALYZE after materialization
records row counts + per-column NDVs in the catalog, and with CBO on,
those stats pick the join build side at PLAN time — the multiway-join
shape (fact probes, dims broadcast) must hold WITHOUT explicit
broadcast hints, which is what survives a 100 TB deployment where
AQE's runtime stats arrive only after the first exchange is already
materialized."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_pipelines_spark.plans.stats import (
    analyze_dataset,
    cbo_session,
    explain_str,
    table_stats,
)


@pytest.fixture()
def fact_dim(spark, tmp_path):
    fact = spark.range(20_000).select(
        F.col("id").alias("k"),
        (F.col("id") % 50).alias("dim_id"),
        (F.col("id") * 2).cast("double").alias("amount"),
    )
    dim = spark.range(50).select(
        F.col("id").alias("dim_id"),
        F.concat(F.lit("name-"), F.col("id")).alias("name"),
    )
    fpath, dpath = str(tmp_path / "fact"), str(tmp_path / "dim")
    fact.write.parquet(fpath)
    dim.write.parquet(dpath)
    yield fpath, dpath
    for t in ("stats_fact_tmp", "stats_dim_tmp"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_analyze_records_rowcount_and_ndv(spark, fact_dim):
    fpath, dpath = fact_dim
    stats = analyze_dataset(spark, fpath, "stats_fact_tmp")
    assert stats["row_count"] == 20_000
    assert stats["size_bytes"] > 0
    # NDV is an HLL sketch estimate — assert within sketch error
    ndv_d = stats["columns"]["dim_id"]["ndv"]
    assert ndv_d is not None and abs(ndv_d - 50) / 50 < 0.1
    ndv_k = stats["columns"]["k"]["ndv"]
    assert ndv_k is not None and abs(ndv_k - 20_000) / 20_000 < 0.1
    assert stats["columns"]["k"]["nulls"] == 0
    # re-analyze is idempotent (external table: data untouched)
    again = analyze_dataset(spark, fpath, "stats_fact_tmp")
    assert again["row_count"] == 20_000
    # the stats read back through the standalone accessor too
    ndv_back = table_stats(spark, "stats_fact_tmp", ["dim_id"])[
        "columns"
    ]["dim_id"]["ndv"]
    assert ndv_back == ndv_d


def test_cbo_builds_on_the_small_side_without_hints(spark, fact_dim):
    """With stats present and CBO on, a hint-free fact-dim join
    broadcasts the DIM side (its stats say tiny) — the multiway-join
    plan shape holds from statistics alone."""
    fpath, dpath = fact_dim
    analyze_dataset(spark, fpath, "stats_fact_tmp")
    analyze_dataset(spark, dpath, "stats_dim_tmp")
    cbo_session(spark, True)
    try:
        joined = (
            spark.table("stats_fact_tmp")
            .join(spark.table("stats_dim_tmp"), "dim_id")
            .groupBy("name")
            .agg(F.sum("amount").alias("total"))
        )
        plan = explain_str(joined)
        assert "BroadcastHashJoin" in plan
        assert "SortMergeJoin" not in plan
        # the BROADCAST exchange hangs off the dim scan, not the fact
        bcast_idx = plan.index("BroadcastExchange")
        assert "stats_dim_tmp" in plan[bcast_idx:], plan
        assert "stats_fact_tmp" not in plan[bcast_idx:plan.index(
            "stats_dim_tmp", bcast_idx
        )]
        # and the result is right
        rows = {r["name"]: r["total"] for r in joined.collect()}
        assert len(rows) == 50
    finally:
        cbo_session(spark, False)


def test_analyze_refuses_to_clobber_managed_table(spark, tmp_path):
    """Review regression: DROP TABLE on a MANAGED table deletes its
    data — analyze_dataset's re-registration must refuse a name
    collision with one instead of silently destroying it."""
    spark.sql("DROP TABLE IF EXISTS stats_managed_tmp")
    spark.range(3).write.saveAsTable("stats_managed_tmp")
    try:
        with pytest.raises(ValueError, match="MANAGED"):
            analyze_dataset(
                spark, str(tmp_path / "x"), "stats_managed_tmp"
            )
        # the managed table survived the refusal
        assert spark.table("stats_managed_tmp").count() == 3
    finally:
        spark.sql("DROP TABLE IF EXISTS stats_managed_tmp")


def test_materialize_lifecycle_auto_analyze(spark, tmp_path):
    """Round 13: the opt-in ``analyze=`` hook on upsert_partitioned
    runs ANALYZE as part of the normal materialization lifecycle —
    the hint-free CBO broadcast pin must hold against tables produced
    by the materialize path alone (bootstrap AND merge re-analyze),
    with no manual analyze_dataset call anywhere."""
    from data_pipelines_spark.sources.materialize import (
        upsert_partitioned,
    )

    fpath, dpath = str(tmp_path / "factm"), str(tmp_path / "dimm")
    fact = spark.range(20_000).select(
        F.col("id").alias("k"),
        (F.col("id") % 50).alias("dim_id"),
        (F.col("id") * 2).cast("double").alias("amount"),
    )
    dim = spark.range(50).select(
        F.col("id").alias("dim_id"),
        F.concat(F.lit("name-"), F.col("id")).alias("name"),
    )
    try:
        # bootstrap writes analyze too
        upsert_partitioned(
            spark, fact, fpath, ["k"], analyze="stats_factm_tmp"
        )
        upsert_partitioned(
            spark, dim, dpath, ["dim_id"], analyze="stats_dimm_tmp"
        )
        assert (
            table_stats(spark, "stats_factm_tmp")["row_count"] == 20_000
        )
        # a later MERGE refreshes the stats through the same hook
        upsert_partitioned(
            spark,
            spark.range(50, 60).select(
                F.col("id").alias("dim_id"),
                F.lit("late").alias("name"),
            ),
            dpath,
            ["dim_id"],
            analyze="stats_dimm_tmp",
        )
        assert table_stats(spark, "stats_dimm_tmp")["row_count"] == 60
        cbo_session(spark, True)
        try:
            joined = (
                spark.table("stats_factm_tmp")
                .join(spark.table("stats_dimm_tmp"), "dim_id")
                .groupBy("name")
                .agg(F.sum("amount").alias("total"))
            )
            plan = explain_str(joined)
            assert "BroadcastHashJoin" in plan
            assert "SortMergeJoin" not in plan
            bcast_idx = plan.index("BroadcastExchange")
            assert "stats_dimm_tmp" in plan[bcast_idx:], plan
            assert joined.count() == 50
        finally:
            cbo_session(spark, False)
        # the hook is parquet-format only, loudly
        with pytest.raises(ValueError, match="parquet-format only"):
            upsert_partitioned(
                spark, dim, str(tmp_path / "txn"), ["dim_id"],
                format="txn", analyze="nope_tmp",
            )
    finally:
        for t in ("stats_factm_tmp", "stats_dimm_tmp"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")
