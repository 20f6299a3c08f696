"""spread() width-guard behavior (plans/parallelism.py).

The guard must (a) widen genuinely narrow file-backed inputs for
Python-heavy stages, (b) leave large single-file tables alone — Spark
splits them by maxPartitionBytes, so they scan wide already — and
(c) never force a shuffle on inputs it cannot size.
"""

from __future__ import annotations

import pytest

from data_pipelines_spark.plans.parallelism import estimate_scan_width, spread

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture
def nation(spark):
    return spark.read.parquet(f"{SF_DIR}/nation.parquet")


def test_small_file_estimates_narrow(spark, nation):
    width = estimate_scan_width(nation)
    assert width is not None
    assert width < spark.sparkContext.defaultParallelism


def test_small_file_gets_spread(spark, nation):
    out = spread(nation)
    assert "Repartition" in out._jdf.queryExecution().logical().toString()


def test_large_file_counts_splits_not_files(spark, nation):
    # A single big file is NOT narrow: Spark splits it by
    # maxPartitionBytes. Simulate by shrinking the split size so the
    # tiny fixture estimates many splits wide -> spread must no-op.
    old = spark.conf.get("spark.sql.files.maxPartitionBytes")
    spark.conf.set("spark.sql.files.maxPartitionBytes", "64")
    try:
        width = estimate_scan_width(nation)
        assert width >= spark.sparkContext.defaultParallelism
        assert spread(nation) is nation
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", old)


def test_unsized_source_left_alone(spark):
    df = spark.range(10)  # no leaf files: width unknown
    assert estimate_scan_width(df) is None
    assert spread(df) is df


def test_width_hint_wins(spark, nation):
    assert spread(nation, width_hint=10_000) is nation


def test_derived_frame_still_sized_from_leaves(spark, nation):
    derived = nation.select("n_nationkey").filter("n_nationkey > 2")
    assert estimate_scan_width(derived) is not None


def test_diagnose_skew_reports_heavy_hitters(spark):
    from data_pipelines_spark.plans.skew import diagnose_skew

    rows = [("hot", i) for i in range(900)] + [
        (f"k{i % 10}", i) for i in range(100)
    ]
    df = spark.createDataFrame(rows, "k string, v long")
    rep = diagnose_skew(df, ["k"], top_k=3).collect()
    assert rep[0]["k"] == "hot"
    assert rep[0]["key_cnt"] == 900
    assert rep[0]["total_cnt"] == 1000
    assert abs(rep[0]["frac"] - 0.9) < 1e-12
    assert len(rep) == 3
    # TakeOrdered head, not a global sort
    plan = (
        diagnose_skew(df, ["k"], top_k=3)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "TakeOrderedAndProject" in plan
