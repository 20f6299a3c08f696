"""Plan-shape pins for the r14 optimization round.

Each pin asserts the *physical* property an optimization bought, so a
regression (an extra exchange, a demotion back to SortAggregate, a
window reappearing) fails loudly even while results stay correct.
Results themselves are covered by the existing equivalence/oracle
tests; these tests look only at plans.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_pipelines_spark.operators.dedup import (
    _guard_band_buckets,
    duplicate_span_report,
    duplicate_span_stats,
    minhash_signatures,
    remove_duplicate_spans,
)
from data_pipelines_spark.operators.flood import compute_summary_forecast


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


@pytest.fixture()
def docs(spark):
    rows = [
        (i, f"doc {i} shares the quick brown fox jumps over the lazy dog "
            f"boilerplate tail number {i % 3}")
        for i in range(40)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_minhash_signatures_single_exchange(docs):
    """OPH signature assembly is ONE hash aggregate: exactly one
    Exchange (the groupBy(id) shuffle; the spread() repartition of a
    narrow in-memory input does not apply here) and no
    ObjectHashAggregate / second-level aggregate."""
    plan = _plan(minhash_signatures(docs))
    assert plan.count(") Exchange") == 1, plan
    assert "ObjectHashAggregate" not in plan, plan
    assert "SortAggregate" not in plan, plan


def test_span_operators_no_window_no_sortagg(docs):
    """The span operators derive islands/ranges from per-doc sorted
    arrays: no window pass, no sort-based aggregate (the packed
    first-occurrence key keeps the gram aggregate hash-based)."""
    for frame in (
        duplicate_span_stats(docs, n=3),
        remove_duplicate_spans(docs, n=3),
        duplicate_span_report(docs, n=3),
    ):
        plan = _plan(frame)
        assert ") Window" not in plan, plan
        assert "SortAggregate" not in plan, plan


def test_band_bucket_guard_no_window(docs):
    """The max_bucket guard is an oversized-only aggregate broadcast
    back — no window (the old formulation shuffled AND sorted the whole
    bucket table on (band, band_hash))."""
    from data_pipelines_spark.operators.dedup import minhash_band_buckets

    sigs = minhash_signatures(docs)
    buckets = minhash_band_buckets(sigs)
    guarded = _guard_band_buckets(buckets, 10, "doc_id", "test")
    plan = _plan(guarded)
    assert ") Window" not in plan, plan
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoop" in plan, plan


def test_summary_forecast_hash_aggregate(spark):
    """The fused summary aggregation stays hash-based: the peak argmax
    rides a collected struct list (array_max), not a struct-ordered
    max_by that would demote the whole aggregate to SortAggregate."""
    detailed = spark.createDataFrame(
        [
            (1.0, 2.0, "2026-08-01", "2026-08-02", s, 1.0 + s, 0.5, 2.0,
             3.0, 0.4, 0.2, 0.1)
            for s in range(1, 5)
        ],
        "latitude double, longitude double, issued_on string, "
        "valid_for string, step long, median_dis double, min_dis double, "
        "q3_dis double, max_dis double, p_above_2y double, "
        "p_above_5y double, p_above_20y double",
    )
    plan = _plan(compute_summary_forecast(detailed, with_geometry=False))
    assert "SortAggregate" not in plan, plan
    assert ") Window" not in plan, plan


def test_band_hash_is_long(docs):
    """Fast-path band keys shuffle as 8-byte longs, not their ~20-char
    decimal string rendering (same equality relation, narrower exchange
    on the corpus×bands bucket table); portable mode keeps the raw
    string because external engines must group identically."""
    from data_pipelines_spark.operators.dedup import (
        minhash_band_buckets,
        minhash_signatures,
    )

    fast = minhash_band_buckets(minhash_signatures(docs))
    assert dict(fast.dtypes)["band_hash"] == "bigint"
    portable = minhash_band_buckets(
        minhash_signatures(docs, portable=True), portable=True
    )
    assert dict(portable.dtypes)["band_hash"] == "string"


def test_codegen_cache_sized_for_mixed_workloads(spark):
    """get_spark raises the Janino class-cache static conf: at the
    default 100 entries one mixed-workload session (the 16-query bench
    alone) evicts and recompiles the widest plans' classes on every
    repetition (measured +48 classes / ~1.5 s per bench pass on
    minhash_near_dup_pairs)."""
    assert (
        int(spark.conf.get("spark.sql.codegen.cache.maxEntries")) >= 1024
    )


def test_detailed_forecast_joins_after_aggregation(spark):
    """The exact-quantile detailed forecast aggregates BEFORE the
    threshold join: the broadcast join's streamed side is the
    aggregate output, so no exceed-flag columns cross the exchange."""
    from data_pipelines_spark.operators.flood import compute_detailed_forecast

    forecast = spark.createDataFrame(
        [(1, s, 1.0, 2.0, "2026-08-01", "2026-08-02", float(10 * s))
         for s in range(1, 4)],
        "number long, step long, latitude double, longitude double, "
        "issued_on string, valid_for string, dis24 double",
    )
    thresholds = spark.createDataFrame(
        [(1.0, 2.0, 5.0, 15.0, 30.0)],
        "latitude double, longitude double, threshold_2y double, "
        "threshold_5y double, threshold_20y double",
    )
    plan = _plan(compute_detailed_forecast(forecast, thresholds))
    # the aggregate must appear BELOW the broadcast join in the plan:
    # the join's streamed input is the aggregated frame, so no exceed_*
    # flag columns exist anywhere in the plan.
    assert "exceed_" not in plan, plan
    assert "BroadcastHashJoin" in plan, plan
