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


def test_minhash_signatures_row_local(docs):
    """OPH signature assembly is row-local (r14): one projection over
    the docs scan — no explode, no aggregate of any kind, and no
    Exchange at all (the spread() repartition of a narrow file scan is
    the only shuffle that may ever appear, and an in-memory input does
    not get one)."""
    plan = _plan(minhash_signatures(docs))
    assert plan.count(") Exchange") == 0, plan
    assert "HashAggregate" not in plan, plan
    assert "ObjectHashAggregate" not in plan, plan
    assert "SortAggregate" not in plan, plan
    assert ") Generate" not in plan, plan  # no explode

    # The portable (oracle-replayable) path keeps its explode+groupBy
    # shape: one exchange, hash aggregate.
    pplan = _plan(minhash_signatures(docs, portable=True))
    assert "HashAggregate" in pplan, pplan


def test_verify_pairs_exact_single_scan_equivalence(spark, docs):
    """single_scan=True reads the corpus once (plan pin below) and is
    value-identical to the two-join form, including pairs whose doc is
    missing from the corpus and the no-threshold mode."""
    from data_pipelines_spark.operators.dedup import verify_pairs_exact

    pairs = spark.createDataFrame(
        [(0, 3), (1, 4), (2, 39), (5, 999)],  # 999 absent from docs
        "doc_a long, doc_b long",
    )
    for mj in (None, 0.5):
        base = sorted(
            map(tuple, verify_pairs_exact(docs, pairs, min_jaccard=mj).collect())
        )
        one = sorted(
            map(
                tuple,
                verify_pairs_exact(
                    docs, pairs, min_jaccard=mj, single_scan=True
                ).collect(),
            )
        )
        assert base == one, (mj, base, one)
    # presence semantics: the absent-doc pair is dropped in both forms
    assert all(r[1] != 999 for r in base)


def test_verify_pairs_exact_single_scan_one_corpus_scan(spark):
    """The single-scan verify touches the corpus parquet exactly once;
    the per-side-join form scans it twice."""
    import os

    import pytest as _pytest

    from data_pipelines_spark.operators.dedup import verify_pairs_exact
    from data_pipelines_spark.sources.tables import load_table

    sf_dir = "/root/testdata/sf0.001"
    if not os.path.exists(os.path.join(sf_dir, "documents.parquet")):
        _pytest.skip("testdata not present")
    corpus = load_table(spark, sf_dir, "documents")
    pairs = spark.createDataFrame([(1, 2), (3, 4)], "doc_a long, doc_b long")
    one = _plan(
        verify_pairs_exact(
            corpus, pairs, broadcast_pairs=True, min_jaccard=0.5, single_scan=True
        )
    )
    two = _plan(
        verify_pairs_exact(corpus, pairs, broadcast_pairs=True, min_jaccard=0.5)
    )
    # count the numbered detail entries ("(n) Scan parquet"), not the
    # tree lines — formatted plans print each operator twice.
    assert one.count(") Scan parquet") == 1, one
    assert two.count(") Scan parquet") == 2, two


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
