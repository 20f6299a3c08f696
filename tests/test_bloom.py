"""Bloom-filter pre-filter (plans/bloom.py): exact-equivalence to the
plain semi/anti join (false positives must die in the exact re-check,
false negatives must not exist), sketch compactness, FPP calibration,
and retry-determinism of the sketch under input repartitioning."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_pipelines_spark.plans.bloom import (
    bloom_build,
    bloom_filter_join,
    bloom_params,
    with_bloom_contains,
)


def test_bloom_params_textbook_sizing():
    m, k = bloom_params(1000, 0.01)
    # -1000*ln(.01)/ln(2)^2 = 9585.1 -> 9586 -> next multiple of 64
    assert m == 9600
    assert k == 7
    with pytest.raises(ValueError):
        bloom_params(1000, 1.5)
    # degenerate build sizes still give a usable (tiny) filter
    m0, k0 = bloom_params(0, 0.01)
    assert m0 >= 64 and k0 >= 1


def test_bloom_join_equals_exact_join(spark):
    build = spark.range(0, 2000).select((F.col("id") * 3).alias("k"))
    probe = spark.range(0, 9000).select(F.col("id").alias("pk"))
    for how in ("left_semi", "left_anti"):
        got = bloom_filter_join(probe, build, "pk", "k", how=how)
        want = probe.join(
            build.select("k"), probe.pk == F.col("k"), how
        )
        assert sorted(r.pk for r in got.collect()) == sorted(
            r.pk for r in want.collect()
        ), how


def test_bloom_join_string_keys_and_null_probe(spark):
    build = spark.createDataFrame(
        [("the quick",), ("brown fox",)], "gram string"
    )
    probe = spark.createDataFrame(
        [(1, "the quick"), (2, "lazy dog"), (3, None)], "id long, gram string"
    )
    semi = bloom_filter_join(probe, build, "gram", how="left_semi")
    assert [r.id for r in semi.collect()] == [1]
    anti = bloom_filter_join(probe, build, "gram", how="left_anti")
    # NULL never equi-matches: kept by anti (SQL semantics), dropped by semi
    assert sorted(r.id for r in anti.collect()) == [2, 3]


def test_bloom_no_false_negatives_and_fpp_calibrated(spark):
    build = spark.range(0, 2000).select(F.col("id").alias("k"))
    m, k = bloom_params(2000, 0.01)
    words = bloom_build(build, "k", m, k)
    assert words.count() <= m // 64
    # every inserted key must hit (no false negatives — the safety of
    # the anti-join fast path rests on this)
    hits = with_bloom_contains(build, "k", words, m, k).where(
        ~F.col("might_contain")
    )
    assert hits.count() == 0
    # disjoint probe: observed FPP within 3x of the 1% design point
    far = spark.range(1_000_000, 1_020_000).select(F.col("id").alias("k"))
    fp = with_bloom_contains(far, "k", words, m, k).where("might_contain")
    assert fp.count() / 20_000 < 0.03


def test_bloom_empty_build_side(spark):
    build = spark.range(0).select(F.col("id").alias("k"))
    probe = spark.range(100).select(F.col("id").alias("pk"))
    assert bloom_filter_join(probe, build, "pk", "k", how="left_semi").count() == 0
    assert bloom_filter_join(probe, build, "pk", "k", how="left_anti").count() == 100


def test_bloom_sketch_is_partitioning_invariant(spark):
    """bit_or over content-derived positions: the sketch must be
    byte-identical however the build side is partitioned (the retry-
    determinism property salted_agg is held to)."""
    build = spark.range(0, 5000).select(F.col("id").alias("k"))
    m, k = bloom_params(5000, 0.01)
    base = sorted(map(tuple, bloom_build(build, "k", m, k).collect()))
    for parts in (1, 7, 32):
        redo = sorted(
            map(tuple, bloom_build(build.repartition(parts), "k", m, k).collect())
        )
        assert redo == base


def test_bloom_probe_plan_shape(spark):
    """The probe must be a broadcast of ONE packed row + codegen map
    lookups — no shuffle of the probe side before the verdict column."""
    build = spark.range(0, 100).select(F.col("id").alias("k"))
    probe = spark.range(0, 100).select(F.col("id").alias("pk"))
    m, k = bloom_params(100, 0.01)
    words = bloom_build(build, "k", m, k)
    plan = (
        with_bloom_contains(probe, "pk", words, m, k)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    # the single-row cross join is the only acceptable nested loop:
    # its build side is the 1-row packed sketch, never the probe table
    assert "CartesianProduct" not in plan


def test_bloom_join_coerces_mismatched_numeric_key_types(spark):
    """xxhash64 is type-sensitive (INT 5 != BIGINT 5), so mismatched
    key types must hash through a canonical widening — before this the
    sketch reported every probe a definite miss and the semi join
    silently returned nothing."""
    from data_pipelines_spark.plans.bloom import bloom_filter_join

    probe = spark.createDataFrame([(1,), (2,), (3,)], "k int")
    build = spark.createDataFrame([(1,), (3,)], "k long")
    semi = sorted(r["k"] for r in bloom_filter_join(probe, build, "k").collect())
    anti = sorted(
        r["k"] for r in bloom_filter_join(probe, build, "k", how="left_anti").collect()
    )
    assert semi == [1, 3] and anti == [2]
    # float widens to double the same way
    pf = spark.createDataFrame([(1.5,), (2.5,)], "k float")
    bd = spark.createDataFrame([(1.5,)], "k double")
    assert [r["k"] for r in bloom_filter_join(pf, bd, "k").collect()] == [1.5]
    # output schema keeps the probe's own type
    assert dict(bloom_filter_join(probe, build, "k").dtypes)["k"] == "int"


def test_bloom_join_rejects_family_crossing_key_types(spark):
    import pytest

    from data_pipelines_spark.plans.bloom import bloom_filter_join

    probe = spark.createDataFrame([(1,)], "k int")
    build = spark.createDataFrame([("1",)], "k string")
    with pytest.raises(ValueError, match="key types differ"):
        bloom_filter_join(probe, build, "k")
