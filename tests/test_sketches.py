"""Mergeable HLL distinct-count sketches (operators/sketches.py):
error envelope, lossless union (daily rollup == direct sketch), and
grain handling.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from data_pipelines_spark.operators.sketches import (
    distinct_sketch,
    merge_distinct_counts,
)


def _events(spark):
    # 3 days x 10k events; user ids overlap across days so a naive
    # sum-of-daily-distincts would overcount badly.
    return spark.range(30_000).select(
        (F.col("id") % 3).alias("day"),
        (F.pmod(F.xxhash64("id"), 4000)).alias("user_id"),
    )


def test_estimate_within_error_envelope(spark):
    df = _events(spark)
    exact = df.select("user_id").distinct().count()
    est = distinct_sketch(df, [], "user_id").collect()[0]["n_distinct_approx"]
    assert abs(est - exact) / exact < 0.05


def test_daily_rollup_equals_direct_sketch(spark):
    """Union over stored daily sketches must estimate EXACTLY what a
    direct sketch of the union estimates — the property that makes the
    sketch store composable (no double counting, no rescan)."""
    df = _events(spark)
    daily = distinct_sketch(df, ["day"], "user_id")
    rolled = merge_distinct_counts(daily, [], "distinct_sketch").collect()[0][
        "n_distinct_approx"
    ]
    direct = distinct_sketch(df, [], "user_id").collect()[0][
        "n_distinct_approx"
    ]
    # sparse-mode sketches (4k distinct << 2^12 buckets) union
    # bit-exactly with the direct sketch
    assert rolled == direct

    # and far below the naive sum of daily distincts (ids overlap)
    naive = sum(r["n_distinct_approx"] for r in daily.collect())
    assert rolled < 0.5 * naive


def test_dense_mode_union_stays_in_envelope(spark):
    """Past sparse mode (200k distinct >> 2^12 buckets) the union's
    estimate may differ from the direct sketch by a fraction of a
    percent; both must stay within the error envelope of the exact
    count — the property the store actually promises."""
    df = spark.range(600_000).select(
        (F.col("id") % 3).alias("day"), F.xxhash64("id").alias("user_id")
    )
    exact = df.select("user_id").distinct().count()
    daily = distinct_sketch(df, ["day"], "user_id")
    rolled = merge_distinct_counts(daily, [], "distinct_sketch").collect()[0][
        "n_distinct_approx"
    ]
    assert abs(rolled - exact) / exact < 0.03


def test_group_grain_and_cascade(spark):
    df = _events(spark)
    daily = distinct_sketch(df, ["day"], "user_id")
    assert daily.count() == 3
    # cascade day -> global keeping the sketch, then estimate again
    merged = merge_distinct_counts(
        daily, [], "distinct_sketch", keep_sketch=True
    )
    again = merge_distinct_counts(merged, [], "distinct_sketch").collect()[0][
        "n_distinct_approx"
    ]
    direct = distinct_sketch(df, [], "user_id").collect()[0][
        "n_distinct_approx"
    ]
    assert again == direct


def test_sketch_survives_parquet_roundtrip(spark, tmp_path):
    """The store pattern: daily sketch rows written to parquet, read
    back, and unioned — the binary sketch column round-trips."""
    df = _events(spark)
    p = str(tmp_path / "sketches")
    distinct_sketch(df, ["day"], "user_id").write.parquet(p)
    back = spark.read.parquet(p)
    rolled = merge_distinct_counts(back, [], "distinct_sketch").collect()[0][
        "n_distinct_approx"
    ]
    direct = distinct_sketch(df, [], "user_id").collect()[0][
        "n_distinct_approx"
    ]
    assert rolled == direct
