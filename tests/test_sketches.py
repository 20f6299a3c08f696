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


# --- mean_pool / l2_normalize (operators/similarity.py) ----------------


def test_mean_pool_matches_numpy(spark):
    import numpy as np

    from data_pipelines_spark.operators.similarity import mean_pool

    rows = [
        (0, [1.0, 2.0, 3.0]),
        (0, [3.0, 0.0, -1.0]),
        (0, None),
        (1, [5.0, 5.0, 5.0]),
    ]
    df = spark.createDataFrame(rows, "doc_id long, vec array<double>")
    got = {
        r["doc_id"]: (r["vec"], r["n_vectors"])
        for r in mean_pool(df, ["doc_id"], "vec").collect()
    }
    want0 = np.mean([rows[0][1], rows[1][1]], axis=0)
    assert np.allclose(got[0][0], want0) and got[0][1] == 2
    assert got[1] == ([5.0, 5.0, 5.0], 1)


def test_mean_pool_normalized_feeds_topk(spark):
    import numpy as np

    from data_pipelines_spark.operators.similarity import (
        brute_force_topk,
        mean_pool,
    )

    rng = np.random.RandomState(7)
    rows = [
        (doc, rng.randn(8).tolist()) for doc in range(6) for _ in range(4)
    ]
    df = spark.createDataFrame(rows, "vec_id long, vec array<double>")
    pooled = mean_pool(df, ["vec_id"], "vec", normalize=True)
    norms = [
        float(np.linalg.norm(r["vec"])) for r in pooled.collect()
    ]
    assert all(abs(n - 1.0) < 1e-9 for n in norms)
    # pooled table slots straight into the ANN baseline
    q = spark.createDataFrame(
        [(rng.randn(8).tolist(),)], "qvec array<double>"
    )
    top = brute_force_topk(pooled, q, k=3, vec_col="vec")
    assert top.count() == 3


def test_l2_normalize_zero_and_null(spark):
    from pyspark.sql import functions as F

    from data_pipelines_spark.operators.similarity import l2_normalize

    df = spark.createDataFrame(
        [(0, [0.0, 0.0]), (1, None), (2, [3.0, 4.0])],
        "i long, vec array<double>",
    )
    got = {
        r["i"]: r["n"]
        for r in df.select("i", l2_normalize(F.col("vec")).alias("n")).collect()
    }
    assert got[0] is None and got[1] is None
    assert got[2] == [0.6, 0.8]


def test_empty_inputs_survive(spark):
    """Zero-row inputs are routine at scale: sketching, merging, and
    pooling must run (global sketch of nothing = one row estimating 0;
    grouped forms = zero rows)."""
    empty_ev = spark.createDataFrame([], "day long, user_id long")
    g = distinct_sketch(empty_ev, [], "user_id").collect()
    assert len(g) == 1 and (g[0]["n_distinct_approx"] or 0) == 0
    assert distinct_sketch(empty_ev, ["day"], "user_id").count() == 0

    empty_sk = distinct_sketch(empty_ev, ["day"], "user_id")
    assert merge_distinct_counts(empty_sk, [], "distinct_sketch").count() == 1

    from data_pipelines_spark.operators.similarity import mean_pool

    empty_vecs = spark.createDataFrame([], "doc_id long, vec array<double>")
    assert mean_pool(empty_vecs, ["doc_id"], "vec").count() == 0
