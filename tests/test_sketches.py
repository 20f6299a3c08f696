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


class TestHistogramSketch:
    def _values(self, spark, vals, day_of=lambda i: "d1"):
        return spark.createDataFrame(
            [(day_of(i), float(v) if v is not None else None)
             for i, v in enumerate(vals)],
            "day string, v double",
        )

    def test_rollup_is_bit_exact_vs_direct(self, spark):
        """The store's whole point: summing daily histograms equals
        histogramming the union — exactly (integer counts, no estimator
        variance), unlike the HLL dense-mode caveat."""
        from data_pipelines_spark.operators.sketches import (
            histogram_sketch,
            merge_histogram_sketches,
        )

        vals = [i % 37 * 0.5 for i in range(500)] + [-3.0, 99.0, None]
        df = self._values(spark, vals, day_of=lambda i: f"d{i % 5}")
        daily = histogram_sketch(df, ["day"], "v", lo=0.0, hi=20.0, n_bins=16)
        rolled = merge_histogram_sketches(daily, [], n_bins=16).collect()[0]
        direct = histogram_sketch(df, [], "v", lo=0.0, hi=20.0, n_bins=16).collect()[0]
        for f in ("hist", "n_below", "n_above", "n_null", "n"):
            assert rolled[f] == direct[f], f

    def test_quantiles_within_one_bin_width(self, spark):
        import numpy as np

        from data_pipelines_spark.operators.sketches import (
            histogram_quantiles,
            histogram_sketch,
        )

        rng = np.random.default_rng(7)
        vals = rng.normal(50, 12, 2000).clip(0.5, 99.5).tolist()
        df = self._values(spark, vals)
        lo, hi, n_bins = 0.0, 100.0, 50
        sk = histogram_sketch(df, ["day"], "v", lo, hi, n_bins)
        got = {
            r["q"]: r["value"]
            for r in histogram_quantiles(
                sk, ["day"], [0.1, 0.25, 0.5, 0.75, 0.9], lo, hi, n_bins
            ).collect()
        }
        width = (hi - lo) / n_bins
        for q, v in got.items():
            true = float(np.quantile(np.array(vals), q))
            assert abs(v - true) <= width, (q, v, true)

    def test_quantile_edge_cases(self, spark):
        from data_pipelines_spark.operators.sketches import (
            histogram_quantiles,
            histogram_sketch,
        )

        # all mass below lo -> clamp to lo; all above -> hi; empty -> NULL
        below = self._values(spark, [-5.0, -1.0], day_of=lambda i: "below")
        above = self._values(spark, [200.0, 300.0], day_of=lambda i: "above")
        nulls = self._values(spark, [None, None], day_of=lambda i: "nulls")
        df = below.unionByName(above).unionByName(nulls)
        sk = histogram_sketch(df, ["day"], "v", 0.0, 10.0, 4)
        got = {
            (r["day"], r["q"]): r["value"]
            for r in histogram_quantiles(sk, ["day"], [0.5], 0.0, 10.0, 4).collect()
        }
        assert got[("below", 0.5)] == 0.0
        assert got[("above", 0.5)] == 10.0
        assert got[("nulls", 0.5)] is None

    def test_known_uniform_quantiles_exact_interpolation(self, spark):
        from data_pipelines_spark.operators.sketches import (
            histogram_quantiles,
            histogram_sketch,
        )

        # 10 values 0..9 in [0,10) with 10 bins: one per bin; the
        # interpolation is fully determined: q=0.5 -> target 5.0 lands
        # at bin 4 (cum 5), frac (5-4)/1 -> value 5.0
        df = self._values(spark, [float(i) for i in range(10)])
        sk = histogram_sketch(df, [], "v", 0.0, 10.0, 10)
        got = {
            r["q"]: r["value"]
            for r in histogram_quantiles(sk, [], [0.5, 1.0], 0.0, 10.0, 10).collect()
        }
        assert got[0.5] == 5.0
        assert got[1.0] == 10.0

    def test_partitioning_invariance(self, spark):
        from data_pipelines_spark.operators.sketches import histogram_sketch

        vals = [i % 13 * 1.7 for i in range(300)]
        df = self._values(spark, vals)
        a = histogram_sketch(df, [], "v", 0.0, 25.0, 8).collect()[0]
        b = histogram_sketch(
            df.repartition(7), [], "v", 0.0, 25.0, 8
        ).collect()[0]
        assert a["hist"] == b["hist"] and a["n"] == b["n"]

    def test_rejects_bad_config(self, spark):
        import pytest as _pytest

        from data_pipelines_spark.operators.sketches import histogram_sketch

        df = self._values(spark, [1.0])
        with _pytest.raises(ValueError):
            histogram_sketch(df, [], "v", 0.0, 10.0, 0)
        with _pytest.raises(ValueError):
            histogram_sketch(df, [], "v", 10.0, 10.0, 4)


class TestHistogramDrift:
    def _sk(self, spark, vals, group="g1"):
        from data_pipelines_spark.operators.sketches import histogram_sketch

        df = spark.createDataFrame(
            [(group, float(v)) for v in vals], "g string, v double"
        )
        return histogram_sketch(df, ["g"], "v", 0.0, 10.0, 10)

    def test_identical_distributions_zero_psi(self, spark):
        from data_pipelines_spark.operators.sketches import histogram_drift

        vals = [i % 10 + 0.5 for i in range(100)]
        a, b = self._sk(spark, vals), self._sk(spark, vals)
        row = histogram_drift(a, b, ["g"], n_bins=10).collect()[0]
        assert row["psi"] == 0.0
        assert row["n_baseline"] == row["n_current"] == 100

    def test_shift_raises_psi(self, spark):
        from data_pipelines_spark.operators.sketches import histogram_drift

        base = self._sk(spark, [1.0 + (i % 3) for i in range(100)])
        small = self._sk(spark, [1.2 + (i % 3) for i in range(100)])
        big = self._sk(spark, [6.0 + (i % 3) for i in range(100)])
        psi_small = histogram_drift(base, small, ["g"], 10).collect()[0]["psi"]
        psi_big = histogram_drift(base, big, ["g"], 10).collect()[0]["psi"]
        assert psi_big > psi_small >= 0.0
        assert psi_big > 0.25  # fully disjoint support: "shifted" band

    def test_one_sided_groups_null_psi(self, spark):
        from data_pipelines_spark.operators.sketches import histogram_drift

        a = self._sk(spark, [1.0, 2.0], group="only_old")
        b = self._sk(spark, [1.0, 2.0], group="only_new")
        got = {
            r["g"]: (r["psi"], r["n_baseline"], r["n_current"])
            for r in histogram_drift(a, b, ["g"], 10).collect()
        }
        assert got["only_old"] == (None, 2, 0)
        assert got["only_new"] == (None, 0, 2)

    def test_out_of_range_drift_is_visible(self, spark):
        """Below/above-range mass participates as pseudo-bins: a
        baseline fully in range vs a current fully above range must
        register as a large shift, not silently compare empty bins."""
        from data_pipelines_spark.operators.sketches import histogram_drift

        base = self._sk(spark, [1.0 + (i % 5) for i in range(50)])
        cur = self._sk(spark, [100.0 + i for i in range(50)])
        psi = histogram_drift(base, cur, ["g"], 10).collect()[0]["psi"]
        assert psi > 0.25

    def test_null_group_quantiles_compute(self, spark):
        """Probe regression (NULL-group-loss class): GROUP BY forms a
        NULL group whose quantile must compute like any other's — the
        plain equi join-back left it NULL."""
        from data_pipelines_spark.operators.sketches import (
            histogram_quantiles,
            histogram_sketch,
        )

        rows = [("a" if i < 5 else None, float(i % 10)) for i in range(10)]
        df = spark.createDataFrame(rows, "g string, v double")
        sk = histogram_sketch(df, ["g"], "v", 0.0, 10.0, 10)
        got = {
            r["g"]: r["value"]
            for r in histogram_quantiles(
                sk, ["g"], [0.5], 0.0, 10.0, 10
            ).collect()
        }
        assert got == {"a": 2.5, None: 7.5}

    def test_weighted_histogram_equals_exploded_rows(self, spark):
        """A weighted sketch must equal the count sketch of each row
        repeated weight times (the definition of weighting) — bins,
        out-of-range tallies, and quantiles-from-store alike; n stays a
        row count."""
        from data_pipelines_spark.operators.sketches import (
            histogram_quantiles,
            histogram_sketch,
        )

        rows = [
            ("d", 1.0, 3), ("d", 5.0, 1), ("d", 5.0, 0), ("d", -2.0, 2),
            ("d", 99.0, 4), ("d", None, 2), ("d", 7.0, None),
        ]
        df = spark.createDataFrame(rows, "day string, v double, w long")
        wsk = histogram_sketch(df, ["day"], "v", 0.0, 10.0, 5, weight_col="w")
        # w > 0: Spark's sequence(1, 0) DESCENDS ([1, 0]) rather than
        # producing an empty array, so zero-weight rows need excluding
        # before the explode
        exploded = df.where(F.col("w") > 0).select(
            "day", "v", F.explode(F.sequence(F.lit(1), F.col("w"))).alias("i")
        )
        csk = histogram_sketch(exploded, ["day"], "v", 0.0, 10.0, 5)
        wr, cr = wsk.collect()[0], csk.collect()[0]
        for f in ("hist", "n_below", "n_above", "n_null"):
            assert wr[f] == cr[f], f
        assert wr["n"] == 7  # row count, not weight sum
        wq = histogram_quantiles(wsk, ["day"], [0.5], 0.0, 10.0, 5).collect()[0]
        cq = histogram_quantiles(csk, ["day"], [0.5], 0.0, 10.0, 5).collect()[0]
        assert wq["value"] == cq["value"]

    def test_weighted_negative_raises(self, spark):
        import pytest as _pytest

        from data_pipelines_spark.operators.sketches import histogram_sketch

        df = spark.createDataFrame(
            [("d", 1.0, -3)], "day string, v double, w long"
        )
        with _pytest.raises(Exception, match="negative"):
            histogram_sketch(
                df, ["day"], "v", 0.0, 10.0, 5, weight_col="w"
            ).collect()


    def test_weight_guard_validates_raw_column(self, spark):
        """The guard runs on the RAW weight, before any cast: -0.5 must
        not truncate to 0 and slip the sign check, 2.7 must not
        silently become 2, a non-numeric string must not become 0, and
        NaN must not null-compare its way through. Integral doubles and
        NULLs (contribute 0) stay legal."""
        import pytest as _pytest

        from data_pipelines_spark.operators.sketches import histogram_sketch

        def run(rows, schema):
            df = spark.createDataFrame(rows, schema)
            return histogram_sketch(
                df, ["day"], "v", 0.0, 10.0, 5, weight_col="w"
            ).collect()

        for w in (-0.5, 2.7, float("nan")):
            with _pytest.raises(Exception, match="non-negative integer"):
                run([("d", 1.0, w)], "day string, v double, w double")
        with _pytest.raises(Exception, match="non-negative integer"):
            run([("d", 1.0, "lots")], "day string, v double, w string")

        ok = run(
            [("d", 1.0, 3.0), ("d", 5.0, None)],
            "day string, v double, w double",
        )
        assert ok[0]["hist"] == [3, 0, 0, 0, 0]  # NULL weight → 0
        assert ok[0]["n"] == 2


class TestFrequencySketch:
    def test_estimate_exact_when_collision_free(self, spark):
        """With width >> distinct values, every probe's buckets are
        collision-free and the count-min estimate equals the true
        count; absent values estimate 0; NULLs are excluded."""
        from data_pipelines_spark.operators.sketches import (
            frequency_estimate,
            frequency_sketch,
        )

        rows = (
            [("d", "a")] * 7 + [("d", "b")] * 3 + [("d", None)] * 2
            + [("e", "a")] * 2
        )
        df = spark.createDataFrame(rows, "day string, v string")
        sk = frequency_sketch(df, ["day"], "v", width=4096, depth=4)
        est = {
            (r["day"], r["value"]): r["est_cnt"]
            for r in frequency_estimate(
                sk, ["day"], ["a", "b", "zzz"], width=4096, depth=4
            ).collect()
        }
        assert est == {
            ("d", "a"): 7, ("d", "b"): 3, ("d", "zzz"): 0,
            ("e", "a"): 2, ("e", "b"): 0, ("e", "zzz"): 0,
        }

    def test_never_undercounts_under_collisions(self, spark):
        """Tiny width forces collisions: estimates must be >= the true
        count for every present value (count-min overcounts only)."""
        from data_pipelines_spark.operators.sketches import (
            frequency_estimate,
            frequency_sketch,
        )

        rows = [("d", f"v{i % 50}") for i in range(500)]
        df = spark.createDataFrame(rows, "day string, v string")
        sk = frequency_sketch(df, ["day"], "v", width=16, depth=3)
        vals = [f"v{i}" for i in range(50)]
        est = {
            r["value"]: r["est_cnt"]
            for r in frequency_estimate(
                sk, ["day"], vals, width=16, depth=3
            ).collect()
        }
        assert all(est[v] >= 10 for v in vals), est

    def test_merge_equals_direct(self, spark):
        """Summing stored rows across days == a direct sketch of the
        union (same hashes, integer sums) — the mergeable-store
        contract, bit-exact."""
        from data_pipelines_spark.operators.sketches import (
            frequency_sketch,
            merge_frequency_sketches,
        )

        a = spark.createDataFrame(
            [("m", f"v{i % 9}") for i in range(40)], "g string, v string"
        )
        b = spark.createDataFrame(
            [("m", f"v{i % 13}") for i in range(60)], "g string, v string"
        )
        direct = {
            (r["depth_row"], r["bucket"]): r["cnt"]
            for r in frequency_sketch(
                a.unionByName(b), ["g"], "v", width=64, depth=4
            ).collect()
        }
        merged = {
            (r["depth_row"], r["bucket"]): r["cnt"]
            for r in merge_frequency_sketches(
                frequency_sketch(a, ["g"], "v", width=64, depth=4).unionByName(
                    frequency_sketch(b, ["g"], "v", width=64, depth=4)
                ),
                ["g"],
            ).collect()
        }
        assert merged == direct

    def test_portable_and_fast_paths_both_work(self, spark):
        """The portable (md5) path exists so an external engine can
        replay bucket assignment; both paths satisfy the exactness
        contract at collision-free width. Empty probe list returns an
        empty frame; bad config raises."""
        import pytest as _pytest

        from data_pipelines_spark.operators.sketches import (
            frequency_estimate,
            frequency_sketch,
        )

        df = spark.createDataFrame(
            [("d", "x")] * 4 + [("d", "y")], "day string, v string"
        )
        for portable in (False, True):
            sk = frequency_sketch(
                df, ["day"], "v", width=2048, depth=3, portable=portable
            )
            est = {
                r["value"]: r["est_cnt"]
                for r in frequency_estimate(
                    sk, ["day"], ["x", "y"], width=2048, depth=3,
                    portable=portable,
                ).collect()
            }
            assert est == {"x": 4, "y": 1}, portable
        assert frequency_estimate(
            frequency_sketch(df, [], "v"), [], []
        ).count() == 0
        with _pytest.raises(ValueError, match="width"):
            frequency_sketch(df, [], "v", width=0)

    def test_global_grain(self, spark):
        from data_pipelines_spark.operators.sketches import (
            frequency_estimate,
            frequency_sketch,
        )

        df = spark.createDataFrame(
            [("a",), ("a",), ("b",)], "v string"
        )
        sk = frequency_sketch(df, [], "v", width=1024, depth=4)
        est = {
            r["value"]: r["est_cnt"]
            for r in frequency_estimate(
                sk, [], ["a", "b", "c"], width=1024, depth=4
            ).collect()
        }
        assert est == {"a": 2, "b": 1, "c": 0}


class TestTopkStore:
    def _brute(self, rows):
        import collections

        c = collections.Counter(k for _b, k in rows)
        return c

    def test_bounds_hold_and_heavy_hitter_found(self, spark):
        """Every emitted key's true count lies in [est_min, est_min +
        max_err], and a key holding > N/(k+1) of the stream is always
        present (the Misra-Gries guarantee)."""
        import numpy as np

        from data_pipelines_spark.operators.sketches import (
            merge_topk_sketches,
            topk_sketch,
        )

        rng = np.random.default_rng(31)
        rows = [(int(b), f"k{int(x)}")
                for b, x in zip(rng.integers(0, 5, 3000),
                                rng.integers(0, 60, 3000))]
        rows += [(b, "HOT") for b in range(5) for _ in range(300)]  # 1500 hits
        df = spark.createDataFrame(rows, "batch long, key string")
        store = topk_sketch(df, "key", k=8, batch_col="batch")
        merged = {r.key: (r.est_min, r.max_err)
                  for r in merge_topk_sketches(store, 8).collect()}
        truth = self._brute(rows)
        assert "HOT" in merged
        for key, (lo, err) in merged.items():
            assert lo <= truth[key] <= lo + err, (key, lo, err, truth[key])

    def test_store_state_is_k_rows_per_batch(self, spark):
        from data_pipelines_spark.operators.sketches import topk_sketch

        rows = [(0, f"k{i % 30}") for i in range(500)] + [
            (1, f"k{i % 7}") for i in range(100)
        ]
        df = spark.createDataFrame(rows, "batch long, key string")
        store = topk_sketch(df, "key", k=5, batch_col="batch")
        per_batch = {r.batch: r.n for r in
                     store.groupBy("batch").agg(
                         __import__("pyspark.sql.functions",
                                    fromlist=["count"]).count("*").alias("n")
                     ).collect()}
        assert all(n <= 5 for n in per_batch.values())

    def test_exact_when_under_k(self, spark):
        """With fewer distinct keys than k the store is exact: zero
        decrements, est_min == true count, max_err == 0."""
        from data_pipelines_spark.operators.sketches import (
            merge_topk_sketches,
            topk_sketch,
        )

        rows = [(b, k) for b in range(3) for k in ("a", "a", "b")]
        df = spark.createDataFrame(rows, "batch long, key string")
        merged = {r.key: (r.est_min, r.max_err, r.rank)
                  for r in merge_topk_sketches(
                      topk_sketch(df, "key", 10, "batch"), 10
                  ).collect()}
        assert merged == {"a": (6, 0, 1), "b": (3, 0, 2)}

    def test_validates_k(self, spark):
        import pytest as _pytest

        from data_pipelines_spark.operators.sketches import topk_sketch

        df = spark.createDataFrame([(0, "a")], "batch long, key string")
        with _pytest.raises(ValueError, match="k must be"):
            topk_sketch(df, "key", 0, "batch")


class TestQuantileSketch:
    """DDSketch long-form store (quantile_sketch /
    merge_quantile_sketches / quantile_sketch_values): the relative-
    error guarantee, bitwise merge exactness, sign handling, weights,
    and partition invariance."""

    def _df(self, spark, n=4000, seed=7):
        import numpy as np

        rng = np.random.default_rng(seed)
        vals = np.concatenate([
            np.exp(rng.normal(3, 2, n)),        # long-tailed positives
            -np.exp(rng.normal(1, 1, n // 4)),  # negatives
            np.zeros(50),
        ])
        rows = [(int(i % 3), float(v)) for i, v in enumerate(vals)]
        return (
            spark.createDataFrame(rows, "g int, v double"),
            vals,
        )

    def test_relative_error_guarantee(self, spark):
        """Every read-back quantile lands within relative alpha of the
        ceil-rank order statistic — the DDSketch paper's contract —
        across groups, both signs, and five quantile levels."""
        import numpy as np

        from data_pipelines_spark.operators.sketches import (
            quantile_sketch,
            quantile_sketch_values,
        )

        df, vals = self._df(spark)
        alpha = 0.01
        store = quantile_sketch(df, ["g"], "v", alpha=alpha)
        qs = [0.01, 0.25, 0.5, 0.75, 0.99]
        est = {
            (r["g"], r["q"]): r["value"]
            for r in quantile_sketch_values(store, ["g"], qs, alpha).collect()
        }
        for g in range(3):
            gv = np.sort(vals[np.arange(len(vals)) % 3 == g])
            for q in qs:
                k = max(1, int(np.ceil(q * len(gv))))
                true = gv[k - 1]
                e = est[(g, q)]
                tol = alpha * 1.001  # boundary-bucket slack
                if true == 0:
                    assert e == 0.0
                else:
                    assert abs(e - true) / abs(true) <= tol, (g, q, true, e)

    def test_merge_bitwise_exact(self, spark):
        """merge(store(A), store(B)) == store(A ∪ B) as exact row sets
        — the property that lets daily rows roll up losslessly."""
        from data_pipelines_spark.operators.sketches import (
            merge_quantile_sketches,
            quantile_sketch,
        )

        df, _ = self._df(spark)
        direct = quantile_sketch(df, [], "v", alpha=0.02)
        h0 = quantile_sketch(
            df.where(F.pmod(F.hash("v"), 2) == 0), [], "v", alpha=0.02
        )
        h1 = quantile_sketch(
            df.where(F.pmod(F.hash("v"), 2) != 0), [], "v", alpha=0.02
        )
        merged = merge_quantile_sketches(h0.unionByName(h1), [])
        assert merged.exceptAll(direct).count() == 0
        assert direct.exceptAll(merged).count() == 0

    def test_signs_zeros_and_fixed_quantiles(self, spark):
        """Known tiny input: [-100, -1, 0, 0, 1, 100]. The median
        (rank 3 of 6) is an exact zero → estimate exactly 0.0; the
        extremes respect sign and relative error."""
        from data_pipelines_spark.operators.sketches import (
            quantile_sketch,
            quantile_sketch_values,
        )

        df = spark.createDataFrame(
            [(v,) for v in [-100.0, -1.0, 0.0, 0.0, 1.0, 100.0]], "v double"
        )
        alpha = 0.01
        store = quantile_sketch(df, [], "v", alpha=alpha)
        got = {
            r["q"]: r["value"]
            for r in quantile_sketch_values(
                store, [], [1 / 6, 0.5, 1.0], alpha
            ).collect()
        }
        assert got[0.5] == 0.0
        assert abs(got[1 / 6] + 100.0) <= 100.0 * alpha * 1.001
        assert abs(got[1.0] - 100.0) <= 100.0 * alpha * 1.001

    def test_nan_null_dropped_store_grain(self, spark):
        from data_pipelines_spark.operators.sketches import quantile_sketch

        df = spark.createDataFrame(
            [(1.0,), (float("nan"),), (None,), (1.0,)], "v double"
        )
        rows = quantile_sketch(df, [], "v", alpha=0.01).collect()
        assert len(rows) == 1
        assert rows[0]["cnt"] == 2 and rows[0]["side"] == 1

    def test_weighted_equals_repeated_rows(self, spark):
        """Weight k must equal the row repeated k times, bitwise on
        the store rows (the weighting definition, same contract as the
        histogram store)."""
        from data_pipelines_spark.operators.sketches import quantile_sketch

        df = spark.createDataFrame(
            [(2.5, 3), (7.0, 0), (2.5, 1), (0.0, 2)], "v double, w int"
        )
        exploded = df.selectExpr("explode(array_repeat(v, w)) AS v")
        ws = quantile_sketch(df, [], "v", alpha=0.01, weight_col="w")
        es = quantile_sketch(exploded, [], "v", alpha=0.01)
        assert ws.exceptAll(es).count() == 0
        assert es.exceptAll(ws).count() == 0

    def test_weight_guard_raises_on_fractional(self, spark):
        import pytest

        from data_pipelines_spark.operators.sketches import quantile_sketch

        df = spark.createDataFrame([(1.0, -0.5)], "v double, w double")
        with pytest.raises(Exception, match="non-negative integer"):
            quantile_sketch(df, [], "v", weight_col="w").collect()

    def test_param_validation(self, spark):
        import pytest

        from data_pipelines_spark.operators.sketches import (
            quantile_sketch,
            quantile_sketch_values,
        )

        df = spark.createDataFrame([(1.0,)], "v double")
        with pytest.raises(ValueError, match="alpha"):
            quantile_sketch(df, [], "v", alpha=1.5)
        store = quantile_sketch(df, [], "v")
        with pytest.raises(ValueError, match="quantile out"):
            quantile_sketch_values(store, [], [1.5], 0.01)

    def test_partition_invariance_and_empty(self, spark):
        from data_pipelines_spark.operators.sketches import quantile_sketch

        df, _ = self._df(spark, n=500)
        a = quantile_sketch(df.repartition(1), ["g"], "v", alpha=0.05)
        b = quantile_sketch(df.repartition(13, "v"), ["g"], "v", alpha=0.05)
        assert a.exceptAll(b).count() == 0
        assert b.exceptAll(a).count() == 0
        empty = quantile_sketch(df.where("v > 1e18"), ["g"], "v")
        assert empty.count() == 0


class TestQuantileSketchDrift:
    """PSI over DDSketch stores: zero on identical data, monotone with
    shift, one-sided groups NULL, partition-invariant sums."""

    def _store(self, spark, mean, n=2000, seed=3, g="a"):
        import numpy as np

        from data_pipelines_spark.operators.sketches import quantile_sketch

        rng = np.random.default_rng(seed)
        vals = np.exp(rng.normal(mean, 0.8, n))
        df = spark.createDataFrame(
            [(g, float(v)) for v in vals], "g string, v double"
        )
        return quantile_sketch(df, ["g"], "v", alpha=0.05)

    def test_zero_on_identical_and_monotone_with_shift(self, spark):
        from data_pipelines_spark.operators.sketches import (
            quantile_sketch_drift,
        )

        base = self._store(spark, 2.0)
        same = quantile_sketch_drift(base, base, ["g"]).collect()[0]
        assert same["psi"] == 0.0
        assert same["n_baseline"] == same["n_current"] == 2000
        small = quantile_sketch_drift(
            base, self._store(spark, 2.2, seed=4), ["g"]
        ).collect()[0]["psi"]
        big = quantile_sketch_drift(
            base, self._store(spark, 4.0, seed=4), ["g"]
        ).collect()[0]["psi"]
        assert 0.0 < small < big
        assert big > 0.25  # "shifted" by the standard thresholds

    def test_one_sided_group_null(self, spark):
        from data_pipelines_spark.operators.sketches import (
            quantile_sketch_drift,
        )

        base = self._store(spark, 2.0, g="only_base")
        cur = self._store(spark, 2.0, g="only_cur")
        rows = {
            r["g"]: r for r in quantile_sketch_drift(base, cur, ["g"]).collect()
        }
        assert rows["only_base"]["psi"] is None
        assert rows["only_base"]["n_current"] == 0
        assert rows["only_cur"]["psi"] is None
        assert rows["only_cur"]["n_baseline"] == 0

    def test_partition_invariance(self, spark):
        from data_pipelines_spark.operators.sketches import (
            quantile_sketch_drift,
        )

        base = self._store(spark, 2.0)
        cur = self._store(spark, 2.5, seed=9)
        a = quantile_sketch_drift(
            base.repartition(1), cur.repartition(1), ["g"]
        ).collect()[0]["psi"]
        bb = quantile_sketch_drift(
            base.repartition(11), cur.repartition(7), ["g"]
        ).collect()[0]["psi"]
        assert a == bb
