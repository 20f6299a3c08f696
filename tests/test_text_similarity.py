"""Text-function and similarity-search tests."""

from __future__ import annotations

import math

import numpy as np
import pytest

from pyspark.sql import functions as F

from data_pipelines_spark.functions.text import (
    lang_guess,
    quality_score,
    rolling_fingerprint,
    token_count,
)
from data_pipelines_spark.operators.similarity import (
    brute_force_topk,
    embedding_near_duplicates,
    lsh_bucketed_topk,
)


def test_token_count_and_empty(spark):
    df = spark.createDataFrame(
        [(0, "a b  c"), (1, ""), (2, "   "), (3, "single")],
        "id long, text string",
    )
    out = {r["id"]: r["n"] for r in df.select("id", token_count(F.col("text")).alias("n")).collect()}
    assert out == {0: 3, 1: 0, 2: 0, 3: 1}


def test_rolling_fingerprint_matches_python(spark):
    text = "hello world"
    expected = 0
    for ch in text:
        expected = (expected * 31 + ord(ch)) % 2_147_483_647
    df = spark.createDataFrame([(text,)], "text string")
    got = df.select(rolling_fingerprint(F.col("text")).alias("f")).collect()[0]["f"]
    assert got == expected


def test_lang_guess(spark):
    df = spark.createDataFrame(
        [
            (0, "the cat and the dog run to the house with a ball"),
            (1, "der hund und die katze sind nicht mit der maus"),
            (2, "le chat et le chien sont dans la maison pour que"),
            (3, "xyzzy qwerty zzz"),
        ],
        "id long, text string",
    )
    out = {r["id"]: r["g"] for r in df.select("id", lang_guess(F.col("text")).alias("g")).collect()}
    assert out[0] == "en" and out[1] == "de" and out[2] == "fr" and out[3] == "und"


def test_quality_score_range(spark):
    df = spark.createDataFrame(
        [(0, "a good long sentence with reasonable words here"), (1, "")],
        "id long, text string",
    )
    out = {r["id"]: r["q"] for r in df.select("id", quality_score(F.col("text")).alias("q")).collect()}
    assert 0.0 <= out[0] <= 1.0
    assert 0.0 <= out[1] <= 1.0


def _emb_df(spark, n=40, dim=8, seed=7):
    rng = np.random.default_rng(seed)
    vecs = rng.standard_normal((n, dim)).astype("float32")
    rows = [(i, [float(x) for x in vecs[i]]) for i in range(n)]
    return (
        spark.createDataFrame(rows, "vec_id long, embedding array<float>"),
        vecs,
    )


def test_brute_force_topk_matches_numpy(spark):
    df, vecs = _emb_df(spark)
    q = vecs[0].astype("float64")
    others = vecs[1:].astype("float64")
    cos = (others @ q) / (np.linalg.norm(others, axis=1) * np.linalg.norm(q))
    expected = [i + 1 for i in np.argsort(-cos)[:5]]

    query = df.where(F.col("vec_id") == 0).select(F.col("embedding").alias("qvec"))
    got = brute_force_topk(df.where(F.col("vec_id") != 0), query, k=5).collect()
    assert [r["vec_id"] for r in got] == expected
    # cosine values agree with numpy to rounding precision
    for r, i in zip(got, expected):
        assert math.isclose(r["cosine"], cos[i - 1], abs_tol=1e-5)


def test_lsh_topk_returns_bucket_subset(spark):
    df, _ = _emb_df(spark)
    query = df.where(F.col("vec_id") == 0).select(F.col("embedding").alias("qvec"))
    exact = {r["vec_id"]: r["cosine"] for r in
             brute_force_topk(df.where(F.col("vec_id") != 0), query, k=39).collect()}
    approx = lsh_bucketed_topk(
        df.where(F.col("vec_id") != 0), query, dim=8, k=5, num_planes=2
    ).collect()
    assert 0 < len(approx) <= 5
    for r in approx:
        assert math.isclose(r["cosine"], exact[r["vec_id"]], abs_tol=1e-9)


def test_embedding_near_duplicates_finds_clone(spark):
    df, vecs = _emb_df(spark)
    clone = [float(x) for x in vecs[5]]
    df2 = df.union(
        df.sparkSession.createDataFrame([(999, clone)], "vec_id long, embedding array<float>")
    )
    pairs = embedding_near_duplicates(df2, dim=8, threshold=0.999, num_planes=4)
    got = {(r["vec_a"], r["vec_b"]) for r in pairs.collect()}
    assert (5, 999) in got


def test_ivf_index_recovers_blob_neighbors(spark):
    """3 well-separated blobs: k-means recovers the structure and IVF
    search with nprobe=1 returns the same top-k as brute force for an
    in-blob query."""
    from data_pipelines_spark.operators.similarity import (
        ivf_assign,
        ivf_topk,
        kmeans_centroids,
    )

    rng = np.random.default_rng(3)
    centers = np.array([[10.0] * 4, [-10.0] * 4, [10.0, -10.0, 10.0, -10.0]])
    vecs = np.concatenate(
        [c + 0.5 * rng.standard_normal((20, 4)) for c in centers]
    ).astype("float32")
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(60)],
        "vec_id long, embedding array<float>",
    )
    cents = kmeans_centroids(df, k=3, max_iterations=8)
    indexed = ivf_assign(df, cents)
    # every blob maps to exactly one cluster
    sizes = sorted(
        r["count"] for r in indexed.groupBy("cluster").count().collect()
    )
    assert sizes == [20, 20, 20]

    query = df.where(F.col("vec_id") == 5).select(F.col("embedding").alias("qvec"))
    approx = ivf_topk(indexed.where(F.col("vec_id") != 5), query, cents,
                      k=5, nprobe=1)
    exact = brute_force_topk(df.where(F.col("vec_id") != 5), query, k=5)
    assert [r["vec_id"] for r in approx.collect()] == [
        r["vec_id"] for r in exact.collect()
    ]


def test_chunk_text_udtf(spark):
    """Python UDTF: document → overlapping training chunks via LATERAL."""
    from data_pipelines_spark.functions.udtf import register_udtfs

    register_udtfs(spark)
    spark.createDataFrame(
        [(1, "abcdefghij"), (2, "")], "doc_id long, text string"
    ).createOrReplaceTempView("chunk_docs")
    rows = spark.sql(
        "SELECT d.doc_id, c.chunk_no, c.start, c.chunk "
        "FROM chunk_docs d, LATERAL chunk_text(text, 4, 1) c"
    ).collect()
    got = sorted((r["doc_id"], r["chunk_no"], r["start"], r["chunk"]) for r in rows)
    assert got == [
        (1, 0, 0, "abcd"), (1, 1, 3, "defg"), (1, 2, 6, "ghij"), (1, 3, 9, "j"),
    ]  # empty doc yields nothing


def test_kmeans_fit_matches_pinned_oracle_model(spark):
    """The IVF oracle (suite/llmdata.py) pins the sf0.01 k-means fit as
    SQL literals; the driver re-fits live, so a refit here must
    reproduce the pinned model exactly (quantized means make the fit
    partitioning-independent)."""
    from data_pipelines_spark.operators.similarity import kmeans_centroids
    from data_pipelines_spark.sources.tables import load_table
    from data_pipelines_spark.suite.llmdata import _IVF_CENTROIDS_SF001

    emb = load_table(spark, "/root/testdata/sf0.01", "embeddings")
    assert kmeans_centroids(emb, k=8, max_iterations=5) == _IVF_CENTROIDS_SF001


def test_int8_quantization_roundtrip_and_cosine_error(spark):
    from data_pipelines_spark.operators.similarity import (
        brute_force_topk,
        cosine,
        dequantize_int8,
        quantize_int8,
    )

    df, vecs = _emb_df(spark, n=60, dim=16)
    q = quantize_int8(df)
    assert dict(q.dtypes)["embedding_q"] == "array<tinyint>"

    # codes stay in [-127, 127]; the max-abs component hits exactly +-127
    rng = q.select(
        F.array_max(F.transform("embedding_q", lambda x: F.abs(x))).alias("m")
    ).agg(F.min("m"), F.max("m")).first()
    assert rng[0] == 127 and rng[1] == 127

    # round-trip error bounded by scale/2 per component
    rt = dequantize_int8(q)
    joined = df.select("vec_id", F.col("embedding").alias("orig")).join(
        rt.select("vec_id", F.col("embedding").alias("back")), "vec_id"
    )
    max_err = joined.select(
        F.array_max(
            F.zip_with("orig", "back", lambda a, b: F.abs(a.cast("double") - b))
        ).alias("e")
    ).agg(F.max("e")).first()[0]
    # scale = max_abs/127 and vectors are N(0,1): components < ~5 abs
    assert max_err < 5.0 / 127.0 / 2.0 + 1e-6

    # cosine on the quantized codes (scale cancels) ~ cosine on floats
    pairs = (
        df.alias("a").crossJoin(df.alias("b"))
        .where(F.col("a.vec_id") < F.col("b.vec_id"))
        .limit(200)
        .select(
            cosine(
                F.transform("a.embedding", lambda x: x.cast("double")),
                F.transform("b.embedding", lambda x: x.cast("double")),
            ).alias("exact"),
            F.col("a.vec_id").alias("ia"), F.col("b.vec_id").alias("ib"),
        )
    )
    qq = q.select("vec_id", "embedding_q")
    approx = (
        pairs.join(qq.select(F.col("vec_id").alias("ia"),
                             F.col("embedding_q").alias("qa")), "ia")
        .join(qq.select(F.col("vec_id").alias("ib"),
                        F.col("embedding_q").alias("qb")), "ib")
        .select(
            "exact",
            cosine(
                F.transform("qa", lambda x: x.cast("double")),
                F.transform("qb", lambda x: x.cast("double")),
            ).alias("approx"),
        )
    )
    worst = approx.select(F.max(F.abs(F.col("exact") - F.col("approx"))).alias("d")
                          ).first()["d"]
    assert worst < 0.02

    # and top-k over dequantized vectors recovers the exact top-k head
    query = df.sparkSession.createDataFrame(
        [([float(x) for x in vecs[0]],)], "qvec array<float>"
    )
    exact_top = [r["vec_id"] for r in brute_force_topk(df, query, k=5).collect()]
    quant_top = [r["vec_id"] for r in brute_force_topk(rt, query, k=5).collect()]
    assert exact_top[0] == quant_top[0] == 0
    assert len(set(exact_top) & set(quant_top)) >= 4


def test_semantic_dedup_keeps_min_id_representative(spark):
    from data_pipelines_spark.operators.similarity import semantic_dedup

    # two tight semantic groups around opposite corners + one singleton;
    # centroids placed so each group lands in its own cluster
    rows = [
        (1, [1.0, 0.0, 0.0]),
        (2, [0.999, 0.01, 0.0]),     # near-clone of 1
        (5, [0.99, 0.02, 0.01]),     # near-clone of 1 too
        (3, [0.0, 1.0, 0.0]),
        (4, [0.0, 0.999, 0.02]),     # near-clone of 3
        (9, [0.0, 0.0, 1.0]),        # singleton
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    cents = [[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]]
    out = {
        r["vec_id"]: (r["cluster"], r["dup_of"], r["keep"])
        for r in semantic_dedup(emb, cents, threshold=0.95).collect()
    }
    assert out[1] == (0, None, True)     # min id in its group survives
    assert out[2] == (0, 1, False)
    assert out[5] == (0, 1, False)       # dup_of is the MIN neighbor, not any
    assert out[3] == (1, None, True)
    assert out[4] == (1, 3, False)
    assert out[9] == (2, None, True)     # singleton untouched
    # cross-cluster near-misses are never compared: vec 1 vs vec 3 have
    # cosine 0 < threshold anyway, but the join itself is cluster-local


def test_kmeans_fit_reads_source_once_and_unpersists(spark):
    """The Lloyd loop must persist the projected vectors: the whole fit
    (init + max_iterations assignment/recompute actions) reads the
    parquet source about once, not once per iteration. Measured end to
    end via Hadoop FileSystem byte counters ('file' scheme — local[*]
    executors share the JVM), which a per-iteration re-scan would
    multiply by ~max_iterations. Cache is released on exit."""
    import os

    from data_pipelines_spark.operators.similarity import kmeans_centroids
    from data_pipelines_spark.sources.tables import load_table

    sf_dir = "/root/testdata/sf0.001"
    emb = load_table(spark, sf_dir, "embeddings")
    parquet_bytes = sum(
        os.path.getsize(os.path.join(root, f))
        for root, _, files in os.walk(os.path.join(sf_dir, "embeddings.parquet"))
        for f in files
        if f.endswith(".parquet")
    ) or os.path.getsize(os.path.join(sf_dir, "embeddings.parquet"))

    def bytes_read():
        total = 0
        for s in spark._jvm.org.apache.hadoop.fs.FileSystem.getAllStatistics():
            if s.getScheme() == "file":
                total += s.getBytesRead()
        return total

    def cached_count():
        return len(list(spark.sparkContext._jsc.sc().getRDDStorageInfo()))

    before_bytes, before_cached = bytes_read(), cached_count()
    kmeans_centroids(emb, k=4, max_iterations=5)
    delta = bytes_read() - before_bytes
    assert delta > 0  # the counter is live
    # one materializing scan (+ footer/metadata overhead) — five
    # re-scans would put this at ~5x the file size
    assert delta < 2.5 * parquet_bytes, (delta, parquet_bytes)
    # the fit's own cache is released (compare against the pre-existing
    # count: earlier suite queries hold session-scoped caches by design)
    assert cached_count() <= before_cached


def test_cosine_zero_norm_vector_is_null_not_crash(spark):
    """A zero-norm embedding (deleted/padded row) must score NULL —
    under ANSI the bare division aborts the whole query, and with ANSI
    off the NaN would rank ABOVE every real match in a descending
    top-k."""
    from pyspark.sql import functions as F

    from data_pipelines_spark.operators.similarity import brute_force_topk, cosine

    emb = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 0.0]), (3, [0.6, 0.8])],
        "vec_id long, embedding array<double>",
    )
    q = spark.createDataFrame([([1.0, 0.0],)], "qvec array<double>")
    top = [(r["vec_id"], r["cosine"]) for r in brute_force_topk(emb, q, k=2).collect()]
    assert [t[0] for t in top] == [1, 3]       # zero vector never wins
    scored = emb.select(
        "vec_id", cosine(F.col("embedding"), F.lit([0.0, 0.0]).cast("array<double>")).alias("c")
    )
    assert all(r["c"] is None for r in scored.collect())


def test_chunk_text_rejects_lossy_parameters(spark):
    """size<=0 degenerates to empty chunks; negative overlap silently
    skips characters between windows — both must fail loudly."""
    from data_pipelines_spark.functions.udtf import register_udtfs

    register_udtfs(spark)
    for size, overlap in ((0, 0), (4, -2), (4, 4)):
        with pytest.raises(Exception, match="overlap"):
            spark.sql(
                f"SELECT * FROM chunk_text('abcdefgh', {size}, {overlap})"
            ).collect()


class TestKnnJoin:
    def _emb(self, spark, n, dim=16, seed=3, id_offset=0):
        import numpy as np

        rng = np.random.default_rng(seed)
        vecs = rng.normal(size=(n, dim)).astype(float)
        rows = [(i + id_offset, [float(x) for x in vecs[i]]) for i in range(n)]
        return (
            spark.createDataFrame(rows, "vec_id long, embedding array<double>"),
            vecs,
        )

    def _numpy_reference(self, lvecs, rvecs, loff, roff, k, num_planes, seed,
                         probe=0, dim=16):
        import numpy as np

        from data_pipelines_spark.operators.similarity import (
            random_hyperplanes,
        )

        planes = random_hyperplanes(dim, num_planes, seed)

        def sig(v):
            return sum((1 << i) for i, p in enumerate(planes) if float(v @ p) >= 0)

        rsig = {j + roff: sig(rvecs[j]) for j in range(len(rvecs))}
        want = {}
        for i in range(len(lvecs)):
            s = sig(lvecs[i])
            buckets = {s} | (
                {s ^ (1 << b) for b in range(num_planes)} if probe else set()
            )
            cands = []
            for j, rs in rsig.items():
                if rs in buckets and j != i + loff:
                    v = rvecs[j - roff]
                    c = float(lvecs[i] @ v) / (
                        float(np.linalg.norm(lvecs[i])) * float(np.linalg.norm(v))
                    )
                    cands.append((-c, j))
            cands.sort()
            want[i + loff] = [j for _, j in cands[:k]]
        return want

    def test_matches_numpy_reference(self, spark):
        from data_pipelines_spark.operators.similarity import knn_join

        left, lv = self._emb(spark, 40, seed=3)
        right, rv = self._emb(spark, 120, seed=4, id_offset=1000)
        for probe in (0, 1):
            got = {}
            out = knn_join(
                left, right, k=3, dim=16, num_planes=4,
                hamming_probe=probe,
            ).collect()
            for r in sorted(out, key=lambda r: (r["left_vec_id"], r["rank"])):
                got.setdefault(r["left_vec_id"], []).append(r["right_vec_id"])
            want = self._numpy_reference(lv, rv, 0, 1000, 3, 4, 42, probe)
            want = {i: js for i, js in want.items() if js}
            assert got == want, f"probe={probe}"

    def test_multiprobe_recall_not_lower(self, spark):
        from data_pipelines_spark.operators.similarity import knn_join

        left, _ = self._emb(spark, 30, seed=5)
        right, _ = self._emb(spark, 200, seed=6, id_offset=500)
        base = knn_join(left, right, k=5, dim=16, num_planes=6).count()
        probed = knn_join(
            left, right, k=5, dim=16, num_planes=6, hamming_probe=1
        ).count()
        assert probed >= base

    def test_self_join_excludes_identity_and_null_vec(self, spark):
        from data_pipelines_spark.operators.similarity import knn_join

        df, _ = self._emb(spark, 25, seed=7)
        df = df.unionByName(
            df.sparkSession.createDataFrame(
                [(99, None), (98, [0.0] * 16)],
                "vec_id long, embedding array<double>",
            )
        )
        out = knn_join(df, df, k=4, dim=16, num_planes=3).collect()
        assert all(r["left_vec_id"] != r["right_vec_id"] for r in out)
        ids = {r["right_vec_id"] for r in out} | {r["left_vec_id"] for r in out}
        assert 99 not in ids and 98 not in ids  # NULL + zero-norm dropped

    def test_rank_and_determinism(self, spark):
        from data_pipelines_spark.operators.similarity import knn_join

        left, _ = self._emb(spark, 20, seed=8)
        right, _ = self._emb(spark, 80, seed=9, id_offset=100)
        a = sorted(map(tuple, knn_join(left, right, k=3, dim=16).collect()))
        b = sorted(
            map(
                tuple,
                knn_join(
                    left.repartition(7), right.repartition(5), k=3, dim=16
                ).collect(),
            )
        )
        assert a == b
        for r in a:
            assert 1 <= r[3] <= 3

    def test_guards(self, spark):
        import pytest as _pytest

        from data_pipelines_spark.operators.similarity import knn_join

        df, _ = self._emb(spark, 5)
        with _pytest.raises(ValueError, match="k must"):
            knn_join(df, df, k=0, dim=16)
        with _pytest.raises(ValueError, match="hamming"):
            knn_join(df, df, k=1, dim=16, hamming_probe=2)


class TestKnnJoinIvf:
    def _emb(self, spark, n, dim=8, seed=3, id_offset=0):
        import numpy as np

        rng = np.random.default_rng(seed)
        # clustered data so IVF lists are meaningful
        centers = rng.normal(size=(4, dim)) * 5
        vecs = (
            centers[rng.integers(0, 4, size=n)]
            + rng.normal(size=(n, dim)) * 0.5
        ).astype(float)
        rows = [(i + id_offset, [float(x) for x in vecs[i]]) for i in range(n)]
        return (
            spark.createDataFrame(rows, "vec_id long, embedding array<double>"),
            vecs,
        )

    def _centroids(self, vecs, k=4, seed=0):
        import numpy as np

        rng = np.random.default_rng(seed)
        # tiny deterministic Lloyd fit
        c = vecs[rng.choice(len(vecs), k, replace=False)].copy()
        for _ in range(5):
            d = ((vecs[:, None, :] - c[None, :, :]) ** 2).sum(-1)
            a = d.argmin(1)
            for j in range(k):
                if (a == j).any():
                    c[j] = vecs[a == j].mean(0)
        return [list(map(float, row)) for row in c]

    def _numpy_reference(self, lvecs, rvecs, loff, roff, cents, k, nprobe):
        import numpy as np

        c = np.array(cents)

        def assign(v):
            return int(((v[None, :] - c) ** 2).sum(-1).argmin())

        def probes(v):
            d = ((v[None, :] - c) ** 2).sum(-1)
            order = sorted(range(len(c)), key=lambda i: (d[i], i))
            return set(order[:nprobe])

        rclu = {j + roff: assign(rvecs[j]) for j in range(len(rvecs))}
        want = {}
        for i in range(len(lvecs)):
            pr = probes(lvecs[i])
            cands = []
            for j, cl in rclu.items():
                if cl in pr and j != i + loff:
                    v = rvecs[j - roff]
                    cos = float(lvecs[i] @ v) / (
                        float(np.linalg.norm(lvecs[i])) * float(np.linalg.norm(v))
                    )
                    cands.append((-cos, j))
            cands.sort()
            if cands:
                want[i + loff] = [j for _, j in cands[:k]]
        return want

    def test_matches_numpy_reference(self, spark):
        from data_pipelines_spark.operators.similarity import knn_join_ivf

        left, lv = self._emb(spark, 25, seed=3)
        right, rv = self._emb(spark, 80, seed=4, id_offset=1000)
        cents = self._centroids(rv)
        for nprobe in (1, 2, 4):
            got = {}
            out = knn_join_ivf(
                left, right, cents, k=3, nprobe=nprobe
            ).collect()
            for r in sorted(out, key=lambda r: (r["left_vec_id"], r["rank"])):
                got.setdefault(r["left_vec_id"], []).append(r["right_vec_id"])
            want = self._numpy_reference(lv, rv, 0, 1000, cents, 3, nprobe)
            assert got == want, f"nprobe={nprobe}"

    def test_full_probe_equals_brute_force(self, spark):
        """nprobe == n_lists degrades to exact brute-force top-k."""
        import numpy as np

        from data_pipelines_spark.operators.similarity import knn_join_ivf

        left, lv = self._emb(spark, 10, seed=5)
        right, rv = self._emb(spark, 50, seed=6, id_offset=100)
        cents = self._centroids(rv)
        got = {}
        for r in knn_join_ivf(left, right, cents, k=2, nprobe=4).collect():
            got.setdefault(r["left_vec_id"], []).append(
                (r["rank"], r["right_vec_id"])
            )
        for i in range(len(lv)):
            cos = rv @ lv[i] / (
                np.linalg.norm(rv, axis=1) * np.linalg.norm(lv[i])
            )
            order = sorted(range(len(rv)), key=lambda j: (-cos[j], j + 100))
            want = [(rk + 1, order[rk] + 100) for rk in range(2)]
            assert sorted(got[i]) == want, i

    def test_guards(self, spark):
        import pytest as _pytest

        from data_pipelines_spark.operators.similarity import knn_join_ivf

        df, v = self._emb(spark, 5)
        cents = self._centroids(v)
        with _pytest.raises(ValueError, match="k must"):
            knn_join_ivf(df, df, cents, k=0)
        with _pytest.raises(ValueError, match="nprobe"):
            knn_join_ivf(df, df, cents, k=1, nprobe=9)


# ------------------------------------------------------------ knn classify


class TestKnnClassify:
    def _frames(self, spark):
        # Two tight clusters on orthogonal axes; queries sit near one.
        labeled = spark.createDataFrame(
            [
                (100, [1.0, 0.0, 0.05], 7),
                (101, [1.0, 0.02, 0.0], 7),
                (102, [0.98, 0.0, 0.01], 7),
                (200, [0.0, 1.0, 0.0], 9),
                (201, [0.02, 0.98, 0.0], 9),
            ],
            "vec_id long, embedding array<double>, label int",
        )
        queries = spark.createDataFrame(
            [(1, [0.9, 0.1, 0.0]), (2, [0.05, 0.95, 0.1])],
            "vec_id long, embedding array<double>",
        )
        return queries, labeled

    def test_majority_vote_exact(self, spark):
        from data_pipelines_spark.operators.similarity import knn_classify

        queries, labeled = self._frames(spark)
        out = {r.vec_id: r for r in knn_classify(queries, labeled, k=3).collect()}
        assert out[1].pred_label == 7 and out[1].n_votes == 3
        assert out[2].pred_label == 9 and out[2].n_votes == 2
        # weight is the decimal sum of the winner's rounded cosines
        assert out[2].vote_weight > 1.8

    def test_tie_break_smaller_label_wins(self, spark):
        from data_pipelines_spark.operators.similarity import knn_classify

        # Two labels, one neighbor each at IDENTICAL cosine: votes tie,
        # weights tie, smaller label must win deterministically.
        labeled = spark.createDataFrame(
            [(10, [1.0, 0.0], 5), (11, [0.0, 1.0], 3)],
            "vec_id long, embedding array<double>, label int",
        )
        queries = spark.createDataFrame(
            [(1, [1.0, 1.0])], "vec_id long, embedding array<double>"
        )
        out = knn_classify(queries, labeled, k=2).collect()
        assert len(out) == 1 and out[0].pred_label == 3

    def test_null_and_zero_norm_queries_drop(self, spark):
        from data_pipelines_spark.operators.similarity import knn_classify

        _, labeled = self._frames(spark)
        queries = spark.createDataFrame(
            [(1, [0.0, 0.0, 0.0]), (2, None), (3, [1.0, 0.0, 0.0])],
            "vec_id long, embedding array<double>",
        )
        out = knn_classify(queries, labeled, k=2).collect()
        assert {r.vec_id for r in out} == {3}

    def test_lsh_method_agrees_on_separable_clusters(self, spark):
        from data_pipelines_spark.operators.similarity import knn_classify

        queries, labeled = self._frames(spark)
        exact = {r.vec_id: r.pred_label
                 for r in knn_classify(queries, labeled, k=3).collect()}
        lsh = {r.vec_id: r.pred_label
               for r in knn_classify(
                   queries, labeled, k=3, method="lsh", dim=3,
                   num_planes=2, hamming_probe=1,
               ).collect()}
        for qid, lbl in lsh.items():  # ANN may drop, must not mislabel
            assert exact[qid] == lbl

    def test_exact_join_is_broadcast(self, spark):
        from data_pipelines_spark.operators.similarity import exact_knn_join

        queries, labeled = self._frames(spark)
        plan = exact_knn_join(queries, labeled, 2)._jdf.queryExecution() \
            .executedPlan().toString()
        assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


def test_knn_classify_partition_invariant(spark):
    """Same predictions at 1, 3, and 7 input partitions — the
    collect_list order inside the top-k aggregation must not leak into
    the result (array_sort totalizes it)."""
    import numpy as np

    from data_pipelines_spark.operators.similarity import knn_classify

    rng = np.random.default_rng(11)
    labeled = spark.createDataFrame(
        [(100 + i, [float(x) for x in rng.standard_normal(6)], int(i % 3))
         for i in range(40)],
        "vec_id long, embedding array<double>, label int",
    )
    queries = spark.createDataFrame(
        [(i, [float(x) for x in rng.standard_normal(6)]) for i in range(15)],
        "vec_id long, embedding array<double>",
    )
    ref = None
    for parts in (1, 3, 7):
        got = sorted(
            (r.vec_id, r.pred_label, r.n_votes, r.vote_weight)
            for r in knn_classify(
                queries.repartition(parts), labeled.repartition(parts), k=5
            ).collect()
        )
        if ref is None:
            ref = got
        assert got == ref, f"partitioning changed predictions at {parts}"


def test_recall_at_k_counts_hits_and_dropped_queries(spark):
    from data_pipelines_spark.operators.similarity import recall_at_k

    exact = spark.createDataFrame(
        [(1, 10), (1, 11), (2, 20), (2, 21), (3, 30)],
        "left_vec_id long, right_vec_id long",
    )
    approx = spark.createDataFrame(
        [(1, 10), (1, 99), (2, 20), (2, 21)],  # q3 dropped entirely
        "left_vec_id long, right_vec_id long",
    )
    out = {r.left_vec_id: r for r in recall_at_k(approx, exact).collect()}
    assert out[1].n_exact == 2 and out[1].n_hit == 1 and out[1].recall == 0.5
    assert out[2].recall == 1.0
    assert out[3].n_hit == 0 and out[3].recall == 0.0


def test_recall_at_k_lsh_vs_exact_end_to_end(spark):
    """Raising hamming_probe must not lower measured recall."""
    import numpy as np

    from data_pipelines_spark.operators.similarity import (
        exact_knn_join,
        knn_join,
        recall_at_k,
    )

    rng = np.random.default_rng(5)
    emb = spark.createDataFrame(
        [(i, [float(x) for x in rng.standard_normal(8)]) for i in range(60)],
        "vec_id long, embedding array<double>",
    )
    qs, ref = emb.where("vec_id < 10"), emb.where("vec_id >= 10")
    exact = exact_knn_join(qs, ref, 5)
    means = []
    for probe in (0, 1):
        ann = knn_join(qs, ref, 5, dim=8, num_planes=3, hamming_probe=probe)
        rec = recall_at_k(ann, exact)
        means.append(rec.agg(F.avg("recall")).collect()[0][0])
        assert rec.count() == 10
    assert means[1] >= means[0]


def test_knn_join_ivf_stored_assignments_match_derived(spark, tmp_path):
    """The stored inverted-list path: knn_join_ivf(right_assigned=...)
    must return exactly the derived-assignment result, and a store
    written partitioned by cluster must prune lists at the scan for a
    static cluster filter."""
    from data_pipelines_spark.operators.similarity import (
        ivf_assign,
        kmeans_centroids,
        knn_join_ivf,
    )

    rng = np.random.default_rng(11)
    centers = np.array([[8.0] * 4, [-8.0] * 4, [8.0, -8.0, 8.0, -8.0]])
    vecs = np.concatenate(
        [c + 0.4 * rng.standard_normal((25, 4)) for c in centers]
    )
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(75)],
        "vec_id long, embedding array<double>",
    )
    cents = kmeans_centroids(df, k=3, max_iterations=8)
    queries = df.where(F.col("vec_id") % 7 == 0)

    derived = knn_join_ivf(queries, df, cents, k=4, nprobe=1)

    store = str(tmp_path / "ivf_lists")
    ivf_assign(df, cents).write.partitionBy("cluster").parquet(store)
    stored = spark.read.parquet(store)
    via_store = knn_join_ivf(
        queries, df, cents, k=4, nprobe=1, right_assigned=stored
    )
    assert sorted(map(tuple, via_store.collect())) == sorted(
        map(tuple, derived.collect())
    )

    # Partition pruning: a static list filter reads one cluster dir.
    from data_pipelines_spark.plans.audit import plan_string

    plan = plan_string(stored.where(F.col("cluster") == 1))
    assert "PartitionFilters: [isnotnull(cluster" in plan, plan
