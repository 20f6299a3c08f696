#!/usr/bin/env python
"""A/B probe (r15, VERDICT item 9): per-left top-k in knn_join /
knn_join_ivf — row_number window (current) vs collect_list+array_sort
aggregate (the exact_knn_join form).

Both formulations produce identical rows for NaN-free inputs (cosine
over finite non-zero vectors is always finite; NULL scores are filtered
before ranking in both). The probe times each form interleaved over a
synthetic corpus big enough that the rank tier dominates, and checks
the outputs are row-identical before trusting any timing.

Usage: python examples/probe_r15_knn_rank_ab.py [n_left n_right reps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from data_pipelines_spark.operators import similarity as S  # noqa: E402
from data_pipelines_spark.session import get_spark  # noqa: E402

DIM = 64
K = 10
NUM_PLANES = 4


def synth(spark, n: int, seed: int) -> DataFrame:
    # Deterministic pseudo-random embeddings: element j of row i is a
    # hash-derived double in [-1, 1). No rand() — reruns and retries
    # reproduce the same vectors.
    return spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(DIM - 1)),
            lambda j: (
                F.pmod(F.xxhash64(F.col("id"), j, F.lit(seed)), F.lit(2_000_000))
                - 1_000_000
            ).cast("double")
            / 1_000_000.0,
        ).alias("embedding"),
    )


def knn_join_agg(left, right, k, dim, num_planes, seed=42):
    """knn_join with the rank tier as collect_list+array_sort+slice."""
    planes = S.random_hyperplanes(dim, num_planes, seed)
    lvec = S._to_double(F.col("embedding"))
    rvec = S._to_double(F.col("embedding"))
    l = left.select(
        F.col("vec_id").alias("__lid"),
        lvec.alias("__lvec"),
        S.plane_signature(lvec, planes).alias("__bucket"),
    )
    r = right.select(
        F.col("vec_id").alias("__rid"),
        rvec.alias("__rvec"),
        S.plane_signature(rvec, planes).alias("__bucket"),
    )
    pairs = l.join(r, "__bucket").where(F.col("__lid") != F.col("__rid"))
    scored = pairs.withColumn(
        "__score", S.cosine(F.col("__lvec"), F.col("__rvec"))
    ).where(F.col("__score").isNotNull())
    cand = F.struct(
        (-F.col("__score")).alias("neg"),
        F.col("__rid").alias("rid"),
        F.col("__score").alias("score"),
    )
    topk = scored.groupBy("__lid").agg(
        F.slice(F.array_sort(F.collect_list(cand)), 1, k).alias("__topk")
    )
    return (
        topk.select("__lid", F.posexplode("__topk").alias("__pos", "__c"))
        .select(
            F.col("__lid").alias("left_vec_id"),
            F.col("__c.rid").alias("right_vec_id"),
            F.round(F.col("__c.score"), 6).alias("cosine"),
            (F.col("__pos") + 1).cast("long").alias("rank"),
        )
    )


def main() -> None:
    n_left = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    n_right = int(sys.argv[2]) if len(sys.argv) > 2 else 100_000
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    spark = get_spark(app_name="knn-rank-ab-r15")
    spark.sparkContext.setLogLevel("ERROR")

    left = synth(spark, n_left, 1).persist()
    right = synth(spark, n_right, 2).persist()
    left.count(), right.count()

    def window_form():
        return S.knn_join(left, right, k=K, dim=DIM, num_planes=NUM_PLANES)

    def agg_form():
        return knn_join_agg(left, right, K, DIM, NUM_PLANES)

    # Equivalence first: identical row sets (order-free).
    a = {tuple(r) for r in window_form().collect()}
    b = {tuple(r) for r in agg_form().collect()}
    assert a == b, f"outputs differ: {len(a)} vs {len(b)} rows, e.g. {list(a - b)[:3]} / {list(b - a)[:3]}"
    print(f"equivalence OK: {len(a)} rows identical")

    def timed(df) -> float:
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    results: dict[str, list[float]] = {"window": [], "agg": []}
    for rep in range(reps):
        for name, fn in (("window", window_form), ("agg", agg_form)):
            spark.sparkContext.setJobDescription(f"knn-rank {name} rep{rep}")
            results[name].append(timed(fn()))
    for name, ts in results.items():
        print(f"{name}: min={min(ts):.3f}s runs={[round(t, 3) for t in ts]}")
    spark.stop()


if __name__ == "__main__":
    main()
