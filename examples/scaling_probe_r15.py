"""Round-15 scaling probe: does the engine actually parallelize when
work dominates overhead?

The driver's r14 scaling block flagged `suspect_cpus_ignored` because
at sf0.1 every headline query is sub-2 s and stage-latency-bound, so
8-core and 32-core runs read the same (+/- noise) even though
`get_spark` honors $SPARK_GRAFT_CPUS (master AND shuffle partitions).
This probe answers the question the driver could not: at sf1-scale
input (10x sf0.1, synthesized deterministically below), the 5 heaviest
headline queries are timed on the SAME code path the bench uses
(noop sink, warm min-of-2 after an untimed warmup), and the committed
low-core vs high-core numbers show whether wall time tracks cores.

Run twice and compare:
    SPARK_GRAFT_CPUS=32 python examples/scaling_probe_r15.py
    SPARK_GRAFT_CPUS=8  python examples/scaling_probe_r15.py
Results are committed in OPTIMIZATION_r15.md (plans/r15/scaling_probe_*.json).

Synthesis (all deterministic, never touches /root/testdata):
- documents: 10 copies, copy i letter-ROTATED by i (bijective shingle
  map — near-dup structure scales exactly 10x, no cross-copy overlap
  beyond natural background; the r10 corpus probe's transform).
- lineitem/part: 10 copies with l_partkey/p_partkey offset by a copy
  stride (10x flood cells, identical per-cell ensemble shape) and
  l_orderkey offset likewise.
- events: 10 copies with user_id/event_id offset (10x keys, identical
  per-key stream shape).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from data_pipelines_spark.session import get_spark  # noqa: E402
from data_pipelines_spark.sources.tables import load_events, load_table  # noqa: E402
from data_pipelines_spark.suite import queries as suite_queries  # noqa: E402

SF01 = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = os.environ.get("SPARK_GRAFT_PROBE_DIR", "/tmp/scaling_probe_sf1")
COPIES = int(os.environ.get("SPARK_GRAFT_PROBE_COPIES", "10"))

PROBED = (
    "minhash_near_dup_pairs",
    "text_stats",
    "flood_detailed_forecast",
    "flood_summary_forecast",
    "events_resample_fill",
)

LOWER = "abcdefghijklmnopqrstuvwxyz"
UPPER = LOWER.upper()


def _replicate(df, id_shifts: dict[str, int], copies: int):
    """Union `copies` copies of df, offsetting each id column by
    i * stride (stride = max(id)+1 per column, computed once)."""
    strides = {
        c: (df.agg(F.max(c)).first()[0] or 0) + 1 for c in id_shifts
    }
    out = df
    for i in range(1, copies):
        cols = []
        for c in df.columns:
            if c in id_shifts:
                cols.append((F.col(c) + i * strides[c]).alias(c))
            else:
                cols.append(F.col(c))
        out = out.unionByName(df.select(*cols))
    return out


def synth(spark) -> None:
    if os.path.exists(os.path.join(OUT, "_PROBE_OK")):
        return
    shutil.rmtree(OUT, ignore_errors=True)
    os.makedirs(OUT, exist_ok=True)

    docs = load_table(spark, SF01, "documents")
    stride = docs.agg(F.max("doc_id")).first()[0] + 1
    out = docs
    for i in range(1, COPIES):
        rot = LOWER[i:] + LOWER[:i] + UPPER[i:] + UPPER[:i]
        out = out.unionByName(
            docs.select(
                (F.col("doc_id") + i * stride).alias("doc_id"),
                F.translate("text", LOWER + UPPER, rot).alias("text"),
                *[c for c in docs.columns if c not in ("doc_id", "text")],
            ).select(docs.columns)
        )
    out.write.mode("overwrite").parquet(f"{OUT}/documents.parquet")

    li = load_table(spark, SF01, "lineitem")
    _replicate(li, {"l_orderkey": 1, "l_partkey": 1}, COPIES).write.mode(
        "overwrite"
    ).parquet(f"{OUT}/lineitem.parquet")
    part = load_table(spark, SF01, "part")
    _replicate(part, {"p_partkey": 1}, COPIES).write.mode("overwrite").parquet(
        f"{OUT}/part.parquet"
    )
    # events via the raw path (the normalizer is applied by load_events
    # at read time; write the scaled copy in the raw schema).
    ev = spark.read.parquet(f"{SF01}/events.parquet")
    _replicate(ev, {"user_id": 1, "event_id": 1}, COPIES).write.mode(
        "overwrite"
    ).parquet(f"{OUT}/events.parquet")
    with open(os.path.join(OUT, "_PROBE_OK"), "w") as fh:
        fh.write("ok\n")


def main() -> None:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    spark = get_spark(app_name="scaling-probe-r15")
    spark.sparkContext.setLogLevel("ERROR")
    # Python-worker warmup, same as bench.py.
    spark.range(256).repartition(
        spark.sparkContext.defaultParallelism
    ).mapInPandas(lambda it: it, "id long").write.format("noop").mode(
        "overwrite"
    ).save()

    synth(spark)
    # Warm the scaled scans so timings measure compute, not page cache.
    for t in ("documents", "lineitem", "part"):
        load_table(spark, OUT, t).write.format("noop").mode("overwrite").save()
    load_events(spark, OUT).write.format("noop").mode("overwrite").save()

    registry = suite_queries()
    results: dict[str, float] = {}
    for name in PROBED:
        fn = registry[name]
        spark.sparkContext.setJobDescription(f"probe:{name}")
        times = []
        for i in range(3):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            fn(spark, OUT).write.format("noop").mode("overwrite").save()
            times.append(time.perf_counter() - t0)
        # First run is the untimed warmup; min of the remaining two.
        results[name] = round(min(times[1:]), 3)
        spark.sparkContext.setJobDescription(None)

    payload = {
        "metric": "scaling_probe_sf1",
        "copies": COPIES,
        "cpus": spark.sparkContext.defaultParallelism,
        "cpus_env": cpus,
        "master": spark.sparkContext.master,
        "queries": results,
        "value": round(sum(results.values()), 3),
        "unit": "sec",
    }
    print(json.dumps(payload))
    spark.stop()


if __name__ == "__main__":
    main()
