"""Round-10 scale probe #3: the temporal headline queries on the
EVENTS axis, sf0.1 → 10×.

The synthetic 10× shifts `user_id`/`event_id` by a copy stride and
keeps `ts` unchanged — so `events_windowed_agg` sees the SAME window
grid with 10× the events per window (the fatter-groups axis: output
row count constant, partial aggregation must absorb the growth
map-side), while `events_resample_fill` sees 10× user streams (the
more-groups axis: output rows scale 10×, per-user work constant).
Both are the shapes a 100 TB event store grows along.

Protocol identical to the other r10 probes: steady-state min of 2 on
a warmed JVM, shuffle-write bytes from the UI REST API, Exchange-count
parity across scales.

Run: python examples/scale_probe_r10_events.py
"""

import json
import os
import shutil
import sys
import tempfile
import time
import urllib.request

sys.path.insert(0, ".")

from pyspark.sql import SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from data_pipelines_spark.session import tune  # noqa: E402
from data_pipelines_spark.sources.tables import load_events  # noqa: E402
from data_pipelines_spark.suite.temporal import (  # noqa: E402
    events_resample_fill,
    events_windowed_agg,
)

SF01 = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def synth_10x(spark, out_dir: str) -> None:
    ev = spark.read.parquet(f"{SF01}/events.parquet")
    strides = ev.agg(
        F.max("event_id").alias("e"), F.max("user_id").alias("u")
    ).first()
    out = ev
    for i in range(1, 10):
        out = out.unionByName(
            ev.select(
                (F.col("event_id") + i * (strides["e"] + 1)).alias("event_id"),
                "ts",
                (F.col("user_id") + i * (strides["u"] + 1)).alias("user_id"),
                "event_type",
                "value",
                "props",
            ).select(ev.columns)
        )
    out.write.mode("overwrite").parquet(f"{out_dir}/events.parquet")


def shuffle_bytes(spark) -> int:
    base = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    with urllib.request.urlopen(
        f"{base}/api/v1/applications/{app}/stages?status=complete"
    ) as r:
        stages = json.load(r)
    return sum(s.get("shuffleWriteBytes", 0) for s in stages)


def n_exchanges(df) -> int:
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    return plan.count("Exchange")


def probe(spark, name, fn, sf_dir):
    times, cnt, shuf = [], 0, 0
    for _ in range(2):
        spark.catalog.clearCache()
        before = shuffle_bytes(spark)
        t = time.perf_counter()
        cnt = fn(spark, sf_dir).count()
        times.append(time.perf_counter() - t)
        shuf = shuffle_bytes(spark) - before
    exch = n_exchanges(fn(spark, sf_dir))
    print(
        f"{name:24s} sf_dir={os.path.basename(sf_dir):6s} rows={cnt:9d} "
        f"min={min(times):6.2f}s shuffle={shuf / 1e6:8.1f}MB exchanges={exch}",
        flush=True,
    )
    return min(times), exch


def main() -> None:
    spark = tune(
        SparkSession.builder.appName("scale-probe-r10-events")
        .master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '*')}]")
        .config("spark.sql.shuffle.partitions", "32")
        .config(
            "spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "16g")
        )
        .config("spark.ui.enabled", "true")
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(64).repartition(32).mapInPandas(
        lambda it: it, "id long"
    ).write.format("noop").mode("overwrite").save()

    d = tempfile.mkdtemp(prefix="sf1_events_")
    try:
        synth_10x(spark, d)
        # sanity: the normalized loader reads the synthetic dir too
        load_events(spark, d).limit(1).count()
        results = {}
        for name, fn in (
            ("events_windowed_agg", events_windowed_agg),
            ("events_resample_fill", events_resample_fill),
        ):
            t01, e01 = probe(spark, name, fn, SF01)
            spark.catalog.clearCache()
            t1, e1 = probe(spark, name, fn, d)
            spark.catalog.clearCache()
            results[name] = (t01, t1, e01, e1)
        for name, (t01, t1, e01, e1) in results.items():
            ratio = t1 / t01 if t01 else float("nan")
            flag = "" if ratio <= 12 and e1 == e01 else "  <-- SUPER-LINEAR/PLAN-CHANGE"
            print(
                f"{name}: 10x events -> {ratio:.2f}x time, "
                f"exchanges {e01} -> {e1}{flag}",
                flush=True,
            )
    finally:
        shutil.rmtree(d, ignore_errors=True)


if __name__ == "__main__":
    main()
