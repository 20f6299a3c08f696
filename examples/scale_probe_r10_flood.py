"""Round-10 scale probe: the FLAGSHIP flood chain on the data-size
axis, sf0.1 → sf1 (10×). Every earlier probe covered extension
operators (hamming joins, spans, MJPEG); this one covers the graded
headline queries.

Protocol (same as examples/scale_probe_r9b.py): synthesize the 10×
input by unioning 10 key-shifted copies of the sf0.1 tables — partkeys
shift by copy*stride on BOTH lineitem and part, so each copy is a
disjoint block of cells with identical per-cell ensemble structure
(flood grids scale by CELLS, which is exactly this shape) — write it
as parquet, then run each query twice on a warmed JVM and take the
steady-state min. Shuffle write volume per run is read from the Spark
UI REST API, and the Exchange count of each plan is compared across
scales: a new exchange at 10× would mean the plan degraded (e.g. a
broadcast join falling back to sort-merge).

Expect ~linear time in cells: the detailed chain is one 5-key
partial-agg shuffle, the summary chain one fused cell agg; neither has
a per-cell pairwise term.

Run: python examples/scale_probe_r10_flood.py
"""

import json
import os
import shutil
import sys
import tempfile
import time
import urllib.request

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from pyspark.sql import SparkSession  # noqa: E402

from data_pipelines_spark.session import tune  # noqa: E402
from data_pipelines_spark.sources.tables import load_table  # noqa: E402
from data_pipelines_spark.suite.core import (  # noqa: E402
    flood_detailed_forecast,
    flood_summary_forecast,
)

SF01 = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def synth_10x(spark, out_dir: str) -> None:
    """10 disjoint key-shifted copies of lineitem+part (cells axis)."""
    li = load_table(spark, SF01, "lineitem")
    part = load_table(spark, SF01, "part")
    stride = part.agg(F.max("p_partkey")).first()[0] + 1
    li_cols = li.columns
    part_cols = part.columns

    def shifted(df, key, cols, i):
        return df.withColumn(key, F.col(key) + F.lit(i * stride)).select(cols)

    li10 = li.select(li_cols)
    part10 = part.select(part_cols)
    for i in range(1, 10):
        li10 = li10.unionByName(shifted(li, "l_partkey", li_cols, i))
        part10 = part10.unionByName(shifted(part, "p_partkey", part_cols, i))
    li10.write.mode("overwrite").parquet(f"{out_dir}/lineitem.parquet")
    part10.write.mode("overwrite").parquet(f"{out_dir}/part.parquet")


def shuffle_bytes(spark) -> int:
    """Total shuffle-write bytes so far, via the UI REST API."""
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
        before = shuffle_bytes(spark)
        t = time.perf_counter()
        cnt = fn(spark, sf_dir).count()
        times.append(time.perf_counter() - t)
        shuf = shuffle_bytes(spark) - before
    exch = n_exchanges(fn(spark, sf_dir))
    print(
        f"{name:26s} sf_dir={os.path.basename(sf_dir):6s} rows={cnt:9d} "
        f"min={min(times):6.2f}s shuffle={shuf / 1e6:8.1f}MB exchanges={exch}",
        flush=True,
    )
    return min(times), exch


def main() -> None:
    # same confs as session.get_spark but with the UI ON so the probe
    # can read shuffle-write bytes from the REST API
    spark = tune(
        SparkSession.builder.appName("scale-probe-r10-flood")
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

    d = tempfile.mkdtemp(prefix="sf1_flood_")
    try:
        synth_10x(spark, d)
        results = {}
        for name, fn in (
            ("flood_detailed_forecast", flood_detailed_forecast),
            ("flood_summary_forecast", flood_summary_forecast),
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
                f"{name}: 10x data -> {ratio:.2f}x time, "
                f"exchanges {e01} -> {e1}{flag}",
                flush=True,
            )
    finally:
        shutil.rmtree(d, ignore_errors=True)


if __name__ == "__main__":
    main()
