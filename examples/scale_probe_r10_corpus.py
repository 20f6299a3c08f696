"""Round-10 scale probe #2: the two heaviest headline LLM-data queries
on the CORPUS-size axis, sf0.1 → 10×.

`text_stats` (positioned-gram span dedup + profiling) and
`minhash_near_dup_pairs` (OPH band-bucket join + exact verify) are the
bench's slowest entries; every earlier probe covered extension
operators. Synthesizing the 10× corpus needs care: naive row
duplication would make every doc an EXACT duplicate of its 9 copies —
a pathological dup distribution, not a scale-up. A first attempt
(suffixing every token with a copy marker) was ALSO pathological in
the opposite direction: the marker made every doc in a copy share
universal character shingles, pinning band minima together — 50k docs
produced 79M minhash candidates, which is what motivated the r10
`max_bucket` guard in `operators/dedup.py`. The neutral transform is
a per-copy letter ROTATION cipher: it maps each character shingle
bijectively, so the within-copy shingle FREQUENCY DISTRIBUTION is
exactly the base corpus's (near-dup structure scales by exactly 10×)
while cross-copy overlap stays at natural-text background level.

Protocol otherwise identical to scale_probe_r10_flood.py: steady-state
min of 2 on a warmed JVM, shuffle bytes from the UI REST API,
Exchange-count parity across scales.

Run: python examples/scale_probe_r10_corpus.py
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
from data_pipelines_spark.sources.tables import load_table  # noqa: E402
from data_pipelines_spark.suite.llmdata import (  # noqa: E402
    minhash_near_dup_pairs,
    text_stats,
)

SF01 = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


LOWER = "abcdefghijklmnopqrstuvwxyz"
UPPER = LOWER.upper()


def synth_10x(spark, out_dir: str) -> None:
    docs = load_table(spark, SF01, "documents")
    stride = docs.agg(F.max("doc_id")).first()[0] + 1
    out = docs
    for i in range(1, 10):
        rot = LOWER[i:] + LOWER[:i] + UPPER[i:] + UPPER[:i]
        out = out.unionByName(
            docs.select(
                (F.col("doc_id") + i * stride).alias("doc_id"),
                F.translate("text", LOWER + UPPER, rot).alias("text"),
                *[c for c in docs.columns if c not in ("doc_id", "text")],
            ).select(docs.columns)
        )
    out.write.mode("overwrite").parquet(f"{out_dir}/documents.parquet")


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
        SparkSession.builder.appName("scale-probe-r10-corpus")
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

    d = tempfile.mkdtemp(prefix="sf1_corpus_")
    try:
        synth_10x(spark, d)
        results = {}
        for name, fn in (
            ("text_stats", text_stats),
            ("minhash_near_dup_pairs", minhash_near_dup_pairs),
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
                f"{name}: 10x corpus -> {ratio:.2f}x time, "
                f"exchanges {e01} -> {e1}{flag}",
                flush=True,
            )
    finally:
        shutil.rmtree(d, ignore_errors=True)


if __name__ == "__main__":
    main()
