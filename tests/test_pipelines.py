"""Asset-graph orchestration tests: lineage order, checkpointed
materialization, retry isolation, subset selection — and the flood
job end-to-end through the graph."""

from __future__ import annotations

import datetime as dt
import shutil
import tempfile

import pytest

from pyspark.sql import functions as F

from data_pipelines_spark.pipelines.assets import Asset, AssetGraph, flood_asset_graph


def test_topo_order_and_selection():
    g = AssetGraph()
    g.add(Asset("a", lambda spark: None))
    g.add(Asset("b", lambda spark: None, deps=("a",)))
    g.add(Asset("c", lambda spark: None, deps=("a",)))
    g.add(Asset("d", lambda spark: None, deps=("b", "c")))
    order = g.topo_order()
    assert order.index("a") < order.index("b") < order.index("d")
    assert order.index("c") < order.index("d")
    # selection pulls the dependency closure only
    assert set(g.topo_order(["b"])) == {"a", "b"}


def test_cycle_detection():
    g = AssetGraph()
    g.add(Asset("x", lambda spark: None, deps=("y",)))
    g.add(Asset("y", lambda spark: None, deps=("x",)))
    with pytest.raises(ValueError, match="cycle"):
        g.topo_order()


def test_materialize_with_retry_and_checkpoint(spark):
    tmp = tempfile.mkdtemp(prefix="dps_assets_")
    attempts = {"n": 0}
    try:
        g = AssetGraph()

        @g.asset("base")
        def base(spark):
            return spark.range(10).select(F.col("id"), (F.col("id") * 2).alias("v"))

        @g.asset("flaky_derived", deps=("base",))
        def derived(spark, base):
            attempts["n"] += 1
            if attempts["n"] == 1:
                raise RuntimeError("transient failure")
            return base.groupBy().agg(F.sum("v").alias("total"))

        res = g.materialize(spark, tmp, max_retries=2)
        assert res["base"].rows == 10
        assert res["flaky_derived"].attempts == 2  # failed once, retried
        total = spark.read.parquet(res["flaky_derived"].path).collect()[0]["total"]
        assert total == 90
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_flood_asset_graph_end_to_end(spark):
    """SURVEY.md §3.1 as assets: ingestion parquet → detailed → summary,
    each stage checkpointed like the reference's IO-manager boundary."""
    tmp = tempfile.mkdtemp(prefix="dps_flood_")
    issued = dt.date(2026, 8, 1)
    try:
        forecast = spark.createDataFrame(
            [
                (m, s, 1.025, 0.025, issued, issued + dt.timedelta(days=s),
                 float(10 * m + s))
                for m in range(4)
                for s in range(1, 6)
            ],
            "number long, step long, latitude double, longitude double, "
            "issued_on date, valid_for date, dis24 double",
        )
        thresholds = spark.createDataFrame(
            [(1.025, 0.025, 5.0, 15.0, 30.0)],
            "latitude double, longitude double, threshold_2y double, "
            "threshold_5y double, threshold_20y double",
        )
        forecast.write.parquet(f"{tmp}/transformed_discharge")
        thresholds.write.parquet(f"{tmp}/rp_combined_thresholds")

        res = flood_asset_graph().materialize(spark, tmp)
        assert res["detailed_forecast"].rows == 5  # 1 cell x 5 steps
        summary = spark.read.parquet(res["summary_forecast"].path).collect()
        assert len(summary) == 1
        assert summary[0]["intensity"] in ("P", "R", "Y")
        assert summary[0]["wkt"].startswith("POLYGON ((")
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_corpus_curation_pipeline_end_to_end(spark):
    """The examples/corpus_pipeline.py dataflow: planted artifacts are
    caught by the right stage and survivors carry packing columns."""
    import importlib.util
    import os
    import random

    from pyspark.sql import functions as F

    spec = importlib.util.spec_from_file_location(
        "corpus_pipeline_example",
        os.path.join(os.path.dirname(__file__), "..", "examples",
                     "corpus_pipeline.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    rng = random.Random(11)
    vocab = [f"w{k}" for k in range(300)]
    rows = []
    for i in range(20):
        body = " ".join(rng.choice(vocab) for _ in range(40))
        rows.append((i, f"the text {i} covers {body} and more of it",
                     "books" if i % 2 == 0 else "crawl", f"https://s{i % 3}.ex.com/{i}"))
    # planted: near-dup of doc 0 (higher id -> dropped), blocked domain,
    # benchmark leak
    rows.append((100, rows[0][1].replace("more", "extra"), "crawl",
                 "https://mirror.ex.org/0"))
    rows.append((101, rows[1][1], "crawl", "https://blocked.bad/x"))
    leak = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows.append((102, f"the text 102 covers {leak} and more of it", "books",
                 "https://s0.ex.com/102"))
    raw = spark.createDataFrame(
        rows, "doc_id long, text string, source string, url string")
    benchmark = spark.createDataFrame([(0, leak)], "qid long, text string")
    blocklist = spark.createDataFrame([("blocked.bad",)], "domain string")

    curated, pairs = mod.curate(
        spark, raw, benchmark, blocklist, seq_len=64)
    # ONE action on the curated frame: the pipeline plan is deep and a
    # Spark action re-executes it end to end, so the old
    # select/where/groupBy action trio tripled a ~1-minute dataflow.
    # Every assertion below is unchanged, evaluated on the collected
    # rows (23 docs) instead.
    curated_rows = curated.collect()
    kept = {r["doc_id"] for r in curated_rows}

    assert 101 not in kept                       # blocklist stage
    assert 102 not in kept                       # decontamination stage
    assert 100 not in kept                       # near-dup stage (min-id wins)
    pair_rows = pairs.collect()
    assert any(p["doc_a"] == 0 and p["doc_b"] == 100 for p in pair_rows)
    # survivors carry LM + packing columns with sane values
    sample = [r for r in curated_rows if r["doc_id"] == 0]
    if sample:                                   # doc 0 may be mixed out
        r = sample[0]
        assert r["n_tokens"] > 0 and r["lm_logprob10"] < 0
        assert r["seq_off"] is not None and 0 <= r["seq_off"] < 64
    # packing is dense: offsets within each (source) stream are unique
    from collections import Counter

    offs = Counter(
        (r["source"], r["seq_id"], r["seq_off"]) for r in curated_rows
    )
    assert all(c == 1 for c in offs.values()), offs
