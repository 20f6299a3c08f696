"""Round-13 dv READ-side guarantees: a dv-carrying table scans through
an anti-join; dv maintenance (`compact_table(dv_min_ratio=...)`)
materializes the vectors away and must restore the PLAIN read plan —
not merely the same rows. The wall-clock overhead curve vs dv density
is recorded by examples/scale_probe_r13_dv_read.py (NOTES_r13); this
suite pins the plan shapes that probe relies on."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_pipelines_spark.sources import txlog


def _plan(spark, path) -> str:
    return (
        txlog.read_table(spark, path)
        ._jdf.queryExecution().executedPlan().toString()
    )


def test_compaction_restores_plain_read_plan(spark, tmp_path):
    path = str(tmp_path / "tbl")
    df = spark.range(50_000).select(
        F.col("id").alias("k"), (F.col("id") % 97).alias("v")
    )
    txlog.create_table(spark, df, path, key_cols=["k"], num_files=4)
    plain_before = _plan(spark, path)
    assert "LeftAnti" not in plain_before  # dv-free tables scan plain
    txlog.delete_where(spark, path, F.col("k") % 10 == 3, mode="dv")
    dv_plan = _plan(spark, path)
    assert "LeftAnti" in dv_plan  # the dv anti-join is in the plan
    # 10% density >= dv_min_ratio: compaction must materialize the dvs
    res = txlog.compact_table(
        spark, path, target_file_rows=50_000, dv_min_ratio=0.05
    )
    assert res["files_after"] <= res["files_before"]
    state = txlog._load_state(path)
    assert not any(e.get("dv") for e in state.files.values())
    after = _plan(spark, path)
    assert "LeftAnti" not in after  # plain read restored
    got = sorted(r["k"] for r in txlog.read_table(spark, path).collect())
    assert got == [k for k in range(50_000) if k % 10 != 3]


def test_low_density_dv_survives_default_ratio_until_asked(spark, tmp_path):
    """Below dv_min_ratio the dv is the RIGHT trade (rewriting a file
    over 0.2% deletions wastes write bandwidth): default compaction
    keeps it; an explicit lower ratio purges it — the maintenance
    cadence knob docs/TXLOG.md describes."""
    path = str(tmp_path / "tbl")
    df = spark.range(50_000).select(
        F.col("id").alias("k"), (F.col("id") % 97).alias("v")
    )
    txlog.create_table(spark, df, path, key_cols=["k"], num_files=2)
    txlog.delete_where(spark, path, F.col("k") % 500 == 7, mode="dv")
    # target below the per-file row count: packing selects nothing, so
    # only the dv-ratio gate decides — 0.2% < 5% default keeps the dv
    txlog.compact_table(spark, path, target_file_rows=1_000)
    state = txlog._load_state(path)
    assert any(e.get("dv") for e in state.files.values())  # kept
    assert "LeftAnti" in _plan(spark, path)
    txlog.compact_table(
        spark, path, target_file_rows=1_000, dv_min_ratio=0.0001
    )
    state = txlog._load_state(path)
    assert not any(e.get("dv") for e in state.files.values())
    assert "LeftAnti" not in _plan(spark, path)
    assert txlog.read_table(spark, path).count() == 50_000 - 100
