"""Incremental upsert materialization (sources/materialize.py):
merge semantics, versioned conflict resolution, and the dynamic-
overwrite guarantee that untouched partitions' files never move."""

from __future__ import annotations

import glob
import os
import shutil
import tempfile

import pytest
from pyspark.sql import Row

from data_pipelines_spark.sources.materialize import upsert_partitioned


@pytest.fixture()
def tmppath():
    d = tempfile.mkdtemp(prefix="dps_upsert_")
    yield os.path.join(d, "tbl")
    shutil.rmtree(d, ignore_errors=True)


def _rows(spark, triples):
    return spark.createDataFrame(
        [Row(day=d, k=k, v=v) for d, k, v in triples],
        "day string, k long, v string",
    )


def _read(spark, path):
    return {
        (r.day, r.k): r.v
        for r in spark.read.parquet(path).collect()
    }


def test_upsert_creates_then_merges(spark, tmppath):
    upsert_partitioned(
        spark,
        _rows(spark, [("d1", 1, "a"), ("d1", 2, "b"), ("d2", 3, "c")]),
        tmppath,
        ["k"],
        ["day"],
    )
    assert _read(spark, tmppath) == {
        ("d1", 1): "a", ("d1", 2): "b", ("d2", 3): "c",
    }
    # update key 2, insert key 4 — both land in partition d1.
    upsert_partitioned(
        spark,
        _rows(spark, [("d1", 2, "B"), ("d1", 4, "d")]),
        tmppath,
        ["k"],
        ["day"],
    )
    assert _read(spark, tmppath) == {
        ("d1", 1): "a", ("d1", 2): "B", ("d1", 4): "d", ("d2", 3): "c",
    }


def test_untouched_partition_files_not_rewritten(spark, tmppath):
    upsert_partitioned(
        spark,
        _rows(spark, [("d1", 1, "a"), ("d2", 2, "b")]),
        tmppath,
        ["k"],
        ["day"],
    )
    d2_files = sorted(glob.glob(os.path.join(tmppath, "day=d2", "*.parquet")))
    d2_mtimes = [os.path.getmtime(f) for f in d2_files]
    upsert_partitioned(
        spark, _rows(spark, [("d1", 1, "A")]), tmppath, ["k"], ["day"]
    )
    assert sorted(
        glob.glob(os.path.join(tmppath, "day=d2", "*.parquet"))
    ) == d2_files
    assert [os.path.getmtime(f) for f in d2_files] == d2_mtimes
    assert _read(spark, tmppath) == {("d1", 1): "A", ("d2", 2): "b"}


def test_versioned_upsert_latest_wins(spark, tmppath):
    def vrows(triples):
        return spark.createDataFrame(
            [Row(day=d, k=k, v=v, ver=ver) for d, k, v, ver in triples],
            "day string, k long, v string, ver long",
        )

    upsert_partitioned(
        spark,
        vrows([("d1", 1, "a", 5), ("d1", 2, "b", 5)]),
        tmppath,
        ["k"],
        ["day"],
        version_col="ver",
    )
    # key 1: stale update (ver 3) must lose; key 2: newer update wins;
    # key 9: duplicate key within the batch — highest version kept.
    upsert_partitioned(
        spark,
        vrows([("d1", 1, "STALE", 3), ("d1", 2, "B", 7),
               ("d1", 9, "x", 1), ("d1", 9, "y", 2)]),
        tmppath,
        ["k"],
        ["day"],
        version_col="ver",
    )
    assert _read(spark, tmppath) == {
        ("d1", 1): "a", ("d1", 2): "B", ("d1", 9): "y",
    }


def test_unpartitioned_upsert_full_rewrite(spark, tmppath):
    df = spark.createDataFrame(
        [Row(k=1, v="a"), Row(k=2, v="b")], "k long, v string"
    )
    upsert_partitioned(spark, df, tmppath, ["k"])
    upd = spark.createDataFrame(
        [Row(k=2, v="B"), Row(k=3, v="c")], "k long, v string"
    )
    upsert_partitioned(spark, upd, tmppath, ["k"])
    got = {(r.k): r.v for r in spark.read.parquet(tmppath).collect()}
    assert got == {1: "a", 2: "B", 3: "c"}


def test_snapshot_diff_insert_update_delete(spark):
    from data_pipelines_spark.sources.materialize import snapshot_diff

    old = spark.createDataFrame(
        [Row(k=1, v="a", w=1.0), Row(k=2, v="b", w=2.0), Row(k=3, v="c", w=None)],
        "k long, v string, w double",
    )
    new = spark.createDataFrame(
        [Row(k=2, v="B", w=2.0), Row(k=3, v="c", w=None), Row(k=4, v="d", w=4.0)],
        "k long, v string, w double",
    )
    got = {r.k: (r.change, r.v, r.w)
           for r in snapshot_diff(old, new, ["k"]).collect()}
    # k=3 unchanged (NULL w compares null-safely equal) -> absent
    assert got == {
        1: ("delete", "a", 1.0),
        2: ("update", "B", 2.0),
        4: ("insert", "d", 4.0),
    }


def test_stream_upsert_sink_merges_incremental_drops(spark):
    from data_pipelines_spark.sources.materialize import stream_upsert_sink

    d = tempfile.mkdtemp(prefix="dps_stream_upsert_")
    src, tbl, ckpt = f"{d}/src", f"{d}/tbl", f"{d}/ckpt"
    try:
        # seed the table, then stage two incremental drops
        upsert_partitioned(
            spark, _rows(spark, [("d1", 1, "a"), ("d2", 2, "b")]),
            tbl, ["k"], ["day"],
        )
        schema = "day string, k long, v string"
        os.makedirs(src)
        _rows(spark, [("d1", 1, "A"), ("d1", 3, "c")]).coalesce(1)\
            .write.mode("append").parquet(src)
        _rows(spark, [("d2", 2, "B2"), ("d2", 4, "d")]).coalesce(1)\
            .write.mode("append").parquet(src)

        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = stream_upsert_sink(
            stream, tbl, ["k"], ["day"], checkpoint=ckpt
        ).start()
        q.awaitTermination(120)

        assert _read(spark, tbl) == {
            ("d1", 1): "A", ("d1", 3): "c",
            ("d2", 2): "B2", ("d2", 4): "d",
        }
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_dataset_exists_hadoop_probe(spark, tmppath):
    """Existence probe goes through the Hadoop FS API so it is scheme-
    aware: a file:// URI (the object-store shape locally available)
    answers correctly both before and after the bootstrap write —
    the old '://' heuristic would have claimed it existed and crashed
    the first-ever upsert on the read."""
    from data_pipelines_spark.sources.materialize import dataset_exists

    uri = "file://" + tmppath
    assert not dataset_exists(spark, uri)
    assert not dataset_exists(spark, tmppath)
    upsert_partitioned(
        spark, _rows(spark, [("d1", 1, "a")]), uri, ["k"], ["day"]
    )
    assert dataset_exists(spark, uri)
    assert _read(spark, tmppath) == {("d1", 1): "a"}
    # second upsert through the URI path takes the merge branch
    upsert_partitioned(
        spark, _rows(spark, [("d1", 1, "A"), ("d2", 2, "b")]), uri, ["k"], ["day"]
    )
    assert _read(spark, tmppath) == {("d1", 1): "A", ("d2", 2): "b"}


def test_unpruned_upsert_handles_partition_migration(spark, tmppath):
    """prune_partitions=False is the migration-safe mode: a key whose
    partition value changed is deleted from its old partition (even
    when that empties the partition) instead of being duplicated."""
    upsert_partitioned(
        spark,
        _rows(spark, [("d1", 1, "a"), ("d2", 2, "b")]),
        tmppath,
        ["k"],
        ["day"],
    )
    # key 1 migrates d1 -> d3; d1 becomes empty.
    upsert_partitioned(
        spark,
        _rows(spark, [("d3", 1, "a3")]),
        tmppath,
        ["k"],
        ["day"],
        prune_partitions=False,
    )
    assert _read(spark, tmppath) == {("d3", 1): "a3", ("d2", 2): "b"}
    # contrast: the pruned default cannot see the old row -> documented
    # duplicate (this is exactly why the contract requires immutable
    # partition values per key).
    upsert_partitioned(
        spark, _rows(spark, [("d4", 2, "b4")]), tmppath, ["k"], ["day"]
    )
    got = _read(spark, tmppath)
    assert got[("d4", 2)] == "b4" and got[("d2", 2)] == "b"


def test_delta_format_seam_is_import_gated(spark, tmppath):
    """format='delta' must fail with a clear ImportError when
    delta-spark is absent (and never fall through to the parquet
    dataflow); unknown formats are rejected."""
    df = _rows(spark, [("d1", 1, "a")])
    try:
        import delta  # noqa: F401

        pytest.skip("delta-spark installed; gate not exercisable")
    except ImportError:
        pass
    with pytest.raises(ImportError, match="delta-spark"):
        upsert_partitioned(spark, df, tmppath, ["k"], ["day"], format="delta")
    assert not os.path.exists(tmppath)
    with pytest.raises(ValueError, match="unsupported format"):
        upsert_partitioned(spark, df, tmppath, ["k"], ["day"], format="orc")


def test_composite_partition_prune_is_exact_tuples(spark, tmppath):
    """Composite partition keys: per-column IN pruning admits the cross
    product (day in {d1,d2} x region in {r1,r2} would sweep in (d1,r2)),
    so the exact tuple semi-join must keep the merge — and the rewrite —
    to exactly the batch's (day, region) pairs. The untouched
    cross-product partition's files must not move."""

    def rows(quads):
        return spark.createDataFrame(
            [Row(day=d, region=g, k=k, v=v) for d, g, k, v in quads],
            "day string, region string, k long, v string",
        )

    upsert_partitioned(
        spark,
        rows([("d1", "r1", 1, "a"), ("d1", "r2", 2, "b"),
              ("d2", "r1", 3, "c"), ("d2", "r2", 4, "d")]),
        tmppath,
        ["k"],
        ["day", "region"],
    )
    bystander = os.path.join(tmppath, "day=d1", "region=r2")
    files = sorted(glob.glob(os.path.join(bystander, "*.parquet")))
    mtimes = [os.path.getmtime(f) for f in files]

    # batch touches (d1,r1) and (d2,r2) — the per-column INs cover
    # day in {d1,d2}, region in {r1,r2}; (d1,r2)/(d2,r1) must survive
    upsert_partitioned(
        spark,
        rows([("d1", "r1", 1, "A"), ("d2", "r2", 9, "x")]),
        tmppath,
        ["k"],
        ["day", "region"],
    )
    got = {
        (r.day, r.region, r.k): r.v
        for r in spark.read.parquet(tmppath).collect()
    }
    assert got == {
        ("d1", "r1", 1): "A", ("d1", "r2", 2): "b",
        ("d2", "r1", 3): "c", ("d2", "r2", 4): "d",
        ("d2", "r2", 9): "x",
    }
    assert sorted(glob.glob(os.path.join(bystander, "*.parquet"))) == files
    assert [os.path.getmtime(f) for f in files] == mtimes


class TestCompaction:
    """compact_dataset: fragmented dirs rewritten to goal-sized file
    counts, healthy dirs untouched, data multiset preserved."""

    @staticmethod
    def _fragmented(spark, path):
        # day=d1: 8 tiny files; day=d2: 1 file (healthy)
        from data_pipelines_spark.sources.materialize import upsert_partitioned

        df1 = spark.createDataFrame(
            [Row(day="d1", k=i, v=f"v{i}") for i in range(64)],
            "day string, k long, v string",
        ).repartition(8)
        df1.write.partitionBy("day").mode("overwrite").parquet(path)
        upsert_partitioned(
            spark,
            spark.createDataFrame(
                [Row(day="d2", k=100, v="x")], "day string, k long, v string"
            ),
            path,
            ["k"],
            ["day"],
        )

    def test_compacts_fragmented_partition_only(self, spark, tmppath):
        from data_pipelines_spark.sources.materialize import compact_dataset

        self._fragmented(spark, tmppath)
        before = {
            (r.day, r.k): r.v for r in spark.read.parquet(tmppath).collect()
        }
        d1_before = glob.glob(os.path.join(tmppath, "day=d1", "*.parquet"))
        assert len(d1_before) == 8
        d2_files = sorted(glob.glob(os.path.join(tmppath, "day=d2", "*.parquet")))
        d2_mtimes = [os.path.getmtime(f) for f in d2_files]

        report = compact_dataset(spark, tmppath, ["day"])
        assert report["dirs_compacted"] == 1
        assert report["files_before"] == 8
        assert report["files_after"] == 1
        d1_after = glob.glob(os.path.join(tmppath, "day=d1", "*.parquet"))
        assert len(d1_after) == 1
        # healthy partition byte-identical
        assert sorted(
            glob.glob(os.path.join(tmppath, "day=d2", "*.parquet"))
        ) == d2_files
        assert [os.path.getmtime(f) for f in d2_files] == d2_mtimes
        after = {
            (r.day, r.k): r.v for r in spark.read.parquet(tmppath).collect()
        }
        assert after == before

    def test_idempotent_second_run_noop(self, spark, tmppath):
        from data_pipelines_spark.sources.materialize import compact_dataset

        self._fragmented(spark, tmppath)
        compact_dataset(spark, tmppath, ["day"])
        report2 = compact_dataset(spark, tmppath, ["day"])
        assert report2 == {
            "dirs_compacted": 0,
            "files_before": 0,
            "files_after": 0,
            "bytes_compacted": 0,
        }

    def test_unpartitioned_compaction(self, spark, tmppath):
        from data_pipelines_spark.sources.materialize import compact_dataset

        df = spark.range(1000).repartition(16)
        df.write.mode("overwrite").parquet(tmppath)
        assert len(glob.glob(os.path.join(tmppath, "*.parquet"))) == 16
        report = compact_dataset(spark, tmppath)
        assert report["dirs_compacted"] == 1
        assert len(glob.glob(os.path.join(tmppath, "*.parquet"))) == 1
        assert sorted(
            r.id for r in spark.read.parquet(tmppath).collect()
        ) == list(range(1000))

    def test_target_bytes_splits_into_multiple_files(self, spark, tmppath):
        from data_pipelines_spark.sources.materialize import compact_dataset

        spark.range(2000).repartition(16).write.mode("overwrite").parquet(tmppath)
        total = sum(
            os.path.getsize(f)
            for f in glob.glob(os.path.join(tmppath, "*.parquet"))
        )
        # force goal = 3-ish files
        target = max(1, total // 3)
        report = compact_dataset(spark, tmppath, target_bytes=target)
        n_after = len(glob.glob(os.path.join(tmppath, "*.parquet")))
        assert 1 < n_after < 16
        assert report["files_after"] == n_after
        assert sorted(
            r.id for r in spark.read.parquet(tmppath).collect()
        ) == list(range(2000))

    def test_missing_dataset_reports_zero(self, spark, tmppath):
        from data_pipelines_spark.sources.materialize import compact_dataset

        assert compact_dataset(spark, tmppath)["dirs_compacted"] == 0


def test_upsert_null_keys_follow_sql_merge_semantics(spark, tmp_path):
    """SQL MERGE: a NULL key never matches — NULL-key source rows
    insert, NULL-key target rows stay. The versioned window previously
    pooled every NULL-key row into one partition and kept a single
    winner (silent data loss); the unversioned anti-join path already
    behaved correctly. Both paths must now agree."""
    import os

    from data_pipelines_spark.sources.materialize import upsert_partitioned

    schema = "k long, v string, ver long"
    for version_col in (None, "ver"):
        path = os.path.join(str(tmp_path), f"tbl_{version_col}")
        base = spark.createDataFrame(
            [(1, "a", 1), (None, "n1", 1), (None, "n2", 1)], schema
        )
        upsert_partitioned(
            spark, base, path, ["k"], version_col=version_col
        )
        upd = spark.createDataFrame(
            [(1, "a2", 2), (None, "n3", 2)], schema
        )
        upsert_partitioned(
            spark, upd, path, ["k"], version_col=version_col
        )
        got = sorted(
            [(r["k"], r["v"]) for r in spark.read.parquet(path).collect()],
            key=repr,
        )
        # key 1 updated; all three NULL-key rows present
        assert got == sorted(
            [(1, "a2"), (None, "n1"), (None, "n2"), (None, "n3")], key=repr
        ), (version_col, got)


def test_upsert_schema_evolution(spark, tmp_path):
    """evolve_schema accepts batches whose column set differs: new
    columns appear (NULL on pre-existing rows), omitted columns fill
    NULL on the batch's rows; missing key/partition/version columns
    fail loudly; the strict default still rejects a drifted batch."""
    import os

    import pytest as _pytest

    from data_pipelines_spark.sources.materialize import upsert_partitioned

    path = os.path.join(str(tmp_path), "tbl")
    base = spark.createDataFrame(
        [(1, 0, "a", 1), (2, 0, "b", 1)],
        "k long, bucket long, v string, ver long",
    )
    upsert_partitioned(spark, base, path, ["k"], ["bucket"], version_col="ver")

    # batch adds `extra`, omits `v`
    batch = spark.createDataFrame(
        [(2, 0, 2, 9.9), (3, 1, 1, 7.7)],
        "k long, bucket long, ver long, extra double",
    )
    with _pytest.raises(Exception):
        upsert_partitioned(
            spark, batch, path, ["k"], ["bucket"], version_col="ver"
        )
    upsert_partitioned(
        spark, batch, path, ["k"], ["bucket"], version_col="ver",
        evolve_schema=True,
    )
    got = {
        r["k"]: (r["v"], r["extra"], r["ver"])
        for r in spark.read.option("mergeSchema", "true").parquet(path).collect()
    }
    assert got[1] == ("a", None, 1)        # untouched row, new col NULL
    assert got[2] == (None, 9.9, 2)        # updated: omitted col NULL
    assert got[3] == (None, 7.7, 1)        # appended with the new col

    # a second evolving upsert must see the unified schema (old
    # partition files still carry the v-only physical schema)
    b2 = spark.createDataFrame(
        [(1, 0, 3, 1.1)], "k long, bucket long, ver long, extra double"
    )
    upsert_partitioned(
        spark, b2, path, ["k"], ["bucket"], version_col="ver",
        evolve_schema=True,
    )
    got2 = {
        r["k"]: (r["v"], r["extra"])
        for r in spark.read.option("mergeSchema", "true").parquet(path).collect()
    }
    assert got2[1] == (None, 1.1) and got2[2] == (None, 9.9)

    # key/partition columns can never be evolved away
    bad = spark.createDataFrame([(9, 1)], "k long, ver long")
    with _pytest.raises(ValueError, match="cannot be NULL-filled"):
        upsert_partitioned(
            spark, bad, path, ["k"], ["bucket"], version_col="ver",
            evolve_schema=True,
        )


def test_upsert_evolve_schema_validates_existing_store(spark, tmp_path):
    """The EXISTING side of an evolving merge must also carry the key/
    partition/version columns: a store written without `ver` would get
    NULL-filled by unionByName(allowMissingColumns), NULL versions
    always lose the desc-sort, and every update would silently win —
    unversioned semantics wearing the versioned API. Must raise."""
    import os

    import pytest as _pytest

    from data_pipelines_spark.sources.materialize import upsert_partitioned

    path = os.path.join(str(tmp_path), "tbl")
    # store bootstrapped WITHOUT the version column
    spark.createDataFrame(
        [(1, 0, "a")], "k long, bucket long, v string"
    ).write.partitionBy("bucket").parquet(path)

    batch = spark.createDataFrame(
        [(1, 0, "a2", 5)], "k long, bucket long, v string, ver long"
    )
    with _pytest.raises(ValueError, match="existing dataset.*cannot be NULL-filled"):
        upsert_partitioned(
            spark, batch, path, ["k"], ["bucket"], version_col="ver",
            evolve_schema=True,
        )


def test_compact_preserves_evolved_column(spark, tmp_path):
    """Regression: compaction reads the affected dirs with mergeSchema.
    After an evolving upsert the partition dirs carry heterogeneous
    physical schemas; a plain multi-dir read can infer a footer schema
    WITHOUT the evolved column and the rewrite would silently drop it
    from every compacted dir. Content (including the evolved column)
    must be byte-identical across compaction."""
    import os

    from data_pipelines_spark.sources.materialize import (
        compact_dataset,
        upsert_partitioned,
    )

    path = os.path.join(str(tmp_path), "tbl")
    base = spark.createDataFrame(
        [(i, i % 2, f"v{i}", 1) for i in range(40)],
        "k long, bucket long, v string, ver long",
    ).repartition(8)
    upsert_partitioned(spark, base, path, ["k"], ["bucket"], version_col="ver")
    # evolving batch touches ONLY bucket 0 — bucket 1's files keep the
    # pre-evolution physical schema
    ev = spark.createDataFrame(
        [(0, 0, 2, "evolved")], "k long, bucket long, ver long, note string"
    )
    upsert_partitioned(
        spark, ev, path, ["k"], ["bucket"], version_col="ver",
        evolve_schema=True,
    )
    before = {
        r["k"]: (r["v"], r["ver"], r["note"])
        for r in spark.read.option("mergeSchema", "true").parquet(path).collect()
    }
    assert before[0] == (None, 2, "evolved") and before[1][2] is None

    report = compact_dataset(spark, path, ["bucket"])
    assert report["dirs_compacted"] >= 1, report
    assert report["files_after"] <= report["files_before"], report
    after = {
        r["k"]: (r["v"], r["ver"], r["note"])
        for r in spark.read.option("mergeSchema", "true").parquet(path).collect()
    }
    assert after == before


def test_delta_merge_construction_via_stub(spark, tmp_path, monkeypatch):
    """The Delta engine is absent here, but OUR half of the seam — the
    within-batch version dedup, NULL-key routing, merge condition, and
    matched/not-matched wiring — is pure plan construction and must be
    exercised, not just import-gated. A recording stub stands in for
    delta.tables.DeltaTable; a live-engine run (the other half) needs a
    delta-spark environment and stays honestly out of scope."""
    import sys
    import types

    from data_pipelines_spark.sources.materialize import upsert_partitioned

    recorded = {}

    class _Merge:
        def __init__(self, source_df, cond):
            recorded["source_df"] = source_df
            recorded["cond"] = cond
            recorded["steps"] = []

        def whenMatchedUpdateAll(self, condition=None):
            recorded["steps"].append(("matched_update_all", condition))
            return self

        def whenNotMatchedInsertAll(self):
            recorded["steps"].append(("not_matched_insert_all", None))
            return self

        def execute(self):
            recorded["steps"].append(("execute", None))

    class _Target:
        def alias(self, a):
            recorded["target_alias"] = a
            return self

        def merge(self, source, cond):
            # source arrives aliased; unwrap not needed — it's a real DF
            return _Merge(source, cond)

    class _DeltaTable:
        @staticmethod
        def isDeltaTable(spark, path):
            return True

        @staticmethod
        def forPath(spark, path):
            return _Target()

    fake_tables = types.ModuleType("delta.tables")
    fake_tables.DeltaTable = _DeltaTable
    fake_delta = types.ModuleType("delta")
    fake_delta.tables = fake_tables
    monkeypatch.setitem(sys.modules, "delta", fake_delta)
    monkeypatch.setitem(sys.modules, "delta.tables", fake_tables)

    batch = spark.createDataFrame(
        [
            (1, "old", 1), (1, "new", 2),      # within-batch dup: ver 2 wins
            (None, "n1", 5), (None, "n2", 5),  # NULL keys: BOTH must survive
            (2, "b", 7),
        ],
        "k long, v string, ver long",
    )
    upsert_partitioned(
        spark, batch, str(tmp_path / "t"), ["k"], version_col="ver",
        format="delta",
    )

    # merge condition: plain equality (NULL keys never match), per-key
    assert recorded["cond"] == "t.`k` = s.`k`"
    # versioned wiring: stale updates skipped, ties update, inserts on
    assert recorded["steps"] == [
        ("matched_update_all", "s.`ver` >= t.`ver`"),
        ("not_matched_insert_all", None),
        ("execute", None),
    ]
    # the source frame: deduped per non-NULL key, NULL-key rows intact
    rows = sorted(
        ((r["k"], r["v"], r["ver"]) for r in recorded["source_df"].collect()),
        key=repr,
    )
    assert rows == sorted(
        [(1, "new", 2), (2, "b", 7), (None, "n1", 5), (None, "n2", 5)],
        key=repr,
    )


def test_migrate_store_schema_mixed_width(spark, tmp_path):
    """A store with int32 files from a pre-widening engine and int64
    files after (the r10 `record_offset` caveat): plain reads widen but
    every mergeSchema read — which compact_dataset relies on — fails
    with CANNOT_MERGE_SCHEMAS. One migration pass normalizes the
    physical schema and the problem class is gone."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import pytest

    from data_pipelines_spark.sources.materialize import (
        migrate_store_schema,
    )

    store = str(tmp_path / "store")
    os.makedirs(store)
    pq.write_table(
        pa.table(
            {
                "record_offset": pa.array([1, 2], pa.int32()),
                "u": ["a", "b"],
            }
        ),
        os.path.join(store, "old.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "record_offset": pa.array([3, 4], pa.int64()),
                "u": ["c", "d"],
            }
        ),
        os.path.join(store, "new.parquet"),
    )
    with pytest.raises(Exception, match="CANNOT_MERGE_SCHEMAS"):
        spark.read.option("mergeSchema", "true").parquet(store).collect()
    report = migrate_store_schema(
        spark, store, "record_offset long, u string"
    )
    assert report["rows"] == 4
    out = spark.read.option("mergeSchema", "true").parquet(store)
    assert out.schema.simpleString() == (
        "struct<record_offset:bigint,u:string>"
    )
    assert sorted((r[0], r[1]) for r in out.collect()) == [
        (1, "a"), (2, "b"), (3, "c"), (4, "d"),
    ]
    # no migration litter left behind
    assert not os.path.exists(store + "__migrating")
    assert not os.path.exists(store + "__backup")


def test_migrate_refuses_leftover_backup(spark, tmp_path):
    """The swap is rename-aside (original -> __backup, migrated -> path,
    delete backup), so any single failed step leaves a complete store
    under some name. A leftover __backup from a crashed prior run must
    be refused loudly — renaming into it would nest and double rows —
    and the original store must be untouched by the refusal."""
    import pytest

    from data_pipelines_spark.sources.materialize import (
        migrate_store_schema,
    )

    store = str(tmp_path / "store")
    spark.createDataFrame(
        [(1, "a"), (2, "b")], "record_offset int, u string"
    ).write.parquet(store)
    os.makedirs(store + "__backup")
    with pytest.raises(IOError, match="leftover backup"):
        migrate_store_schema(spark, store, "record_offset long, u string")
    assert sorted(
        tuple(r) for r in spark.read.parquet(store).collect()
    ) == [(1, "a"), (2, "b")]
    # the refusal fails fast: no rewrite was attempted
    assert not os.path.exists(store + "__migrating")
    os.rmdir(store + "__backup")
    report = migrate_store_schema(
        spark, store, "record_offset long, u string"
    )
    assert report["rows"] == 2
    assert not os.path.exists(store + "__backup")


def test_migrate_store_schema_partitioned(spark, tmp_path):
    """Hive-partitioned stores keep their layout: partition dirs are
    re-derived from the partition column on rewrite."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from data_pipelines_spark.sources.materialize import (
        migrate_store_schema,
    )

    store = str(tmp_path / "pstore")
    os.makedirs(os.path.join(store, "batch_id=0"))
    os.makedirs(os.path.join(store, "batch_id=1"))
    pq.write_table(
        pa.table({"record_offset": pa.array([1], pa.int32()), "u": ["a"]}),
        os.path.join(store, "batch_id=0", "f.parquet"),
    )
    pq.write_table(
        pa.table({"record_offset": pa.array([2], pa.int64()), "u": ["b"]}),
        os.path.join(store, "batch_id=1", "f.parquet"),
    )
    migrate_store_schema(
        spark,
        store,
        "record_offset long, u string, batch_id int",
        partition_cols=["batch_id"],
    )
    assert {"batch_id=0", "batch_id=1"} <= set(os.listdir(store))
    out = spark.read.option("mergeSchema", "true").parquet(store)
    assert sorted((r["record_offset"], r["batch_id"]) for r in out.collect()) == [
        (1, 0), (2, 1),
    ]
