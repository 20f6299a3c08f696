"""The LogStore seam (`sources/txlog.py`): commit coordination reduced
to one put-if-absent primitive, pluggable per table-path prefix. The
`InMemoryLogStore` mock is the contract's executable spec, and
`ConditionalPutLogStore` (round 13) is the deployable object-store
pattern — put-if-absent as ONE conditional PUT (S3 If-None-Match:*,
GCS ifGenerationMatch=0), run here over the directory-backed
`LocalObjectStoreEmulator`. These tests run the real protocol
(create/append/merge/delete/compact/time travel/OCC races) against
BOTH coordinators, proving that NOTHING in the protocol depends on
filesystem atomicity beyond what the interface promises."""

from __future__ import annotations

import threading

import pytest
from pyspark.sql import functions as F

from data_pipelines_spark.sources import txlog
from data_pipelines_spark.sources.txlog import (
    InMemoryLogStore,
    append_table,
    compact_table,
    create_table,
    delete_where,
    merge_upsert,
    read_table,
    register_log_store,
    table_history,
)


def _df(spark, rows, schema="k long, v string"):
    return spark.createDataFrame(rows, schema=schema)


def _content(df):
    return sorted(
        (tuple(r) for r in df.collect()),
        key=lambda t: tuple((v is None, v) for v in t),
    )


def _make_store(kind: str, tmp_path):
    if kind == "memory":
        return InMemoryLogStore()
    return txlog.ConditionalPutLogStore(
        txlog.LocalObjectStoreEmulator(str(tmp_path / "objstore"))
    )


@pytest.fixture(params=["memory", "condput"])
def contract_store(request, tmp_path):
    return _make_store(request.param, tmp_path)


@pytest.fixture(params=["memory", "condput"])
def mem_table(spark, tmp_path, request):
    """A txlog table whose LOG lives in a non-filesystem coordinator —
    the in-memory contract spec or the conditional-put object-store
    pattern (data files stay on disk under tmp_path) — registered for
    this table's prefix only and deregistered afterwards."""
    prefix = str(tmp_path)
    store = _make_store(request.param, tmp_path)
    register_log_store(prefix, store)
    path = str(tmp_path / "tbl")
    try:
        create_table(
            spark, _df(spark, [(i, f"v{i}") for i in range(100)]), path,
            key_cols=["k"], num_files=4,
        )
        yield path, store
    finally:
        register_log_store(prefix, txlog.FileLogStore())


def test_put_if_absent_contract(contract_store):
    """The one atomicity primitive: first write wins, the loser gets
    FileExistsError, the winner's payload is intact, and put_replace
    is last-write-wins (checkpoints only) — for every coordinator."""
    store = contract_store
    store.put_if_absent("/t/_txlog", "0.json", "first\n")
    with pytest.raises(FileExistsError):
        store.put_if_absent("/t/_txlog", "0.json", "second\n")
    assert list(store.read_lines("/t/_txlog", "0.json")) == ["first\n"]
    store.put_replace("/t/_txlog", "0.checkpoint.json", "a")
    store.put_replace("/t/_txlog", "0.checkpoint.json", "b")
    assert "".join(store.read_lines("/t/_txlog", "0.checkpoint.json")) == "b"
    assert sorted(store.list_names("/t/_txlog")) == [
        "0.checkpoint.json", "0.json",
    ]
    with pytest.raises(FileNotFoundError):
        list(store.read_lines("/t/_txlog", "missing.json"))


def test_put_if_absent_under_thread_contention(contract_store):
    """N threads race the same name: exactly one wins, every loser
    sees FileExistsError — the property OCC is built on."""
    store = contract_store
    wins, losses = [], []
    barrier = threading.Barrier(8)

    def attempt(i):
        barrier.wait()
        try:
            store.put_if_absent("/t/_txlog", "5.json", f"writer-{i}\n")
            wins.append(i)
        except FileExistsError:
            losses.append(i)

    threads = [threading.Thread(target=attempt, args=(i,)) for i in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert len(wins) == 1 and len(losses) == 7
    payload = "".join(store.read_lines("/t/_txlog", "5.json"))
    assert payload == f"writer-{wins[0]}\n"


def test_full_lifecycle_against_memory_store(spark, mem_table):
    """create → merge (cow + dv) → delete → compact → checkpoint-bounded
    replay → time travel, with the log living ONLY in the coordinator:
    no _txlog directory ever appears on disk."""
    import os

    path, store = mem_table
    assert not os.path.isdir(os.path.join(path, "_txlog"))
    merge_upsert(spark, _df(spark, [(3, "M3"), (200, "M200")]), path)
    merge_upsert(spark, _df(spark, [(5, "D5")]), path, mode="dv")
    delete_where(spark, path, F.col("k") % 10 == 9, mode="dv")
    for i in range(8):  # push past CHECKPOINT_EVERY to exercise replay
        append_table(spark, _df(spark, [(300 + i, f"a{i}")]), path)
    compact_table(spark, path, target_file_rows=1000)
    out = dict(_content(read_table(spark, path)))
    assert out[3] == "M3" and out[5] == "D5" and out[200] == "M200"
    assert all(k % 10 != 9 for k in out if k < 100)
    assert len(out) == 100 - 10 + 1 + 8
    # time travel through the in-memory log
    assert len(_content(read_table(spark, path, version=0))) == 100
    versions = [h["version"] for h in table_history(path)]
    assert versions == list(range(len(versions)))
    # the checkpoint landed in the store, not on disk
    assert any(
        n.endswith(".checkpoint.json")
        for n in store.list_names(txlog._log_dir(path))
    )
    assert not os.path.isdir(os.path.join(path, "_txlog"))


def test_occ_write_race_against_memory_store(spark, mem_table):
    """Real-thread concurrent appends + a merge against the mock
    coordinator: every write lands exactly once (the OCC retry loop
    exercises the put-if-absent conflict path for real)."""
    path, _store = mem_table
    errs = []

    def do_append(lo):
        try:
            append_table(
                spark, _df(spark, [(lo + j, f"a{lo + j}") for j in range(3)]),
                path,
            )
        except Exception as e:  # pragma: no cover - failure surface
            errs.append(e)

    def do_merge():
        try:
            merge_upsert(
                spark, _df(spark, [(k, f"m{k}") for k in range(5)]), path,
                mode="dv",
            )
        except Exception as e:  # pragma: no cover - failure surface
            errs.append(e)

    threads = [
        threading.Thread(target=do_append, args=(2000,)),
        threading.Thread(target=do_append, args=(3000,)),
        threading.Thread(target=do_merge),
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errs, errs
    out = dict(_content(read_table(spark, path)))
    for lo in (2000, 3000):
        for j in range(3):
            assert out[lo + j] == f"a{lo + j}"
    for k in range(5):
        assert out[k] == f"m{k}"
    assert len(out) == 106


def test_longest_prefix_routing(tmp_path):
    """Two stores on nested prefixes: the longer prefix wins; removing
    a registration restores the default file store."""
    outer, inner = InMemoryLogStore(), InMemoryLogStore()
    base = str(tmp_path)
    register_log_store(base, outer)
    register_log_store(base + "/sub", inner)
    try:
        assert txlog._store_for(base + "/sub/tbl") is inner
        assert txlog._store_for(base + "/other") is outer
        assert isinstance(txlog._store_for("/elsewhere"), txlog.FileLogStore)
        register_log_store(base + "/sub", txlog.FileLogStore())
        assert txlog._store_for(base + "/sub/tbl") is outer
    finally:
        register_log_store(base, txlog.FileLogStore())
        register_log_store(base + "/sub", txlog.FileLogStore())


def test_prefix_matching_is_segment_aware_and_subclasses_register():
    """Review regressions: a registration for /data/t must not capture
    the sibling /data/t2 (segment-aware prefix match), and a
    FileLogStore SUBCLASS (e.g. overriding only put_if_absent for an
    object store) registers normally — only the exact default class
    resets."""

    class CoordinatedFileStore(txlog.FileLogStore):
        def put_if_absent(self, log_dir, name, payload):  # pragma: no cover
            raise AssertionError("routing marker")

    mem = InMemoryLogStore()
    sub = CoordinatedFileStore()
    txlog.register_log_store("/data/t", mem)
    txlog.register_log_store("/coord", sub)
    try:
        assert txlog._store_for("/data/t") is mem
        assert txlog._store_for("/data/t/tbl") is mem
        assert isinstance(txlog._store_for("/data/t2"), txlog.FileLogStore)
        assert txlog._store_for("/coord/tbl") is sub
    finally:
        txlog.register_log_store("/data/t", txlog.FileLogStore())
        txlog.register_log_store("/coord", txlog.FileLogStore())
    assert isinstance(txlog._store_for("/data/t/tbl"), txlog.FileLogStore)
    assert isinstance(txlog._store_for("/coord/tbl"), txlog.FileLogStore)


def test_registry_normalizes_file_uri_spelling(tmp_path):
    """Review regression: a `file:` URI spelling of a registered prefix
    resolves to the SAME log dir, so it must route to the same store —
    two spellings splitting between coordinators would let both claim
    one version."""
    store = InMemoryLogStore()
    base = str(tmp_path)
    register_log_store(base, store)
    try:
        assert txlog._store_for(base + "/tbl") is store
        assert txlog._store_for("file://" + base + "/tbl") is store
        assert txlog._store_for("file:" + base + "/tbl") is store
    finally:
        register_log_store(base, txlog.FileLogStore())
    # and registering under the URI spelling governs the bare path too
    register_log_store("file://" + base, store)
    try:
        assert txlog._store_for(base + "/tbl") is store
    finally:
        register_log_store(base, txlog.FileLogStore())
    assert isinstance(txlog._store_for(base + "/tbl"), txlog.FileLogStore)


def test_object_store_emulator_flat_keyspace(tmp_path):
    """The emulator models an object store faithfully where it matters:
    a FLAT keyspace (keys with slashes are single objects, not
    directories), staged `.tmp-` objects invisible to LIST, and
    conditional-create arbitration per key."""
    em = txlog.LocalObjectStoreEmulator(str(tmp_path / "obj"))
    em.put_object("/a/b/_txlog/0.json", "x", if_none_match=True)
    # no directory tree materializes — one file per key
    assert not (tmp_path / "obj" / "a").exists()
    assert em.list_keys("/a/b/_txlog/") == ["/a/b/_txlog/0.json"]
    assert em.list_keys("/a/b2/") == []  # prefix is exact, not fuzzy
    with pytest.raises(FileExistsError):
        em.put_object("/a/b/_txlog/0.json", "y", if_none_match=True)
    assert em.get_object("/a/b/_txlog/0.json") == "x"
    em.put_object("/a/b/_txlog/0.json.tmp-deadbeef", "staged")
    assert em.list_keys("/a/b/_txlog/") == ["/a/b/_txlog/0.json"]
    with pytest.raises(FileNotFoundError):
        em.get_object("/a/b/_txlog/1.json")


def test_store_requirement_marker_blocks_default_store(spark, tmp_path):
    """Advice r12: register_log_store is process-local, so a process
    without the registration (a Spark worker planning a
    format('txlog') write, a fresh driver) would silently commit
    through the default FileLogStore — for a FILE-BACKED coordinator
    the log is readable and nothing fails loudly, bypassing OCC. The
    first coordinated commit records a store-requirement marker at the
    table root; a default-store commit against a marked table now
    refuses instead of bypassing."""
    import os

    class _Coordinator(txlog.FileLogStore):
        """Stands in for a subclass coordinating via an external
        mutex — the log itself stays plainly readable on disk."""

    prefix = str(tmp_path)
    store = _Coordinator()
    register_log_store(prefix, store)
    path = str(tmp_path / "tbl")
    try:
        create_table(
            spark, _df(spark, [(1, "a"), (2, "b")]), path, key_cols=["k"]
        )
        marker = os.path.join(path, "_txlog_requires_store.json")
        assert os.path.exists(marker)  # recorded on first commit
        append_table(spark, _df(spark, [(3, "c")]), path)  # coordinated
    finally:
        register_log_store(prefix, txlog.FileLogStore())
    # the registry is now empty for this prefix — the forgotten-process
    # scenario: reads still work (file-backed log), writes must refuse
    assert read_table(spark, path).count() == 3
    with pytest.raises(RuntimeError, match="requires commit coordination"):
        append_table(spark, _df(spark, [(4, "d")]), path)
    assert read_table(spark, path).count() == 3  # nothing committed
    # re-registering the coordinator restores writes
    register_log_store(prefix, store)
    try:
        append_table(spark, _df(spark, [(4, "d")]), path)
    finally:
        register_log_store(prefix, txlog.FileLogStore())
    assert read_table(spark, path).count() == 4


def test_unmarked_tables_unaffected_by_marker_gate(spark, tmp_path):
    """Tables that never saw a custom coordinator carry no marker and
    commit through the default store exactly as before."""
    import os

    path = str(tmp_path / "plain")
    create_table(spark, _df(spark, [(1, "a")]), path, key_cols=["k"])
    append_table(spark, _df(spark, [(2, "b")]), path)
    assert not os.path.exists(
        os.path.join(path, "_txlog_requires_store.json")
    )
    assert read_table(spark, path).count() == 2


def test_ephemeral_store_writes_no_marker(spark, tmp_path):
    """Review fix (r13): an InMemoryLogStore table dies with the
    process — recording a persistent marker would only block a future
    unrelated table at the same path. Persistent coordinators
    (ConditionalPutLogStore) still record it."""
    import os

    prefix = str(tmp_path)
    register_log_store(prefix, InMemoryLogStore())
    path = str(tmp_path / "mem_tbl")
    try:
        create_table(spark, _df(spark, [(1, "a")]), path, key_cols=["k"])
        assert not os.path.exists(
            os.path.join(path, "_txlog_requires_store.json")
        )
    finally:
        register_log_store(prefix, txlog.FileLogStore())
    # the path is reusable by a default-store table afterwards
    create_table(spark, _df(spark, [(2, "b")]), path, key_cols=["k"])
    assert read_table(spark, path).count() == 1
