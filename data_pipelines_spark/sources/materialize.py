"""Incremental re-materialization: key-wise upsert (MERGE) into a
partitioned parquet dataset.

The reference's incrementality model is a daily cron that re-reads and
re-materializes whole assets (`jobs.py:24-29`, Dagster partitions
`partitions.py:3-53`). At 100 TB a full rewrite per day is the
bottleneck, and the scalable shape is MERGE: rewrite only the
partitions an update batch touches, replacing matched keys and
appending new ones. Table formats (Delta/Iceberg) give this
transactionally; this module gives the plain-parquet engine the same
dataflow with honest caveats.

Scale shape: the update batch is joined against ONLY the affected
partitions (partition-pruned read via an IN filter on the batch's
partition values — dimension-sized, they are the batch's date/tile
keys); the merge itself is one anti-join (or a versioned top-1 window)
keyed on the merge key; the write uses dynamic partition overwrite so
untouched partitions' files are never rewritten (asserted in tests).

Caveats (documented, inherent to raw parquet): the
read-merge-overwrite of the same path is not transactional — a reader
racing the rewrite of an affected partition can see it mid-commit; use
a table format where that matters. The merged affected-partition set
is `localCheckpoint`ed to cut lineage before overwriting the files it
was read from (Spark refuses a same-path read-write otherwise), so
executors must hold the affected partitions — bounded by the update
batch's partition fan-in, not the dataset.
"""

from __future__ import annotations

from collections.abc import Sequence
from functools import reduce

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def dataset_exists(spark: SparkSession, path: str) -> bool:
    """Existence probe through the Hadoop FileSystem API, so it answers
    correctly for every scheme Spark can write (file:, hdfs:, s3a:, …)
    — a bare ``os.path.exists`` would say "no" for object stores and a
    "has a scheme ⇒ assume yes" heuristic breaks the first-ever write
    to an empty bucket prefix."""
    jvm = spark._jvm
    hadoop_path = jvm.org.apache.hadoop.fs.Path(path)
    fs = hadoop_path.getFileSystem(spark._jsc.hadoopConfiguration())
    return bool(fs.exists(hadoop_path))


def upsert_partitioned(
    spark: SparkSession,
    updates: DataFrame,
    path: str,
    key_cols: Sequence[str],
    partition_cols: Sequence[str] = (),
    version_col: str | None = None,
    prune_partitions: bool = True,
    format: str = "parquet",
    evolve_schema: bool = False,
    analyze: str | None = None,
) -> None:
    """MERGE ``updates`` into the dataset at ``path``.

    Rows whose ``key_cols`` match an existing row replace it ("matched
    → update"); unmatched rows append. With ``version_col`` the highest
    version wins instead — including between an existing row and a
    stale late update, and among duplicate keys within the batch
    (ties break toward the update). Without it, updates win and the
    batch must be key-unique. NULL keys follow SQL MERGE semantics on
    both paths: a NULL key never matches, so NULL-key updates always
    insert and NULL-key existing rows are never replaced.

    With ``prune_partitions=True`` (default) only partitions present in
    the update batch are read, merged, and rewritten (dynamic partition
    overwrite); every other partition's files are untouched. **This
    requires partition values to be immutable per key** — derived from
    the key (e.g. ``date(key_ts)``, tile-of-cell), never free to change
    between versions of the same key. If a key's partition value could
    migrate, the old row lives in a partition the pruned read never
    opens, and the key would end up duplicated. For migratable keys
    pass ``prune_partitions=False``: the whole dataset is read, merged,
    and statically rewritten — the reference's own daily full
    re-materialization shape (`jobs.py:24-29`), correct for every
    migration (including partitions emptied by the merge) at full
    rewrite cost.

    ``format`` is the table-format seam: ``"parquet"`` (default, tested
    here) runs the read-merge-overwrite dataflow above; ``"txn"``
    delegates to the native transactional table format
    (`sources/txlog.py`: atomic commits, snapshot isolation, time
    travel, stats-pruned rewrite — live and fully tested in this
    environment); ``"delta"`` delegates to Delta Lake's transactional
    ``MERGE`` when the ``delta-spark`` package is on the classpath
    (ImportError with a pointer otherwise — no hard dependency).
    Under ``"txn"``/``"delta"`` transactionality, concurrent-writer
    serialization, and key migration are the format's contract rather
    than this module's caveats; ``"txn"`` tables read back via
    ``txlog.read_table``, not a bare parquet scan.

    ``evolve_schema=True`` accepts update batches whose column set
    differs from the stored table (Delta's ``mergeSchema`` shape):
    columns new in the batch appear on the table (NULL for pre-existing
    rows), columns the batch omits fill NULL on its rows. Key,
    partition, and version columns must be present on both sides
    (checked loudly — silently NULL keys would corrupt the merge). The
    default remains strict: a mismatched batch fails, which is the
    right default when the batch producer is not trusted to evolve the
    contract. Pruned merges still only rewrite the batch's partitions,
    so after an evolving upsert UNTOUCHED partitions keep their old
    physical schema — readers go through ``spark.read.parquet`` schema
    merging, which resolves the union (new columns read as NULL there).

    ``analyze="catalog_name"`` (opt-in) runs
    :func:`plans.stats.analyze_dataset` after the write, registering
    the dataset as an external catalog table under that name with
    fresh table+column statistics — so CBO-grade stats exist on every
    materialization without a manual ANALYZE (the reference's
    re-materialize-on-schedule shape, with the stats hook folded into
    the lifecycle). ``format="parquet"`` only: a txn table's root
    holds every retained VERSION of the data, so a path-registered
    catalog table would double-count rewritten rows (the txlog store
    carries its own footer-stats pruning; export a snapshot for
    catalog analytics instead), and Delta maintains its own stats.
    """
    keys = list(key_cols)
    parts = list(partition_cols)
    if analyze is not None and format != "parquet":
        raise ValueError(
            f"analyze= is parquet-format only (a {format!r} table's "
            f"location holds multiple data versions — catalog stats "
            f"over it would double-count rewritten rows)"
        )
    if format == "delta":
        _upsert_delta(spark, updates, path, keys, version_col)
        return
    if format == "txn":
        # The native transactional backend (sources/txlog.py): atomic
        # commit, snapshot isolation, stats-pruned file rewrite —
        # the same MERGE contract, with the table format's guarantees
        # replacing this module's raw-parquet caveats. Key-clustered
        # instead of hive-partitioned: footer-stats skipping subsumes
        # dir pruning and also covers non-partition predicates.
        from data_pipelines_spark.sources import txlog

        if not txlog.table_exists(path):
            if parts and updates.isEmpty():
                return  # same empty-bootstrap contract as parquet
            try:
                txlog.create_table(
                    spark, updates, path, key_cols=keys,
                    cluster_by=list(parts) + keys,
                )
                return
            except FileExistsError:
                # a concurrent first-batch writer won the bootstrap race
                # (exists-probe TOCTOU) — fall through and MERGE this
                # batch instead of dropping it
                pass
        txlog.merge_upsert(
            spark, updates, path, key_cols=keys,
            version_col=version_col, evolve_schema=evolve_schema,
        )
        return
    if format != "parquet":
        raise ValueError(
            f"unsupported format '{format}' (supported: parquet, txn, delta)"
        )
    if not dataset_exists(spark, path):
        # Bootstrapping a PARTITIONED dataset from an empty batch would
        # write a directory with no parquet footers (zero partition
        # dirs), which every later read rejects with
        # UNABLE_TO_INFER_SCHEMA — leave the dataset nonexistent
        # instead and let the first non-empty batch bootstrap it.
        if parts and updates.isEmpty():
            return
        writer = updates.write.mode("overwrite")
        if parts:
            writer = writer.partitionBy(*parts)
        writer.parquet(path)
        if analyze is not None:
            from data_pipelines_spark.plans.stats import analyze_dataset

            analyze_dataset(spark, path, analyze)
        return

    if evolve_schema:
        required = set(keys) | set(parts) | (
            {version_col} if version_col else set()
        )
        missing = sorted(required - set(updates.columns))
        if missing:
            raise ValueError(
                f"evolve_schema batch lacks key/partition/version "
                f"columns {missing} — these cannot be NULL-filled"
            )
        # mergeSchema unifies partitions written under earlier schemas
        existing = spark.read.option("mergeSchema", "true").parquet(path)
        # The EXISTING store needs the same check: an existing table
        # missing version_col (or a key/partition column) would be
        # silently NULL-filled by unionByName(allowMissingColumns) —
        # NULL versions always lose the desc-sort, so updates would
        # always win with no error, which is the unversioned semantics
        # wearing the versioned API. Fail loudly instead.
        missing_existing = sorted(required - set(existing.columns))
        if missing_existing:
            raise ValueError(
                f"evolve_schema: existing dataset at {path} lacks "
                f"key/partition/version columns {missing_existing} — "
                f"these cannot be NULL-filled"
            )
    else:
        existing = spark.read.parquet(path)
    if parts and prune_partitions:
        # Partition-pruned read: the batch's partition-value set is
        # dimension-sized (its date/tile keys) — inline per-column IN
        # filters so the scan never opens untouched partitions. For
        # composite partition keys the per-column INs admit the cross
        # product (a superset of the batch's exact tuples), so an exact
        # tuple restriction follows via a broadcast semi-join — a
        # bounded-size plan at any tuple count, where the literal
        # OR-of-ANDs chain this replaces grew one clause per tuple and
        # bloated the optimizer at thousands of partitions. The
        # semi-join keeps `merged` to exactly-affected partitions, so
        # dynamic overwrite still never rewrites an untouched one.
        # (NULL partition values never equal/IN-match — as before, such
        # rows cannot be pruned-merged; use prune_partitions=False.)
        pvals = [tuple(r) for r in updates.select(*parts).distinct().collect()]
        pred = reduce(
            lambda a, b: a & b,
            [
                F.col(c).isin([row[i] for row in pvals])
                for i, c in enumerate(parts)
            ],
        )
        existing = existing.where(pred)
        if len(parts) > 1:
            tuples = spark.createDataFrame(
                pvals, schema=updates.select(*parts).schema
            )
            existing = existing.join(F.broadcast(tuples), list(parts), "left_semi")

    # The merge semantics live in ONE place shared with the
    # transactional backend (anti-join or version window with NULL-key
    # routing — SQL MERGE's ON-clause semantics); see
    # txlog.merge_frames for the definition.
    from data_pipelines_spark.sources.txlog import merge_frames

    merged = merge_frames(existing, updates, keys, version_col, evolve_schema)

    # Cut lineage from the files about to be overwritten.
    merged = merged.localCheckpoint(eager=True)

    # Pruned merge: dynamic overwrite rewrites only the affected
    # partitions. Unpruned (migration-safe) merge: static overwrite —
    # the full rewrite also clears partitions the merge emptied.
    # Per-write option, not a session-conf set/restore (which races
    # with concurrent writers sharing the session).
    mode = "dynamic" if prune_partitions else "static"
    writer = merged.write.mode("overwrite").option(
        "partitionOverwriteMode", mode
    )
    if parts:
        writer = writer.partitionBy(*parts)
    writer.parquet(path)
    if analyze is not None:
        from data_pipelines_spark.plans.stats import analyze_dataset

        analyze_dataset(spark, path, analyze)


def _upsert_delta(
    spark: SparkSession,
    updates: DataFrame,
    path: str,
    keys: list[str],
    version_col: str | None,
) -> None:
    """Delta Lake backend for :func:`upsert_partitioned`: the same
    matched-update / unmatched-insert contract expressed as a
    transactional ``MERGE`` on the Delta log (optimistic concurrency,
    atomic commit, old-partition rows of migrated keys deleted by the
    format). Import-gated — never a hard dependency of the engine."""
    try:
        from delta.tables import DeltaTable
    except ImportError as exc:  # pragma: no cover - delta not installed here
        raise ImportError(
            "format='delta' needs the delta-spark package on the classpath "
            "(pip install delta-spark, plus spark.sql.extensions="
            "io.delta.sql.DeltaSparkSessionExtension); the plain-parquet "
            "default needs no dependency"
        ) from exc

    if version_col is not None:
        # Within-batch dedup (highest version per key) — but NULL-key
        # rows route AROUND the window: partitionBy pools every
        # NULL-key row into one partition and would keep a single
        # winner, silently deleting inserts the merge's
        # never-match-NULL semantics preserves (same routing as the
        # parquet path's merge).
        has_null_key = reduce(
            lambda a, b: a | b, [F.col(k).isNull() for k in keys]
        )
        null_rows = updates.where(has_null_key)
        w = Window.partitionBy(*keys).orderBy(F.desc(version_col))
        updates = (
            updates.where(~has_null_key)
            .withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") == 1)
            .drop("__rn")
            .unionByName(null_rows)
        )
    if not DeltaTable.isDeltaTable(spark, path):
        updates.write.format("delta").save(path)
        return
    target = DeltaTable.forPath(spark, path)
    # Plain equality, NOT null-safe <=>: the module contract (and the
    # parquet path) is SQL MERGE semantics — a NULL key never matches,
    # so NULL-key updates insert and NULL-key existing rows survive.
    # <=> would silently make NULL keys match each other, diverging the
    # two backends on exactly the rows users least expect.
    cond = " AND ".join(f"t.`{k}` = s.`{k}`" for k in keys)
    merge = target.alias("t").merge(updates.alias("s"), cond)
    if version_col is not None:
        merge = merge.whenMatchedUpdateAll(
            condition=f"s.`{version_col}` >= t.`{version_col}`"
        )
    else:
        merge = merge.whenMatchedUpdateAll()
    merge.whenNotMatchedInsertAll().execute()


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: Sequence[str],
    compare_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Change-data-capture between two dataset versions: one row per
    differing key with ``change ∈ {insert, delete, update}`` — the
    audit/validation companion to :func:`upsert_partitioned` (diff a
    re-materialization against the previous snapshot before promoting
    it).

    One full outer join on the key; change detection compares the
    ``compare_cols`` structs (default: all non-key columns present on
    both sides) null-safely. Output carries the new-side values for
    inserts/updates and the old-side values for deletes.

    Scale shape: a single co-partitioned shuffle join on the key;
    unchanged keys are filtered before any downstream work, so the
    result is change-volume-sized.
    """
    keys = list(key_cols)
    if compare_cols is None:
        shared = [c for c in new.columns if c in set(old.columns)]
        compare_cols = [c for c in shared if c not in keys]
    cmp_cols = list(compare_cols)

    o = old.select(
        *keys, F.struct(*[F.col(c) for c in cmp_cols]).alias("__old")
    )
    n = new.select(
        *keys, F.struct(*[F.col(c) for c in cmp_cols]).alias("__new")
    )
    joined = o.join(n, keys, "full_outer")
    change = (
        F.when(F.col("__old").isNull(), F.lit("insert"))
        .when(F.col("__new").isNull(), F.lit("delete"))
        .when(~F.col("__old").eqNullSafe(F.col("__new")), F.lit("update"))
    )
    diff = joined.withColumn("change", change).where(F.col("change").isNotNull())
    vals = F.coalesce(F.col("__new"), F.col("__old"))
    return diff.select(
        *keys,
        "change",
        *[vals.getField(c).alias(c) for c in cmp_cols],
    )


def stream_upsert_sink(
    stream_df: DataFrame,
    path: str,
    key_cols: Sequence[str],
    partition_cols: Sequence[str] = (),
    version_col: str | None = None,
    checkpoint: str | None = None,
    available_now: bool = True,
):
    """Streaming MERGE sink: apply each micro-batch to the parquet
    dataset with :func:`upsert_partitioned` via ``foreachBatch`` — the
    continuous form of the reference's daily re-materialization cron
    (new drops stream in, only their keys/partitions are rewritten).

    Delivery semantics, stated honestly: ``foreachBatch`` replays a
    batch after failure (at-least-once). With ``version_col`` the merge
    is IDEMPOTENT — replaying a batch re-resolves to the same winners —
    so the sink is effectively exactly-once end-to-end; without it,
    replays still converge because updates deterministically replace
    matched keys, but interleaved writers are not serialized (plain
    parquet has no transaction log — use a table format for that).

    Returns the un-started ``DataStreamWriter`` so callers control
    ``start()``/``awaitTermination``.
    """

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        upsert_partitioned(
            batch_df.sparkSession,
            batch_df,
            path,
            key_cols,
            partition_cols,
            version_col,
        )

    writer = stream_df.writeStream.foreachBatch(_apply).outputMode("update")
    if checkpoint is not None:
        writer = writer.option("checkpointLocation", checkpoint)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer


def _norm_uri(u: str) -> str:
    """Scheme-insensitive path key: 'file:/a/b', 'file:///a/b' and
    '/a/b' all normalize to 'a/b' — lets driver-side Hadoop listings
    join against executor-side ``input_file_name()`` URIs."""
    import re

    return re.sub(r"^[A-Za-z0-9]+:/+", "", u).lstrip("/")


def list_data_files(spark: SparkSession, path: str) -> dict[str, list[tuple[str, int]]]:
    """Recursive data-file listing grouped by containing directory
    (normalized URI → [(file_path, bytes)]); hidden/metadata files
    (``_SUCCESS``, ``.crc``, …) are excluded. Driver-side metadata walk
    through the Hadoop FS API — one RPC stream, no Spark job."""
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    out: dict[str, list[tuple[str, int]]] = {}
    if not fs.exists(jpath):
        return out
    it = fs.listFiles(jpath, True)
    while it.hasNext():
        st = it.next()
        p = st.getPath()
        if p.getName().startswith(("_", ".")):
            continue
        parent = _norm_uri(p.getParent().toString())
        out.setdefault(parent, []).append((p.toString(), int(st.getLen())))
    return out


def compact_dataset(
    spark: SparkSession,
    path: str,
    partition_cols: Sequence[str] = (),
    target_bytes: int = 128 * 1024 * 1024,
    min_files: int = 2,
) -> dict:
    """Small-file compaction: rewrite directories whose file count
    exceeds what ``target_bytes``-sized files need, leaving the data
    byte-for-byte equivalent and every healthy partition's files
    untouched (the OPTIMIZE/rewrite_data_files maintenance job of the
    table formats, for plain parquet).

    Why it exists at 100 TB: incremental MERGE (:func:`upsert_
    partitioned`) and streaming sinks accrete a file per batch per
    partition; thousands of tiny files turn every later scan into a
    metadata storm and defeat row-group pruning. A periodic compaction
    pass bounds file counts without rewriting the whole dataset — only
    directories currently fragmented (file_count > ceil(bytes/target)
    and >= ``min_files``) are read and rewritten.

    Plan shape: ONE job reads all affected directories (partition
    columns recovered via ``basePath``); each row's output file is
    ``pmod(xxhash64(data columns), goal_files)`` — content-derived, so
    task retries re-salt identically (the determinism bar
    ``plans.skew.salted_agg`` set) — joined per-directory from a
    broadcast goal table keyed on the normalized ``input_file_name()``
    directory; a single repartition on (dir, file_no) then writes with
    dynamic partition overwrite. The affected set is localCheckpoint-ed
    first (same caveat as upsert: read-rewrite of the same path is not
    transactional on raw parquet; bounded by the fragmented partitions'
    bytes, which the compaction cadence controls).

    Returns a report dict: ``dirs_compacted``, ``files_before``,
    ``files_after``, ``bytes_compacted`` (affected dirs only).
    """
    parts = list(partition_cols)
    by_dir = list_data_files(spark, path)
    if not by_dir:
        return {
            "dirs_compacted": 0,
            "files_before": 0,
            "files_after": 0,
            "bytes_compacted": 0,
        }

    affected: dict[str, tuple[list[tuple[str, int]], int]] = {}
    for d, files in by_dir.items():
        total = sum(sz for _, sz in files)
        goal = max(1, -(-total // target_bytes))  # ceil
        if len(files) > goal and len(files) >= min_files:
            affected[d] = (files, goal)
    if not affected:
        return {
            "dirs_compacted": 0,
            "files_before": 0,
            "files_after": 0,
            "bytes_compacted": 0,
        }

    files_before = sum(len(f) for f, _ in affected.values())
    bytes_total = sum(sz for f, _ in affected.values() for _, sz in f)
    total_goal = sum(g for _, g in affected.values())

    # mergeSchema: after an evolving upsert the dataset's dirs carry
    # heterogeneous physical schemas (untouched partitions lack the
    # evolved columns). A plain read infers the schema from one footer,
    # and a rewrite under that schema would silently DROP an evolved
    # column from every compacted dir. The merged read preserves the
    # union (missing columns read as NULL — exactly what readers see).
    if parts:
        # Read only fragmented partition dirs; basePath recovers the
        # partition columns from the directory names.
        dirs = sorted(
            {fp.rsplit("/", 1)[0] for f, _ in affected.values() for fp, _ in f}
        )
        df = (
            spark.read.option("basePath", path)
            .option("mergeSchema", "true")
            .parquet(*dirs)
        )
    else:
        df = spark.read.option("mergeSchema", "true").parquet(path)

    goals = spark.createDataFrame(
        [(d, g) for d, (_, g) in sorted(affected.items())],
        "`__dir` string, `__goal` long",
    )
    dir_key = F.regexp_replace(
        F.regexp_replace(F.input_file_name(), "/[^/]*$", ""),
        "^[A-Za-z0-9]+:/+",
        "",
    )
    data_cols = [c for c in df.columns if c not in parts]
    tagged = df.withColumn("__dir", dir_key).join(F.broadcast(goals), "__dir")
    salt = (
        F.pmod(F.xxhash64(*[F.col(c) for c in data_cols]), F.col("__goal"))
        if data_cols
        else F.lit(0)
    )
    merged = (
        tagged.withColumn("__file", salt)
        .repartition(total_goal, F.col("__dir"), F.col("__file"))
        .drop("__dir", "__goal", "__file")
        .localCheckpoint(eager=True)
    )

    # Per-write dynamic-overwrite option (not a session-conf
    # set/restore, which races with any concurrent writer on the same
    # session — same fix as streaming/sketches._partitioned_batch_write)
    writer = merged.write.mode("overwrite").option(
        "partitionOverwriteMode", "dynamic"
    )
    if parts:
        writer.partitionBy(*parts).parquet(path)
    else:
        writer.parquet(path)

    after = list_data_files(spark, path)
    files_after = sum(len(after.get(d, ())) for d in affected)
    return {
        "dirs_compacted": len(affected),
        "files_before": files_before,
        "files_after": files_after,
        "bytes_compacted": bytes_total,
    }


def migrate_store_schema(
    spark: SparkSession,
    path: str,
    schema,
    partition_cols: Sequence[str] = (),
    num_files: int | None = None,
) -> dict:
    """One-pass PHYSICAL schema migration for a plain-parquet store
    whose files carry mixed physical types under one column — e.g. a
    crawl store whose ``record_offset`` was written int32 by a
    pre-widening engine and int64 after. Such a store still answers
    schema-inferred and explicit-schema reads (Spark 4's parquet reader
    widens int32→int64), but every ``mergeSchema=true`` read — which
    evolving-store maintenance like :func:`compact_dataset` relies on —
    fails with ``CANNOT_MERGE_SCHEMAS``. This rewrites the store once
    under one physical schema and the problem class is gone.

    ``schema`` (DDL string or StructType) is the target LOGICAL schema,
    including any hive partition columns; it defines the store's
    columns after migration. The store is read under the explicit
    target schema (the reader applies Spark-legal widenings per file;
    an unsupported narrowing fails loudly), rewritten next to the store
    (``<path>__migrating``), then swapped in via two FileSystem
    renames (original aside to ``<path>__backup``, migrated copy into
    place, backup deleted) — a crash at ANY step leaves a complete
    store under some name and the raised error names the one rename
    that recovers it. The swap is still NOT transactional for
    concurrent readers (raw parquet's documented limit — run offline,
    or use a txlog table where that matters)."""
    target = (
        schema
        if not isinstance(schema, str)
        else StructType.fromDDL(schema)
    )
    parts = list(partition_cols)
    jvm = spark._jvm
    backup = path.rstrip("/") + "__backup"
    jbak = jvm.org.apache.hadoop.fs.Path(backup)
    fs = jbak.getFileSystem(spark._jsc.hadoopConfiguration())
    # Fail fast (before the rewrite) on a leftover backup from a
    # previous crashed run: the aside-rename below would NEST into an
    # existing directory (Hadoop rename semantics) and double rows.
    if fs.exists(jbak):
        # the recovery depends on WHICH step crashed: renaming the
        # backup back while {path} exists would NEST it inside (Hadoop
        # rename-onto-existing-dir semantics) and double every row
        raise IOError(
            f"migration found a leftover backup at {backup} — a "
            f"previous migration crashed mid-swap. If {path} is "
            f"MISSING, rename {backup} back to {path}; if {path} "
            f"exists (the swap completed), verify it reads and DELETE "
            f"{backup} — never rename onto the existing directory "
            f"(it would nest and double rows). Then re-run."
        )
    before = list_data_files(spark, path)
    files_before = sum(len(f) for f in before.values())
    df = spark.read.schema(target).parquet(path)
    if num_files:
        df = df.repartition(num_files)
    tmp = path.rstrip("/") + "__migrating"
    writer = df.write.mode("overwrite")
    if parts:
        writer = writer.partitionBy(*parts)
    writer.parquet(tmp)
    # count the MIGRATED copy before the destructive swap — one job
    # that doubles as the readability check (a migration that cannot
    # be read back must never replace the original)
    rows = spark.read.parquet(tmp).count()
    jsrc, jdst = (
        jvm.org.apache.hadoop.fs.Path(tmp),
        jvm.org.apache.hadoop.fs.Path(path),
    )
    # Swap via rename-aside, not delete-then-rename: every step leaves
    # a complete copy of the data under SOME name, so any single
    # failure is recoverable by one manual rename (the raised error
    # says which).
    if not fs.rename(jdst, jbak):
        raise IOError(
            f"migration could not move {path} aside to {backup}; "
            f"original store untouched, migrated data intact at {tmp}"
        )
    if not fs.rename(jsrc, jdst):
        raise IOError(
            f"migration rename {tmp} -> {path} failed; recover by "
            f"renaming {backup} back to {path} (migrated data is "
            f"intact at {tmp})"
        )
    fs.delete(jbak, True)
    after = list_data_files(spark, path)
    return {
        "files_before": files_before,
        "files_after": sum(len(f) for f in after.values()),
        "rows": rows,
    }
