"""Exactly-once streaming ingest into transactional (txlog) tables.

The partition-overwrite sinks (`streaming/crawl.py`,
`streaming/sketches.py`) get replay idempotence by mapping each
micro-batch onto its own ``batch_id=<n>`` partition and dynamically
overwriting it. That works, but couples the table layout to the
ingest mechanism (a partition per micro-batch → the small-files axis
compaction then has to fix) and gives readers no snapshot isolation
against a half-written retry.

This sink gets the same exactly-once-at-rest guarantee from the
transaction log instead — the public Delta ``txnAppId``/``txnVersion``
idempotent-writes pattern: every commit records ``(app_id, batch_id)``,
and a replayed micro-batch (foreachBatch is at-least-once: checkpoint
replay after a crash, or a speculative duplicate attempt) is detected
against the table's transaction watermark and skipped. Consequences
the partition trick cannot offer:

- the table keeps its OWN layout (key-clustered files for stats
  pruning), not one directory per micro-batch;
- a crashed half-write is invisible — files become table content only
  at the atomic log commit, so readers never see a torn batch;
- ``mode="merge"`` upserts each micro-batch by key — streaming CDC
  into a keyed table, which no overwrite-partition scheme expresses;
- compaction and vacuum run concurrently with ingest under the same
  optimistic protocol.

Scale shape: per micro-batch the sink does one bounded-size log read
(checkpoint-backed), one Spark write of the batch's rows, and one
O(files-in-batch) commit. Merge mode adds the stats-pruned rewrite of
matched files only.

CAVEAT (inherent to the pattern, documented for Delta too): the
watermark identifies batches by NUMBER, so it protects exactly the
at-least-once replays Structured Streaming produces — a crash retry of
the in-flight batch, or a restart re-delivering already-committed
batches from the SAME checkpoint lineage. If the streaming checkpoint
is LOST and new source data arrived since the last committed batch,
the fresh query renumbers from 0 and may pack old+new data into a
batch id at-or-below the watermark — which would be skipped, silently
dropping the new rows. A lost checkpoint therefore requires a NEW
``app_id`` (ingesting everything again, idempotently for merge mode,
with duplicates for append mode) — the same contract the public Delta
``txnVersion`` docs state.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame

from data_pipelines_spark.sources import txlog


def stream_txlog_sink(
    stream: DataFrame,
    table_path: str,
    app_id: str,
    mode: str = "append",
    key_cols: Sequence[str] = (),
    version_col: str | None = None,
    checkpoint: str | None = None,
    available_now: bool = True,
    compact_every: int | None = None,
    compact_target_rows: int = 1_000_000,
    merge_mode: str = "cow",
):
    """foreachBatch sink landing each micro-batch in a txlog table as
    one idempotent transaction keyed by ``(app_id, batch_id)``.

    ``mode="append"`` blind-appends the batch's rows; ``mode="merge"``
    upserts them by ``key_cols`` (stored table keys by default) with
    optional ``version_col`` last-writer-wins — the streaming-CDC
    shape. The first batch bootstraps the table if it does not exist.

    ``compact_every=N`` is the small-file auto-OPTIMIZE policy a
    streaming-ingested table needs: every commit lands one file set per
    micro-batch, so after every N batches the sink bin-packs the table's
    undersized files (below ``compact_target_rows // 2``) into
    ~``compact_target_rows``-row files. The compaction is a separate
    PHYSICAL commit after the batch's data commit — content-invariant,
    replay-safe (a replayed trigger re-runs it as a cheap no-op on an
    already-packed layout), and cost-bounded by the small-file mass,
    never the table size.

    ``merge_mode`` picks the merge's physical strategy (see
    :func:`txlog.merge_upsert`): ``"cow"`` rewrites matched files,
    ``"dv"`` (merge-on-read) records replaced rows as deletion vectors
    — the right choice for streaming CDC whose keys scatter across the
    table, where per-batch copy-on-write would rewrite the table over
    and over; pair it with ``compact_every`` so the periodic OPTIMIZE
    pass also materializes accumulated dvs.

    Contract (as in the public Delta pattern): one live streaming query
    per ``app_id`` per table. Returns the un-started
    ``DataStreamWriter``."""
    if mode not in ("append", "merge"):
        raise ValueError(f"mode must be append|merge, got {mode!r}")
    if merge_mode not in ("cow", "dv"):
        raise ValueError(f"merge_mode must be cow|dv, got {merge_mode!r}")

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        if not txlog.table_exists(table_path):
            # Bootstrap SCHEMA-ONLY (txlog stores the schema in table
            # meta, so an empty table is first-class), then land the
            # batch through the uniform txn-guarded path below. Doing
            # data+watermark in one create would need two commits, and
            # a crash between them would double-ingest batch 0 on
            # replay; this way the data commit IS the watermark commit.
            try:
                txlog.create_table(
                    spark, batch_df.limit(0), table_path,
                    key_cols=list(key_cols),
                )
            except FileExistsError:
                pass  # another app's query bootstrapped it first — fine
        if mode == "append":
            txlog.append_table(
                spark, batch_df, table_path, txn=(app_id, int(batch_id))
            )
        else:
            txlog.merge_upsert(
                spark,
                batch_df,
                table_path,
                key_cols=list(key_cols) or None,
                version_col=version_col,
                txn=(app_id, int(batch_id)),
                mode=merge_mode,
            )
        if compact_every and (int(batch_id) + 1) % compact_every == 0:
            txlog.compact_table(
                spark,
                table_path,
                target_file_rows=compact_target_rows,
                min_file_rows=max(1, compact_target_rows // 2),
            )

    writer = stream.writeStream.foreachBatch(_apply).outputMode("update")
    if checkpoint is not None:
        writer = writer.option("checkpointLocation", checkpoint)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer
