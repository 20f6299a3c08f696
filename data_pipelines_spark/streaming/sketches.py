"""Streaming maintenance of the mergeable sketch stores
(`operators/sketches.py`): each micro-batch reduces to one sketch row
per (batch, group) and lands in its OWN batch partition of the store.

Delivery semantics, stated honestly: ``foreachBatch`` is at-least-once
— a batch can replay after a crash. Count-based sketches (histograms)
are NOT union-idempotent (replayed sums double-count), so the sink
never read-modify-writes a merged row; instead every batch writes rows
keyed by its deterministic ``batch_id`` and a replay OVERWRITES exactly
its own partition (dynamic partition overwrite) — effectively
exactly-once at rest. Readers merge across batch rows with
:func:`~data_pipelines_spark.operators.sketches.merge_histogram_
sketches` / ``merge_distinct_counts``, which is the store's normal
query path anyway (that is the whole point of a mergeable store).

Scale shape per batch: one map-side-combined aggregation to
(groups x sketch-size) rows, one partition-dir write. The store grows
one row per (batch, group); compact with
:func:`~data_pipelines_spark.sources.materialize.compact_dataset` or
periodically roll batches up into coarser rows (day → month) with the
merge functions — merges are exact for histograms and lossless for
HLL, so roll-ups never change answers.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _partitioned_batch_write(batch: DataFrame, path: str, batch_id: int) -> None:
    # Per-write option, NOT a session-conf set/restore: two sink queries
    # sharing the SparkSession can interleave their foreachBatch calls,
    # and a global set/finally-restore races (one query's restore can
    # revert the mode mid-write of the other). The DataFrameWriter
    # option scopes dynamic overwrite to exactly this write.
    (
        batch.withColumn("batch_id", F.lit(int(batch_id)).cast("long"))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch_id")
        .parquet(path)
    )


def stream_histogram_sketch_sink(
    stream_df: DataFrame,
    store_path: str,
    group_cols: Sequence[str],
    value_col: str,
    lo: float,
    hi: float,
    n_bins: int = 64,
    weight_col: str | None = None,
    checkpoint: str | None = None,
    available_now: bool = True,
):
    """foreachBatch sink: reduce each micro-batch to histogram-sketch
    rows per group and write them under ``batch_id=<n>`` in
    ``store_path``. Replays overwrite their own partition (idempotent);
    readers merge across batches. Binning (lo/hi/n_bins) and
    ``weight_col`` mode are the store's identity — keep them constant
    for the store's lifetime (count rows and weight rows must never
    merge).

    Returns the un-started ``DataStreamWriter``.
    """
    from data_pipelines_spark.operators.sketches import histogram_sketch

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        sk = histogram_sketch(
            batch_df, list(group_cols), value_col, lo, hi, n_bins,
            weight_col=weight_col,
        )
        _partitioned_batch_write(sk, store_path, batch_id)

    writer = stream_df.writeStream.foreachBatch(_apply).outputMode("append")
    if checkpoint is not None:
        writer = writer.option("checkpointLocation", checkpoint)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer


def stream_distinct_sketch_sink(
    stream_df: DataFrame,
    store_path: str,
    group_cols: Sequence[str],
    value_col: str,
    lgk: int = 12,
    checkpoint: str | None = None,
    available_now: bool = True,
):
    """foreachBatch sink for the HLL distinct-count store: one HllSketch
    row per (batch, group) under ``batch_id=<n>``. HLL unions are
    idempotent in VALUE terms, but the per-batch-partition layout keeps
    the store replay-clean at rest too (a replayed batch replaces its
    own rows instead of appending near-duplicates). ``lgk`` is the
    store's identity — keep it constant.

    Returns the un-started ``DataStreamWriter``.
    """
    from data_pipelines_spark.operators.sketches import distinct_sketch

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        sk = distinct_sketch(batch_df, list(group_cols), value_col, lgk)
        _partitioned_batch_write(sk, store_path, batch_id)

    writer = stream_df.writeStream.foreachBatch(_apply).outputMode("append")
    if checkpoint is not None:
        writer = writer.option("checkpointLocation", checkpoint)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer


def stream_frequency_sketch_sink(
    stream_df: DataFrame,
    store_path: str,
    group_cols: Sequence[str],
    value_col: str,
    width: int = 1024,
    depth: int = 4,
    portable: bool = False,
    checkpoint: str | None = None,
    available_now: bool = True,
):
    """foreachBatch sink for the count-min frequency store: each
    micro-batch reduces to its own (group, depth_row, bucket, cnt)
    counter rows under ``batch_id=<n>``. Count-based like the histogram
    store, so replays must overwrite rather than re-add — the
    per-batch-partition layout gives exactly-once at rest. Readers
    merge with :func:`~data_pipelines_spark.operators.sketches.
    merge_frequency_sketches` and probe with ``frequency_estimate``.
    ``width``/``depth``/``portable`` are the store's identity — keep
    them constant for its lifetime.

    Returns the un-started ``DataStreamWriter``.
    """
    from data_pipelines_spark.operators.sketches import frequency_sketch

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        sk = frequency_sketch(
            batch_df, list(group_cols), value_col, width, depth,
            portable=portable,
        )
        _partitioned_batch_write(sk, store_path, batch_id)

    writer = stream_df.writeStream.foreachBatch(_apply).outputMode("append")
    if checkpoint is not None:
        writer = writer.option("checkpointLocation", checkpoint)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer


def stream_quantile_sketch_sink(
    stream_df: DataFrame,
    store_path: str,
    group_cols: Sequence[str],
    value_col: str,
    alpha: float = 0.01,
    weight_col: str | None = None,
    checkpoint: str | None = None,
    available_now: bool = True,
):
    """foreachBatch sink for the DDSketch relative-error quantile
    store: each micro-batch reduces to its long-form
    ``(group..., side, bucket, cnt)`` rows under ``batch_id=<n>``.
    Same replay contract as the other stores (a replayed batch
    overwrites exactly its own partition); readers roll batches up
    with :func:`~data_pipelines_spark.operators.sketches.
    merge_quantile_sketches` — exact integer sums, so any roll-up
    grain gives the same quantiles. ``alpha`` (the log-bucket grid)
    and ``weight_col`` mode are the store's identity — keep them
    constant for its lifetime.

    Returns the un-started ``DataStreamWriter``.
    """
    from data_pipelines_spark.operators.sketches import quantile_sketch

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        sk = quantile_sketch(
            batch_df, list(group_cols), value_col, alpha=alpha,
            weight_col=weight_col,
        )
        _partitioned_batch_write(sk, store_path, batch_id)

    writer = stream_df.writeStream.foreachBatch(_apply).outputMode("append")
    if checkpoint is not None:
        writer = writer.option("checkpointLocation", checkpoint)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer
