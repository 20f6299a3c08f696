"""Structured Streaming extension: windowed event aggregation.

The reference has NO streaming surface (SURVEY.md §2.10) — its
incrementality is a daily cron re-materialization. This module is the
engine's honest mapping of that model plus a real streaming extension:

- :func:`tumbling_event_counts` — watermarked tumbling-window aggregation;
  the streaming twin of the batch `events_tumbling_window` suite query
  (same plan shape, same results on bounded input).
- :func:`incremental_file_stream` — `Trigger.AvailableNow`-style file
  pickup, the Spark-native version of the reference's "daily cron
  re-reads the new GRIB drops" loop (`jobs.py:24-29`).

At scale: the windowed aggregate state is keyed by (window, event_type)
— bounded by the watermark horizon; shuffle partitions carry state, so
`spark.sql.shuffle.partitions` should be sized to state volume, and
RocksDB state store enabled for large keyspaces.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_event_aggregation(
    events: DataFrame,
    window: str = "1 hour",
    slide: str | None = None,
    watermark: str = "2 hours",
    ts_col: str = "ts",
    key_col: str = "event_type",
) -> DataFrame:
    """Tumbling (or sliding, if ``slide`` given) window aggregation with
    late-data handling. Works identically on a batch DataFrame (no-op
    watermark) and a streaming one (state + late-row dropping)."""
    df = events
    if df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    win = (
        F.window(F.col(ts_col), window, slide)
        if slide
        else F.window(F.col(ts_col), window)
    )
    return (
        df.groupBy(win.alias("w"), key_col)
        .agg(
            F.count(F.lit(1)).alias("event_cnt"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
            F.sum("value").alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            key_col,
            "event_cnt",
            "min_value",
            "max_value",
            "sum_value",
        )
    )


def deduplicate_stream(
    events: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    watermark: str = "1 hour",
    exact: bool = False,
) -> DataFrame:
    """Streaming deduplication on business keys with BOUNDED state —
    the streaming tier of the dedup stack (exact-id dedup for replayed
    /duplicated events; content dedup runs in batch). On a batch frame
    this is plain dropDuplicates.

    State bounding is subtler than it looks: plain ``dropDuplicates``
    evicts a key's state at the watermark ONLY when the event-time
    column is part of the dedup keys — on business keys alone the
    watermark is ignored and state grows forever (the documented Spark
    behavior, and an OOM at 100 TB event volume). So for streams this
    uses ``dropDuplicatesWithinWatermark``: duplicates arriving within
    the watermark delay of the first sighting are dropped, and the
    key's state is freed once the watermark passes it — a replay
    arriving LATER than the delay re-emits, which is the honest
    bounded-state contract (size ``watermark`` to the replay horizon:
    e.g. a Kafka source can re-deliver at most its retention window).
    ``exact=True`` opts into all-time exactness via unbounded state
    (plain ``dropDuplicates``) — small keyspaces only. When ``ts_col``
    is already among ``keys``, plain ``dropDuplicates`` is used: state
    is watermark-evicted in that shape, and within-watermark semantics
    would be wrong for keys that legitimately repeat at different
    event times.
    """
    df = events
    if not df.isStreaming:
        return df.dropDuplicates(keys)
    df = df.withWatermark(ts_col, watermark)
    if exact or ts_col in keys:
        return df.dropDuplicates(keys)
    return df.dropDuplicatesWithinWatermark(keys)


def join_streams(
    left: DataFrame,
    right: DataFrame,
    key_col: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    watermark: str = "2 hours",
    max_delay: str = "1 hour",
    how: str = "inner",
) -> DataFrame:
    """Stream-stream equi-join with an event-time range bound — the
    impressions⨝clicks shape: a right-side row matches a left-side row
    with the same key whose timestamp is within ``[left_ts, left_ts +
    max_delay]``.

    The range condition is what makes unbounded stream-stream join
    feasible: together with the watermarks it gives Spark a provable
    bound on how long each side's rows must be buffered, so join state
    is evicted instead of growing forever. ``how`` may be ``inner`` or
    ``left_outer`` (outer emits unmatched left rows only once the
    watermark passes their join horizon). On batch frames the same
    expression is a plain conditional join, so batch/stream twins can be
    asserted equal on bounded input.

    Ambiguous column names are resolved by suffixing the right side's
    non-key columns with ``_r``. At 100 TB both sides shuffle-partition
    on ``key_col`` — the state store is keyed the same way, so sizing
    ``spark.sql.shuffle.partitions`` to state volume applies here too.
    """
    if left.isStreaming:
        left = left.withWatermark(left_ts, watermark)
    if right.isStreaming:
        right = right.withWatermark(right_ts, watermark)
    renames = {
        c: f"{c}_r"
        for c in right.columns
        if c != key_col and c in set(left.columns)
    }
    for old, new in renames.items():
        right = right.withColumnRenamed(old, new)
    r_ts = renames.get(right_ts, right_ts)
    cond = (
        (left[key_col] == right[key_col])
        & (right[r_ts] >= left[left_ts])
        & (right[r_ts] <= left[left_ts] + F.expr(f"INTERVAL {max_delay}"))
    )
    return left.join(right, cond, how).drop(right[key_col])


def stream_events_from_dir(
    spark,
    path: str,
    schema,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """File-source stream over a parquet directory — the incremental
    pickup shape (new daily drops processed exactly once)."""
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(path)


def enrich_stream(
    stream: DataFrame,
    dim: DataFrame,
    keys: list[str],
    how: str = "left",
    broadcast_dim: bool | None = None,
    max_broadcast_rows: int = 1_000_000,
    max_broadcast_bytes: int = 64 * 1024 * 1024,
) -> DataFrame:
    """Stream-static enrichment: join a stream against a (slowly
    changing) dimension snapshot — user profiles onto an event stream,
    thresholds onto a sensor feed.

    Spark re-evaluates the STATIC side on every micro-batch, so a
    dimension backed by a parquet/table path picks up upstream
    refreshes between batches without restarting the query — the
    streaming counterpart of the reference's threshold-join (J1), and
    stateless (no watermark or join state: each batch joins against the
    current snapshot).

    ``broadcast_dim=None`` (default) sizes the dimension from
    Catalyst's plan statistics — metadata only, no job runs — and
    broadcasts only when it fits ``max_broadcast_rows`` /
    ``max_broadcast_bytes``; a fact-sized "dimension" falls back to a
    shuffle join instead of OOMing every executor each micro-batch.
    True forces the broadcast; False forces the shuffle join (right
    when the stream is bucketed on the key). Same probe contract as
    ``operators.spatial.point_in_polygon_join``: scan-backed frames
    get exact file sizes; derived frames get Catalyst's (over)estimate,
    which conservatively falls back to the shuffle join.
    """
    if broadcast_dim is None:
        stats = dim._jdf.queryExecution().optimizedPlan().stats()
        row_count = stats.rowCount()
        if row_count.isDefined():
            broadcast_dim = int(str(row_count.get())) <= max_broadcast_rows
        else:
            broadcast_dim = int(str(stats.sizeInBytes())) <= max_broadcast_bytes
    d = F.broadcast(dim) if broadcast_dim else dim
    return stream.join(d, keys, how)
