"""Custom stateful streaming operator: gap-based sessionization.

The reference has no streaming surface; this is the engine's extension
point for operators that Structured Streaming's built-in windows cannot
express — arbitrary per-key state evolved batch-by-batch via
`applyInPandasWithState` (Arrow-batched, GroupState-backed).

The example operator counts gap-delimited sessions per user (a new
session starts after `gap_sec` of inactivity). Its batch twin is the
`sessionized_gaps` suite query (lag-window formulation), which the test
uses as the oracle.

Scale posture:

- State is one small tuple per key, partitioned by the grouping key
  across executors.
- ``expire_idle=True`` arms ``GroupStateTimeout.EventTimeTimeout``: a
  key whose last event is more than ``gap_sec`` behind the watermark
  emits its final tally and DROPS its state — without this, a 100 TB
  corpus of transient users grows state without bound. Requires a
  watermark on the event-time column (applied here).
- The state backend is whatever ``spark.sql.streaming.stateStore
  .providerClass`` names; tests exercise both the default HDFS-backed
  store and RocksDB (`RocksDBStateStoreProvider`), which keeps state
  off-heap and scales past executor memory — the right choice for
  large keyspaces.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_SCHEMA = "user_id long, session_cnt long, last_ts double"
STATE_SCHEMA = "session_cnt long, last_ts double"

_GAP_SEC = 1800.0


def _sessionize(key, pdf_iter: Iterator[pd.DataFrame], state: GroupState):
    (user_id,) = key
    if state.exists:
        session_cnt, last_ts = state.get
    else:
        session_cnt, last_ts = 0, None

    session_cnt, last_ts = _advance(session_cnt, last_ts, _sorted_ts(pdf_iter))

    state.update((session_cnt, last_ts))
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "session_cnt": [session_cnt],
            "last_ts": [last_ts],
        }
    )


def _advance(
    session_cnt: int, last_ts: float | None, batch_ts: list[float]
) -> tuple[int, float | None]:
    """Evolve (session_cnt, last_ts) over one micro-batch's sorted
    timestamps. ``last_ts`` is MONOTONE: a cross-batch late event (ts <
    last_ts — applyInPandasWithState does NOT drop late rows, the
    watermark only drives timeouts) must not drag the frontier
    backwards, or the next in-order event measures its gap against the
    late straggler and opens a PHANTOM session (e.g. state last=1000,
    batch [100, 2000], gap 1800: regressing to 100 makes 2000 look
    1900 away — one session becomes two). With the monotone frontier a
    late event simply joins the newest session; it still cannot
    retroactively MERGE two sessions that were already counted as
    separate — that would need emitted-count retraction, which the
    update output mode cannot express. Stated honestly in the module
    docstring; in-order streams match the batch twin exactly
    (stream==batch tests)."""
    for ts in batch_ts:
        if last_ts is None or ts - last_ts > _GAP_SEC:
            session_cnt += 1
        last_ts = ts if last_ts is None else max(last_ts, ts)
    return session_cnt, last_ts


def _sorted_ts(pdf_iter: Iterator[pd.DataFrame]) -> list[float]:
    """All of the group's timestamps for this micro-batch, sorted
    GLOBALLY. The iterator chunks the group at the Arrow batch size
    with no cross-chunk ordering guarantee, so sorting per-chunk would
    run the gap detector over out-of-order data whenever a key's batch
    spans multiple chunks; the buffer is bounded by the key's rows in
    ONE micro-batch (the same working set pandas grouping holds
    anyway)."""
    all_ts: list[float] = []
    for pdf in pdf_iter:
        all_ts.extend(pdf["ts_sec"].tolist())
    all_ts.sort()
    return all_ts


def _sessionize_expiring(key, pdf_iter: Iterator[pd.DataFrame], state: GroupState):
    """EventTimeTimeout variant: on timeout, emit the final tally and
    drop the key's state; a returning key starts a fresh count."""
    (user_id,) = key

    if state.hasTimedOut:
        session_cnt, last_ts = state.get
        state.remove()
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "session_cnt": [session_cnt],
                "last_ts": [last_ts],
            }
        )
        return

    if state.exists:
        session_cnt, last_ts = state.get
    else:
        session_cnt, last_ts = 0, None

    session_cnt, last_ts = _advance(session_cnt, last_ts, _sorted_ts(pdf_iter))

    state.update((session_cnt, last_ts))
    # Expire once the watermark passes the session gap after the last
    # event; the timestamp must lead the current watermark or Spark
    # rejects it.
    expire_ms = int((last_ts + _GAP_SEC) * 1000)
    state.setTimeoutTimestamp(max(expire_ms, state.getCurrentWatermarkMs() + 1))
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "session_cnt": [session_cnt],
            "last_ts": [last_ts],
        }
    )


def sessionize_stream(
    events: DataFrame,
    expire_idle: bool = False,
    watermark_delay: str = "10 minutes",
) -> DataFrame:
    """Per-user running session counts over an events frame with
    columns (user_id, ts).

    Streaming input → `applyInPandasWithState` (state carries across
    micro-batches). Batch input → the exact lag-window twin (Spark
    forbids applyInPandasWithState in batch queries), so callers get
    one operator for both modes with identical results on bounded data.

    ``expire_idle=True`` (streaming only) arms EventTimeTimeout: keys
    idle past the session gap relative to the watermark emit their
    final count and free their state.
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    if not events.isStreaming:
        w = Window.partitionBy("user_id").orderBy("ts")
        ts = F.col("ts").cast("double")
        prev = F.lag(F.col("ts")).over(w).cast("double")
        starts = events.select(
            "user_id",
            F.when(prev.isNull() | (ts - prev > _GAP_SEC), 1).otherwise(0).alias("s"),
            ts.alias("ts_sec"),
        )
        return starts.groupBy("user_id").agg(
            F.sum("s").cast("long").alias("session_cnt"),
            F.max("ts_sec").alias("last_ts"),
        )

    if expire_idle:
        prepared = events.withWatermark("ts", watermark_delay).select(
            "user_id", "ts", F.col("ts").cast("double").alias("ts_sec")
        )
        return prepared.groupBy("user_id").applyInPandasWithState(
            _sessionize_expiring,
            outputStructType=SESSION_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )

    prepared = events.select(
        "user_id", F.col("ts").cast("double").alias("ts_sec")
    )
    return prepared.groupBy("user_id").applyInPandasWithState(
        _sessionize,
        outputStructType=SESSION_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
