"""Custom stateful streaming operator: gap-based sessionization.

The reference has no streaming surface; this is the engine's extension
point for operators that Structured Streaming's built-in windows cannot
express — arbitrary per-key state evolved batch-by-batch via
`applyInPandasWithState` (Arrow-batched, GroupState-backed).

The example operator counts gap-delimited sessions per user (a new
session starts after `gap_sec` of inactivity). Its batch twin is the
`sessionized_gaps` suite query (lag-window formulation), which the test
uses as the oracle.

Scale: state is one small tuple per key, partitioned by the grouping
key across executors; late/out-of-order data within a batch is handled
by sorting the batch, and a production deployment would add a watermark
timeout (`GroupStateTimeout.EventTimeTimeout`) to expire idle keys.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_SCHEMA = "user_id long, session_cnt long, last_ts double"
STATE_SCHEMA = "session_cnt long, last_ts double"


def _sessionize(key, pdf_iter: Iterator[pd.DataFrame], state: GroupState):
    (user_id,) = key
    if state.exists:
        session_cnt, last_ts = state.get
    else:
        session_cnt, last_ts = 0, None

    gap_sec = 1800.0
    for pdf in pdf_iter:
        for ts in sorted(pdf["ts_sec"]):
            if last_ts is None or ts - last_ts > gap_sec:
                session_cnt += 1
            last_ts = ts

    state.update((session_cnt, last_ts))
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "session_cnt": [session_cnt],
            "last_ts": [last_ts],
        }
    )


def sessionize_stream(events: DataFrame) -> DataFrame:
    """Per-user running session counts over an events frame with
    columns (user_id, ts).

    Streaming input → `applyInPandasWithState` (state carries across
    micro-batches). Batch input → the exact lag-window twin (Spark
    forbids applyInPandasWithState in batch queries), so callers get
    one operator for both modes with identical results on bounded data.
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    if not events.isStreaming:
        w = Window.partitionBy("user_id").orderBy("ts")
        ts = F.col("ts").cast("double")
        prev = F.lag(F.col("ts")).over(w).cast("double")
        starts = events.select(
            "user_id",
            F.when(prev.isNull() | (ts - prev > 1800.0), 1).otherwise(0).alias("s"),
            ts.alias("ts_sec"),
        )
        return starts.groupBy("user_id").agg(
            F.sum("s").cast("long").alias("session_cnt"),
            F.max("ts_sec").alias("last_ts"),
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
