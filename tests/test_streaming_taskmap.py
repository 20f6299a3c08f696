"""Streaming extension + task-map tests."""

from __future__ import annotations

import datetime as dt
import shutil
import tempfile

from data_pipelines_spark.operators.taskmap import task_map
from data_pipelines_spark.streaming.events import (
    stream_events_from_dir,
    windowed_event_aggregation,
)


def _events(spark):
    base = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        (i, base + dt.timedelta(minutes=17 * i), "click" if i % 2 else "view", float(i))
        for i in range(20)
    ]
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, event_type string, value double"
    )


def test_streaming_window_agg_equals_batch(spark):
    ev = _events(spark)
    batch = windowed_event_aggregation(ev).collect()

    tmp = tempfile.mkdtemp(prefix="dps_stream_")
    try:
        ev.write.mode("overwrite").parquet(f"{tmp}/in")
        stream = stream_events_from_dir(spark, f"{tmp}/in", ev.schema)
        agg = windowed_event_aggregation(stream)
        q = (
            agg.writeStream.format("memory")
            .queryName("win_test")
            .outputMode("complete")
            .option("checkpointLocation", f"{tmp}/ckpt")
            .start()
        )
        q.processAllAvailable()
        streamed = spark.sql("SELECT * FROM win_test").collect()
        q.stop()
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

    key = lambda r: (r["window_start"], r["event_type"])
    b = {key(r): (r["event_cnt"], r["min_value"], r["max_value"]) for r in batch}
    s = {key(r): (r["event_cnt"], r["min_value"], r["max_value"]) for r in streamed}
    assert b == s and len(b) > 0


def test_task_map_success_and_retry_capture(spark):
    def handler(task):
        if task == "boom":
            raise ValueError("exploding task")
        return task.upper()

    out = task_map(spark, ["a", "boom", "c"], handler, max_retries=1)
    rows = {r["task_id"]: r for r in out.collect()}
    assert rows[0]["ok"] and rows[0]["result"] == "A"
    assert not rows[1]["ok"] and "exploding task" in rows[1]["error"]
    assert rows[1]["attempts"] == 2  # 1 try + 1 retry
    assert rows[2]["ok"] and rows[2]["result"] == "C"
