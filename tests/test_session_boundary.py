"""Session-window boundary semantics: Spark's session extent is CLOSED
at the end — an event exactly `gap` after the previous one merges into
the SAME session; only a strictly larger gap opens a new one. The
DuckDB oracle must reproduce that boundary rule (island marker
`> gap`, not `>= gap`).
"""

from __future__ import annotations

import datetime as dt
import os

import duckdb

from data_pipelines_spark.suite import temporal

GAP = 1800  # seconds, matches the registered query


def _write_events(spark, sf_dir: str) -> None:
    t0 = dt.datetime(2026, 1, 1, 0, 0, 0)
    rows = [
        # user u1: second event lands exactly GAP after the first →
        # SAME session (closed boundary); third is GAP+1 after the
        # second → NEW session.
        (1, 1, t0, "view", 1.0, '{"k": 1}'),
        (2, 1, t0 + dt.timedelta(seconds=GAP), "view", 2.0, '{"k": 2}'),
        (3, 1, t0 + dt.timedelta(seconds=2 * GAP + 1), "view", 3.0,
         '{"k": 3}'),
        # user u2: one event below the boundary → a single session.
        (4, 2, t0, "view", 4.0, '{"k": 14}'),
        (5, 2, t0 + dt.timedelta(seconds=GAP - 1), "view", 5.0,
         '{"k": 15}'),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, user_id long, ts timestamp, event_type string, "
        "value double, props string",
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(sf_dir, "events.parquet")
    )


def test_exact_gap_merges_same_session(spark, tmp_path):
    sf_dir = str(tmp_path)
    _write_events(spark, sf_dir)

    out = {
        (r.user_id, r.session_no): r.event_cnt
        for r in temporal.QUERIES["session_windows_suite"](spark, sf_dir).collect()
        if r.method == "native"
    }
    assert out == {(1, 1): 2, (1, 2): 1, (2, 1): 2}


def test_oracle_agrees_on_boundary(spark, tmp_path):
    sf_dir = str(tmp_path)
    _write_events(spark, sf_dir)

    spark_rows = sorted(
        tuple(r)
        for r in temporal.QUERIES["session_windows_suite"](spark, sf_dir).collect()
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{os.path.join(sf_dir, 'events.parquet')}/*.parquet'"
    )
    duck_rows = sorted(
        tuple(r) for r in con.execute(temporal.ORACLES["session_windows_suite"]).fetchall()
    )
    assert spark_rows == duck_rows
