"""Temporal operators: date arithmetic (reference F2-F4) and the
windowed-aggregation shape the streaming extension reuses (§2.10).

The batch tumbling-window query here is the exact batch twin of
``streaming/events.py`` — Structured Streaming runs the same plan with a
watermark; the driver's oracle check runs the batch side.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from data_pipelines_spark.session import tune
from data_pipelines_spark.sources.tables import load_events, load_table
from data_pipelines_spark.suite._registry import make_registry

QUERIES, ORACLES, register = make_registry()


@register(
    "date_arithmetic",
    """
    SELECT ship_date,
           ship_date - 1 AS prev_day,
           CAST(ship_date - DATE '1992-01-01' AS BIGINT) AS days_since_epoch,
           line_cnt
    FROM (
        SELECT CAST(l_shipdate AS DATE) AS ship_date, count(*) AS line_cnt
        FROM lineitem GROUP BY 1
    )
    """,
)
def date_arithmetic(spark, sf_dir):
    """F2/F3/F4: timestamp→date, date−1day, day-difference arithmetic
    (reference `discharge.py:273-281`)."""
    tune(spark)
    li = load_table(spark, sf_dir, "lineitem")
    g = li.groupBy(F.to_date("l_shipdate").alias("ship_date")).agg(
        F.count(F.lit(1)).alias("line_cnt")
    )
    return g.select(
        "ship_date",
        F.date_sub(F.col("ship_date"), 1).alias("prev_day"),
        F.datediff(F.col("ship_date"), F.to_date(F.lit("1992-01-01")))
        .cast("long")
        .alias("days_since_epoch"),
        "line_cnt",
    )


@register(
    "events_tumbling_window",
    """
    SELECT strftime(time_bucket(INTERVAL 1 HOUR, ts), '%Y-%m-%d %H:%M:%S')
               AS window_start,
           event_type,
           count(*)   AS event_cnt,
           min(value) AS min_value,
           max(value) AS max_value,
           CAST(sum(CAST(value AS DECIMAL(18, 6))) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
)
def events_tumbling_window(spark, sf_dir):
    """Tumbling 1-hour window aggregation on the event stream table —
    the batch twin of the streaming extension (SURVEY.md §2.10). The
    window start is rendered as a canonical UTC string so engines agree
    on representation."""
    tune(spark)
    ev = load_events(spark, sf_dir)
    win = F.window(F.col("ts"), "1 hour")
    return (
        ev.groupBy(win.alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("event_cnt"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sum_value"),
        )
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "event_cnt",
            "min_value",
            "max_value",
            "sum_value",
        )
    )


@register(
    "sessionized_gaps",
    """
    SELECT user_id,
           count(*) AS session_cnt
    FROM (
        SELECT user_id,
               CASE WHEN prev_ts IS NULL
                         OR epoch(ts) - epoch(prev_ts) > 1800 THEN 1
                    ELSE 0 END AS is_session_start
        FROM (
            SELECT user_id, ts,
                   lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
            FROM events
        )
    )
    WHERE is_session_start = 1
    GROUP BY 1
    """,
)
def sessionized_gaps(spark, sf_dir):
    """Gap-based sessionization (30-min inactivity) via lag() — the
    batch equivalent of a session window, counting sessions per user.
    Extension beyond reference parity (it has no event streams)."""
    tune(spark)
    from pyspark.sql import Window

    ev = load_events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    lagged = ev.select(
        "user_id",
        "ts",
        F.lag("ts").over(w).alias("prev_ts"),
    )
    starts = lagged.select(
        "user_id",
        F.when(
            F.col("prev_ts").isNull()
            | (F.col("ts").cast("double") - F.col("prev_ts").cast("double") > 1800),
            1,
        )
        .otherwise(0)
        .alias("is_session_start"),
    )
    return (
        starts.where(F.col("is_session_start") == 1)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("session_cnt"))
    )


@register(
    "events_props_json",
    """
    SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_bucket,
           event_type,
           count(*) AS event_cnt
    FROM events
    GROUP BY 1, 2
    """,
)
def events_props_json(spark, sf_dir):
    """Semi-structured processing: extract a field from the JSON props
    column (get_json_object — JVM-side JSON path evaluation) and
    aggregate on it."""
    tune(spark)
    ev = load_events(spark, sf_dir)
    return (
        ev.select(
            (F.get_json_object("props", "$.k").cast("long") % 10).alias("k_bucket"),
            "event_type",
        )
        .groupBy("k_bucket", "event_type")
        .agg(F.count(F.lit(1)).alias("event_cnt"))
    )


@register(
    "events_session_windows",
    """
    WITH marked AS (
        SELECT user_id, ts, event_id,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR epoch(ts) - epoch(lag(ts) OVER w) > 1800
                    THEN 1 ELSE 0 END AS is_start
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sessions AS (
        SELECT user_id, ts,
               sum(is_start) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                   ROWS UNBOUNDED PRECEDING) AS session_no
        FROM marked
    )
    SELECT user_id, CAST(session_no AS BIGINT) AS session_no,
           count(*) AS event_cnt,
           strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start
    FROM sessions
    GROUP BY 1, 2
    """,
)
def events_session_windows(spark, sf_dir):
    """Native session windows (30-min gap): Spark's session_window
    groups directly; the oracle reconstructs the same sessions with the
    classic gaps-and-islands SQL. Session numbering is by start order
    per user so both sides share keys.

    Boundary semantics: Spark's session extent is CLOSED at the end —
    an event exactly ``gap`` after the last one merges into the SAME
    session (verified by tests/test_session_boundary.py), so the
    oracle's island marker is strictly ``> 1800``. The running session
    number is cast to BIGINT because DuckDB's integer SUM returns
    HUGEINT (int128), which the driver's canonicalizer renders as
    float64 and hashes differently from Spark's LONG — that cast was
    the round-1 hash mismatch.
    The cumulative-sum window carries the same (ts, event_id) tie-break
    as the lag() marker so equal-timestamp events at a session boundary
    land deterministically on the same side in both engines."""
    from pyspark.sql import Window

    tune(spark)
    ev = load_events(spark, sf_dir)
    sw = (
        ev.groupBy(F.session_window(F.col("ts"), "30 minutes"), "user_id")
        .agg(F.count(F.lit(1)).alias("event_cnt"))
        .select(
            "user_id",
            F.col("session_window.start").alias("start_ts"),
            "event_cnt",
        )
    )
    w = Window.partitionBy("user_id").orderBy("start_ts")
    return sw.select(
        "user_id",
        F.row_number().over(w).cast("long").alias("session_no"),
        "event_cnt",
        F.date_format("start_ts", "yyyy-MM-dd HH:mm:ss").alias("session_start"),
    )
