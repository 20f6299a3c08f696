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
    "events_windowed_agg",
    """
    WITH tumble AS (
        SELECT 'tumble' AS q,
               strftime(time_bucket(INTERVAL 1 HOUR, ts),
                        '%Y-%m-%d %H:%M:%S') AS window_start,
               event_type,
               count(*)   AS event_cnt,
               min(value) AS min_value,
               max(value) AS max_value,
               CAST(sum(CAST(value AS DECIMAL(18, 6))) AS DOUBLE) AS sum_value
        FROM events
        GROUP BY 2, 3
    ),
    assigned AS (
        SELECT time_bucket(INTERVAL 30 MINUTE, ts) AS ws, event_type, value
        FROM events
        UNION ALL
        SELECT time_bucket(INTERVAL 30 MINUTE, ts) - INTERVAL 30 MINUTE AS ws,
               event_type, value
        FROM events
    ),
    slide AS (
        SELECT 'slide' AS q,
               strftime(ws, '%Y-%m-%d %H:%M:%S') AS window_start,
               event_type,
               count(*)   AS event_cnt,
               min(value) AS min_value,
               max(value) AS max_value,
               CAST(sum(CAST(value AS DECIMAL(18, 6))) AS DOUBLE) AS sum_value
        FROM assigned
        GROUP BY 2, 3
    )
    SELECT * FROM tumble UNION ALL SELECT * FROM slide
    """,
)
def events_windowed_agg(spark, sf_dir):
    """Tumbling (1 h) + sliding (1 h size, 30 min slide) window
    aggregations on the event stream table in one suite entry — the
    batch twins of the streaming extension (SURVEY.md §2.10; merges the
    former events_tumbling_window / events_sliding_window entries,
    registry trim). Each sliding event lands in two overlapping
    windows; the oracle reproduces that with an explicit two-assignment
    union. Window starts are rendered as canonical UTC strings so
    engines agree on representation."""
    tune(spark)
    ev = load_events(spark, sf_dir)

    # r14: two-level aggregation instead of two fact-sized window aggs.
    # Every output window start is 30-min aligned, so ONE pass
    # pre-aggregates the stream at exact 30-min grain (count/min/max
    # compose; the DECIMAL sum is exact and associative, cast to double
    # only at the end), then each tiny pre-aggregated bucket fans out to
    # its window assignments — the 1 h tumble bucket, and the two 1 h/
    # 30 min sliding windows F.window() would have assigned each event
    # to — and a second bucket-grained aggregate finishes. The fact
    # table is scanned and shuffled ONCE (partial-agg-compressed)
    # instead of twice with an Expand doubling the slide branch's rows
    # (guide §2.3 "aggregate before you shuffle"). The null-ts filter
    # mirrors F.window's null-dropping semantics.
    step_us = 30 * 60 * 1_000_000  # 30-min slide/bucket width in µs
    us = F.unix_micros(F.col("ts"))
    l1 = (
        ev.where(F.col("ts").isNotNull())
        .select(
            (us - F.pmod(us, F.lit(step_us))).alias("__b"),
            "event_type",
            "value",
        )
        .groupBy("__b", "event_type")
        .agg(
            F.count(F.lit(1)).alias("__c"),
            F.min("value").alias("__mn"),
            F.max("value").alias("__mx"),
            F.sum(F.col("value").cast("decimal(18,6)")).alias("__s"),
        )
    )
    b = F.col("__b")
    hour_start = b - F.pmod(b, F.lit(2 * step_us))
    assigned = l1.select(
        F.explode(
            F.array(
                F.struct(F.lit("tumble").alias("q"), hour_start.alias("ws")),
                F.struct(F.lit("slide").alias("q"), b.alias("ws")),
                F.struct(
                    F.lit("slide").alias("q"), (b - step_us).alias("ws")
                ),
            )
        ).alias("__w"),
        "__c",
        "__mn",
        "__mx",
        "__s",
        "event_type",
    ).select(
        F.col("__w.q").alias("q"),
        F.col("__w.ws").alias("__ws"),
        "event_type",
        "__c",
        "__mn",
        "__mx",
        "__s",
    )
    return (
        assigned.groupBy("q", "__ws", "event_type")
        .agg(
            F.sum("__c").alias("event_cnt"),
            F.min("__mn").alias("min_value"),
            F.max("__mx").alias("max_value"),
            F.sum("__s").cast("double").alias("sum_value"),
        )
        .select(
            "q",
            F.date_format(
                F.timestamp_micros(F.col("__ws")), "yyyy-MM-dd HH:mm:ss"
            ).alias("window_start"),
            "event_type",
            "event_cnt",
            "min_value",
            "max_value",
            "sum_value",
        )
    )


_RESAMPLE_SEC = 6 * 3600  # 6-hour buckets over the 30-day event span
_RESAMPLE_SQL = f"""
    WITH b AS (
        SELECT user_id,
               (epoch_us(ts) - epoch_us(ts) % {_RESAMPLE_SEC * 1_000_000})
                   // 1000000 AS bucket_epoch,
               count(*) AS n_events,
               CAST(sum(CAST(value AS DECIMAL(18, 6))) AS DOUBLE) AS sum_value
        FROM events
        GROUP BY 1, 2
    ),
    spans AS (
        SELECT user_id, min(bucket_epoch) AS mn, max(bucket_epoch) AS mx
        FROM b GROUP BY 1
    ),
    grid AS (
        SELECT user_id,
               unnest(range(mn, mx + {_RESAMPLE_SEC}, {_RESAMPLE_SEC}))
                   AS bucket_epoch
        FROM spans
    ),
    g AS (
        SELECT grid.user_id, grid.bucket_epoch,
               COALESCE(b.n_events, 0) AS n_events,
               b.sum_value
        FROM grid LEFT JOIN b USING (user_id, bucket_epoch)
    )
    SELECT user_id, bucket_epoch, n_events, sum_value,
           last_value(sum_value IGNORE NULLS) OVER w_prev AS ffill_value,
           CASE WHEN sum_value IS NOT NULL THEN sum_value
                ELSE last_value(sum_value IGNORE NULLS) OVER w_prev
                     + (first_value(sum_value IGNORE NULLS) OVER w_next
                        - last_value(sum_value IGNORE NULLS) OVER w_prev)
                       * (CAST(bucket_epoch AS DOUBLE)
                          - last_value(CASE WHEN sum_value IS NOT NULL
                                            THEN CAST(bucket_epoch AS DOUBLE) END
                                       IGNORE NULLS) OVER w_prev)
                       / (first_value(CASE WHEN sum_value IS NOT NULL
                                           THEN CAST(bucket_epoch AS DOUBLE) END
                                      IGNORE NULLS) OVER w_next
                          - last_value(CASE WHEN sum_value IS NOT NULL
                                            THEN CAST(bucket_epoch AS DOUBLE) END
                                       IGNORE NULLS) OVER w_prev)
           END AS interp_value
    FROM g
    WINDOW w_prev AS (PARTITION BY user_id ORDER BY bucket_epoch
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
           w_next AS (PARTITION BY user_id ORDER BY bucket_epoch
                      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
"""


@register("events_resample_fill", _RESAMPLE_SQL)
def events_resample_fill(spark, sf_dir):
    """Time-series regularization (`operators/timeseries.py`): resample
    each user's irregular event stream onto an epoch-aligned 6-hour
    grid with every gap bucket materialized, then carry values across
    gaps two ways — forward fill (locf) and linear interpolation — the
    TimescaleDB ``time_bucket_gapfill``/``locf``/``interpolate``
    semantics as Spark dataflows.

    Bucketing is exact integer µs arithmetic (``us - us % step``), the
    per-key grid comes from ``sequence``+``explode`` over a key-grained
    span aggregate (grid size = keys x span/interval, independent of
    event count), and both fills are single window passes with linear
    per-key state — nothing global, nothing quadratic. The lerp is
    plain double arithmetic evaluated in the same expression shape in
    both engines, so the hashes match bit-for-bit with no rounding."""
    from data_pipelines_spark.operators.timeseries import resample_filled

    tune(spark)
    ev = load_events(spark, sf_dir)
    # Fused resample+locf+lerp (r15): the fill neighbours are resolved
    # at BUCKET grain inside the gap explode's own window pass, so the
    # dense grid is never re-sorted or re-windowed — bit-identical to
    # the resample() -> interpolate_linear(locf_col=...) composition
    # (equivalence pinned in tests/test_timeseries.py, oracle
    # re-verified; the composed form paid a dense-grid sort plus four
    # running aggregates over keys x span/interval rows).
    interp = resample_filled(
        ev, ["user_id"], "ts", "value", _RESAMPLE_SEC,
        interp_col="interp_value", locf_col="ffill_value",
    )
    return interp.select(
        "user_id", "bucket_epoch", "n_events", "sum_value",
        "ffill_value", "interp_value",
    )


def _sessionized_gaps_frame(spark, sf_dir):
    """Gap-based sessionization (30-min inactivity) via lag() — the
    batch equivalent of a session window, counting sessions per user.
    One of the two tiers of ``session_windows_suite``."""
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


# The JSON-props aggregation is the `props` tier of
# `session_windows_suite` (below) — fused to free a driver-sweep slot
# for `fetch_task_suite`.


@register(
    "session_windows_suite",
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
    SELECT 'native' AS method, user_id,
           CAST(session_no AS BIGINT) AS session_no,
           count(*) AS event_cnt,
           strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start
    FROM sessions
    GROUP BY 2, 3
    UNION ALL
    SELECT 'gaps', user_id, CAST(NULL AS BIGINT), session_cnt,
           CAST(NULL AS VARCHAR)
    FROM (
        SELECT user_id, count(*) AS session_cnt
        FROM (
            SELECT user_id,
                   CASE WHEN lag(ts) OVER (PARTITION BY user_id
                                           ORDER BY ts, event_id) IS NULL
                             OR epoch(ts) - epoch(lag(ts) OVER (
                                 PARTITION BY user_id ORDER BY ts, event_id))
                                > 1800
                        THEN 1 ELSE 0 END AS is_session_start
            FROM events
        )
        WHERE is_session_start = 1
        GROUP BY 1
    )
    UNION ALL
    SELECT 'props' AS method, k_bucket AS user_id,
           CAST(NULL AS BIGINT) AS session_no, event_cnt,
           event_type AS session_start
    FROM (
        SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) % 10
                   AS k_bucket,
               event_type, count(*) AS event_cnt
        FROM events
        GROUP BY 1, 2
    )
    """,
)
def session_windows_suite(spark, sf_dir):
    """Both sessionization tiers fused at a (method, user_id,
    session_no, event_cnt, session_start) melt — the fusion freed a
    driver-sweep slot for the streaming-sink readback entry while each
    tier keeps its own hash check (method tag):

    - ``native``: Spark's session_window (30-min gap) grouped directly;
      the oracle reconstructs the same sessions with the classic
      gaps-and-islands SQL. Session numbering is by start order per
      user so both sides share keys.
    - ``gaps``: lag()-marker sessionization counting sessions per user
      (session_no/session_start NULL at this grain).
    - ``props``: the formerly standalone JSON-props aggregation
      (get_json_object — JVM-side JSON path evaluation over the
      ``props`` column), melted onto the same shape: ``user_id``
      carries the extracted k-bucket, ``session_start`` the
      event_type. Fused round 7 to free a slot for
      ``fetch_task_suite``.

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
    native = sw.select(
        F.lit("native").alias("method"),
        "user_id",
        F.row_number().over(w).cast("long").alias("session_no"),
        "event_cnt",
        F.date_format("start_ts", "yyyy-MM-dd HH:mm:ss").alias("session_start"),
    )
    gaps = _sessionized_gaps_frame(spark, sf_dir).select(
        F.lit("gaps").alias("method"),
        "user_id",
        F.lit(None).cast("long").alias("session_no"),
        F.col("session_cnt").alias("event_cnt"),
        F.lit(None).cast("string").alias("session_start"),
    )
    props = (
        ev.select(
            (F.get_json_object("props", "$.k").cast("long") % 10)
            .alias("user_id"),
            "event_type",
        )
        .groupBy("user_id", "event_type")
        .agg(F.count(F.lit(1)).alias("event_cnt"))
        .select(
            F.lit("props").alias("method"),
            "user_id",
            F.lit(None).cast("long").alias("session_no"),
            "event_cnt",
            F.col("event_type").alias("session_start"),
        )
    )
    return native.unionByName(gaps).unionByName(props)
