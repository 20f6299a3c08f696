"""Second tier of relational coverage: anti join, scalar subquery,
pivot, cube, frame-spec windows, top-k per group.

Same determinism rules as suite/analytics.py.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from data_pipelines_spark.operators.joins import interval_join
from data_pipelines_spark.session import tune
from data_pipelines_spark.sources.tables import load_events, load_table
from data_pipelines_spark.suite._registry import make_registry

QUERIES, ORACLES, register = make_registry()

PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]


_PIVOT_FILTERS = ", ".join(
    "count(*) FILTER (WHERE o.o_orderpriority = " + repr(p) + ') AS "' + p + '"'
    for p in PRIORITIES
)

_SUBQUERY_PIVOT_SQL = f"""
WITH above_median AS (
    SELECT 'above_median' AS q, o_orderpriority AS k1, '' AS k2,
           count(*) AS cnt, CAST(NULL AS DOUBLE) AS val
    FROM orders
    WHERE o_totalprice > (
        SELECT CAST(quantile_cont(o_totalprice, 0.5) AS DOUBLE) FROM orders
    )
    GROUP BY 2
),
pivot_wide AS (
    SELECT c.c_mktsegment, {_PIVOT_FILTERS}
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY 1
),
pivot_long AS (
    SELECT 'pivot' AS q, c_mktsegment AS k1, pr AS k2, cnt,
           CAST(NULL AS DOUBLE) AS val
    FROM pivot_wide
    UNPIVOT (cnt FOR pr IN ({", ".join('"' + p + '"' for p in PRIORITIES)}))
),
cube_fs AS (
    SELECT 'cube' AS q,
           COALESCE(l_returnflag, 'ALL') AS k1,
           COALESCE(l_linestatus, 'ALL') AS k2,
           count(*) AS cnt,
           sum(l_quantity) AS val
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
),
corr_min AS (
    SELECT 'corr_min' AS q, CAST(p.p_partkey AS VARCHAR) AS k1, '' AS k2,
           CAST(NULL AS BIGINT) AS cnt, p.p_retailprice AS val
    FROM part p
    WHERE p.p_retailprice = (
        SELECT min(p2.p_retailprice) FROM part p2 WHERE p2.p_brand = p.p_brand
    )
),
idle AS (
    SELECT 'idle' AS q, CAST(c.c_custkey AS VARCHAR) AS k1,
           c.c_mktsegment AS k2,
           CAST(NULL AS BIGINT) AS cnt, CAST(NULL AS DOUBLE) AS val
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
)
SELECT * FROM above_median UNION ALL SELECT * FROM pivot_long
UNION ALL SELECT * FROM cube_fs UNION ALL SELECT * FROM corr_min
UNION ALL SELECT * FROM idle
"""


@register("subquery_pivot_suite", _SUBQUERY_PIVOT_SQL)
def subquery_pivot_suite(spark, sf_dir):
    """Scalar subquery + pivot + cube + correlated subquery in one
    driver sweep entry, normalized to the (q, k1, k2, cnt, val) grain
    (registry trim — frees sweep budget for the TPC-H suite; every
    operator stays individually hash-checked through its branch rows).

    Branches:
    - ``above_median``: orders above the exact global median total
      price (1-row sort-based median, broadcast back as the filter).
    - ``pivot``: groupBy().pivot() long→wide counts, unpivoted back to
      the uniform grain with stack() — the pivot still runs; stack is
      its inverse surface.
    - ``cube``: all 2^2 grouping sets with sentinel subtotal keys.
    - ``corr_min``: TPC-H Q2-shaped correlated min subquery,
      decorrelated by Catalyst into an aggregate + join.
    - ``idle``: left-anti join (customers that never ordered — the
      complement of the reference's semi-filter J4), routed through
      ``plans.skew.skew_split_join`` with pinned hot keys so the
      hot/cold split join is oracle-checked here (its output equals
      the plain anti join for any hot list — unit-proven).
    """
    tune(spark)
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")

    null_d = F.lit(None).cast("double")
    null_l = F.lit(None).cast("long")

    med = orders.agg(F.median("o_totalprice").alias("m"))
    above = (
        orders.join(F.broadcast(med))
        .where(F.col("o_totalprice") > F.col("m"))
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            F.lit("above_median").alias("q"),
            F.col("o_orderpriority").alias("k1"),
            F.lit("").alias("k2"),
            F.col("cnt").cast("long").alias("cnt"),
            null_d.alias("val"),
        )
    )

    wide = (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("c_mktsegment")
        .pivot("o_orderpriority", PRIORITIES)
        .count()
        .na.fill(0)
    )
    stack_args = ", ".join(f"'{p}', `{p}`" for p in PRIORITIES)
    pivot_long = wide.selectExpr(
        "'pivot' AS q",
        "c_mktsegment AS k1",
        f"stack({len(PRIORITIES)}, {stack_args}) AS (k2, cnt)",
        "CAST(NULL AS DOUBLE) AS val",
    ).select("q", "k1", "k2", F.col("cnt").cast("long").alias("cnt"), "val")

    cube_fs = (
        li.cube("l_returnflag", "l_linestatus")
        .agg(F.count(F.lit(1)).alias("cnt"), F.sum("l_quantity").alias("val"))
        .select(
            F.lit("cube").alias("q"),
            F.coalesce(F.col("l_returnflag"), F.lit("ALL")).alias("k1"),
            F.coalesce(F.col("l_linestatus"), F.lit("ALL")).alias("k2"),
            F.col("cnt").cast("long").alias("cnt"),
            F.col("val").cast("double").alias("val"),
        )
    )

    part.createOrReplaceTempView("__part_corr")
    corr_min = spark.sql(
        """
        SELECT 'corr_min' AS q, CAST(p.p_partkey AS STRING) AS k1, '' AS k2,
               CAST(NULL AS BIGINT) AS cnt, p.p_retailprice AS val
        FROM __part_corr p
        WHERE p.p_retailprice = (
            SELECT min(p2.p_retailprice) FROM __part_corr p2
            WHERE p2.p_brand = p.p_brand
        )
        """
    ).select("q", "k1", "k2", null_l.alias("cnt"), F.col("val").cast("double").alias("val"))

    # The anti join runs through skew_split_join with a pinned hot-key
    # list so the hot/cold split machinery (broadcast anti on the hot
    # branch, shuffle anti on the cold, union) is hash-checked against
    # the plain NOT EXISTS oracle every driver sweep — the result is
    # provably identical to the plain anti join for ANY hot list
    # (unit-tested property), so the pinned keys only pick the plan.
    from data_pipelines_spark.plans.skew import skew_split_join

    idle = (
        skew_split_join(
            cust,
            orders.select(F.col("o_custkey").alias("c_custkey")),
            ["c_custkey"],
            how="left_anti",
            hot_keys=[1, 2, 3],
        )
        .select(
            F.lit("idle").alias("q"),
            F.col("c_custkey").cast("string").alias("k1"),
            F.col("c_mktsegment").alias("k2"),
            null_l.alias("cnt"),
            null_d.alias("val"),
        )
    )

    return (
        above.unionByName(pivot_long)
        .unionByName(cube_fs)
        .unionByName(corr_min)
        .unionByName(idle)
    )


@register(
    "event_window_frames",
    """
    WITH frames AS (
        SELECT event_id, user_id, value,
               lag(value)  OVER o AS prev_value,
               lead(value) OVER o AS next_value,
               count(*) OVER w AS frame_cnt,
               min(value) OVER w AS frame_min,
               max(value) OVER w AS frame_max,
               CAST(sum(CAST(value AS DECIMAL(18, 6))) OVER w AS DOUBLE)
                   AS frame_sum,
               count(*) OVER r AS range_cnt_1h,
               CAST(sum(CAST(value AS DECIMAL(18, 6))) OVER r AS DOUBLE)
                   AS range_sum_1h
        FROM events
        WINDOW o AS (PARTITION BY user_id ORDER BY ts, event_id),
               w AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN 2 PRECEDING AND CURRENT ROW),
               r AS (PARTITION BY user_id ORDER BY epoch_us(ts)
                     RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
    ),
    wins AS (
        SELECT ts AS w_start, ts + INTERVAL 30 MINUTE AS w_end
        FROM events WHERE event_type = 'error'
    ),
    covered AS (
        SELECT e.event_id, count(*) AS n_error_windows
        FROM events e
        JOIN wins w ON e.ts >= w.w_start AND e.ts <= w.w_end
        GROUP BY e.event_id
    ),
    overlapped AS (
        SELECT e.event_id, count(*) AS n_overlap_error_windows
        FROM events e
        JOIN wins w
          ON e.ts - INTERVAL 15 MINUTE <= w.w_end
         AND w.w_start <= e.ts + INTERVAL 15 MINUTE
        GROUP BY e.event_id
    )
    SELECT f.*, COALESCE(c.n_error_windows, 0) AS n_error_windows,
           COALESCE(o.n_overlap_error_windows, 0) AS n_overlap_error_windows
    FROM frames f
    LEFT JOIN covered c USING (event_id)
    LEFT JOIN overlapped o USING (event_id)
    """,
)
def event_window_frames(spark, sf_dir):
    """Frame-spec and offset windows per user: lead/lag (offset),
    3-event moving aggregates (ROWS BETWEEN), and a trailing-hour
    time-RANGE frame (RANGE BETWEEN INTERVAL on the epoch-µs sort key —
    the frame family where the window extent is data-dependent, sized
    by timestamps rather than row counts; a RANGE frame at an equal
    sort key spans ALL its peers, identically in both engines) — the
    window surface the reference never needed (SURVEY.md §2.6). The
    offset and ROWS specs share the (user_id, ts, event_id) sort so
    Spark computes them in one window stage; the RANGE spec re-sorts
    on the µs key within the same partitioning (no extra exchange).
    Sums in DECIMAL for engine-exactness. Merges the former
    lead_lag_events and moving_window_events queries (registry trim).

    Also hash-checks the binned interval (range) join
    (operators/joins.py:interval_join): ``n_error_windows`` counts the
    global 30-minute windows opened by 'error' events that cover each
    event — both join sides are fact-derived and share NO equi key, the
    case Spark would otherwise plan as a nested-loop join. The oracle
    restates it as the naive BETWEEN join; bins of the window width
    keep interval replication at <= 2 rows each.

    ``n_overlap_error_windows`` does the same for the range×range
    sibling (operators/joins.py:interval_overlap_join): each event's
    ±15-minute activity window against the error windows, every
    overlapping pair emitted exactly once via the overlap-start-bin
    rule; the oracle restates the naive overlap predicate."""
    tune(spark)
    ev = load_events(spark, sf_dir)
    wins = ev.where(F.col("event_type") == "error").select(
        F.col("ts").alias("w_start"),
        (F.col("ts") + F.expr("INTERVAL 30 MINUTES")).alias("w_end"),
    )
    covered = (
        interval_join(
            ev.select("event_id", "ts"), wins, "ts", "w_start", "w_end",
            bin_width=1800,
        )
        .groupBy("event_id")
        .agg(F.count(F.lit(1)).alias("n_error_windows"))
    )
    from data_pipelines_spark.operators.joins import interval_overlap_join

    activity = ev.select(
        "event_id",
        (F.col("ts") - F.expr("INTERVAL 15 MINUTES")).alias("a_start"),
        (F.col("ts") + F.expr("INTERVAL 15 MINUTES")).alias("a_end"),
    )
    overlapped = (
        interval_overlap_join(
            activity, wins, ("a_start", "a_end"), ("w_start", "w_end"),
            bin_width=1800,
        )
        .groupBy("event_id")
        .agg(F.count(F.lit(1)).alias("n_overlap_error_windows"))
    )
    order = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w = order.rowsBetween(-2, Window.currentRow)
    r = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros(F.col("ts")))
        .rangeBetween(-3_600_000_000, Window.currentRow)
    )
    frames = ev.select(
        "event_id",
        "user_id",
        "value",
        F.lag("value").over(order).alias("prev_value"),
        F.lead("value").over(order).alias("next_value"),
        F.count(F.lit(1)).over(w).alias("frame_cnt"),
        F.min("value").over(w).alias("frame_min"),
        F.max("value").over(w).alias("frame_max"),
        F.sum(F.col("value").cast("decimal(18,6)")).over(w).cast("double").alias(
            "frame_sum"
        ),
        F.count(F.lit(1)).over(r).alias("range_cnt_1h"),
        F.sum(F.col("value").cast("decimal(18,6)")).over(r).cast("double").alias(
            "range_sum_1h"
        ),
    )
    return (
        frames.join(covered, "event_id", "left")
        .join(overlapped, "event_id", "left")
        .withColumn(
            "n_error_windows",
            F.coalesce(F.col("n_error_windows"), F.lit(0)).cast("long"),
        )
        .withColumn(
            "n_overlap_error_windows",
            F.coalesce(F.col("n_overlap_error_windows"), F.lit(0)).cast("long"),
        )
    )


@register(
    "ranking_windows_suite",
    """
    SELECT l_returnflag, l_orderkey,
           CAST(l_linenumber AS BIGINT) AS l_linenumber,
           l_extendedprice, l_quantity,
           CAST(price_rank AS BIGINT) AS price_rank,
           CAST(qty_quartile AS BIGINT) AS qty_quartile,
           CAST(qty_pct_rank AS DOUBLE) AS qty_pct_rank,
           CAST(qty_cume_dist AS DOUBLE) AS qty_cume_dist
    FROM (
        SELECT *,
               row_number() OVER (
                   PARTITION BY l_returnflag
                   ORDER BY l_extendedprice DESC, l_orderkey ASC,
                            l_linenumber ASC) AS price_rank,
               ntile(4) OVER q AS qty_quartile,
               percent_rank() OVER q AS qty_pct_rank,
               cume_dist() OVER q AS qty_cume_dist
        FROM lineitem
        WINDOW q AS (PARTITION BY l_orderkey
                     ORDER BY l_quantity, l_linenumber, l_partkey, l_suppkey)
    )
    WHERE price_rank <= 3 OR l_orderkey <= 400
    """,
)
def ranking_windows_suite(spark, sf_dir):
    """Ranking + distribution windows under total orders: top-k (k>1)
    per return flag via row_number, plus ntile quartiles,
    percent_rank, and cume_dist per order (the (rank-1)/(n-1) and
    rows<=current/n arithmetic are exact in both engines). Windows are computed over the FULL table; the output
    filter (top-3 per flag plus a deterministic slice of order keys)
    only bounds the driver's canonicalization cost. Merges the former
    topk_lines_per_flag and rank_distribution_windows queries
    (registry trim)."""
    tune(spark)
    li = load_table(spark, sf_dir, "lineitem")
    flag_w = Window.partitionBy("l_returnflag").orderBy(
        F.desc("l_extendedprice"), F.asc("l_orderkey"), F.asc("l_linenumber")
    )
    qty_w = Window.partitionBy("l_orderkey").orderBy(
        "l_quantity", "l_linenumber", "l_partkey", "l_suppkey"
    )
    return (
        li.withColumn("price_rank", F.row_number().over(flag_w))
        .withColumn("qty_quartile", F.ntile(4).over(qty_w))
        .withColumn("qty_pct_rank", F.percent_rank().over(qty_w))
        .withColumn("qty_cume_dist", F.cume_dist().over(qty_w))
        .where((F.col("price_rank") <= 3) | (F.col("l_orderkey") <= 400))
        .select(
            "l_returnflag",
            "l_orderkey",
            F.col("l_linenumber").cast("long").alias("l_linenumber"),
            "l_extendedprice",
            "l_quantity",
            F.col("price_rank").cast("long").alias("price_rank"),
            F.col("qty_quartile").cast("long").alias("qty_quartile"),
            F.col("qty_pct_rank").cast("double").alias("qty_pct_rank"),
            F.col("qty_cume_dist").cast("double").alias("qty_cume_dist"),
        )
    )


@register(
    "array_agg_lines",
    """
    SELECT l_orderkey,
           array_to_string(list_sort(list(CAST(l_linenumber AS BIGINT))), ',')
               AS line_numbers,
           array_to_string(
               list_transform(list_sort(list(l_quantity)),
                              x -> CAST(CAST(x AS DECIMAL(12, 2)) AS VARCHAR)),
               ',') AS quantities
    FROM lineitem
    GROUP BY 1
    """,
)
def array_agg_lines(spark, sf_dir):
    """Nested-type aggregation: per-order arrays, sorted for engine-
    stable output (collect_list order is nondeterministic by design).

    The arrays are rendered as comma-joined strings because the driver's
    canonicalizer pandas-sorts the result rows and cannot hash raw
    array cells (numpy.ndarray is unhashable); quantities go through a
    DECIMAL(12,2) cast so both engines format the floats identically."""
    tune(spark)
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_orderkey").agg(
        F.array_join(
            F.sort_array(F.collect_list(F.col("l_linenumber").cast("long"))), ","
        ).alias("line_numbers"),
        F.array_join(
            F.transform(
                F.sort_array(F.collect_list("l_quantity")),
                lambda x: x.cast("decimal(12,2)").cast("string"),
            ),
            ",",
        ).alias("quantities"),
    )


@register(
    "grouped_stats_suite",
    """
    WITH stats AS (
        SELECT l_returnflag,
               quantile_disc(l_quantity, 0.25) AS q1_disc,
               quantile_disc(l_quantity, 0.5)  AS med_disc,
               quantile_disc(l_quantity, 0.9)  AS q90_disc,
               bool_and(l_quantity >= 1)   AS all_qty_positive,
               bool_or(l_discount > 0.09)  AS any_deep_discount,
               count(*) AS line_cnt
        FROM lineitem GROUP BY 1
    ),
    skew AS (
        SELECT l_returnflag,
               count(*) AS key_cnt,
               CAST((SELECT count(*) FROM lineitem) AS BIGINT) AS total_cnt,
               CAST(count(*) AS DOUBLE)
                   / (SELECT count(*) FROM lineitem) AS frac
        FROM lineitem GROUP BY 1
    )
    SELECT s.*, k.key_cnt, k.total_cnt, k.frac
    FROM stats s JOIN skew k USING (l_returnflag)
    """,
)
def grouped_stats_suite(spark, sf_dir):
    """Per-group statistics suite: discrete (lower-value) quantiles via
    the sorted-array formulation — element at floor(q*(n-1))+1, matching
    DuckDB's quantile_disc — plus every()/any() boolean aggregates.
    Merges the former discrete_quantiles and bool_aggregates queries
    (registry trim), and joins in `plans.skew.diagnose_skew`'s
    heavy-hitter report on the same key (top_k=3 covers all three
    return flags), hash-checking the skew-measurement operator's counts
    and frequency fractions — the last round-4 family that had no
    driver row."""
    tune(spark)
    from data_pipelines_spark.plans.skew import diagnose_skew

    li = load_table(spark, sf_dir, "lineitem")

    def qd(v, q):
        pos = F.floor(F.lit(q) * (F.size(v) - 1).cast("double")).cast("int") + 1
        return F.element_at(v, pos)

    g = li.groupBy("l_returnflag").agg(
        F.sort_array(F.collect_list("l_quantity")).alias("v"),
        F.bool_and(F.col("l_quantity") >= 1).alias("all_qty_positive"),
        F.bool_or(F.col("l_discount") > 0.09).alias("any_deep_discount"),
        F.count(F.lit(1)).alias("line_cnt"),
    )
    stats = g.select(
        "l_returnflag",
        qd(F.col("v"), 0.25).alias("q1_disc"),
        qd(F.col("v"), 0.5).alias("med_disc"),
        qd(F.col("v"), 0.9).alias("q90_disc"),
        "all_qty_positive",
        "any_deep_discount",
        "line_cnt",
    )
    skew = diagnose_skew(li, ["l_returnflag"], top_k=3)
    return stats.join(skew, "l_returnflag")


def _hav_sql(lat1: str, lon1: str, lat2: str, lon2: str) -> str:
    """SQL text for the F10 haversine in km — the same formula
    `functions.geo.haversine_km` evaluates, so composed uses (distance,
    pixel area) hash-match bit-for-bit."""
    a = (
        f"(pow(sin(radians(({lat2}) - ({lat1})) / 2), 2)"
        f" + cos(radians({lat1})) * cos(radians({lat2}))"
        f" * pow(sin(radians(({lon2}) - ({lon1})) / 2), 2))"
    )
    return f"2 * 6371.0 * atan2(sqrt({a}), sqrt(1 - {a}))"


_CS_LAT1 = "(CAST(c_custkey % 80 AS DOUBLE) - 40)"
_CS_LON1 = "(CAST((c_custkey * 7) % 340 AS DOUBLE) - 170)"
_CS_LAT2 = "(CAST(c_nationkey AS DOUBLE) * 3 - 36)"
_CS_LON2 = "(CAST(c_nationkey AS DOUBLE) * 13 - 156)"
_PX = 0.25  # pixel size (deg) for the F11 tier
_TILE_SQL = (
    "lpad(CAST(c_custkey % 60 AS VARCHAR), 2, '0')"
    " || (CASE WHEN c_nationkey % 2 = 0 THEN 'N' ELSE 'S' END)"
    " || '_' || lpad(CAST((c_custkey * 3) % 180 AS VARCHAR), 3, '0')"
    " || (CASE WHEN c_custkey % 2 = 0 THEN 'E' ELSE 'W' END)"
)


@register(
    "customer_scalar_suite",
    f"""
    SELECT c_custkey,
           upper(c_name) AS name_upper,
           lpad(CAST(c_custkey AS VARCHAR), 10, '0') AS key_padded,
           reverse(c_mktsegment) AS segment_rev,
           CAST(levenshtein(c_mktsegment, 'MACHINERY') AS BIGINT) AS seg_lev,
           substr(c_name, 1, 8) AS name_prefix,
           replace(c_name, '#', '-') AS name_dashed,
           ROUND({_hav_sql(_CS_LAT1, _CS_LON1, _CS_LAT2, _CS_LON2)}, 3)
               AS dist_km,
           ROUND(({_hav_sql(f"{_CS_LAT1} - {_PX / 2}", _CS_LON1,
                            f"{_CS_LAT1} + {_PX / 2}", _CS_LON1)})
                 * ({_hav_sql(_CS_LAT1, f"{_CS_LON1} - {_PX / 2}",
                              _CS_LAT1, f"{_CS_LON1} + {_PX / 2}")}), 6)
               AS px_area_km2,
           tile,
           CASE WHEN substr(tile, 3, 1) = 'S'
                THEN -CAST(substr(tile, 1, 2) AS DOUBLE)
                ELSE CAST(substr(tile, 1, 2) AS DOUBLE) END AS tile_lat,
           CASE WHEN substr(tile, 8, 1) = 'W'
                THEN -CAST(substr(tile, 5, 3) AS DOUBLE)
                ELSE CAST(substr(tile, 5, 3) AS DOUBLE) END AS tile_lon
    FROM (SELECT *, {_TILE_SQL} AS tile FROM customer)
    """,
)
def customer_scalar_suite(spark, sf_dir):
    """Composite scalar surface per customer: case, padding, reverse,
    edit distance, substring, replace — plus three geo scalars over
    synthesized points: the F10 haversine distance (1 m precision),
    the F11 pixel ground area at a 0.25-degree resolution
    (`functions.geo.pixel_area_km2` — haversine height x width at the
    pixel location), and the F12 GFC tile-name round-trip
    (`functions.geo.parse_tile_name`: a `10N_020W`-style name built
    from the keys, parsed back to its signed origin — construction AND
    parse replayed in the oracle). All JVM-side native expressions.
    Merges the former string_function_suite and haversine_distances
    queries (registry trim)."""
    from data_pipelines_spark.functions.geo import (
        haversine_km,
        parse_tile_name,
        pixel_area_km2,
    )

    tune(spark)
    cust = load_table(spark, sf_dir, "customer")
    lat1 = (F.col("c_custkey") % 80).cast("double") - 40
    lon1 = ((F.col("c_custkey") * 7) % 340).cast("double") - 170
    lat2 = F.col("c_nationkey").cast("double") * 3 - 36
    lon2 = F.col("c_nationkey").cast("double") * 13 - 156
    tile = F.concat(
        F.lpad((F.col("c_custkey") % 60).cast("string"), 2, "0"),
        F.when(F.col("c_nationkey") % 2 == 0, F.lit("N")).otherwise(F.lit("S")),
        F.lit("_"),
        F.lpad(((F.col("c_custkey") * 3) % 180).cast("string"), 3, "0"),
        F.when(F.col("c_custkey") % 2 == 0, F.lit("E")).otherwise(F.lit("W")),
    )
    tile_lat, tile_lon = parse_tile_name(F.col("tile"))
    return cust.withColumn("tile", tile).select(
        "c_custkey",
        F.upper("c_name").alias("name_upper"),
        F.lpad(F.col("c_custkey").cast("string"), 10, "0").alias("key_padded"),
        F.reverse("c_mktsegment").alias("segment_rev"),
        F.levenshtein("c_mktsegment", F.lit("MACHINERY")).cast("long").alias("seg_lev"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.replace(F.col("c_name"), F.lit("#"), F.lit("-")).alias("name_dashed"),
        F.round(haversine_km(lat1, lon1, lat2, lon2), 3).alias("dist_km"),
        F.round(pixel_area_km2(lat1, lon1, _PX), 6).alias("px_area_km2"),
        "tile",
        tile_lat.alias("tile_lat"),
        tile_lon.alias("tile_lon"),
    )
