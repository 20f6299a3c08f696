"""Second tier of relational coverage: anti join, scalar subquery,
pivot, cube, frame-spec windows, top-k per group.

Same determinism rules as suite/analytics.py.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from data_pipelines_spark.session import tune
from data_pipelines_spark.sources.tables import load_events, load_table
from data_pipelines_spark.suite._registry import make_registry

QUERIES, ORACLES, register = make_registry()

PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]


@register(
    "anti_join_idle_customers",
    """
    SELECT c.c_custkey, c.c_mktsegment
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def anti_join_idle_customers(spark, sf_dir):
    """Left-anti join: customers that never ordered (the complement of
    the reference's semi-filter J4)."""
    tune(spark)
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return cust.join(
        orders, cust.c_custkey == orders.o_custkey, "left_anti"
    ).select("c_custkey", "c_mktsegment")


@register(
    "orders_above_median",
    """
    SELECT o_orderpriority, count(*) AS hi_cnt
    FROM orders
    WHERE o_totalprice > (
        SELECT CAST(quantile_cont(o_totalprice, 0.5) AS DOUBLE) FROM orders
    )
    GROUP BY 1
    """,
)
def orders_above_median(spark, sf_dir):
    """Scalar-subquery filter: orders above the exact median total price
    (median is sort-based and engine-exact, unlike a float mean)."""
    tune(spark)
    orders = load_table(spark, sf_dir, "orders")
    med = orders.agg(F.median("o_totalprice").alias("m"))
    return (
        orders.join(F.broadcast(med))
        .where(F.col("o_totalprice") > F.col("m"))
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("hi_cnt"))
    )


@register(
    "pivot_priority_by_segment",
    f"""
    SELECT c.c_mktsegment,
           {", ".join(
               'count(*) FILTER (WHERE o.o_orderpriority = ' + repr(p) + ') AS "' + p + '"'
               for p in PRIORITIES
           )}
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY 1
    """,
)
def pivot_priority_by_segment(spark, sf_dir):
    """Pivot (long→wide counts): order priorities as columns per market
    segment — groupBy().pivot() with an explicit value list so column
    names are stable."""
    tune(spark)
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    return (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("c_mktsegment")
        .pivot("o_orderpriority", PRIORITIES)
        .count()
        .na.fill(0)
    )


@register(
    "cube_flag_status",
    """
    SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
           COALESCE(l_linestatus, 'ALL') AS linestatus,
           count(*) AS line_cnt,
           sum(l_quantity) AS sum_qty
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def cube_flag_status(spark, sf_dir):
    """CUBE over two dimensions — all 2^2 grouping sets with sentinel
    keys for the subtotal rows."""
    tune(spark)
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(F.count(F.lit(1)).alias("line_cnt"), F.sum("l_quantity").alias("sum_qty"))
        .select(
            F.coalesce(F.col("l_returnflag"), F.lit("ALL")).alias("returnflag"),
            F.coalesce(F.col("l_linestatus"), F.lit("ALL")).alias("linestatus"),
            "line_cnt",
            "sum_qty",
        )
    )


@register(
    "event_window_frames",
    """
    SELECT event_id, user_id, value,
           lag(value)  OVER o AS prev_value,
           lead(value) OVER o AS next_value,
           count(*) OVER w AS frame_cnt,
           min(value) OVER w AS frame_min,
           max(value) OVER w AS frame_max,
           CAST(sum(CAST(value AS DECIMAL(18, 6))) OVER w AS DOUBLE) AS frame_sum
    FROM events
    WINDOW o AS (PARTITION BY user_id ORDER BY ts, event_id),
           w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
    """,
)
def event_window_frames(spark, sf_dir):
    """Frame-spec and offset windows in one pass per user: lead/lag
    (offset) plus 3-event moving aggregates (ROWS BETWEEN) — the window
    surface the reference never needed (SURVEY.md §2.6). Both specs
    share the (user_id, ts, event_id) sort so Spark computes them in a
    single window stage without re-sorting. Frame sums in DECIMAL for
    engine-exactness. Merges the former lead_lag_events and
    moving_window_events queries (registry trim)."""
    tune(spark)
    ev = load_events(spark, sf_dir)
    order = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w = order.rowsBetween(-2, Window.currentRow)
    return ev.select(
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
    )


@register(
    "ranking_windows_suite",
    """
    SELECT l_returnflag, l_orderkey,
           CAST(l_linenumber AS BIGINT) AS l_linenumber,
           l_extendedprice, l_quantity,
           CAST(price_rank AS BIGINT) AS price_rank,
           CAST(qty_quartile AS BIGINT) AS qty_quartile,
           CAST(qty_pct_rank AS DOUBLE) AS qty_pct_rank
    FROM (
        SELECT *,
               row_number() OVER (
                   PARTITION BY l_returnflag
                   ORDER BY l_extendedprice DESC, l_orderkey ASC,
                            l_linenumber ASC) AS price_rank,
               ntile(4) OVER q AS qty_quartile,
               percent_rank() OVER q AS qty_pct_rank
        FROM lineitem
        WINDOW q AS (PARTITION BY l_orderkey
                     ORDER BY l_quantity, l_linenumber, l_partkey, l_suppkey)
    )
    WHERE price_rank <= 3 OR l_orderkey <= 400
    """,
)
def ranking_windows_suite(spark, sf_dir):
    """Ranking + distribution windows under total orders: top-k (k>1)
    per return flag via row_number, plus ntile quartiles and
    percent_rank per order (the (rank-1)/(n-1) arithmetic is exact in
    both engines). Windows are computed over the FULL table; the output
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
    "correlated_min_price_parts",
    """
    SELECT p.p_partkey, p.p_retailprice
    FROM part p
    WHERE p.p_retailprice = (
        SELECT min(p2.p_retailprice) FROM part p2 WHERE p2.p_brand = p.p_brand
    )
    """,
)
def correlated_min_price_parts(spark, sf_dir):
    """Correlated subquery (TPC-H Q2 shape): parts at their brand's
    minimum price — decorrelated by Catalyst into an aggregate+join."""
    tune(spark)
    part = load_table(spark, sf_dir, "part")
    part.createOrReplaceTempView("__part_corr")
    return spark.sql(
        """
        SELECT p.p_partkey, p.p_retailprice
        FROM __part_corr p
        WHERE p.p_retailprice = (
            SELECT min(p2.p_retailprice) FROM __part_corr p2
            WHERE p2.p_brand = p.p_brand
        )
        """
    )


@register(
    "grouped_stats_suite",
    """
    SELECT l_returnflag,
           quantile_disc(l_quantity, 0.25) AS q1_disc,
           quantile_disc(l_quantity, 0.5)  AS med_disc,
           quantile_disc(l_quantity, 0.9)  AS q90_disc,
           bool_and(l_quantity >= 1)   AS all_qty_positive,
           bool_or(l_discount > 0.09)  AS any_deep_discount,
           count(*) AS line_cnt
    FROM lineitem GROUP BY 1
    """,
)
def grouped_stats_suite(spark, sf_dir):
    """Per-group statistics suite: discrete (lower-value) quantiles via
    the sorted-array formulation — element at floor(q*(n-1))+1, matching
    DuckDB's quantile_disc — plus every()/any() boolean aggregates.
    Merges the former discrete_quantiles and bool_aggregates queries
    (registry trim); both operator families stay oracle-checked."""
    tune(spark)
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
    return g.select(
        "l_returnflag",
        qd(F.col("v"), 0.25).alias("q1_disc"),
        qd(F.col("v"), 0.5).alias("med_disc"),
        qd(F.col("v"), 0.9).alias("q90_disc"),
        "all_qty_positive",
        "any_deep_discount",
        "line_cnt",
    )


@register(
    "customer_scalar_suite",
    """
    SELECT c_custkey,
           upper(c_name) AS name_upper,
           lpad(CAST(c_custkey AS VARCHAR), 10, '0') AS key_padded,
           reverse(c_mktsegment) AS segment_rev,
           CAST(levenshtein(c_mktsegment, 'MACHINERY') AS BIGINT) AS seg_lev,
           substr(c_name, 1, 8) AS name_prefix,
           replace(c_name, '#', '-') AS name_dashed,
           ROUND(
             2 * 6371.0 * atan2(
               sqrt(
                 pow(sin(radians((CAST(c_nationkey AS DOUBLE) * 3 - 36)
                                 - (CAST(c_custkey % 80 AS DOUBLE) - 40)) / 2), 2)
                 + cos(radians(CAST(c_custkey % 80 AS DOUBLE) - 40))
                   * cos(radians(CAST(c_nationkey AS DOUBLE) * 3 - 36))
                   * pow(sin(radians((CAST(c_nationkey AS DOUBLE) * 13 - 156)
                                     - (CAST((c_custkey * 7) % 340 AS DOUBLE) - 170)) / 2), 2)
               ),
               sqrt(1 - (
                 pow(sin(radians((CAST(c_nationkey AS DOUBLE) * 3 - 36)
                                 - (CAST(c_custkey % 80 AS DOUBLE) - 40)) / 2), 2)
                 + cos(radians(CAST(c_custkey % 80 AS DOUBLE) - 40))
                   * cos(radians(CAST(c_nationkey AS DOUBLE) * 3 - 36))
                   * pow(sin(radians((CAST(c_nationkey AS DOUBLE) * 13 - 156)
                                     - (CAST((c_custkey * 7) % 340 AS DOUBLE) - 170)) / 2), 2)
               ))
             ), 3) AS dist_km
    FROM customer
    """,
)
def customer_scalar_suite(spark, sf_dir):
    """Composite scalar surface per customer: case, padding, reverse,
    edit distance, substring, replace — plus the F10 haversine distance
    between two synthesized points, rounded to 1 m precision. All
    JVM-side native expressions. Merges the former
    string_function_suite and haversine_distances queries
    (registry trim)."""
    from data_pipelines_spark.functions.geo import haversine_km

    tune(spark)
    cust = load_table(spark, sf_dir, "customer")
    lat1 = (F.col("c_custkey") % 80).cast("double") - 40
    lon1 = ((F.col("c_custkey") * 7) % 340).cast("double") - 170
    lat2 = F.col("c_nationkey").cast("double") * 3 - 36
    lon2 = F.col("c_nationkey").cast("double") * 13 - 156
    return cust.select(
        "c_custkey",
        F.upper("c_name").alias("name_upper"),
        F.lpad(F.col("c_custkey").cast("string"), 10, "0").alias("key_padded"),
        F.reverse("c_mktsegment").alias("segment_rev"),
        F.levenshtein("c_mktsegment", F.lit("MACHINERY")).cast("long").alias("seg_lev"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.replace(F.col("c_name"), F.lit("#"), F.lit("-")).alias("name_dashed"),
        F.round(haversine_km(lat1, lon1, lat2, lon2), 3).alias("dist_km"),
    )
