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
    "moving_window_events",
    """
    SELECT event_id, user_id,
           count(*) OVER w AS frame_cnt,
           min(value) OVER w AS frame_min,
           max(value) OVER w AS frame_max,
           CAST(sum(CAST(value AS DECIMAL(18, 6))) OVER w AS DOUBLE) AS frame_sum
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
    """,
)
def moving_window_events(spark, sf_dir):
    """Frame-spec window (ROWS BETWEEN): 3-event moving aggregates per
    user — the rowsBetween surface the reference never needed
    (SURVEY.md §2.6). Frame sums in DECIMAL for engine-exactness."""
    tune(spark)
    ev = load_events(spark, sf_dir)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-2, Window.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.count(F.lit(1)).over(w).alias("frame_cnt"),
        F.min("value").over(w).alias("frame_min"),
        F.max("value").over(w).alias("frame_max"),
        F.sum(F.col("value").cast("decimal(18,6)")).over(w).cast("double").alias(
            "frame_sum"
        ),
    )


@register(
    "topk_lines_per_flag",
    """
    SELECT l_returnflag, l_orderkey,
           CAST(l_linenumber AS BIGINT) AS l_linenumber,
           l_extendedprice
    FROM (
        SELECT *, row_number() OVER (
            PARTITION BY l_returnflag
            ORDER BY l_extendedprice DESC, l_orderkey ASC, l_linenumber ASC) AS rn
        FROM lineitem
    )
    WHERE rn <= 3
    """,
)
def topk_lines_per_flag(spark, sf_dir):
    """Top-k (k>1) per group via ranking window with a total order over
    every output column — generalizes the reference's top-1 argmax."""
    tune(spark)
    li = load_table(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_returnflag").orderBy(
        F.desc("l_extendedprice"), F.asc("l_orderkey"), F.asc("l_linenumber")
    )
    return (
        li.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
        .select(
            "l_returnflag",
            "l_orderkey",
            F.col("l_linenumber").cast("long").alias("l_linenumber"),
            "l_extendedprice",
        )
    )


@register("approx_sketch_aggregates")
def approx_sketch_aggregates(spark, sf_dir):
    """Sketch-based scale paths: approx_count_distinct (HyperLogLog++)
    and approx_percentile (KLL-style) over the fact table. Approximate
    by design → rows-only driver check; the exact twins are oracle-
    checked in global_agg_distinct / flood_detailed_forecast."""
    tune(spark)
    li = load_table(spark, sf_dir, "lineitem")
    return li.agg(
        F.approx_count_distinct("l_suppkey").alias("approx_supp"),
        F.approx_count_distinct("l_partkey").alias("approx_part"),
        F.approx_percentile("l_extendedprice", F.lit(0.5), F.lit(10000)).alias(
            "approx_median_price"
        ),
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
    "rank_distribution_windows",
    """
    SELECT l_orderkey,
           CAST(l_linenumber AS BIGINT) AS l_linenumber,
           l_quantity,
           ntile(4) OVER w AS qty_quartile,
           CAST(percent_rank() OVER w AS DOUBLE) AS qty_pct_rank
    FROM lineitem
    WINDOW w AS (PARTITION BY l_orderkey
                 ORDER BY l_quantity, l_linenumber, l_partkey, l_suppkey)
    """,
)
def rank_distribution_windows(spark, sf_dir):
    """Distribution windows (ntile, percent_rank) under a total order —
    percent_rank's (rank-1)/(n-1) arithmetic is exact in both engines."""
    tune(spark)
    li = load_table(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_orderkey").orderBy(
        "l_quantity", "l_linenumber", "l_partkey", "l_suppkey"
    )
    return li.select(
        "l_orderkey",
        F.col("l_linenumber").cast("long").alias("l_linenumber"),
        "l_quantity",
        F.ntile(4).over(w).cast("long").alias("qty_quartile"),
        F.percent_rank().over(w).alias("qty_pct_rank"),
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
    "discrete_quantiles",
    """
    SELECT l_returnflag,
           quantile_disc(l_quantity, 0.25) AS q1_disc,
           quantile_disc(l_quantity, 0.5)  AS med_disc,
           quantile_disc(l_quantity, 0.9)  AS q90_disc
    FROM lineitem GROUP BY 1
    """,
)
def discrete_quantiles(spark, sf_dir):
    """Discrete (lower-value) quantiles: the sorted-array formulation —
    element at floor(q*(n-1))+1 — matching DuckDB's quantile_disc."""
    tune(spark)
    li = load_table(spark, sf_dir, "lineitem")

    def qd(v, q):
        pos = F.floor(F.lit(q) * (F.size(v) - 1).cast("double")).cast("int") + 1
        return F.element_at(v, pos)

    g = li.groupBy("l_returnflag").agg(
        F.sort_array(F.collect_list("l_quantity")).alias("v")
    )
    return g.select(
        "l_returnflag",
        qd(F.col("v"), 0.25).alias("q1_disc"),
        qd(F.col("v"), 0.5).alias("med_disc"),
        qd(F.col("v"), 0.9).alias("q90_disc"),
    )


@register(
    "string_function_suite",
    """
    SELECT c_custkey,
           upper(c_name) AS name_upper,
           lpad(CAST(c_custkey AS VARCHAR), 10, '0') AS key_padded,
           reverse(c_mktsegment) AS segment_rev,
           CAST(levenshtein(c_mktsegment, 'MACHINERY') AS BIGINT) AS seg_lev,
           substr(c_name, 1, 8) AS name_prefix,
           replace(c_name, '#', '-') AS name_dashed
    FROM customer
    """,
)
def string_function_suite(spark, sf_dir):
    """Composite scalar string surface: case, padding, reverse,
    edit distance, substring, replace — all JVM-side."""
    tune(spark)
    cust = load_table(spark, sf_dir, "customer")
    return cust.select(
        "c_custkey",
        F.upper("c_name").alias("name_upper"),
        F.lpad(F.col("c_custkey").cast("string"), 10, "0").alias("key_padded"),
        F.reverse("c_mktsegment").alias("segment_rev"),
        F.levenshtein("c_mktsegment", F.lit("MACHINERY")).cast("long").alias("seg_lev"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.replace(F.col("c_name"), F.lit("#"), F.lit("-")).alias("name_dashed"),
    )


@register(
    "bool_aggregates",
    """
    SELECT o_orderpriority,
           bool_and(o_totalprice > 1000)   AS all_over_1k,
           bool_or(o_totalprice > 400000)  AS any_over_400k,
           count(*) AS order_cnt
    FROM orders GROUP BY 1
    """,
)
def bool_aggregates(spark, sf_dir):
    """every()/any() boolean aggregates per group."""
    tune(spark)
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").agg(
        F.bool_and(F.col("o_totalprice") > 1000).alias("all_over_1k"),
        F.bool_or(F.col("o_totalprice") > 400000).alias("any_over_400k"),
        F.count(F.lit(1)).alias("order_cnt"),
    )
