"""Classic analytical query shapes (TPC-H-style) + advanced SQL surface:
rollup, set ops, lead/lag, sliding windows, as-of join.

These go beyond the reference's own operator set (SURVEY.md §2.5 notes
grouping sets / count-distinct / top-k as absent there) — they are part
of making the engine a complete analytics surface, and every one is
exactly oracle-checked.

Determinism: money math in DECIMAL (exact), averages as exact-sum /
exact-count double division, LIMIT queries carry a total tie-break
order.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from data_pipelines_spark.operators.joins import asof_join
from data_pipelines_spark.session import tune
from data_pipelines_spark.sources.tables import load_events, load_table
from data_pipelines_spark.suite._registry import make_registry

QUERIES, ORACLES, register = make_registry()

_DEC_PRICE = "decimal(18,2)"


def _disc_price():
    return F.col("l_extendedprice").cast(_DEC_PRICE) * (
        F.lit(1.0) - F.col("l_discount")
    ).cast("decimal(8,2)")


@register(
    "q1_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           sum(l_quantity) AS sum_qty,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                    * CAST(1.0 - l_discount AS DECIMAL(8,2))) AS DOUBLE) AS sum_disc_price,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                    * CAST(1.0 - l_discount AS DECIMAL(8,2))
                    * CAST(1.0 + l_tax AS DECIMAL(8,2))) AS DOUBLE) AS sum_charge,
           sum(l_quantity) / count(*) AS avg_qty,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_price,
           CAST(sum(CAST(l_discount AS DECIMAL(8,2))) AS DOUBLE) / count(*) AS avg_disc,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-12-01 00:00:00'
    GROUP BY 1, 2
    """,
)
def q1_pricing_summary(spark, sf_dir):
    """TPC-H Q1 shape: wide aggregate over the fact table; one scan, one
    shuffle of partial aggregates. Averages computed as exact-decimal
    sums over exact counts so engines agree bit-for-bit."""
    tune(spark)
    li = load_table(spark, sf_dir, "lineitem")
    base = F.col("l_extendedprice").cast(_DEC_PRICE)
    cnt = F.count(F.lit(1))
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-12-01 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),
            F.sum(base).cast("double").alias("sum_base_price"),
            F.sum(_disc_price()).cast("double").alias("sum_disc_price"),
            F.sum(
                _disc_price() * (F.lit(1.0) + F.col("l_tax")).cast("decimal(8,2)")
            )
            .cast("double")
            .alias("sum_charge"),
            (F.sum("l_quantity") / cnt).alias("avg_qty"),
            (F.sum(base).cast("double") / cnt).alias("avg_price"),
            (F.sum(F.col("l_discount").cast("decimal(8,2)")).cast("double") / cnt).alias(
                "avg_disc"
            ),
            cnt.alias("count_order"),
        )
    )


@register(
    "q6_q14_revenue_kpis",
    """
    SELECT q6.revenue, q6.line_cnt, q14.promo_revenue_pct
    FROM (
        SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                        * CAST(l_discount AS DECIMAL(8,2))) AS DOUBLE) AS revenue,
               count(*) AS line_cnt
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
          AND l_discount >= 0.03 AND l_discount <= 0.07
          AND l_quantity < 24
    ) q6
    CROSS JOIN (
        SELECT CAST(100.0 * CAST(sum(CASE WHEN p.p_type = 'PROMO'
                        THEN CAST(l.l_extendedprice AS DECIMAL(18,2))
                             * CAST(1.0 - l.l_discount AS DECIMAL(8,2))
                        ELSE CAST(0 AS DECIMAL(27,4)) END) AS DOUBLE)
               / CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
                          * CAST(1.0 - l.l_discount AS DECIMAL(8,2))) AS DOUBLE)
               AS DOUBLE) AS promo_revenue_pct
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    ) q14
    """,
)
def q6_q14_revenue_kpis(spark, sf_dir):
    """TPC-H Q6 + Q14 shapes fused into one single-row KPI frame (both
    were 1-row scalar aggregates; the registry is trimmed so the driver
    sweep covers every entry). Q6: highly selective scan-filter-
    aggregate where every predicate reaches the parquet row-group
    stats. Q14: conditional promo-revenue ratio over a fact-dim join —
    both sums exact in DECIMAL, the final ratio one double division."""
    tune(spark)
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    q6 = (
        li.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & F.col("l_discount").between(0.03, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(
                F.col("l_extendedprice").cast(_DEC_PRICE)
                * F.col("l_discount").cast("decimal(8,2)")
            )
            .cast("double")
            .alias("revenue"),
            F.count(F.lit(1)).alias("line_cnt"),
        )
    )
    disc = _disc_price()
    promo = F.sum(
        F.when(F.col("p_type") == "PROMO", disc).otherwise(
            F.lit(0).cast("decimal(27,4)")
        )
    ).cast("double")
    total = F.sum(disc).cast("double")
    q14 = (
        li.join(F.broadcast(part.select("p_partkey", "p_type")),
                li.l_partkey == F.col("p_partkey"))
        .agg((F.lit(100.0) * promo / total).cast("double").alias("promo_revenue_pct"))
    )
    return q6.crossJoin(q14)


@register(
    "q3_top_orders",
    """
    SELECT l.l_orderkey,
           CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
                    * CAST(1.0 - l.l_discount AS DECIMAL(8,2))) AS DOUBLE) AS revenue,
           CAST(o.o_orderdate AS DATE) AS order_date
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE c.c_mktsegment = 'BUILDING'
    GROUP BY l.l_orderkey, CAST(o.o_orderdate AS DATE)
    ORDER BY revenue DESC, l.l_orderkey ASC
    LIMIT 10
    """,
)
def q3_top_orders(spark, sf_dir):
    """TPC-H Q3 shape: selective dimension filter → fact join → top-k by
    aggregate. Customer/orders broadcast; the LIMIT is a TakeOrdered —
    no global sort. Total tie-break (orderkey) keeps the k-set stable."""
    tune(spark)
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    return (
        li.join(
            F.broadcast(orders.select("o_orderkey", "o_custkey", "o_orderdate")),
            li.l_orderkey == F.col("o_orderkey"),
        )
        .join(
            F.broadcast(cust.where(F.col("c_mktsegment") == "BUILDING")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .groupBy("l_orderkey", F.to_date("o_orderdate").alias("order_date"))
        .agg(F.sum(_disc_price()).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
        .select("l_orderkey", "revenue", "order_date")
    )


@register(
    "rollup_region_nation",
    """
    SELECT COALESCE(r.r_name, 'ALL')  AS region,
           COALESCE(n.n_name, 'ALL')  AS nation,
           count(*) AS supp_cnt,
           CAST(sum(CAST(s.s_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
    FROM supplier s
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY ROLLUP (r.r_name, n.n_name)
    """,
)
def rollup_region_nation(spark, sf_dir):
    """ROLLUP hierarchy totals (region → nation → grand total) — the
    grouping-sets surface the reference lacks (SURVEY.md §2.5). NULL
    subtotal keys are coalesced to a sentinel for engine-stable output.
    """
    tune(spark)
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    joined = s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey).join(
        F.broadcast(r), F.col("n_regionkey") == r.r_regionkey
    )
    return (
        joined.rollup("r_name", "n_name")
        .agg(
            F.count(F.lit(1)).alias("supp_cnt"),
            F.sum(F.col("s_acctbal").cast(_DEC_PRICE)).cast("double").alias("total_bal"),
        )
        .select(
            F.coalesce(F.col("r_name"), F.lit("ALL")).alias("region"),
            F.coalesce(F.col("n_name"), F.lit("ALL")).alias("nation"),
            "supp_cnt",
            "total_bal",
        )
    )


@register(
    "global_agg_distinct",
    """
    SELECT min(l_extendedprice) AS min_price,
           max(l_extendedprice) AS max_price,
           count(*) AS line_cnt,
           count(DISTINCT l_suppkey) AS supp_cnt,
           count(DISTINCT l_partkey) AS part_cnt,
           count(DISTINCT (l_returnflag, l_linestatus)) AS flag_status_cnt,
           TRUE AS supp_hll_ok,
           TRUE AS part_hll_ok,
           TRUE AS median_sketch_ok,
           TRUE AS hll_rollup_ok,
           TRUE AS hll_store_ok
    FROM lineitem
    """,
)
def global_agg_distinct(spark, sf_dir):
    """A9/A10: global scalar aggregates + exact count-distinct (the
    reference's min/max-per-subarea and distinct key-set shapes), plus
    sketch-tolerance checks: approx_count_distinct (HyperLogLog++) and
    approx_percentile must land within 2% of their exact twins. The
    Spark side emits the real comparison booleans while the oracle
    asserts TRUE — if a sketch ever drifts past tolerance the driver's
    value hash flags it, which turns the formerly rows-only
    approx_sketch_aggregates query into a checked row.

    Plan note: the distinct counts and the sketch/percentile aggregates
    run as two separate single-row aggregations cross-joined at the
    end. Fused into one agg, Catalyst's multi-distinct rewrite Expands
    every input row 4x and drags the percentile/HLL object buffers
    through the expanded ObjectHashAggregate — measured 3.6s warm at
    sf0.01 and ruinous at scale; split, each plan is a clean two-stage
    aggregate. The exact median (value-buffering percentile) exists
    only to judge the sketch — production paths use the sketch alone.

    Round-5 additions judge the MERGEABLE sketch store
    (`operators/sketches.py` — daily HllSketch rows unioned instead of
    rescanning facts): ``hll_rollup_ok`` asserts that unioning
    per-returnflag sketches lands within 3% of the exact distinct count
    (no double counting across overlapping groups — the composability
    the store exists for; sparse-mode sketches union bit-exactly but a
    dense-mode union can differ from the direct sketch by a fraction of
    a percent, so the gate is the error envelope, not estimator
    identity), and ``hll_store_ok`` the same for the direct sketch."""
    from data_pipelines_spark.operators.sketches import (
        distinct_sketch,
        merge_distinct_counts,
    )

    tune(spark)
    li = load_table(spark, sf_dir, "lineitem")

    def within(approx, exact, tol=0.02):
        return (
            F.abs(approx.cast("double") - exact.cast("double"))
            <= F.lit(tol) * exact.cast("double")
        )

    dist = li.agg(
        F.countDistinct("l_suppkey").alias("supp_cnt"),
        F.countDistinct("l_partkey").alias("part_cnt"),
        F.countDistinct("l_returnflag", "l_linestatus").alias("flag_status_cnt"),
    )
    sketches = li.agg(
        F.min("l_extendedprice").alias("min_price"),
        F.max("l_extendedprice").alias("max_price"),
        F.count(F.lit(1)).alias("line_cnt"),
        F.approx_count_distinct("l_suppkey", rsd=0.01).alias("__supp_hll"),
        F.approx_count_distinct("l_partkey", rsd=0.01).alias("__part_hll"),
        F.approx_percentile("l_extendedprice", F.lit(0.5), F.lit(10000)).alias(
            "__median_sketch"
        ),
        F.median("l_extendedprice").alias("__median_exact"),
    )
    per_flag = distinct_sketch(li, ["l_returnflag"], "l_suppkey")
    rolled = merge_distinct_counts(per_flag, []).select(
        F.col("n_distinct_approx").alias("__rolled")
    )
    direct = distinct_sketch(li, [], "l_suppkey").select(
        F.col("n_distinct_approx").alias("__direct")
    )
    return (
        dist.crossJoin(sketches)
        .crossJoin(F.broadcast(rolled))
        .crossJoin(F.broadcast(direct))
        .select(
            "min_price",
            "max_price",
            "line_cnt",
            "supp_cnt",
            "part_cnt",
            "flag_status_cnt",
            within(F.col("__supp_hll"), F.col("supp_cnt")).alias("supp_hll_ok"),
            within(F.col("__part_hll"), F.col("part_cnt")).alias("part_hll_ok"),
            within(F.col("__median_sketch"), F.col("__median_exact")).alias(
                "median_sketch_ok"
            ),
            within(F.col("__rolled"), F.col("supp_cnt"), 0.03).alias(
                "hll_rollup_ok"
            ),
            within(F.col("__direct"), F.col("supp_cnt"), 0.03).alias(
                "hll_store_ok"
            ),
        )
    )


@register(
    "asof_join_purchases",
    """
    WITH purchases AS (
        SELECT user_id, ts, max(value) AS purchase_value
        FROM events WHERE event_type = 'purchase'
        GROUP BY user_id, ts
    )
    SELECT e.event_id, e.user_id, p.purchase_value AS last_purchase_value
    FROM events e
    ASOF LEFT JOIN purchases p
        ON e.user_id = p.user_id AND e.ts >= p.ts
    """,
)
def asof_join_purchases(spark, sf_dir):
    """Merge-asof: each event annotated with the latest at-or-before
    purchase value of the same user — implemented as the scalable
    union+window plan (operators/joins.py), oracle-checked against
    DuckDB's native ASOF JOIN."""
    tune(spark)
    ev = load_events(spark, sf_dir)
    purchases = (
        ev.where(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("purchase_value"))
    )
    out = asof_join(
        ev.select("event_id", "user_id", "ts"),
        purchases,
        key_cols=["user_id"],
        left_ts="ts",
        right_ts="ts",
        value_cols=["purchase_value"],
    )
    return out.select(
        "event_id", "user_id", F.col("purchase_value").alias("last_purchase_value")
    )


# q4_order_priority_check and q12_priority_shipping (standalone entries
# through round 4) are fused into tpch_adapted_suite's q4/q12 branches
# (suite/tpch.py) — their driver-sweep slots now carry the quality/
# upsert tier (suite/maintenance.py).


