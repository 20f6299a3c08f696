"""The remaining classic TPC-H query shapes, adapted to the driver's
cut-down star schema and fused into one oracle-checked suite entry.

The driver's tables omit ``partsupp`` and the comment/phone/commit-date
columns, so each branch keeps the *query shape* (the join topology,
subquery pattern, and aggregation grain that make the TPC-H query
interesting) and substitutes available columns for the missing ones;
every adaptation is noted on its branch. Together with the suite's
existing q1/q3/q6/q14 entries this gives the engine a registered,
hash-checked representative of every TPC-H query family that is
expressible over the driver schema (q4 and q12 moved into this fused
suite in round 5 to free two driver-sweep slots).

All branches are normalized to one uniform grain
``(q, k1, k2, cnt, val)`` so the whole suite is a single driver sweep
entry (registry-budget trim, same pattern as ``set_union_suite``):
``q`` names the branch, ``k1``/``k2`` carry the group keys as strings,
``cnt`` an exact row count, ``val`` an exact-DECIMAL money sum (or
ratio of two such sums) rendered as DOUBLE.

Scale notes (100 TB): no forced broadcasts here — customer/part/
supplier all scale with the fact table in TPC-H, so join strategy is
left to Catalyst/AQE (auto-broadcast below threshold, shuffled hash /
sort-merge with skew handling above). Top-k uses orderBy+limit
(TakeOrderedAndProject: per-partition partial top-k, no global sort);
the q21 exists/not-exists pair is one groupBy over the order key plus
a join-back, not correlated per-row probes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from data_pipelines_spark.session import tune
from data_pipelines_spark.sources.tables import load_table
from data_pipelines_spark.suite._registry import make_registry

QUERIES, ORACLES, register = make_registry()

_DEC_PRICE = "decimal(18,2)"

_OUT_COLS = ("q", "k1", "k2", "cnt", "val")


def _disc_price():
    return F.col("l_extendedprice").cast(_DEC_PRICE) * (
        F.lit(1.0) - F.col("l_discount")
    ).cast("decimal(8,2)")


def _branch(df: DataFrame, q: str, k1=None, k2=None, cnt=None, val=None) -> DataFrame:
    """Normalize a branch result to the suite's uniform output grain."""
    return df.select(
        F.lit(q).alias("q"),
        (k1 if k1 is not None else F.lit("")).cast("string").alias("k1"),
        (k2 if k2 is not None else F.lit("")).cast("string").alias("k2"),
        (cnt if cnt is not None else F.lit(None)).cast("long").alias("cnt"),
        (val if val is not None else F.lit(None)).cast("double").alias("val"),
    )


_TPCH_SQL = """
WITH disc AS (
    SELECT l.*, CAST(l_extendedprice AS DECIMAL(18,2))
                * CAST(1.0 - l_discount AS DECIMAL(8,2)) AS disc_price
    FROM lineitem l
),
q4 AS (
    SELECT 'q4' AS q, o.o_orderpriority AS k1, '' AS k2,
           count(*) AS cnt, CAST(NULL AS DOUBLE) AS val
    FROM orders o
    WHERE EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey
          AND l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY)
    GROUP BY 2
),
q12 AS (
    SELECT 'q12' AS q, l_returnflag AS k1, prio AS k2,
           count(*) AS cnt, CAST(NULL AS DOUBLE) AS val
    FROM (
        SELECT l.l_returnflag,
               CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 'high' ELSE 'low' END AS prio
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    )
    GROUP BY 2, 3
),
q5 AS (
    SELECT 'q5' AS q, n.n_name AS k1, '' AS k2,
           count(*) AS cnt, CAST(sum(l.disc_price) AS DOUBLE) AS val
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN disc l   ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
                   AND c.c_nationkey = s.s_nationkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY 2
),
q7 AS (
    SELECT 'q7' AS q, n1.n_name AS k1,
           n2.n_name || '|' || CAST(EXTRACT(year FROM l.l_shipdate) AS VARCHAR) AS k2,
           count(*) AS cnt, CAST(sum(l.disc_price) AS DOUBLE) AS val
    FROM supplier s
    JOIN disc l ON s.s_suppkey = l.l_suppkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
    JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
    WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
      AND l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY 2, 3
),
q8 AS (
    SELECT 'q8' AS q,
           CAST(EXTRACT(year FROM o.o_orderdate) AS VARCHAR) AS k1, '' AS k2,
           count(*) AS cnt,
           CAST(sum(CASE WHEN n2.n_name = 'NATION_3' THEN l.disc_price
                         ELSE CAST(0 AS DECIMAL(27,4)) END) AS DOUBLE)
           / CAST(sum(l.disc_price) AS DOUBLE) AS val
    FROM part p
    JOIN disc l ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n2 ON s.s_nationkey = n2.n_nationkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'AMERICA' AND p.p_type = 'ECONOMY'
    GROUP BY 2
),
q9 AS (
    SELECT 'q9' AS q, n.n_name AS k1,
           CAST(EXTRACT(year FROM o.o_orderdate) AS VARCHAR) AS k2,
           count(*) AS cnt, CAST(sum(l.disc_price) AS DOUBLE) AS val
    FROM part p
    JOIN disc l ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE p.p_name LIKE '%red%'
    GROUP BY 2, 3
),
q10 AS (
    SELECT 'q10' AS q, c_name AS k1, CAST(c_custkey AS VARCHAR) AS k2,
           cnt, val
    FROM (
        SELECT c.c_custkey, c.c_name, count(*) AS cnt,
               CAST(sum(l.disc_price) AS DOUBLE) AS val
        FROM customer c
        JOIN orders o ON c.c_custkey = o.o_custkey
        JOIN disc l ON l.l_orderkey = o.o_orderkey
        WHERE l.l_returnflag = 'R'
          AND o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND o.o_orderdate <  TIMESTAMP '1997-04-01 00:00:00'
        GROUP BY 1, 2
        ORDER BY val DESC, c_custkey ASC
        LIMIT 20
    )
),
q13 AS (
    SELECT 'q13' AS q, CAST(c_count AS VARCHAR) AS k1, '' AS k2,
           count(*) AS cnt, CAST(NULL AS DOUBLE) AS val
    FROM (
        SELECT c.c_custkey, count(o.o_orderkey) AS c_count
        FROM customer c
        LEFT JOIN orders o ON c.c_custkey = o.o_custkey
                          AND o.o_orderpriority <> '1-URGENT'
        GROUP BY 1
    )
    GROUP BY 2
),
q15rev AS (
    SELECT l_suppkey, count(*) AS cnt, CAST(sum(disc_price) AS DOUBLE) AS total_rev
    FROM disc
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
    GROUP BY 1
),
q15 AS (
    SELECT 'q15' AS q, s.s_name AS k1, '' AS k2, r.cnt, r.total_rev AS val
    FROM q15rev r JOIN supplier s ON r.l_suppkey = s.s_suppkey
    WHERE r.total_rev = (SELECT max(total_rev) FROM q15rev)
),
q17 AS (
    SELECT 'q17' AS q, '' AS k1, '' AS k2, count(*) AS cnt,
           CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0 AS val
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#3'
      AND l.l_quantity < (
          SELECT 0.2 * avg(l2.l_quantity) FROM lineitem l2
          WHERE l2.l_partkey = p.p_partkey)
),
q18 AS (
    SELECT 'q18' AS q, c.c_name AS k1, CAST(g.l_orderkey AS VARCHAR) AS k2,
           g.cnt, g.sum_qty AS val
    FROM (
        SELECT l_orderkey, count(*) AS cnt, sum(l_quantity) AS sum_qty
        FROM lineitem GROUP BY 1 HAVING sum(l_quantity) > 200
    ) g
    JOIN orders o ON o.o_orderkey = g.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
),
q19 AS (
    SELECT 'q19' AS q, '' AS k1, '' AS k2, count(*) AS cnt,
           CAST(sum(l.disc_price) AS DOUBLE) AS val
    FROM disc l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 1 AND 20)
       OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 10 AND 30
           AND l.l_quantity BETWEEN 10 AND 30)
       OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 20 AND 50
           AND l.l_quantity BETWEEN 20 AND 45)
),
q20 AS (
    SELECT 'q20' AS q, s.s_name AS k1, '' AS k2,
           CAST(NULL AS BIGINT) AS cnt, CAST(NULL AS DOUBLE) AS val
    FROM supplier s
    WHERE s.s_suppkey IN (
        SELECT l.l_suppkey
        FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        WHERE p.p_name LIKE '%red%'
          AND l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l.l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
        GROUP BY 1 HAVING sum(l.l_quantity) > 300)
),
q21 AS (
    SELECT 'q21' AS q, s.s_name AS k1, '' AS k2,
           count(*) AS cnt, CAST(NULL AS DOUBLE) AS val
    FROM supplier s
    JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
    JOIN orders o ON o.o_orderkey = l1.l_orderkey
    WHERE o.o_orderstatus = 'F'
      AND l1.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      AND EXISTS (
          SELECT 1 FROM lineitem l2
          WHERE l2.l_orderkey = l1.l_orderkey
            AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (
          SELECT 1 FROM lineitem l3
          WHERE l3.l_orderkey = l1.l_orderkey
            AND l3.l_suppkey <> l1.l_suppkey
            AND l3.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
    GROUP BY 2
),
q22 AS (
    SELECT 'q22' AS q, CAST(c.c_nationkey % 5 AS VARCHAR) AS k1, '' AS k2,
           count(*) AS cnt,
           CAST(sum(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS val
    FROM customer c
    WHERE c.c_acctbal > (
        SELECT avg(c2.c_acctbal) FROM customer c2 WHERE c2.c_acctbal > 0)
      AND NOT EXISTS (
          SELECT 1 FROM orders o
          WHERE o.o_custkey = c.c_custkey
            AND o.o_orderdate >= TIMESTAMP '1999-01-01 00:00:00')
    GROUP BY 2
)
SELECT * FROM q4   UNION ALL SELECT * FROM q12 UNION ALL
SELECT * FROM q5   UNION ALL SELECT * FROM q7  UNION ALL
SELECT * FROM q8   UNION ALL SELECT * FROM q9  UNION ALL
SELECT * FROM q10  UNION ALL SELECT * FROM q13 UNION ALL
SELECT * FROM q15  UNION ALL SELECT * FROM q17 UNION ALL
SELECT * FROM q18  UNION ALL SELECT * FROM q19 UNION ALL
SELECT * FROM q20  UNION ALL SELECT * FROM q21 UNION ALL
SELECT * FROM q22
"""


@register("tpch_adapted_suite", _TPCH_SQL)
def tpch_adapted_suite(spark, sf_dir):
    """Fused TPC-H families q4/q5/q7/q8/q9/q10/q12/q13/q15/q17/q18/q19/
    q20/q21/q22, adapted to the driver schema (see module docstring).
    q4 and q12 were standalone registry entries through round 4; fusing
    them here freed two driver-sweep slots for the quality/upsert tier
    (suite/maintenance.py) while keeping both shapes hash-checked."""
    tune(spark)
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    part = load_table(spark, sf_dir, "part")

    def ts(s: str):
        return F.lit(s).cast("timestamp")

    disc = li.withColumn("disc_price", _disc_price())
    rev = F.sum("disc_price").cast("double")
    cnt = F.count(F.lit(1))

    # q4 — orders with at least one late line: the correlated EXISTS
    # with its non-equi ship-after-order condition decorrelates to a
    # distinct-late-orders frame plus a left-semi join.
    late = (
        li.join(
            orders,
            (li.l_orderkey == orders.o_orderkey)
            & (
                li.l_shipdate
                > F.date_add(orders.o_orderdate.cast("date"), 30).cast("timestamp")
            ),
            "inner",
        )
        .select("o_orderkey")
        .distinct()
    )
    q4 = _branch(
        orders.join(late, "o_orderkey", "left_semi")
        .groupBy("o_orderpriority")
        .agg(cnt.alias("cnt")),
        "q4", k1=F.col("o_orderpriority"), cnt=F.col("cnt"),
    )

    # q12 — priority mix per return flag over the fact-dim join: the
    # CASE label becomes a group key (one fused conditional-count pass;
    # no forced broadcast — orders scales with lineitem).
    q12 = _branch(
        li.join(
            orders.select("o_orderkey", "o_orderpriority"),
            li.l_orderkey == F.col("o_orderkey"),
        )
        .withColumn(
            "prio",
            F.when(
                F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), "high"
            ).otherwise("low"),
        )
        .groupBy("l_returnflag", "prio")
        .agg(cnt.alias("cnt")),
        "q12", k1=F.col("l_returnflag"), k2=F.col("prio"), cnt=F.col("cnt"),
    )

    # q5 — regional customer=supplier-nation revenue (classic q5; the
    # c_nationkey = s_nationkey equality is part of the join condition).
    q5 = _branch(
        cust.join(
            orders.where(
                (F.col("o_orderdate") >= ts("1996-01-01"))
                & (F.col("o_orderdate") < ts("1997-01-01"))
            ),
            F.col("c_custkey") == F.col("o_custkey"),
        )
        .join(disc, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            supp,
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(nation, F.col("s_nationkey") == F.col("n_nationkey"))
        .join(
            region.where(F.col("r_name") == "ASIA"),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .groupBy("n_name")
        .agg(cnt.alias("cnt"), rev.alias("val")),
        "q5", k1=F.col("n_name"), cnt=F.col("cnt"), val=F.col("val"),
    )

    # q7 — bilateral shipping volume by (supplier nation, customer
    # nation, ship year); the nation pair is an OR'd symmetric filter.
    n1 = nation.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    q7 = _branch(
        supp.join(
            disc.where(
                (F.col("l_shipdate") >= ts("1996-01-01"))
                & (F.col("l_shipdate") < ts("1998-01-01"))
            ),
            F.col("s_suppkey") == F.col("l_suppkey"),
        )
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(cust, F.col("c_custkey") == F.col("o_custkey"))
        .join(n1, F.col("s_nationkey") == F.col("n1_key"))
        .join(n2, F.col("c_nationkey") == F.col("n2_key"))
        .where(pair)
        .groupBy(
            "supp_nation",
            F.concat(
                F.col("cust_nation"), F.lit("|"), F.year("l_shipdate").cast("string")
            ).alias("k2"),
        )
        .agg(cnt.alias("cnt"), rev.alias("val")),
        "q7", k1=F.col("supp_nation"), k2=F.col("k2"),
        cnt=F.col("cnt"), val=F.col("val"),
    )

    # q8 — market share of one supplier nation within a customer region
    # per order year: conditional DECIMAL sum over total DECIMAL sum,
    # one double division at the end.
    nat_share = F.sum(
        F.when(F.col("supp_nation") == "NATION_3", F.col("disc_price")).otherwise(
            F.lit(0).cast("decimal(27,4)")
        )
    ).cast("double")
    q8 = _branch(
        part.where(F.col("p_type") == "ECONOMY")
        .join(disc, F.col("p_partkey") == F.col("l_partkey"))
        .join(supp, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(n1, F.col("s_nationkey") == F.col("n1_key"))
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(cust, F.col("c_custkey") == F.col("o_custkey"))
        .join(n2, F.col("c_nationkey") == F.col("n2_key"))
        .join(
            nation.select(F.col("n_nationkey").alias("nc_key"), "n_regionkey"),
            F.col("c_nationkey") == F.col("nc_key"),
        )
        .join(
            region.where(F.col("r_name") == "AMERICA"),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .groupBy(F.year("o_orderdate").cast("string").alias("k1"))
        .agg(cnt.alias("cnt"), (nat_share / rev).alias("val")),
        "q8", k1=F.col("k1"), cnt=F.col("cnt"), val=F.col("val"),
    )

    # q9 — nation/year profit for a part-name family. Adapted: the
    # driver schema has no partsupp, so profit = discounted revenue
    # (no ps_supplycost term); the join topology and LIKE filter stay.
    q9 = _branch(
        part.where(F.col("p_name").contains("red"))
        .join(disc, F.col("p_partkey") == F.col("l_partkey"))
        .join(supp, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(nation, F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name", F.year("o_orderdate").cast("string").alias("k2"))
        .agg(cnt.alias("cnt"), rev.alias("val")),
        "q9", k1=F.col("n_name"), k2=F.col("k2"),
        cnt=F.col("cnt"), val=F.col("val"),
    )

    # q10 — top-20 returned-item customers by quarterly revenue, via
    # orderBy+limit (TakeOrderedAndProject — distributed partial top-k,
    # never a single-partition global sort). Total order (revenue desc,
    # custkey asc) makes the cut deterministic.
    q10 = _branch(
        cust.join(
            orders.where(
                (F.col("o_orderdate") >= ts("1997-01-01"))
                & (F.col("o_orderdate") < ts("1997-04-01"))
            ),
            F.col("c_custkey") == F.col("o_custkey"),
        )
        .join(
            disc.where(F.col("l_returnflag") == "R"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("c_custkey", "c_name")
        .agg(cnt.alias("cnt"), rev.alias("val"))
        .orderBy(F.desc("val"), F.asc("c_custkey"))
        .limit(20),
        "q10", k1=F.col("c_name"), k2=F.col("c_custkey"),
        cnt=F.col("cnt"), val=F.col("val"),
    )

    # q13 — customer order-count distribution with a filtered LEFT join
    # (the o_comment NOT LIKE filter becomes a priority filter).
    q13 = _branch(
        cust.join(
            orders.where(F.col("o_orderpriority") != "1-URGENT"),
            F.col("c_custkey") == F.col("o_custkey"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy(F.col("c_count").cast("string").alias("k1"))
        .agg(cnt.alias("cnt")),
        "q13", k1=F.col("k1"), cnt=F.col("cnt"),
    )

    # q15 — top supplier by quarterly revenue: the revenue "view" is
    # computed once, its 1-row max broadcast back as the filter.
    q15rev = (
        disc.where(
            (F.col("l_shipdate") >= ts("1996-01-01"))
            & (F.col("l_shipdate") < ts("1996-04-01"))
        )
        .groupBy("l_suppkey")
        .agg(cnt.alias("cnt"), rev.alias("total_rev"))
    )
    q15 = _branch(
        q15rev.join(F.broadcast(q15rev.agg(F.max("total_rev").alias("max_rev"))))
        .where(F.col("total_rev") == F.col("max_rev"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_name", "cnt", "total_rev"),
        "q15", k1=F.col("s_name"), cnt=F.col("cnt"), val=F.col("total_rev"),
    )

    # q17 — small-quantity-order revenue: the correlated per-part avg
    # decorrelates to a groupBy over the brand-restricted fact slice
    # (partkey determines brand, so restricting before the avg is
    # exact), joined back as a dimension-sized frame.
    li_brand = li.join(
        part.where(F.col("p_brand") == "Brand#3").select("p_partkey"),
        F.col("l_partkey") == F.col("p_partkey"),
    )
    part_avg = li_brand.groupBy(F.col("l_partkey").alias("avg_partkey")).agg(
        F.avg("l_quantity").alias("avg_qty")
    )
    q17 = _branch(
        li_brand.join(part_avg, F.col("l_partkey") == F.col("avg_partkey"))
        .where(F.col("l_quantity") < F.lit(0.2) * F.col("avg_qty"))
        .agg(
            cnt.alias("cnt"),
            (
                F.sum(F.col("l_extendedprice").cast(_DEC_PRICE)).cast("double")
                / F.lit(7.0)
            ).alias("val"),
        ),
        "q17", cnt=F.col("cnt"), val=F.col("val"),
    )

    # q18 — large-volume orders (group-HAVING on the fact, then joined
    # out to order/customer attributes).
    q18 = _branch(
        li.groupBy("l_orderkey")
        .agg(cnt.alias("cnt"), F.sum("l_quantity").alias("sum_qty"))
        .where(F.col("sum_qty") > 200)
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(cust, F.col("c_custkey") == F.col("o_custkey"))
        .select("c_name", "l_orderkey", "cnt", "sum_qty"),
        "q18", k1=F.col("c_name"), k2=F.col("l_orderkey"),
        cnt=F.col("cnt"), val=F.col("sum_qty"),
    )

    # q19 — disjunctive brand/size/quantity predicate bands over the
    # part join (the shipmode/shipinstruct legs don't exist in this
    # schema; the OR-of-ANDs shape is the point).
    bands = (
        (F.col("p_brand") == "Brand#1")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(1, 20)
    ) | (
        (F.col("p_brand") == "Brand#2")
        & F.col("p_size").between(10, 30)
        & F.col("l_quantity").between(10, 30)
    ) | (
        (F.col("p_brand") == "Brand#3")
        & F.col("p_size").between(20, 50)
        & F.col("l_quantity").between(20, 45)
    )
    q19 = _branch(
        disc.join(part, F.col("p_partkey") == F.col("l_partkey"))
        .where(bands)
        .agg(cnt.alias("cnt"), rev.alias("val")),
        "q19", cnt=F.col("cnt"), val=F.col("val"),
    )

    # q20 — suppliers with large shipped volume of a part family in a
    # year: group-HAVING inner query, then a left-semi membership probe
    # (partsupp availability becomes shipped quantity).
    red_vol = (
        li.where(
            (F.col("l_shipdate") >= ts("1996-01-01"))
            & (F.col("l_shipdate") < ts("1997-01-01"))
        )
        .join(
            part.where(F.col("p_name").contains("red")).select("p_partkey"),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("red_qty"))
        .where(F.col("red_qty") > 300)
    )
    q20 = _branch(
        supp.join(red_vol, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .select("s_name"),
        "q20", k1=F.col("s_name"),
    )

    # q21 — suppliers who were the sole late shipper on multi-supplier
    # finished orders ("late" adapted to shipdate > orderdate + 60d —
    # no commit/receipt dates in this schema). The EXISTS / NOT EXISTS
    # pair collapses to ONE aggregation over the order key (distinct
    # supplier count and distinct late-supplier count) joined back to
    # the late lines — no correlated probes, one extra fact shuffle.
    fl = li.join(
        orders.where(F.col("o_orderstatus") == "F").select(
            "o_orderkey", "o_orderdate"
        ),
        F.col("l_orderkey") == F.col("o_orderkey"),
    ).withColumn(
        "late", F.col("l_shipdate") > F.expr("o_orderdate + INTERVAL 60 DAY")
    )
    ostats = fl.groupBy(F.col("l_orderkey").alias("g_orderkey")).agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct(F.when(F.col("late"), F.col("l_suppkey"))).alias("n_late"),
    )
    q21 = _branch(
        fl.where(F.col("late"))
        .join(
            ostats.where((F.col("n_supp") > 1) & (F.col("n_late") == 1)),
            F.col("l_orderkey") == F.col("g_orderkey"),
        )
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(cnt.alias("cnt")),
        "q21", k1=F.col("s_name"), cnt=F.col("cnt"),
    )

    # q22 — above-average-balance customers gone quiet: scalar-subquery
    # threshold (1-row broadcast) + anti join against recent orders;
    # the phone country code becomes a nationkey bucket.
    avg_bal = cust.where(F.col("c_acctbal") > 0).agg(
        F.avg("c_acctbal").alias("avg_bal")
    )
    recent = orders.where(F.col("o_orderdate") >= ts("1999-01-01")).select(
        "o_custkey"
    )
    q22 = _branch(
        cust.join(F.broadcast(avg_bal))
        .where(F.col("c_acctbal") > F.col("avg_bal"))
        .join(recent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy((F.col("c_nationkey") % 5).cast("string").alias("k1"))
        .agg(
            cnt.alias("cnt"),
            F.sum(F.col("c_acctbal").cast(_DEC_PRICE)).cast("double").alias("val"),
        ),
        "q22", k1=F.col("k1"), cnt=F.col("cnt"), val=F.col("val"),
    )

    out = q4
    for b in (q12, q5, q7, q8, q9, q10, q13, q15, q17, q18, q19, q20, q21, q22):
        out = out.unionByName(b)
    return out
