"""Relational operator coverage: filters, joins, windows, aggregations,
set ops — each mirroring a reference operator (SURVEY.md §2 tags noted
per query) on the driver's TPC-H-ish tables.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from data_pipelines_spark.operators.zonal import coarsen_sum
from data_pipelines_spark.plans.dense import dense_agg, key_universe
from data_pipelines_spark.plans.windows import (
    constant_from_marker,
    group_max_broadcast,
)
from data_pipelines_spark.session import tune
from data_pipelines_spark.sources.tables import load_table
from data_pipelines_spark.suite._registry import make_registry

QUERIES, ORACLES, register = make_registry()


def _zkey_oracle_terms(bits: int = 16) -> str:
    # Morton interleave over pre-bound zx/zy — mirrors functions.grid.
    # zorder_key bit for bit (same shifts, same OR order).
    terms = []
    for i in range(bits):
        terms.append(f"(((zx >> {i}) & 1) << {2 * i})")
        terms.append(f"(((zy >> {i}) & 1) << {2 * i + 1})")
    return " | ".join(terms)


_ROI_SQL = f"""
SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_discount,
       {_zkey_oracle_terms()} AS zkey
FROM (
    SELECT *,
           least(65535, greatest(0, CAST(floor((l_quantity + 90.0) / 180.0
               * 65536) AS BIGINT))) AS zy,
           least(65535, greatest(0, CAST(floor((l_discount * 100 + 180.0)
               / 360.0 * 65536) AS BIGINT))) AS zx
    FROM lineitem
    WHERE l_quantity >= 10 AND l_quantity <= 30
      AND l_discount >= 0.02 AND l_discount <= 0.08
)
"""


@register("roi_restrict_projection", _ROI_SQL)
def roi_restrict_projection(spark, sf_dir):
    """P1/P3/P6 + S10 write-side clustering: bounding-box-style range
    predicate + projection (predicate and column set both reach the
    parquet scan — pushdown + pruning, replacing the reference's
    hand-placed post-load slices), with the Morton Z-order key attached
    as the write-layout sort key. l_quantity plays latitude and
    l_discount*100 longitude; the oracle re-derives the quantization
    and the 32-term bit interleave in SQL, so the space-filling-curve
    arithmetic is hash-checked end to end, not just unit-pinned."""
    tune(spark)
    from data_pipelines_spark.functions.grid import zorder_key

    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.where(
            F.col("l_quantity").between(10, 30)
            & F.col("l_discount").between(0.02, 0.08)
        )
        .select(
            "l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice",
            "l_discount",
        )
        .withColumn(
            "zkey", zorder_key(F.col("l_quantity"), F.col("l_discount") * 100)
        )
    )


@register(
    "rounded_key_broadcast_join",
    """
    WITH keyed AS (
        SELECT CAST(ROUND(l_tax * 100, 0) AS BIGINT) AS tax_key,
               l_quantity, l_extendedprice
        FROM lineitem
    ),
    bands(tax_key, tax_band) AS (
        VALUES (0, 'T0'), (1, 'T1'), (2, 'T2'), (3, 'T3'), (4, 'T4'),
               (5, 'T5'), (6, 'T6'), (7, 'T7'), (8, 'T8')
    )
    SELECT COALESCE(b.tax_band, 'OTHER') AS tax_band,
           count(*)             AS line_cnt,
           min(l_extendedprice) AS min_price,
           max(l_extendedprice) AS max_price,
           sum(l_quantity)      AS sum_qty
    FROM keyed k LEFT JOIN bands b ON k.tax_key = b.tax_key
    GROUP BY 1
    """,
)
def rounded_key_broadcast_join(spark, sf_dir):
    """F1/J1: float keys are only joinable after canonicalization
    (reference rounds all grid keys to 3 decimals before every join);
    the dimension side is an explicit broadcast."""
    tune(spark)
    li = load_table(spark, sf_dir, "lineitem")
    keyed = li.select(
        F.round(F.col("l_tax") * 100, 0).cast("long").alias("tax_key"),
        "l_quantity",
        "l_extendedprice",
    )
    bands = spark.createDataFrame(
        [(i, f"T{i}") for i in range(9)], "tax_key bigint, tax_band string"
    )
    return (
        keyed.join(F.broadcast(bands), "tax_key", "left")
        .groupBy(F.coalesce(F.col("tax_band"), F.lit("OTHER")).alias("tax_band"))
        .agg(
            F.count(F.lit(1)).alias("line_cnt"),
            F.min("l_extendedprice").alias("min_price"),
            F.max("l_extendedprice").alias("max_price"),
            F.sum("l_quantity").alias("sum_qty"),
        )
    )


@register(
    "control_marker_window",
    """
    SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice,
           max(CASE WHEN l_linenumber = 1 THEN l_quantity END)
               OVER (PARTITION BY l_orderkey) AS control_qty,
           max(l_extendedprice) OVER (PARTITION BY l_orderkey)
               AS max_order_price
    FROM lineitem
    """,
)
def control_marker_window(spark, sf_dir):
    """J2-as-window plus A2/J7-as-window in one stage: distribute a
    marker row's value (the 'control member', reference
    `discharge.py:292-302`) to every row of its group without a
    self-join (max() because the marker is not unique here), and attach
    the group max to detail rows in the same single shuffle (reference
    computes agg then joins back, `transforms.py:101-112`). Both window
    columns share the l_orderkey partition so Spark evaluates them in
    one exchange + one window stage — this absorbed the former
    group_max_broadcast_window query (registry trim)."""
    tune(spark)
    li = load_table(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_orderkey")
    with_marker = li.withColumn(
        "control_qty",
        F.max(F.when(F.col("l_linenumber") == 1, F.col("l_quantity"))).over(w),
    )
    return group_max_broadcast(
        with_marker, ["l_orderkey"], "l_extendedprice", "max_order_price"
    ).select(
        "l_orderkey",
        "l_linenumber",
        "l_quantity",
        "l_extendedprice",
        "control_qty",
        "max_order_price",
    )


@register(
    "argmax_per_group",
    """
    SELECT l_orderkey,
           CAST(l_linenumber AS BIGINT) AS peak_linenumber,
           l_quantity                   AS peak_qty
    FROM (
        SELECT *, row_number() OVER (
            PARTITION BY l_orderkey
            ORDER BY l_quantity DESC, l_linenumber ASC) AS rn
        FROM lineitem
    )
    WHERE rn = 1
    """,
)
def argmax_per_group(spark, sf_dir):
    """A5/O2: deterministic top-1 per group under the total order
    (quantity DESC, linenumber ASC).

    r14: expressed as ``max_by`` over the order struct (quantity,
    -linenumber) instead of a row_number window. Three formulations
    were A/B-measured interleaved in one session at sf0.1 (min of 4):
    max_by 0.63 s, row_number window 0.92 s, array_max(collect_list)
    1.10 s. max_by's struct ordering demotes the aggregate to
    SortAggregate, but sorting 600k narrow rows is cheaper here than
    either the window's two-phase rank-limit sorts or the collected
    list's per-group object buffers — the measured order, not the
    assumed one (guide §1.1). max over (quantity, -linenumber) == first
    row under (quantity DESC, linenumber ASC), including NaN-greatest
    semantics (total order, so the argmax is unique; value-equality
    pinned by the oracle hash). `top1_per_group` stays the general
    helper for whole-row callers."""
    tune(spark)
    li = load_table(spark, sf_dir, "lineitem")
    peak = F.max_by(
        F.struct(F.col("l_linenumber"), F.col("l_quantity")),
        F.struct(F.col("l_quantity"), (-F.col("l_linenumber")).alias("__nl")),
    )
    return (
        li.groupBy("l_orderkey")
        .agg(peak.alias("__peak"))
        .select(
            "l_orderkey",
            F.col("__peak.l_linenumber").cast("long").alias("peak_linenumber"),
            F.col("__peak.l_quantity").alias("peak_qty"),
        )
    )


@register(
    "semi_join_filter",
    """
    SELECT l_returnflag,
           count(*)        AS line_cnt,
           sum(l_quantity) AS sum_qty,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18, 2))) AS DOUBLE) AS sum_price
    FROM lineitem
    WHERE l_orderkey IN (SELECT o_orderkey FROM orders WHERE o_totalprice > 250000)
    GROUP BY 1
    """,
)
def semi_join_filter(spark, sf_dir):
    """J4: left-semi join used purely as a filter (reference
    `discharge.py:347-352` uses an inner merge for this). Money sums go
    through DECIMAL so partial-aggregation order can't perturb them."""
    tune(spark)
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    hi = orders.where(F.col("o_totalprice") > 250000).select("o_orderkey")
    return (
        li.join(hi, li.l_orderkey == hi.o_orderkey, "left_semi")
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("line_cnt"),
            F.sum("l_quantity").alias("sum_qty"),
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_price"),
        )
    )


@register(
    "dense_group_count",
    """
    SELECT c.c_custkey, p.o_orderpriority, COALESCE(o.order_cnt, 0) AS order_cnt
    FROM customer c
    CROSS JOIN (SELECT DISTINCT o_orderpriority FROM orders) p
    LEFT JOIN (
        SELECT o_custkey, o_orderpriority, count(*) AS order_cnt
        FROM orders GROUP BY 1, 2
    ) o ON o.o_custkey = c.c_custkey AND o.o_orderpriority = p.o_orderpriority
    """,
)
def dense_group_count(spark, sf_dir):
    """A7: the dense-group contract — one row for EVERY (customer,
    priority) pair including zero counts, like the reference's zonal
    count with ``expected_groups`` (`global_forest_watch.py:200-206`)."""
    tune(spark)
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    universe = key_universe(
        customer.select("c_custkey"),
        orders.select("o_orderpriority").distinct(),
    )
    dense = dense_agg(
        orders.select(
            F.col("o_custkey").alias("c_custkey"), "o_orderpriority"
        ),
        universe,
        ["c_custkey", "o_orderpriority"],
        [F.count(F.lit(1)).alias("order_cnt")],
        fill={"order_cnt": 0},
    )
    return dense


_ZONED_SQL = """
        SELECT (l_partkey % 340) - 170 AS x,
               (l_suppkey % 160) - 80 AS y,
               CAST(l_linenumber - 1 AS BIGINT) AS lossyear,
               l_orderkey % 37 AS id,
               l_quantity
        FROM lineitem
"""


def _zonal_suite_sql() -> str:
    from data_pipelines_spark.suite.advanced import _hav_sql

    lat, lon = "CAST(y AS DOUBLE)", "CAST(x AS DOUBLE)"
    px = (
        f"({_hav_sql(f'{lat} - 0.125', lon, f'{lat} + 0.125', lon)})"
        f" * ({_hav_sql(lat, f'{lon} - 0.125', lat, f'{lon} + 0.125')})"
    )
    return f"""
    WITH zoned AS ({_ZONED_SQL}),
    counts AS (
        SELECT b.id, yr.year, coalesce(c.cnt, 0) AS loss_incidents
        FROM (SELECT DISTINCT id FROM zoned) b
        CROSS JOIN (SELECT unnest(range(1, 23)) AS year) yr
        LEFT JOIN (SELECT id, lossyear AS year, count(*) AS cnt
                   FROM zoned WHERE lossyear > 0 GROUP BY 1, 2) c
          ON b.id = c.id AND yr.year = c.year
    ),
    first_cell AS (
        SELECT id, y, x FROM (
            SELECT id, y, x,
                   row_number() OVER (PARTITION BY id ORDER BY y, x) AS rk
            FROM zoned) WHERE rk = 1
    ),
    areas AS (SELECT id, ROUND({px}, 6) AS px FROM first_cell)
    SELECT 'retile' AS method,
           tile_x AS k1, tile_y AS k2, CAST(NULL AS BIGINT) AS k3,
           CAST(count(*) AS BIGINT) AS cnt,
           CAST(sum(l_quantity) AS DOUBLE) AS val
    FROM (
        SELECT unnest(range(CAST(FLOOR((y - 8) / 64.0) AS BIGINT),
                            CAST(FLOOR((y + 8) / 64.0) AS BIGINT) + 1))
                   AS tile_y,
               tile_x, l_quantity
        FROM (
            SELECT unnest(range(CAST(FLOOR((x - 8) / 64.0) AS BIGINT),
                                CAST(FLOOR((x + 8) / 64.0) AS BIGINT) + 1))
                       AS tile_x,
                   y, l_quantity
            FROM zoned
        )
    )
    GROUP BY 1, 2, 3
    UNION ALL
    SELECT 'pyramid' AS method,
           CAST(FLOOR(x / POW(2, lv)) AS BIGINT) AS k1,
           CAST(FLOOR(y / POW(2, lv)) AS BIGINT) AS k2,
           lv AS k3,
           CAST(count(*) AS BIGINT) AS cnt,
           CAST(sum(l_quantity) AS DOUBLE) AS val
    FROM zoned, (SELECT unnest([1, 2, 3]) AS lv) levels
    GROUP BY 1, 2, 3, 4
    UNION ALL
    SELECT 'coarsen' AS method,
           CAST(FLOOR(x / 10) AS BIGINT) AS k1,
           CAST(FLOOR(y / 5) AS BIGINT) AS k2,
           CAST(NULL AS BIGINT) AS k3,
           CAST(NULL AS BIGINT) AS cnt,
           CAST(sum(l_quantity) AS DOUBLE) AS val
    FROM zoned GROUP BY 1, 2, 3
    UNION ALL
    SELECT 'loss_mask',
           CAST(FLOOR(x / 10) AS BIGINT),
           CAST(FLOOR(y / 5) AS BIGINT),
           lossyear,
           CAST(count(*) AS BIGINT),
           CAST(NULL AS DOUBLE)
    FROM zoned WHERE lossyear BETWEEN 1 AND 22
    GROUP BY 1, 2, 3, 4
    UNION ALL
    SELECT 'treeloss', c.id, c.year + 2000, CAST(NULL AS BIGINT),
           CAST(c.loss_incidents AS BIGINT), a.px
    FROM counts c LEFT JOIN areas a ON c.id = a.id
    """


@register("zonal_treeloss_suite", _zonal_suite_sql())
def zonal_treeloss_suite(spark, sf_dir):
    """The full GFW zonal chain (reference `global_forest_watch.py`),
    method-tagged at the common (method, k1, k2, k3, cnt, val) grain
    over lineitem re-read as long-form pixels (x = lon from partkey,
    y = lat from suppkey, lossyear 0-6 from linenumber, basin id from
    orderkey — keeping the coordinates in geographic range so the
    pixel-area trigonometry is exercised on real latitudes):

    - ``coarsen`` — A8 block-sum downsample (`zonal.coarsen_sum`,
      floor-divided coordinates, map-side partials); k=(block_x,
      block_y), val the quantity sum.
    - ``loss_mask`` — F14/U2 per-year loss masks chained into the
      coarsen (`zonal.yearly_loss_masks` -> `coarsen_sum` with the
      year as an extra key): the long layout makes the reference's 22
      stacked equality masks one groupBy; k3 is the year, cnt the
      per-block loss-pixel count. Year 0 (no loss) is excluded by the
      mask, not the data.
    - ``treeloss`` — the J8 join of the A7/F15 dense per-(basin, year)
      incident counts (zero rows PRESERVED for all 22 years — most are
      empty here, so the dense fill is exercised hard) with the A6+F11
      per-basin representative pixel area (deterministic min-(y, x)
      first cell, haversine height x width), broadcast on the basin
      side (`zonal.treeloss_per_basin`); k=(basin, calendar year), cnt
      the incidents, val the basin pixel area (km^2, 1e-6 rounded).

    - ``retile`` — the sentinel mosaic retile-with-overlap
      (`operators/tiles.py`, reference `gdal_retile.py -overlap`
      semantics): every pixel exploded to each covering
      64px-tile-with-8px-halo; k=(tile_x, tile_y), cnt the covered
      pixel count (halo pixels counted in BOTH neighbors), val the
      quantity sum — the oracle replays the interval arithmetic with
      nested unnested ranges.
    - ``pyramid`` — the serving-pyramid levels (reference
      `gdal_retile.py -levels`, postprocessing): iterative log-depth
      halving (each level aggregates the previous), hash-checked
      against the oracle grouping the BASE at floor(c/2^level) —
      associativity made visible; k3 is the level.

    Replaces the coarsen-only `coarsen_block_sum` entry: same slot, the
    whole zonal module now passes the driver hash gate."""
    from data_pipelines_spark.operators.tiles import (
        build_pyramid,
        retile_with_overlap,
    )
    from data_pipelines_spark.operators.zonal import (
        treeloss_per_basin,
        yearly_loss_masks,
    )

    tune(spark)
    li = load_table(spark, sf_dir, "lineitem")
    zoned = li.select(
        ((F.col("l_partkey") % 340) - 170).cast("long").alias("x"),
        ((F.col("l_suppkey") % 160) - 80).cast("long").alias("y"),
        (F.col("l_linenumber") - 1).cast("long").alias("lossyear"),
        (F.col("l_orderkey") % 37).cast("long").alias("id"),
        F.col("l_quantity"),
    )
    nul_l, nul_d = F.lit(None).cast("long"), F.lit(None).cast("double")
    coarsen = coarsen_sum(
        zoned, block_x=10, block_y=5, value_col="l_quantity"
    ).select(
        F.lit("coarsen").alias("method"),
        F.col("block_x").cast("long").alias("k1"),
        F.col("block_y").cast("long").alias("k2"),
        nul_l.alias("k3"),
        nul_l.alias("cnt"),
        F.col("l_quantity_sum").cast("double").alias("val"),
    )
    masks = coarsen_sum(
        yearly_loss_masks(zoned), block_x=10, block_y=5,
        value_col="mask", extra_keys=("year",),
    ).select(
        F.lit("loss_mask").alias("method"),
        F.col("block_x").cast("long").alias("k1"),
        F.col("block_y").cast("long").alias("k2"),
        F.col("year").cast("long").alias("k3"),
        F.col("mask_sum").cast("long").alias("cnt"),
        nul_d.alias("val"),
    )
    treeloss = treeloss_per_basin(
        zoned, zoned, pixel_size_deg=0.25, id_col="id"
    ).select(
        F.lit("treeloss").alias("method"),
        F.col("id").cast("long").alias("k1"),
        F.col("year").cast("long").alias("k2"),
        nul_l.alias("k3"),
        F.col("loss_incidents").cast("long").alias("cnt"),
        F.round(F.col("pixel_area_km2"), 6).alias("val"),
    )
    retile = (
        retile_with_overlap(zoned, tile_size=64, overlap=8)
        .groupBy("tile_x", "tile_y")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum("l_quantity").cast("double").alias("val"),
        )
        .select(
            F.lit("retile").alias("method"),
            F.col("tile_x").alias("k1"),
            F.col("tile_y").alias("k2"),
            nul_l.alias("k3"),
            "cnt",
            "val",
        )
    )
    pyramid = (
        build_pyramid(zoned, levels=3, value_col="l_quantity")
        .where(F.col("level") >= 1)
        .select(
            F.lit("pyramid").alias("method"),
            F.col("x").alias("k1"),
            F.col("y").alias("k2"),
            F.col("level").cast("long").alias("k3"),
            F.col("px_cnt").alias("cnt"),
            F.col("val_sum").cast("double").alias("val"),
        )
    )
    return (
        coarsen.unionByName(masks).unionByName(treeloss)
        .unionByName(retile).unionByName(pyramid)
    )


@register(
    "multiway_join_revenue",
    """
    SELECT r.r_name, n.n_name,
           count(*) AS line_cnt,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18, 2))
                    * CAST(1.0 - l_discount AS DECIMAL(8, 2))) AS DOUBLE)
               AS revenue
    FROM lineitem l
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    GROUP BY 1, 2
    """,
)
def multiway_join_revenue(spark, sf_dir):
    """J5-shaped chained joins (fact → small dims): Catalyst broadcasts
    every dimension side; revenue in exact decimal arithmetic."""
    tune(spark)
    li = load_table(spark, sf_dir, "lineitem")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    revenue = F.sum(
        F.col("l_extendedprice").cast("decimal(18,2)")
        * (F.lit(1.0) - F.col("l_discount")).cast("decimal(8,2)")
    ).cast("double")
    return (
        li.join(F.broadcast(supplier), li.l_suppkey == supplier.s_suppkey)
        .join(F.broadcast(nation), F.col("s_nationkey") == nation.n_nationkey)
        .join(F.broadcast(region), F.col("n_regionkey") == region.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(F.count(F.lit(1)).alias("line_cnt"), revenue.alias("revenue"))
    )


@register(
    "set_union_suite",
    """
    SELECT branch, row_cnt, sum_qty
    FROM (
        SELECT branch, count(*) AS row_cnt, sum(l_quantity) AS sum_qty
        FROM (
            SELECT 'HI' AS branch, l_quantity FROM lineitem WHERE l_discount >= 0.05
            UNION ALL
            SELECT 'LO' AS branch, l_quantity FROM lineitem WHERE l_discount < 0.05
        )
        GROUP BY 1
        UNION ALL
        SELECT 'BOTH' AS branch, count(*) AS row_cnt,
               CAST(NULL AS DOUBLE) AS sum_qty
        FROM (
            SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
            INTERSECT
            SELECT o_custkey FROM orders WHERE o_orderpriority = '5-LOW'
        )
        UNION ALL
        SELECT 'URGENT_ONLY' AS branch, count(*) AS row_cnt,
               CAST(NULL AS DOUBLE) AS sum_qty
        FROM (
            SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
            EXCEPT
            SELECT o_custkey FROM orders WHERE o_orderpriority = '5-LOW'
        )
    )
    """,
)
def set_union_suite(spark, sf_dir):
    """Set-operator surface in one frame: U1/U3 unionByName of branch
    frames then aggregate (the reference's ensemble concat along the
    member axis, `io_managers.py:206`) tagged 'HI'/'LO', plus
    INTERSECT / EXCEPT distinct-set semantics (absent in the reference;
    free in Spark) tagged 'BOTH'/'URGENT_ONLY'. Merges the former
    union_concat_branches and set_ops_customers queries (registry
    trim)."""
    tune(spark)
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    hi = li.where(F.col("l_discount") >= 0.05).select(
        F.lit("HI").alias("branch"), "l_quantity"
    )
    lo = li.where(F.col("l_discount") < 0.05).select(
        F.lit("LO").alias("branch"), "l_quantity"
    )
    branches = (
        hi.unionByName(lo)
        .groupBy("branch")
        .agg(
            F.count(F.lit(1)).alias("row_cnt"),
            F.sum("l_quantity").alias("sum_qty"),
        )
    )
    urgent = orders.where(F.col("o_orderpriority") == "1-URGENT").select("o_custkey")
    low = orders.where(F.col("o_orderpriority") == "5-LOW").select("o_custkey")
    null_qty = F.lit(None).cast("double").alias("sum_qty")
    both = urgent.intersect(low).agg(F.count(F.lit(1)).alias("row_cnt")).select(
        F.lit("BOTH").alias("branch"), "row_cnt", null_qty
    )
    only = urgent.subtract(low).agg(F.count(F.lit(1)).alias("row_cnt")).select(
        F.lit("URGENT_ONLY").alias("branch"), "row_cnt", null_qty
    )
    return branches.unionByName(both).unionByName(only)
