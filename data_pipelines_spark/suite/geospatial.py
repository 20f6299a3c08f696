"""Geospatial operator queries: spatial join (J9), combined thresholds
(J5), haversine math (F10) — driven through the TPC-H tables with
synthesized coordinates so DuckDB can oracle them exactly.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from data_pipelines_spark.operators.flood import combine_thresholds
from data_pipelines_spark.operators.spatial import point_in_polygon_join
from data_pipelines_spark.session import tune
from data_pipelines_spark.sources.tables import load_table
from data_pipelines_spark.suite._registry import make_registry

QUERIES, ORACLES, register = make_registry()


def _dec(col, p=3):
    return F.round(col, p).cast(f"decimal(12,{p})").cast("string")


@register(
    "spatial_join_zones",
    """
    SELECT c.c_custkey AS point_id, CAST(n.n_nationkey AS BIGINT) AS zone_id
    FROM customer c
    JOIN nation n
      ON (c.c_custkey % 50) + 0.5  > (n.n_nationkey % 5) * 10
     AND (c.c_custkey % 50) + 0.5  < (n.n_nationkey % 5) * 10 + 8
     AND ((c.c_custkey * 7) % 50) + 0.5 > FLOOR(n.n_nationkey / 5) * 10
     AND ((c.c_custkey * 7) % 50) + 0.5 < FLOOR(n.n_nationkey / 5) * 10 + 6
    """,
)
def spatial_join_zones(spark, sf_dir):
    """J9: point-in-polygon join — bucket prefilter + exact vectorized
    ray casting (operators/spatial.py). Zones are synthesized rectangles
    (one per nation) so the oracle can state containment arithmetically;
    the Spark side runs the *general* polygon path on their WKT."""
    tune(spark)
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")

    min_x = (F.col("n_nationkey") % 5).cast("double") * 10.0
    min_y = F.floor(F.col("n_nationkey") / 5).cast("double") * 10.0
    max_x, max_y = min_x + 8.0, min_y + 6.0
    sp, comma = F.lit(" "), F.lit(",")
    wkt = F.concat(
        F.lit("POLYGON (("),
        _dec(min_x), sp, _dec(min_y), comma,
        _dec(min_x), sp, _dec(max_y), comma,
        _dec(max_x), sp, _dec(max_y), comma,
        _dec(max_x), sp, _dec(min_y), comma,
        _dec(min_x), sp, _dec(min_y),
        F.lit("))"),
    )
    zones = nation.select(
        F.col("n_nationkey").cast("long").alias("id"), wkt.alias("geometry")
    )
    points = cust.select(
        F.col("c_custkey").alias("point_id"),
        ((F.col("c_custkey") % 50) + 0.5).cast("double").alias("x"),
        (((F.col("c_custkey") * 7) % 50) + 0.5).cast("double").alias("y"),
    )
    # zones is the nation dimension (25 rows) — known broadcast-safe,
    # so skip the size probe; broadcast=None would count() first.
    return point_in_polygon_join(points, zones, bucket_size=10.0, broadcast=True)


@register(
    "combined_thresholds",
    """
    WITH t2 AS (
        SELECT ROUND(CAST(p_partkey AS DOUBLE), 3) AS latitude,
               ROUND(CAST(0.025 AS DOUBLE), 3)     AS longitude,
               ROUND(p_retailprice % 40, 0) + 5    AS threshold_2y
        FROM part),
    t5 AS (
        SELECT ROUND(CAST(p_partkey AS DOUBLE), 3) AS latitude,
               ROUND(CAST(0.025 AS DOUBLE), 3)     AS longitude,
               ROUND(p_retailprice % 40, 0) + 15   AS threshold_5y
        FROM part),
    t20 AS (
        SELECT ROUND(CAST(p_partkey AS DOUBLE), 3) AS latitude,
               ROUND(CAST(0.025 AS DOUBLE), 3)     AS longitude,
               ROUND(p_retailprice % 40, 0) + 30   AS threshold_20y
        FROM part)
    SELECT t2.latitude, t2.longitude, threshold_2y, threshold_5y, threshold_20y
    FROM t2
    JOIN t5  ON t2.latitude = t5.latitude  AND t2.longitude = t5.longitude
    JOIN t20 ON t2.latitude = t20.latitude AND t2.longitude = t20.longitude
    """,
)
def combined_thresholds(spark, sf_dir):
    """J5/O1: the reference's three per-return-period tables merged into
    one per-cell row by iterative inner joins on the rounded grid key
    (`rp_thresholds.py:108-131`)."""
    tune(spark)
    part = load_table(spark, sf_dir, "part")

    def tbl(offset: int, name: str):
        return part.select(
            F.col("p_partkey").cast("double").alias("latitude"),
            F.lit(0.025).cast("double").alias("longitude"),
            (F.round(F.col("p_retailprice") % 40, 0) + offset).alias(name),
        )

    return combine_thresholds(
        tbl(5, "threshold_2y"), tbl(15, "threshold_5y"), tbl(30, "threshold_20y")
    )


# F10 haversine coverage lives in suite/advanced.py
# (customer_scalar_suite) since the round-2 registry trim; the
# haversine_km kernel itself is unchanged in functions/geo.py.
