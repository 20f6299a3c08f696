"""Spatial join: points (grid cells) ⨝ polygons (zones).

Reference J9 (`assets/deforestation/global_forest_watch.py:76-95,166`)
rasterizes basin polygons onto the pixel grid with geocube (GDAL);
semantically that is a point-in-polygon join between cell centers and
polygons, using the cell-center containment rule. The engine expresses
it in two stages (SURVEY.md §2.4 J9):

1. **Bucket prefilter** (pure relational): polygons are exploded onto a
   coarse grid of buckets covering their bbox; points hash to their
   bucket; an equi-join on the bucket key + a bbox range predicate
   bounds the candidate set. All JVM-side, broadcastable when the
   polygon side is small.
2. **Exact test**: vectorized even-odd ray casting over Arrow batches
   (`mapInPandas` + numpy) — no shapely/GDAL dependency, matching the
   rasterizer's cell-center rule. Points exactly on an edge follow the
   even-odd crossing convention (document, don't rely: real pipelines
   place cell centers off polygon edges).

Scale: bucket size trades candidate-set size vs polygon duplication;
for z zones averaging b buckets each the build side is z·b rows —
broadcast for dimension-sized zone tables, shuffle-join on the bucket
key (well distributed) otherwise. The exact test touches only
candidates, ~(points in bbox) per zone.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def parse_wkt_polygon(wkt: str) -> np.ndarray:
    """Exterior ring of a WKT POLYGON as an (N, 2) float array.

    Minimal parser for the engine's own WKT convention
    (`functions/grid.py:cell_wkt`, reference `transforms.py:287-309`);
    holes/multipolygons are out of scope for parity.
    """
    body = wkt.strip()
    if not body.upper().startswith("POLYGON"):
        raise ValueError(f"not a polygon WKT: {wkt[:40]}")
    ring = body[body.index("((") + 2 : body.index("))")]
    # first ring only (exterior)
    ring = ring.split("),")[0]
    pts = [p.strip().split() for p in ring.split(",")]
    return np.array([[float(x), float(y)] for x, y in pts], dtype="float64")


def points_in_ring(px: np.ndarray, py: np.ndarray, ring: np.ndarray) -> np.ndarray:
    """Vectorized even-odd ray casting: bool mask of points inside."""
    inside = np.zeros(len(px), dtype=bool)
    x1, y1 = ring[:-1, 0], ring[:-1, 1]
    x2, y2 = ring[1:, 0], ring[1:, 1]
    for i in range(len(x1)):
        if y1[i] == y2[i]:
            continue  # horizontal edge never crossed by a horizontal ray
        crosses = (y1[i] > py) != (y2[i] > py)
        if not crosses.any():
            continue
        x_at = x1[i] + (py - y1[i]) * (x2[i] - x1[i]) / (y2[i] - y1[i])
        inside ^= crosses & (px < x_at)
    return inside


def polygons_with_bbox(
    polygons: DataFrame, id_col: str = "id", wkt_col: str = "geometry"
) -> DataFrame:
    """Attach bbox columns (min_x, min_y, max_x, max_y) by parsing the
    WKT once per polygon (Arrow-batched)."""

    schema = f"{id_col} long, {wkt_col} string, min_x double, min_y double, max_x double, max_y double"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rings = pdf[wkt_col].map(parse_wkt_polygon)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    wkt_col: pdf[wkt_col],
                    "min_x": rings.map(lambda r: r[:, 0].min()),
                    "min_y": rings.map(lambda r: r[:, 1].min()),
                    "max_x": rings.map(lambda r: r[:, 0].max()),
                    "max_y": rings.map(lambda r: r[:, 1].max()),
                }
            )

    return polygons.select(id_col, wkt_col).mapInPandas(run, schema)


def point_in_polygon_join(
    points: DataFrame,
    polygons: DataFrame,
    bucket_size: float,
    point_id: str = "point_id",
    x_col: str = "x",
    y_col: str = "y",
    poly_id: str = "id",
    wkt_col: str = "geometry",
) -> DataFrame:
    """(point_id, zone_id) pairs for points contained in polygons."""
    polys = polygons_with_bbox(polygons, poly_id, wkt_col)

    # Explode each polygon onto every bucket its bbox covers.
    poly_buckets = polys.select(
        F.col(poly_id).alias("__zone_id"),
        wkt_col,
        "min_x",
        "min_y",
        "max_x",
        "max_y",
        F.explode(
            F.sequence(
                F.floor(F.col("min_x") / bucket_size),
                F.floor(F.col("max_x") / bucket_size),
            )
        ).alias("bx"),
    ).select(
        "*",
        F.explode(
            F.sequence(
                F.floor(F.col("min_y") / bucket_size),
                F.floor(F.col("max_y") / bucket_size),
            )
        ).alias("by"),
    )

    pts = points.select(
        F.col(point_id),
        F.col(x_col).alias("__px"),
        F.col(y_col).alias("__py"),
        F.floor(F.col(x_col) / bucket_size).alias("bx"),
        F.floor(F.col(y_col) / bucket_size).alias("by"),
    )

    cand = pts.join(F.broadcast(poly_buckets), ["bx", "by"]).where(
        (F.col("__px") >= F.col("min_x"))
        & (F.col("__px") <= F.col("max_x"))
        & (F.col("__py") >= F.col("min_y"))
        & (F.col("__py") <= F.col("max_y"))
    )

    from data_pipelines_spark.plans.parallelism import spread

    # The exact test is Python-side; spread candidates so a single-file
    # input doesn't serialize it onto one core.
    cand = spread(cand)

    out_schema = f"{point_id} long, zone_id long"

    def exact(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ring_cache: dict[str, np.ndarray] = {}
        for pdf in batches:
            if pdf.empty:
                continue
            keep_ids, keep_zones = [], []
            for wkt, grp in pdf.groupby(wkt_col, sort=False):
                ring = ring_cache.get(wkt)
                if ring is None:
                    ring = ring_cache[wkt] = parse_wkt_polygon(wkt)
                mask = points_in_ring(
                    grp["__px"].to_numpy(), grp["__py"].to_numpy(), ring
                )
                keep_ids.append(grp[point_id].to_numpy()[mask])
                keep_zones.append(grp["__zone_id"].to_numpy()[mask])
            yield pd.DataFrame(
                {
                    point_id: np.concatenate(keep_ids) if keep_ids else [],
                    "zone_id": np.concatenate(keep_zones) if keep_zones else [],
                }
            )

    return cand.mapInPandas(exact, out_schema)


def rasterize_zones(
    pixels: DataFrame,
    zones: DataFrame,
    bucket_size: float,
    x_col: str = "x",
    y_col: str = "y",
    zone_id: str = "id",
    wkt_col: str = "geometry",
) -> DataFrame:
    """Assign each pixel (cell center) its containing zone id — the
    relational equivalent of the reference's geocube rasterization
    (`global_forest_watch.py:84-95`). Pixels in no zone are dropped;
    overlapping zones resolve to the smallest id (deterministic)."""
    keyed = pixels.withColumn(
        "__pid", F.monotonically_increasing_id()
    )
    pairs = point_in_polygon_join(
        keyed.select(F.col("__pid").alias("point_id"), F.col(x_col).alias("x"),
                     F.col(y_col).alias("y")),
        zones,
        bucket_size,
        poly_id=zone_id,
        wkt_col=wkt_col,
    )
    best = pairs.groupBy("point_id").agg(F.min("zone_id").alias(zone_id))
    return keyed.join(
        best, keyed["__pid"] == best["point_id"], "inner"
    ).drop("point_id", "__pid")
