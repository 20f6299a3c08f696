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

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


_RING_RE = None  # compiled lazily so import stays cheap


def wkt_rings_expr(wkt: Column) -> Column:
    """Native-expression twin of :func:`parse_wkt_rings`:
    ``array<array<struct<x:double,y:double>>>`` — one inner array per
    parenthesized ring of a POLYGON/MULTIPOLYGON WKT. Both engines
    parse coordinate text with correctly-rounded decimal→binary
    conversion, so the doubles are bit-identical to the Python path's.
    Assumes well-formed polygon WKT (the Python parser raises on
    non-polygons; this expression is for callers that construct or
    pre-validate their geometry)."""

    def parse_pt(pt: Column) -> Column:
        xy = F.split(F.trim(pt), r"\s+")
        return F.struct(
            xy[0].cast("double").alias("x"), xy[1].cast("double").alias("y")
        )

    bodies = F.regexp_extract_all(wkt, F.lit(r"\(([^()]+)\)"), 1)
    return F.transform(
        bodies, lambda b: F.transform(F.split(b, ","), parse_pt)
    )


def points_in_rings_expr(rings: Column, px: Column, py: Column) -> Column:
    """Native-expression twin of :func:`points_in_rings`: even-odd
    ray-cast containment of (px, py) in the parsed ring array, as a
    boolean Column. The edge arithmetic — ``px < x1 + (py - y1) *
    (x2 - x1) / (y2 - y1)`` with horizontal edges skipped — is the
    identical IEEE sequence the numpy kernel runs, so the verdicts
    match bit-for-bit; the division is evaluated lazily (CASE WHEN)
    only on crossing edges.

    Cost model (caller contract): higher-order ``aggregate`` is
    CodegenFallback, so this runs INTERPRETED at O(edges) per candidate
    row — the right trade for few-vertex polygons (the suite's zones
    are 4-edge rectangles). For many-vertex geometry, keep the numpy
    ``points_in_rings`` path (the ``exact="python"`` default of
    ``point_in_polygon_join``), which vectorizes hundreds of edges over
    whole Arrow batches."""

    def ring_parity(ring: Column) -> Column:
        def step(acc: Column, i: Column) -> Column:
            p1 = F.element_at(ring, i)
            p2 = F.element_at(ring, i + 1)
            x1, y1 = p1.getField("x"), p1.getField("y")
            x2, y2 = p2.getField("x"), p2.getField("y")
            crossed = (y1 > py) != (y2 > py)
            hit = F.when(
                crossed, px < x1 + (py - y1) * (x2 - x1) / (y2 - y1)
            ).otherwise(F.lit(False))
            return acc != hit  # boolean != is XOR

        n_edges = F.size(ring) - 1
        return F.when(
            n_edges >= 1,
            F.aggregate(
                F.sequence(F.lit(1), n_edges), F.lit(False), step
            ),
        ).otherwise(F.lit(False))

    return F.aggregate(
        rings, F.lit(False), lambda acc, ring: acc != ring_parity(ring)
    )


def parse_wkt_rings(wkt: str) -> list[np.ndarray]:
    """Every ring of a WKT POLYGON or MULTIPOLYGON as (N, 2) arrays.

    Handles exterior rings, interior rings (holes), and multipolygon
    parts uniformly: each innermost parenthesized coordinate list is
    one ring, and containment below is the even-odd XOR over ALL rings
    — the same rule GDAL's rasterizer applies to HydroBASINS geometry
    with lakes (reference `global_forest_watch.py:84-95`). A point
    inside a hole crosses both the exterior and the hole ring an odd
    number of times, XORing back to outside.
    """
    global _RING_RE
    if _RING_RE is None:
        import re

        _RING_RE = re.compile(r"\(([^()]+)\)")
    head = wkt.strip().upper()
    if not (head.startswith("POLYGON") or head.startswith("MULTIPOLYGON")):
        raise ValueError(f"not a polygon WKT: {wkt[:40]}")
    rings = []
    for body in _RING_RE.findall(wkt):
        pts = [p.strip().split() for p in body.split(",")]
        rings.append(np.array([[float(x), float(y)] for x, y in pts], dtype="float64"))
    if not rings:
        raise ValueError(f"no rings in WKT: {wkt[:40]}")
    return rings


def parse_wkt_polygon(wkt: str) -> np.ndarray:
    """First (exterior) ring only — kept for callers that need the
    engine's own rectangular cell WKT (`functions/grid.py:cell_wkt`,
    reference `transforms.py:287-309`)."""
    return parse_wkt_rings(wkt)[0]


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


def points_in_rings(
    px: np.ndarray, py: np.ndarray, rings: list[np.ndarray]
) -> np.ndarray:
    """Even-odd containment across all rings of a (multi)polygon:
    XOR of the per-ring crossing parities, so holes subtract and
    disjoint parts add."""
    inside = np.zeros(len(px), dtype=bool)
    for ring in rings:
        inside ^= points_in_ring(px, py, ring)
    return inside


def polygons_with_bbox(
    polygons: DataFrame, id_col: str = "id", wkt_col: str = "geometry"
) -> DataFrame:
    """Attach bbox columns (min_x, min_y, max_x, max_y) by parsing the
    WKT once per polygon (Arrow-batched)."""

    schema = f"{id_col} long, {wkt_col} string, min_x double, min_y double, max_x double, max_y double"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            all_pts = pdf[wkt_col].map(
                lambda w: np.concatenate(parse_wkt_rings(w), axis=0)
            )
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    wkt_col: pdf[wkt_col],
                    "min_x": all_pts.map(lambda r: r[:, 0].min()),
                    "min_y": all_pts.map(lambda r: r[:, 1].min()),
                    "max_x": all_pts.map(lambda r: r[:, 0].max()),
                    "max_y": all_pts.map(lambda r: r[:, 1].max()),
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
    broadcast: bool | None = None,
    max_broadcast_zones: int = 100_000,
    max_broadcast_bytes: int = 64 * 1024 * 1024,
    exact: str = "python",
) -> DataFrame:
    """(point_id, zone_id) pairs for points contained in polygons.

    ``broadcast`` controls the candidate join strategy: True forces a
    broadcast of the exploded polygon-bucket build side (right for
    dimension-sized zone tables), False forces a shuffle join on the
    bucket key (right when zones × buckets would blow the driver —
    e.g. a fine bucket grid over millions of basins), and None (the
    default) decides from Catalyst's plan statistics — metadata only,
    NO job runs at plan-construction time (an eager ``count()`` here
    would execute the whole upstream plan once per call for any
    computed polygon frame). Scan-backed frames get exact file sizes;
    derived frames get Catalyst's (over)estimate, which conservatively
    falls back to the shuffle join. Callers that know their zone table
    (as the suite does) pass ``broadcast`` explicitly.

    ``exact`` picks the exact-containment implementation:

    - ``"python"`` (default) — vectorized numpy ray casting over Arrow
      batches. Right when polygons are complex (hundreds+ of edges):
      the per-task ring cache parses each WKT once and numpy tests a
      whole batch of points per edge, amortizing the Python boundary.
    - ``"native"`` (r14, guide §4.1) — the rings are parsed ONCE per
      polygon with native expressions on the build side and the
      even-odd test runs as a JVM expression per candidate row: the
      two Python stages (bbox parse + exact test), their Arrow
      serialization, and the skew re-spread exchange all disappear
      from the plan. Right for simple geometry (the suite's
      rectangular zones: 4 edges), where the per-candidate HOF cost is
      trivial and the fixed Python-stage latency dominated. Verdicts
      are bit-identical to the numpy kernel (same IEEE edge
      arithmetic — pinned in tests/test_spatial_joins.py); requires
      well-formed polygon WKT.
    """
    if exact not in ("python", "native"):
        raise ValueError(f"exact must be 'python' or 'native', got {exact!r}")
    if broadcast is None:
        stats = polygons._jdf.queryExecution().optimizedPlan().stats()
        row_count = stats.rowCount()
        if row_count.isDefined():
            broadcast = int(str(row_count.get())) <= max_broadcast_zones
        else:
            broadcast = int(str(stats.sizeInBytes())) <= max_broadcast_bytes

    if exact == "native":
        from data_pipelines_spark.functions.text import let

        # Parse rings once per polygon and derive the bbox from them in
        # the same projection — no Python stage on the build side.
        def with_bbox(rings: Column) -> Column:
            def bbox(pts: Column) -> Column:
                xs = F.transform(pts, lambda p: p.getField("x"))
                ys = F.transform(pts, lambda p: p.getField("y"))
                return F.struct(
                    F.array_min(xs).alias("min_x"),
                    F.array_min(ys).alias("min_y"),
                    F.array_max(xs).alias("max_x"),
                    F.array_max(ys).alias("max_y"),
                )

            return F.struct(
                rings.alias("rings"), let(F.flatten(rings), bbox).alias("bb")
            )

        polys = polygons.select(
            F.col(poly_id),
            let(wkt_rings_expr(F.col(wkt_col)), with_bbox).alias("__g"),
        ).select(
            poly_id,
            F.col("__g.rings").alias("__rings"),
            F.col("__g.bb.min_x").alias("min_x"),
            F.col("__g.bb.min_y").alias("min_y"),
            F.col("__g.bb.max_x").alias("max_x"),
            F.col("__g.bb.max_y").alias("max_y"),
        )
        geom_col = "__rings"
    else:
        polys = polygons_with_bbox(polygons, poly_id, wkt_col)
        geom_col = wkt_col

    # Explode each polygon onto every bucket its bbox covers.
    poly_buckets = polys.select(
        F.col(poly_id).alias("__zone_id"),
        geom_col,
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
    if exact == "native" and broadcast:
        from data_pipelines_spark.plans.parallelism import spread

        # The ray-cast lambda below is evaluated OUTSIDE whole-stage
        # codegen (higher-order functions interpret), so a narrow input
        # would serialize the per-candidate work onto one core. Widen
        # the POINT side before the broadcast join — the exchange then
        # carries narrow point rows, not candidates with ring arrays —
        # and join + exact filter run in that same widened stage.
        # spread() is a no-op at real scale (input already wide).
        pts = spread(pts)

    build = F.broadcast(poly_buckets) if broadcast else poly_buckets
    cand = pts.join(build, ["bx", "by"]).where(
        (F.col("__px") >= F.col("min_x"))
        & (F.col("__px") <= F.col("max_x"))
        & (F.col("__py") >= F.col("min_y"))
        & (F.col("__py") <= F.col("max_y"))
    )
    # Keep ONLY the columns the exact test reads (guide §4.1): the
    # bucket ids and bbox columns are spent on the prefilter above, and
    # leaving them in would both widen the skew-repartition shuffle
    # below and serialize them into every Arrow batch crossing the
    # Python boundary.
    cand = cand.select(point_id, "__zone_id", geom_col, "__px", "__py")

    if exact == "native":
        # Pure-JVM exact test: one filter expression per candidate row —
        # no Python stage, no Arrow batches (point-side spread above
        # keeps the interpreted lambda parallel on narrow local
        # fixtures; the shuffle path is already wide after its join).
        return cand.where(
            points_in_rings_expr(
                F.col("__rings"), F.col("__px"), F.col("__py")
            )
        ).select(
            point_id,
            # the python path's output schema declares zone_id long —
            # mirror it so both impls are drop-in interchangeable
            F.col("__zone_id").cast("long").alias("zone_id"),
        )

    from data_pipelines_spark.plans.parallelism import spread

    if broadcast:
        # Broadcast path: candidates keep the points scan's partitioning
        # (balanced by construction); spread only widens a single-file
        # input so the Python exact test isn't serialized on one core.
        cand = spread(cand)
    else:
        # Shuffle path: the join leaves candidates hash-partitioned by
        # (bx, by), and clustered points (a city bucket) or a
        # continent-sized polygon over them concentrate the Python-side
        # exact test into few tasks (measured: 100% of candidates in
        # ONE partition on a clustered fixture). Re-spread by
        # (zone, content-salt): the salt is derived from the point
        # coordinates — deterministic under task retry, the
        # plans/skew.py discipline — so any one zone's candidate set
        # splits ~salt_w ways while zone locality keeps the per-task
        # ring-parse cache effective. Explicit numPartitions keeps AQE
        # from re-coalescing the balance away.
        sc = points.sparkSession.sparkContext
        salt_w = max(16, sc.defaultParallelism)
        cand = cand.repartition(
            salt_w,
            F.col("__zone_id"),
            F.pmod(F.xxhash64(F.col("__px"), F.col("__py")), F.lit(salt_w)),
        )

    # Carry the caller's point-id type through the exact test unchanged
    # (rasterize_zones passes a struct<x,y> content key, not a long).
    pid_type = points.schema[point_id].dataType.simpleString()
    out_schema = f"{point_id} {pid_type}, zone_id long"

    def exact(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ring_cache: dict[str, list[np.ndarray]] = {}
        for pdf in batches:
            if pdf.empty:
                continue
            keep_ids, keep_zones = [], []
            for wkt, grp in pdf.groupby(wkt_col, sort=False):
                rings = ring_cache.get(wkt)
                if rings is None:
                    rings = ring_cache[wkt] = parse_wkt_rings(wkt)
                mask = points_in_rings(
                    grp["__px"].to_numpy(), grp["__py"].to_numpy(), rings
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
    overlapping zones resolve to the smallest id (deterministic).

    The point key for the join-back is the pixel's own (x, y) pair —
    content-derived, so it is identical under task retry and however
    many times the lineage is re-evaluated. (A synthetic
    ``monotonically_increasing_id`` here would be the retry-unstable
    shuffle-key hazard `plans/skew.py` documents: the pixel frame is
    evaluated on both sides of the join-back, and a recomputed task
    could hand the same pixel two different ids.) Duplicate (x, y)
    rows — e.g. a per-(pixel, year) long form — are deduplicated before
    the spatial test and each receives the same zone, which is also
    less exact-containment work than testing every duplicate."""
    pts = pixels.select(
        F.col(x_col).alias("x"), F.col(y_col).alias("y")
    ).distinct()
    pairs = point_in_polygon_join(
        pts.select(F.struct("x", "y").alias("point_id"), "x", "y"),
        zones,
        bucket_size,
        poly_id=zone_id,
        wkt_col=wkt_col,
    )
    best = pairs.groupBy("point_id").agg(F.min("zone_id").alias(zone_id))
    return pixels.join(
        best,
        (pixels[x_col] == best["point_id.x"]) & (pixels[y_col] == best["point_id.y"]),
        "inner",
    ).drop("point_id")
