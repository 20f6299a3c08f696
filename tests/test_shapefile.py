"""Shapefile (.shp/.dbf) round-trips and the basin-zones ingestion
shape: write → read → WKT → point-in-polygon join (the reference's
hydrobasins path, `assets/basin/hydrobasins.py:23-35`, minus
geopandas)."""

from __future__ import annotations

import pytest

from data_pipelines_spark.sources.shapefile import (
    read_dbf_minimal,
    read_shapefile,
    read_shp_minimal,
    rings_to_wkt,
    write_dbf,
    write_shp,
)

# Outer rings CLOCKWISE (negative signed area with y-up), holes CCW —
# the shapefile winding convention.
SQUARE_CW = [(0.0, 0.0), (0.0, 4.0), (4.0, 4.0), (4.0, 0.0), (0.0, 0.0)]
HOLE_CCW = [(1.0, 1.0), (3.0, 1.0), (3.0, 3.0), (1.0, 3.0), (1.0, 1.0)]
FAR_CW = [(10.0, 0.0), (10.0, 2.0), (12.0, 2.0), (12.0, 0.0), (10.0, 0.0)]


def test_shp_roundtrip_multiring(tmp_path):
    path = str(tmp_path / "zones.shp")
    records = [[SQUARE_CW, HOLE_CCW], [FAR_CW]]
    write_shp(path, records)
    got = read_shp_minimal(path)
    assert got == records


def test_dbf_roundtrip_types(tmp_path):
    path = str(tmp_path / "zones.dbf")
    fields = [("HYBAS_ID", "N", 10, 0), ("NAME", "C", 8, 0),
              ("AREA", "N", 12, 3), ("COASTAL", "L", 1, 0)]
    rows = [[7001, "congo", 1234.5, True], [7002, "nile", 99.25, False]]
    write_dbf(path, fields, rows)
    names_types, got = read_dbf_minimal(path)
    assert names_types == [("HYBAS_ID", "N"), ("NAME", "C"),
                          ("AREA", "N"), ("COASTAL", "L")]
    assert got == [[7001.0, "congo", 1234.5, True],
                   [7002.0, "nile", 99.25, False]]


def test_rings_to_wkt_grouping():
    wkt = rings_to_wkt([SQUARE_CW, HOLE_CCW])
    assert wkt.startswith("POLYGON ((0.000000 0.000000")
    assert wkt.count("(") == 3  # body + outer + hole
    multi = rings_to_wkt([SQUARE_CW, HOLE_CCW, FAR_CW])
    assert multi.startswith("MULTIPOLYGON (")
    assert rings_to_wkt([]) is None


def test_read_shapefile_to_zones_and_join(spark, tmp_path):
    """End-to-end basin shape: shapefile pair on disk → zones frame →
    point-in-polygon join; the hole is genuinely excluded."""
    from pyspark.sql import functions as F

    from data_pipelines_spark.operators.spatial import point_in_polygon_join

    base = str(tmp_path / "basins")
    write_shp(base + ".shp", [[SQUARE_CW, HOLE_CCW], [FAR_CW]])
    write_dbf(
        base + ".dbf",
        [("HYBAS_ID", "N", 10, 0), ("NAME", "C", 8, 0)],
        [[7001, "congo"], [7002, "nile"]],
    )
    zones = read_shapefile(spark, base)
    assert zones.columns == ["HYBAS_ID", "NAME", "geometry"]
    z = {r.NAME: r.geometry for r in zones.collect()}
    assert z["congo"].startswith("POLYGON")

    pts = spark.createDataFrame(
        [(1, 0.5, 0.5),   # inside congo's outer ring
         (2, 2.0, 2.0),   # inside the HOLE -> no match
         (3, 11.0, 1.0),  # inside nile
         (4, 7.0, 7.0)],  # nowhere
        "point_id long, x double, y double",
    )
    joined = point_in_polygon_join(
        pts,
        zones.select(
            F.col("HYBAS_ID").cast("long").alias("id"), "geometry"
        ),
        bucket_size=5.0,
        broadcast=True,
    )
    got = {(r.point_id, r.zone_id) for r in joined.collect()}
    assert got == {(1, 7001), (3, 7002)}


def test_shp_rejects_non_polygon(tmp_path):
    import struct

    path = str(tmp_path / "pts.shp")
    header = struct.pack(">i", 9994) + b"\0" * 20 + struct.pack(">i", 50)
    header += struct.pack("<ii", 1000, 1)  # shape type 1 = point
    header += struct.pack("<8d", 0, 0, 0, 0, 0, 0, 0, 0)
    with open(path, "wb") as f:
        f.write(header)
    with pytest.raises(NotImplementedError, match="shape type 1"):
        read_shp_minimal(path)


def test_record_count_mismatch_raises(spark, tmp_path):
    base = str(tmp_path / "bad")
    write_shp(base + ".shp", [[SQUARE_CW]])
    write_dbf(base + ".dbf", [("A", "N", 4, 0)], [[1], [2]])
    with pytest.raises(ValueError, match="records"):
        read_shapefile(spark, base)


def test_tiles_bbox_matches_reference_semantics():
    """The reference's own partition list must produce its bbox,
    hemisphere-mirrored extents included (differentially checked
    against the reference algorithm on 200 random lists during
    development; the canonical case is pinned here)."""
    from data_pipelines_spark.functions.geo import tiles_bbox

    tiles = ["10N_020W", "10N_010W", "10N_000E", "10N_010E", "10N_020E",
             "10N_030E", "10N_040E", "00N_000E", "00N_010E", "00N_020E",
             "00N_030E", "00N_040E"]
    assert tiles_bbox(tiles) == (-20, -10, 50, 10)
    # southern/western mirroring: a single 10S_020W tile
    assert tiles_bbox(["10S_020W"]) == (-20, 0, -30, -10)


def test_basins_asset_shape(spark, tmp_path):
    """The reference `basins` asset end-to-end: tile-list bbox →
    bbox-restricted shapefile read → renamed projection → parquet
    (`hydrobasins.py:72-95`). The out-of-bbox basin is dropped."""
    from pyspark.sql import functions as F

    from data_pipelines_spark.functions.geo import tiles_bbox

    inside = [(0.0, 0.0), (0.0, 4.0), (4.0, 4.0), (4.0, 0.0), (0.0, 0.0)]
    outside = [(200.0, 0.0), (200.0, 2.0), (202.0, 2.0), (202.0, 0.0),
               (200.0, 0.0)]
    base = str(tmp_path / "hybas")
    write_shp(base + ".shp", [[inside], [outside]])
    write_dbf(
        base + ".dbf",
        [("HYBAS_ID", "N", 10, 0), ("NEXT_DOWN", "N", 10, 0),
         ("SUB_AREA", "N", 12, 3), ("UP_AREA", "N", 12, 3)],
        [[7001, 7002, 10.5, 100.25], [8001, 0, 3.0, 3.0]],
    )
    bbox = tiles_bbox(["10N_020W", "10N_010E"])
    basins = (
        read_shapefile(spark, base, bbox=bbox)
        .select(
            F.col("HYBAS_ID").cast("long").alias("id"),
            F.col("NEXT_DOWN").cast("long").alias("downstream_id"),
            F.col("SUB_AREA").alias("basin_area"),
            F.col("UP_AREA").alias("upstream_area"),
            "geometry",
        )
    )
    out = str(tmp_path / "basins.parquet")
    basins.write.parquet(out)
    back = spark.read.parquet(out)
    rows = back.collect()
    assert len(rows) == 1
    assert rows[0].id == 7001 and rows[0].downstream_id == 7002
    assert rows[0].basin_area == 10.5
    assert rows[0].geometry.startswith("POLYGON")


def test_prj_sidecar_roundtrip(tmp_path):
    from data_pipelines_spark.sources.shapefile import (
        WGS84_ESRI_WKT,
        read_prj,
        write_prj,
    )

    shp = str(tmp_path / "zones.shp")
    assert read_prj(shp) is None  # no sidecar yet
    write_prj(shp)  # default WGS84
    assert read_prj(shp) == WGS84_ESRI_WKT
    assert read_prj(str(tmp_path / "zones.prj")) == WGS84_ESRI_WKT
    write_prj(str(tmp_path / "other.prj"), 'PROJCS["custom"]')
    assert read_prj(str(tmp_path / "other.prj")) == 'PROJCS["custom"]'
