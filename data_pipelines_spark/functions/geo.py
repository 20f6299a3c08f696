"""Geospatial scalar math as native column expressions.

Reference implements these with numpy over dask arrays
(`assets/deforestation/global_forest_watch.py:113-140`); all of it maps
to built-in `pyspark.sql.functions` trigonometry — JVM-side, codegen'd.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

EARTH_RADIUS_KM = 6371.0


def haversine_km(
    lat1: Column, lon1: Column, lat2: Column, lon2: Column
) -> Column:
    """Great-circle distance in km (reference F10,
    `global_forest_watch.py:113-126`)."""
    dlat = F.radians(lat2 - lat1)
    dlon = F.radians(lon2 - lon1)
    a = (
        F.sin(dlat / 2) ** 2
        + F.cos(F.radians(lat1)) * F.cos(F.radians(lat2)) * F.sin(dlon / 2) ** 2
    )
    return 2 * EARTH_RADIUS_KM * F.atan2(F.sqrt(a), F.sqrt(1 - a))


def pixel_area_km2(lat: Column, lon: Column, pixel_size_deg: float) -> Column:
    """Approximate ground area of a pixel: haversine height x width at the
    pixel location (reference F11, `global_forest_watch.py:129-140`)."""
    half = pixel_size_deg / 2.0
    height = haversine_km(lat - half, lon, lat + half, lon)
    width = haversine_km(lat, lon - half, lat, lon + half)
    return height * width


def parse_tile_name(tile: Column | str) -> tuple[Column, Column]:
    """(lat_origin, lon_origin) in degrees from a GFC-style tile name like
    ``10N_020W`` (reference F12, `global_forest_watch.py:98-110`).

    Returns the top-left corner: N/S sign applied to the latitude
    number, E/W sign to the longitude number.
    """
    t = F.col(tile) if isinstance(tile, str) else tile
    lat_num = F.substring(t, 1, 2).cast("double")
    lat_hem = F.substring(t, 3, 1)
    lon_num = F.substring(t, 5, 3).cast("double")
    lon_hem = F.substring(t, 8, 1)
    lat = F.when(lat_hem == "S", -lat_num).otherwise(lat_num)
    lon = F.when(lon_hem == "W", -lon_num).otherwise(lon_num)
    return lat, lon


def tiles_bbox(tiles: list[str]) -> tuple[float, float, float, float]:
    """Union bounding box (lon_min, lat_min, lon_max, lat_max) of a
    GFC tile-name list — the reference's `parse_coordinates`
    (`assets/basin/hydrobasins.py:37-69`), reproduced faithfully
    INCLUDING its hemisphere-mirrored extents (a western tile's
    "max" longitude is origin - 10, a southern tile's "min" latitude
    origin + 10; the running min/max absorbs the inversion). Plain
    driver-side partition bookkeeping, like the reference's."""
    lon_min = lat_min = float("inf")
    lon_max = lat_max = float("-inf")
    for tile in tiles:
        lat_str, lon_str = tile.split("_")
        lon_num, lon_dir = int(lon_str[:-1]), lon_str[-1]
        lat_num, lat_dir = int(lat_str[:-1]), lat_str[-1]
        lon = lon_num if lon_dir == "E" else -lon_num
        lat = lat_num if lat_dir == "N" else -lat_num
        lon_min = min(lon_min, lon)
        lon_max = max(lon_max, lon + 10 if lon_dir == "E" else lon - 10)
        lat_min = min(lat_min, lat - 10 if lat_dir == "N" else lat + 10)
        lat_max = max(lat_max, lat)
    return lon_min, lat_min, lon_max, lat_max
