"""Minimal ESRI shapefile (.shp + .dbf) reader/writer — no libraries.

The reference ingests its basin zones as a HydroSHEDS shapefile
(`/root/reference/data_pipelines/assets/basin/hydrobasins.py:23-35`,
read downstream with geopandas) and joins rasters against the
polygons. The shapefile format is a public fixed layout (ESRI
whitepaper, 1998): a 100-byte big/little-endian mixed header, then
length-prefixed records; polygons (shape type 5) are ring lists with
bbox/parts/points. Attributes ride in a dBASE III (.dbf) sidecar:
fixed-width fields described by 32-byte descriptors.

`read_shapefile` flattens both into the zones DataFrame shape the
spatial tier consumes — (attributes..., geometry WKT) — with rings
grouped into polygons by winding order (shapefile convention: outer
rings clockwise = negative signed area, holes counter-clockwise,
holes attach to the preceding outer ring). The WKT feeds
`operators/spatial.point_in_polygon_join` directly.

Driver-side per file, like every ingestion kernel here: a directory
of shapefiles fans out one task per file via `operators/taskmap.py`.
The writers exist for hermetic round-trip tests and small exports;
they emit the same profile the readers parse.
"""

from __future__ import annotations

import os
import struct

from pyspark.sql import DataFrame, SparkSession


def _signed_area(ring: list[tuple[float, float]]) -> float:
    s = 0.0
    for (x1, y1), (x2, y2) in zip(ring, ring[1:]):
        s += x1 * y2 - x2 * y1
    return s / 2.0


def read_shp_minimal(path: str) -> list[list[list[tuple[float, float]]]]:
    """Parse polygon records from a .shp file → one entry per record,
    each a list of rings (point lists, closed). Shape types other than
    polygon (5) and null (0) raise; null shapes yield empty lists."""
    with open(path, "rb") as f:
        data = f.read()
    code, = struct.unpack(">i", data[0:4])
    if code != 9994:
        raise ValueError(f"not a shapefile (magic {code})")
    file_len = struct.unpack(">i", data[24:28])[0] * 2
    if len(data) < file_len:
        raise ValueError(
            f".shp truncated: header declares {file_len} bytes, "
            f"file has {len(data)}"
        )
    shape_type, = struct.unpack("<i", data[32:36])
    if shape_type not in (0, 5):
        raise NotImplementedError(
            f"shape type {shape_type}: only polygons decode natively "
            "(use geopandas for points/lines/Z variants)"
        )
    out: list[list[list[tuple[float, float]]]] = []
    pos = 100
    while pos < file_len:
        _rec_no, content_len = struct.unpack(">ii", data[pos : pos + 8])
        body = data[pos + 8 : pos + 8 + content_len * 2]
        pos += 8 + content_len * 2
        rtype, = struct.unpack("<i", body[0:4])
        if rtype == 0:  # null shape
            out.append([])
            continue
        if rtype != 5:
            raise NotImplementedError(f"record shape type {rtype}")
        num_parts, num_points = struct.unpack("<ii", body[36:44])
        parts = list(
            struct.unpack(f"<{num_parts}i", body[44 : 44 + 4 * num_parts])
        )
        pts_off = 44 + 4 * num_parts
        flat = struct.unpack(
            f"<{num_points * 2}d", body[pts_off : pts_off + 16 * num_points]
        )
        points = list(zip(flat[0::2], flat[1::2]))
        bounds = parts + [num_points]
        out.append(
            [points[bounds[i] : bounds[i + 1]] for i in range(num_parts)]
        )
    return out


def read_dbf_minimal(path: str) -> tuple[list[tuple[str, str]], list[list]]:
    """Parse a dBASE III (.dbf) attribute table → (fields, rows) where
    fields is [(name, type)] with type C (text), N/F (numeric), or L
    (logical). Deleted rows ('*' flag) are skipped."""
    with open(path, "rb") as f:
        data = f.read()
    n_records, = struct.unpack("<i", data[4:8])
    header_len, record_len = struct.unpack("<hh", data[8:12])
    # A short slice below would otherwise yield empty-string "rows" —
    # silent garbage. A truncated table must fail loudly instead.
    need = header_len + n_records * record_len
    if len(data) < need:
        raise ValueError(
            f".dbf truncated: header declares {n_records} x "
            f"{record_len}-byte records ({need} bytes), file has "
            f"{len(data)}"
        )
    fields: list[tuple[str, str, int]] = []
    pos = 32
    while data[pos] != 0x0D:
        name = data[pos : pos + 11].split(b"\0")[0].decode("ascii")
        ftype = chr(data[pos + 11])
        flen = data[pos + 16]
        if ftype not in "CNFL":
            raise NotImplementedError(
                f"dBASE field type {ftype!r}: use the geopandas path"
            )
        fields.append((name, ftype, flen))
        pos += 32
    rows: list[list] = []
    for r in range(n_records):
        rec = data[header_len + r * record_len :][:record_len]
        if rec[0:1] == b"*":  # deleted
            continue
        row, off = [], 1
        for _name, ftype, flen in fields:
            raw = rec[off : off + flen].decode("ascii", "replace").strip()
            off += flen
            if ftype == "C":
                row.append(raw)
            elif ftype in "NF":
                row.append(float(raw) if raw else None)
            else:  # L
                row.append(raw in ("Y", "y", "T", "t"))
        rows.append(row)
    return [(n, t) for n, t, _l in fields], rows


def _ring_wkt(ring: list[tuple[float, float]]) -> str:
    return "(" + ", ".join(f"{x:.6f} {y:.6f}" for x, y in ring) + ")"


def rings_to_wkt(rings: list[list[tuple[float, float]]]) -> str | None:
    """Rings → WKT, grouped by shapefile winding convention: clockwise
    (negative signed area) opens a polygon, counter-clockwise rings are
    holes of the preceding outer. One polygon → POLYGON, several →
    MULTIPOLYGON; no rings → None."""
    polys: list[list[list[tuple[float, float]]]] = []
    for ring in rings:
        if _signed_area(ring) <= 0 or not polys:  # outer (or orphan hole)
            polys.append([ring])
        else:
            polys[-1].append(ring)
    if not polys:
        return None
    bodies = [
        "(" + ", ".join(_ring_wkt(r) for r in rings_) + ")"
        for rings_ in polys
    ]
    if len(bodies) == 1:
        return "POLYGON " + bodies[0]
    return "MULTIPOLYGON (" + ", ".join(bodies) + ")"


def read_shapefile(
    spark: SparkSession,
    base_path: str,
    geometry_col: str = "geometry",
    bbox: tuple[float, float, float, float] | None = None,
) -> DataFrame:
    """``base_path`` without extension → zones DataFrame: one row per
    shapefile record with its .dbf attributes (C → string, N/F →
    double, L → boolean) and the polygon as WKT — the shape
    `operators/spatial.point_in_polygon_join(zones=...)` consumes
    (reference: geopandas over the HydroSHEDS download,
    `hydrobasins.py:23-35`).

    ``bbox=(lon_min, lat_min, lon_max, lat_max)`` keeps only records
    whose geometry envelope intersects the box — the same restriction
    the reference applies via ``gpd.read_file(..., bbox=...)`` with
    the tile-list box from `functions.geo.tiles_bbox`
    (`hydrobasins.py:77-79`)."""
    shapes = read_shp_minimal(base_path + ".shp")
    fields, rows = read_dbf_minimal(base_path + ".dbf")
    if len(shapes) != len(rows):
        raise ValueError(
            f".shp has {len(shapes)} records but .dbf has {len(rows)}"
        )
    if bbox is not None:
        x0, y0, x1, y1 = bbox

        def intersects(rings) -> bool:
            pts = [p for ring in rings for p in ring]
            if not pts:
                return False
            xs = [p[0] for p in pts]
            ys = [p[1] for p in pts]
            return (
                min(xs) <= x1 and max(xs) >= x0
                and min(ys) <= y1 and max(ys) >= y0
            )

        keep = [intersects(rings) for rings in shapes]
        shapes = [s for s, k in zip(shapes, keep) if k]
        rows = [r for r, k in zip(rows, keep) if k]
    spark_types = {"C": "string", "N": "double", "F": "double", "L": "boolean"}
    schema = ", ".join(
        f"{name} {spark_types[t]}" for name, t in fields
    ) + f", {geometry_col} string"
    data = [
        (*row, rings_to_wkt(rings)) for row, rings in zip(rows, shapes)
    ]
    return spark.createDataFrame(data, schema)


def write_shp(path: str, records: list[list[list[tuple[float, float]]]]):
    """Write polygon records as a .shp (shape type 5). Rings are
    written exactly as given — callers follow the winding convention
    (outer clockwise)."""
    body = b""
    for i, rings in enumerate(records):
        points = [p for ring in rings for p in ring]
        parts, acc = [], 0
        for ring in rings:
            parts.append(acc)
            acc += len(ring)
        xs = [p[0] for p in points] or [0.0]
        ys = [p[1] for p in points] or [0.0]
        content = struct.pack("<i", 5)
        content += struct.pack("<4d", min(xs), min(ys), max(xs), max(ys))
        content += struct.pack("<ii", len(rings), len(points))
        content += struct.pack(f"<{len(parts)}i", *parts)
        for x, y in points:
            content += struct.pack("<2d", x, y)
        body += struct.pack(">ii", i + 1, len(content) // 2) + content

    all_pts = [p for rec in records for ring in rec for p in ring] or [(0, 0)]
    xs = [p[0] for p in all_pts]
    ys = [p[1] for p in all_pts]
    header = struct.pack(">i", 9994) + b"\0" * 20
    header += struct.pack(">i", (100 + len(body)) // 2)
    header += struct.pack("<ii", 1000, 5)
    header += struct.pack("<4d", min(xs), min(ys), max(xs), max(ys))
    header += struct.pack("<4d", 0, 0, 0, 0)
    with open(path, "wb") as f:
        f.write(header + body)


def write_dbf(
    path: str,
    fields: list[tuple[str, str, int, int]],
    rows: list[list],
):
    """Write a dBASE III table. ``fields``: (name, type C/N/L, length,
    decimals)."""
    header_len = 32 + 32 * len(fields) + 1
    record_len = 1 + sum(f[2] for f in fields)
    head = bytes([0x03, 99, 1, 1])
    head += struct.pack("<i", len(rows))
    head += struct.pack("<hh", header_len, record_len)
    head += b"\0" * 20
    for name, ftype, flen, dec in fields:
        head += name.encode("ascii").ljust(11, b"\0")
        head += ftype.encode("ascii")
        head += b"\0" * 4
        head += bytes([flen, dec])
        head += b"\0" * 14
    head += b"\x0d"
    body = b""
    for row in rows:
        body += b" "
        for (name, ftype, flen, dec), val in zip(fields, row):
            if ftype == "C":
                body += str(val).encode("ascii")[:flen].ljust(flen, b" ")
            elif ftype == "N":
                txt = "" if val is None else f"{val:.{dec}f}" if dec else str(int(val))
                body += txt.encode("ascii")[:flen].rjust(flen, b" ")
            elif ftype == "L":
                body += b"T" if val else b"F"
            else:
                raise ValueError(f"unsupported field type {ftype!r}")
    with open(path, "wb") as f:
        f.write(head + body + b"\x1a")


# The ESRI WKT every global hydrography/basins product ships for
# geographic WGS84 — the CRS this module's consumers assume.
WGS84_ESRI_WKT = (
    'GEOGCS["GCS_WGS_1984",DATUM["D_WGS_1984",'
    'SPHEROID["WGS_1984",6378137.0,298.257223563]],'
    'PRIMEM["Greenwich",0.0],UNIT["Degree",0.0174532925199433]]'
)


def read_prj(path: str) -> str | None:
    """The .prj sidecar's CRS WKT (carried verbatim — this engine does
    no reprojection; consumers assert the CRS they expect). ``path``
    may be the .shp or the .prj itself; None when no sidecar exists."""
    if path.lower().endswith(".shp"):
        path = path[:-4] + ".prj"
    if not os.path.exists(path):
        return None
    with open(path, encoding="ascii", errors="replace") as f:
        return f.read().strip() or None


def write_prj(path: str, wkt: str = WGS84_ESRI_WKT) -> None:
    """Write the .prj sidecar next to a .shp (or at the given .prj
    path)."""
    if path.lower().endswith(".shp"):
        path = path[:-4] + ".prj"
    with open(path, "w", encoding="ascii") as f:
        f.write(wkt)
