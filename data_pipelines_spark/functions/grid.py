"""Grid-key canonicalization and cell geometry.

Float lat/lon values are only usable as equi-join keys after rounding to
a fixed precision — the reference proves an unrounded float join returns
0 rows (`data_pipelines_tests/flood/test_transforms.py:73-121`) and
rounds to 3 decimals everywhere (`utils/flood/config.py:11-12`,
`assets/flood/discharge.py:265-270`). This module is the engine-wide
policy for that: every grid table passes through :func:`round_grid_keys`
at its schema boundary before any join.

At 100 TB scale these keys are also the partitioning keys for every
flood-side shuffle, so canonicalizing once at ingestion (instead of
per-join) lets repeated joins/aggregations reuse the same hash
partitioning.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Reference conventions: utils/flood/config.py:11-12.
GRID_RESOLUTION = 0.05
GRID_PRECISION = 3


def round_grid_keys(
    df: DataFrame,
    cols: tuple[str, ...] = ("latitude", "longitude"),
    precision: int = GRID_PRECISION,
) -> DataFrame:
    """Canonicalize float grid-key columns by rounding (reference F1)."""
    for c in cols:
        df = df.withColumn(c, F.round(F.col(c), precision))
    return df


def snap_to_grid(col: Column | str, resolution: float = GRID_RESOLUTION) -> Column:
    """Snap a coordinate to the nearest grid-cell center.

    Used for nearest-neighbor grid alignment between two regular grids of
    the same resolution (reference J6 / P8,
    `utils/flood/filter_by_upstream.py:63-67` does
    ``reindex(method="nearest")``; for co-resolved 0.05° grids snapping
    both sides to the cell center makes the join an exact equi-join).
    Cell centers sit at resolution/2 offsets, e.g. -0.025, 0.025, 0.075.
    """
    c = F.col(col) if isinstance(col, str) else col
    half = resolution / 2.0
    return F.round(F.floor(c / resolution) * resolution + half, GRID_PRECISION)


def restrict_area(
    df: DataFrame,
    lat_min: float,
    lat_max: float,
    lon_min: float,
    lon_max: float,
    buffer: float = 0.0,
    lat_col: str = "latitude",
    lon_col: str = "longitude",
) -> DataFrame:
    """Restrict rows to a lat/lon bounding box ± buffer (reference P1,
    `utils/flood/utils.py:4-29`).

    A pure predicate: Catalyst pushes it into the parquet scan (row-group
    min/max pruning), which replaces the reference's hand-placed
    "slice immediately after load" optimization.
    """
    return df.where(
        (F.col(lat_col) >= lat_min - buffer)
        & (F.col(lat_col) <= lat_max + buffer)
        & (F.col(lon_col) >= lon_min - buffer)
        & (F.col(lon_col) <= lon_max + buffer)
    )


def _fixed(col: Column, precision: int) -> Column:
    """Render a rounded coordinate with a fixed decimal count.

    The reference stringifies python floats (`transforms.py:287-309`);
    we use fixed-precision decimal rendering, which is deterministic
    across engines and locales.
    """
    return F.round(col, precision).cast(f"decimal(12,{precision})").cast("string")


def cell_wkt(
    lat: Column | str,
    lon: Column | str,
    half_grid_size: float = GRID_RESOLUTION / 2.0,
    precision: int = GRID_PRECISION,
) -> Column:
    """WKT POLYGON string for the grid cell centered at (lat, lon).

    Native-expression re-expression of the reference's pandas
    ``add_geometry`` (`utils/flood/transforms.py:268-315`): four rounded
    corners concatenated into ``POLYGON ((...))``, closing on the first
    corner. No UDF — stays inside whole-stage codegen.
    """
    lat = F.col(lat) if isinstance(lat, str) else lat
    lon = F.col(lon) if isinstance(lon, str) else lon
    min_lat = _fixed(lat - half_grid_size, precision)
    max_lat = _fixed(lat + half_grid_size, precision)
    min_lon = _fixed(lon - half_grid_size, precision)
    max_lon = _fixed(lon + half_grid_size, precision)
    sp = F.lit(" ")
    comma = F.lit(",")
    return F.concat(
        F.lit("POLYGON (("),
        min_lon, sp, min_lat, comma,
        min_lon, sp, max_lat, comma,
        max_lon, sp, max_lat, comma,
        max_lon, sp, min_lat, comma,
        min_lon, sp, min_lat,
        F.lit("))"),
    )


def zorder_key(
    lat: Column | str,
    lon: Column | str,
    bits: int = 16,
) -> Column:
    """Morton (Z-order) key interleaving the quantized latitude and
    longitude — the space-filling-curve sort key that makes 2-D
    locality survive a 1-D file layout.

    Sorting (or range-partitioning) a write by this key clusters
    spatially adjacent cells into the same parquet files/row groups, so
    a bbox predicate (`restrict_area`, S10) skips most of the dataset
    via min/max statistics instead of scanning it — the write-side
    complement to the read-side pushdown. 16 bits per axis ≈ 0.003°
    cells, finer than the 0.05° grid.

    Pure native bit arithmetic (quantize → interleave via
    shiftright/AND/shiftleft/OR), no UDF; monotone per axis at any
    ``bits``. Out-of-range coordinates clamp to the curve's edge;
    NULL/NaN coordinates yield a NULL key (unguarded, ``greatest(0,
    NULL)`` would silently quantize nodata rows to the south-pole
    corner and group them with real (-90,-180) cells).
    """
    lat = F.col(lat) if isinstance(lat, str) else lat
    lon = F.col(lon) if isinstance(lon, str) else lon
    x, y, bad = _quantize_cell(lat, lon, bits)
    z = F.lit(0).cast("long")
    for i in range(bits):
        xbit = F.shiftleft(
            F.shiftright(x, i).bitwiseAND(F.lit(1).cast("long")), 2 * i
        )
        ybit = F.shiftleft(
            F.shiftright(y, i).bitwiseAND(F.lit(1).cast("long")), 2 * i + 1
        )
        z = z.bitwiseOR(xbit).bitwiseOR(ybit)
    return F.when(~bad, z)


def _quantize_cell(lat: Column, lon: Column, bits: int):
    """Shared curve-key quantization contract: (x, y) cell indices
    clamped to the curve edge plus the NULL/NaN predicate (nodata must
    yield a NULL key, never the south-pole corner). Both
    :func:`zorder_key` and :func:`hilbert_key` key cells through this
    one definition."""
    n = 1 << bits
    scale = n - 1
    y = F.least(
        F.lit(scale).cast("long"),
        F.greatest(
            F.lit(0).cast("long"),
            F.floor((lat + F.lit(90.0)) / F.lit(180.0) * F.lit(n)).cast(
                "long"
            ),
        ),
    )
    x = F.least(
        F.lit(scale).cast("long"),
        F.greatest(
            F.lit(0).cast("long"),
            F.floor((lon + F.lit(180.0)) / F.lit(360.0) * F.lit(n)).cast(
                "long"
            ),
        ),
    )
    bad = lat.isNull() | lon.isNull() | F.isnan(lat) | F.isnan(lon)
    return x, y, bad


def hilbert_key(
    lat: Column | str,
    lon: Column | str,
    bits: int = 16,
) -> Column:
    """Hilbert-curve key of the quantized (lat, lon) cell — the
    space-filling curve with strictly better locality than Z-order:
    consecutive keys are ALWAYS grid neighbors (Manhattan distance 1,
    asserted exhaustively in tests), where the Morton curve jumps
    across quadrant seams. At 100 TB that means range-partitioned
    files cover tighter bboxes, so bbox predicates skip more row
    groups on min/max statistics.

    Same quantization/NULL contract as :func:`zorder_key` (clamp to
    the curve edge, NULL/NaN → NULL key). The classic per-bit
    rotate-and-reflect recurrence runs inside one ``F.aggregate`` over
    the bit-plane array with a bounded (x, y, d) struct accumulator —
    a naive per-bit `when` unrolling would nest the x/y expressions
    exponentially (each level references the previous twice); the
    fold keeps the lambda body constant-size and the state three
    longs. No UDF.
    """
    lat = F.col(lat) if isinstance(lat, str) else lat
    lon = F.col(lon) if isinstance(lon, str) else lon
    n = 1 << bits
    x, y, bad = _quantize_cell(lat, lon, bits)

    one = F.lit(1).cast("long")
    zero = F.lit(0).cast("long")

    def step(acc: Column, s: Column) -> Column:
        rx = F.when(acc["x"].bitwiseAND(s) > 0, one).otherwise(zero)
        ry = F.when(acc["y"].bitwiseAND(s) > 0, one).otherwise(zero)
        # MSB-first: each quadrant index is the next base-4 digit
        d = acc["d"] * F.lit(4).cast("long") + (
            (F.lit(3).cast("long") * rx).bitwiseXOR(ry)
        )
        flip = (ry == zero) & (rx == one)
        x1 = F.when(flip, F.lit(n - 1).cast("long") - acc["x"]).otherwise(
            acc["x"]
        )
        y1 = F.when(flip, F.lit(n - 1).cast("long") - acc["y"]).otherwise(
            acc["y"]
        )
        return F.struct(
            F.when(ry == zero, y1).otherwise(x1).alias("x"),
            F.when(ry == zero, x1).otherwise(y1).alias("y"),
            d.alias("d"),
        )

    planes = F.array(
        *[F.lit(1 << i).cast("long") for i in range(bits - 1, -1, -1)]
    )
    init = F.struct(x.alias("x"), y.alias("y"), zero.alias("d"))
    key = F.aggregate(planes, init, step)["d"]
    return F.when(~bad, key)


def spatial_cluster(
    df,
    lat_col: str = "latitude",
    lon_col: str = "longitude",
    partitions: int | None = None,
    bits: int = 16,
    curve: str = "zorder",
):
    """Re-arrange a frame along a space-filling curve before writing:
    range-partition on :func:`zorder_key` (``curve="zorder"``) or
    :func:`hilbert_key` (``curve="hilbert"`` — tighter per-file
    bboxes, see there) then sort within partitions,
    so each output file covers a compact spatial neighborhood (tested:
    per-partition bbox area shrinks by orders of magnitude vs the
    arrival order). One range shuffle — the standard cost of a
    clustered write."""
    if curve == "zorder":
        key = zorder_key(lat_col, lon_col, bits)
    elif curve == "hilbert":
        key = hilbert_key(lat_col, lon_col, bits)
    else:
        raise ValueError(f"unknown curve {curve!r} (zorder or hilbert)")
    tagged = df.withColumn("__z", key)
    parted = (
        tagged.repartitionByRange(partitions, "__z")
        if partitions
        else tagged.repartitionByRange("__z")
    )
    return parted.sortWithinPartitions("__z").drop("__z")
