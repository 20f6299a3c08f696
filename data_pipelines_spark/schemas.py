"""Central schema definitions for the engine's named datasets.

The reference manages schemas implicitly (inferred from GRIB/parquet,
hand-edited dask ``meta`` — SURVEY.md §1.3); this engine declares them
once, here. Grid-key columns are DOUBLE by convention but MUST pass
through ``functions.grid.round_grid_keys`` at the schema boundary
(FIXTURES.md: keys rounded to 3 decimals).
"""

from __future__ import annotations

from pyspark.sql.types import (
    DateType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)


def _f(name: str, dtype, nullable: bool = True) -> StructField:
    return StructField(name, dtype, nullable)


# F1 — long-form ensemble forecast fact (raster flattened to rows).
DISCHARGE = StructType(
    [
        _f("number", LongType()),
        _f("step", LongType()),
        _f("latitude", DoubleType()),
        _f("longitude", DoubleType()),
        _f("time", TimestampType()),
        _f("valid_time", TimestampType()),
        _f("dis24", DoubleType()),
    ]
)

# F2 — upstream drainage-area grid.
UPAREA = StructType(
    [
        _f("latitude", DoubleType()),
        _f("longitude", DoubleType()),
        _f("uparea", DoubleType()),
    ]
)

# F3 — combined return-period thresholds per cell.
THRESHOLDS = StructType(
    [
        _f("latitude", DoubleType()),
        _f("longitude", DoubleType()),
        _f("threshold_2y", DoubleType()),
        _f("threshold_5y", DoubleType()),
        _f("threshold_20y", DoubleType()),
    ]
)

# F4 — detailed forecast (the engine's A1 output + control column).
DETAILED_FORECAST = StructType(
    [
        _f("latitude", DoubleType()),
        _f("longitude", DoubleType()),
        _f("issued_on", DateType()),
        _f("valid_for", DateType()),
        _f("step", LongType()),
        _f("min_dis", DoubleType()),
        _f("q1_dis", DoubleType()),
        _f("median_dis", DoubleType()),
        _f("q3_dis", DoubleType()),
        _f("max_dis", DoubleType()),
        _f("p_above_2y", DoubleType()),
        _f("p_above_5y", DoubleType()),
        _f("p_above_20y", DoubleType()),
        _f("control_dis", DoubleType()),
    ]
)

# F5 — long-form raster (deforestation).
LOSSYEAR = StructType(
    [
        _f("x", DoubleType()),
        _f("y", DoubleType()),
        _f("lossyear", LongType()),
    ]
)

# F6 — polygon zones (WKT geometry).
BASINS = StructType(
    [
        _f("id", LongType()),
        _f("downstream_id", LongType()),
        _f("basin_area", DoubleType()),
        _f("upstream_area", DoubleType()),
        _f("geometry", StringType()),
    ]
)
