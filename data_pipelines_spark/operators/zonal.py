"""Zonal statistics over long-form rasters (deforestation pipeline).

Reference: `assets/deforestation/global_forest_watch.py`. The raster is
ingested (outside the engine) as a long-form table (x, y, lossyear); all
analytics are then relational:

- A8 ``coarsen(x=200, y=200).sum()``  → groupBy on floor-divided coords.
- F14/U2 per-year masks + concat      → long-form already encodes it.
- A6+F10/F11 per-basin pixel area     → deterministic first + haversine.
- A7 dense zonal count                → plans.dense (zeros preserved).
- J8 counts ⨝ areas                   → broadcast join on basin id.

Scale: a 100 TB raster arrives as many parquet files; every operator
here is a single groupBy whose partial aggregation collapses each
partition to ~|groups| rows before the shuffle. The dense-universe side
is |basins|×|years| — broadcastable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from data_pipelines_spark.functions.geo import pixel_area_km2
from data_pipelines_spark.plans.dense import dense_agg, key_universe


def coarsen_sum(
    df: DataFrame,
    block_x: int = 200,
    block_y: int = 200,
    x_col: str = "x",
    y_col: str = "y",
    value_col: str = "mask",
    extra_keys: tuple[str, ...] = (),
) -> DataFrame:
    """Block-sum downsample: sum ``value_col`` over block_x × block_y
    pixel blocks (reference A8, `global_forest_watch.py:71`)."""
    return (
        df.groupBy(
            F.floor(F.col(x_col) / block_x).alias("block_x"),
            F.floor(F.col(y_col) / block_y).alias("block_y"),
            *extra_keys,
        )
        .agg(F.sum(value_col).alias(f"{value_col}_sum"))
    )


def yearly_loss_masks(df: DataFrame, years: tuple[int, ...] = tuple(range(1, 23))) -> DataFrame:
    """Long-form equivalent of the 22 per-year equality masks + concat
    (reference F14/U2, `global_forest_watch.py:67-70`): one row per pixel
    per loss year with mask=1. The long layout makes the per-year ‘new
    axis’ a plain column."""
    return (
        df.where(F.col("lossyear").isin(*years))
        .select("x", "y", F.col("lossyear").alias("year"), F.lit(1).alias("mask"))
    )


def basin_pixel_areas(
    zoned: DataFrame,
    pixel_size_deg: float,
    id_col: str = "id",
    x_col: str = "x",
    y_col: str = "y",
) -> DataFrame:
    """Representative per-basin pixel ground area (reference A6 + F10/F11,
    `global_forest_watch.py:176-181`).

    The reference takes dask's layout-dependent first row per basin; we
    take the row with the minimum (y, x) — deterministic under any
    partitioning (documented deviation, SURVEY.md A6).
    """
    first_cell = zoned.groupBy(id_col).agg(
        F.min_by(F.struct(F.col(y_col).alias("y"), F.col(x_col).alias("x")),
                 F.struct(F.col(y_col), F.col(x_col))).alias("cell")
    ).select(id_col, F.col("cell.y").alias("y"), F.col("cell.x").alias("x"))
    return first_cell.withColumn(
        "pixel_area_km2", pixel_area_km2(F.col("y"), F.col("x"), pixel_size_deg)
    ).select(id_col, "pixel_area_km2")


def dense_zonal_count(
    zoned: DataFrame,
    zones: DataFrame,
    years: tuple[int, ...] = tuple(range(1, 23)),
    id_col: str = "id",
    year_col: str = "lossyear",
    year_offset: int = 2000,
) -> DataFrame:
    """Tree-loss incidents per (basin, calendar year), **including zero
    rows for empty groups** (reference A7/F15,
    `global_forest_watch.py:196-209`).

    Output: (id, year, loss_incidents) with year = raw + 2000.
    """
    spark = zoned.sparkSession
    incidents = zoned.where(F.col(year_col) > 0).select(
        F.col(id_col), F.col(year_col).alias("year")
    )
    universe = key_universe(
        zones.select(id_col).distinct(),
        spark.range(min(years), max(years) + 1).select(F.col("id").alias("year")),
    )
    dense = dense_agg(
        incidents,
        universe,
        [id_col, "year"],
        [F.count(F.lit(1)).alias("loss_incidents")],
        fill={"loss_incidents": 0},
    )
    return dense.withColumn("year", (F.col("year") + year_offset).cast("long"))


def treeloss_per_basin(
    zoned: DataFrame,
    zones: DataFrame,
    pixel_size_deg: float,
    id_col: str = "id",
) -> DataFrame:
    """Dense per-(basin, year) loss counts joined with per-basin pixel
    area (reference J8, `global_forest_watch.py:215`): the area side has
    one row per basin — broadcast."""
    counts = dense_zonal_count(zoned, zones, id_col=id_col)
    areas = basin_pixel_areas(zoned, pixel_size_deg, id_col=id_col)
    return counts.join(F.broadcast(areas), id_col, "left")
