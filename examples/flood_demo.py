#!/usr/bin/env python
"""Worked example: the flood-forecast pipeline from raw GRIB to summary.

Generates a small ensemble grid (the reference's data shape, FIXTURES.md
F1-F3), writes it as REAL GRIB2 files (one per forecast step, one
message per member), ingests them with the engine's own GRIB reader,
and runs the asset graph (ingestion parquet → detailed forecast →
summary forecast) — the full dataflow a user of the reference platform
would recognize, starting at the same raw-file boundary, on Spark.

    python examples/flood_demo.py
"""

from __future__ import annotations

import datetime as dt
import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_pipelines_spark.pipelines.assets import flood_asset_graph
from data_pipelines_spark.session import get_spark
from data_pipelines_spark.sources.raster import grid_to_long_form


def main() -> None:
    spark = get_spark(app_name="flood-demo")
    spark.sparkContext.setLogLevel("ERROR")
    rng = np.random.default_rng(42)
    issued = dt.date(2026, 8, 1)

    # Synthetic ensemble: 10 members x 10 steps over a 20x20 cell grid.
    members, steps = 10, 10
    lats = np.round(np.arange(0.025, 1.025, 0.05), 3)
    lons = np.round(np.arange(10.025, 11.025, 0.05), 3)
    values = rng.gamma(2.0, 50.0, size=(members, steps, len(lats), len(lons)))

    # Start at the RAW-FILE boundary like the reference does: write one
    # real GRIB2 file per forecast step (one message per ensemble
    # member, simple packing quantized to 0.01 via D=2), then ingest
    # them with the engine's own GRIB reader. encode -> parse is the
    # same seam the reference crosses via cfgrib.
    from data_pipelines_spark.sources.raster import read_grib_ensemble
    from data_pipelines_spark.sources.raster_encode import encode_grib2

    grib_dir = tempfile.mkdtemp(prefix="flood_demo_grib_")
    per_step = []
    quant = np.round(values * 100) / 100  # what 0.01 packing preserves
    for s in range(steps):
        path = os.path.join(grib_dir, f"step_{s + 1:02d}.grib2")
        with open(path, "wb") as f:
            f.write(
                encode_grib2(
                    [(m, quant[m, s]) for m in range(members)],
                    lat0=float(lats[0]), lon0=float(lons[0]),
                    dlat=0.05, dlon=0.05, nbits=24, d_scale=2,
                    lat_ascending=True,
                )
            )
        per_step.append(
            read_grib_ensemble(spark, path).selectExpr(
                "number", f"{s + 1} AS step", "latitude", "longitude", "dis24"
            )
        )
    ingested = per_step[0]
    for df in per_step[1:]:
        ingested = ingested.unionByName(df)

    discharge = ingested.selectExpr(
        "number",
        "step",
        "latitude",
        "longitude",
        f"DATE '{issued}' AS issued_on",
        f"date_add(DATE '{issued}', CAST(step AS INT)) AS valid_for",
        "dis24",
    )

    thresholds = spark.createDataFrame(
        [(float(la), float(lo), 150.0, 250.0, 400.0) for la in lats for lo in lons],
        "latitude double, longitude double, threshold_2y double, "
        "threshold_5y double, threshold_20y double",
    )

    with tempfile.TemporaryDirectory(prefix="flood_demo_") as root:
        discharge.write.parquet(f"{root}/transformed_discharge")
        thresholds.write.parquet(f"{root}/rp_combined_thresholds")
        results = flood_asset_graph().materialize(spark, root)
        for name, r in results.items():
            print(f"asset {name}: {r.rows} rows in {r.seconds}s → {r.path}")
        summary = spark.read.parquet(results["summary_forecast"].path)
        print("\nsummary sample (non-gray cells):")
        summary.orderBy("latitude", "longitude").show(5, truncate=False)
        summary.groupBy("intensity", "tendency", "peak_timing").count().orderBy(
            "intensity", "tendency"
        ).show()
    spark.stop()


if __name__ == "__main__":
    main()
