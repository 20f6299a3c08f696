#!/usr/bin/env python
"""Round-7 session-4 scale probes: retile/pyramid/COG-export and the
fused exact-dedup pass, timed at 1x and 10x synthetic pixel tables
(min of 2, local[32]). Run manually; results recorded in NOTES_r7.md.
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from data_pipelines_spark.operators.tiles import (
    build_pyramid,
    drop_empty_tiles,
    export_tiles_cog,
    retile_with_overlap,
)
from data_pipelines_spark.session import get_spark


def timed(fn, n=2):
    best = float("inf")
    for _ in range(n):
        t = time.time()
        fn()
        best = min(best, time.time() - t)
    return round(best, 2)


def main() -> None:
    spark = get_spark(app_name="scale-probe-r7e")
    spark.sparkContext.setLogLevel("ERROR")

    def pixels(n_side: int):
        # n_side^2 pixels with ~5% nodata stripes
        return spark.range(n_side * n_side).select(
            (F.col("id") % n_side).alias("x"),
            (F.col("id") / n_side).cast("long").alias("y"),
            F.when((F.col("id") % 20) == 7, F.lit(-32768.0))
            .otherwise((F.col("id") % 997).cast("double"))
            .alias("v"),
        )

    for n_side, label in ((1_000, "1e6 px"), (3_162, "1e7 px")):
        df = pixels(n_side).persist()
        df.count()

        t_retile = timed(
            lambda: retile_with_overlap(df, 256, 8)
            .groupBy("tile_x", "tile_y").count().collect()
        )
        t_pyramid = timed(
            lambda: build_pyramid(df, 6, value_col="v")
            .groupBy("level").count().collect()
        )

        def export():
            with tempfile.TemporaryDirectory(prefix="probe_cog_") as d:
                tiled = retile_with_overlap(df, 256, 8)
                kept = drop_empty_tiles(tiled, "v", -32768.0)
                export_tiles_cog(
                    kept, d, tile_size=256, overlap=8, value_col="v",
                    cog_tile=(128, 128),
                ).collect()

        t_export = timed(export)
        print(
            f"{label}: retile+count {t_retile}s  pyramid(6) {t_pyramid}s  "
            f"cog-export {t_export}s  "
            f"({(n_side // 256 + 1) ** 2} tiles)"
        )
        df.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()
