"""Join operators beyond plain equi-joins.

- :func:`asof_join` — merge-asof ("latest right row at or before the
  left timestamp, per key"). The reference's nearest-grid alignment
  (J6, `utils/flood/filter_by_upstream.py:63-67`) is the 2-D spatial
  cousin of this 1-D temporal operator; both reduce to deterministic
  single-shuffle plans.

Scale notes: the classic formulations of as-of are a range join (O(n·m)
explosion) or a per-key collect; this implementation is the
union-and-window form — one shuffle on the key, one local sort, linear
state — which survives arbitrarily large inputs and skewed keys (AQE
splits skewed partitions; the window itself is streaming-evaluated).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    direction: str = "backward",
) -> DataFrame:
    """For every left row, attach ``value_cols`` from the latest right
    row with ``right_ts <= left_ts`` (direction='backward'; 'forward'
    gives the earliest right row at-or-after).

    Right rows must be unique per (key, ts) — pre-aggregate otherwise
    (nondeterministic ties are the caller's bug, not silently resolved).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"unknown direction: {direction}")

    marker = F.lit(1)
    l_tagged = left.withColumn("__ts", F.col(left_ts)).withColumn("__is_left", marker)
    for v in value_cols:
        l_tagged = l_tagged.withColumn(v, F.lit(None).cast(right.schema[v].dataType))
    r_tagged = (
        right.select(
            *key_cols, F.col(right_ts).alias("__ts"), *value_cols
        ).withColumn("__is_left", F.lit(0))
    )
    left_cols = [c for c in left.columns]
    merged = l_tagged.select(
        *left_cols, *value_cols, "__ts", "__is_left"
    ).unionByName(
        r_tagged.select(
            *[
                F.lit(None).cast(left.schema[c].dataType).alias(c)
                if c not in key_cols
                else F.col(c)
                for c in left_cols
            ],
            *value_cols,
            "__ts",
            "__is_left",
        )
    )

    if direction == "backward":
        # Rights sort before lefts at equal ts so "at or before" includes
        # the equal-timestamp right row.
        w = (
            Window.partitionBy(*key_cols)
            .orderBy(F.asc("__ts"), F.asc("__is_left"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
    else:
        w = (
            Window.partitionBy(*key_cols)
            .orderBy(F.desc("__ts"), F.asc("__is_left"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )

    filled = merged.select(
        *left_cols,
        "__is_left",
        *[F.last(v, ignorenulls=True).over(w).alias(v) for v in value_cols],
    )
    return filled.where(F.col("__is_left") == 1).drop("__is_left")
