"""Reusable window-plan shapes.

The reference simulates window functions with agg-then-join-back and
sort-then-first patterns (SURVEY.md §2.6); these helpers are the
idiomatic single-shuffle Spark equivalents, shared by the flood operators
and exposed for ad-hoc queries.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def group_max_broadcast(
    df: DataFrame, keys: list[str], value: str, alias: str
) -> DataFrame:
    """Attach max(value) over the key partition to every row.

    Replaces groupby-max + join-back (`utils/flood/transforms.py:101-112`).
    """
    return df.withColumn(alias, F.max(value).over(Window.partitionBy(*keys)))


def constant_from_marker(
    df: DataFrame, keys: list[str], marker: Column, value: str, alias: str
) -> DataFrame:
    """Attach the ``value`` of the (unique) row matching ``marker`` to all
    rows of its group — e.g. the control-member value at step 1
    (`assets/flood/discharge.py:292-302`)."""
    w = Window.partitionBy(*keys)
    return df.withColumn(
        alias, F.first(F.when(marker, F.col(value)), ignorenulls=True).over(w)
    )


def top1_per_group(df: DataFrame, keys: list[str], order: list[Column]) -> DataFrame:
    """Deterministic argmax: the single best row per group under a total
    order (`utils/flood/transforms.py:128-139`, with an explicit
    tie-break — SURVEY.md §7.4)."""
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )
