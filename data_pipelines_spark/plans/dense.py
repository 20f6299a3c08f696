"""Dense-group aggregation: emit a row for EVERY key combination.

Spark's (and SQL's) groupBy drops empty groups; the reference's zonal
count contract requires zeros for them (`xarray_reduce` with
``expected_groups``, `assets/deforestation/global_forest_watch.py:200-206`).
This helper materializes the dense key universe and left-joins the
sparse aggregate onto it — a deliberate plan shape, kept in one place so
every dense-output operator shares it (SURVEY.md §4 calls this the
"dense-group contract").

Scale: the universe is |keys1| × |keys2| … rows of key columns only —
tiny relative to the fact table — and the sparse aggregate is produced
first (map-side partial aggregation), so the dense join touches
aggregated data, never raw rows. The universe side is broadcast when it
fits.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def key_universe(*key_dfs: DataFrame) -> DataFrame:
    """Cross-join single-column (or multi-column) key frames into the
    dense key universe. Each input should already be distinct."""
    return reduce(lambda a, b: a.crossJoin(b), key_dfs)


def dense_agg(
    fact: DataFrame,
    universe: DataFrame,
    keys: list[str],
    aggs: list,
    fill: dict[str, float | int] | None = None,
) -> DataFrame:
    """GroupBy ``keys`` over ``fact`` with ``aggs``, densified to every
    row of ``universe`` (zero/fill for empty groups)."""
    sparse = fact.groupBy(*keys).agg(*aggs)
    out = universe.join(sparse, keys, "left")
    if fill:
        out = out.na.fill(fill)
    return out
