"""Mergeable distinct-count sketches (Apache DataSketches HLL, exposed
through Spark's built-in ``hll_*`` functions).

The 100 TB pattern this enables: a daily job reduces each partition's
facts to one HllSketch row per (day, dimension) — kilobytes instead of
the raw keys — and any later question ("distinct users last 90 days",
"unique domains per source this quarter") is answered by UNIONING the
stored sketches, never rescanning the facts. ``approx_count_distinct``
alone cannot do this: its estimate is not re-mergeable once collected,
while HLL sketch state unions losslessly at equal configuration.

Both operators are one map-side-combined aggregation; sketch size is
bounded by ``lgk`` (2^lgk buckets, ~0.5-1 KB at the default 12 with
~2-3% relative error), independent of cardinality.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def distinct_sketch(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    lgk: int = 12,
    sketch_col: str = "distinct_sketch",
) -> DataFrame:
    """Reduce to one HLL sketch of ``value_col``'s distinct values per
    group: (group_cols..., sketch_col binary, n_distinct_approx).

    Store these rows (e.g. partitioned by day); re-aggregate later with
    :func:`merge_distinct_counts`. ``lgk`` must match across every
    sketch that will ever be unioned — keep it with the store.
    """
    sk = F.hll_sketch_agg(F.col(value_col), F.lit(int(lgk)))
    return df.groupBy(*group_cols).agg(
        sk.alias(sketch_col),
    ).withColumn(
        "n_distinct_approx",
        F.hll_sketch_estimate(F.col(sketch_col)),
    )


def merge_distinct_counts(
    sketches: DataFrame,
    group_cols: Sequence[str],
    sketch_col: str = "distinct_sketch",
    keep_sketch: bool = False,
) -> DataFrame:
    """Union stored sketches to a coarser grain and estimate:
    (group_cols..., n_distinct_approx[, sketch_col]).

    Unions never double count: a value present in many input sketches
    contributes once, so rolling up daily sketches estimates the true
    distinct count of the union within the sketch's error envelope
    (asserted in tests; sketches still in sparse mode union bit-exactly
    with the direct sketch, a dense-mode union may differ from it by a
    fraction of a percent — both stay inside the envelope). Pass
    ``group_cols=[]`` for a global count; ``keep_sketch=True`` retains
    the merged sketch for further cascading (day → month → year).
    """
    merged = F.hll_union_agg(F.col(sketch_col)).alias("__merged")
    out = sketches.groupBy(*group_cols).agg(merged).withColumn(
        "n_distinct_approx", F.hll_sketch_estimate(F.col("__merged"))
    )
    if keep_sketch:
        return out.withColumnRenamed("__merged", sketch_col)
    return out.drop("__merged")
