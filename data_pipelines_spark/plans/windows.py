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
    """Attach the ``value`` of the row matching ``marker`` to all rows
    of its group — e.g. the control-member value at step 1
    (`assets/flood/discharge.py:292-302`). Conditional ``max``, not
    ``first``: over an unordered partition ``first`` reads whatever row
    arrives first (shuffle/retry-order dependent when the marker is not
    unique); ``max`` is order-independent and identical whenever the
    marker row IS unique per group."""
    w = Window.partitionBy(*keys)
    return df.withColumn(alias, F.max(F.when(marker, F.col(value))).over(w))


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


def grouped_running_sum(
    df: DataFrame,
    group: list[str],
    order: list[Column],
    value: str,
    alias: str = "running_sum",
) -> DataFrame:
    """Exclusive running sum of ``value`` per ``group`` under ``order``
    (sum over strictly-preceding rows) WITHOUT one-partition-per-group
    windows.

    A bare ``Window.partitionBy(group).orderBy(...)`` routes each
    group's entire row set through a single task — fatal when groups are
    few and huge (e.g. packing a trillion-token corpus split across a
    handful of sources). Two-phase instead, same scheme as
    :func:`global_rank`: range-repartition by (group, order) so each
    group spans consecutive range partitions, accumulate locally within
    (partition, group), then add per-(partition, group) offsets computed
    from a partition-count-sized summary that is broadcast back.
    Output equals the naive window's for any total order.
    """
    # Output type = whatever SUM(value) naturally produces (long for
    # integral inputs, double for double, decimal for decimal) — a
    # hardcoded long cast would silently truncate fractional running
    # sums. Schema-only probe, no job.
    sum_type = df.select(F.sum(value).alias("__t")).schema["__t"].dataType
    zero = F.lit(0).cast(sum_type)
    # localCheckpoint: the partition ids MUST come from one single
    # evaluation of the range exchange. Two consumers read __pid
    # (`local` and `offsets`); without pinning, each consumer's plan
    # carries its own exchange whose range boundaries come from a
    # sample seeded by the physical rdd.id — DIFFERENT per evaluation —
    # so boundary-adjacent rows land in different partitions in the two
    # plans and local sums pair with the wrong offsets (observed: ~75%
    # of rows wrong with spark.sql.exchange.reuse=false; exchange reuse
    # normally hides this, but correctness must not hang off an
    # optimizer optimization). The checkpoint materializes the
    # partitioning once; lineage is cut, so lost blocks fail loudly
    # instead of recomputing into a different layout. Pinned by
    # tests/test_window_retry_determinism.py.
    parts = (
        df.repartitionByRange(*[F.col(g) for g in group], *order)
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint(eager=False)
    )
    w_local = Window.partitionBy("__pid", *group).orderBy(*order)
    local = parts.withColumn(
        "__lsum",
        F.coalesce(
            F.sum(value).over(w_local.rowsBetween(Window.unboundedPreceding, -1)),
            zero,
        ),
    )
    offsets = (
        parts.groupBy("__pid", *group)
        .agg(F.sum(value).alias("__n"))
        .withColumn(
            "__offset",
            F.coalesce(
                F.sum("__n").over(
                    Window.partitionBy(*group)
                    .orderBy("__pid")
                    .rowsBetween(Window.unboundedPreceding, -1)
                ),
                zero,
            ),
        )
        .drop("__n")
    )
    # Null-safe join-back: GROUP BY forms a NULL group and window
    # partitioning treats NULL as a real key, but a plain equi join
    # would drop NULL-group rows from the output (the
    # filter_by_group_quantile NULL-group-loss class).
    renamed = offsets.select(
        F.col("__pid").alias("__opid"),
        *[F.col(g).alias(f"__og{i}") for i, g in enumerate(group)],
        "__offset",
    )
    cond = F.col("__pid") == F.col("__opid")
    for i, g in enumerate(group):
        cond = cond & F.col(g).eqNullSafe(F.col(f"__og{i}"))
    return (
        local.join(F.broadcast(renamed), cond)
        .withColumn(
            alias, (F.col("__lsum") + F.col("__offset")).cast(sum_type)
        )
        .drop(
            "__pid", "__opid", "__lsum", "__offset",
            *[f"__og{i}" for i in range(len(group))],
        )
    )


def global_rank(df: DataFrame, order: list[Column], alias: str = "rank") -> DataFrame:
    """Total-order rank over the whole frame WITHOUT a single-partition
    sort.

    A bare ``Window.orderBy(...)`` funnels every row through one task —
    the classic global-window scale-killer. This is the two-phase
    scheme instead: range-repartition by the order columns (distributed
    sort), rank locally within each range partition, then add each
    partition's cumulative row-count offset (a partition-count-sized
    aggregate — the only tiny single-partition step). Ranks are
    identical to the naive window's for any total order, at any width.
    """
    # Same single-evaluation pin as grouped_running_sum: __pid feeds
    # two consumers, and un-pinned range exchanges re-sample different
    # boundaries per evaluation (see the comment there).
    parts = (
        df.repartitionByRange(*order)
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint(eager=False)
    )
    local = parts.withColumn(
        "__lrank", F.row_number().over(Window.partitionBy("__pid").orderBy(*order))
    )
    offsets = (
        parts.groupBy("__pid")
        .agg(F.count(F.lit(1)).alias("__n"))
        .withColumn(
            "__offset",
            F.coalesce(
                F.sum("__n").over(
                    Window.orderBy("__pid").rowsBetween(
                        Window.unboundedPreceding, -1
                    )
                ),
                F.lit(0),
            ),
        )
        .drop("__n")
    )
    return (
        local.join(F.broadcast(offsets), "__pid")
        .withColumn(alias, (F.col("__lrank") + F.col("__offset")).cast("long"))
        .drop("__pid", "__lrank", "__offset")
    )
