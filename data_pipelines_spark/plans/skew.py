"""Skew-safe aggregation: two-stage salted groupBy.

AQE's skew handling covers joins; a groupBy over a heavily skewed key
still funnels each hot key through one reducer. The classic fix is
salting: aggregate on (key, salt) first — spreading each hot key over
``salt_buckets`` reducers — then combine the partials. Works for any
algebraic aggregate (sum/count/min/max); averages are carried as
(sum, count) pairs.

At 100 TB this is the difference between a straggler-bound shuffle and
an even one when e.g. one grid cell / one document source dominates the
distribution. The salt MUST be a pure function of row content: position
sources (``spark_partition_id``, ``monotonically_increasing_id``,
``rand``) are recomputation-unstable — when a stage-1 task is retried
after a fetch failure (routine at scale), recomputed rows can land in
different salt groups than the copies some reducers already fetched,
the classic nondeterministic-shuffle-key double-count/loss hazard. We
derive it as ``pmod(xxhash64(salt_on...), salt_buckets)`` over
caller-named stable columns (default: every column of the frame), so a
retried task reproduces the identical salt for every row.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    salt_buckets: int = 16,
    salt_col: Column | None = None,
    salt_on: list[str] | None = None,
) -> DataFrame:
    """Two-stage aggregation over skewed keys.

    ``aggs``: {output_name: (input_col, fn)} with fn in
    {"sum", "count", "min", "max"}. Stage 1 groups on
    (keys..., salt) — partial aggregation + an even shuffle; stage 2
    combines partials on the true keys (tiny input: |keys| x salt rows).

    The salt is ``pmod(xxhash64(salt_on...), salt_buckets)`` —
    deterministic under task retry and input repartitioning because it
    reads only row content. ``salt_on`` defaults to all columns; pass a
    stable row-id column when one exists (cheaper hash, and immune to
    fully-duplicate rows hashing into one bucket — duplicates are the
    one content-hash shape that cannot spread, which matters only if a
    hot key's rows are near-identical).
    """
    combiner = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}
    stage1_fn = {"sum": F.sum, "count": F.count, "min": F.min, "max": F.max}
    for name, (col, fn) in aggs.items():
        if fn not in combiner:
            raise ValueError(f"{name}: unsupported aggregate '{fn}'")

    salt = (
        salt_col
        if salt_col is not None
        else F.pmod(
            F.xxhash64(*[F.col(c) for c in (salt_on or df.columns)]),
            F.lit(salt_buckets),
        )
    )
    stage1 = df.withColumn("__salt", salt).groupBy(*keys, "__salt").agg(
        *[
            stage1_fn[fn](F.col(col) if fn != "count" else F.lit(1)).alias(f"__{name}")
            for name, (col, fn) in aggs.items()
        ]
    )
    return stage1.groupBy(*keys).agg(
        *[
            combiner[fn](F.col(f"__{name}")).alias(name)
            for name, (col, fn) in aggs.items()
        ]
    )


def diagnose_skew(
    df: DataFrame,
    keys: list[str],
    top_k: int = 20,
) -> DataFrame:
    """Heavy-hitter report for a prospective shuffle key: the ``top_k``
    most frequent key values with their row counts and share of the
    table — the measurement step before choosing AQE skew-join,
    :func:`salted_agg`, or broadcast.

    Output: (keys..., key_cnt, total_cnt, frac), frequency-descending.
    A ``frac`` near 1/shuffle-partitions means one reducer will carry
    that key alone; several such rows mean salting (or a different key)
    is warranted.

    Scale shape: one map-side-combined count per key, a 1-row total
    broadcast back, TakeOrdered head — no global sort, nothing
    collected.
    """
    counts = df.groupBy(*keys).agg(F.count(F.lit(1)).alias("key_cnt"))
    total = counts.agg(F.sum("key_cnt").alias("total_cnt"))
    return (
        counts.join(F.broadcast(total))
        .withColumn(
            "frac", F.col("key_cnt").cast("double") / F.col("total_cnt")
        )
        .orderBy(F.desc("key_cnt"), *keys)
        .limit(top_k)
    )
