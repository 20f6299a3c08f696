"""Skew-safe shuffles: salted groupBy, hot/cold split join, diagnostics.

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


def skew_split_join(
    fact: DataFrame,
    dim: DataFrame,
    keys: list[str],
    how: str = "inner",
    hot_keys: list | None = None,
    min_count: int = 100_000,
    top_k: int = 64,
) -> DataFrame:
    """Equi-join ``fact ⨝ dim`` with the heavy-hitter keys taken out of
    the shuffle: hot-key fact rows join a broadcast of the dim rows for
    those keys (no movement of the hot rows at all), everything else
    joins normally, and the two branches union.

    When to reach for this instead of AQE's skew-join: AQE splits an
    oversized sort-merge partition by REPLICATING the matching partition
    of the other side — it still shuffles every hot row and needs the
    join to be a shuffle join in the first place. When the dim subset
    for the hot keys is tiny (the common shape: one celebrity user, one
    dominant grid cell, one boilerplate source), broadcasting exactly
    that subset removes the hot keys from the shuffle entirely; the
    remaining cold shuffle is even by construction. Neither branch
    filters the other's matches because the key space is partitioned
    exactly between them.

    ``hot_keys``: explicit list of key values (tuples for composite
    keys) — the deterministic, plan-only path. If None, a driver-side
    count job finds keys with ``count >= min_count`` (capped at
    ``top_k``); that list is collected ONCE and pinned into both
    branch predicates, so task retries replay identical routing (the
    retry-determinism bar :func:`salted_agg` is held to).

    ``how``: inner | left | left_semi | left_anti. Left-join fact rows
    with a NULL key are routed to the cold branch (NULL never equals a
    hot key, and equi-join semantics give them no match either way).

    Scale shape: one aggregate-sized count job (skipped when
    ``hot_keys`` is given), then fact is read once with two
    complementary predicates — Catalyst merges them into one scan per
    branch; shuffle volume is |cold fact| + |cold dim|; broadcast is
    |hot dim| (bounded by top_k keys x their dim multiplicity — size
    it like any broadcast: this operator assumes dim is thin per key).
    """
    if how not in ("inner", "left", "left_semi", "left_anti"):
        raise ValueError(f"unknown how: {how}")
    if not keys:
        raise ValueError("keys must be non-empty")

    if hot_keys is None:
        hot_rows = (
            fact.groupBy(*keys)
            .agg(F.count(F.lit(1)).alias("__cnt"))
            .where(F.col("__cnt") >= min_count)
            .orderBy(F.desc("__cnt"), *keys)
            .limit(top_k)
            .collect()
        )
        hot_keys = [tuple(r[k] for k in keys) for r in hot_rows]
    else:
        hot_keys = [
            k if isinstance(k, tuple) else (k,) for k in hot_keys
        ]
    if not hot_keys:
        return fact.join(dim, keys, how)

    def hot_pred(df: DataFrame) -> Column:
        if len(keys) == 1:
            raw = F.col(keys[0]).isin([k[0] for k in hot_keys])
        else:
            # Literal structs must mirror the frame's field names AND
            # types exactly (IN refuses struct<int> vs struct<bigint>),
            # and each side of the join may type its keys differently —
            # so the literals are cast per-frame.
            raw = F.struct(*[F.col(k) for k in keys]).isin(
                [
                    F.struct(
                        *[
                            F.lit(v).cast(df.schema[k].dataType).alias(k)
                            for k, v in zip(keys, vals)
                        ]
                    )
                    for vals in hot_keys
                ]
            )
        # NULL keys make the predicate NULL; coalesce so the branch
        # filters are complementary (a NULL-key row goes cold exactly
        # once, never dropped by both).
        return F.coalesce(raw, F.lit(False))

    fact_hot = fact.where(hot_pred(fact))
    fact_cold = fact.where(~hot_pred(fact))
    dim_hot = dim.where(hot_pred(dim))
    dim_cold = dim.where(~hot_pred(dim))

    hot = fact_hot.join(F.broadcast(dim_hot), keys, how)
    cold = fact_cold.join(dim_cold, keys, how)
    return hot.unionByName(cold)


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
