"""Parallelism guard for CPU-bound narrow stages.

Small inputs arrive as one file split; a narrow CPU-heavy stage
(interpreted array lambdas, Python mapInPandas) then serializes onto
one core. `spread` repartitions ONLY when the input is narrower than
the cluster's parallelism — at real scale (inputs already wide) it is
a no-op, never a coalesce. Measured effects: minhash signatures 12s →
<1s core-time, spatial exact test similar.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame) -> DataFrame:
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
