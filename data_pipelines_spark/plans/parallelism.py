"""Parallelism guard for CPU-bound narrow stages.

Small inputs arrive as one file split; a narrow CPU-heavy stage
(interpreted array lambdas, Python mapInPandas) then serializes onto
one core. `spread` repartitions ONLY when the input is narrower than
the cluster's parallelism — at real scale (inputs already wide) it is
a no-op, never a coalesce. Measured effects: minhash signatures 12s →
<1s core-time, spatial exact test similar.

Width is estimated WITHOUT converting the plan to an RDD
(`df.rdd.getNumPartitions()` compiles the physical plan to RDD on
every call — wasteful inside hot operators). Instead we count the
leaf scan files (`df.inputFiles()`, metadata-only): a 100 TB table is
thousands of files so the guard no-ops; a one-file local fixture or an
in-memory frame reads as narrow and gets spread. Callers that know
their width can pass ``width_hint`` to skip even that lookup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame, width_hint: int | None = None) -> DataFrame:
    target = df.sparkSession.sparkContext.defaultParallelism
    width = width_hint
    if width is None:
        try:
            width = len(df.inputFiles())
        except Exception:
            width = 0  # non-file source: assume narrow, spread it
    if width >= target:
        return df
    return df.repartition(target)
