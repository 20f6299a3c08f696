"""Generic distributed task map with per-task retry.

Reference D5 (`resources/dask_resource.py:34-38`): ad-hoc fan-out of
independent Python tasks (GPU tile upscaling) via client.submit/gather.
Spark-native form: parallelize the task descriptors and map the handler,
with bounded retries per task — results return as a DataFrame so
downstream bookkeeping (manifests, joins) stays relational.

This is the ONE place the engine intentionally uses the RDD API: the
workload is imperative per-task Python by definition (ML inference,
subprocess transcodes), not relational.
"""

from __future__ import annotations

import traceback
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

RESULT_SCHEMA = "task_id long, ok boolean, attempts int, result string, error string"


def task_map(
    spark: SparkSession,
    tasks: list,
    handler: Callable,
    num_slots: int | None = None,
    max_retries: int = 2,
) -> DataFrame:
    """Run ``handler(task)`` for every task across the cluster.

    Each task retries up to ``max_retries`` times (reference retry
    policy shape, `jobs.py:9-11`); failures are captured, not raised, so
    one bad tile doesn't kill the job (the manifest records it)."""
    slots = num_slots or max(len(tasks), 1)

    def run(indexed):
        idx, task = indexed
        last_err = ""
        for attempt in range(1, max_retries + 2):
            try:
                return (idx, True, attempt, str(handler(task)), "")
            except Exception:
                last_err = traceback.format_exc(limit=3)
        return (idx, False, max_retries + 1, "", last_err)

    rdd = spark.sparkContext.parallelize(list(enumerate(tasks)), slots).map(run)
    return spark.createDataFrame(rdd, RESULT_SCHEMA)
