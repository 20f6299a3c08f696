"""Bucketed-table materialization: pre-shuffled layouts so repeated
joins and aggregations on a hot key run WITHOUT an Exchange.

At 100 TB the single most expensive recurring cost is re-shuffling the
same fact table on the same join key pipeline after pipeline. Spark's
answer is bucketing (`DataFrameWriter.bucketBy`): the shuffle is paid
ONCE at write time — rows are hash-partitioned into a fixed number of
buckets per the key — and every later equi-join or groupBy on that key
reads the layout instead of exchanging. Two tables bucketed on the
same key with the same bucket count sort-merge-join with ZERO shuffle
on either side (pinned by `tests/test_bucketed.py` against the
physical plan), and an equality filter on the bucket column prunes to
a single bucket's files (`SelectedBucketsCount` in the scan).

The reference re-materializes assets wholesale per day (reference
`data_pipelines/jobs.py:24-29`) and its engines re-partition per query;
bucketing is the Spark-native way to make that daily product a
join-ready layout. `operators/dedup.py:306` (MinHash band-bucket
store) and the IVF list table are the natural customers.

Honest caveats, documented not hidden:

- `bucketBy` REQUIRES `saveAsTable` — the bucket spec lives in the
  catalog, not the parquet footers. With the default in-memory catalog
  the spec is session-scoped; production needs a persistent metastore
  (the files themselves are plain parquet either way, so a spec-less
  reader just sees a normal table and re-shuffles).
- Spark writes one file per bucket PER WRITING TASK: an N-task write
  into B buckets creates up to N x B files. `write_bucketed` therefore
  repartitions to the bucket expression first, so the layout lands as
  exactly B files (plus one more level per `sort_cols` spill, if any).
- The bucket hash is Spark's Murmur3 `pmod` — other engines (Hive,
  Trino) use different bucket functions; this layout optimizes Spark
  readers only.
"""

from __future__ import annotations

from collections.abc import Sequence
from contextlib import contextmanager

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    path: str,
    bucket_cols: Sequence[str],
    num_buckets: int,
    sort_cols: Sequence[str] = (),
    mode: str = "overwrite",
) -> None:
    """Materialize ``df`` as an external parquet table bucketed by
    ``bucket_cols`` into ``num_buckets`` buckets (optionally sorted
    within each bucket by ``sort_cols`` — sorted buckets additionally
    skip the Sort under a sort-merge join on the same key).

    The input is repartitioned on the bucket columns into
    ``num_buckets`` partitions first so each bucket is written by
    exactly one task — one file per bucket, not one per (task, bucket)
    (the small-files trap that makes naive bucketed writes unreadable
    at scale).
    """
    if num_buckets <= 0:
        raise ValueError(f"num_buckets must be positive, got {num_buckets}")
    if not bucket_cols:
        raise ValueError("bucket_cols must be non-empty")
    writer = (
        df.repartition(num_buckets, *bucket_cols)
        .write.format("parquet")
        .mode(mode)
        .option("path", path)
        .bucketBy(num_buckets, *bucket_cols)
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


@contextmanager
def bucketed_scan_forced(spark: SparkSession):
    """Plan queries inside this block with the bucketed scan ALWAYS on.

    Spark's auto-bucketed-scan heuristic (`spark.sql.sources.bucketing.
    autoBucketedScan.enabled`, default true) disables the bucketed
    layout when the plan has no node that *requires* the hash
    distribution — which also forfeits bucket PRUNING on a plain
    equality filter (the scan reads all buckets; measured: the
    point-lookup plan says `Bucketed: false (disabled by query
    planner)`). Joins and aggregations don't need this; wrap only
    point-lookup/filter reads where the 1-of-N bucket prune is the
    point. Restores the previous setting on exit."""
    key = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
    prev = spark.conf.get(key)
    spark.conf.set(key, "false")
    try:
        yield
    finally:
        spark.conf.set(key, prev)


def bucket_spec(spark: SparkSession, table: str) -> dict:
    """The table's bucket layout from the catalog:
    ``{"num_buckets": int, "bucket_cols": [..], "sort_cols": [..]}``
    (zero/empty when the table is not bucketed). This is what a
    planner consults before relying on co-location."""
    rows = spark.sql(f"DESCRIBE TABLE EXTENDED {table}").collect()
    info = {r.col_name: (r.data_type or "") for r in rows}

    def cols(key: str) -> list[str]:
        raw = info.get(key, "")
        return [c.strip().strip("`") for c in raw.strip("[]").split(",") if c.strip()]

    n = info.get("Num Buckets", "").strip()
    return {
        "num_buckets": int(n) if n.isdigit() else 0,
        "bucket_cols": cols("Bucket Columns"),
        "sort_cols": cols("Sort Columns"),
    }


def cobucketed(spark: SparkSession, table_a: str, table_b: str, on: Sequence[str]) -> bool:
    """True when an equi-join of the two tables on ``on`` is exchange
    free: both bucketed on exactly the join columns with the same
    bucket count. (Spark also co-locates compatible multiples since
    3.1 via bucket coalescing; this predicate answers the strict case
    a pipeline should WRITE for.)"""
    a, b = bucket_spec(spark, table_a), bucket_spec(spark, table_b)
    want = sorted(on)
    return (
        a["num_buckets"] > 0
        and a["num_buckets"] == b["num_buckets"]
        and sorted(a["bucket_cols"]) == want
        and sorted(b["bucket_cols"]) == want
    )
