"""Parquet table sources.

The engine's storage contract starts at parquet (reference:
``resources/io_managers.py:138-177`` reads/writes dask parquet; all
non-tabular formats — GRIB/NetCDF/COG — are converted to long-form
parquet by ingestion scripts *outside* the engine, per SURVEY.md §2.1).

Reading a directory of per-partition files as one logical table
(reference S2, ``io_managers.py:171-177``) is just
``spark.read.parquet(dir)``; Hive-style partition columns give the
driver partition pruning for free.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# The driver-provided synthetic tables (TESTDATA.md).
DRIVER_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one named table from a scale-factor directory.

    Accepts either ``<dir>/<name>.parquet`` (driver layout) or a
    partitioned directory ``<dir>/<name>/``.
    """
    file_path = os.path.join(sf_dir, f"{name}.parquet")
    dir_path = os.path.join(sf_dir, name)
    return spark.read.parquet(file_path if os.path.exists(file_path) else dir_path)


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Load the `events` table, normalizing `ts` to TIMESTAMP_LTZ.

    The driver's events.parquet has stored `ts` two ways across rounds:
    TIMESTAMP(NANOS), which Spark's vectorized parquet reader rejects
    outright (read as LONG via the legacy conf, truncated to micros with
    exact integer division — the same truncation DuckDB applies), and
    TIMESTAMP(MICROS, isAdjustedToUTC=false), which Spark surfaces as
    TIMESTAMP_NTZ. Both are normalized here to the session-zone
    TIMESTAMP: the session pins `spark.sql.session.timeZone=UTC`
    (session.py), so the NTZ→LTZ cast reinterprets the naive wall-clock
    as a UTC instant — exactly how DuckDB's naive TIMESTAMP behaves in
    `epoch()`/`date_trunc`, keeping both engines on identical instants
    while downstream arithmetic (`cast("double")`, `unix_micros`) stays
    legal.
    """
    from pyspark.sql.types import LongType, TimestampNTZType

    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:
        pass
    df = load_table(spark, sf_dir, "events")
    ts_type = df.schema["ts"].dataType
    if isinstance(ts_type, LongType):
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    elif isinstance(ts_type, TimestampNTZType):
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every driver table as a temp view for spark.sql use."""
    for name in DRIVER_TABLES:
        try:
            load_table(spark, sf_dir, name).createOrReplaceTempView(name)
        except Exception:
            # A scale dir may lack optional tables; skip quietly.
            pass
