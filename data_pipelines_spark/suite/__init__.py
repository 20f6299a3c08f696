"""Query suite: every operator exposed as a (spark, sf_dir) -> DataFrame
callable plus (where SQL-expressible) a DuckDB oracle string.

This is the engine's external correctness surface: the driver runs each
query on Spark and its oracle on DuckDB over the same parquet tables and
compares row count + schema + order-insensitive value hash
(see /root/repo/__spark_entry__.py).

Determinism rules every query follows so Spark and DuckDB agree
bit-for-bit:
- No order-dependent double sums: money sums go through DECIMAL casts
  (exact integer arithmetic) and back to DOUBLE at the end.
- avg() only over integer flags/counts (exact sum / exact count).
- min/max/count pass raw values through untouched.
- Quantiles only over values where linear interpolation is exact
  (integral quantities).
- Timestamps are rendered to strings with an explicit UTC format, or
  cast to DATE.
- Every computed column is aliased identically on both sides.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from data_pipelines_spark.suite import (
    advanced,
    analytics,
    core,
    geospatial,
    llmdata,
    relational,
    temporal,
)

_MODULES = (core, relational, temporal, analytics, advanced, geospatial, llmdata)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for m in _MODULES:
        out.update(m.QUERIES)
    return out


def oracle_sql() -> dict[str, str]:
    out: dict[str, str] = {}
    for m in _MODULES:
        out.update(m.ORACLES)
    return out
