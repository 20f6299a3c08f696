"""Driver-canonicalizer hygiene gate.

The driver compares Spark and DuckDB results by loading both into
pandas, sorting rows, and hashing values. Two failure classes slipped
past the multiset-equality gate in round 1:

1. dtype drift — DuckDB's integer SUM returns HUGEINT (int128), which
   ``.df()`` converts to float64/object while Spark emits int64; equal
   values then hash differently (q12_priority_shipping,
   events_session_windows).
2. unhashable cells — array columns arrive as numpy.ndarray, which
   pandas cannot factorize during the canonical sort (array_agg_lines).

This test enforces, for every oracled query at the smallest SF, that
(a) the pandas dtypes of matching columns are hash-compatible between
the two engines and (b) no cell is an unhashable container type.
Temporal columns are exempted from exact-dtype matching because the
round-1 driver hashed DATE columns fine despite Spark rendering them as
object-of-date and DuckDB as datetime64.
"""

from __future__ import annotations

import datetime as dt
import os

import duckdb
import numpy as np
import pandas as pd
import pytest

import __spark_entry__ as entry_mod
from data_pipelines_spark.sources.tables import DRIVER_TABLES

SF_DIR = os.environ.get("SPARK_GRAFT_HYGIENE_DIR", "/root/testdata/sf0.001")

_QUERIES = entry_mod.queries()
_ORACLES = entry_mod.oracle_sql()

_TEMPORAL = (dt.date, dt.datetime, pd.Timestamp, np.datetime64)
_HASHABLE_SCALARS = (str, bytes, bool, int, float, np.integer, np.floating,
                     np.bool_, type(None)) + _TEMPORAL


def _kind(series: pd.Series) -> str:
    """Collapse a pandas dtype to the equivalence class the driver's
    value hash distinguishes."""
    k = series.dtype.kind
    if k in ("M", "m"):
        return "temporal"
    if k in ("i", "u"):
        return "int"
    if k == "f":
        return "float"
    if k == "b":
        return "bool"
    # object column: classify by the non-null Python values inside.
    sample = [v for v in series.head(200) if v is not None and v == v]
    if not sample:
        return "empty"
    if all(isinstance(v, _TEMPORAL) for v in sample):
        return "temporal"
    if all(isinstance(v, str) for v in sample):
        return "str"
    if all(isinstance(v, bool) for v in sample):
        return "bool"
    if all(isinstance(v, (int, np.integer)) and not isinstance(v, bool)
           for v in sample):
        return "int"
    if all(isinstance(v, (float, np.floating)) for v in sample):
        return "float"
    return f"mixed({sorted({type(v).__name__ for v in sample})})"


def _duck(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in DRIVER_TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    return con


def _assert_hashable_cells(df: pd.DataFrame, side: str, name: str) -> None:
    for col in df.columns:
        s = df[col]
        if s.dtype.kind != "O":
            continue
        for v in s.head(50):
            assert isinstance(v, _HASHABLE_SCALARS), (
                f"{name}: {side} column {col!r} holds unhashable "
                f"{type(v).__name__} — the driver canonicalizer will crash"
            )


@pytest.mark.parametrize("name", sorted(_ORACLES))
def test_pandas_dtypes_hash_compatible(spark, name):
    spdf = _QUERIES[name](spark, SF_DIR).toPandas()
    ddf = _duck(SF_DIR).execute(_ORACLES[name]).df()

    assert sorted(spdf.columns) == sorted(ddf.columns), (
        f"{name}: column sets differ: {list(spdf.columns)} vs {list(ddf.columns)}"
    )
    _assert_hashable_cells(spdf, "spark", name)
    _assert_hashable_cells(ddf, "duckdb", name)
    for col in sorted(spdf.columns):
        sk, dk = _kind(spdf[col]), _kind(ddf[col])
        if "empty" in (sk, dk):
            continue
        assert sk == dk, (
            f"{name}: column {col!r} kind mismatch spark={sk} "
            f"({spdf[col].dtype}) vs duckdb={dk} ({ddf[col].dtype}) — "
            f"equal values will hash differently in the driver "
            f"(HUGEINT→float64 is the classic cause: CAST ... AS BIGINT "
            f"in the oracle)"
        )


@pytest.mark.parametrize("name", sorted(set(_QUERIES) - set(_ORACLES)))
def test_rows_only_outputs_hashable(spark, name):
    """Rows-only queries still pass through the driver's canonicalizer —
    their cells must be hashable too."""
    spdf = _QUERIES[name](spark, SF_DIR).limit(200).toPandas()
    _assert_hashable_cells(spdf, "spark", name)
