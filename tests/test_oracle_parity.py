"""Local mirror of the driver's correctness gate: run every suite query
on Spark and its oracle on DuckDB over the same parquet tables; require
EXACT equality of the multiset of rows (column-name-sorted, like the
driver's order-insensitive value hash).

If this passes, any sane hashing scheme the driver applies passes too.
"""

from __future__ import annotations

import math
import os
from datetime import date, datetime
from decimal import Decimal

import duckdb
import pytest

import __spark_entry__ as entry_mod
from data_pipelines_spark.sources.tables import DRIVER_TABLES

SF_DIR = os.environ.get("SPARK_GRAFT_T2_DIR", "/root/testdata/sf0.01")

_QUERIES = entry_mod.queries()
_ORACLES = entry_mod.oracle_sql()

# These oracles restate a trained model (the deterministic k-means fit
# of embeddings@sf0.01) as SQL literals — the pin the driver's sf0.01
# refit reproduces bit-for-bit (suite/llmdata.py). At any other SF the
# live refit is a DIFFERENT (equally valid) model, so value parity is
# defined only at the driver's correctness SF. Every other entry is
# SF-agnostic and must pass at all SFs (verified at sf0.1).
_MODEL_PINNED_AT_SF001 = {"embedding_ivf_topk", "semantic_dedup"}


def _duck(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in DRIVER_TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    return con


def _norm(v):
    if isinstance(v, Decimal):
        return float(v)
    if isinstance(v, datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, float) and math.isnan(v):
        return "NaN"
    return v


def _canon(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    out = [tuple(_norm(r[i]) for i in order) for r in rows]
    return sorted(out, key=repr)


@pytest.mark.parametrize("name", sorted(_ORACLES))
def test_query_matches_oracle(spark, name):
    if name in _MODEL_PINNED_AT_SF001 and not SF_DIR.rstrip("/").endswith(
        "sf0.01"
    ):
        pytest.skip("oracle pins the sf0.01-trained k-means model")
    sdf = _QUERIES[name](spark, SF_DIR)
    spark_cols = sdf.columns
    spark_rows = [tuple(r) for r in sdf.collect()]

    con = _duck(SF_DIR)
    res = con.execute(_ORACLES[name])
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column names differ: {spark_cols} vs {duck_cols}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count {len(spark_rows)} vs oracle {len(duck_rows)}"
    )
    s_canon = _canon(spark_rows, spark_cols)
    d_canon = _canon(duck_rows, duck_cols)
    mismatches = [
        (i, a, b) for i, (a, b) in enumerate(zip(s_canon, d_canon)) if a != b
    ]
    assert not mismatches, (
        f"{name}: {len(mismatches)} mismatched rows; first 3: {mismatches[:3]}"
    )


@pytest.mark.parametrize("name", sorted(set(_QUERIES) - set(_ORACLES)))
def test_rows_only_queries_run(spark, name):
    """Queries without oracles must at least execute and have a stable
    schema."""
    sdf = _QUERIES[name](spark, SF_DIR)
    assert sdf.columns
    assert sdf.count() >= 0


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0
