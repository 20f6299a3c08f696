"""Plan-shape and equivalence pins for the r15 optimization round.

Same contract as tests/test_r14_plan_shapes.py: each pin asserts the
physical property an optimization bought; results are covered by the
oracle/equivalence suites.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_pipelines_spark.operators.dedup import (
    incremental_near_duplicates,
    minhash_near_duplicates,
    minhash_signatures,
)


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


@pytest.fixture()
def dup_docs(spark):
    """40 docs with planted EXACT duplicates (pairs sharing all 16
    bands — the worst case for candidate duplication) plus near-dups
    and unrelated text."""
    rows = []
    for i in range(30):
        rows.append(
            (i, f"doc {i} shares the quick brown fox jumps over the lazy "
                f"dog boilerplate tail number {i % 3}")
        )
    # exact duplicates of docs 0-4 → every band matches (16x candidate
    # duplication per pair without first-band-wins)
    for i in range(5):
        rows.append((100 + i, rows[i][1]))
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_minhash_pairs_first_band_wins_no_distinct(spark, dup_docs):
    """r15: the est-survivor `.distinct()` exchange is gone — candidate
    pairs are deduplicated row-locally by the first-band-wins filter.
    Plan pin: no aggregate in the plan groups on est_jaccard (the old
    distinct was a HashAggregate keyed (doc_a, doc_b, est_jaccard) plus
    its exchange). Functional pin: exact duplicates share ALL bands yet
    each pair appears exactly once, with est_jaccard 1.0."""
    res = minhash_near_duplicates(dup_docs, jaccard_threshold=0.5)
    plan = _plan(res)
    assert not any(
        "est_jaccard" in ln
        for ln in plan.splitlines()
        if ln.strip().startswith("Keys")
    ), plan

    rows = [tuple(r) for r in res.collect()]
    assert len(rows) == len(set(rows)), rows  # one row per pair
    exact = {(a, b) for a, b, e in rows if e == 1.0}
    assert {(i, 100 + i) for i in range(5)} <= exact, rows

    # Portable mode (injective string band keys — exact equivalence,
    # no collision caveat) deduplicates identically.
    pres = minhash_near_duplicates(
        dup_docs, jaccard_threshold=0.5, portable=True
    )
    prows = [tuple(r) for r in pres.collect()]
    assert len(prows) == len(set(prows)), prows
    assert {(a, b) for a, b, _ in prows} == {(a, b) for a, b, _ in rows}


def test_incremental_pairs_first_band_wins(spark, dup_docs):
    """Same pin for the incremental operator: batch-vs-store and
    batch-vs-batch candidates deduplicate without a distinct."""
    store_docs = dup_docs.where(F.col("doc_id") < 100)
    batch = dup_docs.where(F.col("doc_id") >= 100)  # the exact dups
    store_sigs = minhash_signatures(store_docs)
    pairs, _sigs = incremental_near_duplicates(
        batch, store_sigs, jaccard_threshold=0.5
    )
    rows = [tuple(r) for r in pairs.collect()]
    assert len(rows) == len(set(rows)), rows
    found = {(a, b) for a, b, e in rows if e == 1.0}
    # each planted duplicate pairs with its original exactly once
    assert {(100 + i, i) for i in range(5)} <= found, rows
    plan = _plan(pairs)
    # no (doc_a, doc_b, est_jaccard) distinct aggregate anywhere: no
    # aggregate in the plan groups on est_jaccard
    assert not any(
        "est_jaccard" in ln
        for ln in plan.splitlines()
        if ln.strip().startswith("Keys")
    ), plan
