"""Property-based equivalence tests (hypothesis) for the custom join
operators, against independent oracles:

- ``asof_join`` vs pandas ``merge_asof`` (both directions) — an
  external reference implementation of the exact semantics;
- ``interval_join`` vs the naive cross-join + BETWEEN filter it
  replaces, across generated bin widths;
- ``skew_split_join`` vs the plain equi-join, for arbitrary hot-key
  subsets and all four join types.

Each property runs a bounded number of generated examples (Spark jobs
are ~0.5 s each; the value is in the generator's edge-case seeking —
duplicate timestamps, empty sides, boundary-touching intervals — not
in volume). ``deadline=None`` because JVM warmup skews wall-times.
"""

from __future__ import annotations

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

SET = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# Small discrete domains force collisions (equal timestamps, shared
# keys, boundary hits) far more often than wide random ones would.
_keys = st.integers(min_value=0, max_value=2)
_ts = st.integers(min_value=0, max_value=20)
_vals = st.integers(min_value=-5, max_value=5)


@st.composite
def _asof_frames(draw):
    left = draw(
        st.lists(st.tuples(_keys, _ts), min_size=0, max_size=12, unique=True)
    )
    right = draw(
        st.lists(
            st.tuples(_keys, _ts, _vals), min_size=0, max_size=12,
            unique_by=lambda r: (r[0], r[1]),  # unique per (key, ts): the contract
        )
    )
    return left, right


@SET
@given(_asof_frames(), st.sampled_from(["backward", "forward"]))
def test_asof_join_matches_pandas_merge_asof(spark, frames, direction):
    left_rows, right_rows = frames
    if not left_rows:
        return
    sl = spark.createDataFrame(left_rows, "k long, ts long")
    sr = (
        spark.createDataFrame(right_rows, "k long, rts long, v long")
        if right_rows
        else spark.createDataFrame([], "k long, rts long, v long")
    )
    from data_pipelines_spark.operators.joins import asof_join

    got = {
        (r["k"], r["ts"]): r["v"]
        for r in asof_join(sl, sr, ["k"], "ts", "rts", ["v"], direction).collect()
    }

    pl = pd.DataFrame(left_rows, columns=["k", "ts"]).sort_values("ts")
    pr = pd.DataFrame(right_rows, columns=["k", "rts", "v"]).sort_values("rts")
    if pr.empty:
        pr = pd.DataFrame({"k": pd.Series(dtype="int64"),
                           "rts": pd.Series(dtype="int64"),
                           "v": pd.Series(dtype="int64")})
    merged = pd.merge_asof(
        pl, pr, left_on="ts", right_on="rts", by="k", direction=direction
    )
    want = {
        (int(r.k), int(r.ts)): (None if pd.isna(r.v) else int(r.v))
        for r in merged.itertuples()
    }
    assert got == want


@st.composite
def _interval_frames(draw):
    points = draw(st.lists(st.tuples(st.integers(0, 50)), max_size=10))
    ivals = draw(
        st.lists(
            st.tuples(st.integers(0, 50), st.integers(-5, 60)),
            max_size=8,
        )
    )
    width = draw(st.sampled_from([1, 3, 7, 64]))
    return points, ivals, width


@SET
@given(_interval_frames())
def test_interval_join_matches_naive_between(spark, frames):
    point_rows, ival_rows, width = frames
    pts = (
        spark.createDataFrame([(i, p[0]) for i, p in enumerate(point_rows)],
                              "pid long, x long")
        if point_rows else spark.createDataFrame([], "pid long, x long")
    )
    ivs = (
        spark.createDataFrame(
            [(i, s, e) for i, (s, e) in enumerate(ival_rows)],
            "iid long, s long, e long",
        )
        if ival_rows else spark.createDataFrame([], "iid long, s long, e long")
    )
    from data_pipelines_spark.operators.joins import interval_join

    got = sorted(
        (r["pid"], r["iid"])
        for r in interval_join(
            pts, ivs, "x", "s", "e", bin_width=width,
            max_bins_per_interval=None,
        ).collect()
    )
    want = sorted(
        (pid, iid)
        for pid, (x,) in enumerate(point_rows)
        for iid, (s, e) in enumerate(ival_rows)
        if s <= x <= e
    )
    assert got == want


@st.composite
def _skew_frames(draw):
    fact = draw(st.lists(st.tuples(_keys, _vals), max_size=15))
    dim = draw(
        st.lists(st.tuples(_keys, st.integers(0, 9)), max_size=6,
                 unique_by=lambda r: r[0])
    )
    hot = draw(st.lists(_keys, max_size=3, unique=True))
    how = draw(st.sampled_from(["inner", "left", "left_semi", "left_anti"]))
    return fact, dim, hot, how


@SET
@given(_skew_frames())
def test_skew_split_join_equals_plain_join(spark, frames):
    from collections import Counter

    fact_rows, dim_rows, hot, how = frames
    fact = (
        spark.createDataFrame(fact_rows, "k long, v long")
        if fact_rows else spark.createDataFrame([], "k long, v long")
    )
    dim = (
        spark.createDataFrame(dim_rows, "k long, a long")
        if dim_rows else spark.createDataFrame([], "k long, a long")
    )
    from data_pipelines_spark.plans.skew import skew_split_join

    got = Counter(
        map(tuple, skew_split_join(fact, dim, ["k"], how=how, hot_keys=hot).collect())
    )
    want = Counter(map(tuple, fact.join(dim, ["k"], how).collect()))
    assert got == want


# --- duplicate_span_stats vs brute-force reference ---------------------

# Tiny alphabet + short docs force repeated n-grams and overlapping
# spans far more often than realistic text would.
_words = st.sampled_from(["a", "b", "c"])
_doc = st.lists(_words, min_size=0, max_size=14).map(" ".join)


@SET
@given(
    st.lists(_doc, min_size=1, max_size=8),
    st.integers(min_value=2, max_value=4),
)
def test_duplicate_span_stats_matches_bruteforce(spark, texts, n):
    from data_pipelines_spark.operators.dedup import duplicate_span_stats
    from tests.test_ranking import _py_dup_spans

    rows = list(enumerate(texts))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (
            r["n_dup_grams"],
            r["n_dup_spans"],
            r["dup_tokens"],
            r["dup_token_frac"],
        )
        for r in duplicate_span_stats(df, n=n).collect()
    }
    want = _py_dup_spans(rows, n)
    assert set(got) == set(want)
    for k, (a, b, c, frac) in want.items():
        assert got[k][:3] == (a, b, c), (k, texts, n)
        assert got[k][3] == pytest.approx(frac, abs=1e-9)
