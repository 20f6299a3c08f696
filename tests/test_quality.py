"""Data-quality validation (operators/quality.py): fused row rules,
uniqueness, referential integrity, and the combined report."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from data_pipelines_spark.operators.quality import (
    accepted_values,
    check_foreign_key,
    check_rows,
    check_unique,
    expect,
    in_range,
    not_null,
    validate,
)


def _facts(spark):
    return spark.createDataFrame(
        [
            Row(k=1, grade="A", score=0.5, ref=10),
            Row(k=2, grade="B", score=1.5, ref=20),   # score out of range
            Row(k=2, grade="C", score=0.9, ref=99),   # dup key + orphan ref
            Row(k=3, grade="Z", score=None, ref=None),  # bad grade, null score
        ]
    )


def test_row_rules_fused_single_pass(spark):
    df = _facts(spark)
    rules = [
        not_null("score"),
        in_range("score", 0.0, 1.0),
        accepted_values("grade", ["A", "B", "C"]),
        expect("ref_even", (F.col("ref") % 2 == 0)),
    ]
    rep = {r.rule: (r.violations, r.total, r.passed)
           for r in check_rows(df, rules).collect()}
    assert rep["not_null:score"] == (1, 4, False)
    # NULL score passes the range rule (null-tolerant; not-null owns nulls)
    assert rep["in_range:score[0.0,1.0]"] == (1, 4, False)
    assert rep["accepted:grade"] == (1, 4, False)
    assert rep["ref_even"] == (2, 4, False)  # 99 odd + NULL counts
    # one aggregation pass: a single scan in the plan
    plan = (
        check_rows(df, rules)._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Scan ") <= 1


def test_unique_and_foreign_key(spark):
    df = _facts(spark)
    u = check_unique(df, ["k"]).first()
    assert (u.violations, u.total, u.passed) == (2, 4, False)

    dim = spark.createDataFrame([Row(id=10), Row(id=20)])
    fk = check_foreign_key(df, ["ref"], dim, ["id"]).first()
    # NULL ref is not an orphan; 99 is
    assert (fk.violations, fk.passed) == (1, False)


def test_validate_combined_report(spark):
    df = _facts(spark)
    dim = spark.createDataFrame([Row(id=10), Row(id=20), Row(id=99)])
    rep = validate(
        df,
        row_rules=[not_null("grade")],
        unique_keys=[["k"]],
        foreign_keys=[(["ref"], dim, ["id"])],
    )
    rows = {r.rule: r.passed for r in rep.collect()}
    assert rows == {
        "not_null:grade": True,
        "unique:k": False,
        "foreign_key:ref": True,
    }


def test_profile_numeric_one_pass(spark):
    from data_pipelines_spark.operators.quality import profile_numeric

    df = spark.createDataFrame(
        [Row(a=float(i), b=(None if i % 2 else float(i * 10))) for i in range(1, 6)]
    )
    prof = {r.column: r for r in profile_numeric(df, ["a", "b"]).collect()}
    a = prof["a"]
    assert (a.n, a.n_null, a.min, a.max, a.mean, a.p50) == (5, 0, 1.0, 5.0, 3.0, 3.0)
    assert a.p25 == 2.0 and a.p75 == 4.0
    b = prof["b"]
    assert (b.n, b.n_null, b.min, b.max) == (5, 3, 20.0, 40.0)
    plan = profile_numeric(df, ["a", "b"])._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan ") <= 1


def test_check_rows_empty_table_is_clean(spark):
    """Empty-but-clean table: violations must be 0 / passed True, never
    NULL (sum over zero rows is NULL without the coalesce)."""
    df = spark.createDataFrame([], "k int, score double")
    rows = check_rows(df, [not_null("score"), in_range("score", 0.0, 1.0)]).collect()
    assert len(rows) == 2
    for r in rows:
        assert r.violations == 0 and r.total == 0 and r.passed is True


def test_check_foreign_key_composite_null_semantics(spark):
    """SQL simple-match semantics for composite keys: any null
    component exempts the row; only fully non-null keys are checked."""
    fact = spark.createDataFrame(
        [Row(a=1, b=None), Row(a=None, b=1), Row(a=1, b=1), Row(a=2, b=2)]
    )
    dim = spark.createDataFrame([Row(a=1, b=1)])
    fk = check_foreign_key(fact, ["a", "b"], dim).first()
    # (1,NULL) and (NULL,1) exempt; (1,1) matches; (2,2) is the only orphan
    assert (fk.violations, fk.total, fk.passed) == (1, 4, False)


def test_profile_numeric_default_is_sketch(spark):
    """Default quartiles are approx_percentile (bounded-memory sketch);
    exact=True opts into the exact buffer."""
    from data_pipelines_spark.operators.quality import profile_numeric

    df = spark.createDataFrame([Row(a=float(i)) for i in range(1, 101)])
    plan_default = (
        profile_numeric(df, ["a"])._jdf.queryExecution().executedPlan().toString()
    )
    assert "approx_percentile" in plan_default
    plan_exact = (
        profile_numeric(df, ["a"], exact=True)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "approx_percentile" not in plan_exact and "percentile" in plan_exact
    # both agree on this smooth distribution
    d = profile_numeric(df, ["a"]).first()
    e = profile_numeric(df, ["a"], exact=True).first()
    assert abs(d.p50 - e.p50) <= 1.0 and d.min == e.min and d.max == e.max

    empty = spark.createDataFrame([], "a double")
    p = profile_numeric(empty, ["a"]).first()
    assert (p.n, p.n_null) == (0, 0)


class TestProfileCategorical:
    def test_top_values_share_and_nulls(self, spark):
        from data_pipelines_spark.operators.quality import profile_categorical

        rows = [("a",)] * 5 + [("b",)] * 3 + [(None,)] * 2 + [("c",)] * 1
        df = spark.createDataFrame(rows, "x string")
        got = {
            (r["column"], r["value"]): (r["cnt"], r["frac"], r["n_distinct"], r["rank"])
            for r in profile_categorical(df, ["x"], top_k=3).collect()
        }
        assert got[("x", "a")] == (5, 0.454545, 4, 1)
        assert got[("x", "b")] == (3, 0.272727, 4, 2)
        assert got[("x", None)] == (2, 0.181818, 4, 3)  # NULL is a value
        assert ("x", "c") not in got  # cut by top_k

    def test_multi_column_and_casts(self, spark):
        from data_pipelines_spark.operators.quality import profile_categorical

        df = spark.createDataFrame(
            [(1, "x"), (1, "y"), (2, "y")], "k long, s string"
        )
        out = profile_categorical(df, ["k", "s"], top_k=2).collect()
        cols = {r["column"] for r in out}
        assert cols == {"k", "s"}
        k1 = [r for r in out if r["column"] == "k" and r["value"] == "1"][0]
        assert k1["cnt"] == 2 and k1["rank"] == 1

    def test_empty_and_guards(self, spark):
        import pytest as _pytest

        from data_pipelines_spark.operators.quality import profile_categorical

        empty = spark.createDataFrame([], "x string")
        assert profile_categorical(empty, ["x"]).count() == 0
        with _pytest.raises(ValueError, match="top_k"):
            profile_categorical(empty, ["x"], top_k=0)
        with _pytest.raises(ValueError, match="columns"):
            profile_categorical(empty, [])
