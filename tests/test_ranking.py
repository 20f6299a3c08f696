"""Unit tests for the relevance-scoring tier (operators/ranking.py) and
the span-level exact-substring dedup (operators/dedup.py::
duplicate_span_stats) — both verified against independent pure-Python
re-implementations of the documented formulas.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from data_pipelines_spark.operators.dedup import duplicate_span_stats
from data_pipelines_spark.operators.ranking import bm25_scores, tf_idf

DOCS = [
    (0, "the cat sat on the mat"),
    (1, "the dog sat on the log"),
    (2, "a vector is a thing the cat likes"),
    (3, ""),
    (4, "cat cat cat cat"),
    (5, None),
]


def _docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def _py_bm25(texts, terms, k1=1.2, b=0.75):
    """Independent reference: same formula, same rounding contract."""
    toks = {i: (t or "").lower().split() for i, t in texts}
    n = len(toks)
    avgdl = sum(len(v) for v in toks.values()) / n
    df = {t: sum(1 for v in toks.values() if t in v) for t in terms}
    out = {}
    for i, v in toks.items():
        score = 0.0
        for t in terms:
            tf = v.count(t)
            if tf == 0:
                continue
            idf6 = round(math.log((n - df[t] + 0.5) / (df[t] + 0.5) + 1.0), 6)
            sat = tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * len(v) / avgdl))
            score += round(idf6 * sat, 6)
        out[i] = round(score, 6) if len(v) else 0.0
    return out


class TestBM25:
    def test_matches_reference(self, spark):
        got = {
            r["doc_id"]: r["bm25_score"]
            for r in bm25_scores(_docs_df(spark), ["the", "cat", "vector"]).collect()
        }
        want = _py_bm25([(i, t) for i, t in DOCS], ["the", "cat", "vector"])
        assert set(got) == set(want)
        for k in want:
            assert got[k] == pytest.approx(want[k], abs=2e-6), k

    def test_empty_and_null_docs_score_zero(self, spark):
        got = {
            r["doc_id"]: r["bm25_score"]
            for r in bm25_scores(_docs_df(spark), ["cat"]).collect()
        }
        assert got[3] == 0.0
        assert got[5] == 0.0

    def test_absent_term_contributes_nothing(self, spark):
        base = {
            r["doc_id"]: r["bm25_score"]
            for r in bm25_scores(_docs_df(spark), ["cat"]).collect()
        }
        extended = {
            r["doc_id"]: r["bm25_score"]
            for r in bm25_scores(_docs_df(spark), ["cat", "zzzznope"]).collect()
        }
        assert base == extended

    def test_term_saturation_monotone(self, spark):
        # doc 4 repeats 'cat' 4x: higher score than single-occurrence
        # docs, but far less than 4x (saturation).
        got = {
            r["doc_id"]: r["bm25_score"]
            for r in bm25_scores(_docs_df(spark), ["cat"]).collect()
        }
        assert got[4] > got[0] > 0
        assert got[4] < 4 * got[0]

    def test_rejects_bad_queries(self, spark):
        with pytest.raises(ValueError):
            bm25_scores(_docs_df(spark), [])
        with pytest.raises(ValueError):
            bm25_scores(_docs_df(spark), ["a", "a"])


class TestTfIdf:
    def test_matches_reference(self, spark):
        rows = tf_idf(_docs_df(spark)).collect()
        toks = {i: (t or "").lower().split() for i, t in DOCS}
        n = len(DOCS)
        for r in rows:
            v = toks[r["doc_id"]]
            tf = v.count(r["token"])
            df = sum(1 for w in toks.values() if r["token"] in w)
            assert r["tf"] == tf
            assert r["df"] == df
            idf6 = round(math.log((n + 1) / (df + 1)) + 1, 6)
            assert r["tfidf"] == pytest.approx(
                round(tf / len(v) * idf6, 6), abs=2e-6
            )

    def test_empty_docs_emit_no_rows(self, spark):
        ids = {r["doc_id"] for r in tf_idf(_docs_df(spark)).collect()}
        assert 3 not in ids and 5 not in ids

    def test_min_df_drops_rare_tokens_after_df(self, spark):
        rows = tf_idf(_docs_df(spark), min_df=2).collect()
        assert rows, "common tokens must survive"
        assert all(r["df"] >= 2 for r in rows)
        # df semantics unchanged: 'the' appears in 3 docs regardless
        the = [r for r in rows if r["token"] == "the"]
        assert the and all(r["df"] == 3 for r in the)


def _py_dup_spans(texts, n, min_count=2):
    """Independent reference for duplicate_span_stats."""
    toks = {i: (t or "").lower().split() for i, t in texts}
    grams = {}  # gram -> count over all positions
    pos = {}  # doc -> [positions of its grams]
    gram_at = {}
    for i, v in toks.items():
        gram_at[i] = [
            " ".join(v[p : p + n]) for p in range(len(v) - n + 1)
        ]
        for g in gram_at[i]:
            grams[g] = grams.get(g, 0) + 1
    out = {}
    for i, v in toks.items():
        dup_pos = [p for p, g in enumerate(gram_at[i]) if grams[g] >= min_count]
        spans = []
        for p in dup_pos:
            if spans and p - spans[-1][1] <= n:
                spans[-1] = (spans[-1][0], p, spans[-1][2] + 1)
            else:
                spans.append((p, p, 1))
        covered = sum(e - s + n for s, e, _ in spans)
        out[i] = (
            len(dup_pos),
            len(spans),
            covered,
            round(covered / max(len(v), 1), 6),
        )
    return out


SPAN_DOCS = [
    (0, "alpha beta gamma delta epsilon zeta eta theta"),
    (1, "x alpha beta gamma delta epsilon zeta eta y"),  # shares a 7-run
    (2, "p q r s t u v w"),
    (3, "rep rep rep rep rep rep"),  # within-doc repetition
    (4, "short"),
    (5, ""),
    (6, None),
]


class TestDuplicateSpans:
    def test_matches_reference(self, spark):
        df = spark.createDataFrame(SPAN_DOCS, "doc_id long, text string")
        got = {
            r["doc_id"]: (
                r["n_dup_grams"],
                r["n_dup_spans"],
                r["dup_tokens"],
                r["dup_token_frac"],
            )
            for r in duplicate_span_stats(df, n=3).collect()
        }
        want = _py_dup_spans(SPAN_DOCS, 3)
        assert got == {
            k: (a, b, c, pytest.approx(d, abs=1e-9)) for k, (a, b, c, d) in want.items()
        }

    def test_every_doc_gets_a_row(self, spark):
        df = spark.createDataFrame(SPAN_DOCS, "doc_id long, text string")
        out = duplicate_span_stats(df, n=3).collect()
        assert {r["doc_id"] for r in out} == {i for i, _ in SPAN_DOCS}
        by_id = {r["doc_id"]: r for r in out}
        for short_id in (4, 5, 6):
            r = by_id[short_id]
            assert (r["n_dup_grams"], r["n_dup_spans"], r["dup_tokens"]) == (0, 0, 0)
            assert r["dup_token_frac"] == 0.0

    def test_overlapping_spans_merge(self, spark):
        # 'a b c' and 'c a b' both repeat; their positions in doc 0
        # overlap within the n-window, so they form ONE span.
        docs = [
            (0, "a b c a b c z z z"),
            (1, "a b c q q q c a b"),
        ]
        df = spark.createDataFrame(docs, "doc_id long, text string")
        got = {
            r["doc_id"]: (r["n_dup_spans"], r["dup_tokens"])
            for r in duplicate_span_stats(df, n=3).collect()
        }
        want = _py_dup_spans(docs, 3)
        assert got == {k: (b, c) for k, (_, b, c, _) in want.items()}

    def test_hash_grams_equivalent(self, spark):
        df = spark.createDataFrame(SPAN_DOCS, "doc_id long, text string")
        a = sorted(map(tuple, duplicate_span_stats(df, n=3).collect()))
        b = sorted(
            map(tuple, duplicate_span_stats(df, n=3, hash_grams=True).collect())
        )
        assert a == b

    def test_no_duplicates_all_zero(self, spark):
        df = spark.createDataFrame(
            [(0, "one two three four"), (1, "five six seven eight")],
            "doc_id long, text string",
        )
        out = duplicate_span_stats(df, n=2).collect()
        assert all(r["n_dup_grams"] == 0 for r in out)


class TestRemoveDuplicateSpans:
    def _run(self, spark, docs, **kw):
        from data_pipelines_spark.operators.dedup import remove_duplicate_spans

        df = spark.createDataFrame(docs, "doc_id long, text string")
        return {
            r["doc_id"]: (r["clean_text"], r["n_tokens"], r["n_removed_tokens"])
            for r in remove_duplicate_spans(df, **kw).collect()
        }

    def test_keep_first_keeps_exactly_one_copy(self, spark):
        shared = "alpha beta gamma delta"
        docs = [
            (0, f"{shared} unique zero tail"),
            (1, f"one head {shared}"),
            (2, "totally different words here now"),
        ]
        got = self._run(spark, docs, n=4)
        # doc 0 holds the canonical (min doc, pos) occurrence -> intact
        assert got[0] == (docs[0][1], 7, 0)
        # doc 1's copy is cut, its own words survive
        assert got[1] == ("one head", 6, 4)
        assert got[2] == (docs[2][1], 5, 0)

    def test_keep_first_false_cuts_every_copy(self, spark):
        shared = "alpha beta gamma delta"
        docs = [(0, f"{shared} x y z"), (1, f"p q {shared}")]
        got = self._run(spark, docs, n=4, keep_first=False)
        assert got[0] == ("x y z", 7, 4)
        assert got[1] == ("p q", 6, 4)

    def test_within_doc_repetition_keeps_first(self, spark):
        docs = [(0, "a b c d STOP a b c d")]
        got = self._run(spark, docs, n=4)
        assert got[0] == ("a b c d stop", 9, 4)

    def test_no_duplicates_roundtrips(self, spark):
        docs = [(0, "one two three"), (1, ""), (2, None)]
        got = self._run(spark, docs, n=2)
        assert got[0] == ("one two three", 3, 0)
        assert got[1] == ("", 0, 0)
        assert got[2] == ("", 0, 0)

    def test_consistent_with_span_stats_when_cutting_all(self, spark):
        from data_pipelines_spark.operators.dedup import duplicate_span_stats

        docs = [
            (i, t)
            for i, t in enumerate(
                ["u v w x y z u v w x", "m n o p q r m n o p", "u v w x f g h i j k"]
            )
        ]
        df = spark.createDataFrame(docs, "doc_id long, text string")
        stats = {
            r["doc_id"]: r["dup_tokens"]
            for r in duplicate_span_stats(df, n=3).collect()
        }
        removed = self._run(spark, docs, n=3, keep_first=False)
        for i in stats:
            assert removed[i][2] == stats[i]


def test_fused_report_equals_standalone_operators(spark):
    from data_pipelines_spark.operators.dedup import (
        duplicate_span_report,
        duplicate_span_stats,
        remove_duplicate_spans,
    )

    docs = SPAN_DOCS + [(7, "alpha beta gamma delta epsilon zeta eta x y z")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    fused = {
        r["doc_id"]: tuple(r)[1:]
        for r in duplicate_span_report(df, n=3).collect()
    }
    stats = {r["doc_id"]: r for r in duplicate_span_stats(df, n=3).collect()}
    removed = {
        r["doc_id"]: r for r in remove_duplicate_spans(df, n=3).collect()
    }
    for i, _ in docs:
        s, rm = stats[i], removed[i]
        assert fused[i] == (
            s["n_dup_grams"], s["n_dup_spans"], s["dup_tokens"],
            s["dup_token_frac"], rm["clean_text"], rm["n_tokens"],
            rm["n_removed_tokens"],
        ), i


class TestReciprocalRankFusion:
    """RRF hybrid fusion (operators/ranking.py): the textbook formula
    on a hand-computed case, consensus dominance, top_n, and
    partition-invariant determinism."""

    def _lists(self, spark):
        # query q: list A ranks [d1, d2, d3]; list B ranks [d2, d4]
        a = spark.createDataFrame(
            [("q", "d1", 1), ("q", "d2", 2), ("q", "d3", 3)],
            "qid string, doc string, rank int",
        )
        b = spark.createDataFrame(
            [("q", "d2", 1), ("q", "d4", 2)],
            "qid string, doc string, rank int",
        )
        return a, b

    def test_hand_computed_scores(self, spark):
        from data_pipelines_spark.operators.ranking import (
            reciprocal_rank_fusion,
        )

        a, b = self._lists(spark)
        rows = {
            r["doc"]: r
            for r in reciprocal_rank_fusion(
                [a, b], ["qid"], ["doc"], k=60
            ).collect()
        }
        # d2 appears in both lists: 1/62 + 1/61 — the consensus winner
        # over d1's single 1/61.
        assert rows["d2"]["rank"] == 1 and rows["d2"]["n_lists"] == 2
        assert rows["d1"]["rank"] == 2
        assert rows["d4"]["rank"] == 3  # 1/62 beats d3's 1/63
        assert rows["d3"]["rank"] == 4
        assert abs(rows["d2"]["rrf_score"] - (1 / 62 + 1 / 61)) < 1e-12
        assert abs(rows["d1"]["rrf_score"] - 1 / 61) < 1e-12

    def test_top_n_and_tie_break(self, spark):
        from data_pipelines_spark.operators.ranking import (
            reciprocal_rank_fusion,
        )

        # two docs with identical single-list rank → tie broken by id
        a = spark.createDataFrame(
            [("q", "z", 1)], "qid string, doc string, rank int"
        )
        b = spark.createDataFrame(
            [("q", "a", 1)], "qid string, doc string, rank int"
        )
        rows = reciprocal_rank_fusion(
            [a, b], ["qid"], ["doc"], top_n=1
        ).collect()
        assert len(rows) == 1
        assert rows[0]["doc"] == "a"  # equal score, id ascending

    def test_partition_invariance(self, spark):
        from data_pipelines_spark.operators.ranking import (
            reciprocal_rank_fusion,
        )

        a, b = self._lists(spark)
        one = reciprocal_rank_fusion(
            [a.repartition(1), b.repartition(1)], ["qid"], ["doc"]
        )
        many = reciprocal_rank_fusion(
            [a.repartition(7), b.repartition(5)], ["qid"], ["doc"]
        )
        assert one.exceptAll(many).count() == 0
        assert many.exceptAll(one).count() == 0

    def test_validation(self, spark):
        import pytest

        from data_pipelines_spark.operators.ranking import (
            reciprocal_rank_fusion,
        )

        with pytest.raises(ValueError, match="at least one"):
            reciprocal_rank_fusion([], ["q"], ["d"])
        a, _ = self._lists(spark)
        with pytest.raises(ValueError, match="k must be positive"):
            reciprocal_rank_fusion([a], ["qid"], ["doc"], k=0)
