"""Corpus-curation operators: vocabulary, stratified sampling,
decontamination, PII, repetition signals."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_pipelines_spark.functions.text import (
    duplicate_line_fraction,
    email_count,
    phone_count,
    redact_pii,
    top_ngram_fraction,
)
from data_pipelines_spark.operators.corpus import (
    contamination_check,
    decontaminate,
    stratified_sample,
    vocabulary_stats,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, source string, text string")


def test_vocabulary_stats_counts_and_rank(spark):
    docs = _docs(
        spark,
        [
            (1, "a", "the cat sat"),
            (2, "a", "the dog sat on the mat"),
            (3, "b", "cat"),
        ],
    )
    out = {r["token"]: (r["token_cnt"], r["doc_cnt"], r["rank"]) for r in
           vocabulary_stats(docs).collect()}
    assert out["the"] == (3, 2, 1)        # 3 occurrences across 2 docs
    assert out["cat"][0] == 2 and out["cat"][1] == 2
    assert out["sat"][0] == 2
    top2 = vocabulary_stats(docs, top_k=2).collect()
    assert [r["token"] for r in top2] == ["the", "cat"]  # tie: cat < sat


def test_stratified_sample_deterministic_and_rate(spark):
    docs = _docs(spark, [(i, "crawl" if i % 2 else "books", f"doc {i}")
                         for i in range(2000)])
    out = stratified_sample(docs, {"books": 1.0, "crawl": 0.25})
    a = sorted(r["doc_id"] for r in out.collect())
    b = sorted(r["doc_id"] for r in out.collect())
    assert a == b                                   # reproducible
    books = [i for i in a if i % 2 == 0]
    crawl = [i for i in a if i % 2 == 1]
    assert len(books) == 1000                       # rate 1.0 keeps all
    assert 150 <= len(crawl) <= 350                 # ~25% of 1000
    # unlisted strata default to dropped
    extra = _docs(spark, [(9999, "forum", "x")])
    assert stratified_sample(extra, {"books": 1.0}).count() == 0


def test_contamination_check_and_decontaminate(spark):
    bench = spark.createDataFrame(
        [(1, "what is the capital of france paris is the answer",)],
        "qid long, text string",
    )
    leak = "trivia: what is the capital of france paris is the answer ok"
    docs = _docs(
        spark,
        [
            (1, "a", leak),                          # contains the 8-gram
            (2, "a", "an innocent document about cats and dogs playing"),
        ],
    )
    flagged = contamination_check(docs, bench, ngram_n=8).collect()
    assert [r["doc_id"] for r in flagged] == [1]
    assert flagged[0]["matched_ngrams"] >= 1
    clean = decontaminate(docs, bench, ngram_n=8)
    assert [r["doc_id"] for r in clean.collect()] == [2]


def test_contamination_bloom_prefilter_equals_exact(spark):
    """prefilter='bloom' must reproduce the broadcast-exact mode
    row-for-row on real corpus text (false positives are re-verified,
    false negatives are impossible), with and without a static
    benchmark-size estimate."""
    import os

    from data_pipelines_spark.sources.tables import load_table

    sf_dir = os.environ.get("SPARK_GRAFT_T2_DIR", "/root/testdata/sf0.01")
    docs = load_table(spark, sf_dir, "documents")
    bench = docs.where(F.col("doc_id") < 20)
    corpus = docs.where(F.col("doc_id") >= 20)
    want = sorted(
        map(tuple, contamination_check(corpus, bench, ngram_n=8).collect())
    )
    assert want  # the synthetic corpus genuinely contains leaks
    for est in (None, 50_000):
        got = sorted(
            map(
                tuple,
                contamination_check(
                    corpus, bench, ngram_n=8, prefilter="bloom", bench_ngrams=est
                ).collect(),
            )
        )
        assert got == want, f"bench_ngrams={est}"
    import pytest as _pytest

    with _pytest.raises(ValueError, match="prefilter"):
        contamination_check(corpus, bench, prefilter="nope")


def test_filter_by_group_quantile(spark):
    """Per-group decile filter vs DuckDB's quantile_cont ground truth
    (exact mode); approx mode must agree on this small input; NULL
    scores never pass."""
    import duckdb

    from data_pipelines_spark.operators.corpus import filter_by_group_quantile

    rows = [(i, "a" if i < 40 else "b", float(i % 20) if i % 7 else None)
            for i in range(60)]
    df = spark.createDataFrame(rows, "doc_id long, source string, score double")
    con = duckdb.connect()
    con.execute("CREATE TABLE t (doc_id BIGINT, source VARCHAR, score DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?, ?, ?)", rows)
    want = sorted(
        r[0] for r in con.execute("""
        SELECT doc_id FROM t
        WHERE score >= (SELECT quantile_cont(score, 0.25)
                        FROM t t2 WHERE t2.source = t.source)
        """).fetchall()
    )
    for exact in (True, False):
        got = sorted(
            r.doc_id
            for r in filter_by_group_quantile(
                df, "score", ["source"], q=0.25, keep="above", exact=exact
            ).collect()
        )
        assert got == want, f"exact={exact}"
    # global (no groups) + keep='below'
    lo = filter_by_group_quantile(df, "score", q=0.5, keep="below", exact=True)
    want_lo = sorted(
        r[0] for r in con.execute(
            "SELECT doc_id FROM t WHERE score <= "
            "(SELECT quantile_cont(score, 0.5) FROM t)"
        ).fetchall()
    )
    assert sorted(r.doc_id for r in lo.collect()) == want_lo
    # NULL scores are always dropped
    assert not [r for r in lo.collect() if r.score is None]
    import pytest as _pytest

    with _pytest.raises(ValueError, match="keep"):
        filter_by_group_quantile(df, "score", keep="sideways")


def test_pii_counts_and_redaction(spark):
    df = spark.createDataFrame(
        [(1, "mail me at jo.doe+x@site.org or call 555-123-4567 today")],
        "doc_id long, text string",
    )
    row = df.select(
        email_count(F.col("text")).alias("e"),
        phone_count(F.col("text")).alias("p"),
        redact_pii(F.col("text")).alias("r"),
    ).first()
    assert row["e"] == 1 and row["p"] == 1
    assert "<EMAIL>" in row["r"] and "<PHONE>" in row["r"]
    assert "site.org" not in row["r"] and "4567" not in row["r"]


def test_repetition_signals(spark):
    boiler = "menu\nhome\nmenu\nhome\nmenu"       # 3 of 5 lines repeat
    clean = "a\nb\nc"
    spammy = "buy now buy now buy now buy now"     # top bigram dominates
    df = spark.createDataFrame(
        [(1, boiler), (2, clean), (3, spammy), (4, ""), (5, "one")],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: (r["dl"], r["tb"])
        for r in df.select(
            "doc_id",
            F.round(duplicate_line_fraction(F.col("text")), 4).alias("dl"),
            F.round(top_ngram_fraction(F.col("text"), 2), 4).alias("tb"),
        ).collect()
    }
    assert out[1][0] == 0.6                        # 3/5 duplicate lines
    assert out[2][0] == 0.0
    # "buy now"*4 + "now buy"*3 over 7 bigrams → 4/7
    assert abs(out[3][1] - 4 / 7) < 1e-3
    assert out[4] == (0.0, 0.0) and out[5] == (0.0, 0.0)


def test_global_rank_matches_naive_window(spark):
    """Two-phase global_rank must produce exactly the naive global
    window's ranks (it relies on Spark reusing the one range exchange
    for both the local-rank and offset branches)."""
    from pyspark.sql import Window

    from data_pipelines_spark.plans.windows import global_rank

    df = spark.range(0, 5000).select(
        F.col("id"), (F.col("id") % 97).alias("v")
    )
    order = [F.desc("v"), F.asc("id")]
    got = {
        r["id"]: r["rank"]
        for r in global_rank(df, order).collect()
    }
    want = {
        r["id"]: r["rank"]
        for r in df.withColumn(
            "rank", F.row_number().over(Window.orderBy(*order)).cast("long")
        ).collect()
    }
    assert got == want


def test_vocabulary_stats_unbounded_has_no_global_sort(spark):
    """top_k=None must not funnel the vocabulary through a single-
    partition sort: the only SinglePartition exchange allowed in the
    plan is the partition-count-sized offset aggregate."""
    docs = _docs(spark, [(i, "s", f"tok{i % 7} tok{i % 3}") for i in range(50)])
    out = vocabulary_stats(docs)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the distributed two-phase scheme is present: since the round-7
    # determinism fix the range exchange materializes once behind a
    # localCheckpoint, so the outer plan shows the checkpointed scan
    # carrying the synthetic partition id rather than the exchange node
    assert "__pid" in plan and "existingrdd" in plan.lower()
    # ...and no row-level window runs without partition columns (a bare
    # windowspecdefinition(... ORDER) would mean a global sort of the
    # vocabulary; the offsets window partitions nothing but only ever
    # sees one row per shuffle partition)
    got = {r["token"]: r["rank"] for r in out.collect()}
    assert got["tok0"] == 1  # most frequent token ranks first


def test_portable_sampling_matches_rate_and_is_stable(spark):
    from data_pipelines_spark.operators.corpus import stratified_sample

    docs = _docs(spark, [(i, "crawl", f"doc {i}") for i in range(2000)])
    out = stratified_sample(docs, {"crawl": 0.25}, portable=True)
    a = sorted(r["doc_id"] for r in out.collect())
    assert a == sorted(r["doc_id"] for r in out.collect())
    assert 400 <= len(a) <= 600  # ~25% of 2000


def test_boilerplate_line_removal(spark):
    """Lines shared by >=2 docs are stripped; unique lines keep their
    original order; all-boilerplate and empty docs come back empty."""
    from data_pipelines_spark.operators.corpus import remove_boilerplate_lines

    banner = "accept cookies to continue"
    nav = "home | about | contact"
    docs = _docs(
        spark,
        [
            (1, "a", f"{banner}\nunique first line\n{nav}\nunique second"),
            (2, "a", f"{banner}\nanother doc body\n{nav}"),
            (3, "b", f"{banner}\n{nav}"),          # all boilerplate
            (4, "b", "totally unique document"),
            (5, "b", "   \n  \n"),                  # no non-empty lines
        ],
    )
    out = {r["doc_id"]: r for r in remove_boilerplate_lines(docs).collect()}
    assert out[1]["clean_text"] == "unique first line\nunique second"
    assert (out[1]["n_lines"], out[1]["n_boiler_lines"]) == (4, 2)
    assert out[2]["clean_text"] == "another doc body"
    assert out[3]["clean_text"] == "" and out[3]["n_boiler_lines"] == 2
    assert out[4]["clean_text"] == "totally unique document"
    assert out[4]["n_boiler_lines"] == 0
    assert out[5]["clean_text"] == "" and out[5]["n_lines"] == 0
    assert set(out) == {1, 2, 3, 4, 5}


def test_boilerplate_counts_distinct_docs_not_occurrences(spark):
    """A line repeated many times inside ONE doc is not boilerplate."""
    from data_pipelines_spark.operators.corpus import boilerplate_lines

    docs = _docs(
        spark,
        [
            (1, "a", "echo\necho\necho\necho"),
            (2, "a", "body text"),
        ],
    )
    assert boilerplate_lines(docs).count() == 0


def test_gopher_rules_pass_and_fail(spark):
    from data_pipelines_spark.functions.text import (
        alpha_word_fraction,
        bullet_line_fraction,
        ellipsis_line_fraction,
        mean_word_length,
        passes_gopher_rules,
        symbol_word_ratio,
    )

    good = " ".join(
        ["the quick brown fox jumps over the lazy dog with great energy"] * 6
    )
    too_short = "the cat sat"
    symbol_heavy = " ".join(["word ###"] * 40)
    no_alpha = " ".join(["12345 67890"] * 40)
    bullets = "\n".join(["- item one here"] * 10)
    rows = [
        (1, good),
        (2, too_short),
        (3, symbol_heavy),
        (4, no_alpha),
        (5, bullets),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    t = F.col("text")
    got = {
        r["doc_id"]: r
        for r in df.select(
            "doc_id",
            passes_gopher_rules(t).alias("ok"),
            mean_word_length(t).alias("mwl"),
            alpha_word_fraction(t).alias("alpha"),
            symbol_word_ratio(t).alias("sym"),
            bullet_line_fraction(t).alias("bullet"),
            ellipsis_line_fraction(t).alias("ell"),
        ).collect()
    }
    assert got[1]["ok"] is True
    assert got[2]["ok"] is False          # < 50 words
    assert got[3]["ok"] is False and got[3]["sym"] > 0.1
    assert got[4]["ok"] is False and got[4]["alpha"] == 0.0
    assert got[5]["ok"] is False and got[5]["bullet"] == 1.0
    # spot-check the raw signals against hand arithmetic
    assert abs(got[2]["mwl"] - 9 / 3) < 1e-9
    assert got[1]["ell"] == 0.0


def test_ellipsis_line_fraction(spark):
    from data_pipelines_spark.functions.text import ellipsis_line_fraction

    df = spark.createDataFrame(
        [(1, "read more...\nfull line here\ntruncated again…\nanother full")],
        "doc_id long, text string",
    )
    val = df.select(ellipsis_line_fraction(F.col("text")).alias("f")).first()["f"]
    assert abs(val - 0.5) < 1e-9


def test_grouped_running_sum_matches_naive_window(spark):
    from pyspark.sql import Window

    from data_pipelines_spark.plans.windows import grouped_running_sum

    rows = [(i, f"s{i % 3}", (i * 7919) % 50 + 1) for i in range(500)]
    df = spark.createDataFrame(rows, "id long, grp string, v long").repartition(13)
    got = {
        r["id"]: r["cum"]
        for r in grouped_running_sum(
            df, ["grp"], [F.col("id").asc()], "v", alias="cum"
        ).collect()
    }
    w = (
        Window.partitionBy("grp")
        .orderBy("id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    want = {
        r["id"]: r["cum"]
        for r in df.withColumn(
            "cum", F.coalesce(F.sum("v").over(w), F.lit(0))
        ).collect()
    }
    assert got == want


def test_grouped_running_sum_keeps_null_group(spark):
    """Probe regression: the two-phase offset join-back was a plain
    equi join on the group key, so NULL-group rows vanished from the
    output (the filter_by_group_quantile NULL-group-loss class); the
    naive window they must match treats NULL as a real partition."""
    from data_pipelines_spark.plans.windows import grouped_running_sum

    rows = [(i, "a" if i < 3 else None, 10) for i in range(6)]
    df = spark.createDataFrame(rows, "id long, grp string, v long")
    got = sorted(
        [
            (r["grp"], r["id"], r["cum"])
            for r in grouped_running_sum(
                df, ["grp"], [F.col("id").asc()], "v", alias="cum"
            ).collect()
        ],
        key=repr,
    )
    want = sorted(
        [("a", 0, 0), ("a", 1, 10), ("a", 2, 20),
         (None, 3, 0), (None, 4, 10), (None, 5, 20)],
        key=repr,
    )
    assert got == want


def test_pack_sequences_layout(spark):
    from data_pipelines_spark.operators.corpus import pack_sequences

    # one stream, seq_len 10: docs of 4, 4, 5, 20, 1 tokens
    docs = spark.createDataFrame(
        [(1, "s", 4), (2, "s", 4), (3, "s", 5), (4, "s", 20), (5, "s", 1)],
        "doc_id long, source string, n_tokens long",
    )
    out = {
        r["doc_id"]: (r["seq_id"], r["seq_off"], r["seq_spans"])
        for r in pack_sequences(docs, 10).collect()
    }
    assert out[1] == (0, 0, 1)   # tokens 0-3
    assert out[2] == (0, 4, 1)   # tokens 4-7
    assert out[3] == (0, 8, 2)   # tokens 8-12: crosses the seq 0/1 boundary
    assert out[4] == (1, 3, 3)   # tokens 13-32: spans seqs 1,2,3
    assert out[5] == (3, 3, 1)   # token 33
    # zero-token doc occupies no space but gets a deterministic slot
    docs2 = spark.createDataFrame(
        [(1, "s", 10), (2, "s", 0), (3, "s", 2)],
        "doc_id long, source string, n_tokens long",
    )
    out2 = {
        r["doc_id"]: (r["seq_id"], r["seq_off"], r["seq_spans"])
        for r in pack_sequences(docs2, 10).collect()
    }
    assert out2[2] == (1, 0, 1)
    assert out2[3] == (1, 0, 1)


def test_pack_sequences_streams_are_independent(spark):
    from data_pipelines_spark.operators.corpus import pack_sequences

    docs = spark.createDataFrame(
        [(1, "a", 7), (2, "b", 7), (3, "a", 7), (4, "b", 7)],
        "doc_id long, source string, n_tokens long",
    )
    out = {
        r["doc_id"]: (r["seq_id"], r["seq_off"])
        for r in pack_sequences(docs, 10).collect()
    }
    # each stream packs from its own offset 0
    assert out[1] == (0, 0) and out[2] == (0, 0)
    assert out[3] == (0, 7) and out[4] == (0, 7)


def test_unigram_logprob_hand_computed(spark):
    import math

    from data_pipelines_spark.operators.corpus import unigram_logprob

    docs = _docs(spark, [(1, "s", "a a b"), (2, "s", "b c"), (3, "s", "  ")])
    out = {
        r["doc_id"]: (r["n_tokens"], r["lm_logprob10"])
        for r in unigram_logprob(docs).collect()
    }
    # corpus counts: a=2, b=2, c=1, total=5
    lp = {t: round(math.log10(c / 5), 6) for t, c in {"a": 2, "b": 2, "c": 1}.items()}
    assert out[1][0] == 3
    assert out[1][1] == round((2 * lp["a"] + lp["b"]) / 3, 6)
    assert out[2][1] == round((lp["b"] + lp["c"]) / 2, 6)
    assert 3 not in out  # blank doc has no tokens, no row
    # rarer token mix scores lower
    assert out[2][1] < out[1][1]


def test_pack_sequences_property(spark):
    """Property check over randomized corpora: packing is a bijection
    onto contiguous token space per stream (seeded random data, one
    Spark job per drawn corpus)."""
    import random

    from data_pipelines_spark.operators.corpus import pack_sequences

    rng = random.Random(42)
    examples = []
    for _ in range(6):
        n = rng.randint(1, 60)
        examples.append([
            (i, rng.choice("abc"), rng.randint(0, 400)) for i in range(n)
        ])

    seq_len = 128
    for rows in examples:
        df = spark.createDataFrame(
            rows, "doc_id long, source string, n_tokens long"
        ).repartition(5)
        out = pack_sequences(df, seq_len).collect()
        by_stream: dict = {}
        for r in out:
            by_stream.setdefault(r["source"], []).append(r)
        for stream_rows in by_stream.values():
            stream_rows.sort(key=lambda r: r["doc_id"])
            cum = 0
            for r in stream_rows:
                # reconstruct: every doc starts exactly at the running total
                assert r["seq_id"] == cum // seq_len
                assert r["seq_off"] == cum % seq_len
                end = cum + max(r["n_tokens"], 1) - 1
                assert r["seq_spans"] == end // seq_len - cum // seq_len + 1
                assert 0 <= r["seq_off"] < seq_len
                cum += r["n_tokens"]


def test_pack_sequences_plan_has_no_per_stream_window(spark):
    """Packing must scale past few-huge-streams: the executed plan's
    only full-row sort is the distributed range partitioning; the
    per-stream window runs within (shuffle partition, stream), never on
    a bare stream key."""
    docs = spark.createDataFrame(
        [(i, f"s{i % 2}", i % 40) for i in range(200)],
        "doc_id long, source string, n_tokens long",
    )
    from data_pipelines_spark.operators.corpus import pack_sequences

    plan = (
        pack_sequences(docs, 128)
        ._jdf.queryExecution().executedPlan().toString().lower()
    )
    # two-phase scheme present (range exchange pinned behind the
    # determinism localCheckpoint — see vocabulary_stats pin above)
    assert "__pid" in plan and "existingrdd" in plan
    # every window partition spec must include the synthetic partition
    # id, i.e. no window partitioned by the stream column alone
    import re

    for spec in re.findall(r"windowspecdefinition\(([^)]*)\)", plan):
        if "source" in spec:
            assert "__pid" in spec, spec


def test_let_binding_semantics(spark):
    """let() must be value-transparent: same result as inlining, for
    nulls, empties, nesting, and scalar/array values."""
    from data_pipelines_spark.functions.text import let

    df = spark.createDataFrame(
        [("a b c",), (None,), ("",)], "text string"
    )
    out = df.select(
        let(F.split(F.col("text"), " "),
            lambda toks: F.size(toks) + F.size(toks)).alias("twice_n"),
        let(F.lower(F.col("text")),
            lambda t: let(F.length(t), lambda n: n * 2)).alias("nested"),
        let(F.lit(5), lambda x: x + x).alias("scalar"),
    ).collect()
    by_idx = [(r["twice_n"], r["nested"], r["scalar"]) for r in out]
    assert by_idx[0] == (6, 10, 10)      # "a b c": 3 tokens, len 5
    assert by_idx[1] == (None, None, 10)  # null propagates through the binding
    assert by_idx[2] == (2, 0, 10)       # "" splits to [""]


def test_assign_splits_partition_invariant_and_exhaustive(spark):
    from data_pipelines_spark.operators.corpus import assign_splits

    docs = _docs(spark, [(i, "s", f"doc {i}") for i in range(3000)])
    out = assign_splits(docs, {"train": 0.8, "val": 0.1, "test": 0.1})
    rows = {r["doc_id"]: r["split"] for r in out.collect()}
    assert set(rows.values()) <= {"train", "val", "test"}
    # roughly proportional (hash-uniform; generous envelopes)
    n = len(rows)
    assert n == 3000
    train = sum(1 for v in rows.values() if v == "train")
    assert 0.72 * n <= train <= 0.88 * n
    # identical assignment after an arbitrary repartition (narrow map)
    rows2 = {
        r["doc_id"]: r["split"]
        for r in assign_splits(
            docs.repartition(13), {"train": 0.8, "val": 0.1, "test": 0.1}
        ).collect()
    }
    assert rows == rows2
    # portable twin flips the same coins as the SQL oracle path
    p1 = {r["doc_id"]: r["split"]
          for r in assign_splits(docs, {"a": 0.5, "b": 0.5},
                                 portable=True).collect()}
    p2 = {r["doc_id"]: r["split"]
          for r in assign_splits(docs.repartition(7), {"a": 0.5, "b": 0.5},
                                 portable=True).collect()}
    assert p1 == p2


def test_seeded_shuffle_is_reproducible_permutation(spark):
    from data_pipelines_spark.operators.corpus import seeded_shuffle

    docs = _docs(spark, [(i, "s", f"doc {i}") for i in range(500)])
    out = seeded_shuffle(docs)
    pos = {r["doc_id"]: r["shuffle_pos"] for r in out.collect()}
    # a permutation of 1..n
    assert sorted(pos.values()) == list(range(1, 501))
    # not the identity (hash order != id order)
    assert [pos[i] for i in range(500)] != list(range(1, 501))
    # reproducible across runs and partitionings
    pos2 = {
        r["doc_id"]: r["shuffle_pos"]
        for r in seeded_shuffle(docs.repartition(11)).collect()
    }
    assert pos == pos2
    # a different salt yields a different permutation
    pos3 = {
        r["doc_id"]: r["shuffle_pos"]
        for r in seeded_shuffle(docs, salt="epoch2").collect()
    }
    assert pos != pos3


def test_temperature_rates_alpha_one_is_identity(spark):
    from data_pipelines_spark.operators.corpus import temperature_rates

    docs = _docs(
        spark,
        [(i, f"s{i % 3}", "w " * (i % 5 + 1)) for i in range(90)],
    )
    rates = {
        r["source"]: r["rate"]
        for r in temperature_rates(docs, alpha=1.0).collect()
    }
    assert all(abs(v - 1.0) < 1e-9 for v in rates.values())


def test_temperature_rates_flatten_and_budget(spark):
    from data_pipelines_spark.operators.corpus import temperature_rates

    # 80 "big" docs vs 20 "small": alpha=0.5 upsamples the small stratum
    # (rate > 1), downsamples the big one (rate < 1), and preserves the
    # total budget sum(rate_i * n_i) = sum(n_i).
    docs = _docs(
        spark,
        [(i, "big" if i < 80 else "small", "doc") for i in range(100)],
    )
    out = {r["source"]: (r["n_weight"], r["rate"])
           for r in temperature_rates(docs, alpha=0.5).collect()}
    assert out["small"][1] > 1.0 > out["big"][1]
    budget = sum(n * r for n, r in out.values())
    assert abs(budget - 100.0) < 1e-3
    # alpha=0: uniform budget per stratum -> rate inversely proportional
    uni = {r["source"]: r["rate"]
           for r in temperature_rates(docs, alpha=0.0).collect()}
    assert abs(uni["big"] - 50.0 / 80.0) < 1e-6
    assert abs(uni["small"] - 50.0 / 20.0) < 1e-6


def test_temperature_upsample_copies_and_determinism(spark):
    from data_pipelines_spark.operators.corpus import (
        temperature_rates,
        temperature_upsample,
    )

    docs = _docs(
        spark,
        [(i, "big" if i < 80 else "small", "doc") for i in range(100)],
    )
    up = temperature_upsample(docs, alpha=0.5, portable=True)
    rows = up.collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r["copy_no"])
    # copy_no is 1..n_repeats per surviving doc
    for r in rows:
        assert sorted(by_doc[r["doc_id"]]) == list(range(1, r["n_repeats"] + 1))
    rates = {r["source"]: r["rate"]
             for r in temperature_rates(docs, alpha=0.5).collect()}
    # every n_repeats is floor(rate) or ceil(rate) of its stratum
    import math

    for r in rows:
        assert r["n_repeats"] in (
            math.floor(rates[r["source"]]),
            math.ceil(rates[r["source"]]),
        )
    # deterministic under repartitioning
    again = temperature_upsample(docs.repartition(7), alpha=0.5, portable=True)
    assert sorted((r["doc_id"], r["copy_no"]) for r in rows) == sorted(
        (r["doc_id"], r["copy_no"]) for r in again.collect()
    )
    # downsampled stratum lost docs; upsampled stratum gained copies
    n_big = sum(1 for r in rows if r["source"] == "big")
    n_small = sum(1 for r in rows if r["source"] == "small")
    assert n_big < 80 and n_small > 20


def test_group_quantile_filter_keeps_null_group(spark):
    """A NULL group is a real stratum: its rows must be filtered
    against their own cutoff (null-safe join-back), not silently
    dropped by a plain equi join."""
    from data_pipelines_spark.operators.corpus import filter_by_group_quantile

    df = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), ("a", 3.0), (None, 5.0), (None, 6.0)],
        "g string, v double",
    )
    out = {
        (r["g"], r["v"])
        for r in filter_by_group_quantile(
            df, "v", ["g"], q=0.5, keep="above", exact=True
        ).collect()
    }
    assert (None, 6.0) in out          # above its group's 5.5 cutoff
    assert (None, 5.0) not in out
    assert {p for p in out if p[0] == "a"} == {("a", 2.0), ("a", 3.0)}


def test_grouped_running_sum_preserves_double_type(spark):
    """Fractional running sums must come back as doubles — the old
    hardcoded long cast truncated them."""
    from pyspark.sql import Window

    from data_pipelines_spark.plans.windows import grouped_running_sum

    rows = [(i, f"s{i % 2}", (i % 7) + 0.5) for i in range(40)]
    df = spark.createDataFrame(rows, "id long, grp string, v double").repartition(5)
    out = grouped_running_sum(df, ["grp"], [F.col("id").asc()], "v", alias="cum")
    assert dict(out.dtypes)["cum"] == "double"
    got = {r["id"]: r["cum"] for r in out.collect()}
    w = (
        Window.partitionBy("grp")
        .orderBy("id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    want = {
        r["id"]: r["cum"]
        for r in df.withColumn(
            "cum", F.coalesce(F.sum("v").over(w), F.lit(0.0))
        ).collect()
    }
    assert got == want


def test_temperature_rates_zero_weight_stratum(spark):
    """A stratum whose docs all weigh 0 (empty after cleaning) gets
    rate 0 instead of aborting the query with ANSI DIVIDE_BY_ZERO
    (probed live on the unguarded expression); other strata's rates
    are unaffected by its presence."""
    from pyspark.sql import functions as F

    from data_pipelines_spark.operators.corpus import (
        temperature_rates,
        temperature_upsample,
    )

    with_empty = spark.createDataFrame(
        [(1, "a", 10), (2, "a", 20), (3, "b", 30), (4, "z", 0)],
        "doc_id long, source string, ntok long",
    )
    without = with_empty.where(F.col("source") != "z")
    r1 = {
        r["source"]: r["rate"]
        for r in temperature_rates(with_empty, weight_col=F.col("ntok")).collect()
    }
    r2 = {
        r["source"]: r["rate"]
        for r in temperature_rates(without, weight_col=F.col("ntok")).collect()
    }
    assert r1.pop("z") == 0.0
    assert r1 == r2
    # upsample: the zero-weight stratum draws no copies, query survives
    out = temperature_upsample(with_empty, weight_col=F.col("ntok"))
    assert out.where(F.col("source") == "z").count() == 0
    assert out.count() > 0

    # all-zero corpus: every rate 0, no rows drawn, no abort
    all_zero = spark.createDataFrame(
        [(1, "a", 0)], "doc_id long, source string, ntok long"
    )
    assert temperature_upsample(all_zero, weight_col=F.col("ntok")).count() == 0


class TestSampleExactK:
    def _docs(self, spark, per_group=(40, 7, 1)):
        rows = []
        i = 0
        for g, n in enumerate(per_group):
            for _ in range(n):
                rows.append((i, f"src{g}"))
                i += 1
        return spark.createDataFrame(rows, "doc_id long, source string")

    def test_exactly_k_per_group(self, spark):
        from data_pipelines_spark.operators.corpus import sample_exact_k

        out = sample_exact_k(self._docs(spark), 5, group_col="source")
        got = {
            r["source"]: r["count"]
            for r in out.groupBy("source").count().collect()
        }
        # min(k, n) per group: 5 of 40, 5 of 7, 1 of 1
        assert got == {"src0": 5, "src1": 5, "src2": 1}

    def test_selection_is_k_smallest_coins(self, spark):
        from pyspark.sql import functions as F

        from data_pipelines_spark.operators.corpus import (
            hash_fraction,
            sample_exact_k,
        )

        docs = self._docs(spark)
        out = {r["doc_id"] for r in sample_exact_k(docs, 5, group_col="source").collect()}
        # brute force: rank ALL rows by coin within group
        coins = docs.withColumn(
            "c",
            hash_fraction(
                F.concat_ws("/", F.col("source"), F.col("doc_id").cast("string")),
                "exactk",
            ),
        ).collect()
        want = set()
        by_g = {}
        for r in coins:
            by_g.setdefault(r["source"], []).append((r["c"], r["doc_id"]))
        for g, lst in by_g.items():
            want |= {i for _, i in sorted(lst)[:5]}
        assert out == want

    def test_partitioning_invariant(self, spark):
        from data_pipelines_spark.operators.corpus import sample_exact_k

        docs = self._docs(spark, per_group=(60,))
        a = {r["doc_id"] for r in sample_exact_k(docs, 10, group_col="source").collect()}
        b = {
            r["doc_id"]
            for r in sample_exact_k(
                docs.repartition(7), 10, group_col="source"
            ).collect()
        }
        assert a == b and len(a) == 10

    def test_global_mode_and_deficit_repair(self, spark):
        from data_pipelines_spark.operators.corpus import sample_exact_k

        docs = self._docs(spark, per_group=(50,))
        g = sample_exact_k(docs, 8)
        assert g.count() == 8
        # margin=0 forces the cutoff to k/n exactly; the deficit-repair
        # branch must still deliver exactly k (the probabilistic
        # pre-filter alone would often under-select)
        forced = sample_exact_k(docs, 8, group_col="source", margin=0)
        assert forced.count() == 8

    def test_rejects_bad_k(self, spark):
        import pytest as _pytest

        from data_pipelines_spark.operators.corpus import sample_exact_k

        with _pytest.raises(ValueError):
            sample_exact_k(self._docs(spark), 0)

    def test_null_group_forms_its_own_sample(self, spark):
        """Probe regression: GROUP BY forms a NULL group, but the plain
        equi join-back dropped its rows — NULL-source docs vanished from
        the sample instead of being sampled as a group. Null-safe joins
        now carry the NULL group through the count join AND the
        deficit-repair semi/anti joins (margin=0 forces that path)."""
        from collections import Counter

        from data_pipelines_spark.operators.corpus import sample_exact_k

        rows = [(i, "a" if i < 10 else None) for i in range(20)]
        docs = spark.createDataFrame(rows, "doc_id long, source string")
        for kw in ({}, {"margin": 0}):
            got = Counter(
                r["source"]
                for r in sample_exact_k(
                    docs, 3, group_col="source", **kw
                ).collect()
            )
            assert got == {"a": 3, None: 3}, (kw, got)


class TestSampleTokenBudget:
    def _docs(self, spark, rows):
        return spark.createDataFrame(rows, "doc_id long, source string, n_tokens long")

    def _brute(self, rows, budget, grouped, include_overflow, salt="tokbudget"):
        """Reference: coin-order prefix per group."""
        import hashlib

        def coin(src, did):
            key = f"{src}/{did}" if grouped else str(did)
            h = hashlib.md5(f"{key}:{salt}".encode()).hexdigest()[:8]
            return int(h, 16) / float(1 << 32)

        by_g = {}
        for did, src, w in rows:
            by_g.setdefault(src if grouped else "_", []).append(
                (coin(src, did), did, 0.0 if w is None else float(w))
            )
        keep = set()
        for lst in by_g.values():
            tot = 0.0
            for _, did, w in sorted(lst):
                if include_overflow:
                    if tot < budget:
                        keep.add(did)
                    else:
                        break
                else:
                    if tot + w <= budget:
                        keep.add(did)
                    else:
                        break
                tot += w
        return keep

    def test_matches_brute_force_prefix(self, spark):
        from data_pipelines_spark.operators.corpus import sample_token_budget

        rows = [(i, f"s{i % 3}", (i * 7919) % 200 + 1) for i in range(300)]
        docs = self._docs(spark, rows)
        for overflow in (False, True):
            got = {
                r["doc_id"]
                for r in sample_token_budget(
                    docs, 2000, group_col="source",
                    portable=True, include_overflow=overflow,
                ).collect()
            }
            want = self._brute(rows, 2000, True, overflow)
            assert got == want, (overflow, got ^ want)

    def test_budget_is_respected(self, spark):
        from data_pipelines_spark.operators.corpus import sample_token_budget

        rows = [(i, "s", (i * 31) % 500 + 1) for i in range(200)]
        docs = self._docs(spark, rows)
        under = sample_token_budget(docs, 5000, group_col="source")
        tot = under.agg(F.sum("n_tokens")).collect()[0][0]
        assert tot <= 5000
        over = sample_token_budget(
            docs, 5000, group_col="source", include_overflow=True
        )
        tot_over = over.agg(F.sum("n_tokens")).collect()[0][0]
        max_w = max(w for _, _, w in rows)
        assert 5000 <= tot_over < 5000 + max_w

    def test_partitioning_invariant_and_null_group(self, spark):
        from data_pipelines_spark.operators.corpus import sample_token_budget

        rows = [(i, None if i % 4 == 0 else f"s{i % 2}", 50) for i in range(120)]
        docs = self._docs(spark, rows)
        a = {
            r["doc_id"]
            for r in sample_token_budget(docs, 500, group_col="source").collect()
        }
        b = {
            r["doc_id"]
            for r in sample_token_budget(
                docs.repartition(7), 500, group_col="source"
            ).collect()
        }
        assert a == b
        # NULL-source docs form their own budgeted group: 10 docs of 50
        null_kept = [
            r for r in sample_token_budget(
                docs, 500, group_col="source"
            ).collect() if r["source"] is None
        ]
        assert len(null_kept) == 10

    def test_null_weight_consumes_nothing(self, spark):
        from data_pipelines_spark.operators.corpus import sample_token_budget

        rows = [(1, "s", None), (2, "s", None), (3, "s", 10)]
        docs = self._docs(spark, rows)
        # budget 10: NULL-weight docs are free, the 10-token doc fits
        assert sample_token_budget(docs, 10, group_col="source").count() == 3
        # all-free group: any budget keeps everything (prefix never cut)
        free = self._docs(spark, [(1, "s", None), (2, "s", None)])
        assert sample_token_budget(free, 0, group_col="source").count() == 2

    def test_negative_weight_raises(self, spark):
        import pytest as _pytest

        from data_pipelines_spark.operators.corpus import sample_token_budget

        docs = self._docs(spark, [(1, "s", -5)])
        with _pytest.raises(Exception, match="negative"):
            sample_token_budget(docs, 10, group_col="source").collect()

    def test_global_mode(self, spark):
        from data_pipelines_spark.operators.corpus import sample_token_budget

        rows = [(i, f"s{i % 3}", 100) for i in range(50)]
        docs = self._docs(spark, rows)
        got = sample_token_budget(docs, 1000)
        assert got.count() == 10  # 10 docs x 100 tokens, group-blind


def test_temperature_upsample_keeps_null_stratum(spark):
    """Probe regression: GROUP BY gives a NULL-source stratum its own
    mixture rate, but the plain equi join to the rate table dropped
    every NULL-stratum doc from the output — with its token weight
    still counted in the budget. Null-safe join now."""
    from data_pipelines_spark.operators.corpus import temperature_upsample

    rows = [(i, "a" if i < 5 else None, 100) for i in range(10)]
    docs = spark.createDataFrame(rows, "doc_id long, source string, ntok long")
    out = temperature_upsample(docs, weight_col=F.col("ntok")).collect()
    by_src = {}
    for r in out:
        by_src.setdefault(r["source"], set()).add(r["doc_id"])
    # equal weights, alpha=0.5, budget 1.0x: both strata rate 1.0 ->
    # every doc appears exactly once
    assert by_src.get("a") == {0, 1, 2, 3, 4}
    assert by_src.get(None) == {5, 6, 7, 8, 9}


def test_leakage_safe_splits_keep_clusters_together(spark):
    """Near-dup cluster members must share a split; per-doc assignment
    demonstrably leaks (some cluster straddles train/test on this
    fixture), which is exactly the failure the operator closes. Docs
    absent from the clusters frame fall back to their own id —
    identical to their singleton cluster label."""
    from data_pipelines_spark.operators.corpus import (
        assign_splits,
        assign_splits_leakage_safe,
    )

    n = 400
    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(n)], "doc_id long, text string"
    )
    # 50 clusters of 4 consecutive ids each; rest singletons
    pairs = [(4 * c, 4 * c + j) for c in range(50) for j in (1, 2, 3)]
    clusters = spark.createDataFrame(
        [(b, a) for a, b in pairs] + [(a, a) for a, _ in pairs],
        "doc_id long, cluster_id long",
    ).groupBy("doc_id").agg(F.min("cluster_id").alias("cluster_id"))

    weights = {"train": 0.8, "val": 0.1, "test": 0.1}
    naive = assign_splits(docs, weights)
    safe = assign_splits_leakage_safe(docs, clusters, weights)

    def cluster_split_counts(assigned):
        labeled = assigned.join(clusters, "doc_id", "left").withColumn(
            "c", F.coalesce(F.col("cluster_id"), F.col("doc_id"))
        )
        return (
            labeled.groupBy("c")
            .agg(F.countDistinct("split").alias("k"))
            .agg(F.max("k"))
            .first()[0]
        )

    assert cluster_split_counts(naive) > 1   # the leak is real here
    assert cluster_split_counts(safe) == 1   # and closed

    # all docs assigned; proportions sane at the cluster grain
    got = {r["split"]: r["cnt"] for r in safe.groupBy("split").agg(
        F.count(F.lit(1)).alias("cnt")).collect()}
    assert sum(got.values()) == n
    assert got.get("train", 0) > got.get("val", 0)
    # determinism: same assignment on re-run
    a = sorted((r["doc_id"], r["split"]) for r in safe.collect())
    b = sorted(
        (r["doc_id"], r["split"])
        for r in assign_splits_leakage_safe(docs, clusters, weights).collect()
    )
    assert a == b


# ---------------------------------------------------------------- chunking


def test_chunk_documents_overlap_and_offsets(spark):
    from data_pipelines_spark.operators.corpus import chunk_documents

    docs = _docs(spark, [(1, "a", "t0 t1 t2 t3 t4 t5 t6")])  # 7 tokens
    out = chunk_documents(docs, chunk_tokens=4, overlap_tokens=2).collect()
    # stride 2: starts 0,2,4 — generation stops at the first window
    # reaching the end; a start at 6 would be a strict subset of the
    # window at 4 (duplicate content) and must not be emitted.
    got = {(r.chunk_id, r.chunk_start, r.chunk_n_tokens, r.chunk_text) for r in out}
    assert got == {
        (0, 0, 4, "t0 t1 t2 t3"),
        (1, 2, 4, "t2 t3 t4 t5"),
        (2, 4, 3, "t4 t5 t6"),
    }
    # every token is covered and no chunk is a subset of another
    texts = [r.chunk_text for r in out]
    for a in texts:
        assert not any(a != b and a in b for b in texts)


def test_chunk_documents_min_tokens_drops_tail_not_only_chunk(spark):
    from data_pipelines_spark.operators.corpus import chunk_documents

    docs = _docs(spark, [(1, "a", "t0 t1 t2 t3 t4"), (2, "a", "solo")])
    out = chunk_documents(
        docs, chunk_tokens=4, overlap_tokens=0, min_chunk_tokens=2
    ).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    # doc 1: starts 0 and 4; the 1-token tail at 4 is below min and dropped.
    assert [(r.chunk_start, r.chunk_text) for r in by_doc[1]] == [(0, "t0 t1 t2 t3")]
    # doc 2: its only window is below min but survives (first chunk).
    assert [(r.chunk_start, r.chunk_text) for r in by_doc[2]] == [(0, "solo")]


def test_chunk_documents_blank_and_errors(spark):
    import pytest as _pytest

    from data_pipelines_spark.operators.corpus import chunk_documents

    docs = _docs(spark, [(1, "a", "   "), (2, "a", "")])
    assert chunk_documents(docs, chunk_tokens=3).count() == 0
    with _pytest.raises(ValueError):
        chunk_documents(docs, chunk_tokens=0)
    with _pytest.raises(ValueError):
        chunk_documents(docs, chunk_tokens=3, overlap_tokens=3)


def test_chunk_documents_no_shuffle(spark):
    """The chunker must stay a narrow map: no Exchange in the plan."""
    from data_pipelines_spark.operators.corpus import chunk_documents

    docs = _docs(spark, [(1, "a", "x y z")])
    plan = chunk_documents(docs, chunk_tokens=2)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_chunk_documents_partition_property(spark):
    """With overlap=0 the chunks partition the token stream: rejoining
    them in chunk order reconstructs the tokenized document, for a
    variety of lengths around the window boundary."""
    from data_pipelines_spark.operators.corpus import chunk_documents

    texts = [" ".join(f"w{i}" for i in range(n)) for n in (1, 3, 4, 5, 8, 9, 17)]
    docs = _docs(spark, [(i, "a", t) for i, t in enumerate(texts)])
    out = chunk_documents(docs, chunk_tokens=4, overlap_tokens=0).collect()
    by_doc = {}
    for r in sorted(out, key=lambda r: (r.doc_id, r.chunk_id)):
        by_doc.setdefault(r.doc_id, []).append(r)
    for i, t in enumerate(texts):
        rows = by_doc[i]
        assert " ".join(r.chunk_text for r in rows) == t
        assert [r.chunk_start for r in rows] == [4 * j for j in range(len(rows))]
        assert sum(r.chunk_n_tokens for r in rows) == len(t.split())


def test_chunk_documents_stopping_rule_exhaustive(spark):
    """Every (chunk, overlap) combo against every doc length 0..40:
    chunks must cover all tokens, advance by exactly the stride, stop
    at the first end-reaching window, and never emit a window whose
    token range is contained in another's."""
    from data_pipelines_spark.operators.corpus import chunk_documents

    for chunk, overlap in [(4, 0), (4, 2), (5, 3), (8, 7), (3, 1), (1, 0)]:
        stride = chunk - overlap
        docs = spark.createDataFrame(
            [(n, " ".join(f"t{i}" for i in range(n))) for n in range(41)],
            "doc_id long, text string",
        )
        rows = chunk_documents(
            docs, chunk_tokens=chunk, overlap_tokens=overlap
        ).collect()
        by_doc = {}
        for r in rows:
            by_doc.setdefault(r.doc_id, []).append(r)
        assert 0 not in by_doc, "blank doc must produce no chunks"
        for n in range(1, 41):
            got = sorted(by_doc[n], key=lambda r: r.chunk_id)
            starts = [r.chunk_start for r in got]
            # expected stopping rule
            last = -(-(n - chunk) // stride) * stride if n > chunk else 0
            assert starts == list(range(0, last + 1, stride)), (chunk, overlap, n)
            # full coverage, correct lengths, no contained ranges
            covered = set()
            ranges = []
            for r in got:
                assert r.chunk_n_tokens == min(chunk, n - r.chunk_start)
                assert r.chunk_text.split(" ") == [
                    f"t{i}" for i in range(r.chunk_start, r.chunk_start + r.chunk_n_tokens)
                ]
                covered.update(range(r.chunk_start, r.chunk_start + r.chunk_n_tokens))
                ranges.append((r.chunk_start, r.chunk_start + r.chunk_n_tokens))
            assert covered == set(range(n)), (chunk, overlap, n)
            for a in ranges:
                assert not any(
                    a != b and b[0] <= a[0] and a[1] <= b[1] for b in ranges
                ), (chunk, overlap, n, a)


class TestDsir:
    """DSIR importance weights + Gumbel resampling
    (operators/corpus.py): target-likeness ordering, the exact
    multinomial arithmetic on a tiny hand-checkable case, empty-doc
    and partition-invariance contracts, deterministic resampling."""

    def _corpora(self, spark):
        target = spark.createDataFrame(
            [(i, "quantum decoherence in superconducting qubits")
             for i in range(8)],
            "doc_id long, text string",
        )
        raw = spark.createDataFrame(
            [
                (1, "decoherence rates in superconducting qubits"),
                (2, "buy cheap watches free shipping click now"),
                (3, ""),
                (4, "quantum decoherence in superconducting qubits"),
            ],
            "doc_id long, text string",
        )
        return raw, target

    def test_target_like_docs_outscore(self, spark):
        from data_pipelines_spark.operators.corpus import (
            dsir_importance_weights,
        )

        raw, target = self._corpora(spark)
        rows = {
            r["doc_id"]: r
            for r in dsir_importance_weights(raw, target).collect()
        }
        assert 3 not in rows  # no tokens, no evidence
        assert rows[4]["dsir_logweight"] > rows[1]["dsir_logweight"] > 0
        assert rows[2]["dsir_logweight"] < 0
        # unigram + bigram feature count: n + (n-1)
        assert rows[4]["n_features"] == 5 + 4

    def test_matches_python_reference(self, spark):
        """Exact replay of the model in plain Python: md5 buckets,
        add-1 smoothed multinomials, round-6 log ratios, summed."""
        import hashlib
        import math

        from data_pipelines_spark.operators.corpus import (
            dsir_importance_weights,
        )

        raw, target = self._corpora(spark)
        B, lam = 100, 0.5

        def grams(text):
            t = text.lower().split()
            return t + [" ".join(p) for p in zip(t, t[1:])]

        def bucket(g):
            return int(
                hashlib.md5(f"dsir:{g}".encode()).hexdigest()[:8], 16
            ) % B

        t_rows = [r["text"] for r in target.collect()]
        r_rows = [(r["doc_id"], r["text"]) for r in raw.collect()]
        ct, cr = {}, {}
        for txt in t_rows:
            for g in grams(txt):
                ct[bucket(g)] = ct.get(bucket(g), 0) + 1
        for _i, txt in r_rows:
            for g in grams(txt):
                cr[bucket(g)] = cr.get(bucket(g), 0) + 1
        tt, tr = sum(ct.values()), sum(cr.values())

        def lr(b):
            return round(
                math.log(
                    ((ct.get(b, 0) + lam) / (tt + lam * B))
                    / ((cr.get(b, 0) + lam) / (tr + lam * B))
                ),
                6,
            )

        expect = {
            i: round(sum(lr(bucket(g)) for g in grams(txt)), 6)
            for i, txt in r_rows
            if txt.strip()
        }
        got = {
            r["doc_id"]: r["dsir_logweight"]
            for r in dsir_importance_weights(
                raw, target, num_buckets=B, smoothing=lam
            ).collect()
        }
        assert got == expect

    def test_partition_invariance(self, spark):
        from data_pipelines_spark.operators.corpus import (
            dsir_importance_weights,
        )

        raw, target = self._corpora(spark)
        a = dsir_importance_weights(raw, target)
        b = dsir_importance_weights(
            raw.repartition(7), target.repartition(5)
        )
        assert a.exceptAll(b).count() == 0
        assert b.exceptAll(a).count() == 0

    def test_resample_deterministic_and_weight_sensitive(self, spark):
        from data_pipelines_spark.operators.corpus import importance_resample

        df = spark.createDataFrame(
            [(1, 50.0), (2, -50.0), (3, 49.0), (4, -49.0)],
            "doc_id long, w double",
        )
        s1 = [r["doc_id"] for r in importance_resample(df, "w", 2).collect()]
        s2 = [
            r["doc_id"]
            for r in importance_resample(df.repartition(3), "w", 2).collect()
        ]
        assert s1 == s2
        # 100-nat gaps dwarf Gumbel noise: the heavy docs always win
        assert set(s1) == {1, 3}
        import pytest

        with pytest.raises(ValueError, match="k must be positive"):
            importance_resample(df, "w", 0)

    def test_validation(self, spark):
        import pytest

        from data_pipelines_spark.operators.corpus import (
            dsir_importance_weights,
        )

        raw, target = self._corpora(spark)
        with pytest.raises(ValueError, match="max_ngram"):
            dsir_importance_weights(raw, target, max_ngram=0)
        with pytest.raises(ValueError, match="smoothing"):
            dsir_importance_weights(raw, target, smoothing=0.0)


def test_dsir_plan_gram_join_broadcasts(spark):
    """100 TB plan pin: the data-sized gram stream joins the ratio
    table by BROADCAST (the table is <= num_buckets rows by
    construction); the only sort-merge join is the FullOuter build of
    that bounded table. A regression that flips the gram join to SMJ
    (e.g. losing the broadcast hint) changes both counts."""
    from pyspark.sql import functions as F

    from data_pipelines_spark.operators.corpus import dsir_importance_weights
    from data_pipelines_spark.plans.audit import plan_string

    raw = spark.range(200).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("alpha beta gamma "), F.col("id").cast("string"))
        .alias("text"),
    )
    target = spark.range(20).select(
        F.col("id").alias("doc_id"), F.lit("alpha beta target").alias("text")
    )
    out = dsir_importance_weights(raw, target, num_buckets=100)
    out.collect()  # materialize so the AQE-final plan exists
    plan = plan_string(out, final_only=True)
    assert plan.count("BroadcastHashJoin") >= 1
    assert plan.count("SortMergeJoin") <= 1  # only the bounded FullOuter


class TestKneserNeyBigram:
    """Interpolated KN bigram LM (CCNet-style perplexity filter)."""

    DOCS = [
        (0, "the cat sat on the mat"),
        (1, "the dog sat on the log"),
        (2, "a cat and a dog"),
        (3, "the cat the cat the cat"),
    ]

    @staticmethod
    def _python_reference(train_texts, score_pairs, D=0.75):
        """Plain-Python interpolated KN over <s>-prefixed bigrams,
        mirroring the documented arithmetic tree exactly — including
        the portability contract: per-event log10 rounded HALF_UP to
        6 decimals (Spark/DuckDB `round` semantics, not Python's
        banker's rounding), exact DECIMAL sum, cast to double before
        the mean division."""
        import math
        from collections import Counter, defaultdict
        from decimal import ROUND_HALF_UP, Decimal

        def r6(x):
            # engines round the SHORTEST decimal repr of the double
            # (Spark: BigDecimal.valueOf / Double.toString), not its
            # exact binary expansion — repr() is Python's equivalent
            return Decimal(repr(float(x))).quantize(
                Decimal("0.000001"), rounding=ROUND_HALF_UP
            )

        bi = Counter()
        for t in train_texts:
            toks = t.lower().split()
            for w1, w2 in zip(["<s>"] + toks[:-1], toks):
                bi[(w1, w2)] += 1
        c1 = defaultdict(int)
        n1f = defaultdict(int)
        n1b = defaultdict(int)
        for (w1, w2), c in bi.items():
            c1[w1] += c
            n1f[w1] += 1
            n1b[w2] += 1
        n1pp = len(bi)

        def logp(w1, w2):
            if (w1, w2) in bi:
                p = (bi[(w1, w2)] - D) / c1[w1] + (D * n1f[w1] / c1[w1]) * (
                    n1b[w2] / n1pp
                )
            elif w1 in c1 and w2 in n1b:
                p = (D * n1f[w1] / c1[w1]) * (n1b[w2] / n1pp)
            elif w2 in n1b:
                p = n1b[w2] / n1pp
            else:
                p = 10.0 ** -10
            return r6(math.log10(p))

        out = {}
        for doc_id, text in score_pairs:
            toks = text.lower().split()
            if not toks:
                continue
            lps = [
                logp(w1, w2)
                for w1, w2 in zip(["<s>"] + toks[:-1], toks)
            ]
            mean = float(sum(lps)) / len(lps)
            out[doc_id] = (len(lps), float(r6(mean)))
        return out

    def test_matches_python_reference_self_trained(self, spark):
        from data_pipelines_spark.operators.corpus import (
            kneser_ney_bigram_logprob,
        )

        docs = spark.createDataFrame(self.DOCS, "doc_id long, text string")
        got = {
            r["doc_id"]: (r["n_tokens"], r["kn_logprob10"])
            for r in kneser_ney_bigram_logprob(docs).collect()
        }
        want = self._python_reference(
            [t for _, t in self.DOCS], self.DOCS
        )
        assert got == want

    def test_backoff_paths_cross_corpus(self, spark):
        """Train on one corpus, score another exercising every backoff
        branch: seen bigram, unseen bigram w/ seen context+word, unseen
        context w/ seen word, unseen word (floor)."""
        from data_pipelines_spark.operators.corpus import (
            kneser_ney_bigram_logprob,
        )

        train = spark.createDataFrame(
            self.DOCS, "doc_id long, text string"
        )
        score = [
            (10, "the cat sat"),          # all bigrams seen
            (11, "mat dog"),              # unseen bigram, both words seen
            (12, "zzz cat"),              # unseen word then unseen context
        ]
        docs = spark.createDataFrame(score, "doc_id long, text string")
        got = {
            r["doc_id"]: (r["n_tokens"], r["kn_logprob10"])
            for r in kneser_ney_bigram_logprob(
                docs, train_docs=train
            ).collect()
        }
        want = self._python_reference([t for _, t in self.DOCS], score)
        assert got == want

    def test_distribution_normalizes(self, spark):
        """Interpolated KN is a proper conditional distribution: for
        each seen context, sum of observed-bigram probabilities plus
        lambda * (unobserved continuation mass) == 1."""
        import math
        from collections import Counter, defaultdict

        D = 0.75
        bi = Counter()
        for _, t in self.DOCS:
            toks = t.lower().split()
            for w1, w2 in zip(["<s>"] + toks[:-1], toks):
                bi[(w1, w2)] += 1
        c1 = defaultdict(int)
        n1f = defaultdict(int)
        n1b = defaultdict(int)
        for (w1, w2), c in bi.items():
            c1[w1] += c
            n1f[w1] += 1
            n1b[w2] += 1
        n1pp = len(bi)
        vocab = set(n1b)
        for w1 in c1:
            lam = D * n1f[w1] / c1[w1]
            total = 0.0
            for w2 in vocab:
                if (w1, w2) in bi:
                    total += (bi[(w1, w2)] - D) / c1[w1] + lam * (
                        n1b[w2] / n1pp
                    )
                else:
                    total += lam * (n1b[w2] / n1pp)
            assert math.isclose(total, 1.0, rel_tol=1e-12), w1

    def test_ppl_and_validation(self, spark):
        import pytest

        from data_pipelines_spark.operators.corpus import (
            kneser_ney_bigram_logprob,
        )

        docs = spark.createDataFrame(self.DOCS, "doc_id long, text string")
        row = kneser_ney_bigram_logprob(docs).where("doc_id = 3").first()
        assert row["kn_ppl10"] == round(10.0 ** -row["kn_logprob10"], 4)
        # repetitive doc 3 should be far more predictable than doc 2
        rows = {r["doc_id"]: r["kn_logprob10"]
                for r in kneser_ney_bigram_logprob(docs).collect()}
        assert rows[3] > rows[2]
        with pytest.raises(ValueError, match="discount"):
            kneser_ney_bigram_logprob(docs, discount=1.5)


class TestClusterTopTerms:
    """BERTopic c-TF-IDF labeling (cluster_top_terms)."""

    DOCS = [
        (0, "flood river flood basin"),
        (1, "river flood discharge"),
        (2, "token corpus token dedup"),
        (3, "corpus dedup token"),
        (4, "flood corpus"),
    ]
    ASSIGN = [(0, 0), (1, 0), (2, 1), (3, 1), (4, 0)]

    @staticmethod
    def _reference(docs, assign, top_n):
        import math
        from collections import Counter, defaultdict

        cluster_of = dict(assign)
        tf = Counter()
        for doc_id, text in docs:
            for t in text.lower().split():
                tf[(cluster_of[doc_id], t)] += 1
        ft = Counter()
        for (c, t), n in tf.items():
            ft[t] += n
        a = sum(tf.values()) / len({c for c, _ in tf})
        scored = defaultdict(list)
        for (c, t), n in tf.items():
            scored[c].append((round(n * math.log(1 + a / ft[t]), 6), t))
        out = []
        for c, rows in scored.items():
            rows.sort(key=lambda r: (-r[0], r[1]))
            for rk, (s, t) in enumerate(rows[:top_n], 1):
                out.append((c, t, s, rk))
        return sorted(out)

    def test_matches_python_reference(self, spark):
        from data_pipelines_spark.operators.corpus import cluster_top_terms

        docs = spark.createDataFrame(self.DOCS, "doc_id long, text string")
        assign = spark.createDataFrame(
            self.ASSIGN, "doc_id long, cluster int"
        )
        got = sorted(
            (r["cluster"], r["term"], r["ctfidf"], r["rank"])
            for r in cluster_top_terms(docs, assign, top_n=3).collect()
        )
        assert got == self._reference(self.DOCS, self.ASSIGN, 3)

    def test_cluster_exclusive_terms_outrank_shared(self, spark):
        """The c-TF-IDF property: terms concentrated in one cluster
        outrank corpus-wide terms even at equal in-cluster counts."""
        from data_pipelines_spark.operators.corpus import cluster_top_terms

        docs = spark.createDataFrame(self.DOCS, "doc_id long, text string")
        assign = spark.createDataFrame(
            self.ASSIGN, "doc_id long, cluster int"
        )
        rows = {
            (r["cluster"], r["term"]): r["ctfidf"]
            for r in cluster_top_terms(docs, assign, top_n=10).collect()
        }
        # cluster 1: 'token' (3x, exclusive) must outscore 'corpus'
        # (2x in-cluster but also present in cluster 0)
        assert rows[(1, "token")] > rows[(1, "corpus")]

    def test_composes_with_duplicate_clusters(self, spark):
        """Label near-dup families: duplicate_clusters output plugs in
        as the assignment frame directly."""
        from data_pipelines_spark.operators.corpus import cluster_top_terms
        from data_pipelines_spark.operators.dedup import (
            exact_duplicates,
        )

        docs = spark.createDataFrame(
            [
                (0, "alpha beta"),
                (1, "alpha beta"),
                (2, "gamma delta"),
            ],
            "doc_id long, text string",
        )
        fam = (
            docs.select(
                "doc_id", F.md5(F.encode("text", "UTF-8")).alias("text_md5")
            )
            .join(exact_duplicates(docs), "text_md5")
            .select("doc_id", F.col("keeper_id").alias("cluster"))
        )
        out = cluster_top_terms(docs, fam, top_n=2).collect()
        by_cluster = {}
        for r in out:
            by_cluster.setdefault(r["cluster"], set()).add(r["term"])
        assert by_cluster[0] == {"alpha", "beta"}
        assert by_cluster[2] == {"gamma", "delta"}


def test_duplicate_aware_weights(spark):
    from data_pipelines_spark.operators.corpus import (
        duplicate_aware_weights,
    )

    docs = spark.createDataFrame(
        [(i,) for i in range(6)], "doc_id long"
    )
    clusters = spark.createDataFrame(
        [(0, 100), (1, 100), (2, 100), (3, 200)],  # 4,5 = singletons
        "doc_id long, cluster_id long",
    )
    got = {
        r["doc_id"]: (r["cluster_size"], r["dup_weight"])
        for r in duplicate_aware_weights(docs, clusters).collect()
    }
    assert got[0] == (3, round(3.0 ** -1, 6))
    assert got[1] == got[0] and got[2] == got[0]
    assert got[3] == (1, 1.0)
    assert got[4] == (1, 1.0) and got[5] == (1, 1.0)
    # alpha = 0.5: the D4-style partial-dedup middle ground
    half = {
        r["doc_id"]: r["dup_weight"]
        for r in duplicate_aware_weights(
            docs, clusters, alpha=0.5
        ).collect()
    }
    assert half[0] == round(3.0 ** -0.5, 6)
    # family total weight: alpha=1 -> 1 doc's worth, alpha=0 -> all 3
    assert abs(3 * got[0][1] - 1.0) <= 3e-6  # round-6 weights
    full = duplicate_aware_weights(docs, clusters, alpha=0.0)
    assert full.agg(F.sum("dup_weight")).first()[0] == 6.0
    import pytest as _pytest

    with _pytest.raises(ValueError, match="alpha"):
        duplicate_aware_weights(docs, clusters, alpha=-1.0)
