"""BPE tokenizer training/encoding: exact equivalence with a naive
reference trainer (full recount every merge), encoder/trainer
consistency, distributed-encode parity, and determinism."""

from __future__ import annotations

from collections import Counter

import pytest

from data_pipelines_spark.operators.tokenizer import (
    END_OF_WORD,
    _encode_word,
    bpe_encode,
    bpe_vocab,
    train_bpe,
)


def naive_train(word_counts: dict[str, int], num_merges: int):
    """Recount-everything reference trainer (the textbook algorithm)."""
    words = [(list(w) + [END_OF_WORD], c) for w, c in word_counts.items()]
    merges = []
    for _ in range(num_merges):
        pc = Counter()
        for syms, c in words:
            for p in zip(syms, syms[1:]):
                pc[p] += c
        if not pc:
            break
        best = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if pc[best] < 2:
            break
        merges.append(best)
        merged = best[0] + best[1]
        new_words = []
        for syms, c in words:
            out, j = [], 0
            while j < len(syms):
                if j + 1 < len(syms) and (syms[j], syms[j + 1]) == best:
                    out.append(merged)
                    j += 2
                else:
                    out.append(syms[j])
                    j += 1
            new_words.append((out, c))
        words = new_words
    return merges, {
        "".join(s).replace(END_OF_WORD, "") + END_OF_WORD: s
        for s, _ in words
    }


WORD_COUNTS = {"low": 5, "lower": 2, "newest": 6, "widest": 3}


def _docs(spark, counts=WORD_COUNTS):
    rows, i = [], 0
    for w, c in counts.items():
        for _ in range(c):
            rows.append((i, w))
            i += 1
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_trainer_matches_naive_reference(spark):
    docs = _docs(spark)
    for n in (0, 1, 5, 10, 50):
        got = train_bpe(docs, num_merges=n)
        want, _ = naive_train(WORD_COUNTS, n)
        assert got == want, n


def test_trainer_incremental_bookkeeping_on_overlaps(spark):
    """Adversarial overlap patterns (aaa..., abab...) where a sloppy
    incremental pair update diverges from the recount reference."""
    counts = {"aaaaaa": 4, "ababab": 3, "aabbaa": 2, "banana": 5}
    docs = _docs(spark, counts)
    got = train_bpe(docs, num_merges=12)
    want, _ = naive_train(counts, 12)
    assert got == want


def test_encoder_reproduces_training_segmentation(spark):
    """Rank-greedy encoding of a training word yields exactly the
    segmentation the trainer left that word with — the property that
    makes train-then-encode coherent."""
    docs = _docs(spark)
    merges = train_bpe(docs, num_merges=8)
    _, final = naive_train(WORD_COUNTS, 8)
    ranks = {p: i for i, p in enumerate(merges)}
    for w in WORD_COUNTS:
        assert _encode_word(w, ranks) == final[w + END_OF_WORD], w


def test_encode_round_trips_and_unseen_words(spark):
    docs = _docs(spark)
    merges = train_bpe(docs, num_merges=8)
    ranks = {p: i for i, p in enumerate(merges)}
    for w in ("low", "lowest", "zzz", "w"):
        toks = _encode_word(w, ranks)
        assert "".join(toks).replace(END_OF_WORD, "") == w
        assert toks[-1].endswith(END_OF_WORD)


def test_distributed_encode_matches_kernel(spark):
    docs = spark.createDataFrame(
        [
            (0, "low lower NEWEST"),
            (1, "widest low low"),
            (2, ""),
            (3, None),
        ],
        "doc_id long, text string",
    ).repartition(3)
    merges = train_bpe(_docs(spark), num_merges=8)
    ranks = {p: i for i, p in enumerate(merges)}
    got = {
        r["doc_id"]: (r["bpe_tokens"], r["bpe_tokens_n"])
        for r in bpe_encode(docs, merges).collect()
    }
    for doc_id, text in [(0, "low lower NEWEST"), (1, "widest low low")]:
        want = []
        for w in text.lower().split():
            want.extend(_encode_word(w, ranks))
        assert got[doc_id] == (want, len(want)), doc_id
    assert got[2] == ([], 0)
    assert got[3] == ([], 0)


def test_train_and_encode_agree_on_word_boundaries(spark):
    """Regression: training tokenizes with the engine's \\s+ (ASCII)
    split, so the encoder must NOT use Python's Unicode str.split() —
    an NBSP-joined word is ONE word to both, and a trained merge
    inside it applies at encode time."""
    nb = "lo\u00a0rem"  # NBSP is not whitespace to the engine
    docs = spark.createDataFrame(
        [(i, nb) for i in range(4)], "doc_id long, text string"
    )
    merges = train_bpe(docs, num_merges=3)
    assert merges, "NBSP word must reach the histogram intact"
    ranks = {p: i for i, p in enumerate(merges)}
    [row] = bpe_encode(docs.limit(1), merges).collect()
    assert row["bpe_tokens"] == _encode_word(nb, ranks)
    # i.e. one </w>-terminated word, not two
    assert sum(t.endswith(END_OF_WORD) for t in row["bpe_tokens"]) == 1


def test_encode_plan_is_exchange_free(spark):
    """bpe_encode is a pure narrow map — no shuffle may appear."""
    from data_pipelines_spark.plans.audit import plan_string

    out = bpe_encode(_docs(spark), train_bpe(_docs(spark), num_merges=4))
    assert "Exchange" not in plan_string(out)


def test_training_is_partitioning_invariant(spark):
    docs = _docs(spark)
    a = train_bpe(docs.repartition(7), num_merges=10)
    b = train_bpe(docs.coalesce(1), num_merges=10)
    assert a == b


def test_more_merges_compress_more(spark):
    docs = _docs(spark)
    few = train_bpe(docs, num_merges=2)
    many = train_bpe(docs, num_merges=20)

    def total_tokens(merges):
        out = bpe_encode(_docs(spark), merges)
        return out.groupBy().sum("bpe_tokens_n").first()[0]

    assert total_tokens(many) < total_tokens(few)
    assert bpe_vocab(many)[: len(bpe_vocab(few))] == bpe_vocab(few)


def test_validation(spark):
    with pytest.raises(ValueError, match="num_merges"):
        train_bpe(_docs(spark), num_merges=-1)


def test_trainer_property_random_multisets(spark):
    """Hypothesis-style sweep without the fixture friction: seeded
    random word multisets (small alphabet → dense pair collisions,
    the regime where incremental bookkeeping can drift) must match
    the recount reference exactly, and every encoded training word
    must reproduce its training segmentation."""
    import random

    rng = random.Random(97)
    for trial in range(12):
        n_words = rng.randint(1, 10)
        counts = {}
        for _ in range(n_words):
            w = "".join(
                rng.choice("abc") for _ in range(rng.randint(1, 7))
            )
            counts[w] = counts.get(w, 0) + rng.randint(1, 8)
        n = rng.randint(0, 25)
        got = train_bpe(_docs(spark, counts), num_merges=n)
        want, final = naive_train(counts, n)
        assert got == want, (trial, counts, n)
        ranks = {p: i for i, p in enumerate(got)}
        for w in counts:
            assert _encode_word(w, ranks) == final[w + END_OF_WORD], (
                trial, w,
            )


def test_merges_persistence_roundtrip(spark, tmp_path):
    from data_pipelines_spark.operators.tokenizer import (
        merges_from_df,
        merges_to_df,
    )

    merges = train_bpe(_docs(spark), num_merges=8)
    path = str(tmp_path / "tok.parquet")
    merges_to_df(spark, merges).write.parquet(path)
    # shuffle the stored rows: rank order must be restored explicitly
    back = merges_from_df(
        spark.read.parquet(path).orderBy("left").repartition(3)
    )
    assert back == merges
