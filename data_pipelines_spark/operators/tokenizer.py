"""Byte-pair-encoding tokenizer training and encoding, Spark-first.

The architecture every production BPE trainer uses (sentencepiece,
HuggingFace tokenizers): the CORPUS-sized work — counting word
frequencies — is distributed; the merge loop itself runs over the
word HISTOGRAM, which is Zipf-bounded (a bounded top-K head carries
essentially all token mass), so it is driver-sized by construction,
not by hope. Encoding then fans back out as an Arrow-batched
`mapInPandas` with the merge table broadcast and a per-batch word
cache (words repeat; the cache turns per-token work into per-distinct-
word work).

Scale shape at 100 TB: one map-side-combined wordcount shuffle +
a TakeOrdered head for training; a pure narrow map for encoding.
The merge loop is O(num_merges × affected-words) via pair→word
indexing — never a full recount per merge.

BPE itself: Sennrich, Haddow & Birch, "Neural Machine Translation of
Rare Words with Subword Units" (ACL 2016); the rank-greedy encoder is
the GPT-2 `bpe()` control flow. Not SQL-expressible (iterated
data-dependent rewriting), so this module is unit-checked against an
exact naive reference rather than the DuckDB oracle — the documented
exception class.
"""

from __future__ import annotations

import re
from collections import Counter, defaultdict

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from data_pipelines_spark.functions.text import tokens

END_OF_WORD = "</w>"

# Python mirror of functions.text.tokens (Spark `trim` strips ASCII
# spaces only; Java \s is the ASCII whitespace class) — training and
# encoding MUST agree on word boundaries, and Python's default
# str.split() treats Unicode whitespace (NBSP etc.) as separators
# where the engine does not.
_WS = re.compile(r"\s+", re.ASCII)


def _py_tokens(text: str) -> list[str]:
    t = text.strip(" ")
    return _WS.split(t) if t else []


def _word_histogram(
    docs: DataFrame, text_col: str, max_words: int
) -> list[tuple[str, int]]:
    """Distributed word→count head, deterministically ordered
    (count desc, word asc) so training is partitioning-invariant."""
    counts = (
        docs.select(
            F.explode(tokens(F.lower(F.col(text_col)))).alias("w")
        )
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    rows = counts.orderBy(F.desc("c"), F.asc("w")).limit(max_words).collect()
    return [(r["w"], r["c"]) for r in rows]


def train_bpe(
    docs: DataFrame,
    num_merges: int = 200,
    text_col: str = "text",
    max_words: int = 1_000_000,
) -> list[tuple[str, str]]:
    """Learn an ordered BPE merge list from the corpus.

    Words are the lowercased whitespace tokens, each ending with the
    ``</w>`` boundary marker; merges maximize corpus pair frequency
    with a deterministic tie-break (count desc, then lexicographic
    pair) so identical corpora yield identical tokenizers anywhere.
    Stops early when no pair occurs twice. ``max_words`` bounds the
    driver-side histogram (Zipf head — the standard trainer bound).

    Incremental pair bookkeeping: a pair→{word index} inverted index
    means each merge touches only the words containing that pair, not
    the whole histogram.
    """
    if num_merges < 0:
        raise ValueError(f"num_merges must be >= 0, got {num_merges}")
    hist = _word_histogram(docs, text_col, max_words)
    words: list[list[str]] = [list(w) + [END_OF_WORD] for w, _ in hist]
    freqs = [c for _, c in hist]

    pair_counts: Counter = Counter()
    pair_words: dict[tuple[str, str], set[int]] = defaultdict(set)
    for i, syms in enumerate(words):
        f = freqs[i]
        for a, b in zip(syms, syms[1:]):
            pair_counts[(a, b)] += f
            pair_words[(a, b)].add(i)

    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        if not pair_counts:
            break
        # deterministic argmax: count desc, then lexicographic pair
        best = min(
            pair_counts.items(), key=lambda kv: (-kv[1], kv[0])
        )[0]
        if pair_counts[best] < 2:
            break
        merges.append(best)
        merged = best[0] + best[1]
        for i in list(pair_words[best]):
            syms, f = words[i], freqs[i]
            # retract this word's pair contributions, rewrite, re-add
            for a, b in zip(syms, syms[1:]):
                pair_counts[(a, b)] -= f
                if pair_counts[(a, b)] <= 0:
                    del pair_counts[(a, b)]
                pair_words[(a, b)].discard(i)
            out, j = [], 0
            while j < len(syms):
                if (
                    j + 1 < len(syms)
                    and (syms[j], syms[j + 1]) == best
                ):
                    out.append(merged)
                    j += 2
                else:
                    out.append(syms[j])
                    j += 1
            words[i] = out
            for a, b in zip(out, out[1:]):
                pair_counts[(a, b)] += f
                pair_words[(a, b)].add(i)
    return merges


def _encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Rank-greedy BPE application (the GPT-2 `bpe()` loop): repeatedly
    merge the present pair with the LOWEST training rank."""
    syms = list(word) + [END_OF_WORD]
    while len(syms) > 1:
        best_rank, best_pair = None, None
        for pair in zip(syms, syms[1:]):
            r = ranks.get(pair)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_pair = r, pair
        if best_pair is None:
            break
        merged = best_pair[0] + best_pair[1]
        out, j = [], 0
        while j < len(syms):
            if j + 1 < len(syms) and (syms[j], syms[j + 1]) == best_pair:
                out.append(merged)
                j += 2
            else:
                out.append(syms[j])
                j += 1
        syms = out
    return syms


def bpe_encode(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """Tokenize every document with a trained merge list: appends
    ``out_col`` (array<string> of subword tokens) and ``{out_col}_n``
    (the token count — the budget quantity curation samplers consume).

    Arrow-batched `mapInPandas`; the merge table ships once per task
    via closure broadcast and a per-batch word→tokens cache collapses
    repeated words. Pure narrow map — no shuffle.
    """
    from pyspark.sql.types import (
        ArrayType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    ranks = {tuple(p): i for i, p in enumerate(merges)}
    out_n = f"{out_col}_n"
    schema = StructType(
        list(docs.schema.fields)
        + [
            StructField(out_col, ArrayType(StringType())),
            StructField(out_n, LongType()),
        ]
    )

    def run(batches):
        cache: dict[str, list[str]] = {}

        def enc_text(text):
            if text is None:
                return []
            toks: list[str] = []
            for w in _py_tokens(str(text).lower()):
                hit = cache.get(w)
                if hit is None:
                    hit = cache[w] = _encode_word(w, ranks)
                toks.extend(hit)
            return toks

        for pdf in batches:
            encoded = pdf[text_col].map(enc_text)
            pdf = pdf.assign(
                **{
                    out_col: encoded,
                    out_n: encoded.map(len).astype("int64"),
                }
            )
            yield pdf

    return docs.mapInPandas(run, schema)


def bpe_vocab(merges: list[tuple[str, str]]) -> list[str]:
    """The subword vocabulary a merge list induces: every merge's
    output symbol, in rank order (characters/``</w>`` form the
    implicit base alphabet)."""
    return [a + b for a, b in merges]


def merges_to_df(spark, merges: list[tuple[str, str]]) -> DataFrame:
    """Persistable form of a trained tokenizer: one (rank, left,
    right) row per merge — write it as parquet next to the corpus it
    tokenizes so every downstream job encodes with the SAME model."""
    return spark.createDataFrame(
        [(i, a, b) for i, (a, b) in enumerate(merges)],
        "rank long, left string, right string",
    )


def merges_from_df(df: DataFrame) -> list[tuple[str, str]]:
    """Inverse of :func:`merges_to_df` — rank order restored
    explicitly (parquet row order is not a contract). The collect is
    vocabulary-sized by construction (one row per merge)."""
    return [
        (r["left"], r["right"])
        for r in df.select("rank", "left", "right").orderBy("rank").collect()
    ]
