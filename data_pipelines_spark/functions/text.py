"""Text-analysis column functions for training-data pipelines.

All hot-path logic is native `pyspark.sql.functions` expressions
(JVM-side, codegen) — no Python UDFs. Designed for the `documents`
table shape: (doc_id, text, lang, source, n_chars).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny per-language stopword profiles for the n-gram/stopword language
# heuristic. Deliberately small and ASCII-safe; real deployments swap in
# fuller profiles.
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "in", "is", "that", "for", "with", "a"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "für", "von"),
    "fr": ("le", "la", "les", "et", "est", "un", "une", "pour", "dans", "que"),
    "es": ("el", "la", "los", "las", "y", "es", "un", "una", "por", "para"),
}

PUNCT_CLASS = r"[.,;:!?]"


def tokens(text: Column) -> Column:
    """Whitespace tokenization → array<string> (empty array for blank)."""
    t = F.trim(text)
    return F.when(F.length(t) == 0, F.array().cast("array<string>")).otherwise(
        F.split(t, r"\s+")
    )


def token_count(text: Column) -> Column:
    return F.size(tokens(text)).cast("long")


def byte_length(text: Column) -> Column:
    return F.octet_length(text).cast("long")


def punct_count(text: Column) -> Column:
    return (
        F.length(text) - F.length(F.regexp_replace(text, PUNCT_CLASS, ""))
    ).cast("long")


def stopword_hits(text: Column, words: tuple[str, ...]) -> Column:
    """Count of tokens that are in the given stopword list."""
    word_set = F.array(*[F.lit(w) for w in words])
    return F.size(
        F.filter(tokens(F.lower(text)), lambda t: F.array_contains(word_set, t))
    ).cast("long")


def quality_score(text: Column) -> Column:
    """Heuristic quality in [0,1]: balanced length, moderate punctuation,
    reasonable mean token length. Deterministic, explainable, cheap —
    the shape (not the constants) is what a real pipeline tunes."""
    n_tok = token_count(text)
    n_chars = F.length(text).cast("double")
    mean_tok_len = F.when(n_tok > 0, n_chars / n_tok).otherwise(F.lit(0.0))
    length_term = F.least(n_chars / F.lit(500.0), F.lit(1.0))
    tok_term = F.when((mean_tok_len >= 3) & (mean_tok_len <= 12), F.lit(1.0)).otherwise(
        F.lit(0.5)
    )
    punct_term = F.when(
        n_chars > 0,
        1.0 - F.least(punct_count(text).cast("double") / n_chars * 5.0, F.lit(1.0)),
    ).otherwise(F.lit(0.0))
    return F.round((length_term + tok_term + punct_term) / 3.0, 6)


def lang_guess(text: Column) -> Column:
    """Stopword-profile language ID: the language with the most stopword
    hits wins; zero hits fall back to 'und' (undetermined). Equal hit
    counts resolve to the lexicographically larger code (struct-max
    comparison on (hits, code)) — deterministic by construction."""
    hits = [
        F.struct(
            stopword_hits(text, words).alias("hits"), F.lit(code).alias("code")
        )
        for code, words in sorted(LANG_STOPWORDS.items())
    ]
    best = F.array_max(F.array(*hits))
    return F.when(best["hits"] > 0, best["code"]).otherwise(F.lit("und"))


def rolling_fingerprint(text: Column, modulus: int = 2_147_483_647) -> Column:
    """Polynomial rolling hash (base 31) over the document's bytes-as
    -codepoints — a deterministic document fingerprint computed natively
    via `aggregate` over the character array. Stays exact under 64-bit
    arithmetic because acc < modulus and base is small."""
    chars = F.split(text, "")
    return F.aggregate(
        chars,
        F.lit(0).cast("long"),
        lambda acc, ch: F.pmod(acc * 31 + F.coalesce(F.ascii(ch), F.lit(0)), F.lit(modulus)),
    )
