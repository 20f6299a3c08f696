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


# PII patterns restricted to a regex dialect identical in Java (Spark)
# and RE2/DuckDB: no backreferences, no lookaround.
EMAIL_PATTERN = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_PATTERN = r"(\+?[0-9]{1,3}[-. ])?\(?[0-9]{3}\)?[-. ]?[0-9]{3}[-. ]?[0-9]{4}"


def email_count(text: Column) -> Column:
    """Count of email-shaped substrings — the detection half of a PII
    scrub stage (redaction = regexp_replace with the same pattern)."""
    return F.size(
        F.regexp_extract_all(text, F.lit(EMAIL_PATTERN), F.lit(0))
    ).cast("long")


def phone_count(text: Column) -> Column:
    """Count of phone-number-shaped substrings (international-ish)."""
    return F.size(
        F.regexp_extract_all(text, F.lit(PHONE_PATTERN), F.lit(0))
    ).cast("long")


def redact_pii(text: Column) -> Column:
    """Replace email/phone matches with typed sentinels — the scrub
    stage a training-data pipeline runs before tokenization."""
    no_email = F.regexp_replace(text, EMAIL_PATTERN, "<EMAIL>")
    return F.regexp_replace(no_email, PHONE_PATTERN, "<PHONE>")


def let(value: Column, body) -> Column:
    """Evaluate ``value`` ONCE and let ``body`` reference it many times.

    Higher-order-function lambdas are evaluated outside whole-stage
    codegen, so Catalyst's common-subexpression elimination does not
    apply inside them: a plain Python variable holding an expression
    tree is re-EVALUATED at every reference site (measured: the 8-gram
    scan re-ran its regex tokenizer 8x per position — a 20x slowdown).
    Binding the value as a single-element-array lambda variable makes
    every reference a cheap variable read instead.
    """
    return F.element_at(F.transform(F.array(value), body), 1)


def duplicate_line_fraction(text: Column) -> Column:
    """Fraction of lines that are repeats of an earlier line — the
    Gopher-style repetition signal for boilerplate-heavy pages
    (nav bars, cookie banners). 0.0 for single-line docs; native
    split/array arithmetic, no shuffle."""

    def frac(lines: Column) -> Column:
        n = F.size(lines)
        n_distinct = F.size(F.array_distinct(lines))
        return F.when(n > 0, (n - n_distinct).cast("double") / n).otherwise(
            F.lit(0.0)
        )

    return let(
        F.filter(
            F.transform(F.split(text, r"\n"), lambda l: F.trim(l)),
            lambda l: F.length(l) > 0,
        ),
        frac,
    )


def top_ngram_fraction(text: Column, n: int = 2) -> Column:
    """Fraction of the document's word-n-grams taken by the single most
    frequent n-gram — high values flag templated/repetitive text
    (the second Gopher repetition signal). Computed natively and in
    linear time: build the n-gram array (tokens bound once via
    :func:`let`), sort it, and take the longest run of equal adjacent
    grams — same value as a frequency map's max, without per-element
    map rebuilding. No shuffle, no UDF."""

    def over_sorted(sg: Column) -> Column:
        total = F.size(sg)
        acc0 = F.struct(
            F.lit("").alias("prev"),
            F.lit(0).cast("int").alias("run"),
            F.lit(0).cast("int").alias("best"),
        )
        run_next = lambda acc, g: F.when(  # noqa: E731
            g == acc["prev"], acc["run"] + 1
        ).otherwise(F.lit(1))
        merged = F.aggregate(
            sg,
            acc0,
            lambda acc, g: F.struct(
                g.alias("prev"),
                run_next(acc, g).alias("run"),
                F.greatest(acc["best"], run_next(acc, g)).alias("best"),
            ),
        )
        return F.when(
            total > 0, merged["best"].cast("double") / total
        ).otherwise(F.lit(0.0))

    def over_toks(toks: Column) -> Column:
        cnt = F.size(toks)
        # Guard: sequence(a, b) with b < a generates a DESCENDING
        # sequence in Spark, so short docs need an explicit empty branch.
        grams = F.when(
            cnt >= n,
            F.transform(
                F.sequence(F.lit(1), cnt - n + 1),
                lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
            ),
        ).otherwise(F.array().cast("array<string>"))
        return let(F.array_sort(grams), over_sorted)

    return let(tokens(F.lower(text)), over_toks)


def mean_word_length(text: Column) -> Column:
    """Mean token length in characters (0.0 for empty docs) — one of the
    Gopher outlier signals (Rae et al. 2021): prose sits around 3-10;
    far outside that is usually code, tables, or junk."""
    toks = tokens(text)
    n = F.size(toks)
    total = F.aggregate(
        toks, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t)
    )
    return F.when(n > 0, total.cast("double") / n).otherwise(F.lit(0.0))


def alpha_word_fraction(text: Column) -> Column:
    """Fraction of tokens containing at least one ASCII letter — low
    values flag numeric tables / markup / binary-ish text."""
    toks = tokens(text)
    n = F.size(toks)
    n_alpha = F.size(F.filter(toks, lambda t: t.rlike("[A-Za-z]")))
    return F.when(n > 0, n_alpha.cast("double") / n).otherwise(F.lit(0.0))


def symbol_word_ratio(text: Column) -> Column:
    """(# of '#' characters + # of '...' runs) per token — the Gopher
    symbol-noise signal. Counted by length arithmetic (no regex)."""
    n_hash = F.length(text) - F.length(F.replace(text, F.lit("#"), F.lit("")))
    n_ellipsis = (
        F.length(text) - F.length(F.replace(text, F.lit("..."), F.lit("")))
    ) / 3
    n_tok = token_count(text)
    return F.when(
        n_tok > 0, (n_hash + n_ellipsis).cast("double") / n_tok
    ).otherwise(F.lit(0.0))


def _nonempty_lines(text: Column) -> Column:
    return F.filter(
        F.transform(F.split(text, r"\n"), lambda l: F.trim(l)),
        lambda l: F.length(l) > 0,
    )


def bullet_line_fraction(text: Column) -> Column:
    """Fraction of non-empty lines starting with a bullet marker
    ('-', '*', or '•') — mostly-bullets pages are navigation/listing
    chrome, not prose."""
    lines = _nonempty_lines(text)
    n = F.size(lines)
    n_bullet = F.size(
        F.filter(
            lines,
            lambda l: F.substring(l, 1, 1).isin("-", "*", "•"),
        )
    )
    return F.when(n > 0, n_bullet.cast("double") / n).otherwise(F.lit(0.0))


def ellipsis_line_fraction(text: Column) -> Column:
    """Fraction of non-empty lines ending in '...' or '…' —
    truncated-snippet pages (search results, previews)."""
    lines = _nonempty_lines(text)
    n = F.size(lines)
    n_ell = F.size(
        F.filter(
            lines,
            lambda l: l.endswith("...") | l.endswith("…"),
        )
    )
    return F.when(n > 0, n_ell.cast("double") / n).otherwise(F.lit(0.0))


def passes_gopher_rules(
    text: Column,
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    min_alpha_fraction: float = 0.8,
    max_bullet_fraction: float = 0.9,
    max_ellipsis_fraction: float = 0.3,
    min_stopword_hits: int = 2,
) -> Column:
    """The Gopher rule-based quality gate (Rae et al. 2021, table A1) as
    ONE boolean column: word-count bounds, mean-word-length bounds,
    symbol-to-word ratio, alphabetic-word fraction, bullet/ellipsis line
    fractions, and a minimum stopword presence. Entirely native
    expressions — at 100 TB this is a narrow projection that pushes
    through any partitioning; a curation pipeline runs it before the
    (much more expensive) dedup tiers to shrink their input."""
    n_tok = token_count(text)
    mwl = mean_word_length(text)
    return (
        (n_tok >= min_words)
        & (n_tok <= max_words)
        & (mwl >= min_mean_word_len)
        & (mwl <= max_mean_word_len)
        & (symbol_word_ratio(text) <= max_symbol_ratio)
        & (alpha_word_fraction(text) >= min_alpha_fraction)
        & (bullet_line_fraction(text) <= max_bullet_fraction)
        & (ellipsis_line_fraction(text) <= max_ellipsis_fraction)
        & (stopword_hits(text, LANG_STOPWORDS["en"]) >= min_stopword_hits)
    )


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


# Latin accent fold for the CCNet normalization: 1:1 mappings ride one
# translate() (cheapest possible — a char-table lookup in codegen);
# the few 1:2 ligatures follow as replaces. Covers Latin-1 Supplement +
# the common Latin Extended-A letters; anything outside passes through
# (normalization is a dedup KEY transform, not a display transform —
# unmapped scripts simply keep their identity).
_ACCENT_SRC = (
    "àáâãäåāăąçćčĉċďđèéêëēĕėęěĝğġģĥìíîïĩīĭįıĵķĺļľŀłñńņňòóôõöøōŏő"
    "ŕŗřśŝşšţťŧùúûüũūŭůűųŵýÿŷźżžðþ"
)
_ACCENT_DST = (
    "aaaaaaaaacccccddeeeeeeeeegggghiiiiiiiiijklllllnnnnooooooooo"
    "rrrsssstttuuuuuuuuuuwyyyzzzdp"
)
# translate() pairs positionally — a single length drift shifts every
# later mapping (the r9 bug: one extra 'o' sent ù→t, ý→w, þ off the end)
assert len(_ACCENT_SRC) == len(_ACCENT_DST), (
    len(_ACCENT_SRC), len(_ACCENT_DST),
)
_LIGATURES = (("æ", "ae"), ("œ", "oe"), ("ß", "ss"))


def ccnet_normalize(
    text: Column,
    strip_punct: bool = False,
) -> Column:
    """CCNet-style normalization — the key transform applied BEFORE
    hashing for paragraph/document dedup (Wenzek et al. 2020 §4.1:
    lowercase, strip accents, map every digit to 0, collapse
    whitespace), so trivially-different copies ("Version 2", "version
    3", "Vérsion 2") collapse to one dedup key. Compose with the dedup
    operators: ``exact_duplicates(docs.withColumn("text",
    ccnet_normalize(F.col("text"))))`` — the operators themselves stay
    byte-faithful by default. One native expression chain (translate +
    replace + regexp), zero UDFs. ``strip_punct=True`` additionally
    removes ASCII punctuation (the more aggressive CCNet variant)."""
    t = F.lower(text)
    t = F.translate(t, _ACCENT_SRC, _ACCENT_DST)
    for src, dst in _LIGATURES:
        t = F.replace(t, F.lit(src), F.lit(dst))
    t = F.translate(t, "123456789", "000000000")
    if strip_punct:
        t = F.regexp_replace(t, r"[!-/:-@\[-`{-~]", "")
    t = F.regexp_replace(t, r"\s+", " ")
    return F.trim(t)
