"""LLM-training-data operators over the `documents` and `embeddings`
tables: dedup tiers, text analysis, similarity search.

Queries without an oracle entry (minhash/simhash — they depend on
Spark's xxhash64, which DuckDB cannot reproduce) get the driver's
rows-only check; their semantics are unit-tested against hand-built
fixtures in tests/test_dedup.py instead.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from data_pipelines_spark.functions.text import (
    byte_length,
    punct_count,
    quality_score,
    rolling_fingerprint,
    token_count,
)
from data_pipelines_spark.operators.dedup import (
    exact_duplicates,
    minhash_near_duplicates,
    ngram_jaccard_pairs,
    simhash_signatures,
)
from data_pipelines_spark.operators.similarity import (
    brute_force_topk,
    embedding_near_duplicates,
    lsh_bucketed_topk,
)
from data_pipelines_spark.session import tune
from data_pipelines_spark.sources.tables import load_table
from data_pipelines_spark.suite._registry import make_registry

QUERIES, ORACLES, register = make_registry()


@register(
    "exact_dedup_docs",
    """
    SELECT md5(text) AS text_md5,
           min(doc_id) AS keeper_id,
           count(*)    AS dup_cnt
    FROM documents
    GROUP BY 1
    """,
)
def exact_dedup_docs(spark, sf_dir):
    """Exact deduplication via content hash: one row per distinct text
    with the canonical (minimum) doc id and the duplicate count."""
    tune(spark)
    docs = load_table(spark, sf_dir, "documents")
    return exact_duplicates(docs)


_BPE_PATTERN = r"[A-Za-z]+|[0-9]{1,3}|[^A-Za-z0-9\s]"


@register(
    "text_stats",
    rf"""
    SELECT doc_id,
           CAST(length(text) AS BIGINT) AS n_chars_calc,
           CAST(strlen(text) AS BIGINT) AS n_bytes,
           CAST(CASE WHEN length(trim(text)) = 0 THEN 0
                     ELSE len(string_split_regex(trim(text), '\s+'))
                END AS BIGINT) AS n_tokens,
           CAST(length(text) - length(regexp_replace(text, '[.,;:!?]', '', 'g'))
                AS BIGINT) AS n_punct,
           CAST(len(regexp_extract_all(text, '{_BPE_PATTERN}')) AS BIGINT)
               AS n_bpe_tokens
    FROM documents
    """,
)
def text_stats(spark, sf_dir):
    """Per-document text statistics: char/byte length, whitespace token
    count, punctuation count, and BPE-style pre-tokenization count
    (letter runs, short digit runs, individual symbols — the GPT-2-style
    splitter shape restricted to a regex dialect identical in Java and
    RE2) — all native expressions. Absorbs the former bpe_token_counts
    query (registry trimmed so the driver sweep covers every entry)."""
    tune(spark)
    docs = load_table(spark, sf_dir, "documents")
    t = F.col("text")
    return docs.select(
        "doc_id",
        F.length(t).cast("long").alias("n_chars_calc"),
        byte_length(t).alias("n_bytes"),
        token_count(t).alias("n_tokens"),
        punct_count(t).alias("n_punct"),
        F.size(
            F.regexp_extract_all(t, F.lit(_BPE_PATTERN), F.lit(0))
        ).cast("long").alias("n_bpe_tokens"),
    )


def _doc_profile_sql() -> str:
    """Combined oracle for the per-document profile: quality score,
    rolling-hash fingerprint, stopword-profile language guess, PII
    counts, and repetition signals."""
    from data_pipelines_spark.functions.text import (
        EMAIL_PATTERN,
        LANG_STOPWORDS,
        PHONE_PATTERN,
    )

    hit_cols = []
    for code, words in sorted(LANG_STOPWORDS.items()):
        lst = ", ".join(f"'{w}'" for w in words)
        hit_cols.append(
            f"len(list_filter(string_split_regex(trim(lower(text)), '\\s+'),"
            f" t -> list_contains([{lst}], t))) AS hits_{code}"
        )
    hits_sql = ",\n               ".join(hit_cols)
    codes_desc = sorted(LANG_STOPWORDS, reverse=True)
    best = ", ".join(f"hits_{c}" for c in sorted(LANG_STOPWORDS))
    case = "\n                ".join(
        f"WHEN hits_{c} = greatest({best}) THEN '{c}'" for c in codes_desc[:-1]
    )
    return rf"""
    WITH base AS (
        SELECT doc_id, lang AS labeled_lang,
               CAST(length(text) AS DOUBLE) AS n_chars,
               CAST(CASE WHEN length(trim(text)) = 0 THEN 0
                         ELSE len(string_split_regex(trim(text), '\s+'))
                    END AS BIGINT) AS n_tok,
               CAST(length(text) - length(regexp_replace(text, '[.,;:!?]', '', 'g'))
                    AS BIGINT) AS n_punct,
               list_reduce(
                   list_prepend(CAST(0 AS BIGINT),
                       list_transform(string_split(text, ''),
                                      c -> CAST(ascii(c) AS BIGINT))),
                   (acc, x) -> (acc * 31 + x) % 2147483647
               ) AS fingerprint,
               CAST(len(regexp_extract_all(text, '{EMAIL_PATTERN}')) AS BIGINT)
                   AS n_emails,
               CAST(len(regexp_extract_all(text, '{PHONE_PATTERN}')) AS BIGINT)
                   AS n_phones,
               list_filter(list_transform(string_split(text, chr(10)),
                                          l -> trim(l)),
                           l -> length(l) > 0) AS lines,
               CASE WHEN length(trim(text)) = 0 THEN []
                    ELSE string_split_regex(trim(lower(text)), '\s+')
               END AS toks,
               {hits_sql}
        FROM documents
    ),
    rep AS (
        SELECT doc_id,
               CASE WHEN len(lines) > 0
                    THEN CAST(len(lines) - len(list_distinct(lines)) AS DOUBLE)
                         / len(lines)
                    ELSE 0.0 END AS dup_line_frac_raw,
               CASE WHEN len(toks) >= 2 THEN
                   list_transform(range(1, len(toks)),
                                  i -> toks[i] || ' ' || toks[i + 1])
               ELSE [] END AS grams
        FROM base
    ),
    rep2 AS (
        SELECT doc_id, dup_line_frac_raw,
               CASE WHEN len(grams) > 0
                    THEN CAST(list_max(list_transform(list_distinct(grams),
                             g -> len(list_filter(grams, x -> x = g)))) AS DOUBLE)
                         / len(grams)
                    ELSE 0.0 END AS top_bigram_frac_raw
        FROM rep
    )
    SELECT base.doc_id,
           ROUND((
               least(n_chars / 500.0, CAST(1.0 AS DOUBLE))
               + CASE WHEN n_tok > 0
                           AND n_chars / n_tok >= 3
                           AND n_chars / n_tok <= 12
                      THEN 1.0 ELSE 0.5 END
               + CASE WHEN n_chars > 0
                      THEN 1.0 - least(CAST(n_punct AS DOUBLE) / n_chars * 5.0,
                                       CAST(1.0 AS DOUBLE))
                      ELSE 0.0 END
           ) / 3.0, 6) AS quality,
           fingerprint,
           labeled_lang,
           CASE WHEN greatest({best}) = 0 THEN 'und'
                {case}
                ELSE '{codes_desc[-1]}' END AS guessed_lang,
           n_emails,
           n_phones,
           ROUND(dup_line_frac_raw, 6) AS dup_line_frac,
           ROUND(top_bigram_frac_raw, 6) AS top_bigram_frac
    FROM base JOIN rep2 ON base.doc_id = rep2.doc_id
    """


@register("doc_profile", _doc_profile_sql())
def doc_profile(spark, sf_dir):
    """Per-document profile in one pass: heuristic quality score
    (length / token-shape / punctuation terms), polynomial rolling-hash
    fingerprint (base 31 mod 2^31-1, native aggregate() over the char
    array), stopword-profile language ID next to the labeled lang
    column (tie-break: most hits wins; equal hits → lexicographically
    larger code, mirrored by the descending CASE chain in the oracle),
    PII detection counts (email/phone regex, RE2-compatible dialect),
    and Gopher-style repetition signals (duplicate-line fraction,
    top-bigram fraction). Merges the former doc_quality_scores /
    doc_fingerprints / lang_guess_docs queries so the driver sweep
    covers every registry entry; each column remains individually
    oracle-checked. One narrow projection — every signal is a native
    expression over the row, no shuffle."""
    from data_pipelines_spark.functions.text import (
        duplicate_line_fraction,
        email_count,
        lang_guess,
        phone_count,
        top_ngram_fraction,
    )

    tune(spark)
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        quality_score(F.col("text")).alias("quality"),
        rolling_fingerprint(F.col("text")).alias("fingerprint"),
        F.col("lang").alias("labeled_lang"),
        lang_guess(F.col("text")).alias("guessed_lang"),
        email_count(F.col("text")).alias("n_emails"),
        phone_count(F.col("text")).alias("n_phones"),
        F.round(duplicate_line_fraction(F.col("text")), 6).alias("dup_line_frac"),
        F.round(top_ngram_fraction(F.col("text"), 2), 6).alias("top_bigram_frac"),
    )


@register(
    "embedding_cosine_topk",
    """
    WITH q AS (
        SELECT embedding::DOUBLE[] AS qvec FROM embeddings WHERE vec_id = 0
    ),
    scored AS (
        SELECT e.vec_id,
               list_dot_product(e.embedding::DOUBLE[], q.qvec)
               / (sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]))
                  * sqrt(list_dot_product(q.qvec, q.qvec))) AS cosine_raw
        FROM embeddings e, q
        WHERE e.vec_id <> 0
    )
    SELECT vec_id, ROUND(cosine_raw, 6) AS cosine
    FROM scored
    ORDER BY cosine_raw DESC, vec_id ASC
    LIMIT 10
    """,
)
def embedding_cosine_topk(spark, sf_dir):
    """Brute-force cosine top-k against vec_id=0 — the exact ANN
    baseline (native zip_with/aggregate arithmetic, broadcast query)."""
    tune(spark)
    emb = load_table(spark, sf_dir, "embeddings")
    query = emb.where(F.col("vec_id") == 0).select(
        F.col("embedding").alias("qvec")
    )
    return brute_force_topk(emb.where(F.col("vec_id") != 0), query, k=10)


def _planes_sql(num_planes: int = 4, dim: int = 64, seed: int = 42) -> str:
    """SQL expression computing the hyperplane-LSH bucket id for a
    DOUBLE[] column named ``v`` — the plane coefficients are the SAME
    deterministic numpy draw the Spark operator uses, embedded as list
    literals, so bucket assignment matches bit-for-bit."""
    from data_pipelines_spark.operators.similarity import random_hyperplanes

    planes = random_hyperplanes(dim, num_planes, seed)
    bits = [
        f"(CASE WHEN list_dot_product(v, "
        f"[{', '.join(repr(float(x)) for x in plane)}]::DOUBLE[]) >= 0 "
        f"THEN {1 << i} ELSE 0 END)"
        for i, plane in enumerate(planes)
    ]
    return " + ".join(bits)


_NEAR_DUP_SQL = f"""
    WITH b AS (
        SELECT vec_id, embedding::DOUBLE[] AS v,
               {_planes_sql()} AS bucket
        FROM embeddings
    )
    SELECT a.vec_id AS vec_a, c.vec_id AS vec_b,
           ROUND(list_dot_product(a.v, c.v)
                 / (sqrt(list_dot_product(a.v, a.v))
                    * sqrt(list_dot_product(c.v, c.v))), 6) AS cosine
    FROM b a JOIN b c ON a.bucket = c.bucket AND a.vec_id < c.vec_id
    WHERE list_dot_product(a.v, c.v)
          / (sqrt(list_dot_product(a.v, a.v))
             * sqrt(list_dot_product(c.v, c.v))) >= 0.3
"""


@register("embedding_near_dup_pairs", _NEAR_DUP_SQL)
def embedding_near_dup_pairs(spark, sf_dir):
    """Embedding-cosine near-duplicate pairs within LSH hyperplane
    buckets. The oracle embeds the SAME seeded hyperplanes as SQL list
    literals, so bucketing, pairing, and cosine all reproduce exactly."""
    tune(spark)
    emb = load_table(spark, sf_dir, "embeddings")
    return embedding_near_duplicates(emb, dim=64, threshold=0.3, num_planes=4)


_LSH_TOPK_SQL = f"""
    WITH b AS (
        SELECT vec_id, embedding::DOUBLE[] AS v,
               {_planes_sql()} AS bucket
        FROM embeddings
    ),
    q AS (SELECT v AS qvec, bucket FROM b WHERE vec_id = 0),
    scored AS (
        SELECT e.vec_id,
               list_dot_product(e.v, q.qvec)
               / (sqrt(list_dot_product(e.v, e.v))
                  * sqrt(list_dot_product(q.qvec, q.qvec))) AS cosine_raw
        FROM b e JOIN q ON e.bucket = q.bucket
        WHERE e.vec_id <> 0
    )
    SELECT vec_id, ROUND(cosine_raw, 6) AS cosine
    FROM scored ORDER BY cosine_raw DESC, vec_id ASC LIMIT 10
"""


@register("embedding_lsh_topk", _LSH_TOPK_SQL)
def embedding_lsh_topk(spark, sf_dir):
    """Approximate top-k via random-hyperplane buckets — the 100 TB
    search path (bucket = partition-prunable key); oracle shares the
    seeded planes."""
    tune(spark)
    emb = load_table(spark, sf_dir, "embeddings")
    query = emb.where(F.col("vec_id") == 0).select(
        F.col("embedding").alias("qvec")
    )
    return lsh_bucketed_topk(
        emb.where(F.col("vec_id") != 0), query, dim=64, k=10, num_planes=4
    )


def _minhash_oracle_sql(num_hashes: int = 64, num_bands: int = 16, k: int = 5,
                        threshold: float = 0.5) -> str:
    """Build the exact SQL twin of the portable MinHash pipeline: char
    shingles → md5-derived 32-bit hashes → universal-hash minima → band
    keys → candidate pairs → signature-estimated Jaccard."""
    from data_pipelines_spark.operators.dedup import _hash_params

    r = num_hashes // num_bands
    hash_exprs = ",\n               ".join(
        f"list_min(list_transform(hs, h -> (h * {a} + {b}) % 2147483647))"
        for a, b in _hash_params(num_hashes)
    )
    band_key = " || ',' || ".join(
        f"CAST(sig[band * {r} + {j + 1}] AS VARCHAR)" for j in range(r)
    )
    return f"""
    WITH sh AS (
        SELECT doc_id,
               list_distinct(list_transform(
                   range(1, greatest(length(text) - {k - 1}, 1) + 1),
                   i -> substr(lower(text), i, {k}))) AS s
        FROM documents
    ),
    hashed AS (
        SELECT doc_id,
               list_transform(s, sg -> list_reduce(
                   list_prepend(CAST(0 AS BIGINT),
                       list_transform(string_split(substr(md5(sg), 1, 8), ''),
                                      c -> CAST(instr('0123456789abcdef', c) - 1 AS BIGINT))),
                   (a, x) -> a * 16 + x)) AS hs
        FROM sh
    ),
    sigs AS (
        SELECT doc_id,
               [{hash_exprs}] AS sig
        FROM hashed
    ),
    buckets AS (
        SELECT doc_id, band, {band_key} AS key
        FROM sigs, range(0, {num_bands}) t(band)
    ),
    cand AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM buckets a
        JOIN buckets b ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
    ),
    pairs AS (
        SELECT doc_a, doc_b,
               CAST(len(list_filter(range(1, {num_hashes + 1}),
                                    i -> sa.sig[i] = sb.sig[i])) AS DOUBLE)
               / {num_hashes} AS est
        FROM cand
        JOIN sigs sa ON sa.doc_id = cand.doc_a
        JOIN sigs sb ON sb.doc_id = cand.doc_b
    )
    SELECT doc_a, doc_b, ROUND(est, 6) AS est_jaccard
    FROM pairs WHERE est >= {threshold}
    """


@register("minhash_near_dup_portable", _minhash_oracle_sql())
def minhash_near_dup_portable(spark, sf_dir):
    """The full MinHash+LSH pipeline in portable-hash mode (md5-derived
    shingle hashes, raw band keys) — EXACTLY reproduced by a DuckDB
    oracle, including bucket membership and the estimated Jaccard."""
    tune(spark)
    docs = load_table(spark, sf_dir, "documents")
    return minhash_near_duplicates(docs, jaccard_threshold=0.5, portable=True)


_CLUSTERS_SQL = f"""
    WITH RECURSIVE pairs AS ({_minhash_oracle_sql()}),
    sym AS (
        SELECT doc_a AS src, doc_b AS dst FROM pairs
        UNION ALL
        SELECT doc_b AS src, doc_a AS dst FROM pairs
    ),
    reach(a, b) AS (
        SELECT doc_id, doc_id FROM documents
        UNION
        SELECT r.a, s.dst FROM reach r JOIN sym s ON r.b = s.src
    )
    SELECT a AS doc_id, min(b) AS cluster_id
    FROM reach GROUP BY a
"""


@register("dedup_clusters", _CLUSTERS_SQL)
def dedup_clusters(spark, sf_dir):
    """The full dedup stack end-to-end: portable minhash pairs →
    connected components (iterative min-label propagation) → cluster
    assignment per doc. Oracle: the same pairs fed through a recursive
    CTE computing each node's minimum reachable id — an iterative Spark
    algorithm exactly checked against recursive SQL."""
    from data_pipelines_spark.operators.dedup import duplicate_clusters

    tune(spark)
    docs = load_table(spark, sf_dir, "documents")
    pairs = minhash_near_duplicates(docs, jaccard_threshold=0.5, portable=True)
    return duplicate_clusters(docs, pairs)


@register("minhash_near_dup_pairs")
def minhash_near_dup_pairs(spark, sf_dir):
    """MinHash+LSH near-duplicate candidate pairs with signature-
    estimated Jaccard (xxhash64-based → no SQL oracle; semantics
    unit-tested on planted near-duplicates in tests/test_dedup.py)."""
    tune(spark)
    docs = load_table(spark, sf_dir, "documents")
    return minhash_near_duplicates(docs, jaccard_threshold=0.5)


def _simhash_oracle_sql(bits: int = 60) -> str:
    """SQL twin of the portable SimHash: md5-derived 60-bit token
    hashes, per-bit +1/-1 sums, sign bits packed into a BIGINT."""
    bit_sums = ",\n               ".join(
        f"sum(CASE WHEN (h >> {i}) & 1 = 1 THEN 1 ELSE -1 END) AS b{i}"
        for i in range(bits)
    )
    packed = " + ".join(
        f"(CASE WHEN b{i} > 0 THEN {1 << i}::BIGINT ELSE 0 END)" for i in range(bits)
    )
    return f"""
    WITH toks AS (
        SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\\s+')) AS tok
        FROM documents
    ),
    hashed AS (
        SELECT doc_id,
               list_reduce(
                   list_prepend(CAST(0 AS BIGINT),
                       list_transform(string_split(substr(md5(tok), 1, 15), ''),
                                      c -> CAST(instr('0123456789abcdef', c) - 1 AS BIGINT))),
                   (a, x) -> a * 16 + x) AS h
        FROM toks
    ),
    sums AS (
        SELECT doc_id,
               {bit_sums}
        FROM hashed GROUP BY doc_id
    )
    SELECT doc_id, {packed} AS simhash
    FROM sums
    """


@register("simhash_portable", _simhash_oracle_sql())
def simhash_portable(spark, sf_dir):
    """Portable 60-bit SimHash — md5-derived token hashes reproduced
    exactly by the DuckDB oracle (per-bit vote sums + sign packing)."""
    tune(spark)
    docs = load_table(spark, sf_dir, "documents")
    return simhash_signatures(docs, portable=True)


@register(
    "ngram_jaccard_same_source",
    """
    WITH sh AS (
        SELECT doc_id, source,
               list_distinct(list_transform(
                   range(1, greatest(length(text) - 2, 1) + 1),
                   i -> substr(lower(text), i, 3))) AS shingles
        FROM documents
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           ROUND(
               CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
               / (len(a.shingles) + len(b.shingles)
                  - len(list_intersect(a.shingles, b.shingles))),
               6) AS jaccard
    FROM sh a JOIN sh b ON a.source = b.source AND a.doc_id < b.doc_id
    WHERE CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
          / (len(a.shingles) + len(b.shingles)
             - len(list_intersect(a.shingles, b.shingles))) >= 0.5
    """,
)
def ngram_jaccard_same_source(spark, sf_dir):
    """Exact character-3-gram Jaccard over candidate pairs blocked by
    `source` — the verification stage of the dedup stack, with the
    blocking key standing in for LSH buckets."""
    tune(spark)
    docs = load_table(spark, sf_dir, "documents")
    return ngram_jaccard_pairs(
        docs, shingle_k=3, threshold=0.5, bucket_col="source"
    )


@register("embedding_ivf_topk")
def embedding_ivf_topk(spark, sf_dir):
    """IVF ANN: deterministic k-means coarse quantizer → probe the
    query's nearest inverted lists → exact cosine within them. The
    second approximate-search tier next to hyperplane LSH (rows-only:
    the k-means fit is iterative float averaging, engine-specific by
    nature; the cosine kernel itself is oracle-checked elsewhere)."""
    from data_pipelines_spark.operators.similarity import (
        ivf_assign,
        ivf_topk,
        kmeans_centroids,
    )

    tune(spark)
    emb = load_table(spark, sf_dir, "embeddings")
    cents = kmeans_centroids(emb, k=8, max_iterations=5)
    indexed = ivf_assign(emb.where(F.col("vec_id") != 0), cents)
    query = emb.where(F.col("vec_id") == 0).select(F.col("embedding").alias("qvec"))
    return ivf_topk(indexed, query, cents, k=10, nprobe=2)
