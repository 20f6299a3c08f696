"""Corpus-curation queries over the `documents` table: vocabulary
statistics, deterministic data-mixing (stratified sampling), and
benchmark decontamination — the training-data-pipeline tier above
dedup (operators/corpus.py).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from data_pipelines_spark.functions.text import _ACCENT_DST, _ACCENT_SRC
from data_pipelines_spark.operators.corpus import (
    contamination_check,
    hash_fraction,
    vocabulary_stats,
)
from data_pipelines_spark.session import tune
from data_pipelines_spark.sources.tables import load_table
from data_pipelines_spark.suite._registry import make_registry

QUERIES, ORACLES, register = make_registry()

_TOKS = (
    "CASE WHEN length(trim(text)) = 0 THEN [] "
    "ELSE string_split_regex(trim(lower(text)), '\\s+') END"
)


@register(
    "vocabulary_stats",
    rf"""
    WITH toks AS (
        SELECT doc_id, unnest({_TOKS}) AS token
        FROM documents
    ),
    counts AS (
        SELECT token,
               count(*) AS token_cnt,
               count(DISTINCT doc_id) AS doc_cnt
        FROM toks GROUP BY token
    ),
    n_docs AS (SELECT count(*) AS n FROM documents),
    mg_counts AS (
        SELECT doc_id % 8 AS batch, token, count(*) AS cnt
        FROM toks GROUP BY 1, 2
    ),
    mg_ranked AS (
        SELECT batch, token, cnt,
               row_number() OVER (PARTITION BY batch
                                  ORDER BY cnt DESC, token) AS rk
        FROM mg_counts
    ),
    mg_d AS (SELECT batch, cnt AS d FROM mg_ranked WHERE rk = 101),
    mg_store AS (
        SELECT r.batch, r.token,
               r.cnt - COALESCE(d.d, 0) AS counter,
               COALESCE(d.d, 0) AS dec
        FROM mg_ranked r LEFT JOIN mg_d d ON r.batch = d.batch
        WHERE r.rk <= 100 AND r.cnt - COALESCE(d.d, 0) > 0
    ),
    mg_sum AS (
        SELECT token, CAST(SUM(counter) AS BIGINT) AS est
        FROM mg_store GROUP BY 1
    ),
    mg_db AS (
        SELECT CAST(COALESCE(SUM(dec), 0) AS BIGINT) AS d_batches
        FROM (SELECT DISTINCT batch, dec FROM mg_store)
    ),
    mg_rk AS (
        SELECT token, est,
               row_number() OVER (ORDER BY est DESC, token) AS rk
        FROM mg_sum
    ),
    mg_d2 AS (
        SELECT CAST(COALESCE(MAX(CASE WHEN rk = 101 THEN est END), 0)
                    AS BIGINT) AS d2
        FROM mg_rk
    )
    SELECT * FROM (
        SELECT 'exact' AS method, token, token_cnt, doc_cnt,
               round(ln((CAST(n AS DOUBLE) - CAST(doc_cnt AS DOUBLE) + 0.5)
                        / (CAST(doc_cnt AS DOUBLE) + 0.5) + 1.0), 6) AS idf,
               CAST(row_number() OVER (ORDER BY token_cnt DESC, token)
                    AS BIGINT) AS rank
        FROM counts, n_docs
        ORDER BY token_cnt DESC, token
        LIMIT 100
    )
    UNION ALL
    SELECT 'mg', token, est - d2, d_batches + d2,
           CAST(NULL AS DOUBLE), CAST(rk AS BIGINT)
    FROM mg_rk, mg_d2, mg_db
    WHERE rk <= 100 AND est - d2 > 0
    """,
)
def vocabulary_stats_query(spark, sf_dir):
    """Zipf head of the corpus vocabulary, two method-tagged tiers:

    - ``exact``: top-100 tokens by frequency with document counts,
      BM25 inverse document frequency (the idf the `operators.ranking`
      scorers consume; N is a single-row broadcast), and a
      deterministic rank (ties broken by token). TakeOrdered head +
      bounded-head rank — no corpus-wide single-partition window.
    - ``mg``: the same head through the MERGEABLE top-k store
      (`operators.sketches.topk_sketch` / `merge_topk_sketches` —
      Misra-Gries compression per content-derived batch
      ``doc_id % 8``, counters summed and re-compressed on merge).
      ``token_cnt`` carries the lower-bound estimate, ``doc_cnt`` the
      accumulated error bound (true count <= est + err, asserted in
      tests/test_sketches.py); the oracle replays every rank,
      decrement, and merge step in SQL.
    """
    from data_pipelines_spark.functions.text import tokens as _tokens
    from data_pipelines_spark.operators.sketches import (
        merge_topk_sketches,
        topk_sketch,
    )

    tune(spark)
    docs = load_table(spark, sf_dir, "documents")
    exact = vocabulary_stats(docs, top_k=100, with_idf=True).select(
        F.lit("exact").alias("method"),
        "token", "token_cnt", "doc_cnt", "idf", "rank",
    )
    toks = docs.select(
        (F.col("doc_id") % 8).alias("batch"),
        F.explode(_tokens(F.col("text"))).alias("token"),
    )
    mg = merge_topk_sketches(
        topk_sketch(toks, "token", k=100, batch_col="batch"), k=100
    ).select(
        F.lit("mg").alias("method"),
        F.col("key").alias("token"),
        F.col("est_min").alias("token_cnt"),
        F.col("max_err").alias("doc_cnt"),
        F.lit(None).cast("double").alias("idf"),
        F.col("rank").cast("long").alias("rank"),
    )
    return exact.unionByName(mg)


def _md5_frac_sql(id_expr: str, salt: str) -> str:
    """DuckDB restatement of hash_fraction(..., portable=True): first 8
    md5 hex chars parsed to an integer over 2^32."""
    return (
        "list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform("
        f"string_split(substr(md5(CAST({id_expr} AS VARCHAR) || ':' || '{salt}'), 1, 8), ''), "
        "ch -> CAST(instr('0123456789abcdef', ch) - 1 AS BIGINT))), "
        "(a, x) -> a * 16 + x) / 4294967296.0"
    )


_SPLIT_WEIGHTS = {"train": 0.9, "val": 0.05, "test": 0.05}
_TOKEN_BUDGET = 800.0  # per-source token budget for the sample flag

_SPLIT_SHUFFLE_SQL = f"""
    WITH base AS (
        SELECT doc_id, source, text,
               min(doc_id) OVER (PARTITION BY md5(text)) AS cluster
        FROM documents
    ),
    hashed AS (
        SELECT doc_id, source,
               {_md5_frac_sql("doc_id", "split")} AS f_split,
               {_md5_frac_sql("cluster", "split")} AS f_safe,
               {_md5_frac_sql("doc_id", "shuffle")} AS f_shuffle,
               {_md5_frac_sql("doc_id", "upsample")} AS f_up,
               {_md5_frac_sql("source || '/' || CAST(doc_id AS VARCHAR)", "tokbudget")} AS f_tb,
               len({_TOKS}) AS n_toks
        FROM base
    ),
    counts AS (
        SELECT source, CAST(sum(n_toks) AS BIGINT) AS n_w
        FROM hashed GROUP BY 1
    ),
    wts AS (
        SELECT source, n_w,
               CAST(round(sqrt(n_w), 6) AS DECIMAL(28,6)) AS w6
        FROM counts
    ),
    tot AS (
        SELECT sum(w6) AS sw, CAST(sum(n_w) AS DOUBLE) * 1.0 AS b
        FROM wts
    ),
    rates AS (
        SELECT source,
               round(CAST(w6 AS DOUBLE) / CAST(sw AS DOUBLE) * b
                     / CAST(n_w AS DOUBLE), 6) AS rate
        FROM wts, tot
    ),
    positioned AS (
        SELECT h.doc_id, h.source,
               CASE WHEN h.f_split < 0.05 THEN 'test'
                    WHEN h.f_split < 0.95 THEN 'train'
                    ELSE 'val' END AS split,
               CASE WHEN h.f_safe < 0.05 THEN 'test'
                    WHEN h.f_safe < 0.95 THEN 'train'
                    ELSE 'val' END AS split_safe,
               CAST(row_number() OVER (ORDER BY h.f_shuffle, h.doc_id)
                    AS BIGINT) AS shuffle_pos,
               CAST(floor(r.rate) AS BIGINT)
               + CASE WHEN h.f_up < r.rate - floor(r.rate)
                      THEN 1 ELSE 0 END AS n_repeats,
               CAST(coalesce(sum(h.n_toks) OVER (
                        PARTITION BY h.source ORDER BY h.f_tb, h.doc_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                    ), 0) AS DOUBLE) + CAST(h.n_toks AS DOUBLE)
                    <= {_TOKEN_BUDGET} AS in_token_budget
        FROM hashed h JOIN rates r USING (source)
    )
    SELECT doc_id, source, split, split_safe, shuffle_pos, n_repeats,
           in_token_budget,
           unnest(range(1, n_repeats + 1)) AS copy_no
    FROM positioned
"""


@register("corpus_split_shuffle", _SPLIT_SHUFFLE_SQL)
def corpus_split_shuffle(spark, sf_dir):
    """Deterministic train/val/test assignment + seeded global shuffle
    position + temperature-based mixture upsampling per document
    (`operators.corpus.assign_splits` / `seeded_shuffle` /
    `temperature_upsample`, portable-hash mode so the oracle reproduces
    every coin flip, the full permutation, and every mixture rate).

    The split is a pure narrow map (a doc never migrates between splits
    across runs or repartitionings); the shuffle rank is the two-phase
    `plans.windows.global_rank` over a uniform hash key — a distributed
    range sort, never a single-partition window, balanced by
    construction at any corpus size. The α=0.5 mixture weighs each
    source by its token count (sqrt-flattened, budget-preserving) and
    explodes each doc into its drawn copies — `n_repeats` and `copy_no`
    are hash-checked per copy, docs drawn zero times drop out.

    `in_token_budget` is `operators.corpus.sample_token_budget` in flag
    mode: the maximal coin-order prefix of each source whose token
    total fits an 800-token budget (two-phase grouped running sum — no
    one-partition-per-source window); the oracle replays the prefix cut
    with the same portable coins.

    `split_safe` is `operators.corpus.assign_splits_leakage_safe` fed by
    exact-dup clusters (the `operators.dedup.exact_duplicates` keeper
    rule — min doc id per content hash — computed over the shared
    hashed projection): byte-identical documents always land in the
    SAME split, where the per-doc `split` column can put them on both
    sides of the train/test boundary. The oracle replays the cluster
    label as `min(doc_id) OVER (PARTITION BY md5(text))`."""
    from data_pipelines_spark.functions.text import token_count
    from data_pipelines_spark.operators.corpus import (
        assign_splits,
        assign_splits_leakage_safe,
        sample_token_budget,
        seeded_shuffle,
        temperature_upsample,
    )

    tune(spark)
    raw = load_table(spark, sf_dir, "documents")
    # The token-weighted projection feeds the mixture-rate aggregation,
    # the per-doc rows, AND (via __md5) both sides of the cluster
    # derivation (measured: 6 scans unpersisted before the hash column
    # even existed). One scan, one md5 evaluation. Session-scoped
    # cache, same contract as corpus_doc_curation's: repeat-measuring
    # harnesses clearCache() between passes (bench.py).
    docs = raw.select(
        "doc_id",
        "source",
        token_count(F.lower(F.col("text"))).alias("__ntok"),
        F.md5(F.encode(F.col("text"), "UTF-8")).alias("__md5"),
    ).persist()
    # Exact-dup cluster labels: hash-groupBy keeper (exact_duplicates'
    # min-id rule) + equi join back on the content hash — map-side
    # combined, never a text-partitioned window sort. Cluster-grain
    # hashing is what makes `split_safe` leakage-free.
    clusters = docs.select("doc_id", "__md5").join(
        docs.groupBy("__md5").agg(F.min("doc_id").alias("cluster_id")),
        "__md5",
    ).select("doc_id", "cluster_id")
    out = assign_splits(docs, _SPLIT_WEIGHTS, portable=True)
    out = assign_splits_leakage_safe(
        out, clusters, _SPLIT_WEIGHTS, portable=True, out_col="split_safe"
    )
    out = seeded_shuffle(out, portable=True)
    out = sample_token_budget(
        out,
        _TOKEN_BUDGET,
        weight_col="__ntok",
        group_col="source",
        portable=True,
        flag_col="in_token_budget",
    )
    up = temperature_upsample(
        out, "source", alpha=0.5, weight_col=F.col("__ntok"), portable=True
    )
    return up.select(
        "doc_id", "source", "split", "split_safe", "shuffle_pos", "n_repeats",
        "in_token_budget", "copy_no"
    )


_MIX_RATES = {"src0": 1.0, "src1": 0.5, "src2": 0.25}
_MIX_DEFAULT = 0.1
_BENCH_MAX_ID = 20  # docs below this id play the held-out benchmark
_NGRAM_N = 8
_SEQ_LEN = 512  # training-sequence length for the packing columns
_CHUNK_TOKENS = 32  # retrieval chunk window for the chunking columns
_CHUNK_OVERLAP = 8
_CHUNK_STRIDE = _CHUNK_TOKENS - _CHUNK_OVERLAP


def _grams_sql(n: int) -> str:
    parts = " || ' ' || ".join(f"toks[i + {j}]" for j in range(n))
    return (
        f"CASE WHEN len(toks) >= {n} THEN "
        f"list_transform(range(1, len(toks) - {n} + 2), i -> {parts}) "
        f"ELSE [] END"
    )


_CURATION_SQL = rf"""
    WITH corpus AS (
        SELECT doc_id, source, text FROM documents WHERE doc_id >= {_BENCH_MAX_ID}
    ),
    bench_grams AS (
        SELECT DISTINCT unnest(grams) AS gram
        FROM (
            SELECT {_grams_sql(_NGRAM_N)} AS grams
            FROM (SELECT {_TOKS} AS toks FROM documents
                  WHERE doc_id < {_BENCH_MAX_ID})
        )
    ),
    doc_grams AS (
        SELECT doc_id, unnest(grams) AS gram
        FROM (
            SELECT doc_id, {_grams_sql(_NGRAM_N)} AS grams
            FROM (SELECT doc_id, {_TOKS} AS toks FROM corpus)
        )
    ),
    contaminated AS (
        SELECT d.doc_id, count(DISTINCT d.gram) AS matched_ngrams
        FROM doc_grams d JOIN bench_grams b ON d.gram = b.gram
        GROUP BY d.doc_id
    ),
    lines_pd AS (
        SELECT doc_id,
               list_filter(list_transform(string_split(text, chr(10)),
                                          l -> trim(l)),
                           l -> length(l) > 0) AS lines
        FROM corpus
    ),
    boiler AS (
        SELECT line FROM (
            SELECT doc_id, unnest(list_distinct(lines)) AS line FROM lines_pd
        ) GROUP BY line HAVING count(*) >= 2
    ),
    boiler_list AS (
        SELECT coalesce(list(line), []) AS bl FROM boiler
    ),
    cleaned AS (
        SELECT doc_id,
               len(lines) AS n_lines,
               list_filter(lines, l -> NOT list_contains(bl, l)) AS kept
        FROM lines_pd, boiler_list
    ),
    corpus_toks AS (
        SELECT doc_id, unnest(toks) AS token
        FROM (SELECT doc_id, {_TOKS} AS toks FROM corpus)
    ),
    vocab AS (
        SELECT token, count(*) AS cnt FROM corpus_toks GROUP BY token
    ),
    vocab_total AS (SELECT sum(cnt) AS total FROM vocab),
    lm AS (
        SELECT doc_id,
               CAST(count(*) AS BIGINT) AS n_tokens,
               round(CAST(sum(CAST(round(log10(cnt / total), 6)
                                   AS DECIMAL(28,8))) AS DOUBLE)
                     / count(*), 6) AS lm_logprob10
        FROM corpus_toks JOIN vocab USING (token), vocab_total
        GROUP BY doc_id
    ),
    decided AS (
        SELECT c.doc_id, c.source,
               list_reduce(list_prepend(CAST(0 AS BIGINT),
                   list_transform(
                       string_split(substr(md5(CAST(c.doc_id AS VARCHAR) || ':' || 'mix'), 1, 8), ''),
                       ch -> CAST(instr('0123456789abcdef', ch) - 1 AS BIGINT))),
                   (a, x) -> a * 16 + x) / 4294967296.0
               < CASE c.source WHEN 'src0' THEN 1.0 WHEN 'src1' THEN 0.5
                               WHEN 'src2' THEN 0.25 ELSE {_MIX_DEFAULT} END
                   AS keep_sample,
               COALESCE(ct.matched_ngrams, 0) AS matched_ngrams
        FROM corpus c
        LEFT JOIN contaminated ct ON c.doc_id = ct.doc_id
    ),
    packed AS (
        SELECT doc_id,
               CAST(floor(cum_before / {_SEQ_LEN}) AS BIGINT) AS seq_id,
               CAST(cum_before % {_SEQ_LEN} AS BIGINT) AS seq_off,
               CAST(floor((cum_before + greatest(n_tokens, 1) - 1) / {_SEQ_LEN})
                    - floor(cum_before / {_SEQ_LEN}) + 1 AS BIGINT) AS seq_spans
        FROM (
            SELECT d.doc_id,
                   COALESCE(l.n_tokens, 0) AS n_tokens,
                   COALESCE(sum(l.n_tokens) OVER (
                       PARTITION BY d.source ORDER BY d.doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                       AS cum_before
            FROM decided d LEFT JOIN lm l ON d.doc_id = l.doc_id
            WHERE d.keep_sample AND d.matched_ngrams = 0
        )
    ),
    chunk_rows AS (
        SELECT doc_id, s,
               list_slice(toks, s + 1, s + {_CHUNK_TOKENS}) AS w
        FROM (
            SELECT doc_id, toks,
                   unnest(range(0,
                       (CASE WHEN len(toks) > {_CHUNK_TOKENS}
                             THEN ((len(toks) - {_CHUNK_TOKENS}
                                    + {_CHUNK_STRIDE - 1}) // {_CHUNK_STRIDE})
                                  * {_CHUNK_STRIDE}
                             ELSE 0 END) + 1,
                       {_CHUNK_STRIDE})) AS s
            FROM (SELECT doc_id, {_TOKS} AS toks FROM corpus)
            WHERE len(toks) > 0
        )
    ),
    chunked AS (
        SELECT doc_id,
               CAST(count(*) AS BIGINT) AS n_chunks,
               CAST(sum(len(w)) AS BIGINT) AS chunk_tokens_total,
               md5(string_agg(CAST(s AS VARCHAR) || ':'
                              || array_to_string(w, ' '),
                              chr(10) ORDER BY s)) AS chunks_md5
        FROM chunk_rows
        GROUP BY doc_id
    ),
    dsir_target_g AS (
        SELECT unnest(list_concat(toks, {_grams_sql(2)})) AS g
        FROM (SELECT {_TOKS} AS toks FROM documents
              WHERE doc_id < {_BENCH_MAX_ID})
    ),
    dsir_raw_g AS (
        SELECT doc_id,
               CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
                   list_transform(
                       string_split(substr(md5('dsir:' || g), 1, 8), ''),
                       ch -> CAST(instr('0123456789abcdef', ch) - 1
                                  AS BIGINT))),
                   (a, x) -> a * 16 + x) % 10000 AS INT) AS bucket
        FROM (
            SELECT doc_id, unnest(list_concat(toks, {_grams_sql(2)})) AS g
            FROM (SELECT doc_id, {_TOKS} AS toks FROM corpus)
        )
    ),
    dsir_target_b AS (
        SELECT CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
                   list_transform(
                       string_split(substr(md5('dsir:' || g), 1, 8), ''),
                       ch -> CAST(instr('0123456789abcdef', ch) - 1
                                  AS BIGINT))),
                   (a, x) -> a * 16 + x) % 10000 AS INT) AS bucket,
               count(*) AS ct
        FROM dsir_target_g GROUP BY 1
    ),
    dsir_raw_b AS (
        SELECT bucket, count(*) AS cr FROM dsir_raw_g GROUP BY 1
    ),
    dsir_tt AS (
        SELECT CAST(coalesce(sum(ct), 0) AS DOUBLE) AS tt FROM dsir_target_b
    ),
    dsir_tr AS (
        SELECT CAST(coalesce(sum(cr), 0) AS DOUBLE) AS tr FROM dsir_raw_b
    ),
    dsir_ratio AS (
        SELECT bucket,
               CAST(round(ln(((coalesce(ct, 0) + 1.0) / (tt + 10000.0))
                             / ((coalesce(cr, 0) + 1.0) / (tr + 10000.0))),
                          6) AS DECIMAL(28,8)) AS lr
        FROM dsir_raw_b
        FULL OUTER JOIN dsir_target_b USING (bucket), dsir_tt, dsir_tr
    ),
    dsir AS (
        SELECT doc_id,
               CAST(count(*) AS BIGINT) AS dsir_features,
               round(CAST(sum(lr) AS DOUBLE), 6) AS dsir_logweight
        FROM dsir_raw_g JOIN dsir_ratio USING (bucket)
        GROUP BY doc_id
    ),
    kn_pairs AS (
        SELECT doc_id,
               CASE WHEN i = 1 THEN '<s>' ELSE toks[i - 1] END AS w1,
               toks[i] AS w2
        FROM (
            SELECT doc_id, toks, unnest(range(1, len(toks) + 1)) AS i
            FROM (SELECT doc_id, {_TOKS} AS toks FROM corpus)
            WHERE len(toks) > 0
        )
    ),
    kn_bi AS (
        SELECT w1, w2, count(*) AS c12 FROM kn_pairs GROUP BY 1, 2
    ),
    kn_ctx AS (
        SELECT w1, CAST(sum(c12) AS BIGINT) AS c1, count(*) AS n1f
        FROM kn_bi GROUP BY 1
    ),
    kn_cont AS (
        SELECT w2, count(*) AS n1b FROM kn_bi GROUP BY 1
    ),
    kn_types AS (SELECT count(*) AS n1pp FROM kn_bi),
    kn_model AS (
        SELECT w1, w2,
               (c12 - 0.75) / c1
               + (0.75 * n1f / c1) * (CAST(n1b AS DOUBLE) / n1pp) AS p12
        FROM kn_bi JOIN kn_ctx USING (w1) JOIN kn_cont USING (w2), kn_types
    ),
    kn AS (
        SELECT doc_id,
               round(CAST(sum(CAST(round(log10(p12), 6)
                                   AS DECIMAL(28,8))) AS DOUBLE)
                     / count(*), 6) AS kn_logprob10
        FROM kn_pairs JOIN kn_model USING (w1, w2)
        GROUP BY doc_id
    ),
    dupw AS (
        -- soft-dedup families: exact-dup clusters over the CCNet
        -- normalization key (the same translate/replace/regexp chain
        -- functions.text.ccnet_normalize compiles; null text stays a
        -- singleton because Spark's equi-join drops null keys)
        SELECT doc_id,
               CAST(count(*) OVER (PARTITION BY ck) AS BIGINT)
                   AS cluster_size
        FROM (
            SELECT doc_id,
                   COALESCE(substr(trim(regexp_replace(translate(replace(
                       replace(replace(translate(lower(text),
                       '{_ACCENT_SRC}', '{_ACCENT_DST}'),
                       'æ', 'ae'), 'œ', 'oe'), 'ß', 'ss'),
                       '123456789', '000000000'), '\s+', ' ', 'g')), 1, 40),
                       'null:' || CAST(doc_id AS VARCHAR)) AS ck
            FROM corpus
        )
    )
    SELECT d.doc_id, d.source, d.keep_sample, d.matched_ngrams,
           CAST(cl.n_lines AS BIGINT) AS n_lines,
           CAST(cl.n_lines - len(cl.kept) AS BIGINT) AS n_boiler_lines,
           md5(coalesce(array_to_string(cl.kept, chr(10)), ''))
               AS clean_text_md5,
           COALESCE(l.n_tokens, 0) AS n_tokens,
           l.lm_logprob10,
           p.seq_id, p.seq_off, p.seq_spans,
           ck.n_chunks, ck.chunk_tokens_total, ck.chunks_md5,
           ds.dsir_features, ds.dsir_logweight,
           kn.kn_logprob10,
           dw.cluster_size,
           round(pow(dw.cluster_size, -0.5), 6) AS dup_weight
    FROM decided d
    JOIN cleaned cl ON d.doc_id = cl.doc_id
    LEFT JOIN lm l ON d.doc_id = l.doc_id
    LEFT JOIN packed p ON d.doc_id = p.doc_id
    LEFT JOIN chunked ck ON d.doc_id = ck.doc_id
    LEFT JOIN dsir ds ON d.doc_id = ds.doc_id
    LEFT JOIN kn ON d.doc_id = kn.doc_id
    JOIN dupw dw ON d.doc_id = dw.doc_id
"""


@register("corpus_doc_curation", _CURATION_SQL)
def corpus_doc_curation(spark, sf_dir):
    """Doc-grain curation decisions, fused (one row per corpus doc):

    - ``keep_sample`` — the deterministic stratified-sampling predicate
      (data mixing: keep 100% of src0, 50% of src1, 25% of src2, 10%
      otherwise; `operators.corpus.stratified_sample` filters on exactly
      this column). Portable-hash mode so the oracle reproduces every
      coin flip; the xxhash64 fast path is equivalence-tested in
      tests/test_corpus.py.
    - ``matched_ngrams`` — benchmark decontamination: count of distinct
      8-gram overlaps with the held-out set (docs with id < 20), 0 for
      clean docs. Broadcast n-gram semi-join, the 100 TB shape.
    - ``n_lines`` / ``n_boiler_lines`` / ``clean_text_md5`` — C4-style
      corpus-level line dedup (`operators.corpus.remove_boilerplate_
      lines`): lines appearing in >=2 distinct corpus docs are stripped,
      survivors reassembled in original order (hashed here to keep the
      row narrow; the oracle reproduces the full reassembly+md5).
    - ``n_tokens`` / ``lm_logprob10`` — self-trained unigram-LM quality
      score (`operators.corpus.unigram_logprob`): mean log10 token
      probability under the corpus's own unigram distribution, the
      KenLM-perplexity-filter stand-in. DECIMAL-summed so the oracle
      reproduces it bit-for-bit.
    - ``kn_logprob10`` — interpolated Kneser-Ney BIGRAM LM score
      (`operators.corpus.kneser_ney_bigram_logprob`, the CCNet-style
      perplexity filter trained in-engine): mean log10 of
      P(w2|w1) = (c−D)/c1 + λ(w1)·P_cont(w2) over ``<s>``-prefixed
      bigrams, D = 0.75. The oracle replays the bigram/context/
      continuation counts and the exact probability arithmetic tree;
      per-event log10 rounded to 6 and DECIMAL-summed, the module's
      portability contract.
    - ``seq_id`` / ``seq_off`` / ``seq_spans`` — concat-and-chunk
      sequence packing (`operators.corpus.pack_sequences`) of the
      CURATED subset (keep_sample, uncontaminated) into 512-token
      training sequences per source stream; null for dropped docs.
      Two-phase running sum — no one-partition-per-stream window.
    - ``dsir_features`` / ``dsir_logweight`` — DSIR importance weights
      (`operators.corpus.dsir_importance_weights`, Xie et al. NeurIPS
      2023): every corpus doc scored by how much likelier its hashed
      1-2-gram features are under the held-out benchmark docs (the
      target domain) than under the corpus itself — the data-selection
      score `importance_resample` consumes. Portable md5 buckets,
      round-6 log ratios, DECIMAL sums: the oracle replays the feature
      hash, both multinomials, the smoothing, and every per-doc sum.
    - ``n_chunks`` / ``chunk_tokens_total`` / ``chunks_md5`` —
      retrieval-index chunking (`operators.corpus.chunk_documents`,
      32-token windows, 8-token overlap): chunk count, total window
      tokens, and an order-sensitive md5 over every ``start:text``
      chunk line, so window starts, the end-stopping rule (no
      subset-of-previous trailing windows), slicing, and reassembly
      are all hash-checked. Null for blank docs. The operator is a
      pure narrow map (sequence + slice + posexplode, Exchange-free);
      only this summary aggregation shuffles, at doc grain.
    - ``cluster_size`` / ``dup_weight`` — soft deduplication
      (`operators.corpus.duplicate_aware_weights`, α = 0.5): duplicate
      families are exact-dup clusters over a 40-char blocking prefix of
      the CCNet normalization key (`functions.text.ccnet_normalize` —
      prefix rather than full text so the driver corpora form real
      multi-doc families), and every doc is weighted
      ``cluster_size^-0.5`` instead of dropped — the keep-all-but-
      downweight middle ground. The oracle replays the normalize chain,
      the family count, and the pow; null-text docs are singletons by
      a per-doc sentinel key on both sides.
    """
    from data_pipelines_spark.functions.text import ccnet_normalize
    from data_pipelines_spark.operators.corpus import (
        chunk_documents,
        dsir_importance_weights,
        duplicate_aware_weights,
        kneser_ney_bigram_logprob,
        pack_sequences,
        remove_boilerplate_lines,
        unigram_logprob,
    )

    tune(spark)
    docs = load_table(spark, sf_dir, "documents")
    # The benchmark slice feeds every decontamination/DSIR branch (gram
    # sets, both multinomials) — unpersisted it re-read the documents
    # parquet 32 times in one plan (r15 plan audit). Same D1
    # persist-at-reuse and caller-owned lifecycle as `corpus` below.
    bench = docs.where(F.col("doc_id") < _BENCH_MAX_ID).persist()
    # Five curation stages (sampling, contamination, boilerplate, LM
    # scoring, packing) all re-derive from this frame; without the
    # persist each re-scans the corpus parquet (measured: 21 scans in
    # one plan). D1 persist-at-reuse: cache blocks are shared across
    # branches even within a single action, so the corpus is read once.
    # Cache lifetime is session-scoped by design (laziness forbids an
    # in-query unpersist); harnesses that measure repeated invocations
    # must clearCache() between passes, as bench.py does.
    corpus = docs.where(F.col("doc_id") >= _BENCH_MAX_ID).persist()

    rate = F.lit(float(_MIX_DEFAULT))
    for src, r in sorted(_MIX_RATES.items(), reverse=True):
        rate = F.when(F.col("source") == src, F.lit(float(r))).otherwise(rate)
    keep = hash_fraction(F.col("doc_id"), "mix", portable=True) < rate

    # Bloom-prefiltered mode: the sketch discards definite-miss doc
    # grams before the exact semi join, and the oracle's naive
    # gram-join SQL hash-checks that the result is identical to exact
    # decontamination (Bloom false positives die in the re-check; no
    # false negatives exist). bench_ngrams is a static overestimate so
    # the plan stays fully lazy — oversizing only lowers the fpp.
    flagged = contamination_check(
        corpus, bench, ngram_n=_NGRAM_N, prefilter="bloom", bench_ngrams=50_000
    )
    cleaned = remove_boilerplate_lines(corpus, min_doc_count=2)
    lm = unigram_logprob(corpus)
    kn = kneser_ney_bigram_logprob(corpus)
    dsir = dsir_importance_weights(
        corpus, bench, max_ngram=2, num_buckets=10_000,
        smoothing=1.0, portable=True,
    )

    # soft dedup (r10): duplicate-family sizes over the ccnet-normalized
    # exact-dup key, then n^(-alpha) weights — the keep-everything-but-
    # downweight alternative to dropping near-dups. Null-text docs get a
    # per-doc sentinel key so both engines treat them as singletons.
    # family key = the first 40 chars of the normalization (a blocking-
    # prefix fingerprint) rather than the full text: the driver corpora
    # have no byte-exact dups even post-normalization, and a key that
    # only ever yields singletons would leave the count+pow arithmetic
    # untested (prefix-40 forms 19-22 multi-doc families at sf<=0.01)
    clusters = corpus.select(
        "doc_id",
        F.coalesce(
            F.substring(ccnet_normalize(F.col("text")), 1, 40),
            F.concat(F.lit("null:"), F.col("doc_id").cast("string")),
        ).alias("cluster_id"),
    )
    dupw = duplicate_aware_weights(corpus, clusters, alpha=0.5)

    # `decided` (doc-grain, 4 narrow columns) feeds the packing branch
    # AND the final join; `lm` feeds the packing branch and the final
    # join too. Unpersisted, each extra consumer re-ran the whole
    # contamination / unigram-LM sub-pipeline. Same D1 persist shape
    # and lifecycle as `corpus`.
    decided = (
        corpus.join(flagged, "doc_id", "left")
        .select(
            "doc_id",
            "source",
            keep.alias("keep_sample"),
            F.coalesce(F.col("matched_ngrams"), F.lit(0)).alias("matched_ngrams"),
        )
        .persist()
    )
    lm = lm.persist()
    curated = (
        decided.where(F.col("keep_sample") & (F.col("matched_ngrams") == 0))
        .join(lm.select("doc_id", "n_tokens"), "doc_id", "left")
        .withColumn("n_tokens", F.coalesce(F.col("n_tokens"), F.lit(0)))
    )
    packed = pack_sequences(curated, _SEQ_LEN).select(
        "doc_id", "seq_id", "seq_off", "seq_spans"
    )
    # The SQL token grain is lowercased; chunk the same projection.
    chunks = chunk_documents(
        corpus.select("doc_id", F.lower(F.col("text")).alias("text")),
        chunk_tokens=_CHUNK_TOKENS,
        overlap_tokens=_CHUNK_OVERLAP,
    )
    chunk_line = F.struct(
        F.col("chunk_start"),
        F.concat_ws(":", F.col("chunk_start"), F.col("chunk_text")).alias("line"),
    )
    chunk_summary = chunks.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_chunks"),
        F.sum("chunk_n_tokens").cast("long").alias("chunk_tokens_total"),
        F.md5(
            F.encode(
                F.array_join(
                    F.transform(
                        F.array_sort(F.collect_list(chunk_line)),
                        lambda w: w["line"],
                    ),
                    "\n",
                ),
                "UTF-8",
            )
        ).alias("chunks_md5"),
    )
    return (
        decided.join(cleaned, "doc_id")
        .join(lm, "doc_id", "left")
        .join(packed, "doc_id", "left")
        .join(chunk_summary, "doc_id", "left")
        .join(
            dsir.select(
                "doc_id",
                F.col("n_features").alias("dsir_features"),
                "dsir_logweight",
            ),
            "doc_id",
            "left",
        )
        .join(kn.select("doc_id", "kn_logprob10"), "doc_id", "left")
        .join(dupw.select("doc_id", "cluster_size", "dup_weight"), "doc_id")
        .select(
            "doc_id",
            "source",
            "keep_sample",
            "matched_ngrams",
            "n_lines",
            "n_boiler_lines",
            F.md5(F.encode(F.col("clean_text"), "UTF-8")).alias("clean_text_md5"),
            F.coalesce(F.col("n_tokens"), F.lit(0).cast("long")).alias("n_tokens"),
            "lm_logprob10",
            "seq_id",
            "seq_off",
            "seq_spans",
            "n_chunks",
            "chunk_tokens_total",
            "chunks_md5",
            "dsir_features",
            "dsir_logweight",
            "kn_logprob10",
            "cluster_size",
            "dup_weight",
        )
    )
