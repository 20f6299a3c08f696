"""Corpus relevance scoring: TF-IDF and Okapi BM25.

The data-selection tier of a training-data pipeline (importance
sampling against a target domain, DSIR-style; retrieval-based corpus
filtering) reduces to scoring every document against a small set of
query terms. Both operators here are pure native-SQL plans:

- per-document term frequencies are row-local array expressions (no
  shuffle, no UDF);
- corpus statistics (N, avgdl, per-term document frequencies) are ONE
  single-row aggregation, broadcast back via a literal cross join —
  the classic scalar-subquery shape, constant-sized at any corpus
  scale;
- the full token-grain TF-IDF table shuffles only (token, partial
  count) pairs — map-side-combined wordcount, fine at 100 TB.

Determinism contract: every transcendental (ln) is rounded to 6
decimals before entering arithmetic, so an external engine (the DuckDB
oracle) reproduces scores bit-for-bit; the remaining operations are
IEEE-exact rationals evaluated in a fixed, row-local order.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from data_pipelines_spark.functions.text import tokens


def _term_freq(toks: Column, term: str) -> Column:
    """Occurrences of ``term`` in a token array — row-local, no UDF."""
    return F.size(F.filter(toks, lambda t: t == F.lit(term))).cast("long")


def bm25_scores(
    docs: DataFrame,
    query_terms: Sequence[str],
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Okapi BM25 score of every document against a fixed query.

    score(d) = Σ_t idf(t) · tf(t,d)·(k1+1) / (tf(t,d) + k1·(1 − b + b·|d|/avgdl))
    with idf(t) = ln((N − df(t) + 0.5)/(df(t) + 0.5) + 1)  (Robertson/
    Sparck-Jones, the Lucene formulation — always positive).

    Output: (id_col, dl, bm25_score), one row per input document; empty
    documents score 0. idf is rounded to 6 decimals before the
    multiply and each term contribution to 6 before the row-local sum,
    making the score reproducible across engines (ln is the only
    transcendental; everything else is IEEE-exact rational arithmetic:
    avgdl = Σdl/N divides two exact integers).

    Plan: one narrow projection computes (dl, tf_0..tf_k) per doc; one
    single-row aggregate computes (N, Σdl, df_0..df_k); a broadcast
    cross join stitches them — no fact-sized shuffle at all.
    """
    terms = list(query_terms)
    if not terms:
        raise ValueError("query_terms must be non-empty")
    if len(set(terms)) != len(terms):
        raise ValueError("query_terms must be distinct")
    # The plan generates 2 columns + 1 contribution expression PER TERM
    # (bounded by the QUERY length, never the vocabulary) — fine for
    # ad-hoc relevance queries, but a thousand-term "query" would
    # produce a thousand-column plan whose whole-stage codegen blows
    # the 64 KB method limit into interpreted fallback. Fail loudly at
    # the API instead; rank against long queries term-batch-wise.
    if len(terms) > 64:
        raise ValueError(
            f"bm25_scores: {len(terms)} query terms generate a "
            f"{2 * len(terms)}-column plan; cap is 64 — batch the query "
            "or use a term-explode formulation for document-length queries"
        )

    per_doc = docs.select(
        F.col(id_col), tokens(F.lower(F.col(text_col))).alias("__toks")
    ).select(
        id_col,
        F.size("__toks").cast("long").alias("dl"),
        *[_term_freq(F.col("__toks"), t).alias(f"__tf_{i}") for i, t in enumerate(terms)],
    )
    stats = per_doc.agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum("dl").alias("__sum_dl"),
        *[
            F.sum((F.col(f"__tf_{i}") > 0).cast("long")).alias(f"__df_{i}")
            for i in range(len(terms))
        ],
    )
    joined = per_doc.crossJoin(F.broadcast(stats))

    n = F.col("__n").cast("double")
    avgdl = F.col("__sum_dl").cast("double") / n
    norm = F.lit(float(k1)) * (
        F.lit(1.0 - b) + F.lit(float(b)) * F.col("dl").cast("double") / avgdl
    )
    contribs = []
    for i in range(len(terms)):
        tf = F.col(f"__tf_{i}").cast("double")
        df = F.col(f"__df_{i}").cast("double")
        idf6 = F.round(F.log((n - df + 0.5) / (df + 0.5) + 1.0), 6)
        sat = tf * F.lit(float(k1) + 1.0) / (tf + norm)
        contribs.append(
            F.when(
                F.col(f"__tf_{i}") > 0, F.round(idf6 * sat, 6)
            ).otherwise(F.lit(0.0))
        )
    score = contribs[0]
    for c in contribs[1:]:
        score = score + c
    return joined.select(
        id_col,
        "dl",
        F.round(
            F.when(F.col("dl") > 0, score).otherwise(F.lit(0.0)), 6
        ).alias("bm25_score"),
    )


def tf_idf(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_df: int = 1,
) -> DataFrame:
    """Token-grain TF-IDF table: (id_col, token, tf, df, tfidf) with
    tfidf = (tf / |d|) · round(ln((N + 1)/(df + 1)) + 1, 6) — the
    smooth-idf variant (scikit-learn's default shape), never negative,
    defined even for df = N. ``min_df`` drops rare-token rows AFTER
    document frequencies are computed (df semantics unchanged).

    Plan: explode → groupBy(doc, token) count (map-side combined) →
    groupBy(token) df — tokens and counts shuffle, never documents; N
    is a single-row broadcast.
    """
    toks = docs.select(
        F.col(id_col), F.explode(tokens(F.lower(F.col(text_col)))).alias("token")
    )
    tf = toks.groupBy(id_col, "token").agg(F.count(F.lit(1)).alias("tf"))
    dl = tf.groupBy(id_col).agg(F.sum("tf").alias("__dl"))
    df = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    if min_df > 1:
        df = df.where(F.col("df") >= min_df)
    n_docs = docs.agg(F.count(F.lit(1)).alias("__n"))
    idf6 = F.round(
        F.log(
            (F.col("__n").cast("double") + 1.0) / (F.col("df").cast("double") + 1.0)
        )
        + 1.0,
        6,
    )
    return (
        tf.join(df, "token")
        .join(dl, id_col)
        .crossJoin(F.broadcast(n_docs))
        .select(
            id_col,
            "token",
            "tf",
            "df",
            F.round(
                F.col("tf").cast("double") / F.col("__dl").cast("double") * idf6, 6
            ).alias("tfidf"),
        )
    )


def reciprocal_rank_fusion(
    results: Sequence[DataFrame],
    query_cols: Sequence[str],
    id_cols: Sequence[str],
    rank_col: str = "rank",
    k: int = 60,
    top_n: int | None = None,
) -> DataFrame:
    """Fuse N ranked result lists per query by Reciprocal Rank Fusion
    (Cormack, Clarke & Buettcher, SIGIR 2009):
    ``score(d) = Σ_lists 1/(k + rank_list(d))``, an item absent from a
    list contributing 0 — the standard hybrid-retrieval combiner
    (lexical BM25 ⊕ vector k-NN) that needs no score calibration
    because it only consumes RANKS. Returns ``(query_cols...,
    id_cols..., rrf_score double, n_lists, rank)`` with ``rank`` the
    fused per-query position.

    Determinism contract (the module's usual): each contribution is
    the IEEE-double ``1/(k+rank)`` cast to DECIMAL(38,18) before
    summing, so the cross-partition sum is associative and an external
    engine replays it bit-for-bit; fused ties break by ``id_cols``
    ascending.

    Plan shape: union of the (already k-bounded) result lists →
    map-side-combined groupBy on (query, id) → per-query window over
    at most N·k candidate rows. Nothing here is data-sized: the inputs
    are top-k lists by construction, so the fusion costs the same at
    any corpus scale — the expensive part is producing the input
    rankings (`bm25_scores`, `similarity.knn_join`), which have their
    own 100 TB plans.
    """
    if not results:
        raise ValueError("reciprocal_rank_fusion needs at least one list")
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    from functools import reduce

    from pyspark.sql import Window

    contribs = [
        df.select(
            *query_cols,
            *id_cols,
            (
                F.lit(1.0).cast("double")
                / (F.lit(int(k)) + F.col(rank_col).cast("double"))
            )
            .cast("decimal(38,18)")
            .alias("__c"),
        )
        for df in results
    ]
    unioned = reduce(lambda a, b: a.unionByName(b), contribs)
    fused = unioned.groupBy(*query_cols, *id_cols).agg(
        F.sum("__c").alias("__s"),
        F.count(F.lit(1)).alias("n_lists"),
    )
    w = Window.partitionBy(*query_cols).orderBy(
        F.col("__s").desc(), *[F.col(c).asc() for c in id_cols]
    )
    out = fused.withColumn("rank", F.row_number().over(w)).select(
        *query_cols,
        *id_cols,
        F.col("__s").cast("double").alias("rrf_score"),
        "n_lists",
        "rank",
    )
    if top_n is not None:
        out = out.where(F.col("rank") <= int(top_n))
    return out
