

def test_ccnet_normalize(spark):
    from pyspark.sql import functions as F

    from data_pipelines_spark.functions.text import ccnet_normalize

    rows = [
        (1, "Vérsion 27 — of the  Document"),
        (2, "version 03 — of the document"),
        (3, "Æther ŒUVRE straße ĐØ"),
        (4, "  Ça  coûte   5€ !  "),
        (5, None),
    ]
    df = spark.createDataFrame(rows, "i long, text string")
    out = {r["i"]: r["n"] for r in df.select(
        "i", ccnet_normalize(F.col("text")).alias("n")
    ).collect()}
    # trivially-different copies collapse to ONE key
    assert out[1] == out[2] == "version 00 — of the document"
    assert out[3] == "aether oeuvre strasse do"
    assert out[4] == "ca coute 0€ !"
    assert out[5] is None

    stripped = df.select(
        "i", ccnet_normalize(F.col("text"), strip_punct=True).alias("n")
    ).collect()
    got4 = {r["i"]: r["n"] for r in stripped}[4]
    assert got4 == "ca coute 0€"  # ASCII punct dropped, € kept


def test_accent_table_alignment():
    """ADVICE r9: translate() pairs positionally, so the fold table must
    be length-aligned AND each src char must map to its base letter —
    verified against Unicode NFKD (with the handful of letters that have
    no decomposition pinned explicitly)."""
    import unicodedata

    from data_pipelines_spark.functions.text import _ACCENT_DST, _ACCENT_SRC

    assert len(_ACCENT_SRC) == len(_ACCENT_DST) == 88
    no_decomp = {
        "đ": "d", "ı": "i", "ø": "o", "ŧ": "t",
        "ð": "d", "þ": "p", "ł": "l",
    }
    for s, d in zip(_ACCENT_SRC, _ACCENT_DST):
        if s in no_decomp:
            assert d == no_decomp[s], (s, d)
        else:
            base = unicodedata.normalize("NFKD", s)[0]
            assert d == base, (s, d, base)


def test_ccnet_normalize_post_shift_chars(spark):
    """Regression for the r9 one-char table drift: characters AFTER the
    o-run (where the shift began) must fold to their own base letters."""
    from pyspark.sql import functions as F

    from data_pipelines_spark.functions.text import ccnet_normalize

    df = spark.createDataFrame(
        [(1, "ùúû ýÿ śš ţť ŵ źž ð þ ŕř")], "i long, text string"
    )
    got = df.select(ccnet_normalize(F.col("text")).alias("n")).first()["n"]
    assert got == "uuu yy ss tt w zz d p rr"


def test_ccnet_normalize_differential_vs_duckdb(spark):
    """The accent fold must agree with DuckDB replaying the SAME
    translate table — the oracle-replayability contract, checked
    differentially over the real documents table."""
    import duckdb
    from pyspark.sql import functions as F

    from data_pipelines_spark.functions.text import (
        _ACCENT_DST,
        _ACCENT_SRC,
        ccnet_normalize,
    )
    from data_pipelines_spark.sources.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    got = {
        r["doc_id"]: r["n"]
        for r in docs.select(
            "doc_id", ccnet_normalize(F.col("text")).alias("n")
        ).collect()
    }
    con = duckdb.connect()
    src = _ACCENT_SRC.replace("'", "''")
    ora = con.execute(
        "SELECT doc_id, trim(regexp_replace(translate(replace(replace("
        "replace(translate(lower(text), ?, ?), 'æ', 'ae'), 'œ', 'oe'),"
        " 'ß', 'ss'), '123456789', '000000000'), '\\s+', ' ', 'g')) AS n "
        "FROM read_parquet('/root/testdata/sf0.001/documents.parquet')",
        [src, _ACCENT_DST],
    ).df()
    want = dict(zip(ora["doc_id"], ora["n"]))
    assert got == want


def test_ccnet_normalize_composes_with_exact_dedup(spark):
    """The documented composition: normalize as the dedup KEY transform
    collapses trivially-different copies that byte-exact dedup keeps."""
    from pyspark.sql import functions as F

    from data_pipelines_spark.functions.text import ccnet_normalize
    from data_pipelines_spark.operators.dedup import exact_duplicates

    docs = spark.createDataFrame(
        [(1, "Vérsion 27 — of the  Document"),
         (2, "version 03 — of the document"),
         (3, "something else entirely")],
        "doc_id long, text string",
    )
    raw = exact_duplicates(docs)
    assert raw.count() == 3  # byte-exact keeps all three
    norm = exact_duplicates(
        docs.withColumn("text", ccnet_normalize(F.col("text")))
    )
    rows = {r["keeper_id"]: r["dup_cnt"] for r in norm.collect()}
    assert rows == {1: 2, 3: 1}  # 1 and 2 collapsed, min id kept
