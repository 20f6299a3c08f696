"""Text-corpus ingestion: JSONL and raw-text document sources.

The reference's engine contract starts at parquet (SURVEY.md §2.1);
LLM training corpora, however, interchange as JSONL (one JSON document
per line — the Common Crawl / RedPajama / Dolma convention) or as
directories of raw text files. These readers normalize both into the
engine's `documents` shape (doc_id, text, source, ...) so every
downstream operator (dedup, curation, packing) applies unchanged.

Scale notes baked into the API:

- JSONL with an explicit schema skips Spark's whole-corpus inference
  pass — on 100 TB, schema inference would read everything twice.
- Plain ``.jsonl`` and block-compressed ``.jsonl.zst``/``.gz`` differ
  operationally: gzip files are NOT splittable (one task per file), so
  a 100 TB corpus should arrive as many ~100 MB-1 GB files; the reader
  works either way but parallelism follows the file layout.
- Ids: corpora either carry a stable id field (preferred — pass
  ``id_field``) or get a deterministic content-derived id
  (xxhash64 of source+text), which is stable across re-reads and
  re-partitioning — never ``monotonically_increasing_id()``, whose
  values depend on the physical partition layout.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DOCUMENT_SCHEMA = "text string, source string, lang string, url string"


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: str = DOCUMENT_SCHEMA,
    id_field: str | None = None,
    text_field: str = "text",
) -> DataFrame:
    """Read a JSONL corpus into the `documents` shape.

    Output columns: ``doc_id`` (long) + the schema's fields with
    ``text_field`` renamed to ``text``. Corrupt lines land in a
    ``_corrupt`` column instead of failing the job — on a web-scale
    crawl some malformed records are a certainty and one bad line must
    not kill the read; filter or count them downstream.

    Implementation: text scan + ``from_json``, not the raw JSON
    datasource — same JVM-side Jackson parser and the same explicit
    schema (so no whole-corpus inference pass), but the corrupt-record
    column behaves like any other column (the raw JSON source forbids
    queries that reference only it, which breaks the obvious
    "count the bad lines" query).
    """
    return _normalize_jsonl(spark.read.text(path), schema, id_field, text_field)


def stream_jsonl(
    spark: SparkSession,
    path: str,
    schema: str = DOCUMENT_SCHEMA,
    id_field: str | None = None,
    text_field: str = "text",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Incremental JSONL pickup as a Structured Stream — the corpus
    analog of the reference's daily re-materialization cron: new drops
    in ``path`` are processed exactly once (file-source checkpointing),
    ``Trigger.AvailableNow`` on the writer gives the batch-shaped
    "process everything new, then stop" run. Identical parsing and
    normalization to :func:`read_jsonl` (shared code path), so every
    stateless curation stage (quality gates, URL filters, hash-coin
    sampling) applies unchanged to the stream."""
    reader = spark.readStream
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return _normalize_jsonl(reader.text(path), schema, id_field, text_field)


def _normalize_jsonl(
    raw: DataFrame, schema: str, id_field: str | None, text_field: str
) -> DataFrame:
    parsed = raw.select(
        F.from_json(
            F.col("value"),
            schema + ", _corrupt string",
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": "_corrupt"},
        ).alias("__r")
    )
    df = parsed.select("__r.*")
    if text_field != "text":
        df = df.withColumnRenamed(text_field, "text")
    if id_field is not None:
        doc_id = F.col(id_field).cast("long")
    else:
        # Corrupt rows have NULL text/source; hash the raw line instead
        # so every malformed record keeps a distinct id (a shared
        # sentinel id would collapse them under any downstream dedup).
        doc_id = F.xxhash64(
            F.coalesce(F.col("source"), F.lit("")),
            F.coalesce(F.col("text"), F.col("_corrupt"), F.lit("")),
        )
    return df.select(doc_id.alias("doc_id"), "*")


def read_text_dir(
    spark: SparkSession,
    path: str,
    source: str = "files",
    whole_file: bool = True,
) -> DataFrame:
    """Read a directory of raw text files, one document per file
    (``whole_file=True``) or per line. Output: (doc_id, text, source,
    path) with a content-derived deterministic id."""
    df = spark.read.text(path, wholetext=whole_file).select(
        F.col("value").alias("text"),
        F.input_file_name().alias("path"),
    )
    return df.select(
        F.xxhash64(F.col("path"), F.col("text")).alias("doc_id"),
        "text",
        F.lit(source).alias("source"),
        "path",
    )


def write_jsonl(
    df: DataFrame,
    path: str,
    compression: str | None = "gzip",
    partitions: int | None = None,
) -> None:
    """Write a curated corpus back out as JSONL — the hand-off format
    for tokenizer/training jobs that don't read parquet. ``partitions``
    controls output file count (and therefore the next consumer's
    parallelism); compression defaults to gzip for wire size, pass
    ``None`` when the consumer needs splittable plain text."""
    if partitions is not None:
        df = df.repartition(partitions)
    writer = df.write.mode("overwrite")
    if compression is not None:
        writer = writer.option("compression", compression)
    writer.json(path)
