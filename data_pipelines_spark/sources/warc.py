"""WARC (Web ARChive, ISO 28500) source — the Common Crawl container.

The reference ingests curated rasters; a training-data pipeline's text
front end starts one step earlier, at the crawl archive. WARC is the
interchange format for that step (Common Crawl ships ~100 TB/month of
`.warc.gz`), so the engine grows a dependency-free reader/writer pair
mirroring the raster tier's design (`sources/raster.py`): a minimal
per-file parser plus a distributed `mapInPandas` fan-out that lands
records in a relational frame the extraction/curation operators
(`functions/web.py`, `operators/corpus.py`) consume directly.

Format facts the implementation encodes (WARC/1.1 spec §4; gzip use
per Annex B / the Common Crawl convention):

- A WARC file is a sequence of records. Each record is a header block
  (version line ``WARC/1.0`` or ``WARC/1.1``, then ``Name: value``
  lines, CRLF line ends, blank line terminator), a content block of
  exactly ``Content-Length`` bytes, then two CRLFs.
- ``.warc.gz`` compresses EACH RECORD as its own gzip member, so a
  byte-range fetch of one member decodes one record without touching
  the rest of the (multi-GB) file. ``gzip.decompress`` transparently
  concatenates members, which is exactly the whole-file read path.
- ``response`` records carry a full HTTP/1.1 message (status line +
  headers + body) as their content block; the payload of interest is
  the HTTP body, and its charset rides the HTTP ``Content-Type``.

Scale shape: one task per WARC file (gzip members are not splittable
mid-file without the member index); a 100 TB crawl arrives as ~100k
files of ~1 GB, which is also the parallelism grain Common Crawl's own
tooling uses. Truncated or malformed files raise loudly — the taskmap
retry/manifest tier (`operators/taskmap.py`) is the recovery path, and
a short read silently yielding fewer documents is the failure mode a
curation pipeline must never absorb.
"""

from __future__ import annotations

import gzip
import io
import zlib
from collections.abc import Iterator
from typing import BinaryIO

import pandas as pd

from pyspark.sql import DataFrame, SparkSession

_CRLF = b"\r\n"
_CHUNK = 1 << 20  # 1 MiB raw-read granule for the streaming decoders

WARC_READ_SCHEMA = (
    "warc_file string, record_offset long, record_id string, "
    "record_type string, target_uri string, warc_date string, "
    "content_type string, http_status int, http_content_type string, "
    "payload binary, n_bytes long, text string"
)


# ---------------------------------------------------------------------------
# Record construction (writer half)
# ---------------------------------------------------------------------------

def encode_warc_record(
    record_type: str,
    payload: bytes,
    *,
    record_id: str,
    warc_date: str = "2024-01-01T00:00:00Z",
    target_uri: str | None = None,
    content_type: str | None = None,
    extra_headers: dict[str, str] | None = None,
) -> bytes:
    """One WARC/1.0 record as bytes (header block + content + 2 CRLF).

    ``record_id`` is caller-supplied (deterministic ids keep tests and
    re-runs reproducible; real crawlers use ``urn:uuid:``).
    """
    headers = [
        ("WARC-Type", record_type),
        ("WARC-Record-ID", f"<{record_id}>"),
        ("WARC-Date", warc_date),
    ]
    if target_uri is not None:
        headers.append(("WARC-Target-URI", target_uri))
    if content_type is not None:
        headers.append(("Content-Type", content_type))
    for k, v in (extra_headers or {}).items():
        headers.append((k, v))
    headers.append(("Content-Length", str(len(payload))))

    head = b"WARC/1.0" + _CRLF
    head += b"".join(
        f"{k}: {v}".encode("utf-8") + _CRLF for k, v in headers
    )
    return head + _CRLF + payload + _CRLF + _CRLF


def encode_http_response(
    body: bytes,
    *,
    status: int = 200,
    reason: str = "OK",
    content_type: str = "text/html; charset=utf-8",
    extra_headers: dict[str, str] | None = None,
) -> bytes:
    """An HTTP/1.1 response message (the content block of a WARC
    ``response`` record)."""
    lines = [f"HTTP/1.1 {status} {reason}"]
    lines.append(f"Content-Type: {content_type}")
    for k, v in (extra_headers or {}).items():
        lines.append(f"{k}: {v}")
    lines.append(f"Content-Length: {len(body)}")
    head = _CRLF.join(s.encode("latin-1") for s in lines)
    return head + _CRLF + _CRLF + body


def assemble_warc(records: list[bytes], gzip_members: bool = True) -> bytes:
    """Record blobs → one WARC file image. With ``gzip_members`` each
    record is its own gzip member (the Common Crawl `.warc.gz` layout:
    members are independently decodable so index-driven range reads
    touch one record; ``mtime=0`` keeps the bytes deterministic so a
    task retry reproduces the identical file)."""
    if not gzip_members:
        return b"".join(records)
    out = io.BytesIO()
    for rec in records:
        with gzip.GzipFile(fileobj=out, mode="wb", mtime=0) as gz:
            gz.write(rec)
    return out.getvalue()


def write_warc(path: str, records: list[bytes], gzip_members: bool = True) -> None:
    """Write records to ``path`` (see :func:`assemble_warc`)."""
    with open(path, "wb") as f:
        f.write(assemble_warc(records, gzip_members))


# ---------------------------------------------------------------------------
# Parsing (reader half)
# ---------------------------------------------------------------------------

def _parse_header_block(block: bytes, what: str) -> dict[str, str]:
    """Parse ``Name: value`` lines (CRLF or LF line ends; continuation
    lines folded per RFC 822)."""
    headers: dict[str, str] = {}
    last = None
    for raw in block.split(b"\n"):
        line = raw.rstrip(b"\r")
        if not line:
            continue
        if line[:1] in (b" ", b"\t") and last is not None:
            headers[last] += " " + line.strip().decode("utf-8", "replace")
            continue
        if b":" not in line:
            raise ValueError(f"malformed {what} header line: {line[:60]!r}")
        k, v = line.split(b":", 1)
        last = k.strip().decode("utf-8", "replace").lower()
        headers[last] = v.strip().decode("utf-8", "replace")
    return headers


def parse_warc_record(data: bytes, offset: int = 0):
    """Parse ONE record starting at ``offset`` in an uncompressed WARC
    stream → (headers dict, content bytes, next_offset). Raises on
    truncation, a bad version line, or a missing record terminator —
    the loud-failure contract every parser in the engine shares
    (`tests/test_parser_robustness.py`)."""
    end_head = data.find(_CRLF + _CRLF, offset)
    if end_head < 0:
        raise ValueError("truncated WARC record: header block has no terminator")
    head = data[offset:end_head]
    if not (head.startswith(b"WARC/1.0") or head.startswith(b"WARC/1.1")):
        raise ValueError(
            f"not a WARC record at offset {offset}: {head[:20]!r}"
        )
    first_eol = head.find(b"\n")
    headers = _parse_header_block(head[first_eol + 1 :], "WARC")
    if "content-length" not in headers:
        raise ValueError("WARC record missing Content-Length")
    length = int(headers["content-length"])
    body_start = end_head + 4
    body_end = body_start + length
    if body_end + 4 > len(data):
        raise ValueError(
            f"truncated WARC record: need {body_end + 4 - len(data)} more bytes"
        )
    if data[body_end : body_end + 4] != _CRLF + _CRLF:
        raise ValueError("WARC record not terminated by CRLF CRLF")
    return headers, data[body_start:body_end], body_end + 4


def parse_http_response(block: bytes):
    """HTTP message inside a ``response`` record → (status int,
    headers dict, body bytes).

    Header/body split is at whichever terminator occurs FIRST —
    ``CRLFCRLF`` (spec) or bare ``LFLF`` (sloppy writers). Preferring
    CRLFCRLF anywhere in the block would mis-split an LF-delimited
    header section whose *body* happens to contain ``\\r\\n\\r\\n``
    (e.g. a nested HTTP payload)."""
    p_crlf = block.find(_CRLF + _CRLF)
    p_lf = block.find(b"\n\n")
    if p_crlf >= 0 and (p_lf < 0 or p_crlf <= p_lf):
        head, body = block[:p_crlf], block[p_crlf + 4 :]
    elif p_lf >= 0:
        head, body = block[:p_lf], block[p_lf + 2 :]
    else:
        raise ValueError("HTTP message has no header terminator")
    first_eol = head.find(b"\n")
    status_line = (head[:first_eol] if first_eol >= 0 else head).rstrip(b"\r")
    parts = status_line.split(b" ", 2)
    if len(parts) < 2 or not parts[0].startswith(b"HTTP/"):
        raise ValueError(f"bad HTTP status line: {status_line[:40]!r}")
    status = int(parts[1])
    headers = _parse_header_block(head[first_eol + 1 :] if first_eol >= 0 else b"", "HTTP")
    return status, headers, body


def charset_of(content_type: str | None, default: str = "utf-8") -> str:
    """Charset parameter of a Content-Type value, else ``default``."""
    if not content_type:
        return default
    for part in content_type.split(";")[1:]:
        part = part.strip()
        if part.lower().startswith("charset="):
            return part.split("=", 1)[1].strip().strip('"').lower() or default
    return default


def decode_payload(payload: bytes, content_type: str | None) -> str:
    """Bytes → text using the declared charset, with the crawl-world
    fallback chain (declared → utf-8 → latin-1, never raising: a bad
    charset label must not kill a 100k-file read; mojibake is scored
    out later by the quality tier)."""
    for enc in (charset_of(content_type), "utf-8"):
        try:
            return payload.decode(enc)
        except (UnicodeDecodeError, LookupError):
            continue
    return payload.decode("latin-1", "replace")


def iter_gzip_members(f: BinaryIO) -> Iterator[tuple[int, int, bytes]]:
    """Walk a multi-member gzip stream member by member, yielding
    ``(byte_offset, compressed_length, decompressed_bytes)`` per
    member. Peak memory is one decompressed member (one WARC record in
    the `.warc.gz` convention), never the whole file — the property
    that makes the Common Crawl grain (~1 GB compressed, ~4-5 GB
    decompressed per file) safe at 32 concurrent tasks. Raises on a
    truncated member."""
    offset = 0
    buf = f.read(_CHUNK)
    while buf:
        d = zlib.decompressobj(wbits=31)  # gzip wrapper
        out = bytearray()
        consumed = 0
        while not d.eof:
            if not buf:
                buf = f.read(_CHUNK)
                if not buf:
                    raise ValueError(
                        f"truncated gzip member at offset {offset}"
                    )
            out += d.decompress(buf)
            consumed += len(buf) - len(d.unused_data)
            buf = b""
        yield offset, consumed, bytes(out)
        offset += consumed
        buf = d.unused_data
        if not buf:
            buf = f.read(_CHUNK)


def _iter_records_plain(f: BinaryIO) -> Iterator[tuple[dict, bytes]]:
    """Incremental record parser over an UNCOMPRESSED WARC stream:
    buffer only as far as the current record's terminator, so peak
    memory is one record. Same loud-failure contract as
    :func:`parse_warc_record` (which parses the buffered slice)."""
    buf = bytearray()
    while True:
        # Fill until the header terminator is visible.
        end_head = buf.find(_CRLF + _CRLF)
        while end_head < 0:
            chunk = f.read(_CHUNK)
            if not chunk:
                if not buf:
                    return
                raise ValueError(
                    "truncated WARC record: header block has no terminator"
                )
            buf += chunk
            end_head = buf.find(_CRLF + _CRLF)
        head = bytes(buf[:end_head])
        if not (head.startswith(b"WARC/1.0") or head.startswith(b"WARC/1.1")):
            raise ValueError(f"not a WARC record: {head[:20]!r}")
        first_eol = head.find(b"\n")
        headers = _parse_header_block(head[first_eol + 1 :], "WARC")
        if "content-length" not in headers:
            raise ValueError("WARC record missing Content-Length")
        length = int(headers["content-length"])
        total = end_head + 4 + length + 4
        while len(buf) < total:
            chunk = f.read(_CHUNK)
            if not chunk:
                raise ValueError(
                    f"truncated WARC record: need {total - len(buf)} more bytes"
                )
            buf += chunk
        if bytes(buf[total - 4 : total]) != _CRLF + _CRLF:
            raise ValueError("WARC record not terminated by CRLF CRLF")
        yield headers, bytes(buf[end_head + 4 : total - 4])
        del buf[:total]


def _record_to_row(idx: int, headers: dict, content: bytes) -> dict:
    """One parsed (headers, content) pair → a WARC_READ_SCHEMA row
    (minus warc_file): HTTP envelope stripped off ``response`` records,
    payload charset-decoded into ``text`` where it is text."""
    rtype = headers.get("warc-type", "")
    row = {
        "record_offset": idx,
        "record_id": headers.get("warc-record-id", "").strip("<>"),
        "record_type": rtype,
        "target_uri": headers.get("warc-target-uri"),
        "warc_date": headers.get("warc-date"),
        "content_type": headers.get("content-type"),
        "http_status": None,
        "http_content_type": None,
        "payload": content,
        "n_bytes": len(content),
        "text": None,
    }
    if rtype == "response" and row["content_type"] and \
            "application/http" in row["content_type"]:
        status, http_headers, body = parse_http_response(content)
        ctype = http_headers.get("content-type")
        row["http_status"] = status
        row["http_content_type"] = ctype
        row["payload"] = body
        row["n_bytes"] = len(body)
        row["text"] = decode_payload(body, ctype)
    elif row["content_type"] and row["content_type"].startswith("text/"):
        # conversion/resource records with a text payload (WET
        # files are WARC files of text/plain conversion records)
        row["text"] = decode_payload(content, row["content_type"])
    return row


def iter_warc_records(path: str) -> Iterator[dict]:
    """Stream every record of one ``.warc`` / ``.warc.gz`` file as
    WARC_READ_SCHEMA row dicts (minus warc_file). Memory is bounded by
    ONE record: the gzip path decodes member-by-member
    (:func:`iter_gzip_members` — members are independently decodable,
    the layout :func:`assemble_warc` guarantees on the write side) and
    the plain path buffers only the current record
    (:func:`_iter_records_plain`). The single-file kernel the
    distributed reader fans out."""
    idx = 0
    with open(path, "rb") as f:
        magic = f.read(2)
        f.seek(0)
        if magic == b"\x1f\x8b":
            for _off, _clen, data in iter_gzip_members(f):
                # One member normally holds one record, but the spec
                # allows several; walk the member's records.
                offset = 0
                while offset < len(data):
                    headers, content, offset = parse_warc_record(data, offset)
                    yield _record_to_row(idx, headers, content)
                    idx += 1
        else:
            for headers, content in _iter_records_plain(f):
                yield _record_to_row(idx, headers, content)
                idx += 1


def read_warc_minimal(path: str) -> list[dict]:
    """Materialized form of :func:`iter_warc_records` (small files /
    tests; the distributed reader streams instead)."""
    return list(iter_warc_records(path))


def read_warc(
    spark: SparkSession,
    paths: list[str],
    record_types: tuple[str, ...] = ("response",),
    num_slots: int | None = None,
    batch_rows: int = 1024,
) -> DataFrame:
    """Distributed WARC read: one task per file (the gzip-member grain)
    → relational records. ``response`` records arrive with the HTTP
    envelope parsed off and the body charset-decoded into ``text``,
    ready for `functions.web.html_to_text`.

    Mirrors `fetch.fetch_binary`'s fan-out: a path list repartitioned
    across the cluster, a `mapInPandas` kernel per partition. Parse
    errors RAISE (task → taskmap retry), they never shrink the output.

    Memory shape: the kernel streams (`iter_warc_records`) and flushes
    every ``batch_rows`` rows, so a task holds one record plus one
    Arrow batch — NOT the 4-5 GB decompressed file the Common Crawl
    grain implies.
    """
    slots = min(
        num_slots or max(len(paths), 1),
        spark.sparkContext.defaultParallelism,
    )
    path_df = spark.createDataFrame(
        [(p,) for p in paths], "warc_file string"
    ).repartition(max(slots, 1))
    want = set(record_types)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [c.split()[0] for c in WARC_READ_SCHEMA.split(", ")]
        rows: list[dict] = []
        for pdf in batches:
            for path in pdf["warc_file"]:
                for rec in iter_warc_records(path):
                    if want and rec["record_type"] not in want:
                        continue
                    rec["warc_file"] = path
                    rows.append(rec)
                    if len(rows) >= batch_rows:
                        yield pd.DataFrame(rows, columns=cols)
                        rows = []
        if rows:
            yield pd.DataFrame(rows, columns=cols)
        else:
            yield pd.DataFrame({c: [] for c in cols})

    return path_df.mapInPandas(run, WARC_READ_SCHEMA)


def write_warc_shards(
    df: DataFrame,
    out_dir: str,
    n_shards: int | None = None,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    uri_col: str | None = None,
    shard_col: str | None = None,
    record_type: str = "conversion",
    gzip_members: bool = True,
    warc_date: str = "2024-01-01T00:00:00Z",
    index: bool = False,
    max_records_per_shard: int | None = None,
) -> DataFrame:
    """Distributed WARC export — the WET half of the crawl boundary
    (Common Crawl's ``.warc.wet.gz`` files are WARC files of
    ``conversion`` records holding extracted text).

    One applyInPandas task per shard writes one ``.warc.gz`` to
    ``out_dir`` and emits a manifest row ``(shard, path, n_records,
    n_bytes, content_md5, index_path)`` — the corpus never funnels
    through the driver, mirroring `operators.tiles.export_tiles_cog`.
    Shard assignment is content-derived (``xxhash64(id) mod n_shards``)
    unless ``shard_col`` names an existing column; records are ordered
    by ``id_col`` within a shard and gzip members carry ``mtime=0``,
    so the SAME input produces byte-identical files under task retry
    or a re-run (content_md5 is a real integrity key, not a lottery).

    Memory contract: records are encoded and written ONE AT A TIME
    (the md5 is folded incrementally), so the file image is never held
    in memory — but ``applyInPandas`` still materializes the shard's
    ROWS as one pandas frame, so a shard must fit in executor memory.
    Size ``n_shards`` so rows-per-shard × avg-doc-size ≲ a few hundred
    MB (Common Crawl's own WET shards are ~150 MB compressed), or set
    ``max_records_per_shard`` to turn a mis-sized shard into a loud
    error instead of an executor OOM.

    With ``index=True`` each shard also gets a CDX-style sidecar
    ``<shard>.cdx`` (tab-separated: ``target_uri, offset,
    member_length, payload_md5, record_id``, one line per record,
    offsets into the shard file) — the Common Crawl pattern that lets a
    consumer range-read ONE gzip member (`read_warc_selective`) instead
    of scanning 100 TB to fetch 1% of records.

    NULL text raises (executor-side): a document that reaches export
    with no text is an upstream bug, and absorbing it would silently
    shrink the corpus — the loud-failure contract every writer in the
    engine shares.

    ``out_dir`` must be visible to the executors (shared filesystem or
    object-store mount), same contract as the COG exporter.
    """
    import hashlib
    import os

    from pyspark.sql import functions as F

    if (n_shards is None) == (shard_col is None):
        raise ValueError("exactly one of n_shards / shard_col is required")
    cols = [id_col, text_col] + ([uri_col] if uri_col else [])
    if shard_col is None:
        keyed = df.select(*cols).withColumn(
            "__shard",
            F.pmod(F.xxhash64(F.col(id_col).cast("string")),
                   F.lit(n_shards)).cast("int"),
        )
        shard_col = "__shard"
    else:
        keyed = df.select(*cols, F.col(shard_col).cast("int").alias("__shard"))
        shard_col = "__shard"
    ext = ".warc.gz" if gzip_members else ".warc"

    def write_shard(key, pdf: pd.DataFrame) -> pd.DataFrame:
        shard = int(key[0])
        if max_records_per_shard is not None and len(pdf) > max_records_per_shard:
            raise ValueError(
                f"write_warc_shards: shard {shard} has {len(pdf)} records "
                f"> max_records_per_shard={max_records_per_shard}; raise "
                f"n_shards or the cap"
            )
        pdf = pdf.sort_values(id_col, kind="mergesort")
        path = os.path.join(out_dir, f"shard-{shard:05d}{ext}")
        md5 = hashlib.md5()
        n_bytes = 0
        n_records = 0
        index_lines: list[str] = []
        with open(path, "wb") as f:
            for row in pdf.itertuples(index=False):
                text = getattr(row, text_col)
                if text is None or (isinstance(text, float) and text != text):
                    raise ValueError(
                        f"write_warc_shards: NULL {text_col!r} for "
                        f"{id_col}={getattr(row, id_col)!r}"
                    )
                payload = str(text).encode("utf-8")
                rid = f"{record_type}-{getattr(row, id_col)}"
                uri = getattr(row, uri_col) if uri_col else None
                rec = encode_warc_record(
                    record_type,
                    payload,
                    record_id=rid,
                    warc_date=warc_date,
                    target_uri=uri,
                    content_type="text/plain; charset=utf-8",
                )
                member = assemble_warc([rec], gzip_members)
                if index:
                    index_lines.append(
                        f"{uri or ''}\t{n_bytes}\t{len(member)}\t"
                        f"{hashlib.md5(payload).hexdigest()}\t{rid}\n"
                    )
                f.write(member)
                md5.update(member)
                n_bytes += len(member)
                n_records += 1
        index_path = None
        if index:
            index_path = path + ".cdx"
            with open(index_path, "w", encoding="utf-8") as f:
                f.writelines(index_lines)
        return pd.DataFrame(
            {
                "shard": [shard],
                "path": [path],
                "n_records": [n_records],
                "n_bytes": [n_bytes],
                "content_md5": [md5.hexdigest()],
                "index_path": [index_path],
            }
        )

    return keyed.groupBy(shard_col).applyInPandas(
        write_shard,
        "shard int, path string, n_records long, n_bytes long, "
        "content_md5 string, index_path string",
    )


# ---------------------------------------------------------------------------
# CDX index → selective reads
# ---------------------------------------------------------------------------

CDX_SCHEMA = (
    "target_uri string, offset long, member_length long, "
    "payload_md5 string, record_id string"
)


def read_cdx_index(spark: SparkSession, paths: list[str]) -> DataFrame:
    """Load CDX sidecars written by ``write_warc_shards(index=True)``
    into a frame ``(warc_file, target_uri, offset, member_length,
    payload_md5, record_id)``. Native CSV reader (splittable, scans in
    parallel); ``warc_file`` is derived from the sidecar's own path
    (``<shard>.cdx`` sits next to ``<shard>``), so the index rows are
    directly joinable / filterable and feed `read_warc_selective`."""
    from pyspark.sql import functions as F

    return (
        spark.read.csv(paths, sep="\t", schema=CDX_SCHEMA)
        .withColumn(
            "warc_file",
            F.regexp_replace(F.input_file_name(), r"\.cdx$", ""),
        )
        # input_file_name yields a file: URI; normalize to a plain path
        .withColumn(
            "warc_file", F.regexp_replace("warc_file", r"^file:", "")
        )
        .select(
            "warc_file", "target_uri", "offset", "member_length",
            "payload_md5", "record_id",
        )
    )


def read_warc_selective(
    spark: SparkSession,
    entries: DataFrame,
    num_slots: int | None = None,
) -> DataFrame:
    """Index-driven WARC read: ``entries`` is a (pre-filtered) frame
    with ``warc_file, offset, member_length`` columns — typically
    `read_cdx_index` output after a predicate — and each selected gzip
    member is RANGE-READ (seek + read exactly ``member_length`` bytes)
    and decoded independently, the property `assemble_warc` guarantees.
    This is how a consumer fetches 1% of a 100 TB crawl without
    touching the other 99%: bytes read = Σ selected member lengths,
    not Σ file sizes (`tests/test_warc.py` asserts the byte counter).

    Output schema is WARC_READ_SCHEMA; ``record_offset`` carries the
    member's byte offset in the file (the index key) rather than the
    sequential record number of the full-scan reader.

    Entries are repartitioned by ``warc_file`` so one task opens each
    file once and reads its members in offset order (sequential-ish I/O
    on spinning/object storage)."""
    want_cols = ["warc_file", "offset", "member_length"]
    parts = num_slots or spark.sparkContext.defaultParallelism

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [c.split()[0] for c in WARC_READ_SCHEMA.split(", ")]
        rows: list[dict] = []
        for pdf in batches:
            for path, grp in pdf.groupby("warc_file", sort=False):
                with open(path, "rb") as f:
                    for off, length in sorted(
                        zip(grp["offset"], grp["member_length"])
                    ):
                        f.seek(int(off))
                        member = f.read(int(length))
                        if len(member) != int(length):
                            raise ValueError(
                                f"short range read at {path}:{off}"
                            )
                        data = (
                            gzip.decompress(member)
                            if member[:2] == b"\x1f\x8b" else member
                        )
                        pos = 0
                        while pos < len(data):
                            headers, content, pos = parse_warc_record(
                                data, pos
                            )
                            rec = _record_to_row(int(off), headers, content)
                            rec["warc_file"] = path
                            rows.append(rec)
        if rows:
            yield pd.DataFrame(rows, columns=cols)
        else:
            yield pd.DataFrame({c: [] for c in cols})

    return (
        entries.select(*want_cols)
        .repartition(parts, "warc_file")
        .mapInPandas(run, WARC_READ_SCHEMA)
    )
