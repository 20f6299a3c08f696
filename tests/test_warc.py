"""WARC source: round-trips, HTTP envelope parsing, charset fallback,
distributed read, truncation robustness."""

from __future__ import annotations

import gzip

import pytest

from data_pipelines_spark.sources.warc import (
    charset_of,
    decode_payload,
    encode_http_response,
    encode_warc_record,
    parse_http_response,
    parse_warc_record,
    read_warc,
    read_warc_minimal,
    write_warc,
)


def _response_record(i: int, body: bytes, content_type="text/html; charset=utf-8",
                     status=200) -> bytes:
    http = encode_http_response(body, status=status, content_type=content_type)
    return encode_warc_record(
        "response",
        http,
        record_id=f"rec-{i}",
        target_uri=f"http://example.org/page{i}",
        content_type="application/http; msgtype=response",
    )


def _sample_records() -> list[bytes]:
    info = encode_warc_record(
        "warcinfo",
        b"software: data-pipelines-spark\r\n",
        record_id="info-0",
        content_type="application/warc-fields",
    )
    req = encode_warc_record(
        "request",
        b"GET /page1 HTTP/1.1\r\nHost: example.org\r\n\r\n",
        record_id="req-1",
        target_uri="http://example.org/page1",
        content_type="application/http; msgtype=request",
    )
    resp1 = _response_record(1, "<html><body>hello &amp; welcome</body></html>".encode())
    resp2 = _response_record(
        2, "caf\xe9 au lait".encode("latin-1"),
        content_type="text/html; charset=iso-8859-1",
    )
    resp404 = _response_record(3, b"gone", status=404)
    return [info, req, resp1, resp2, resp404]


@pytest.mark.parametrize("gz", [True, False])
def test_roundtrip_minimal(tmp_path, gz):
    path = str(tmp_path / ("a.warc.gz" if gz else "a.warc"))
    write_warc(path, _sample_records(), gzip_members=gz)
    recs = read_warc_minimal(path)
    assert [r["record_type"] for r in recs] == [
        "warcinfo", "request", "response", "response", "response"]
    assert [r["record_offset"] for r in recs] == [0, 1, 2, 3, 4]
    r1 = recs[2]
    assert r1["record_id"] == "rec-1"
    assert r1["target_uri"] == "http://example.org/page1"
    assert r1["http_status"] == 200
    assert r1["http_content_type"] == "text/html; charset=utf-8"
    assert r1["text"] == "<html><body>hello &amp; welcome</body></html>"
    assert r1["n_bytes"] == len(r1["payload"]) == len(r1["text"].encode())
    # latin-1 declared charset decodes the accented byte correctly
    assert recs[3]["text"] == "caf\xe9 au lait"
    assert recs[4]["http_status"] == 404
    # non-response records keep the raw content block, no text
    assert recs[0]["text"] is None
    assert recs[1]["payload"].startswith(b"GET /page1")


def test_gzip_members_are_independent(tmp_path):
    """The .warc.gz layout promise: each record is its own gzip member,
    so one member alone decodes one full record (range-read support)."""
    path = str(tmp_path / "a.warc.gz")
    records = _sample_records()
    write_warc(path, records, gzip_members=True)
    data = open(path, "rb").read()
    # Split on gzip magic with our fixed mtime=0 header prefix.
    magic = b"\x1f\x8b\x08\x00\x00\x00\x00\x00"
    starts = [i for i in range(len(data)) if data[i:i + 8] == magic]
    assert len(starts) == len(records)
    one = gzip.decompress(data[starts[2]:starts[3]])
    headers, content, nxt = parse_warc_record(one)
    assert headers["warc-record-id"] == "<rec-1>"
    assert nxt == len(one)


def test_distributed_read(tmp_path, spark):
    paths = []
    for f in range(3):
        p = str(tmp_path / f"part-{f}.warc.gz")
        write_warc(p, [
            _response_record(f * 10 + i, f"doc {f}-{i}".encode(),
                             content_type="text/plain; charset=utf-8")
            for i in range(4)
        ])
        paths.append(p)
    df = read_warc(spark, paths)
    rows = df.collect()
    assert len(rows) == 12
    assert {r.warc_file for r in rows} == set(paths)
    by_id = {r.record_id: r for r in rows}
    assert by_id["rec-12"].text == "doc 1-2"
    assert by_id["rec-12"].http_status == 200
    # default filter keeps only responses
    assert {r.record_type for r in rows} == {"response"}


def test_distributed_read_all_types(tmp_path, spark):
    p = str(tmp_path / "a.warc.gz")
    write_warc(p, _sample_records())
    df = read_warc(spark, [p], record_types=())
    assert df.count() == 5


def test_truncation_raises(tmp_path):
    full = b"".join(_sample_records())
    for frac in (0.3, 0.6):
        cut = full[: int(len(full) * frac)]
        p = str(tmp_path / f"cut{frac}.warc")
        open(p, "wb").write(cut)
        with pytest.raises(ValueError):
            read_warc_minimal(p)


def test_bad_version_and_terminator_raise():
    with pytest.raises(ValueError, match="not a WARC record"):
        parse_warc_record(b"HTTP/1.1 200 OK\r\n\r\nbody\r\n\r\n")
    rec = bytearray(_response_record(1, b"x"))
    rec[-1:] = b"X"  # clobber the record terminator
    with pytest.raises(ValueError, match="not terminated"):
        parse_warc_record(bytes(rec))
    with pytest.raises(ValueError, match="Content-Length"):
        parse_warc_record(b"WARC/1.0\r\nWARC-Type: metadata\r\n\r\n")


def test_http_parsing_variants():
    status, headers, body = parse_http_response(
        b"HTTP/1.1 301 Moved Permanently\r\nLocation: /new\r\n"
        b"Content-Type: text/plain\r\n\r\nmoved")
    assert (status, headers["location"], body) == (301, "/new", b"moved")
    # bare-LF writer tolerated
    status, headers, body = parse_http_response(
        b"HTTP/1.0 200 OK\nContent-Type: a/b\n\nhi")
    assert (status, body) == (200, b"hi")
    with pytest.raises(ValueError):
        parse_http_response(b"not an http message at all")


def test_charset_chain():
    assert charset_of("text/html; charset=ISO-8859-1") == "iso-8859-1"
    assert charset_of("text/html") == "utf-8"
    assert charset_of(None) == "utf-8"
    assert charset_of('text/html; charset="utf-8"') == "utf-8"
    # declared charset wrong for the bytes -> utf-8 fallback
    assert decode_payload("héllo".encode(), "text/html; charset=bogus-enc") == "héllo"
    # neither declared nor utf-8 decodes -> latin-1 never raises
    assert decode_payload(b"\xff\xfe", "text/html; charset=utf-8") == "\xff\xfe"


def test_header_folding_and_lf_lines():
    rec = (b"WARC/1.1\r\nWARC-Type: metadata\r\n"
           b"X-Long: first\r\n  folded tail\r\n"
           b"Content-Length: 2\r\n\r\nok\r\n\r\n")
    headers, content, _ = parse_warc_record(rec)
    assert headers["x-long"] == "first folded tail"
    assert content == b"ok"


# ---------------------------------------------------------------------------
# Distributed WET-style export
# ---------------------------------------------------------------------------

def test_write_warc_shards_roundtrip_and_determinism(spark, tmp_path):
    from data_pipelines_spark.sources.warc import write_warc_shards

    docs = spark.createDataFrame(
        [(i, f"doc {i} text é", f"http://x.org/{i}") for i in range(20)],
        "doc_id long, text string, url string",
    )
    d1, d2 = str(tmp_path / "a"), str(tmp_path / "b")
    for d in (d1, d2):
        (tmp_path / d).mkdir(exist_ok=True)
    man1 = write_warc_shards(
        docs, d1, 4, uri_col="url"
    ).orderBy("shard").collect()
    man2 = write_warc_shards(
        docs.repartition(7), d2, 4, uri_col="url"
    ).orderBy("shard").collect()

    assert sum(r["n_records"] for r in man1) == 20
    # content-derived sharding + in-shard ordering + mtime=0 gzip:
    # byte-identical output regardless of input partitioning
    assert [(r["shard"], r["n_records"], r["content_md5"]) for r in man1] == \
           [(r["shard"], r["n_records"], r["content_md5"]) for r in man2]
    import hashlib
    for r in man1:
        with open(r["path"], "rb") as f:
            blob = f.read()
        assert len(blob) == r["n_bytes"]
        assert hashlib.md5(blob).hexdigest() == r["content_md5"]

    back = read_warc(spark, [r["path"] for r in man1],
                     record_types=("conversion",))
    rows = back.orderBy("target_uri").collect()
    assert len(rows) == 20
    got = {(r["target_uri"], r["text"]) for r in rows}
    want = {(f"http://x.org/{i}", f"doc {i} text é") for i in range(20)}
    assert got == want
    assert all(r["http_status"] is None for r in rows)


def test_write_warc_shards_null_text_raises(spark, tmp_path):
    import pytest as _pytest

    from data_pipelines_spark.sources.warc import write_warc_shards

    docs = spark.createDataFrame(
        [(1, "ok"), (2, None)], "doc_id long, text string"
    )
    with _pytest.raises(Exception, match="NULL 'text'"):
        write_warc_shards(docs, str(tmp_path), 2).collect()


def test_write_warc_shards_explicit_shard_col(spark, tmp_path):
    from data_pipelines_spark.sources.warc import write_warc_shards

    docs = spark.createDataFrame(
        [(i, f"t{i}", i % 3) for i in range(9)],
        "doc_id long, text string, grp int",
    )
    man = write_warc_shards(
        docs, str(tmp_path), shard_col="grp", gzip_members=False
    ).collect()
    assert sorted((r["shard"], r["n_records"]) for r in man) == [
        (0, 3), (1, 3), (2, 3)]
    assert all(r["path"].endswith(".warc") for r in man)


def test_streaming_reader_bounded_memory(tmp_path):
    """Peak Python-heap during iteration must be ~one record, not the
    file: 400 × 50 KB records = ~20 MB decompressed; the streaming
    reader's tracemalloc peak stays under 6 MB (whole-file
    materialization would show ≥ 20 MB for the gz path — decompressed
    image — and ≥ 40 MB for rows+data)."""
    import tracemalloc

    from data_pipelines_spark.sources.warc import (
        encode_warc_record,
        iter_warc_records,
        write_warc,
    )

    body = ("x" * 49_999 + "\n").encode()
    recs = [
        encode_warc_record(
            "resource", body, record_id=f"r-{i}",
            content_type="text/plain; charset=utf-8",
        )
        for i in range(400)
    ]
    for gz in (True, False):
        p = str(tmp_path / f"big{'.gz' if gz else ''}.warc")
        write_warc(p, recs, gzip_members=gz)
        tracemalloc.start()
        n = 0
        for row in iter_warc_records(p):
            assert row["n_bytes"] == 50_000
            n += 1
        _cur, peak = tracemalloc.get_traced_memory()
        tracemalloc.stop()
        assert n == 400
        assert peak < 6 * 1024 * 1024, f"gz={gz}: peak {peak} bytes"


def test_streaming_reader_yields_before_truncation(tmp_path):
    """The generator must deliver complete leading records before it
    discovers a truncated tail — proof it does not slurp the file."""
    import pytest as _pytest

    from data_pipelines_spark.sources.warc import (
        assemble_warc,
        encode_warc_record,
        iter_warc_records,
    )

    recs = [
        encode_warc_record(
            "resource", f"payload {i}".encode(), record_id=f"r-{i}",
            content_type="text/plain",
        )
        for i in range(3)
    ]
    blob = assemble_warc(recs, gzip_members=True)
    p = tmp_path / "trunc.warc.gz"
    p.write_bytes(blob[:-20])  # cut into the LAST member
    it = iter_warc_records(str(p))
    assert next(it)["text"] == "payload 0"
    assert next(it)["text"] == "payload 1"
    with _pytest.raises(ValueError, match="truncated"):
        list(it)


def test_http_lf_headers_with_crlf_in_body():
    """LF-delimited header section whose BODY contains CRLFCRLF (e.g. a
    nested HTTP payload): the split must happen at the FIRST
    terminator, not prefer CRLFCRLF anywhere in the block."""
    from data_pipelines_spark.sources.warc import parse_http_response

    nested = b"HTTP/1.1 200 OK\r\nX: y\r\n\r\ninner"
    block = b"HTTP/1.1 200 OK\nContent-Type: text/plain\n\n" + nested
    status, headers, body = parse_http_response(block)
    assert status == 200
    assert headers["content-type"] == "text/plain"
    assert body == nested


def test_cdx_index_and_selective_read(spark, tmp_path):
    """write_warc_shards(index=True) → CDX sidecar; read_warc_selective
    range-reads exactly the selected members: same rows as a full read
    of the selection, Σ member_length ≪ Σ file bytes."""
    import os

    from data_pipelines_spark.sources.warc import (
        read_cdx_index,
        read_warc,
        read_warc_selective,
        write_warc_shards,
    )

    docs = spark.createDataFrame(
        [(i, f"document body {i} " + "pad " * 200, f"http://ex.org/{i}")
         for i in range(40)],
        "doc_id long, text string, url string",
    )
    d = str(tmp_path / "wet")
    os.makedirs(d, exist_ok=True)
    man = write_warc_shards(docs, d, 4, uri_col="url", index=True).collect()
    assert all(r["index_path"] == r["path"] + ".cdx" for r in man)

    idx = read_cdx_index(spark, [r["index_path"] for r in man])
    assert idx.count() == 40
    # select 5 specific documents by uri
    want_uris = {f"http://ex.org/{i}" for i in (0, 7, 13, 21, 39)}
    sel = idx.filter(idx.target_uri.isin(list(want_uris)))
    picked = read_warc_selective(spark, sel).collect()
    assert {r["target_uri"] for r in picked} == want_uris

    # parity with the full-scan reader on the same uris
    full = read_warc(
        spark, [r["path"] for r in man], record_types=("conversion",)
    ).filter("target_uri in ({})".format(
        ",".join(f"'{u}'" for u in want_uris))).collect()
    assert {(r["target_uri"], r["text"]) for r in picked} == \
           {(r["target_uri"], r["text"]) for r in full}

    # bytes touched: selected member lengths ≪ total file bytes
    sel_bytes = sum(r["member_length"] for r in sel.collect())
    all_bytes = sum(r["n_bytes"] for r in man)
    assert sel_bytes < all_bytes / 4

    # a single member is independently decodable at (offset, length)
    one = sel.limit(1).collect()[0]
    import gzip as _gzip
    with open(one["warc_file"], "rb") as f:
        f.seek(one["offset"])
        member = f.read(one["member_length"])
    assert _gzip.decompress(member).startswith(b"WARC/1.0")


from hypothesis import given, settings, strategies as st  # noqa: E402


@settings(max_examples=40, deadline=None)
@given(
    st.lists(
        st.binary(max_size=300),  # arbitrary payloads incl. CRLFs/gzip magic
        min_size=1,
        max_size=8,
    ),
    st.booleans(),
)
def test_warc_round_trip_property(payloads, gz):
    """Streaming reader inverts the writer for ARBITRARY payload bytes
    (CRLF-laden, gzip-magic-prefixed, empty) in both layouts."""
    import io as _io
    import tempfile as _tf

    from data_pipelines_spark.sources.warc import (
        assemble_warc,
        encode_warc_record,
        iter_warc_records,
    )

    recs = [
        encode_warc_record(
            "resource", p, record_id=f"r-{i}",
            content_type="application/octet-stream",
        )
        for i, p in enumerate(payloads)
    ]
    with _tf.NamedTemporaryFile(suffix=".warc", delete=False) as f:
        f.write(assemble_warc(recs, gzip_members=gz))
        path = f.name
    try:
        rows = list(iter_warc_records(path))
    finally:
        import os as _os

        _os.unlink(path)
    assert [bytes(r["payload"]) for r in rows] == payloads
    assert [r["record_id"] for r in rows] == [
        f"r-{i}" for i in range(len(payloads))
    ]
