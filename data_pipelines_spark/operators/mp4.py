"""ISO-BMFF (MP4, ISO/IEC 14496-12) container: parse, demux, write.

Video in a training-data pipeline rides through the engine as opaque
``binary`` payloads (`operators/multimodal.py`); what the engine can do
dependency-free is the CONTAINER layer — walk the box tree, read the
movie/track headers, and demux real sample byte-ranges from the
``stts``/``stsc``/``stsz``/``stco`` tables. That turns the former
"MP4/video needs pyav" gate into a narrow one: inter-frame codecs
(H.264/265/VP9/AV1) still need a codec library, but metadata
extraction, frame-sample fan-out, and Motion-JPEG tracks (each sample
is a complete JPEG, decodable by `operators/jpeg.py`) run end-to-end
in-repo. Reference analogue: the sentinel imagery pipeline moves
opaque blobs through per-file task maps (SURVEY.md §3.3); the demux
kernel here plays the role GDAL/pyav plays there.

Format facts encoded (ISO/IEC 14496-12 §4, §8):

- A file is a sequence of boxes: ``uint32 size | fourcc type |
  payload``; ``size==1`` switches to a 64-bit ``largesize`` (files
  past 4 GiB), ``size==0`` means "to end of file". Container boxes
  (``moov``/``trak``/``mdia``/``minf``/``stbl``/``dinf``) hold child
  boxes as their payload; "full boxes" prepend version+flags.
- Sample-to-byte mapping: ``stsc`` runs of chunks share a
  samples-per-chunk count, ``stco``/``co64`` give chunk start offsets
  (absolute file offsets), ``stsz`` per-sample sizes; a sample's
  offset is its chunk's offset plus the sizes of the samples before
  it in that chunk. ``stts`` (decode deltas) gives timing.

Scale shape: payload-level kernels over Arrow-batched `mapInPandas`
(one decode per payload, no per-row Python round trips); a video
corpus is millions of ≤ a-few-hundred-MB objects, the same fan-out
grain as the image tier.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame

_CONTAINERS = {b"moov", b"trak", b"mdia", b"minf", b"stbl", b"dinf",
               b"edts", b"udta", b"mvex", b"moof", b"traf"}

_MATRIX_IDENTITY = (0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)


# ---------------------------------------------------------------------------
# Box walking
# ---------------------------------------------------------------------------

def iter_boxes(data: bytes, start: int = 0, end: int | None = None):
    """Yield (fourcc, payload_start, payload_end) for the boxes in
    ``data[start:end]``. Raises on truncation or malformed sizes — the
    loud-failure contract every parser in the engine shares."""
    end = len(data) if end is None else end
    off = start
    while off < end:
        if off + 8 > end:
            raise ValueError(f"truncated MP4 box header at offset {off}")
        size = struct.unpack_from(">I", data, off)[0]
        typ = data[off + 4 : off + 8]
        head = 8
        if size == 1:
            if off + 16 > end:
                raise ValueError(f"truncated MP4 largesize at offset {off}")
            size = struct.unpack_from(">Q", data, off + 8)[0]
            head = 16
        elif size == 0:
            size = end - off
        if size < head or off + size > end:
            raise ValueError(
                f"MP4 box {typ!r} at offset {off} overruns file "
                f"(size {size}, {end - off} bytes left)"
            )
        yield typ, off + head, off + size
        off += size


def _find(data: bytes, start: int, end: int, fourcc: bytes) -> tuple[int, int]:
    for typ, a, b in iter_boxes(data, start, end):
        if typ == fourcc:
            return a, b
    raise ValueError(f"required MP4 box {fourcc!r} missing")


def _full_box(data: bytes, start: int) -> tuple[int, int, int]:
    """(version, flags, first content offset) of a full box payload."""
    v_f = struct.unpack_from(">I", data, start)[0]
    return v_f >> 24, v_f & 0xFFFFFF, start + 4


# ---------------------------------------------------------------------------
# Parsing (reader half)
# ---------------------------------------------------------------------------

def parse_mp4(data: bytes) -> dict:
    """Parse the container → ``{brand, timescale, duration_s,
    tracks: [...]}`` with per-track sample tables.

    Each track dict: ``track_id``, ``handler`` (``vide``/``soun``/…),
    ``codec`` (sample-entry fourcc), ``width``/``height`` (video, from
    the sample entry), ``timescale``, ``duration_s``, ``n_samples``,
    ``sample_offsets``/``sample_sizes`` (absolute byte ranges in
    ``data``) and ``sample_deltas`` (stts-expanded, media timescale).
    """
    brand = None
    moov = None
    for typ, a, b in iter_boxes(data):
        if typ == b"ftyp":
            brand = data[a : a + 4].decode("latin-1")
        elif typ == b"moov":
            moov = (a, b)
    if moov is None:
        raise ValueError("MP4 has no moov box")

    mv_a, mv_b = _find(data, *moov, b"mvhd")
    ver, _, p = _full_box(data, mv_a)
    if ver == 1:
        timescale = struct.unpack_from(">I", data, p + 16)[0]
        duration = struct.unpack_from(">Q", data, p + 20)[0]
    else:
        timescale = struct.unpack_from(">I", data, p + 8)[0]
        duration = struct.unpack_from(">I", data, p + 12)[0]

    tracks = []
    for typ, a, b in iter_boxes(data, *moov):
        if typ != b"trak":
            continue
        tracks.append(_parse_trak(data, a, b))
    return {
        "brand": brand,
        "timescale": timescale,
        "duration_s": duration / timescale if timescale else None,
        "tracks": tracks,
    }


def _parse_trak(data: bytes, a: int, b: int) -> dict:
    tk_a, _ = _find(data, a, b, b"tkhd")
    ver, _, p = _full_box(data, tk_a)
    track_id = struct.unpack_from(
        ">I", data, p + (16 if ver == 1 else 8)
    )[0]

    md_a, md_b = _find(data, a, b, b"mdia")
    mh_a, _ = _find(data, md_a, md_b, b"mdhd")
    ver, _, p = _full_box(data, mh_a)
    if ver == 1:
        m_timescale = struct.unpack_from(">I", data, p + 16)[0]
        m_duration = struct.unpack_from(">Q", data, p + 20)[0]
    else:
        m_timescale = struct.unpack_from(">I", data, p + 8)[0]
        m_duration = struct.unpack_from(">I", data, p + 12)[0]
    hd_a, _ = _find(data, md_a, md_b, b"hdlr")
    handler = data[hd_a + 8 : hd_a + 12].decode("latin-1")

    mi_a, mi_b = _find(data, md_a, md_b, b"minf")
    st_a, st_b = _find(data, mi_a, mi_b, b"stbl")

    sd_a, _ = _find(data, st_a, st_b, b"stsd")
    _, _, p = _full_box(data, sd_a)
    n_entries = struct.unpack_from(">I", data, p)[0]
    codec = width = height = None
    if n_entries:
        entry_size = struct.unpack_from(">I", data, p + 4)[0]
        if entry_size < 16:
            raise ValueError("malformed stsd sample entry")
        codec = data[p + 8 : p + 12].decode("latin-1")
        if handler == "vide":
            # VisualSampleEntry: 6 reserved + dref(2) + pre_defined/
            # reserved (16) then width/height uint16s
            width = struct.unpack_from(">H", data, p + 12 + 24)[0]
            height = struct.unpack_from(">H", data, p + 12 + 26)[0]

    # stts → per-sample deltas
    tt_a, _ = _find(data, st_a, st_b, b"stts")
    _, _, p = _full_box(data, tt_a)
    n = struct.unpack_from(">I", data, p)[0]
    deltas: list[int] = []
    for i in range(n):
        cnt, dl = struct.unpack_from(">II", data, p + 4 + 8 * i)
        deltas.extend([dl] * cnt)

    # stsz → sizes
    sz_a, _ = _find(data, st_a, st_b, b"stsz")
    _, _, p = _full_box(data, sz_a)
    fixed, n_samples = struct.unpack_from(">II", data, p)
    if fixed:
        sizes = [fixed] * n_samples
    else:
        sizes = list(struct.unpack_from(f">{n_samples}I", data, p + 8))

    # stco / co64 → chunk offsets
    try:
        co_a, _ = _find(data, st_a, st_b, b"stco")
        _, _, p = _full_box(data, co_a)
        n_chunks = struct.unpack_from(">I", data, p)[0]
        chunk_offsets = list(struct.unpack_from(f">{n_chunks}I", data, p + 4))
    except ValueError:
        co_a, _ = _find(data, st_a, st_b, b"co64")
        _, _, p = _full_box(data, co_a)
        n_chunks = struct.unpack_from(">I", data, p)[0]
        chunk_offsets = list(struct.unpack_from(f">{n_chunks}Q", data, p + 4))

    # stsc → samples per chunk, expanded over the chunk list
    sc_a, _ = _find(data, st_a, st_b, b"stsc")
    _, _, p = _full_box(data, sc_a)
    n_runs = struct.unpack_from(">I", data, p)[0]
    runs = [
        struct.unpack_from(">III", data, p + 4 + 12 * i)[:2]
        for i in range(n_runs)
    ]  # (first_chunk 1-based, samples_per_chunk)

    sample_offsets: list[int] = []
    si = 0
    for ci, c_off in enumerate(chunk_offsets, start=1):
        spc = 0
        for first, count in runs:
            if first <= ci:
                spc = count
            else:
                break
        off = c_off
        for _ in range(spc):
            if si >= n_samples:
                break
            sample_offsets.append(off)
            off += sizes[si]
            si += 1
    if si != n_samples:
        raise ValueError(
            f"stsc/stco map {si} samples but stsz declares {n_samples}"
        )

    return {
        "track_id": track_id,
        "handler": handler,
        "codec": codec,
        "width": width,
        "height": height,
        "timescale": m_timescale,
        "duration_s": m_duration / m_timescale if m_timescale else None,
        "n_samples": n_samples,
        "sample_offsets": sample_offsets,
        "sample_sizes": sizes,
        "sample_deltas": deltas,
    }


def extract_samples(
    data: bytes, track: dict, which: list[int] | None = None
) -> list[tuple[int, int, bytes]]:
    """Demux sample payloads for a parsed track → [(sample_no, offset,
    bytes)]. ``which`` selects sample indices (default: all). For a
    Motion-JPEG track each payload is a complete JPEG image."""
    idx = range(track["n_samples"]) if which is None else which
    out = []
    for i in idx:
        off = track["sample_offsets"][i]
        size = track["sample_sizes"][i]
        if off + size > len(data):
            raise ValueError(f"sample {i} overruns file")
        out.append((i, off, bytes(data[off : off + size])))
    return out


# ---------------------------------------------------------------------------
# Writer half (self-contained validation files, MJPEG export)
# ---------------------------------------------------------------------------

def _box(typ: bytes, payload: bytes) -> bytes:
    if len(payload) + 8 > 0xFFFFFFFF:
        return struct.pack(">I", 1) + typ + struct.pack(
            ">Q", len(payload) + 16
        ) + payload
    return struct.pack(">I", len(payload) + 8) + typ + payload


def _full(typ: bytes, version: int, flags: int, payload: bytes) -> bytes:
    return _box(typ, struct.pack(">I", (version << 24) | flags) + payload)


def encode_mp4(
    samples: list[bytes],
    *,
    codec: str = "jpeg",
    handler: str = "vide",
    width: int = 0,
    height: int = 0,
    timescale: int = 1000,
    sample_delta: int = 40,
    samples_per_chunk: int = 3,
    track_id: int = 1,
    co64: bool = False,
) -> bytes:
    """Minimal valid single-track MP4: ``ftyp | mdat | moov``.

    ``samples`` become the media data, grouped ``samples_per_chunk``
    per chunk so readers must genuinely walk the stsc/stco mapping
    (single-chunk files can't tell a broken chunk walk from a working
    one). With ``codec='jpeg'`` and JPEG blobs this is a Motion-JPEG
    video any ISO-BMFF demuxer (including :func:`parse_mp4`) can
    decode frame-by-frame. ``co64`` writes 64-bit chunk offsets (the
    >4 GiB layout) — offsets stay byte-exact either way.
    """
    if not samples:
        raise ValueError("encode_mp4: at least one sample required")
    n = len(samples)
    duration = n * sample_delta

    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 0x200) + b"isomiso2mp41")
    mdat_payload = b"".join(samples)
    mdat = _box(b"mdat", mdat_payload)
    # Absolute offset of the first sample = ftyp + the mdat HEADER as
    # actually encoded: _box switches to a 16-byte largesize header
    # when the payload exceeds 2^32-9 bytes, and assuming 8 would skew
    # every stco/co64 entry by 8 in exactly the >4 GiB files co64=True
    # exists for.
    data_start = len(ftyp) + (len(mdat) - len(mdat_payload))

    # chunk offsets
    chunk_offsets = []
    off = data_start
    for i in range(0, n, samples_per_chunk):
        chunk_offsets.append(off)
        off += sum(len(s) for s in samples[i : i + samples_per_chunk])

    mvhd = _full(b"mvhd", 0, 0, struct.pack(
        ">IIIII", 0, 0, timescale, duration, 0x10000
    ) + struct.pack(">HHII", 0x0100, 0, 0, 0) + struct.pack(
        ">9i", *_MATRIX_IDENTITY
    ) + b"\x00" * 24 + struct.pack(">I", track_id + 1))

    tkhd = _full(b"tkhd", 0, 7, struct.pack(
        ">IIIII", 0, 0, track_id, 0, duration
    ) + b"\x00" * 8 + struct.pack(">HHHH", 0, 0, 0, 0) + struct.pack(
        ">9i", *_MATRIX_IDENTITY
    ) + struct.pack(">II", width << 16, height << 16))

    mdhd = _full(b"mdhd", 0, 0, struct.pack(
        ">IIIIHH", 0, 0, timescale, duration, 0x55C4, 0
    ))
    hdlr = _full(b"hdlr", 0, 0, struct.pack(
        ">I", 0
    ) + handler.encode("latin-1") + b"\x00" * 12 + b"engine\x00")

    if handler == "vide":
        entry = (
            struct.pack(">I", 86 + 0) + codec.encode("latin-1")
            + b"\x00" * 6 + struct.pack(">H", 1)     # data_ref_index
            + b"\x00" * 16
            + struct.pack(">HH", width, height)
            + struct.pack(">IIIH", 0x480000, 0x480000, 0, 1)
            + b"\x00" * 32                            # compressorname
            + struct.pack(">Hh", 24, -1)
        )
        mhd = _full(b"vmhd", 0, 1, struct.pack(">HHHH", 0, 0, 0, 0))
    else:
        entry = (
            struct.pack(">I", 36) + codec.encode("latin-1")
            + b"\x00" * 6 + struct.pack(">H", 1)
            + b"\x00" * 8
            + struct.pack(">HHHH", 2, 16, 0, 0)
            + struct.pack(">I", timescale << 16)
        )
        mhd = _full(b"smhd", 0, 0, struct.pack(">HH", 0, 0))

    stsd = _full(b"stsd", 0, 0, struct.pack(">I", 1) + entry)
    stts = _full(b"stts", 0, 0, struct.pack(">III", 1, n, sample_delta))
    stsc = _full(b"stsc", 0, 0, struct.pack(
        ">IIII", 1, 1, samples_per_chunk, 1
    ))
    stsz = _full(b"stsz", 0, 0, struct.pack(
        ">II", 0, n
    ) + struct.pack(f">{n}I", *(len(s) for s in samples)))
    if co64:
        stco = _full(b"co64", 0, 0, struct.pack(
            ">I", len(chunk_offsets)
        ) + struct.pack(f">{len(chunk_offsets)}Q", *chunk_offsets))
    else:
        stco = _full(b"stco", 0, 0, struct.pack(
            ">I", len(chunk_offsets)
        ) + struct.pack(f">{len(chunk_offsets)}I", *chunk_offsets))

    dref = _full(b"dref", 0, 0, struct.pack(">I", 1) + _full(
        b"url ", 0, 1, b""
    ))
    stbl = _box(b"stbl", stsd + stts + stsc + stsz + stco)
    minf = _box(b"minf", mhd + _box(b"dinf", dref) + stbl)
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    trak = _box(b"trak", tkhd + mdia)
    moov = _box(b"moov", mvhd + trak)
    return ftyp + mdat + moov


# ---------------------------------------------------------------------------
# Spark-side kernels
# ---------------------------------------------------------------------------

VIDEO_META_SCHEMA = (
    "media_id long, brand string, duration_s double, n_tracks int, "
    "track_id int, handler string, codec string, width int, height int, "
    "n_samples int, fps double"
)


def video_metadata(media: DataFrame) -> DataFrame:
    """Container metadata per payload, one row per track — the
    filter-before-decode step of a video-corpus pipeline (drop
    non-video, tiny, or absurd-fps objects before any codec work).
    Arrow-batched mapInPandas over (media_id, content)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [c.split()[0] for c in VIDEO_META_SCHEMA.split(", ")]
        for pdf in batches:
            rows = []
            for mid, blob in zip(pdf["media_id"], pdf["content"]):
                info = parse_mp4(bytes(blob))
                for t in info["tracks"]:
                    mean_delta = (
                        sum(t["sample_deltas"]) / len(t["sample_deltas"])
                        if t["sample_deltas"] else None
                    )
                    rows.append({
                        "media_id": mid,
                        "brand": info["brand"],
                        "duration_s": info["duration_s"],
                        "n_tracks": len(info["tracks"]),
                        "track_id": t["track_id"],
                        "handler": t["handler"],
                        "codec": t["codec"],
                        "width": t["width"],
                        "height": t["height"],
                        "n_samples": t["n_samples"],
                        "fps": (
                            t["timescale"] / mean_delta
                            if mean_delta else None
                        ),
                    })
            yield pd.DataFrame(rows, columns=cols) if rows else pd.DataFrame(
                {c: [] for c in cols}
            )

    return media.select("media_id", "content").mapInPandas(
        run, VIDEO_META_SCHEMA
    )


MP4_FRAME_SCHEMA = (
    "media_id long, frame_no int, frame_offset long, frame binary"
)


def sample_frames_mp4(media: DataFrame, num_frames: int = 4) -> DataFrame:
    """Evenly-spaced REAL frame extraction: demux ``num_frames`` sample
    payloads per video via the stsc/stco/stsz tables (first video
    track). For Motion-JPEG each frame is a complete JPEG —
    `operators.jpeg.decode_jpeg` turns it into pixels with no codec
    library. Replaces the byte-window stub
    (`multimodal.sample_frames`) wherever the payload is ISO-BMFF."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "frame_no": [],
                   "frame_offset": [], "frame": []}
            for mid, blob in zip(pdf["media_id"], pdf["content"]):
                blob = bytes(blob)
                info = parse_mp4(blob)
                vids = [t for t in info["tracks"] if t["handler"] == "vide"]
                if not vids:
                    raise ValueError(
                        f"media_id {mid}: no video track in MP4"
                    )
                t = vids[0]
                n = t["n_samples"]
                k = min(num_frames, n)
                picks = sorted({(i * n) // k for i in range(k)})
                for i, off, payload in extract_samples(blob, t, picks):
                    out["media_id"].append(mid)
                    out["frame_no"].append(i)
                    out["frame_offset"].append(off)
                    out["frame"].append(payload)
            yield pd.DataFrame(out)

    return media.select("media_id", "content").mapInPandas(
        run, MP4_FRAME_SCHEMA
    )
