"""Blosc container + LZ4 block codec — pure Python, no libraries.

Removes the engine's last stdlib-expressible Zarr gate: numcodecs'
default v2 compressor is ``blosc`` with ``cname='lz4'``, and both
formats are small public specs —

- **LZ4 block format** (lz4.org/block spec): sequences of
  ``token | literal-length ext | literals | 2-byte LE match offset |
  match-length ext``; token high nibble = literal length (15 extends
  by 255-chunks), low nibble = match length − 4 (likewise); minimum
  match 4; the final sequence is literals only; encoders must keep the
  last 5 bytes literal and start no match within the last 12.
- **Blosc v1 frame** (c-blosc README_HEADER): 16-byte header
  ``version | versionlz | flags | typesize | nbytes | blocksize |
  cbytes`` (LE uint32 × 3), then — unless the memcpy flag —
  ``int32 bstarts[nblocks]`` absolute offsets of per-block compressed
  regions; each block holds one or more "split" streams, each a
  ``int32 csize`` prefix + payload, where ``csize == split size``
  marks a stored (incompressible) split. Flags: bit1 = byte-shuffle
  (decode-side inverse is the same transpose `raster.py`'s Zarr
  ``shuffle`` filter uses), bit2 = memcpy, bits 5-7 = compressor code
  (1 = LZ4/LZ4HC — the decode side is identical; 4 = internal zlib).

The writer always emits nsplits=1 LZ4 frames (valid for any c-blosc
reader); the reader also accepts the shuffled typesize-split layout
c-blosc 1.x produces (nsplits = typesize), detected by stream-
consumption consistency (sound because the LZ4 decoder raises on
truncated literal runs — a wrong probe cannot "succeed" silently).
Both shuffles are implemented: byte-shuffle (flags bit 1) is the
(n, typesize) byte transpose; bit-shuffle (flags bit 2) is the
(nelem, typesize*8) bit-matrix transpose, MSB-first within bytes,
applied to the largest multiple-of-8 element count with trailing
bytes copied verbatim — the bitshuffle library's documented reference
semantics, as wrapped by c-blosc. zstd and snappy cnames ride
pyarrow's bundled C codecs (a baked-in dependency — real libzstd/
libsnappy frames, not re-implementations); only blosclz still raises
with the library pointer — same honest-gate contract as every parser
here. Wire vectors hand-pinned from the specs in tests/test_blosc.py,
plus an external differential: pyarrow's ``lz4_raw`` (libLZ4) must
decode our blocks and vice versa.
"""

from __future__ import annotations

import struct
import zlib

_SHUFFLE = 0x1
_MEMCPY = 0x2
_BITSHUFFLE = 0x4
_CNAME_LZ4 = 1
_CNAME_SNAPPY = 2
_CNAME_ZLIB = 4
_CNAME_ZSTD = 5
_CNAMES = {0: "blosclz", 1: "lz4", 2: "snappy", 3: "zlib?", 4: "zlib", 5: "zstd"}


def _arrow_codec(name: str):
    """pyarrow's bundled C codecs (zstd, snappy) — a baked-in library,
    not a stdlib re-implementation; None when this build lacks one."""
    try:
        import pyarrow as pa

        if pa.Codec.is_available(name):
            return pa.Codec(name)
    except Exception:
        return None
    return None


# ---------------------------------------------------------------------------
# LZ4 block format
# ---------------------------------------------------------------------------

def lz4_decompress_block(src: bytes, dest_size: int) -> bytes:
    """Decode one LZ4 block of known uncompressed size (the blosc split
    carries the size out of band, as does Zarr v3's lz4 codec)."""
    out = bytearray()
    i, n = 0, len(src)
    while i < n:
        token = src[i]
        i += 1
        lit = token >> 4
        if lit == 15:
            while True:
                b = src[i]
                i += 1
                lit += b
                if b != 255:
                    break
        if i + lit > n:
            # A lenient short slice here can land exactly on dest_size and
            # make a WRONG nsplits probe in _decode_region look successful
            # (the r9 Hypothesis counterexample) — truncation must be loud.
            raise ValueError("LZ4: truncated literal run")
        out += src[i : i + lit]
        i += lit
        if i >= n:
            break  # final sequence: literals only
        off = src[i] | (src[i + 1] << 8)
        i += 2
        if off == 0:
            raise ValueError("LZ4: zero match offset")
        mlen = (token & 0xF) + 4
        if (token & 0xF) == 15:
            while True:
                b = src[i]
                i += 1
                mlen += b
                if b != 255:
                    break
        start = len(out) - off
        if start < 0:
            raise ValueError("LZ4: match offset before block start")
        for j in range(mlen):  # overlapping copies are the point
            out.append(out[start + j])
    if len(out) != dest_size:
        raise ValueError(
            f"LZ4: decoded {len(out)} bytes, expected {dest_size}"
        )
    return bytes(out)


def lz4_compress_block(src: bytes) -> bytes:
    """Greedy hash-chain LZ4 encoder producing spec-valid blocks (the
    last 5 bytes stay literal; no match begins within the last 12)."""
    n = len(src)
    out = bytearray()
    table: dict[bytes, int] = {}
    anchor = 0
    i = 0
    limit = n - 12  # last match may not start past here

    def emit(lit_start: int, lit_end: int, mlen: int, off: int) -> None:
        lit = lit_end - lit_start
        ml = mlen - 4 if mlen else 0
        token = (min(lit, 15) << 4) | (min(ml, 15) if mlen else 0)
        out.append(token)
        rest = lit - 15
        while rest >= 0:
            out.append(min(rest, 255))
            if rest < 255:
                break
            rest -= 255
        out.extend(src[lit_start:lit_end])
        if mlen:
            out.extend(struct.pack("<H", off))
            rest = ml - 15
            while rest >= 0:
                out.append(min(rest, 255))
                if rest < 255:
                    break
                rest -= 255

    while i < limit:
        key = src[i : i + 4]
        cand = table.get(key)
        table[key] = i
        if cand is not None and i - cand <= 0xFFFF and src[cand : cand + 4] == key:
            mlen = 4
            # extend, but the last 5 bytes must remain literal
            while i + mlen < n - 5 and src[cand + mlen] == src[i + mlen]:
                mlen += 1
            emit(anchor, i, mlen, i - cand)
            i += mlen
            anchor = i
        else:
            i += 1
    # final literals
    lit = n - anchor
    token = min(lit, 15) << 4
    out.append(token)
    rest = lit - 15
    while rest >= 0:
        out.append(min(rest, 255))
        if rest < 255:
            break
        rest -= 255
    out += src[anchor:]
    return bytes(out)


# ---------------------------------------------------------------------------
# Blosc v1 container
# ---------------------------------------------------------------------------

def _shuffle_bytes(data: bytes, typesize: int) -> bytes:
    import numpy as np

    a = np.frombuffer(data, dtype="u1")
    return a.reshape(-1, typesize).T.tobytes()


def _unshuffle_bytes(data: bytes, typesize: int) -> bytes:
    import numpy as np

    a = np.frombuffer(data, dtype="u1")
    return a.reshape(typesize, -1).T.tobytes()


def _bitshuffle_bytes(data: bytes, typesize: int) -> bytes:
    """c-blosc bit-shuffle of one block: transpose the (nelem,
    typesize*8) bit matrix so bit-plane (byte b, bit k) of every
    element is contiguous, byte-major then bit. Bit order is
    LSB-FIRST on both axes — derived by hand-evaluating the scalar
    kernel (bitshuffle's ``TRANS_BIT_8X8`` Hacker's-Delight transpose
    on a little-endian 8-byte load, ``out[k*rows+i] = x; x >>= 8``):
    eight 0x01 bytes land in output plane byte 0 as 0xFF (bit-0 plane
    FIRST), and a lone element j sets bit j of its plane byte. Per
    c-blosc's wrapper, only the largest multiple-of-8 element count is
    shuffled; trailing bytes are copied verbatim."""
    import numpy as np

    nelem = (len(data) // typesize) & ~7
    cut = nelem * typesize
    if cut == 0:
        return data
    bits = np.unpackbits(
        np.frombuffer(data[:cut], dtype="u1").reshape(nelem, typesize),
        axis=1,
        bitorder="little",
    )
    return np.packbits(bits.T, bitorder="little").tobytes() + data[cut:]


def _bit_unshuffle_bytes(data: bytes, typesize: int) -> bytes:
    import numpy as np

    nelem = (len(data) // typesize) & ~7
    cut = nelem * typesize
    if cut == 0:
        return data
    planes = np.unpackbits(
        np.frombuffer(data[:cut], dtype="u1"), bitorder="little"
    ).reshape(typesize * 8, nelem)
    return np.packbits(planes.T, bitorder="little").tobytes() + data[cut:]


def _decode_region(
    region: bytes, neblock: int, nsplits: int, cname: int, codec=None
) -> bytes:
    """One block's compressed region → neblock bytes, given a split
    count; raises if the streams don't consume the region exactly."""
    out = bytearray()
    pos = 0
    base = neblock // nsplits
    sizes = [base] * nsplits
    sizes[-1] += neblock - base * nsplits
    for want in sizes:
        (csize,) = struct.unpack_from("<i", region, pos)
        pos += 4
        payload = region[pos : pos + csize]
        if len(payload) != csize:
            raise ValueError("blosc: truncated split")
        pos += csize
        if csize == want:
            out += payload  # stored split
        elif cname == _CNAME_LZ4:
            out += lz4_decompress_block(payload, want)
        elif cname == _CNAME_ZLIB:
            raw = zlib.decompress(payload)
            if len(raw) != want:
                raise ValueError("blosc: zlib split size mismatch")
            out += raw
        elif cname in (_CNAME_ZSTD, _CNAME_SNAPPY):
            # codec resolved ONCE per frame by blosc_decompress (not per
            # split per probe — a 1 GiB frame has thousands of splits)
            if codec is None:
                raise NotImplementedError(
                    f"blosc cname {_CNAMES[cname]!r}: pyarrow build "
                    "without it — use the blosc/numcodecs library path"
                )
            raw = bytes(codec.decompress(payload, want))
            if len(raw) != want:
                raise ValueError(f"blosc: {_CNAMES[cname]} split size mismatch")
            out += raw
        else:
            raise NotImplementedError(
                f"blosc cname {_CNAMES.get(cname, cname)!r}: use the "
                "blosc/numcodecs library path"
            )
    if pos != len(region):
        raise ValueError("blosc: split streams do not cover the block")
    return bytes(out)


def blosc_decompress(src: bytes) -> bytes:
    """Blosc v1 frame → original bytes (header + bstarts + per-block
    split streams; memcpy frames copy through; byte-shuffle undone)."""
    if len(src) < 16:
        raise ValueError("blosc: frame shorter than the 16-byte header")
    version, _versionlz, flags, typesize = src[0], src[1], src[2], src[3]
    nbytes, blocksize, cbytes = struct.unpack_from("<III", src, 4)
    if version < 1 or version > 2:
        raise NotImplementedError(f"blosc header version {version}")
    if (flags & _SHUFFLE) and (flags & _BITSHUFFLE):
        raise ValueError("blosc: both shuffle flags set")
    if cbytes != len(src):
        raise ValueError(f"blosc: cbytes {cbytes} != frame size {len(src)}")
    if flags & _MEMCPY:
        # c-blosc memcpys the ORIGINAL buffer (no unshuffle on decode)
        return bytes(src[16 : 16 + nbytes])
    cname = (flags >> 5) & 0x7
    codec = (
        _arrow_codec("zstd" if cname == _CNAME_ZSTD else "snappy")
        if cname in (_CNAME_ZSTD, _CNAME_SNAPPY)
        else None
    )
    nblocks = -(-nbytes // blocksize) if blocksize else 0
    bstarts = list(struct.unpack_from(f"<{nblocks}i", src, 16))
    ends = bstarts[1:] + [len(src)]
    shuffled = bool(flags & _SHUFFLE) and typesize > 1
    bitshuffled = bool(flags & _BITSHUFFLE) and typesize >= 1
    out = bytearray()
    for bi, (start, end) in enumerate(zip(bstarts, ends)):
        neblock = min(blocksize, nbytes - bi * blocksize)
        region = src[start:end]
        candidates = [1]
        if (shuffled or bitshuffled) and typesize <= 16 and neblock % typesize == 0:
            # c-blosc 1.x splits shuffled blocks by typesize
            candidates = [typesize, 1]
        last_err: Exception | None = None
        block = None
        for nsplits in candidates:
            try:
                block = _decode_region(region, neblock, nsplits, cname, codec)
                break
            except (
                ValueError, IndexError, struct.error, zlib.error, OSError,
            ) as e:
                # struct.error: a wrong typesize-split probe can run its
                # csize unpack past the region end; OSError: pyarrow's
                # zstd/snappy raise ArrowIOError (an OSError) when a
                # probe's split frame doesn't fit `want` — fall back to
                # nsplits=1 (no file IO happens inside _decode_region)
                last_err = e
        if block is None:
            raise ValueError(f"blosc: block {bi} undecodable: {last_err}")
        if shuffled:
            block = _unshuffle_bytes(block, typesize)
        elif bitshuffled:
            block = _bit_unshuffle_bytes(block, typesize)
        out += block
    if len(out) != nbytes:
        raise ValueError(f"blosc: decoded {len(out)} != nbytes {nbytes}")
    return bytes(out)


def blosc_compress(
    data: bytes,
    typesize: int = 1,
    cname: str = "lz4",
    shuffle: bool | int = True,
    blocksize: int = 1 << 20,
) -> bytes:
    """bytes → Blosc v1 frame (nsplits=1 per block — valid for any
    c-blosc reader; stored-split fallback when LZ4 does not help).

    ``shuffle``: False/0 none, True/1 byte-shuffle, 2 bit-shuffle
    (numcodecs' NOSHUFFLE/SHUFFLE/BITSHUFFLE codes)."""
    codes = {
        "lz4": _CNAME_LZ4,
        "zlib": _CNAME_ZLIB,
        "zstd": _CNAME_ZSTD,
        "snappy": _CNAME_SNAPPY,
    }
    if cname not in codes:
        raise NotImplementedError(
            f"blosc_compress cname {cname!r}: lz4/zlib/zstd/snappy only"
        )
    arrow = None
    if cname in ("zstd", "snappy"):
        arrow = _arrow_codec(cname)
        if arrow is None:
            raise NotImplementedError(
                f"blosc_compress cname {cname!r}: pyarrow build without it"
            )
    code = codes[cname]
    nbytes = len(data)
    if typesize > 255:
        # c-blosc caps the 1-byte header field at BLOSC_MAX_TYPESIZE and
        # treats larger typesizes as 1 — shuffling at the full typesize
        # while recording a truncated one would be silently undecodable.
        typesize, shuffle = 1, False
    bitshuffle = shuffle == 2
    byteshuffle = (
        not bitshuffle and bool(shuffle)
        and typesize > 1 and nbytes % typesize == 0
    )
    blocksize = min(blocksize, max(nbytes, 1))
    if (byteshuffle or bitshuffle) and blocksize % typesize and blocksize > typesize:
        # keep element boundaries block-aligned (round-trip is symmetric
        # either way; this matches the blocks real c-blosc emits)
        blocksize -= blocksize % typesize
    nblocks = -(-nbytes // blocksize) if nbytes else 0
    flags = (code << 5) | (
        _BITSHUFFLE if bitshuffle else (_SHUFFLE if byteshuffle else 0)
    )
    regions: list[bytes] = []
    for bi in range(nblocks):
        raw = data[bi * blocksize : (bi + 1) * blocksize]
        if byteshuffle:
            raw = _shuffle_bytes(raw, typesize)
        elif bitshuffle:
            raw = _bitshuffle_bytes(raw, typesize)
        if code == _CNAME_LZ4:
            comp = lz4_compress_block(raw)
        elif code == _CNAME_ZLIB:
            comp = zlib.compress(raw, 9)
        else:
            comp = bytes(arrow.compress(raw))
        if len(comp) >= len(raw):
            comp = raw  # stored split (csize == neblock)
        regions.append(struct.pack("<i", len(comp)) + comp)
    header_len = 16 + 4 * nblocks
    bstarts = []
    pos = header_len
    for r in regions:
        bstarts.append(pos)
        pos += len(r)
    frame = bytearray()
    frame += bytes([2, 1, flags, typesize])
    frame += struct.pack("<III", nbytes, blocksize, pos)
    frame += struct.pack(f"<{nblocks}i", *bstarts)
    for r in regions:
        frame += r
    return bytes(frame)
