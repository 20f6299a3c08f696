"""Blosc + LZ4 (`sources.blosc`): hand-pinned wire vectors from the two
public specs, encoder validity rules, container round-trips across
typesize/shuffle/blocking, the c-blosc typesize-split read path, and
the Zarr v2 integration."""

import struct

import numpy as np
import pytest

from data_pipelines_spark.sources.blosc import (
    blosc_compress,
    blosc_decompress,
    lz4_compress_block,
    lz4_decompress_block,
)


def test_lz4_pinned_wire_vectors():
    # token 0x44: 4 literals 'abcd', match len 8 at offset 4
    # (overlapping copy — the mechanism RLE rides on)
    assert lz4_decompress_block(b"\x44abcd\x04\x00", 12) == b"abcdabcdabcd"
    # literal-length extension: 15 -> +0 byte; 270 -> +255 +0
    assert lz4_decompress_block(b"\xf0\x00" + b"x" * 15, 15) == b"x" * 15
    assert (
        lz4_decompress_block(b"\xf0\xff\x00" + b"y" * 270, 270) == b"y" * 270
    )
    # match-length extension: token low nibble 15, ext 2 -> mlen 21
    got = lz4_decompress_block(b"\x1fa\x01\x00\x02", 22)
    assert got == b"a" * 22
    # truncation and bad offsets raise
    with pytest.raises((ValueError, IndexError)):
        lz4_decompress_block(b"\x44abcd\x04\x00", 99)
    with pytest.raises(ValueError):
        lz4_decompress_block(b"\x40abcd\x00\x00", 8)  # offset 0


def test_lz4_round_trip_shapes():
    rng = np.random.default_rng(3)
    cases = [
        b"",
        b"a",
        b"abcd" * 1000,                      # pure repetition
        bytes(rng.integers(0, 256, 5000, dtype=np.uint8)),  # incompressible
        (b"the quick brown fox " * 64)[:-3],
        bytes(rng.integers(0, 4, 4096, dtype=np.uint8)),    # low entropy
    ]
    for data in cases:
        comp = lz4_compress_block(data)
        assert lz4_decompress_block(comp, len(data)) == data
    # repetitive data genuinely compresses
    assert len(lz4_compress_block(b"abcd" * 1000)) < 100


def test_blosc_header_pinned():
    frame = blosc_compress(b"abcd" * 100, typesize=4, cname="lz4")
    version, versionlz, flags, typesize = frame[0], frame[1], frame[2], frame[3]
    nbytes, blocksize, cbytes = struct.unpack_from("<III", frame, 4)
    assert (version, typesize) == (2, 4)
    assert flags & 0x1  # shuffle
    assert (flags >> 5) & 0x7 == 1  # cname lz4
    assert nbytes == 400 and cbytes == len(frame)
    assert blosc_decompress(frame) == b"abcd" * 100


def test_blosc_round_trips():
    rng = np.random.default_rng(7)
    arrays = [
        np.arange(1000, dtype="<i4"),
        rng.standard_normal(513).astype("<f8"),
        np.zeros(4096, dtype="<i8"),
        rng.integers(0, 256, 10_001, dtype=np.uint8),
    ]
    for a in arrays:
        data = a.tobytes()
        for cname in ("lz4", "zlib"):
            for shuffle in (True, False):
                frame = blosc_compress(
                    data, typesize=a.dtype.itemsize,
                    cname=cname, shuffle=shuffle,
                )
                assert blosc_decompress(frame) == data, (cname, shuffle)
    # multi-block path (blocksize smaller than payload)
    data = np.arange(10_000, dtype="<i4").tobytes()
    frame = blosc_compress(data, typesize=4, blocksize=4096)
    assert blosc_decompress(frame) == data


def test_blosc_typesize_split_layout_decodes():
    """c-blosc 1.x splits shuffled blocks into typesize LZ4 streams;
    build that layout by hand and check the reader detects it."""
    from data_pipelines_spark.sources.blosc import _shuffle_bytes

    a = np.arange(256, dtype="<i4")
    data = a.tobytes()
    shuffled = _shuffle_bytes(data, 4)
    neblock = len(shuffled)
    split = neblock // 4
    regions = b""
    for s in range(4):
        part = shuffled[s * split : (s + 1) * split]
        comp = lz4_compress_block(part)
        if len(comp) >= len(part):
            comp = part
        regions += struct.pack("<i", len(comp)) + comp
    header = bytes([1, 1, (1 << 5) | 0x1, 4])
    frame = (
        header
        + struct.pack("<III", len(data), len(data), 16 + 4 + len(regions))
        + struct.pack("<i", 20)
        + regions
    )
    assert blosc_decompress(frame) == data


def test_blosc_memcpy_and_gates():
    # memcpy frame: flags bit 2, payload is the original bytes
    data = b"hello world " * 3
    frame = bytes([1, 1, 0x2, 1]) + struct.pack(
        "<III", len(data), len(data), 16 + len(data)
    ) + data
    assert blosc_decompress(frame) == data
    # blosclz stays an honest gate; both-shuffle-flags frames are invalid
    with pytest.raises(NotImplementedError, match="cname"):
        blosc_compress(b"x", cname="blosclz")
    both = bytes([1, 1, 0x5, 1]) + struct.pack("<III", 4, 4, 16 + 4) + b"xxxx"
    with pytest.raises(ValueError, match="both shuffle"):
        blosc_decompress(both)


def test_bitshuffle_pinned_wire_vectors():
    """Hand-evaluated against the bitshuffle scalar kernel
    (TRANS_BIT_8X8 on a little-endian load + ``out[k]=x; x>>=8``):
    LSB-first on both axes — the bit-0 plane comes FIRST, and element
    j maps to bit j of its plane byte. Only the largest multiple-of-8
    element count shuffles; trailing bytes copy verbatim (c-blosc's
    wrapper behavior)."""
    from data_pipelines_spark.sources.blosc import (
        _bit_unshuffle_bytes,
        _bitshuffle_bytes,
    )

    # typesize=1: eight 0x01 bytes (bit 0 set) -> plane 0 full, rest 0
    assert _bitshuffle_bytes(b"\x01" * 8, 1) == b"\xff" + b"\x00" * 7
    # element j -> bit j of the plane byte (kernel single-element test:
    # only element 3 set -> plane-0 byte 0x08)
    assert _bitshuffle_bytes(
        b"\x00\x00\x00\x01\x00\x00\x00\x00", 1
    ) == b"\x08" + b"\x00" * 7
    # typesize=2: eight <u2 values of 1 (bytes 01 00) -> 16 planes,
    # byte-major then bit: plane (byte0, bit0) FIRST is full
    assert (
        _bitshuffle_bytes(b"\x01\x00" * 8, 2)
        == b"\xff" + b"\x00" * 15
    )
    # 16 elements, typesize=1: each bit plane is nelem/8 = 2 contiguous
    # bytes (plane-contiguous layout, not per-8-element interleave)
    data16 = b"\x01" * 16
    assert _bitshuffle_bytes(data16, 1) == b"\xff\xff" + b"\x00" * 14
    # trailing non-multiple-of-8 elements are copied verbatim
    data = b"\x01" * 8 + b"\xab\xcd\xef\x99"
    got = _bitshuffle_bytes(data, 1)
    assert got[8:] == b"\xab\xcd\xef\x99"
    assert _bit_unshuffle_bytes(got, 1) == data
    # fewer than 8 elements: identity
    assert _bitshuffle_bytes(b"\x12\x34", 1) == b"\x12\x34"


def test_bitshuffle_matches_scalar_kernel():
    """Differential against an INDEPENDENT scalar implementation of the
    bitshuffle kernel, transcribed from its public definition: per
    8-byte group, the Hacker's-Delight TRANS_BIT_8X8 mask transform on
    a little-endian load, emitted low-byte-first (bshuf_trans_bit_byte),
    composed with the byte-plane transpose (bshuf_trans_byte_elem) and
    the (bit-row, byte) regrouping (bshuf_trans_bitrow_eight) so each
    bit plane is contiguous, byte-major. Pins the wire convention
    mechanically — a same-way inversion in both numpy directions would
    round-trip but fail here."""
    from data_pipelines_spark.sources.blosc import _bitshuffle_bytes

    def trans_bit_8x8(x):
        t = (x ^ (x >> 7)) & 0x00AA00AA00AA00AA
        x = x ^ t ^ ((t << 7) & 0xFFFFFFFFFFFFFFFF)
        t = (x ^ (x >> 14)) & 0x0000CCCC0000CCCC
        x = x ^ t ^ ((t << 14) & 0xFFFFFFFFFFFFFFFF)
        t = (x ^ (x >> 28)) & 0x00000000F0F0F0F0
        x = x ^ t ^ ((t << 28) & 0xFFFFFFFFFFFFFFFF)
        return x & 0xFFFFFFFFFFFFFFFF

    def scalar_bitshuffle(data: bytes, typesize: int) -> bytes:
        nelem = (len(data) // typesize) & ~7
        cut = nelem * typesize
        if cut == 0:
            return data
        # trans_byte_elem: byte-plane transpose
        planes = bytearray(cut)
        for e in range(nelem):
            for b in range(typesize):
                planes[b * nelem + e] = data[e * typesize + b]
        # trans_bit_byte: per 8-byte group, bit transpose, low byte out
        # first (group g, bit k) -> index k*ngroups + g
        ngroups = cut // 8
        bitbytes = bytearray(cut)
        for g in range(ngroups):
            x = int.from_bytes(planes[g * 8 : g * 8 + 8], "little")
            x = trans_bit_8x8(x)
            for k in range(8):
                bitbytes[k * ngroups + g] = (x >> (8 * k)) & 0xFF
        # trans_bitrow_eight: regroup (k, b, m) -> (b, k, m) with
        # m-runs of nelem//8 bytes, so planes are contiguous byte-major
        run = nelem // 8
        out = bytearray(cut)
        for k in range(8):
            for b in range(typesize):
                src = (k * typesize + b) * run
                dst = (b * 8 + k) * run
                out[dst : dst + run] = bitbytes[src : src + run]
        return bytes(out) + data[cut:]

    rng = np.random.default_rng(41)
    for typesize in (1, 2, 4, 8):
        for nbytes in (typesize * 8, typesize * 16, 256, 1027):
            data = bytes(rng.integers(0, 256, nbytes, dtype=np.uint8))
            assert _bitshuffle_bytes(data, typesize) == scalar_bitshuffle(
                data, typesize
            ), (typesize, nbytes)


def test_bitshuffle_round_trips():
    from data_pipelines_spark.sources.blosc import (
        _bit_unshuffle_bytes,
        _bitshuffle_bytes,
    )

    rng = np.random.default_rng(11)
    for typesize in (1, 2, 4, 8):
        for nbytes in (0, 3, typesize * 8, typesize * 8 + 5, 4096, 5001):
            data = bytes(rng.integers(0, 256, nbytes, dtype=np.uint8))
            assert (
                _bit_unshuffle_bytes(_bitshuffle_bytes(data, typesize), typesize)
                == data
            )
    # container-level: shuffle=2 flag round-trips, incl. multi-block
    a = (np.arange(10_000, dtype="<f4") / 3.0).tobytes()
    for blocksize in (4096, 1 << 20):
        frame = blosc_compress(a, typesize=4, shuffle=2, blocksize=blocksize)
        assert frame[2] & 0x4  # BITSHUFFLE flag
        assert blosc_decompress(frame) == a
    # bit-shuffle is meaningful (and supported) at typesize=1
    data = bytes(rng.integers(0, 2, 4096, dtype=np.uint8))
    frame = blosc_compress(data, typesize=1, shuffle=2)
    assert blosc_decompress(frame) == data
    # low-entropy LSB-heavy data genuinely compresses better bit-shuffled
    assert len(frame) < len(blosc_compress(data, typesize=1, shuffle=False))


def test_lz4_differential_vs_liblz4():
    """External-reference check: pyarrow's ``lz4_raw`` codec is the
    real libLZ4 block codec — it must decode our blocks and our decoder
    must decode its output, over a spread of data shapes."""
    import pyarrow as pa

    if not pa.Codec.is_available("lz4_raw"):
        pytest.skip("pyarrow build without lz4_raw")
    ref = pa.Codec("lz4_raw")
    rng = np.random.default_rng(23)
    cases = [
        b"",
        b"x",
        b"abcd" * 1000,
        bytes(rng.integers(0, 256, 7001, dtype=np.uint8)),
        bytes(rng.integers(0, 4, 4096, dtype=np.uint8)),
        (b"the quick brown fox " * 64)[:-3],
        np.arange(3000, dtype="<i4").tobytes(),
    ]
    for data in cases:
        theirs = bytes(ref.compress(data))
        assert lz4_decompress_block(theirs, len(data)) == data
        ours = lz4_compress_block(data)
        assert bytes(ref.decompress(ours, len(data))) == data


def test_blosc_zstd_snappy_cnames():
    """zstd/snappy cnames ride pyarrow's bundled C codecs; frames
    round-trip through the blosc container with every shuffle mode."""
    import pyarrow as pa

    if not pa.Codec.is_available("zstd"):
        pytest.skip("pyarrow build without zstd")
    rng = np.random.default_rng(31)
    payloads = [
        np.arange(5000, dtype="<i4").tobytes(),
        bytes(rng.integers(0, 256, 4001, dtype=np.uint8)),
        b"",
    ]
    for cname in ("zstd", "snappy"):
        if not pa.Codec.is_available(cname):
            continue
        for data in payloads:
            for shuffle in (False, True, 2):
                frame = blosc_compress(
                    data, typesize=4, cname=cname, shuffle=shuffle,
                    blocksize=4096,
                )
                assert (frame[2] >> 5) & 0x7 == (5 if cname == "zstd" else 2)
                assert blosc_decompress(frame) == data, (cname, shuffle)
    # blosclz stays the honest gate
    with pytest.raises(NotImplementedError, match="blosclz"):
        blosc_compress(b"x", cname="blosclz")


def test_blosc_typesize_over_255_disables_shuffle():
    """ADVICE r9: typesize > 255 cannot be recorded in the 1-byte header
    field; shuffling at the full typesize would be silently undecodable.
    Match c-blosc: drop to typesize=1, no shuffle."""
    data = bytes(range(256)) * 4  # 1024 bytes, "typesize" 512
    frame = blosc_compress(data, typesize=512, shuffle=True)
    assert frame[3] == 1 and not (frame[2] & 0x5)
    assert blosc_decompress(frame) == data


def test_zarr_blosc_bitshuffle_store_reads(tmp_path):
    """A v2 store whose chunks a c-blosc writer bit-shuffled (numcodecs
    Blosc(shuffle=2)) decodes natively — the frame header carries the
    shuffle mode, so the reader needs no .zarray hint."""
    import json
    import os

    from data_pipelines_spark.sources.raster import read_zarr_minimal

    a = (np.arange(96, dtype="<u2") % 7).reshape(8, 12)
    d = str(tmp_path / "z" / "v")
    os.makedirs(d)
    meta = {
        "zarr_format": 2,
        "shape": [8, 12],
        "chunks": [4, 12],
        "dtype": "<u2",
        "order": "C",
        "fill_value": 0,
        "filters": None,
        "compressor": {
            "id": "blosc", "cname": "lz4", "clevel": 5,
            "shuffle": 2, "blocksize": 0,
        },
    }
    with open(os.path.join(d, ".zarray"), "w") as f:
        json.dump(meta, f)
    with open(os.path.join(d, ".zattrs"), "w") as f:
        json.dump({"_ARRAY_DIMENSIONS": ["y", "x"]}, f)
    for ci in range(2):
        chunk = a[ci * 4 : (ci + 1) * 4, :].tobytes()
        with open(os.path.join(d, f"{ci}.0"), "wb") as f:
            f.write(blosc_compress(chunk, typesize=2, shuffle=2))
    back, attrs = read_zarr_minimal(d)
    np.testing.assert_array_equal(back, a)


def test_zarr_zstd_round_trips(tmp_path):
    """numcodecs-Zstd v2 stores and v3 zstd codec chains read/write via
    pyarrow's bundled libzstd."""
    import pyarrow as pa

    if not pa.Codec.is_available("zstd"):
        pytest.skip("pyarrow build without zstd")
    from data_pipelines_spark.sources.raster import read_zarr_minimal
    from data_pipelines_spark.sources.raster_encode import write_zarr_store

    a = (np.arange(600, dtype="<f4") / 7.0).reshape(20, 30)
    coords = {
        "y": np.arange(20, dtype="<i4"), "x": np.arange(30, dtype="<i4"),
    }
    for fmt in (2, 3):
        store = str(tmp_path / f"z{fmt}")
        write_zarr_store(
            store, "v", a, coords,
            chunks=(8, 16), compressor="zstd", zarr_format=fmt,
        )
        back, _ = read_zarr_minimal(f"{store}/v")
        np.testing.assert_array_equal(back, a)
    # a chunk file is genuinely zstd (magic 28 B5 2F FD), not stored raw
    import os

    chunk = next(
        p for p in os.listdir(str(tmp_path / "z2" / "v"))
        if not p.startswith(".")
    )
    with open(str(tmp_path / "z2" / "v" / chunk), "rb") as f:
        assert f.read(4) == b"\x28\xb5\x2f\xfd"


def test_zarr_blosc_round_trip(tmp_path):
    from data_pipelines_spark.sources.raster import read_zarr_minimal
    from data_pipelines_spark.sources.raster_encode import write_zarr_store

    a = (np.arange(600, dtype="<f4") / 7.0).reshape(20, 30)
    store = str(tmp_path / "z")
    write_zarr_store(
        store, "v", a,
        {"y": np.arange(20, dtype="<i4"), "x": np.arange(30, dtype="<i4")},
        chunks=(8, 16), compressor="blosc",
    )
    back, attrs = read_zarr_minimal(f"{store}/v")
    np.testing.assert_array_equal(back, a)
    assert attrs.get("_ARRAY_DIMENSIONS") == ["y", "x"]


from hypothesis import example, given, settings, strategies as st  # noqa: E402


@settings(max_examples=150, deadline=None)
@given(st.binary(max_size=5000))
def test_lz4_round_trip_property(data):
    assert lz4_decompress_block(lz4_compress_block(data), len(data)) == data


@settings(max_examples=90, deadline=None)
@given(
    st.binary(max_size=4000),
    st.sampled_from([1, 2, 4, 8]),
    st.sampled_from([False, True, 2]),
    st.sampled_from(["lz4", "zlib"]),
    st.sampled_from([256, 1024, 1 << 20]),
)
@example(
    # r9 falsifying example: a 4-byte shuffled frame whose stored 1-split
    # region spuriously "decoded" under the typesize-split probe because
    # the LZ4 decoder sliced a truncated literal run leniently, then the
    # second split's csize unpack escaped as struct.error.
    data=b"\xf0\x00\x00\x00",
    typesize=2,
    shuffle=True,
    cname="lz4",
    blocksize=256,
)
@example(  # tiny shuffled block, zlib side of the same probe path
    data=b"\xf0\x00\x00\x00",
    typesize=2,
    shuffle=True,
    cname="zlib",
    blocksize=256,
)
@example(  # bit-shuffle with a trailing partial element
    data=b"\x01" * 37,
    typesize=4,
    shuffle=2,
    cname="lz4",
    blocksize=256,
)
def test_blosc_round_trip_property(data, typesize, shuffle, cname, blocksize):
    frame = blosc_compress(
        data, typesize=typesize, cname=cname,
        shuffle=shuffle, blocksize=blocksize,
    )
    assert blosc_decompress(frame) == data
