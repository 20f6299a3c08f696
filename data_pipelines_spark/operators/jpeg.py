"""Dependency-free baseline JPEG codec (numpy + stdlib only).

Graduates the last codec-gated format in the multimodal tier
(`operators/multimodal.py:decode_image`) the same way the TIFF / PNG /
NetCDF / GRIB2 readers did: a real, tested implementation of the
common profile, with the exotic profiles still raising an honest
`NotImplementedError`.

Decoder (:func:`decode_jpeg`) covers the baseline sequential DCT
profile (ITU T.81): SOF0 frames, 8-bit samples, interleaved scans,
arbitrary Huffman tables read from the stream's DHT segments
(canonical reconstruction), DQT dequantization, restart intervals,
1- or 3-component images with sampling factors up to 2 (4:4:4, 4:2:2,
4:2:0), JFIF YCbCr→RGB conversion. Progressive (SOF2), arithmetic
coding, 12-bit and hierarchical profiles raise with a pointer to PIL.

Encoder (:func:`encode_jpeg_baseline`) writes valid baseline files —
used by the round-trip tests and as a real write path. It builds
per-image canonical Huffman tables over the symbols actually emitted
(single code length; simpler than the Annex K defaults and legal per
the spec since the tables ride in the file's own DHT), supports
grayscale and RGB at 4:4:4 or 4:2:0, and flat or custom quantization
tables.

Everything here is per-payload compute inside Arrow-batched
`mapInPandas` stages — no Spark shuffle implications; at 100 TB the
parallelism axis is payload count, same as the other decoders.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------- shared

_ZIGZAG: list[tuple[int, int]] = []
for _s in range(15):
    _rng = range(_s, -1, -1) if _s % 2 == 0 else range(_s + 1)
    for _i in _rng:
        _j = _s - _i
        if _i < 8 and _j < 8:
            _ZIGZAG.append((_i, _j))

# Orthonormal 8x8 DCT-II basis: forward F = A @ f @ A.T, inverse f = A.T @ F @ A
_A = np.zeros((8, 8))
for _k in range(8):
    for _n in range(8):
        c = (1 / np.sqrt(2)) if _k == 0 else 1.0
        _A[_k, _n] = 0.5 * c * np.cos((2 * _n + 1) * _k * np.pi / 16)


def _extend(value: int, size: int) -> int:
    """T.81 F.2.2.1 EXTEND: map the raw `size`-bit magnitude to its
    signed value."""
    if size == 0:
        return 0
    if value < (1 << (size - 1)):
        return value - (1 << size) + 1
    return value


# ---------------------------------------------------------------- decoder


class _BitReader:
    """MSB-first bit reader over entropy-coded data with 0xFF00 byte
    unstuffing; stops at any other marker."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.bit = 0

    def read_bit(self) -> int:
        d = self.data
        if self.bit == 0:
            b = d[self.pos]
            if b == 0xFF:
                nxt = d[self.pos + 1]
                if nxt != 0x00:
                    raise EOFError("marker inside entropy data")
        b = d[self.pos]
        out = (b >> (7 - self.bit)) & 1
        self.bit += 1
        if self.bit == 8:
            self.bit = 0
            self.pos += 1 + (1 if b == 0xFF else 0)  # skip stuffed 0x00
        return out

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def align(self) -> None:
        if self.bit:
            self.bit = 0
            self.pos += 1 + (1 if self.data[self.pos] == 0xFF else 0)


def _build_huffman(bits: list[int], values: bytes) -> dict[tuple[int, int], int]:
    """Canonical Huffman reconstruction (T.81 C.2): {(length, code) ->
    symbol}."""
    table: dict[tuple[int, int], int] = {}
    code = 0
    vi = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = values[vi]
            vi += 1
            code += 1
        code <<= 1
    return table


def _decode_symbol(br: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | br.read_bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code in JPEG stream")


def decode_jpeg(content: bytes) -> np.ndarray:
    """Decode a baseline JPEG payload to uint8 (H, W) grayscale or
    (H, W, 3) RGB. See module docstring for the supported profile."""
    if content[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (missing SOI)")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}  # (class, id) -> table
    frame = None  # (height, width, [(cid, h, v, tq), ...])
    restart_interval = 0
    n = len(content)

    while pos < n:
        if content[pos] != 0xFF:
            raise ValueError(f"expected marker at byte {pos}")
        marker = content[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:  # standalone
            continue
        (seglen,) = struct.unpack(">H", content[pos : pos + 2])
        body = content[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT
            bp = 0
            while bp < len(body):
                pq, tq = body[bp] >> 4, body[bp] & 0x0F
                bp += 1
                if pq == 0:
                    tbl = np.frombuffer(body, np.uint8, 64, bp).astype(np.int32)
                    bp += 64
                else:
                    tbl = np.frombuffer(body, ">u2", 64, bp).astype(np.int32)
                    bp += 128
                q = np.zeros((8, 8), np.int32)
                for k, (i, j) in enumerate(_ZIGZAG):
                    q[i, j] = tbl[k]
                qt[tq] = q
        elif marker == 0xC4:  # DHT
            bp = 0
            while bp < len(body):
                tc, th = body[bp] >> 4, body[bp] & 0x0F
                bits = list(body[bp + 1 : bp + 17])
                nv = sum(bits)
                values = body[bp + 17 : bp + 17 + nv]
                huff[(tc, th)] = _build_huffman(bits, values)
                bp += 17 + nv
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 (baseline/ext seq)
            prec, h, w, nc = struct.unpack(">BHHB", body[:6])
            if prec != 8:
                raise NotImplementedError("only 8-bit JPEG decodes natively")
            comps = []
            for i in range(nc):
                cid, hv, tq = body[6 + 3 * i : 9 + 3 * i]
                comps.append((cid, hv >> 4, hv & 0x0F, tq))
            frame = (h, w, comps)
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                "only baseline sequential JPEG (SOF0/SOF1) decodes natively; "
                "use PIL for progressive/arithmetic/hierarchical payloads"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", body[:2])
        elif marker == 0xDA:  # SOS — entropy data follows
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = body[0]
            scan = []  # (comp_idx, dc_table_id, ac_table_id)
            height, width, comps = frame
            for i in range(ns):
                cs, tda = body[1 + 2 * i : 3 + 2 * i]
                ci = next(k for k, c in enumerate(comps) if c[0] == cs)
                scan.append((ci, tda >> 4, tda & 0x0F))
            data_start = pos + seglen
            return _decode_scan(
                content, data_start, frame, scan, qt, huff, restart_interval
            )
        pos += seglen
    raise ValueError("JPEG stream ended without a scan")


def _decode_scan(data, pos, frame, scan, qt, huff, restart_interval):
    height, width, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcus_x = -(-width // (8 * hmax))
    mcus_y = -(-height // (8 * vmax))
    planes = [
        np.zeros((mcus_y * c[2] * 8, mcus_x * c[1] * 8), np.float64)
        for c in comps
    ]
    br = _BitReader(data, pos)
    pred = [0] * len(comps)
    mcu_count = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                br.align()
                if data[br.pos] == 0xFF and 0xD0 <= data[br.pos + 1] <= 0xD7:
                    br.pos += 2
                pred = [0] * len(comps)
            for ci, dc_id, ac_id in scan:
                _, ch, cv, tq = comps[ci]
                q = qt[tq]
                dct = huff[(0, dc_id)]
                act = huff[(1, ac_id)]
                for by in range(cv):
                    for bx in range(ch):
                        blk = _decode_block(br, dct, act, q, pred, ci)
                        y0 = (my * cv + by) * 8
                        x0 = (mx * ch + bx) * 8
                        planes[ci][y0 : y0 + 8, x0 : x0 + 8] = blk
            mcu_count += 1

    out = []
    for p, (_, ch, cv, _) in zip(planes, comps):
        up = np.repeat(np.repeat(p, vmax // cv, axis=0), hmax // ch, axis=1)
        out.append(up[:height, :width])
    if len(out) == 1:
        return np.clip(np.round(out[0] + 128), 0, 255).astype(np.uint8)
    y, cb, cr = (o + 128 for o in out[:3])
    r = y + 1.402 * (cr - 128)
    g = y - 0.344136 * (cb - 128) - 0.714136 * (cr - 128)
    b = y + 1.772 * (cb - 128)
    return np.clip(np.round(np.stack([r, g, b], axis=-1)), 0, 255).astype(
        np.uint8
    )


def _decode_block(br, dc_table, ac_table, q, pred, ci):
    coeffs = np.zeros((8, 8), np.float64)
    s = _decode_symbol(br, dc_table)
    diff = _extend(br.read_bits(s), s)
    pred[ci] += diff
    coeffs[0, 0] = pred[ci] * q[0, 0]
    k = 1
    while k < 64:
        rs = _decode_symbol(br, ac_table)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r == 15:  # ZRL: 16 zeros
                k += 16
                continue
            break  # EOB
        k += r
        if k > 63:
            raise ValueError("AC run past end of block")
        i, j = _ZIGZAG[k]
        coeffs[i, j] = _extend(br.read_bits(s), s) * q[i, j]
        k += 1
    return _A.T @ coeffs @ _A  # IDCT (level-shifted domain)


# ---------------------------------------------------------------- encoder


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, size: int) -> None:
        for i in range(size - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.nbits += 1
            if self.nbits == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)
                self.acc = 0
                self.nbits = 0

    def flush(self) -> None:
        while self.nbits:
            self.write(1, 1)  # pad with 1s per T.81


def _magnitude(v: int) -> tuple[int, int]:
    """(size, raw bits) for a signed coefficient value."""
    s = int(abs(v)).bit_length()
    return (s, v if v >= 0 else v + (1 << s) - 1)


def _flat_canonical_table(symbols: set[int]) -> tuple[list[int], list[int], dict]:
    """Single-length canonical Huffman table over the symbols actually
    used: legal (the all-ones code stays unassigned because we bump the
    length when the symbol count fills the code space), simple, and
    exercises the decoder's canonical DHT reconstruction."""
    syms = sorted(symbols) or [0]
    length = max((len(syms) + 1 - 1).bit_length(), 1)
    while (1 << length) <= len(syms):
        length += 1
    bits = [0] * 16
    bits[length - 1] = len(syms)
    codes = {s: (length, i) for i, s in enumerate(syms)}
    return bits, syms, codes


def _quant_tables(quality_divisor: int) -> tuple[np.ndarray, np.ndarray]:
    q = np.full((8, 8), quality_divisor, np.int32)
    return q, q


def encode_jpeg_baseline(
    arr: np.ndarray,
    quality_divisor: int = 8,
    subsample: bool = False,
    restart_interval: int = 0,
) -> bytes:
    """Encode a uint8 (H, W) grayscale or (H, W, 3) RGB array as a
    baseline JPEG. ``quality_divisor`` is the (flat) quantization step:
    1 ≈ near-lossless DCT round-trip, 8 ≈ visually fine, 32 ≈ chunky.
    ``subsample=True`` writes 4:2:0 chroma (2x2-averaged), exercising
    the decoder's upsampling path. ``restart_interval`` > 0 writes a
    DRI segment and RSTn markers every N MCUs (with DC-predictor
    resets), exercising the decoder's restart path."""
    a = np.asarray(arr)
    if a.dtype != np.uint8:
        raise ValueError("encode_jpeg_baseline expects uint8")
    gray = a.ndim == 2
    h, w = a.shape[:2]
    qy, qc = _quant_tables(quality_divisor)

    if gray:
        planes = [a.astype(np.float64) - 128.0]
        samp = [(1, 1)]
        quants = [qy]
    else:
        rgb = a.astype(np.float64)
        r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b - 128.0
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b
        if subsample:
            planes = [y, _downsample2(cb), _downsample2(cr)]
            samp = [(2, 2), (1, 1), (1, 1)]
        else:
            planes = [y, cb, cr]
            samp = [(1, 1), (1, 1), (1, 1)]
        quants = [qy, qc, qc]

    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    padded = []
    for p, (sh, sv) in zip(planes, samp):
        ph, pw = mcus_y * sv * 8, mcus_x * sh * 8
        pp = np.zeros((ph, pw))
        pp[: p.shape[0], : p.shape[1]] = p
        # edge-extend so padding doesn't ring
        if p.shape[0] < ph:
            pp[p.shape[0] :, : p.shape[1]] = p[-1:, :]
        if p.shape[1] < pw:
            pp[:, p.shape[1] :] = pp[:, p.shape[1] - 1 : p.shape[1]]
        padded.append(pp)

    # pass 1: quantize blocks in MCU order, collect symbols
    blocks: list[list[tuple]] = [[] for _ in planes]  # per comp: (dcsym, acsyms)
    pred = [0] * len(planes)
    sym_dc = [set() for _ in planes]
    sym_ac = [set() for _ in planes]
    mcu_no = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_no and mcu_no % restart_interval == 0:
                pred = [0] * len(planes)
            mcu_no += 1
            for ci, (p, (sh, sv), q) in enumerate(zip(padded, samp, quants)):
                for by in range(sv):
                    for bx in range(sh):
                        y0, x0 = (my * sv + by) * 8, (mx * sh + bx) * 8
                        blk = p[y0 : y0 + 8, x0 : x0 + 8]
                        coeff = np.round((_A @ blk @ _A.T) / q).astype(int)
                        zz = [coeff[i, j] for i, j in _ZIGZAG]
                        diff = zz[0] - pred[ci]
                        pred[ci] = zz[0]
                        ds, dbits = _magnitude(diff)
                        sym_dc[ci].add(ds)
                        acs = []
                        run = 0
                        last_nz = max(
                            (k for k in range(1, 64) if zz[k]), default=0
                        )
                        for k in range(1, last_nz + 1):
                            if zz[k] == 0:
                                run += 1
                                continue
                            while run > 15:
                                acs.append((0xF0, 0, 0))
                                sym_ac[ci].add(0xF0)
                                run -= 16
                            s, bits_v = _magnitude(zz[k])
                            acs.append(((run << 4) | s, s, bits_v))
                            sym_ac[ci].add((run << 4) | s)
                            run = 0
                        if last_nz < 63:
                            acs.append((0x00, 0, 0))
                            sym_ac[ci].add(0x00)
                        blocks[ci].append(((ds, dbits), acs))

    # luma uses table id 0; all chroma share id 1
    groups = [0] + [1] * (len(planes) - 1)
    dc_tables = {}
    ac_tables = {}
    for tid in set(groups):
        members = [i for i, g in enumerate(groups) if g == tid]
        dc_tables[tid] = _flat_canonical_table(
            set().union(*(sym_dc[i] for i in members))
        )
        ac_tables[tid] = _flat_canonical_table(
            set().union(*(sym_ac[i] for i in members))
        )

    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    for tq, q in enumerate([qy] if gray else [qy, qc]):
        zz = bytes(int(q[i, j]) for i, j in _ZIGZAG)
        out += b"\xff\xdb" + struct.pack(">HB", 67, tq) + zz
    nc = 1 if gray else 3
    out += b"\xff\xc0" + struct.pack(">HBHHB", 8 + 3 * nc, 8, h, w, nc)
    for ci in range(nc):
        sh, sv = samp[ci]
        out += bytes([ci + 1, (sh << 4) | sv, min(groups[ci], 1 if gray else 1)])
    for tc, tables in ((0, dc_tables), (1, ac_tables)):
        for tid, (bits, syms, _) in sorted(tables.items()):
            out += b"\xff\xc4" + struct.pack(">HB", 19 + len(syms), (tc << 4) | tid)
            out += bytes(bits) + bytes(syms)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * nc, nc)
    for ci in range(nc):
        out += bytes([ci + 1, (groups[ci] << 4) | groups[ci]])
    out += b"\x00\x3f\x00"  # Ss=0, Se=63, Ah/Al=0

    bw = _BitWriter()
    # interleave in the same MCU order as pass 1
    idx = [0] * len(planes)
    mcu_no = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_no and mcu_no % restart_interval == 0:
                bw.flush()
                bw.out += bytes(
                    [0xFF, 0xD0 + (mcu_no // restart_interval - 1) % 8]
                )
            mcu_no += 1
            for ci, (sh, sv) in enumerate(samp):
                for _ in range(sh * sv):
                    (ds, dbits), acs = blocks[ci][idx[ci]]
                    idx[ci] += 1
                    dlen, dcode = dc_tables[groups[ci]][2][ds]
                    bw.write(dcode, dlen)
                    if ds:
                        bw.write(dbits, ds)
                    for sym, s, bits_v in acs:
                        alen, acode = ac_tables[groups[ci]][2][sym]
                        bw.write(acode, alen)
                        if s:
                            bw.write(bits_v, s)
    bw.flush()
    out += bw.out
    out += b"\xff\xd9"
    return bytes(out)


def _downsample2(p: np.ndarray) -> np.ndarray:
    h, w = p.shape
    ph, pw = h + (h % 2), w + (w % 2)
    pp = np.zeros((ph, pw))
    pp[:h, :w] = p
    if h % 2:
        pp[h, :w] = p[h - 1]
    if w % 2:
        pp[:, w] = pp[:, w - 1]
    return (pp[0::2, 0::2] + pp[1::2, 0::2] + pp[0::2, 1::2] + pp[1::2, 1::2]) / 4.0
