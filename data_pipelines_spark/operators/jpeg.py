"""Dependency-free baseline JPEG codec (numpy + stdlib only).

Graduates the last codec-gated format in the multimodal tier
(`operators/multimodal.py:decode_image`) the same way the TIFF / PNG /
NetCDF / GRIB2 readers did: a real, tested implementation of the
common profile, with the exotic profiles still raising an honest
`NotImplementedError`.

Decoder (:func:`decode_jpeg`) covers the baseline sequential DCT
profile (ITU T.81) AND the progressive DCT profile: SOF0/1 frames
(8- or 12-bit samples — 12-bit returns uint16 with the 2048 level
shift, the extended-sequential depth medical/satellite products use;
interleaved scans, restart intervals) and SOF2 frames
(spectral selection, successive approximation, DC/AC first and
refinement scans, EOB runs, interleaved DC + single-component AC scan
geometry), arbitrary Huffman tables read from the stream's DHT
segments (canonical reconstruction), DQT dequantization, 1- or
3-component images with sampling factors up to 2 (4:4:4, 4:2:2,
4:2:0), JFIF YCbCr→RGB conversion. Arithmetic coding and
hierarchical profiles raise with a pointer to PIL.

Encoders (:func:`encode_jpeg_baseline`, :func:`encode_jpeg_progressive`)
write valid baseline and progressive files — used by the round-trip
tests and as real write paths; both produce the SAME quantized
coefficients, so a progressive encode decodes to pixels bit-identical
to the baseline encode (asserted in tests). It builds
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
    """Decode a baseline (SOF0/1) or progressive (SOF2) JPEG payload
    to (H, W) grayscale or (H, W, 3) RGB — uint8 at 8-bit precision,
    uint16 at 12-bit. See module docstring for the supported
    profile."""
    if content[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (missing SOI)")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}  # (class, id) -> table
    frame = None  # (height, width, [(cid, h, v, tq), ...])
    restart_interval = 0
    progressive = False
    coeff: list[np.ndarray] | None = None  # per comp: (bh, bw, 64) zigzag
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
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 baseline, SOF2 prog
            prec, h, w, nc = struct.unpack(">BHHB", body[:6])
            if prec not in (8, 12):
                raise NotImplementedError(
                    f"{prec}-bit JPEG: only 8- and 12-bit sample "
                    "precision decodes natively"
                )
            comps = []
            for i in range(nc):
                cid, hv, tq = body[6 + 3 * i : 9 + 3 * i]
                comps.append((cid, hv >> 4, hv & 0x0F, tq))
            frame = (h, w, comps, prec)
            if marker == 0xC2:
                progressive = True
                hmax = max(c[1] for c in comps)
                vmax = max(c[2] for c in comps)
                mcx = -(-w // (8 * hmax))
                mcy = -(-h // (8 * vmax))
                coeff = [
                    np.zeros((mcy * c[2], mcx * c[1], 64), np.int64)
                    for c in comps
                ]
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                "only baseline (SOF0/SOF1) and progressive (SOF2) JPEG "
                "decode natively; use PIL for arithmetic/hierarchical "
                "payloads"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", body[:2])
        elif marker == 0xDA:  # SOS — entropy data follows
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = body[0]
            scan = []  # (comp_idx, dc_table_id, ac_table_id)
            height, width, comps = frame[:3]
            for i in range(ns):
                cs, tda = body[1 + 2 * i : 3 + 2 * i]
                ci = next(k for k, c in enumerate(comps) if c[0] == cs)
                scan.append((ci, tda >> 4, tda & 0x0F))
            data_start = pos + seglen
            if not progressive:
                return _decode_scan(
                    content, data_start, frame, scan, qt, huff,
                    restart_interval,
                )
            ss, se, ahal = body[1 + 2 * ns : 4 + 2 * ns]
            pos = _decode_progressive_scan(
                content, data_start, frame, scan, coeff, huff,
                restart_interval, ss, se, ahal >> 4, ahal & 0x0F,
            )
            continue
        pos += seglen
    if progressive and frame is not None:
        return _finish_progressive(frame, coeff, qt)
    raise ValueError("JPEG stream ended without a scan")


def _decode_scan(data, pos, frame, scan, qt, huff, restart_interval):
    height, width, comps = frame[:3]
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

    return _planes_to_image(
        planes, comps, hmax, vmax, height, width, frame[3]
    )


def _planes_to_image(
    planes, comps, hmax, vmax, height, width, prec=8
) -> np.ndarray:
    """Level-shifted component planes → sample image: upsample to the
    luma grid, crop the MCU padding, YCbCr→RGB for 3 components.
    uint8 at 8-bit precision, uint16 at 12-bit (level shift 2^(P-1),
    clamp to 2^P−1 — T.81 A.3.1)."""
    shift = 1 << (prec - 1)
    maxv = (1 << prec) - 1
    dt = np.uint8 if prec == 8 else np.uint16
    out = []
    for p, (_, ch, cv, _) in zip(planes, comps):
        up = np.repeat(np.repeat(p, vmax // cv, axis=0), hmax // ch, axis=1)
        out.append(up[:height, :width])
    if len(out) == 1:
        return np.clip(np.round(out[0] + shift), 0, maxv).astype(dt)
    y, cb, cr = (o + shift for o in out[:3])
    r = y + 1.402 * (cr - shift)
    g = y - 0.344136 * (cb - shift) - 0.714136 * (cr - shift)
    b = y + 1.772 * (cb - shift)
    return np.clip(np.round(np.stack([r, g, b], axis=-1)), 0, maxv).astype(
        dt
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


def _scan_block_order(frame, scan):
    """Block iteration order for one scan (T.81 A.2): interleaved
    scans walk the MCU grid (all components' sampling blocks per MCU);
    single-component scans walk that component's OWN block raster —
    ceil(component sampled dims / 8), which excludes the interleaved
    grid's padding blocks. Yields (comp_idx, by, bx) plus a flag that
    marks restart-unit boundaries."""
    height, width, comps = frame[:3]
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    if len(scan) > 1:
        mcx = -(-width // (8 * hmax))
        mcy = -(-height // (8 * vmax))
        for my in range(mcy):
            for mx in range(mcx):
                first = True
                for ci, _dc, _ac in scan:
                    _, ch, cv, _tq = comps[ci]
                    for by in range(cv):
                        for bx in range(ch):
                            yield ci, my * cv + by, mx * ch + bx, first
                            first = False
    else:
        ci = scan[0][0]
        _, ch, cv, _tq = comps[ci]
        xi = -(-width * ch // hmax)   # component's sampled width
        yi = -(-height * cv // vmax)
        bw = -(-xi // 8)
        bh = -(-yi // 8)
        for by in range(bh):
            for bx in range(bw):
                yield ci, by, bx, True


def _decode_progressive_scan(
    data, pos, frame, scan, coeff, huff, restart_interval, ss, se, ah, al
):
    """One progressive scan (T.81 G.2) into the per-component zigzag
    coefficient store: DC first/refine (interleaved or single), AC
    first/refine (single component, EOB runs, successive-approximation
    correction bits). Returns the stream position after the entropy
    data."""
    height, width, comps = frame[:3]
    if ss == 0 and se != 0:
        raise ValueError("progressive DC scan must have Se=0")
    if ss > 0 and len(scan) != 1:
        raise ValueError("progressive AC scans are single-component")
    br = _BitReader(data, pos)
    pred = [0] * len(comps)
    eobrun = 0
    unit = 0  # restart counting: MCUs (interleaved) or blocks (single)

    for ci, by, bx, first in _scan_block_order(frame, scan):
        if first:
            if restart_interval and unit and unit % restart_interval == 0:
                br.align()
                if data[br.pos] == 0xFF and 0xD0 <= data[br.pos + 1] <= 0xD7:
                    br.pos += 2
                pred = [0] * len(comps)
                eobrun = 0
            unit += 1
        blk = coeff[ci][by, bx]
        if ss == 0:
            dc_id = next(d for c, d, _a in scan if c == ci)
            if ah == 0:
                s = _decode_symbol(br, huff[(0, dc_id)])
                pred[ci] += _extend(br.read_bits(s), s)
                blk[0] = pred[ci] << al
            elif br.read_bit():
                blk[0] |= 1 << al
            continue

        # AC band
        act = huff[(1, scan[0][2])]
        p1, m1 = 1 << al, -(1 << al)
        if ah == 0:  # first pass over this band
            if eobrun > 0:
                eobrun -= 1
                continue
            k = ss
            while k <= se:
                rs = _decode_symbol(br, act)
                r, s = rs >> 4, rs & 0x0F
                if s == 0:
                    if r == 15:
                        k += 16
                        continue
                    eobrun = (1 << r) - 1
                    if r:
                        eobrun += br.read_bits(r)
                    break
                k += r
                if k > se:
                    raise ValueError("AC run past end of band")
                blk[k] = _extend(br.read_bits(s), s) << al
                k += 1
        else:  # refinement pass (T.81 G.2 / the libjpeg control flow)
            k = ss
            if eobrun == 0:
                while k <= se:
                    rs = _decode_symbol(br, act)
                    r, s = rs >> 4, rs & 0x0F
                    if s == 0:
                        if r != 15:
                            eobrun = 1 << r
                            if r:
                                eobrun += br.read_bits(r)
                            break
                        val = 0
                    else:
                        if s != 1:
                            raise ValueError(
                                "AC refinement symbol with size != 1"
                            )
                        val = p1 if br.read_bit() else m1
                    # advance over r zero-history coefficients,
                    # correcting any nonzero-history ones passed
                    while k <= se:
                        if blk[k] != 0:
                            if br.read_bit() and not (blk[k] & p1):
                                blk[k] += p1 if blk[k] > 0 else m1
                        else:
                            if r == 0:
                                break
                            r -= 1
                        k += 1
                    if val and k <= se:
                        blk[k] = val
                    k += 1
            if eobrun > 0:
                while k <= se:
                    if blk[k] != 0 and br.read_bit() and not (blk[k] & p1):
                        blk[k] += p1 if blk[k] > 0 else m1
                    k += 1
                eobrun -= 1

    # locate the next marker after this scan's entropy data
    br.align()
    p = br.pos
    n = len(data)
    while p < n - 1:
        if (
            data[p] == 0xFF
            and data[p + 1] != 0x00
            and not (0xD0 <= data[p + 1] <= 0xD7)
        ):
            return p
        p += 1
    return n


def _finish_progressive(frame, coeff, qt) -> np.ndarray:
    """Dequantize + de-zigzag + IDCT the accumulated progressive
    coefficients and assemble the image (shared tail with the
    baseline path)."""
    height, width, comps = frame[:3]
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    planes = []
    for (cid, ch, cv, tq), c in zip(comps, coeff):
        q = qt[tq]
        qzz = np.array([q[i, j] for i, j in _ZIGZAG], np.int64)
        deq = c * qzz  # (bh, bw, 64)
        blocks = np.zeros((*c.shape[:2], 8, 8), np.float64)
        for k, (i, j) in enumerate(_ZIGZAG):
            blocks[..., i, j] = deq[..., k]
        # Per-block 2-D matmuls, not one batched einsum/matmul: the
        # batched kernels sum in a different order, which can flip an
        # exact x.5 rounding; this keeps progressive decode
        # BIT-IDENTICAL to the baseline path's `_A.T @ C @ _A` (and
        # costs the same as baseline, which is per-block anyway).
        bh, bw = c.shape[:2]
        spatial = np.empty((bh, bw, 8, 8))
        for by in range(bh):
            for bx in range(bw):
                spatial[by, bx] = _A.T @ blocks[by, bx] @ _A
        planes.append(
            spatial.transpose(0, 2, 1, 3).reshape(bh * 8, bw * 8)
        )
    return _planes_to_image(
        planes, comps, hmax, vmax, height, width, frame[3]
    )


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
    fixed_tables: bool = False,
    precision: int = 8,
) -> bytes:
    """Encode a uint8 (H, W) grayscale or (H, W, 3) RGB array as a
    baseline JPEG. ``quality_divisor`` is the (flat) quantization step:
    1 ≈ near-lossless DCT round-trip, 8 ≈ visually fine, 32 ≈ chunky.
    ``subsample=True`` writes 4:2:0 chroma (2x2-averaged), exercising
    the decoder's upsampling path. ``restart_interval`` > 0 writes a
    DRI segment and RSTn markers every N MCUs (with DC-predictor
    resets), exercising the decoder's restart path. ``fixed_tables``
    builds the Huffman tables over the FULL legal baseline symbol
    universe (DC categories 0-11; AC EOB/ZRL plus every run/size
    pair) instead of the symbols this image emits — slightly longer
    codes, but the DQT/DHT segments become content-independent, which
    is what lets a TIFF JPEGTables tag (347) share one table set
    across every strip/tile. ``precision=12`` writes the extended
    sequential profile (SOF1, uint16 samples < 4096, level shift
    2048) — the depth medical/satellite products use; magnitude
    categories widen per T.81 (DC to 15, AC to 14) and the inverse is
    :func:`decode_jpeg`'s 12-bit path."""
    a = np.asarray(arr)
    if precision == 8:
        if a.dtype != np.uint8:
            raise ValueError("encode_jpeg_baseline expects uint8")
    elif precision == 12:
        if a.dtype != np.uint16:
            raise ValueError("12-bit JPEG takes uint16 samples")
        if int(a.max(initial=0)) >> 12:
            raise ValueError("12-bit JPEG samples must be < 4096")
    else:
        raise ValueError(f"precision must be 8 or 12, got {precision}")
    shift = float(1 << (precision - 1))
    gray = a.ndim == 2
    h, w = a.shape[:2]
    qy, qc = _quant_tables(quality_divisor)

    if gray:
        planes = [a.astype(np.float64) - shift]
        samp = [(1, 1)]
        quants = [qy]
    else:
        rgb = a.astype(np.float64)
        r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b - shift
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
    if fixed_tables:
        # magnitude-category ceilings per T.81 tables F.1/F.2: DC 11,
        # AC 10 at 8-bit; DC 15, AC 14 at 12-bit
        max_dc = 12 if precision == 8 else 16
        max_ac = 10 if precision == 8 else 14
        dc_universe = set(range(max_dc))
        ac_universe = {0x00, 0xF0} | {
            (run << 4) | s for run in range(16) for s in range(1, max_ac + 1)
        }
    for tid in set(groups):
        members = [i for i, g in enumerate(groups) if g == tid]
        dc_tables[tid] = _flat_canonical_table(
            dc_universe
            if fixed_tables
            else set().union(*(sym_dc[i] for i in members))
        )
        ac_tables[tid] = _flat_canonical_table(
            ac_universe
            if fixed_tables
            else set().union(*(sym_ac[i] for i in members))
        )

    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    for tq, q in enumerate([qy] if gray else [qy, qc]):
        zz = bytes(int(q[i, j]) for i, j in _ZIGZAG)
        out += b"\xff\xdb" + struct.pack(">HB", 67, tq) + zz
    nc = 1 if gray else 3
    # 12-bit sample precision is the EXTENDED sequential profile: SOF1
    sof = b"\xff\xc0" if precision == 8 else b"\xff\xc1"
    out += sof + struct.pack(">HBHHB", 8 + 3 * nc, precision, h, w, nc)
    for ci in range(nc):
        sh, sv = samp[ci]
        out += bytes([ci + 1, (sh << 4) | sv, groups[ci]])
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


def _component_zz_blocks(arr, quality_divisor, subsample):
    """Shared front half of both encoders: color convert, pad to the
    interleaved MCU grid, DCT + quantize — per component a (bh, bw, 64)
    int array of zigzag coefficients plus the frame geometry."""
    a = np.asarray(arr)
    if a.dtype != np.uint8:
        raise ValueError("expected uint8")
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
    zz_blocks = []
    for p, (sh, sv), q in zip(planes, samp, quants):
        ph, pw = mcus_y * sv * 8, mcus_x * sh * 8
        pp = np.zeros((ph, pw))
        pp[: p.shape[0], : p.shape[1]] = p
        if p.shape[0] < ph:
            pp[p.shape[0] :, : p.shape[1]] = p[-1:, : p.shape[1]]
        if p.shape[1] < pw:
            pp[:, p.shape[1] :] = pp[:, p.shape[1] - 1 : p.shape[1]]
        bh, bw = ph // 8, pw // 8
        blocks = pp.reshape(bh, 8, bw, 8).transpose(0, 2, 1, 3)
        # Per-block 2-D matmuls, same contraction order as the baseline
        # encoder's `_A @ blk @ _A.T`: a batched einsum sums differently
        # and can flip a coefficient sitting exactly on a rounding
        # boundary — the bit-identity tests between the two encoders
        # would see it.
        quant = np.empty((bh, bw, 8, 8), np.int64)
        for by in range(bh):
            for bx in range(bw):
                quant[by, bx] = np.round(
                    (_A @ blocks[by, bx] @ _A.T) / q
                ).astype(np.int64)
        zz = np.zeros((bh, bw, 64), np.int64)
        for k, (i, j) in enumerate(_ZIGZAG):
            zz[..., k] = quant[..., i, j]
        zz_blocks.append(zz)
    return gray, h, w, samp, quants, zz_blocks, hmax, vmax


def encode_jpeg_progressive(
    arr: np.ndarray,
    quality_divisor: int = 8,
    subsample: bool = False,
) -> bytes:
    """Encode a uint8 (H, W) grayscale or (H, W, 3) RGB array as a
    PROGRESSIVE JPEG (SOF2) with the standard successive-approximation
    scan script: interleaved DC first (Al=1) then DC refine, and per
    component an AC first pass (Ss=1..63, Al=1, real EOB-run
    accumulation) then an AC refinement pass (Ah=1→Al=0, buffered
    correction bits — the T.81 G / libjpeg control flow). Decodes to
    EXACTLY the same pixels as `encode_jpeg_baseline` at the same
    quantization (same coefficients, different scan order), which is
    what the tests assert."""
    gray, h, w, samp, quants, zz_blocks, hmax, vmax = _component_zz_blocks(
        arr, quality_divisor, subsample
    )
    nc = 1 if gray else 3
    comps = [
        (ci + 1, samp[ci][0], samp[ci][1], 0 if ci == 0 else 1)
        for ci in range(nc)
    ]
    frame = (h, w, comps)

    out = bytearray(b"\xff\xd8")
    out += (
        b"\xff\xe0" + struct.pack(">H", 16)
        + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    )
    qy, qc = quants[0], quants[-1]
    for tq, q in enumerate([qy] if gray else [qy, qc]):
        out += b"\xff\xdb" + struct.pack(">HB", 67, tq) + bytes(
            int(q[i, j]) for i, j in _ZIGZAG
        )
    out += b"\xff\xc2" + struct.pack(">HBHHB", 8 + 3 * nc, 8, h, w, nc)
    for cid, ch, cv, tq in comps:
        out += bytes([cid, (ch << 4) | cv, tq])

    def scan_ops(scan, ss, se, ah, al):
        """One scan as (symbol|None, [(value, nbits), ...]) ops — run
        once to collect symbols, once to emit."""
        ops: list[tuple[int | None, list[tuple[int, int]]]] = []
        pred = [0] * nc
        eobrun = 0
        be: list[int] = []  # correction bits pending behind an EOBn

        def flush_eobrun():
            nonlocal eobrun
            if eobrun > 0:
                r = eobrun.bit_length() - 1
                ops.append(
                    ((r << 4), [(eobrun - (1 << r), r)] if r else [])
                )
                for bit in be:
                    ops.append((None, [(bit, 1)]))
                be.clear()
                eobrun = 0

        for ci, by, bx, _first in _scan_block_order(frame, scan):
            blk = zz_blocks[ci][by, bx]
            if ss == 0:
                if ah == 0:
                    dc = int(blk[0]) >> al
                    diff = dc - pred[ci]
                    pred[ci] = dc
                    s, bits_v = _magnitude(diff)
                    ops.append((s, [(bits_v, s)] if s else []))
                else:
                    ops.append((None, [((int(blk[0]) >> al) & 1, 1)]))
                continue
            if ah == 0:  # AC first pass (sign-preserving point transform)
                v = [
                    (1 if blk[k] > 0 else -1) * (abs(int(blk[k])) >> al)
                    for k in range(ss, se + 1)
                ]
                nz = [i for i, x in enumerate(v) if x]
                if not nz:
                    eobrun += 1
                    if eobrun == 0x7FFF:
                        flush_eobrun()
                    continue
                run = 0
                for i in range(nz[-1] + 1):
                    if v[i] == 0:
                        run += 1
                        continue
                    flush_eobrun()
                    while run > 15:
                        ops.append((0xF0, []))
                        run -= 16
                    s, bits_v = _magnitude(v[i])
                    ops.append(((run << 4) | s, [(bits_v, s)]))
                    run = 0
                if nz[-1] < se - ss:
                    eobrun += 1
                    if eobrun == 0x7FFF:
                        flush_eobrun()
            else:  # AC refinement pass (al is the new bit)
                t = [abs(int(blk[k])) >> al for k in range(ss, se + 1)]
                newly = [i for i, x in enumerate(t) if x == 1]
                eobpos = newly[-1] if newly else -1
                run = 0
                br_bits: list[int] = []  # this block's pending bits
                for i in range(len(t)):
                    if t[i] == 0:
                        run += 1
                        continue
                    while run > 15 and i <= eobpos:
                        flush_eobrun()
                        ops.append((0xF0, []))
                        run -= 16
                        for bit in br_bits:
                            ops.append((None, [(bit, 1)]))
                        br_bits = []
                    if t[i] > 1:
                        br_bits.append(t[i] & 1)
                        continue
                    flush_eobrun()
                    sign = 1 if blk[ss + i] > 0 else 0
                    ops.append(((run << 4) | 1, [(sign, 1)]))
                    for bit in br_bits:
                        ops.append((None, [(bit, 1)]))
                    br_bits = []
                    run = 0
                if run > 0 or br_bits:
                    eobrun += 1
                    be.extend(br_bits)
                    if eobrun == 0x7FFF:
                        flush_eobrun()
        flush_eobrun()
        return ops

    def emit_scan(scan_comps, ss, se, ah, al, table_class):
        scan = [(ci, 0, 0) for ci in scan_comps]
        ops = scan_ops(scan, ss, se, ah, al)
        syms = {sym for sym, _bits in ops if sym is not None}
        need_table = bool(syms) or (ss == 0 and ah == 0) or ss > 0
        nonlocal out
        if need_table:
            bits, vals, codes = _flat_canonical_table(syms)
            out += b"\xff\xc4" + struct.pack(
                ">HB", 19 + len(vals), (table_class << 4) | 0
            )
            out += bytes(bits) + bytes(vals)
        else:
            codes = {}
        ns = len(scan_comps)
        out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * ns, ns)
        for ci in scan_comps:
            out += bytes([comps[ci][0], 0x00])
        out += bytes([ss, se, (ah << 4) | al])
        bw = _BitWriter()
        for sym, bits_list in ops:
            if sym is not None:
                ln, code = codes[sym]
                bw.write(code, ln)
            for value, nb in bits_list:
                if nb:
                    bw.write(value, nb)
        bw.flush()
        out += bw.out

    emit_scan(list(range(nc)), 0, 0, 0, 1, 0)   # DC first, Al=1
    emit_scan(list(range(nc)), 0, 0, 1, 0, 0)   # DC refine
    for ci in range(nc):
        emit_scan([ci], 1, 63, 0, 1, 1)         # AC first, Al=1
    for ci in range(nc):
        emit_scan([ci], 1, 63, 1, 0, 1)         # AC refine -> Al=0

    out += b"\xff\xd9"
    return bytes(out)
