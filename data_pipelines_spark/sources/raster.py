"""Raster → long-form ingestion (the engine's non-tabular boundary).

The reference ingests GRIB ensembles, NetCDF grids, and GeoTIFF/COG
rasters with xarray/rioxarray (`resources/io_managers.py:103-223`) and
immediately flattens them to tabular form for analytics
(`utils/flood/raster_converter.py:40-77`). This engine keeps that
boundary explicit: ingestion happens OUTSIDE the relational core, here,
producing long-form DataFrames; the engine contract starts at parquet
(SURVEY.md §7.4).

Every format has a dependency-free built-in parser for the profile
the reference actually moves (GRIB editions 1+2 simple packing,
classic NetCDF incl. record dims, TIFF/COG incl. tiles, overviews,
LZW/DEFLATE, Zarr v2 incl. F-order and delta/shuffle filters), with
the codec libraries (cfgrib/xarray/rasterio) preferred automatically
when installed for the exotic remainder. The matching writers live in
`sources/raster_encode.py`; round-trips are byte-exact and the
`raster_roundtrip` registry entry hash-checks encode → parse →
flatten against a DuckDB replay. At scale, ingestion parallelizes per
*file* (one task per GRIB/tile via `operators/taskmap.py`), each task
writing one partition of the long-form parquet dataset — Spark then
reads the directory as one table with partition pruning.
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def grid_to_long_form(
    spark: SparkSession,
    values: np.ndarray,
    coords: dict[str, np.ndarray],
    value_col: str = "dis24",
    drop_nan: bool = True,
) -> DataFrame:
    """Flatten an N-D grid to one row per cell (reference
    `raster_converter.py:40-77`).

    ``values``: N-D array. ``coords``: ordered {dim_name: 1-D coords}
    matching values.shape. NaN cells are dropped (reference P5,
    `raster_converter.py:33-34`). Data transfers via Arrow in columnar
    batches — no Python row loop.
    """
    import pandas as pd

    if tuple(len(c) for c in coords.values()) != values.shape:
        raise ValueError(
            f"coords {tuple(len(c) for c in coords.values())} do not match "
            f"values shape {values.shape}"
        )
    mesh = np.meshgrid(*coords.values(), indexing="ij")
    flat = {name: m.ravel() for name, m in zip(coords.keys(), mesh)}
    flat[value_col] = values.ravel()
    pdf = pd.DataFrame(flat)
    if drop_nan:
        pdf = pdf[~np.isnan(pdf[value_col])]
    return spark.createDataFrame(pdf)


def _sm_int(raw: bytes) -> int:
    """GRIB2 sign-magnitude integer: MSB is the sign bit, remaining
    bits the magnitude (NOT two's complement)."""
    v = int.from_bytes(raw, "big")
    sign_bit = 1 << (len(raw) * 8 - 1)
    return -(v & (sign_bit - 1)) if v & sign_bit else v


def _ibm_to_float(raw: bytes) -> float:
    """IBM System/360 32-bit hex float (GRIB1 reference values):
    sign(1) | excess-64 base-16 exponent(7) | fraction(24)."""
    w = int.from_bytes(raw, "big")
    sign = -1.0 if w >> 31 else 1.0
    exp = (w >> 24) & 0x7F
    frac = w & 0xFFFFFF
    return sign * frac * 16.0 ** (exp - 64) * 2.0 ** -24


def _unpack_bits(body: bytes, n_points: int, nbits: int) -> np.ndarray:
    """MSB-first fixed-width bit fields → int64 array (shared by the
    GRIB1/GRIB2 simple-packing decoders)."""
    bits = np.unpackbits(np.frombuffer(body, dtype="u1"))
    weights = 1 << np.arange(nbits - 1, -1, -1, dtype=np.int64)
    return bits[: n_points * nbits].reshape(n_points, nbits) @ weights


def _unpack_var_bits(
    bits: np.ndarray, starts: np.ndarray, widths: np.ndarray
) -> np.ndarray:
    """Variable-width MSB-first bit fields → int64 array.

    ``bits`` is the unpacked 0/1 stream; value i occupies
    ``widths[i]`` bits at bit offset ``starts[i]``. Vectorized per
    distinct width (a GRIB2 complex-packing stream has at most ~32),
    so decoding stays numpy-side even with millions of groups."""
    out = np.zeros(len(starts), dtype=np.int64)
    for w in np.unique(widths):
        if w == 0:
            continue
        sel = widths == w
        idx = starts[sel][:, None] + np.arange(w)
        weights = 1 << np.arange(w - 1, -1, -1, dtype=np.int64)
        out[sel] = bits[idx] @ weights
    return out


def _decode_complex_section7(body: bytes, packing: dict) -> np.ndarray:
    """GRIB2 data templates 7.2/7.3 (complex packing, optionally with
    spatial differencing) → the per-point integer field X, ready for
    the common Y = (R + X·2^E)/10^D scaling.

    Layout (WMO FM 92 + NCEP g2lib `comunpack`): optional spatial-
    differencing descriptors (``order`` initial field values then the
    overall difference minimum, each ``ba`` octets sign-magnitude),
    then NG group references (``nbits`` each), NG group widths, NG
    scaled group lengths — each block padded to a byte boundary — then
    the data bits, continuous across groups. Value i of group g is
    ``gref_g + field(width_g bits)``; group width/length are
    ``width_ref + w`` and ``len_ref + scaled·len_inc`` with the last
    group's true length carried explicitly in the template.

    Missing-value management (template octet 23 = 1 or 2): in a group
    of width w > 0 the all-ones pattern 2^w−1 marks a primary-missing
    point (2^w−2 secondary at MVM 2); a width-0 group whose reference
    equals the all-ones pattern at the REFERENCE width is missing
    wholesale. Missing points carry no group reference and are
    excluded from the spatial-differencing chain, which runs over the
    compacted present sequence (g2lib `comunpack`). The return is then
    float64 with NaN at missing points (both classes — the substitute
    values in octets 24-31 are advisory and not materialized);
    without MVM the exact int64 field returns as before."""
    pos = 5  # section body after length(4) + number(1)
    order, ba = packing["order"], packing["ba"]
    initial, gmin = [], 0
    if order:
        for _ in range(order):
            initial.append(_sm_int(body[pos : pos + ba]))
            pos += ba
        gmin = _sm_int(body[pos : pos + ba])
        pos += ba

    ng, nbits = packing["ng"], packing["nbits"]
    bits = np.unpackbits(np.frombuffer(body[pos:], dtype="u1"))

    def block(n: int, width: int, at: int) -> tuple[np.ndarray, int]:
        if width == 0:
            return np.zeros(n, dtype=np.int64), at
        vals = _unpack_bits(
            np.packbits(bits[at : at + n * width]).tobytes(), n, width
        )
        return vals, at + ((n * width + 7) // 8) * 8  # byte-padded

    at = 0
    grefs, at = block(ng, nbits, at)
    widths, at = block(ng, packing["width_bits"], at)
    widths = widths + packing["width_ref"]
    scaled, at = block(ng, packing["len_bits"], at)
    lengths = packing["len_ref"] + scaled * packing["len_inc"]
    if ng:
        lengths[-1] = packing["last_len"]
    n_points = packing["n_points"]
    if int(lengths.sum()) != n_points:
        raise ValueError(
            f"complex-packing group lengths sum to {int(lengths.sum())}, "
            f"expected {n_points}"
        )

    # Per-value bit geometry: data bits are continuous across groups.
    val_widths = np.repeat(widths, lengths)
    starts = at + np.concatenate(
        ([0], np.cumsum(val_widths.astype(np.int64))[:-1])
    )
    x = _unpack_var_bits(bits, starts, val_widths)

    def undiff(seq: np.ndarray) -> np.ndarray:
        # Undo spatial differencing (g2lib comunpack): the first
        # `order` values are the stored originals; the rest accumulate.
        seq[order:] += gmin
        if order == 1:
            seq[0] = initial[0]
            np.cumsum(seq, out=seq)
        elif len(seq) == 1:
            seq[0] = initial[0]
        else:
            # Second order: seq[2:] holds second differences; one
            # cumsum (seeded with f1-f0) recovers first differences, a
            # second recovers the field — no per-point Python loop.
            seq[1] = initial[1] - initial[0]
            np.cumsum(seq[1:], out=seq[1:])
            seq[0] = initial[0]
            np.cumsum(seq, out=seq)
        return seq

    mvm = packing.get("mvm", 0)
    if not mvm:
        x += np.repeat(grefs, lengths)
        return undiff(x) if order else x

    # Missing-value management: detect the reserved patterns BEFORE
    # any reference addition or differencing.
    grefs_rep = np.repeat(grefs, lengths)
    wide = val_widths > 0
    pat1 = (np.int64(1) << val_widths) - 1  # all-ones per value width
    miss = wide & (x == pat1)
    if mvm == 2:
        miss |= wide & (x == pat1 - 1)
    if packing["nbits"] > 0:  # width-0 groups: pattern at REFERENCE width
        ref_pat = (np.int64(1) << packing["nbits"]) - 1
        miss |= ~wide & (grefs_rep == ref_pat)
        if mvm == 2:
            miss |= ~wide & (grefs_rep == ref_pat - 1)
    x = np.where(miss, 0, x + grefs_rep)
    if order:
        present = x[~miss]
        if len(present):
            x[~miss] = undiff(present)
    out = x.astype("f8")
    out[miss] = np.nan
    return out


def read_grib1_minimal(path: str):
    """Minimal GRIB edition 1 (WMO FM 92-VIII) parser — no libraries.

    Covers the profile ECMWF's ERA/ensemble archives disseminate:
    regular lat/lon grid (data representation type 0), grid-point
    simple packing (Y·10^D = R + X·2^E with R an IBM 32-bit hex
    float), optional bitmap section, ECMWF local definition 1
    perturbation numbers (PDS octet 50) for ensemble members, any
    number of messages per file. Anything else — spherical harmonics,
    other grids, second-order packing — raises with a pointer to the
    cfgrib path.

    Returns the same ``[(meta, values[Nj, Ni], lats, lons), ...]``
    shape as :func:`read_grib2_minimal` so the ensemble reader treats
    both editions uniformly.
    """
    with open(path, "rb") as f:
        data = f.read()
    return parse_grib1_bytes(data)


def parse_grib1_bytes(data: bytes):
    """GRIB1 message decode from in-memory bytes (see
    :func:`parse_grib2_bytes` for why this is exposed)."""
    out = []
    pos = 0
    while pos < len(data):
        if data[pos : pos + 4] != b"GRIB":
            raise ValueError(f"bad GRIB indicator at byte {pos}")
        edition = data[pos + 7]
        if edition != 1:
            raise ValueError(f"GRIB edition {edition}: not a GRIB1 message")
        total_len = int.from_bytes(data[pos + 4 : pos + 7], "big")
        sec_pos = pos + 8

        # --- Section 1: PDS -------------------------------------------
        pds = data[sec_pos : sec_pos + int.from_bytes(
            data[sec_pos : sec_pos + 3], "big"
        )]
        flags = pds[7]
        has_gds, has_bms = bool(flags & 0x80), bool(flags & 0x40)
        d_scale = _sm_int(pds[26:28])
        meta: dict = {"edition": 1, "pdt": None}
        if len(pds) >= 51 and pds[40] == 1:  # ECMWF local definition 1
            meta["member"] = pds[49]
        sec_pos += len(pds)

        if not has_gds:
            raise NotImplementedError(
                "GRIB1 without GDS (predefined grids): use the cfgrib path"
            )
        # --- Section 2: GDS -------------------------------------------
        gds = data[sec_pos : sec_pos + int.from_bytes(
            data[sec_pos : sec_pos + 3], "big"
        )]
        if gds[5] != 0:
            raise NotImplementedError(
                f"GRIB1 grid type {gds[5]}: use the cfgrib path"
            )
        ni = int.from_bytes(gds[6:8], "big")
        nj = int.from_bytes(gds[8:10], "big")
        la1 = _sm_int(gds[10:13]) / 1e3
        lo1 = _sm_int(gds[13:16]) / 1e3
        di = int.from_bytes(gds[23:25], "big") / 1e3
        dj = int.from_bytes(gds[25:27], "big") / 1e3
        scan = gds[27]
        if scan & 0x80:
            raise NotImplementedError(
                "GRIB1 -i scan direction: use the cfgrib path"
            )
        lons = lo1 + np.arange(ni) * di
        jsign = 1.0 if scan & 0x40 else -1.0
        lats = la1 + jsign * np.arange(nj) * dj
        sec_pos += len(gds)

        # --- Section 3: BMS (optional) --------------------------------
        bitmap_bits = None
        if has_bms:
            bms = data[sec_pos : sec_pos + int.from_bytes(
                data[sec_pos : sec_pos + 3], "big"
            )]
            if int.from_bytes(bms[4:6], "big") != 0:
                raise NotImplementedError(
                    "GRIB1 predefined bitmaps: use the cfgrib path"
                )
            bitmap_bits = np.unpackbits(np.frombuffer(bms[6:], dtype="u1"))
            sec_pos += len(bms)

        # --- Section 4: BDS -------------------------------------------
        bds = data[sec_pos : sec_pos + int.from_bytes(
            data[sec_pos : sec_pos + 3], "big"
        )]
        bds_flags = bds[3] >> 4
        if bds_flags & 0b1100:
            raise NotImplementedError(
                "GRIB1 spherical-harmonic / complex packing: use the "
                "cfgrib path"
            )
        e_scale = _sm_int(bds[4:6])
        ref = _ibm_to_float(bds[6:10])
        nbits = bds[10]
        n_points = (
            int(bitmap_bits[: ni * nj].sum())
            if bitmap_bits is not None
            else ni * nj
        )
        if nbits == 0:
            unpacked = np.full(n_points, ref)
        else:
            x = _unpack_bits(bds[11:], n_points, nbits)
            unpacked = (ref + x * 2.0 ** e_scale) / 10.0 ** d_scale
        if bitmap_bits is not None:
            full = np.full(ni * nj, np.nan)
            full[bitmap_bits[: ni * nj].astype(bool)] = unpacked
            unpacked = full
        out.append((meta, unpacked.reshape(nj, ni), lats, lons))

        pos += total_len
    return out


def read_grib2_minimal(path: str):
    """Minimal GRIB2 (WMO FM 92 edition 2) parser — no libraries.

    Covers the profiles ECMWF/NOAA disseminate for regular grids: grid
    definition template 3.0 (equidistant lat/lon); data representation
    templates 5.0 (grid-point simple packing: Y = (R + X·2^E) / 10^D
    over an nbits big-endian bit-packed array), 5.2 (complex packing:
    per-group references + variable-width fields), 5.3 (complex
    packing with first/second-order spatial differencing — the
    encoding operational ECMWF products like GLOFAS discharge actually
    use), and 5.41 (PNG packing — NOAA MRMS-style; section 7 is a PNG
    stream decoded by the engine's own stdlib-zlib PNG kernel);
    missing points via an optional bitmap OR complex-packing
    missing-value management (template octet 23 = 1/2: in-group
    all-ones patterns, both primary and secondary surfacing as NaN);
    any number of messages per file (ensemble members). Anything else
    — spectral/jpeg2000 packing, other grids — raises with a pointer
    to the cfgrib path.

    Returns a list of (meta, values[Nj, Ni], lats, lons) per message;
    ``meta`` carries the product-definition template number and, for
    ensemble templates (4.1/4.11), the perturbation number.
    """
    with open(path, "rb") as f:
        data = f.read()
    return parse_grib2_bytes(data)


def parse_grib2_bytes(data: bytes):
    """GRIB2 message decode from in-memory bytes — the per-message
    kernel `read_grib2_minimal` wraps, exposed so selective readers
    (`sources.gribidx.read_grib_selective`) can decode exactly the
    byte ranges an .idx file names without touching the rest of the
    file."""
    out = []
    pos = 0
    while pos < len(data):
        if data[pos : pos + 4] != b"GRIB":
            raise ValueError(f"bad GRIB indicator at byte {pos}")
        edition = data[pos + 7]
        if edition != 2:
            raise ValueError(
                f"GRIB edition {edition}: use read_grib1_minimal / "
                "read_grib_minimal"
            )
        total_len = int.from_bytes(data[pos + 8 : pos + 16], "big")
        end = pos + total_len
        sec_pos = pos + 16

        grid = packing = None
        bitmap_bits = None
        meta: dict = {}
        values = None
        while sec_pos < end:
            if data[sec_pos : sec_pos + 4] == b"7777":
                sec_pos += 4
                break
            sec_len = int.from_bytes(data[sec_pos : sec_pos + 4], "big")
            sec_num = data[sec_pos + 4]
            body = data[sec_pos : sec_pos + sec_len]

            if sec_num == 3:
                template = int.from_bytes(body[12:14], "big")
                if template != 0:
                    raise NotImplementedError(
                        f"grid template 3.{template}: use the cfgrib path"
                    )
                ni = int.from_bytes(body[30:34], "big")
                nj = int.from_bytes(body[34:38], "big")
                la1 = _sm_int(body[46:50]) / 1e6
                lo1 = int.from_bytes(body[50:54], "big") / 1e6
                di = int.from_bytes(body[63:67], "big") / 1e6
                dj = int.from_bytes(body[67:71], "big") / 1e6
                scan = body[71]
                lons = lo1 + np.arange(ni) * di
                jsign = 1.0 if scan & 0x40 else -1.0
                lats = la1 + jsign * np.arange(nj) * dj
                grid = (ni, nj, lats, lons)
            elif sec_num == 4:
                meta["pdt"] = int.from_bytes(body[7:9], "big")
                if meta["pdt"] in (1, 11):  # ensemble templates
                    meta["member"] = body[35]
            elif sec_num == 5:
                n_points = int.from_bytes(body[5:9], "big")
                template = int.from_bytes(body[9:11], "big")
                if template not in (0, 2, 3, 41):
                    raise NotImplementedError(
                        f"packing template 5.{template}: use the cfgrib path"
                    )
                ref = np.frombuffer(body[11:15], dtype=">f4")[0]
                e_scale = _sm_int(body[15:17])
                d_scale = _sm_int(body[17:19])
                nbits = body[19]
                packing = {
                    "template": template, "n_points": n_points,
                    "ref": float(ref), "e_scale": e_scale,
                    "d_scale": d_scale, "nbits": nbits,
                }
                if template in (2, 3):  # complex packing (+ spatial diff)
                    mvm = body[22]
                    if mvm not in (0, 1, 2):
                        raise ValueError(
                            f"bad missing-value management flag {mvm}"
                        )
                    packing.update(
                        mvm=mvm,
                        ng=int.from_bytes(body[31:35], "big"),
                        width_ref=body[35], width_bits=body[36],
                        len_ref=int.from_bytes(body[37:41], "big"),
                        len_inc=body[41],
                        last_len=int.from_bytes(body[42:46], "big"),
                        len_bits=body[46], order=0, ba=0,
                    )
                    if template == 3:
                        order, ba = body[47], body[48]
                        if order not in (1, 2):
                            raise NotImplementedError(
                                f"spatial differencing order {order}"
                            )
                        packing.update(order=order, ba=ba)
            elif sec_num == 6:
                indicator = body[5]
                if indicator == 0:
                    bitmap_bits = np.unpackbits(
                        np.frombuffer(body[6:], dtype="u1")
                    )
                elif indicator != 255:
                    raise NotImplementedError(
                        "predefined bitmaps: use the cfgrib path"
                    )
            elif sec_num == 7:
                n_points, ref = packing["n_points"], packing["ref"]
                e_scale, d_scale = packing["e_scale"], packing["d_scale"]
                nbits = packing["nbits"]
                if packing["template"] in (2, 3):
                    x = _decode_complex_section7(body, packing)
                    unpacked = (ref + x * 2.0**e_scale) / 10.0**d_scale
                elif packing["template"] == 41:
                    # PNG packing: section 7 is a complete PNG stream;
                    # gray 8/16 carry X directly, RGB/RGBA carry its
                    # big-endian 24/32-bit bytes as channels.
                    from data_pipelines_spark.operators.multimodal import (
                        decode_png,
                    )

                    img = np.asarray(decode_png(bytes(body[5:])))
                    if img.ndim == 3:
                        shifts = np.arange(
                            img.shape[2] - 1, -1, -1, dtype=np.int64
                        ) * 8
                        x = (img.astype(np.int64) << shifts).sum(axis=2)
                    else:
                        x = img.astype(np.int64)
                    x = x.ravel()[:n_points]
                    unpacked = (ref + x * 2.0**e_scale) / 10.0**d_scale
                elif nbits == 0:
                    unpacked = np.full(n_points, ref)
                else:
                    x = _unpack_bits(body[5:], n_points, nbits)
                    unpacked = (ref + x * 2.0**e_scale) / 10.0**d_scale
                ni, nj, lats, lons = grid
                if bitmap_bits is not None:
                    full = np.full(ni * nj, np.nan)
                    full[bitmap_bits[: ni * nj].astype(bool)] = unpacked
                    unpacked = full
                values = unpacked.reshape(nj, ni)

            sec_pos += sec_len

        ni, nj, lats, lons = grid
        out.append((meta, values, lats, lons))
        pos = end
    return out


def read_grib_minimal(path: str):
    """Edition-sniffing GRIB reader: dispatches to the GRIB1 or GRIB2
    minimal parser based on the indicator section's edition octet
    (byte 7 of the first message)."""
    with open(path, "rb") as f:
        head = f.read(8)
    if head[:4] != b"GRIB" or len(head) < 8:
        raise ValueError(f"not a GRIB file: {path}")
    if head[7] == 1:
        return read_grib1_minimal(path)
    return read_grib2_minimal(path)


def read_grib_ensemble(
    spark: SparkSession,
    path: str,
    value_var: str = "dis24",
    use_control_member: bool = True,
):
    """GRIB ensemble → long-form DataFrame (reference S4,
    `io_managers.py:193-210`: opens control (`cf`) and perturbed (`pf`)
    datasets and concatenates along the member axis).

    Prefers cfgrib/xarray (full GRIB coverage); without them, falls
    back to :func:`read_grib_minimal` for simple-packed regular-grid
    GRIB1/GRIB2 — one message per ensemble member, stacked on the
    ``number`` axis — so S4 ingestion genuinely runs (and is tested
    end-to-end) in codec-free environments.
    """
    try:
        import xarray as xr  # noqa: F401
    except ImportError:
        messages = read_grib_minimal(path)
        if not messages:
            raise ValueError(f"no GRIB messages in {path}")
        members = np.array(
            [float(m.get("member", i)) for i, (m, *_rest) in enumerate(messages)]
        )
        _, _, lats, lons = messages[0]
        stacked = np.stack([v for _, v, _, _ in messages])
        return grid_to_long_form(
            spark,
            stacked,
            {"number": members, "latitude": lats, "longitude": lons},
            value_col=value_var,
        )
    datasets = []
    kinds = (["cf", "pf"] if use_control_member else ["pf"])
    for kind in kinds:  # pragma: no cover - env without codecs
        ds = xr.open_dataset(
            path, engine="cfgrib",
            backend_kwargs={"filter_by_keys": {"dataType": kind}},
        )
        datasets.append(ds)
    merged = xr.concat(datasets, dim="number")  # pragma: no cover
    da = merged[value_var]  # pragma: no cover
    return grid_to_long_form(  # pragma: no cover
        spark,
        da.values,
        {d: merged[d].values for d in da.dims},
        value_col=value_var,
    )


# Classic-NetCDF external types: nc_type id -> (big-endian dtype, size).
_NC_TYPES = {
    1: ("i1", 1),   # NC_BYTE
    2: ("S1", 1),   # NC_CHAR
    3: (">i2", 2),  # NC_SHORT
    4: (">i4", 4),  # NC_INT
    5: (">f4", 4),  # NC_FLOAT
    6: (">f8", 8),  # NC_DOUBLE
}

_NC_DIMENSION, _NC_VARIABLE, _NC_ATTRIBUTE = 0x0A, 0x0B, 0x0C


def read_netcdf_minimal(path: str):
    """Classic NetCDF (CDF-1 / CDF-2) parser — no libraries.

    The classic format is a public, fully specified flat binary layout
    (magic ``CDF\\x01``/``\\x02``, big-endian header of dim/attr/var
    lists, then contiguous fixed-size variable data), so fixed-shape
    grids — the raster shape the reference ingests — need none of the
    HDF5 machinery. Record (UNLIMITED-dimension) variables are
    supported too: their per-record slabs are interleaved across the
    record block (one stride per record, the daily-append layout
    climate archives accumulate), de-interleaved here into plain
    ``(numrecs, ...)`` arrays; only streaming files with an unknown
    record count raise.

    Returns ``(dims, variables)`` where ``dims`` is an ordered
    {name: size} (the record dimension reports its materialized
    ``numrecs``) and ``variables`` maps name → (dim_names, ndarray,
    attrs). Attribute values come back as python scalars/strings/
    ndarrays.
    """
    with open(path, "rb") as f:
        data = f.read()
    if data[:3] != b"CDF" or data[3] not in (1, 2):
        raise ValueError("not a classic NetCDF file (HDF5-based NetCDF-4 "
                         "needs the xarray path)")
    version = data[3]
    pos = 4

    def u4() -> int:
        nonlocal pos
        v = int.from_bytes(data[pos : pos + 4], "big")
        pos += 4
        return v

    def u8() -> int:
        nonlocal pos
        v = int.from_bytes(data[pos : pos + 8], "big")
        pos += 8
        return v

    def name() -> str:
        nonlocal pos
        n = u4()
        s = data[pos : pos + n].decode("utf-8")
        pos += (n + 3) // 4 * 4  # names pad to 4-byte boundary
        return s

    def attr_list() -> dict:
        nonlocal pos
        tag, cnt = u4(), u4()
        out: dict = {}
        if tag == 0 and cnt == 0:  # ABSENT
            return out
        if tag != _NC_ATTRIBUTE:
            raise ValueError(f"bad attribute-list tag 0x{tag:x}")
        for _ in range(cnt):
            nm = name()
            typ, n = u4(), u4()
            dt, size = _NC_TYPES[typ]
            nbytes = size * n
            raw = data[pos : pos + nbytes]
            pos += (nbytes + 3) // 4 * 4  # values pad to 4-byte boundary
            if typ == 2:
                out[nm] = raw.decode("utf-8")
            else:
                vals = np.frombuffer(raw, dtype=dt, count=n)
                out[nm] = vals[0] if n == 1 else vals
        return out

    numrecs = u4()
    tag, cnt = u4(), u4()
    dims: list[tuple[str, int]] = []
    if tag == _NC_DIMENSION:
        dims = [(name(), u4()) for _ in range(cnt)]
    elif not (tag == 0 and cnt == 0):
        raise ValueError(f"bad dimension-list tag 0x{tag:x}")

    attr_list()  # global attributes — parsed (cursor must advance), unused

    tag, cnt = u4(), u4()
    variables: dict[str, tuple[tuple[str, ...], np.ndarray, dict]] = {}
    record_vars: list[tuple[str, tuple, np.dtype, int, int, dict]] = []
    if tag == _NC_VARIABLE:
        for _ in range(cnt):
            nm = name()
            ndims = u4()
            dimids = [u4() for _ in range(ndims)]
            vatts = attr_list()
            typ, vsize = u4(), u4()
            begin = u4() if version == 1 else u8()
            dim_names = tuple(dims[d][0] for d in dimids)
            dt, _ = _NC_TYPES[typ]
            if dimids and dims[dimids[0]][1] == 0:  # record variable
                if numrecs == 0xFFFFFFFF:
                    raise NotImplementedError(
                        "STREAMING numrecs: use the xarray path"
                    )
                if any(dims[d][1] == 0 for d in dimids[1:]):
                    raise ValueError(
                        "only the first dimension may be the record dim"
                    )
                rec_shape = tuple(dims[d][1] for d in dimids[1:])
                record_vars.append(
                    (nm, dim_names, np.dtype(dt), begin, vsize, vatts)
                )
                variables[nm] = (dim_names, rec_shape, vatts)  # placeholder
                continue
            shape = tuple(dims[d][1] for d in dimids)
            n_elem = int(np.prod(shape, dtype=np.int64)) if shape else 1
            arr = np.frombuffer(
                data, dtype=dt, count=n_elem, offset=begin
            ).reshape(shape)
            variables[nm] = (dim_names, arr, vatts)
    elif not (tag == 0 and cnt == 0):
        raise ValueError(f"bad variable-list tag 0x{tag:x}")

    if record_vars:
        # One stride per record covering every record variable's slab;
        # when there is exactly ONE record variable its slab is not
        # padded to 4 bytes (the spec's single-variable exception) —
        # the header's vsize already encodes the right per-record size.
        recsize = sum(v[4] for v in record_vars)
        for nm, dim_names, dt, begin, _vsize, vatts in record_vars:
            rec_shape = variables[nm][1]
            n_elem = int(np.prod(rec_shape, dtype=np.int64)) if rec_shape else 1
            slabs = [
                np.frombuffer(
                    data, dtype=dt, count=n_elem, offset=begin + r * recsize
                ).reshape(rec_shape)
                for r in range(numrecs)
            ]
            arr = (
                np.stack(slabs)
                if slabs
                else np.empty((0, *rec_shape), dtype=dt)
            )
            variables[nm] = (dim_names, arr, vatts)

    out_dims = {n: (numrecs if sz == 0 else sz) for n, sz in dims}
    return out_dims, variables


def _apply_cf_attrs(arr: np.ndarray, attrs: dict) -> np.ndarray:
    """CF unpacking: mask _FillValue/missing_value to NaN, then apply
    scale_factor/add_offset — the same unpacking xarray performs."""
    out = arr.astype("float64")
    for key in ("_FillValue", "missing_value"):
        if key in attrs:
            out = np.where(arr == attrs[key], np.nan, out)
    if "scale_factor" in attrs:
        out = out * float(attrs["scale_factor"])
    if "add_offset" in attrs:
        out = out + float(attrs["add_offset"])
    return out


def read_netcdf_grid(
    spark: SparkSession, path: str, value_var: str
):
    """NetCDF grid → long-form (reference S5, `io_managers.py:222-223`).

    Prefers xarray (NetCDF-4/HDF5, full CF decoding); without it,
    falls back to :func:`read_netcdf_minimal` for classic-format grids
    — fixed-shape AND record (UNLIMITED-dimension) variables — with CF
    fill/scale/offset unpacking, so S5 ingestion genuinely runs (and
    is tested end-to-end) in codec-free environments.
    """
    try:
        import xarray as xr
    except ImportError:
        dims, variables = read_netcdf_minimal(path)
        dim_names, arr, vatts = variables[value_var]
        coords = {
            d: (
                variables[d][1].astype("float64")
                if d in variables
                else np.arange(dims[d], dtype="float64")
            )
            for d in dim_names
        }
        return grid_to_long_form(
            spark, _apply_cf_attrs(arr, vatts), coords, value_col=value_var
        )
    ds = xr.open_dataset(path)  # pragma: no cover
    da = ds[value_var]  # pragma: no cover
    return grid_to_long_form(  # pragma: no cover
        spark, da.values, {d: ds[d].values for d in da.dims}, value_col=value_var
    )


_TIFF_DTYPES = {
    # (SampleFormat, BitsPerSample) -> numpy dtype char
    (1, 8): "u1", (1, 16): "u2", (1, 32): "u4",
    (2, 8): "i1", (2, 16): "i2", (2, 32): "i4",
    (3, 32): "f4", (3, 64): "f8",
}


def _lzw_decode(raw: bytes) -> bytes:
    """TIFF-variant LZW (TIFF 6.0 §13): MSB-first bit packing, codes
    256=Clear / 257=EOI, 9→12-bit widths with the spec's EARLY-CHANGE
    quirk (the width bumps one code before the table actually fills —
    at table sizes 510/1022/2046)."""
    out = bytearray()
    table: list[bytes] = []
    width = 9
    prev: bytes | None = None

    def reset():
        nonlocal table, width, prev
        table = [bytes([i]) for i in range(256)] + [b"", b""]
        width = 9
        prev = None

    reset()
    acc = nbits = 0
    for byte in raw:
        # Mask to the unread low bits: without it `acc` accumulates the
        # whole stream as one growing bigint and bit-unpacking goes
        # quadratic (same fix as _lzw_encode's emit).
        acc = ((acc & ((1 << nbits) - 1)) << 8) | byte
        nbits += 8
        while nbits >= width:
            code = (acc >> (nbits - width)) & ((1 << width) - 1)
            nbits -= width
            if code == 256:
                reset()
                continue
            if code == 257:
                return bytes(out)
            if prev is None:
                entry = table[code]
            elif code < len(table):
                entry = table[code]
                table.append(prev + entry[:1])
            elif code == len(table):
                entry = prev + prev[:1]
                table.append(entry)
            else:
                raise ValueError(f"corrupt LZW stream: code {code}")
            out += entry
            prev = entry
            if len(table) in (510, 1022, 2046):  # early change
                width += 1
    return bytes(out)


def read_tiff_minimal(
    path: str, overview: int = 0
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(Geo)TIFF → (array, xs, ys) — none/LZW/DEFLATE/JPEG compression.

    A dependency-free reader for the profiles GDAL emits with
    `-co COMPRESS=NONE`, `-co COMPRESS=LZW`, or `-co COMPRESS=DEFLATE`
    (optionally `-co PREDICTOR=2` on integer data or `-co PREDICTOR=3`
    — the TechNote-3 floating-point predictor — on float data,
    `-co TILED=YES` plus overview levels, and `-co BIGTIFF=YES`):
    classic TIFF OR
    BigTIFF (version 43, 8-byte offsets), strip- OR tile-organized
    (tiles are the layout that makes a COG cloud-optimized), single-
    or multi-band (PlanarConfiguration=1, pixel-interleaved — the
    satellite-imagery shape), with the IFD chain exposed as overview
    levels (``overview=0`` is full resolution; ``overview=k`` follows
    the chain to the k-th reduced image, scaling the geotransform by
    the decimation factor — read the small level first, touch the big
    one only where needed: the COG access pattern). Parses the IFD
    directly with struct/numpy and applies the GeoTIFF
    ModelPixelScale/ModelTiepoint tags for cell-center coordinates.
    Both planar configurations decode (chunky pixel-interleaved AND
    PlanarConfiguration=2 band-separate chunks). New-style JPEG
    (compression 7) decodes through the engine's own baseline/
    progressive kernel (`operators/jpeg.py`), merging the shared
    JPEGTables tag (347) into each abbreviated chunk stream per
    TechNote 2; only old-style JPEG (compression 6) still gates to
    rasterio.

    Returns a 2-D ``(h, w)`` array for one band, 3-D ``(h, w, s)``
    for multi-band.
    """
    import struct
    import zlib

    with open(path, "rb") as f:
        data = f.read()
    if data[:2] == b"II":
        e = "<"
    elif data[:2] == b"MM":
        e = ">"
    else:
        raise ValueError("not a TIFF file")
    (magic,) = struct.unpack(e + "H", data[2:4])
    if magic == 42:  # classic TIFF
        big = False
        (ifd_off,) = struct.unpack(e + "I", data[4:8])
        entry_sz, count_sz, inline = 12, 2, 4
    elif magic == 43:  # BigTIFF: 8-byte offsets throughout
        big = True
        off_sz, zero = struct.unpack(e + "HH", data[4:8])
        if off_sz != 8 or zero != 0:
            raise ValueError(f"bad BigTIFF header ({off_sz}, {zero})")
        (ifd_off,) = struct.unpack(e + "Q", data[8:16])
        entry_sz, count_sz, inline = 20, 8, 8
    else:
        raise ValueError(f"not a TIFF file (version {magic})")
    count_fmt = "Q" if big else "H"
    off_fmt = "Q" if big else "I"

    def ifd_meta(at: int) -> tuple[int, int]:
        """(entry count, next-IFD offset) of the IFD block at ``at``."""
        (n,) = struct.unpack(
            e + count_fmt, data[at : at + count_sz]
        )
        tail = at + count_sz + n * entry_sz
        (nxt,) = struct.unpack(
            e + off_fmt, data[tail : tail + (8 if big else 4)]
        )
        return n, nxt

    # Walk the IFD chain to the requested overview level. Geo tags
    # live on the first IFD (GDAL convention), so remember it.
    first_ifd_off = ifd_off
    for level in range(overview):
        _n, ifd_off = ifd_meta(ifd_off)
        if ifd_off == 0:
            raise ValueError(
                f"overview {overview} not present (chain ends at {level})"
            )

    type_size = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 11: 4, 12: 8, 16: 8, 17: 8}

    def parse_ifd(at: int) -> dict[int, tuple[int, int, bytes]]:
        n, _nxt = ifd_meta(at)
        out: dict[int, tuple[int, int, bytes]] = {}
        for i in range(n):
            off = at + count_sz + i * entry_sz
            tag, typ = struct.unpack(e + "HH", data[off : off + 4])
            (cnt,) = struct.unpack(
                e + count_fmt if big else e + "I",
                data[off + 4 : off + 4 + (8 if big else 4)],
            )
            val_at = off + entry_sz - inline
            size = type_size.get(typ, 1) * cnt
            raw = (
                data[val_at : val_at + size]
                if size <= inline
                else data[
                    struct.unpack(
                        e + off_fmt, data[val_at : val_at + inline]
                    )[0] :
                ][:size]
            )
            out[tag] = (typ, cnt, raw)
        return out

    tags = parse_ifd(ifd_off)
    geo_tags = tags if overview == 0 else parse_ifd(first_ifd_off)

    def ints(tag: int, default=None, src=None):
        t = src if src is not None else tags
        if tag not in t:
            return default
        typ, cnt, raw = t[tag]
        fmt = {3: "H", 4: "I", 16: "Q"}[typ]
        return list(struct.unpack(e + fmt * cnt, raw))

    def doubles(tag: int):
        if tag not in geo_tags:
            return None
        _, cnt, raw = geo_tags[tag]
        return list(struct.unpack(e + "d" * cnt, raw))

    width, height = ints(256)[0], ints(257)[0]
    bits = ints(258, [32])[0]
    compression = ints(259, [1])[0]
    # none / LZW / new-style JPEG / DEFLATE / ZSTD (GDAL tag 50000)
    if compression not in (1, 5, 7, 8, 32946, 50000):
        raise NotImplementedError(
            f"TIFF compression {compression}: use the rasterio path "
            "(natively supported: none, LZW, JPEG, DEFLATE, ZSTD)"
        )
    if compression == 50000:
        from data_pipelines_spark.sources.blosc import _arrow_codec

        zstd_codec = _arrow_codec("zstd")
        if zstd_codec is None:
            raise NotImplementedError(
                "TIFF ZSTD: pyarrow build without zstd — use the "
                "rasterio path"
            )
    # TechNote 2: shared DQT/DHT live in JPEGTables (347) as an
    # SOI+segments+EOI stream; chunks are then abbreviated streams.
    jpeg_tables = tags[347][2] if compression == 7 and 347 in tags else None
    samples = ints(277, [1])[0]
    planar = ints(284, [1])[0] if samples != 1 else 1
    if planar not in (1, 2):
        raise ValueError(f"bad TIFF PlanarConfiguration {planar}")
    predictor = ints(317, [1])[0]
    if predictor not in (1, 2, 3):
        raise NotImplementedError(
            f"TIFF predictor {predictor}: use the rasterio path"
        )
    sample_format = ints(339, [1])[0]
    dt = np.dtype(e + _TIFF_DTYPES[(sample_format, bits)])
    if predictor == 2 and sample_format == 3:
        raise NotImplementedError(
            "horizontal-differencing predictor on float samples: use "
            "the rasterio path"
        )
    if predictor == 3 and sample_format != 3:
        raise NotImplementedError(
            "floating-point predictor on non-float samples: use the "
            "rasterio path"
        )

    def decode_chunk(raw: bytes, rows: int, cols: int, nsamp: int) -> np.ndarray:
        if compression == 7:
            from data_pipelines_spark.operators.jpeg import decode_jpeg

            stream = raw
            if jpeg_tables is not None:
                # merge: tables stream minus its EOI + chunk minus SOI.
                # A chunk that carries its own tables still decodes
                # right — its segments parse later and take precedence.
                stream = jpeg_tables[:-2] + raw[2:]
            img = decode_jpeg(stream)
            if img.ndim == 2:
                img = img[:, :, None]
            if img.shape[2] != nsamp:
                raise ValueError(
                    f"JPEG chunk has {img.shape[2]} bands, IFD says {nsamp}"
                )
            return img[:rows, :cols].astype(dt)
        if compression in (8, 32946):
            raw = zlib.decompress(raw)
        elif compression == 5:
            raw = _lzw_decode(raw)[: rows * cols * nsamp * dt.itemsize]
        elif compression == 50000:
            # one zstd frame per strip/tile; chunk byte count is exact
            # (tiles are spec-padded, final strips row-clipped upstream)
            raw = bytes(
                zstd_codec.decompress(
                    raw, rows * cols * nsamp * dt.itemsize
                )
            )
        if predictor == 3:
            # TIFF TechNote 3 floating-point predictor (libtiff fpAcc):
            # per row, byte-wise cumulative sum with stride = the
            # chunk's samples (1 in planar chunks) undoes the
            # differencing, then the big-endian byte planes
            # re-interleave into elements.
            bps = dt.itemsize
            buf = (
                np.frombuffer(raw, dtype="u1")
                .reshape(rows, -1, nsamp)
                .copy()
            )
            np.cumsum(buf, axis=1, dtype="u1", out=buf)
            elems = (
                buf.reshape(rows, bps, cols * nsamp)
                .transpose(0, 2, 1)
                .copy()
                .view(np.dtype(">" + _TIFF_DTYPES[(sample_format, bits)]))
            )
            return elems.reshape(rows, cols, nsamp).astype(dt)
        block = (
            np.frombuffer(raw, dtype=dt).reshape(rows, cols, nsamp).copy()
        )
        if predictor == 2:
            # Undo per-row horizontal differencing; modular cumsum in
            # the storage dtype (integer wraparound is part of the
            # predictor's definition).
            np.cumsum(block, axis=1, dtype=block.dtype, out=block)
        return block

    tiled = 322 in tags  # tile-organized (the COG interior layout)
    if tiled:
        tw, tl = ints(322)[0], ints(323)[0]
        offsets, counts = ints(324), ints(325)
    else:
        offsets, counts = ints(273), ints(279)
        rows_per_strip = ints(278, [height])[0]

    def assemble(offs, cnts, nsamp: int) -> np.ndarray:
        if tiled:
            across = -(-width // tw)
            down = -(-height // tl)
            if down * across != len(offs):
                raise ValueError(
                    f"tile count {len(offs)} does not cover "
                    f"{down}x{across} grid"
                )
            r = np.zeros((height, width, nsamp), dtype=dt)
            for idx, (o, c) in enumerate(zip(offs, cnts)):
                tile = decode_chunk(data[o : o + c], tl, tw, nsamp)
                ty, tx = divmod(idx, across)
                y0, x0 = ty * tl, tx * tw
                ph = min(tl, height - y0)
                pw = min(tw, width - x0)
                r[y0 : y0 + ph, x0 : x0 + pw] = tile[:ph, :pw]
            return r
        parts = []
        done = 0
        for o, c in zip(offs, cnts):
            rows = min(rows_per_strip, height - done)
            parts.append(decode_chunk(data[o : o + c], rows, width, nsamp))
            done += rows
        return np.concatenate(parts, axis=0)

    if planar == 2:
        # PlanarConfiguration=2: chunks grouped band-major (all of
        # sample 0's strips/tiles, then sample 1's, ...)
        per_band = len(offsets) // samples
        if per_band * samples != len(offsets):
            raise ValueError(
                f"planar chunk count {len(offsets)} not divisible by "
                f"{samples} bands"
            )
        raster = np.concatenate(
            [
                assemble(
                    offsets[b * per_band : (b + 1) * per_band],
                    counts[b * per_band : (b + 1) * per_band],
                    1,
                )
                for b in range(samples)
            ],
            axis=2,
        )
    else:
        raster = assemble(offsets, counts, samples)
    if samples == 1:
        raster = raster.reshape(height, width)

    scale = doubles(33550) or [1.0, 1.0, 0.0]
    tie = doubles(33922) or [0.0, 0.0, 0.0, 0.0, 0.0, 0.0]
    # GDAL geotransform from the GeoTIFF tags (north-up): origin at the
    # tiepoint, y decreasing. Overview levels inherit the first IFD's
    # geo tags with the pixel size scaled by the decimation factor.
    fx = fy = 1.0
    if overview > 0:
        w0 = ints(256, src=geo_tags)[0]
        h0 = ints(257, src=geo_tags)[0]
        fx, fy = w0 / width, h0 / height
    xs = tie[3] + np.arange(width) * scale[0] * fx
    ys = tie[4] - np.arange(height) * scale[1] * fy
    return raster.astype("float64"), xs, ys


def read_tiff_crs(path: str) -> int | None:
    """Extract the EPSG code from a GeoTIFF's GeoKeyDirectory (tag
    34735, GeoTIFF 1.1 §7.1): ProjectedCSTypeGeoKey (3072) wins over
    GeographicTypeGeoKey (2048); None when the file carries no
    directory or only user-defined (32767) / undefined codes. Classic
    AND BigTIFF layouts; only the first IFD is consulted (the GDAL
    convention for geo tags)."""
    import struct

    with open(path, "rb") as f:
        data = f.read(8 * 1024 * 1024)  # IFDs sit in the head region
    if data[:2] == b"II":
        e = "<"
    elif data[:2] == b"MM":
        e = ">"
    else:
        raise ValueError("not a TIFF file")
    (magic,) = struct.unpack(e + "H", data[2:4])
    if magic == 42:
        (ifd,) = struct.unpack(e + "I", data[4:8])
        count_sz, entry_sz, inline, cnt_fmt, off_fmt = 2, 12, 4, "H", "I"
    elif magic == 43:
        (ifd,) = struct.unpack(e + "Q", data[8:16])
        count_sz, entry_sz, inline, cnt_fmt, off_fmt = 8, 20, 8, "Q", "Q"
    else:
        raise ValueError(f"not a TIFF file (version {magic})")
    (n,) = struct.unpack(e + cnt_fmt, data[ifd : ifd + count_sz])
    for i in range(n):
        off = ifd + count_sz + i * entry_sz
        tag, typ = struct.unpack(e + "HH", data[off : off + 4])
        if tag != 34735:
            continue
        (cnt,) = struct.unpack(
            e + (cnt_fmt if magic == 43 else "I"),
            data[off + 4 : off + 4 + (8 if magic == 43 else 4)],
        )
        size = 2 * cnt
        val_at = off + entry_sz - inline
        if size <= inline:
            raw = data[val_at : val_at + size]
        else:
            (ext,) = struct.unpack(
                e + off_fmt, data[val_at : val_at + inline]
            )
            raw = data[ext : ext + size]
        shorts = struct.unpack(e + "H" * cnt, raw)
        n_keys = shorts[3]
        found: dict[int, int] = {}
        for k in range(n_keys):
            key_id, loc, _c, val = shorts[4 + 4 * k : 8 + 4 * k]
            if loc == 0 and key_id in (2048, 3072):
                found[key_id] = val
        for key in (3072, 2048):  # projected CS wins
            code = found.get(key)
            if code and code != 32767:
                return int(code)
        return None
    return None


def read_geotiff(
    spark: SparkSession, path: str, value_col: str = "value",
    overview: int = 0,
):
    """GeoTIFF/COG → long-form (x, y, value) (reference S6,
    `io_managers.py:108-110`). ``overview=k`` reads the k-th reduced
    level of a COG's IFD chain instead of full resolution.

    Prefers rasterio (full GDAL format coverage); without it, falls
    back to :func:`read_tiff_minimal` for uncompressed strip/tiled
    single- or multi-band files — which keeps this reader genuinely
    runnable (and tested end-to-end) in codec-free environments."""
    try:
        import rasterio
        if overview > 0:  # pragma: no cover - env without codecs
            raise NotImplementedError(
                "overview reads via rasterio: use "
                "rasterio.open(..., OVERVIEW_LEVEL=k-1)"
            )
    except ImportError:
        arr, xs, ys = read_tiff_minimal(path, overview=overview)
        if arr.ndim == 3:  # multi-band: one row per (band, y, x)
            return grid_to_long_form(
                spark,
                np.moveaxis(arr, 2, 0),
                {
                    "band": np.arange(1, arr.shape[2] + 1, dtype="float64"),
                    "y": ys,
                    "x": xs,
                },
                value_col=value_col,
            )
        return grid_to_long_form(
            spark, arr, {"y": ys, "x": xs}, value_col=value_col
        )
    with rasterio.open(path) as src:  # pragma: no cover
        arr = src.read(1).astype("float64")
        xs = np.arange(src.width) * src.transform.a + src.transform.c
        ys = np.arange(src.height) * src.transform.e + src.transform.f
    return grid_to_long_form(  # pragma: no cover
        spark, arr, {"y": ys, "x": xs}, value_col=value_col
    )


def _zarr_filter_decode(raw: bytes, cfg: dict) -> bytes:
    """Invert one numcodecs filter (public codec spec): ``delta``
    (stored as first value + successive differences in ``astype``,
    decoded by cumulative sum back to ``dtype``) and ``shuffle``
    (byte transposition grouping the i-th byte of every element)."""
    if cfg["id"] == "delta":
        astype = np.dtype(cfg.get("astype") or cfg["dtype"])
        enc = np.frombuffer(raw, dtype=astype)
        return np.cumsum(enc, dtype=np.dtype(cfg["dtype"])).tobytes()
    if cfg["id"] == "shuffle":
        es = int(cfg["elementsize"])
        if es <= 1:
            return raw
        arr = np.frombuffer(raw, dtype="u1").reshape(es, -1)
        return arr.T.tobytes()
    raise NotImplementedError(cfg["id"])  # pragma: no cover - pre-checked


_CRC32C_TABLE: np.ndarray | None = None


def _crc32c(data: bytes) -> int:
    """CRC-32C (Castagnoli) — the checksum Zarr v3's ``crc32c`` index
    codec appends. Table-driven, vectorized over numpy; stdlib
    ``zlib.crc32`` uses the other polynomial so can't be reused."""
    global _CRC32C_TABLE
    if _CRC32C_TABLE is None:
        poly = np.uint32(0x82F63B78)  # reflected Castagnoli
        table = np.arange(256, dtype=np.uint32)
        for _ in range(8):
            table = np.where(
                table & 1, (table >> 1) ^ poly, table >> 1
            ).astype(np.uint32)
        _CRC32C_TABLE = table
    crc = 0xFFFFFFFF
    for b in np.frombuffer(data, dtype="u1"):
        crc = (crc >> 8) ^ int(_CRC32C_TABLE[(crc ^ int(b)) & 0xFF])
    return crc ^ 0xFFFFFFFF


# Zarr v3 data_type names -> numpy dtypes (little-endian via the
# `bytes` codec's endian configuration).
_ZARR3_DTYPES = {
    "bool": "?", "int8": "i1", "int16": "i2", "int32": "i4", "int64": "i8",
    "uint8": "u1", "uint16": "u2", "uint32": "u4", "uint64": "u8",
    "float32": "f4", "float64": "f8",
}


def _parse_v3_codecs(codecs) -> tuple[str, str | None, list[int] | None]:
    """A Zarr v3 array→bytes codec chain → (endianness, compression
    name or None, transpose permutation or None). Anything beyond
    ``transpose`` + ``bytes`` + optional ``gzip``/``zstd`` raises with
    a pointer to the zarr-python path."""
    endian = "<"
    comp: str | None = None
    perm: list[int] | None = None
    for codec in codecs or [{"name": "bytes"}]:
        name = codec.get("name")
        if name == "bytes":
            cfg = codec.get("configuration") or {}
            endian = ">" if cfg.get("endian") == "big" else "<"
        elif name in ("gzip", "zstd"):
            if comp is not None:
                # spec-legal chains may stack bytes->bytes codecs; one
                # compression stage is all we decode — keep the honest
                # gate instead of silently applying only the last
                raise NotImplementedError(
                    f"Zarr v3 codec chain with multiple compression "
                    f"stages ({comp!r} then {name!r}): use the zarr "
                    "library path"
                )
            comp = name
        elif name == "transpose":
            perm = list((codec.get("configuration") or {})["order"])
        else:
            raise NotImplementedError(
                f"Zarr v3 codec {name!r}: use the zarr library path"
            )
    return endian, comp, perm


def _read_zarr3_minimal(path: str, meta: dict):
    """Zarr v3 array reader (`zarr.json` metadata): regular chunk
    grid, default or v2 chunk-key encoding, ``transpose`` + ``bytes``
    (+ optional ``gzip``) codec chains, and the ``sharding_indexed``
    storage
    transformer (shard files holding many inner chunks with a
    crc32c-checked binary index — the layout that keeps object-store
    key counts sane at scale). ``zstd`` decodes via pyarrow's bundled
    C codec; other codecs raise with a pointer to the zarr-python
    path."""
    import gzip
    import itertools
    import json  # noqa: F401  (symmetry with the v2 reader)
    import math
    import os

    if meta.get("node_type") != "array":
        raise ValueError(f"not a Zarr v3 array node: {meta.get('node_type')}")
    shape = meta["shape"]
    if meta["chunk_grid"]["name"] != "regular":
        raise NotImplementedError(
            f"Zarr v3 chunk grid {meta['chunk_grid']['name']!r}: use the "
            "zarr library path"
        )
    chunks = meta["chunk_grid"]["configuration"]["chunk_shape"]
    dt_name = meta["data_type"]
    if dt_name not in _ZARR3_DTYPES:
        raise NotImplementedError(f"Zarr v3 data_type {dt_name!r}")
    codecs = meta.get("codecs", [{"name": "bytes"}])
    shard = None
    if codecs and codecs[0].get("name") == "sharding_indexed":
        if len(codecs) > 1:
            raise NotImplementedError(
                "codecs after sharding_indexed: use the zarr library path"
            )
        cfg = codecs[0].get("configuration") or {}
        inner = cfg["chunk_shape"]
        if any(c % i for c, i in zip(chunks, inner)):
            raise ValueError(
                f"inner chunk shape {inner} does not divide shard "
                f"shape {chunks}"
            )
        index_names = [
            c.get("name") for c in cfg.get("index_codecs")
            or [{"name": "bytes"}, {"name": "crc32c"}]
        ]
        if index_names not in (["bytes"], ["bytes", "crc32c"]):
            raise NotImplementedError(
                f"shard index codecs {index_names}: use the zarr "
                "library path"
            )
        shard = {
            "inner": inner,
            "checksum": index_names[-1] == "crc32c",
            "location": cfg.get("index_location", "end"),
        }
        endian, v3_comp, perm = _parse_v3_codecs(cfg.get("codecs"))
    else:
        endian, v3_comp, perm = _parse_v3_codecs(codecs)
    dtype = np.dtype(endian + _ZARR3_DTYPES[dt_name])

    key_enc = meta.get("chunk_key_encoding", {"name": "default"})
    sep = (key_enc.get("configuration") or {}).get("separator") or (
        "/" if key_enc["name"] == "default" else "."
    )

    def chunk_key(idx) -> str:
        parts = map(str, idx)
        if key_enc["name"] == "default":
            return sep.join(["c", *parts])
        if key_enc["name"] == "v2":
            return sep.join(parts)
        raise NotImplementedError(
            f"chunk key encoding {key_enc['name']!r}"
        )

    fill = meta.get("fill_value")
    out = np.full(shape, fill if fill is not None else 0, dtype=dtype)

    zstd_codec = None
    if v3_comp == "zstd":
        # resolve once per array, not per chunk/block
        from data_pipelines_spark.sources.blosc import _arrow_codec

        zstd_codec = _arrow_codec("zstd")
        if zstd_codec is None:
            raise NotImplementedError(
                "Zarr v3 zstd: pyarrow build without zstd — use "
                "the zarr library path"
            )

    def decode_block(raw: bytes, chunk_shape, origin) -> None:
        if v3_comp == "gzip":
            raw = gzip.decompress(raw)
        elif v3_comp == "zstd":
            raw = bytes(
                zstd_codec.decompress(
                    raw, int(np.prod(chunk_shape)) * dtype.itemsize
                )
            )
        if perm is not None:
            # transpose codec: the stored bytes are the chunk permuted
            # by `order` in C layout; invert with argsort(order)
            stored = [chunk_shape[p] for p in perm]
            inv = np.argsort(perm)
            block = (
                np.frombuffer(raw, dtype=dtype)
                .reshape(stored)
                .transpose(inv)
            )
        else:
            block = np.frombuffer(raw, dtype=dtype).reshape(chunk_shape)
        dest = tuple(
            slice(o, min(o + c, s))
            for o, c, s in zip(origin, chunk_shape, shape)
        )
        out[dest] = block[tuple(slice(0, d.stop - d.start) for d in dest)]

    grid = [math.ceil(s / c) for s, c in zip(shape, chunks)]
    for idx in itertools.product(*[range(g) for g in grid]):
        fp = os.path.join(path, *chunk_key(idx).split("/"))
        if not os.path.exists(fp):
            continue  # missing chunk/shard = fill_value
        with open(fp, "rb") as f:
            raw = f.read()
        if shard is None:
            decode_block(raw, chunks, [i * c for i, c in zip(idx, chunks)])
            continue
        # sharding_indexed: the file is many inner chunks plus a
        # binary index of (offset, nbytes) uint64 pairs in row-major
        # inner-coordinate order, crc32c-checksummed, at the end (or
        # start) of the shard.
        inner = shard["inner"]
        counts = [c // i for c, i in zip(chunks, inner)]
        n_inner = math.prod(counts)
        idx_len = n_inner * 16 + (4 if shard["checksum"] else 0)
        if len(raw) < idx_len:
            raise ValueError(
                f"shard {fp} shorter ({len(raw)}) than its index "
                f"({idx_len})"
            )
        index = (
            raw[-idx_len:] if shard["location"] == "end"
            else raw[:idx_len]
        )
        if shard["checksum"]:
            stored = int.from_bytes(index[-4:], "little")
            if _crc32c(index[:-4]) != stored:
                raise ValueError(f"shard index crc32c mismatch in {fp}")
            index = index[:-4]
        table = np.frombuffer(index, dtype="<u8").reshape(n_inner, 2)
        missing = np.uint64(0xFFFFFFFFFFFFFFFF)
        for pos, inner_idx in enumerate(
            itertools.product(*[range(g) for g in counts])
        ):
            off, nbytes = table[pos]
            if off == missing and nbytes == missing:
                continue  # missing inner chunk = fill_value
            origin = [
                i * c + j * ic
                for i, c, j, ic in zip(idx, chunks, inner_idx, inner)
            ]
            decode_block(
                raw[int(off) : int(off) + int(nbytes)], inner, origin
            )

    attrs = dict(meta.get("attributes") or {})
    if "dimension_names" in meta and "_ARRAY_DIMENSIONS" not in attrs:
        attrs["_ARRAY_DIMENSIONS"] = meta["dimension_names"]
    return out, attrs


def read_zarr_minimal(path: str):
    """Minimal Zarr array reader — no libraries, v2 AND v3.

    Zarr is a public spec of JSON metadata plus flat chunk files, so
    the common profiles need no library. v2 (``.zarray``): C- or
    F-order chunks, raw / zlib / gzip / bz2 / lzma / blosc / zstd
    compression (stdlib + `sources.blosc` + pyarrow's bundled zstd;
    blosclz raises with a pointer to the zarr-python path), the
    ``delta`` and ``shuffle`` numcodecs filters (other filters raise
    likewise), missing chunks filled with ``fill_value``. v3
    (``zarr.json``): regular chunk grids, default/v2 chunk-key
    encodings, ``bytes`` + optional ``gzip``/``zstd`` codecs. Returns (ndarray, attrs); dimension names appear
    under ``_ARRAY_DIMENSIONS`` either way (xarray's v2 convention, or
    v3's first-class ``dimension_names``).

    Scale shape: this reads ONE array — the per-task kernel. A 100 TB
    store is ingested chunk-parallel (one task per chunk range via
    `operators/taskmap.py`, each writing a parquet partition), never
    through a single driver-side read.
    """
    import gzip
    import itertools
    import json
    import math
    import os
    import zlib

    v3_meta = os.path.join(path, "zarr.json")
    if not os.path.exists(os.path.join(path, ".zarray")) and os.path.exists(
        v3_meta
    ):
        with open(v3_meta) as f:
            return _read_zarr3_minimal(path, json.load(f))

    with open(os.path.join(path, ".zarray")) as f:
        meta = json.load(f)
    if meta.get("zarr_format") != 2:
        raise NotImplementedError("only Zarr v2/v3 stores decode natively")
    order = meta.get("order", "C")
    if order not in ("C", "F"):
        raise ValueError(f"bad Zarr chunk order {order!r}")
    filters = meta.get("filters") or []
    for f_cfg in filters:
        if f_cfg.get("id") not in ("delta", "shuffle"):
            raise NotImplementedError(
                f"Zarr filter {f_cfg.get('id')!r}: use the zarr library path"
            )
    comp = meta.get("compressor")
    comp_id = comp["id"] if comp else None
    if comp_id not in (None, "zlib", "gzip", "bz2", "lzma", "blosc", "zstd"):
        raise NotImplementedError(
            f"Zarr compressor {comp_id!r}: use the zarr library path"
        )
    zstd_codec = None
    if comp_id == "zstd":
        # resolve once per array, not per chunk
        from data_pipelines_spark.sources.blosc import _arrow_codec

        zstd_codec = _arrow_codec("zstd")
        if zstd_codec is None:
            raise NotImplementedError(
                "Zarr zstd: pyarrow build without zstd — use the "
                "zarr library path"
            )

    shape, chunks = meta["shape"], meta["chunks"]
    dtype = np.dtype(meta["dtype"])
    fill = meta.get("fill_value")
    out = np.full(shape, fill if fill is not None else 0, dtype=dtype)
    sep = meta.get("dimension_separator", ".")
    grid = [math.ceil(s / c) for s, c in zip(shape, chunks)]
    for idx in itertools.product(*[range(g) for g in grid]):
        fp = os.path.join(path, sep.join(map(str, idx)))
        if not os.path.exists(fp):
            continue  # missing chunk = fill_value
        with open(fp, "rb") as f:
            raw = f.read()
        if comp_id == "blosc":
            # self-describing frame (cname/shuffle ride the header);
            # lz4/zlib decode natively, zstd/snappy via pyarrow's
            # bundled C codecs, blosclz gates inside
            from data_pipelines_spark.sources.blosc import blosc_decompress

            raw = blosc_decompress(raw)
        elif comp_id == "zstd":
            # numcodecs Zstd: one standard zstd frame per chunk; v2
            # chunks are always full-size so the length is known
            raw = bytes(
                zstd_codec.decompress(
                    raw, int(np.prod(chunks)) * dtype.itemsize
                )
            )
        elif comp_id == "zlib":
            raw = zlib.decompress(raw)
        elif comp_id == "gzip":
            raw = gzip.decompress(raw)
        elif comp_id == "bz2":
            import bz2

            raw = bz2.decompress(raw)
        elif comp_id == "lzma":
            import lzma

            # numcodecs LZMA config: format defaults to FORMAT_XZ (1);
            # FORMAT_RAW payloads need the filter chain passed through.
            raw = lzma.decompress(
                raw,
                format=comp.get("format") or lzma.FORMAT_XZ,
                filters=comp.get("filters"),
            )
        for f_cfg in reversed(filters):
            raw = _zarr_filter_decode(raw, f_cfg)
        block = np.frombuffer(raw, dtype=dtype).reshape(chunks, order=order)
        dest = tuple(
            slice(i * c, min((i + 1) * c, s))
            for i, c, s in zip(idx, chunks, shape)
        )
        out[dest] = block[tuple(slice(0, d.stop - d.start) for d in dest)]

    attrs = {}
    zattrs = os.path.join(path, ".zattrs")
    if os.path.exists(zattrs):
        with open(zattrs) as f:
            attrs = json.load(f)
    return out, attrs


def read_zarr_grid(
    spark: SparkSession, store: str, value_var: str
):
    """Zarr store → long-form (reference S7: the reference materializes
    its global grids as Zarr groups; `io_managers.py:117-160`).

    Reads the value array plus the coordinate arrays named by xarray's
    ``_ARRAY_DIMENSIONS`` attribute (falling back to positional
    ``dim_i`` indices), all via :func:`read_zarr_minimal` — runnable
    and tested with no zarr/xarray installed.
    """
    import os

    values, attrs = read_zarr_minimal(os.path.join(store, value_var))
    dim_names = attrs.get(
        "_ARRAY_DIMENSIONS", [f"dim_{i}" for i in range(values.ndim)]
    )
    coords = {}
    for i, d in enumerate(dim_names):
        cdir = os.path.join(store, d)
        if os.path.isdir(cdir):
            carr, _ = read_zarr_minimal(cdir)
            coords[d] = carr.astype("float64")
        else:
            coords[d] = np.arange(values.shape[i], dtype="float64")
    return grid_to_long_form(
        spark, values.astype("float64"), coords, value_col=value_var
    )


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    mode: str = "overwrite",
    files_per_partition: int | None = None,
    max_records_per_file: int | None = None,
) -> None:
    """Hive-style partitioned parquet sink (reference D4/S3: per-
    partition-key independent materialization, `partitions.py:3-53`).
    Readers filtering on the partition columns get partition pruning.

    The scale hazard of a naive ``partitionBy`` write is the
    small-files problem: every one of N upstream tasks opens a writer
    for every hive partition it touches, so a 2000-task stage writing
    365 date partitions can emit ~730k tiny files — each a namenode
    entry and a scan-time open. ``files_per_partition`` shuffles rows
    so each hive partition is written by exactly that many tasks
    (1 → one file per partition): for 1 it repartitions on the
    partition columns; for n > 1 it adds a content-derived
    ``pmod(xxhash64(all columns), n)`` sub-key — deterministic under
    task retry, unlike a round-robin split. ``max_records_per_file``
    caps rows per file so one giant hive partition (skew) still splits
    into bounded files instead of a single monolith; use both together
    for "few files, none huge".
    """
    if files_per_partition is not None:
        if files_per_partition < 1:
            raise ValueError(
                f"files_per_partition must be >= 1, got {files_per_partition}"
            )
        if files_per_partition == 1:
            df = df.repartition(*partition_cols)
        else:
            salt = F.pmod(
                F.xxhash64(*[F.col(c) for c in df.columns]),
                F.lit(files_per_partition),
            )
            df = df.withColumn("__file_no", salt).repartition(
                *partition_cols, "__file_no"
            ).drop("__file_no")
    writer = df.write.mode(mode)
    if max_records_per_file is not None:
        writer = writer.option("maxRecordsPerFile", int(max_records_per_file))
    writer.partitionBy(*partition_cols).parquet(path)
