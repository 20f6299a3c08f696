"""GRIB .idx sidecar + selective byte-range reads
(`sources/gribidx.py`): index build/parse round-trips for both
editions, the public wgrib2 line format, and the selective reader's
parity + bytes-touched bound against a full read."""

import numpy as np
import pytest

from data_pipelines_spark.sources.gribidx import (
    build_grib_index,
    grib_message_ranges,
    parse_grib_index,
    read_grib_selective,
)
from data_pipelines_spark.sources.raster import read_grib_minimal
from data_pipelines_spark.sources.raster_encode import (
    encode_grib1,
    encode_grib2,
)

GRID = {"lat0": 50.0, "lon0": 10.0, "dlat": 0.5, "dlon": 0.5}


def _ensemble(n, nj=6, ni=8, seed=3):
    rng = np.random.default_rng(seed)
    return [
        (m, np.round(rng.uniform(0, 40, (nj, ni)), 1)) for m in range(n)
    ]


def _write(tmp_path, name, data: bytes) -> str:
    p = str(tmp_path / name)
    with open(p, "wb") as f:
        f.write(data)
    return p


def test_message_ranges_and_index_round_trip(tmp_path):
    msgs = _ensemble(10)
    path = _write(tmp_path, "ens.grib2", encode_grib2(msgs, **GRID))
    with open(path, "rb") as f:
        data = f.read()
    ranges = grib_message_ranges(data)
    assert len(ranges) == 10
    assert ranges[0][0] == 0
    assert sum(ln for _, ln in ranges) == len(data)
    # contiguous coverage
    for (o1, l1), (o2, _) in zip(ranges, ranges[1:]):
        assert o1 + l1 == o2

    idx = build_grib_index(path)
    entries = parse_grib_index(idx, file_size=len(data))
    assert [(e["offset"], e["length"]) for e in entries] == ranges
    assert [e["msg"] for e in entries] == list(range(1, 11))
    # ensemble members surface as the wgrib2 ENS= extra field
    assert [e["member"] for e in entries] == list(range(10))
    # date field comes from the identification section
    assert all(e["date"].startswith("d=") for e in entries)
    # truncated file raises loudly
    with pytest.raises(ValueError, match="overruns"):
        grib_message_ranges(data[:-10])


def test_parse_public_wgrib2_lines():
    """The exact line shapes NOMADS publishes (wgrib2 docs examples)
    parse: offsets, field split, ENS extras with the '+' sign."""
    text = (
        "1:0:d=2021092800:PRMSL:mean sea level:anl:\n"
        "2:515:d=2021092800:TMP:2 m above ground:anl:\n"
        "3:1202:d=2021092800:UGRD:10 m above ground:6 hour fcst:ENS=+3:\n"
    )
    rows = parse_grib_index(text, file_size=2000)
    assert [r["offset"] for r in rows] == [0, 515, 1202]
    assert [r["length"] for r in rows] == [515, 687, 798]
    assert rows[0]["var"] == "PRMSL" and rows[0]["level"] == "mean sea level"
    assert rows[2]["forecast"] == "6 hour fcst" and rows[2]["member"] == 3


def test_selective_read_parity_and_bytes_bound(spark, tmp_path):
    """Selecting 2 of 10 ensemble members must equal the full read
    filtered to those members, touching well under the full file."""
    msgs = _ensemble(10)
    data = encode_grib2(msgs, **GRID)
    path = _write(tmp_path, "ens.grib2", data)
    with open(path + ".idx", "w") as f:
        f.write(build_grib_index(path))

    out = read_grib_selective(
        spark, [path], select=lambda e: e["member"] in (3, 7)
    ).toPandas()
    assert sorted(out["member"].unique()) == [3, 7]
    # parity vs the FULL read filtered to the same members (same codec
    # quantization on both sides — the selective contract)
    full = {
        m.get("member"): v for m, v, _, _ in read_grib_minimal(path)
    }
    for member in (3, 7):
        got = (
            out[out["member"] == member]
            .sort_values(
                ["latitude", "longitude"], ascending=[False, True]
            )["value"]
            .to_numpy()
            .reshape(full[member].shape)
        )
        np.testing.assert_array_equal(got, full[member])
    # bytes-touched bound: exactly the two selected messages
    touched = out.groupby("msg")["msg_length"].first().sum()
    assert touched < 0.35 * len(data)
    # provenance offsets line up with the real ranges
    ranges = dict(
        (i + 1, r) for i, r in enumerate(grib_message_ranges(data))
    )
    for msg_no, grp in out.groupby("msg"):
        off, ln = ranges[msg_no]
        assert (grp["msg_offset"] == off).all()
        assert (grp["msg_length"] == ln).all()


def test_selective_read_grib1_and_no_sidecar(spark, tmp_path):
    """Edition 1 files select by member too, and a missing sidecar
    falls back to scanning the local file."""
    msgs = _ensemble(4, seed=9)
    path = _write(tmp_path, "ens.grib1", encode_grib1(msgs, **GRID))
    out = read_grib_selective(
        spark, [path], select=lambda e: e["member"] == 2
    ).toPandas()
    assert sorted(out["member"].unique()) == [2]
    full = read_grib_minimal(path)
    want = next(v for m, v, _, _ in full if m.get("member") == 2)
    got = (
        out.sort_values(["latitude", "longitude"], ascending=[False, True])
        ["value"].to_numpy().reshape(want.shape)
    )
    np.testing.assert_allclose(got, want, atol=2e-3)


def test_selective_read_empty_selection(spark, tmp_path):
    path = _write(
        tmp_path, "e.grib2", encode_grib2(_ensemble(2), **GRID)
    )
    out = read_grib_selective(spark, [path], select=lambda e: False)
    assert out.count() == 0
    assert out.columns[0] == "grib_file"
