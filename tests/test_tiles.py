"""Retile-with-overlap + nodata filter + parallel COG export — the
sentinel preprocessing chain (reference `assets/sentinel/
preprocessing.py:103-199`) re-expressed relationally."""

from __future__ import annotations

import numpy as np
import pytest

from pyspark.sql import functions as F

from data_pipelines_spark.operators.tiles import (
    drop_empty_tiles,
    export_tiles_cog,
    retile_with_overlap,
)


def _pixels(spark, rows):
    return spark.createDataFrame(rows, "x long, y long, v double")


def test_overlap_membership_exact(spark):
    """Hand-checked membership: ts=10, ov=2 — a pixel within `ov` of a
    tile edge appears in both neighbors; interior pixels in one."""
    df = _pixels(spark, [(0, 0, 1.0), (8, 0, 1.0), (12, 0, 1.0), (5, 5, 1.0)])
    tiled = retile_with_overlap(df, tile_size=10, overlap=2)
    got = {
        (r.x, r.y): set()
        for r in df.collect()
    }
    for r in tiled.collect():
        got[(r.x, r.y)].add((r.tile_x, r.tile_y))
    # x=0: tile -1 covers [-12, 1] and tile 0 covers [-2, 11] -> both;
    # y=0 likewise.
    assert got[(0, 0)] == {(-1, -1), (-1, 0), (0, -1), (0, 0)}
    # x=8: tile 0 ([-2, 11]) AND tile 1's halo ([8, 21]); x=12: tile 1
    # only (12 > tile 0's 11).
    assert got[(8, 0)] == {(0, -1), (0, 0), (1, -1), (1, 0)}
    assert got[(12, 0)] == {(1, -1), (1, 0)}
    assert got[(5, 5)] == {(0, 0)}


def test_overlap_zero_is_plain_tiling(spark):
    df = _pixels(spark, [(x, y, 1.0) for x in range(-5, 5) for y in range(3)])
    tiled = retile_with_overlap(df, tile_size=5, overlap=0)
    assert tiled.count() == df.count()  # no fan-out
    tx = {r.tile_x for r in tiled.collect()}
    assert tx == {-1, 0}


def test_retile_matches_interval_definition(spark):
    """Property vs the definition: pixel in tile t iff
    t*ts - ov <= x <= (t+1)*ts - 1 + ov, brute-forced."""
    rng = np.random.default_rng(13)
    pts = [(int(x), int(y), 1.0) for x, y in rng.integers(-40, 40, (80, 2))]
    ts, ov = 16, 5
    tiled = retile_with_overlap(_pixels(spark, pts), ts, ov)
    got = {}
    for r in tiled.collect():
        got.setdefault((r.x, r.y), set()).add((r.tile_x, r.tile_y))
    for x, y, _ in pts:
        expect = {
            (tx, ty)
            for tx in range(-5, 5)
            for ty in range(-5, 5)
            if tx * ts - ov <= x <= (tx + 1) * ts - 1 + ov
            and ty * ts - ov <= y <= (ty + 1) * ts - 1 + ov
        }
        assert got[(x, y)] == expect, (x, y)


def test_drop_empty_tiles(spark):
    """A tile whose pixels are ALL nodata disappears; tiles with one
    valid pixel survive — including their nodata rows."""
    nodata = -32768.0
    rows = (
        [(x, 0, nodata) for x in range(3)]          # tile (0,0): all nodata
        + [(20, 0, nodata), (21, 0, 7.0)]           # tile (1,0): mixed
    )
    tiled = retile_with_overlap(_pixels(spark, rows), tile_size=16, overlap=0)
    kept = drop_empty_tiles(tiled, "v", nodata)
    tiles = {(r.tile_x, r.tile_y) for r in kept.collect()}
    assert tiles == {(1, 0)}
    assert kept.count() == 2  # the mixed tile keeps its nodata row too


def test_export_tiles_cog_roundtrip(spark, tmp_path):
    """Each exported tile is a real tiled+overview+DEFLATE COG whose
    pixels (incl. the overlap halo and nodata fill) read back exactly;
    the manifest's md5 matches the bytes on disk."""
    import hashlib

    from data_pipelines_spark.sources.raster import read_tiff_minimal

    ts, ov = 8, 2
    rows = [(x, y, float((x * 7 + y * 3) % 100))
            for x in range(0, 16) for y in range(0, 8)]
    tiled = retile_with_overlap(_pixels(spark, rows), ts, ov)
    man = export_tiles_cog(
        tiled, str(tmp_path), tile_size=ts, overlap=ov,
        value_col="v", nodata=-1.0, overviews=(2,), cog_tile=(4, 4),
        epsg=4326,
    ).collect()
    by_tile = {(r.tile_x, r.tile_y): r for r in man}
    assert (0, 0) in by_tile and (1, 0) in by_tile

    r = by_tile[(0, 0)]
    blob = open(r.path, "rb").read()
    assert hashlib.md5(blob).hexdigest() == r.content_md5
    from data_pipelines_spark.sources.raster import read_tiff_crs

    assert read_tiff_crs(r.path) == 4326  # GeoKeys survive the export
    arr, xs, ys = read_tiff_minimal(r.path)
    span = ts + 2 * ov
    assert arr.shape == (span, span)
    # interior pixel (x=3, y=4) -> array[y - y0, x - x0] with y0=x0=-2
    assert arr[4 + ov, 3 + ov] == float((3 * 7 + 4 * 3) % 100)
    # halo pixel from the neighbor tile (x=9 in tile 0's halo)
    assert arr[0 + ov, 9 + ov] == float((9 * 7) % 100)
    # outside the mosaic -> nodata fill
    assert arr[0, 0] == -1.0
    # overview chain present
    ov1, _, _ = read_tiff_minimal(r.path, overview=1)
    assert ov1.shape == (span // 2, span // 2)


def test_retile_validates_params(spark):
    df = _pixels(spark, [(0, 0, 1.0)])
    with pytest.raises(ValueError, match="tile_size"):
        retile_with_overlap(df, 0)
    with pytest.raises(ValueError, match="overlap"):
        retile_with_overlap(df, 8, 8)


def test_retile_plan_is_narrow(spark):
    """The explode assignment must stay a narrow map — no Exchange
    before the per-tile grouping."""
    from data_pipelines_spark.plans.audit import plan_string

    df = _pixels(spark, [(0, 0, 1.0)])
    tiled = retile_with_overlap(df, 16, 2)
    plan = plan_string(tiled)
    assert "Exchange" not in plan


def test_pyramid_levels_match_direct_grouping(spark):
    """Iterative halving must equal grouping the BASE at floor(c/2^l)
    for every level (associativity of sum), negatives included."""
    rng = np.random.default_rng(21)
    rows = [(int(x), int(y), float(v)) for x, y, v in
            zip(rng.integers(-20, 20, 60), rng.integers(-20, 20, 60),
                rng.integers(1, 100, 60))]
    from data_pipelines_spark.operators.tiles import build_pyramid

    df = _pixels(spark, rows)
    pyr = {(r.level, r.x, r.y): (r.val_sum, r.px_cnt)
           for r in build_pyramid(df, 3, value_col="v").collect()}
    import collections
    for level in range(4):
        direct = collections.defaultdict(lambda: [0.0, 0])
        for x, y, v in rows:
            k = (x >> level, y >> level)  # floor division by 2^level
            direct[k][0] += v
            direct[k][1] += 1
        for (x, y), (s, c) in direct.items():
            assert pyr[(level, x, y)] == (s, c), (level, x, y)
    # no stray keys
    assert len(pyr) == sum(
        1 for level in range(4) for _ in
        {(x >> level, y >> level) for x, y, _ in rows}
    )


def test_pyramid_validates(spark):
    from data_pipelines_spark.operators.tiles import build_pyramid

    with pytest.raises(ValueError, match="levels"):
        build_pyramid(_pixels(spark, [(0, 0, 1.0)]), -1, value_col="v")


def test_upscale_tiles_roundtrip(spark, tmp_path):
    """Manifest -> one upscale task per tile: the 2x nearest-neighbor
    stub doubles the array through real COG decode/encode, halving the
    pixel size so world extents are preserved."""
    import os

    from data_pipelines_spark.operators.tiles import upscale_tiles
    from data_pipelines_spark.sources.raster import read_tiff_minimal

    rows = [(x, y, float((x + 2 * y) % 50))
            for x in range(8) for y in range(8)]
    tiled = retile_with_overlap(_pixels(spark, rows), 8, 0)
    man = export_tiles_cog(
        tiled, str(tmp_path), tile_size=8, overlap=0,
        value_col="v", nodata=-1.0, overviews=(2,), cog_tile=(4, 4),
    )
    out_dir = str(tmp_path / "up")
    os.makedirs(out_dir)
    up = upscale_tiles(man, out_dir).collect()
    assert len(up) == 1
    src_arr, sxs, _ = read_tiff_minimal(man.first().path)
    arr, xs, ys = read_tiff_minimal(up[0].upscaled_path)
    assert arr.shape == (16, 16)
    assert np.array_equal(arr, np.repeat(np.repeat(src_arr, 2, 0), 2, 1))
    assert xs[1] - xs[0] == (sxs[1] - sxs[0]) / 2  # halved pixel size
    assert xs[0] == sxs[0]                         # same origin
