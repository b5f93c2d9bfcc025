"""Tile pyramid tests: warp correctness vs direct numpy, pyramid
reduce invariants, resume anti-join."""

import numpy as np
import pytest

from gdal_spark.cellindex.tile import (
    lonlat_to_tile,
    meters_to_lonlat,
    resolution,
    tile_bounds_3857,
)
from gdal_spark.portable import TILE_SIZE
from gdal_spark.raster import model
from gdal_spark.raster import tile as RT

Z = 8


@pytest.fixture(scope="module")
def band1(spark):
    return model.synth_blocks(spark, model.grad100_spec()).where("band = 1")


@pytest.fixture(scope="module")
def base(spark, band1):
    df = RT.base_tiles(band1, Z, resampling="nearest")
    return {(r.tile_x, r.tile_y): r for r in df.collect()}


def _expected_tile(tx, ty):
    """Direct numpy warp of the analytic grid for one tile (independent
    reimplementation of the sampling chain)."""
    spec = model.grad100_spec()
    g = model.value_grid(0, 0, 100, 100, 1).astype(np.float64)
    minx, miny, maxx, maxy = tile_bounds_3857(np.array([tx]), np.array([ty]), Z)
    res = resolution(Z)
    px = minx[0] + (np.arange(TILE_SIZE) + 0.5) * res
    py = maxy[0] - (np.arange(TILE_SIZE) + 0.5) * res
    lon, lat = meters_to_lonlat(
        np.repeat(px[None, :], TILE_SIZE, 0), np.repeat(py[:, None], TILE_SIZE, 1)
    )
    sx = (lon - spec.gt[0]) / spec.gt[1] - 0.5
    sy = (lat - spec.gt[3]) / spec.gt[5] - 0.5
    ix = np.clip(np.round(sx).astype(int), 0, 99)
    iy = np.clip(np.round(sy).astype(int), 0, 99)
    out = g[iy, ix]
    valid = (sx >= -0.5) & (sx <= 99.5) & (sy >= -0.5) & (sy <= 99.5)
    return np.where(valid, out, 0.0).astype(np.uint8)


def test_tile_cover(base):
    spec = model.grad100_spec()
    minx, miny, maxx, maxy = spec.extent()
    tx0, ty0 = lonlat_to_tile(np.array([minx]), np.array([maxy]), Z)
    tx1, ty1 = lonlat_to_tile(np.array([maxx]), np.array([miny]), Z)
    keys = set(base)
    for ty in range(int(ty0[0]), int(ty1[0]) + 1):
        for tx in range(int(tx0[0]), int(tx1[0]) + 1):
            assert (tx, ty) in keys


def test_tile_values_match_direct_warp(base):
    # the tile containing the raster center
    spec = model.grad100_spec()
    clon = spec.gt[0] + 50 * spec.gt[1]
    clat = spec.gt[3] + 50 * spec.gt[5]
    tx, ty = lonlat_to_tile(np.array([clon]), np.array([clat]), Z)
    tx, ty = int(tx[0]), int(ty[0])
    r = base[(tx, ty)]
    got = model.decode((r.buf, TILE_SIZE, TILE_SIZE, r.dtype))
    want = _expected_tile(tx, ty)
    assert np.array_equal(got, want)
    assert r.checksum == RT._tile_checksum(want)


def test_bilinear_within_range(spark, band1):
    df = RT.base_tiles(band1, Z, resampling="bilinear")
    rows = df.collect()
    assert rows
    for r in rows:
        a = model.decode((r.buf, TILE_SIZE, TILE_SIZE, r.dtype))
        assert a.min() >= 0 and a.max() <= 255


def test_pyramid_parent_is_child_average(spark, band1):
    pyr = RT.tile_pyramid(band1, z_base=Z, z_min=Z - 1, resampling="nearest")
    rows = pyr.collect()
    by_z = {}
    for r in rows:
        by_z.setdefault(r.z, {})[(r.tile_x, r.tile_y)] = r
    assert set(by_z) == {Z, Z - 1}
    (ptx, pty), pr = next(iter(by_z[Z - 1].items()))
    big = np.zeros((512, 512))
    for dy in range(2):
        for dx in range(2):
            c = by_z[Z].get((2 * ptx + dx, 2 * pty + dy))
            if c is not None:
                big[dy * 256 : (dy + 1) * 256, dx * 256 : (dx + 1) * 256] = (
                    model.decode((c.buf, 256, 256, c.dtype))
                )
    want = np.clip(
        np.floor(big.reshape(256, 2, 256, 2).mean(axis=(1, 3)) + 0.5), 0, 255
    ).astype(np.uint8)
    got = model.decode((pr.buf, 256, 256, pr.dtype))
    assert np.array_equal(got, want)


def test_resume_filter(spark, band1):
    t = RT.base_tiles(band1, Z, resampling="nearest")
    all_rows = t.count()
    manifest = t.limit(3).select("band", "z", "tile_x", "tile_y")
    remaining = RT.resume_filter(t, manifest).count()
    assert remaining == all_rows - 3


def test_approx_mesh_transform_error_bound():
    """Mesh-approximated inverse transform stays within 0.05 px of the
    exact transform (GDALApproxTransformer contract, error-bounded)."""
    spec = model.grad100_spec()
    clon = spec.gt[0] + 50 * spec.gt[1]
    clat = spec.gt[3] + 50 * spec.gt[5]
    tx, ty = lonlat_to_tile(np.array([clon]), np.array([clat]), Z)
    tx, ty = int(tx[0]), int(ty[0])
    ex = RT._source_coords_exact(tx, ty, Z, *[spec.gt[i] for i in (0, 1, 3, 5)])
    ap = RT._source_coords_approx(
        tx, ty, Z, *[spec.gt[i] for i in (0, 1, 3, 5)], mesh=16
    )
    assert np.abs(ap[0] - ex[0]).max() < 0.05
    assert np.abs(ap[1] - ex[1]).max() < 0.05


def test_approx_tiles_within_reference_tolerance(spark, band1):
    """Tiles from the approx transform match exact tiles within the
    reference's own warp tolerance (maxdiff ≤ 1, autotest/alg/warp.py:49)."""
    exact = {
        (r.tile_x, r.tile_y): model.decode((r.buf, 256, 256, r.dtype))
        for r in RT.base_tiles(band1, Z, "bilinear").collect()
    }
    approx = {
        (r.tile_x, r.tile_y): model.decode((r.buf, 256, 256, r.dtype))
        for r in RT.base_tiles(band1, Z, "bilinear", approx_mesh=16).collect()
    }
    assert set(exact) == set(approx)
    for k in exact:
        diff = np.abs(
            exact[k].astype(np.int64) - approx[k].astype(np.int64)
        ).max()
        assert diff <= 1, k


def test_tile_sink_with_resume_manifest(spark, band1, tmp_path):
    """End-to-end sink: pyramid → partitioned-by-zoom parquet + lineage
    manifest → a second run writes nothing → after deleting one zoom's
    manifest rows, only that zoom is rewritten (the --resume contract
    over the checkpoint table)."""
    from gdal_spark.operators import checkpoint as CP

    path = str(tmp_path / "tiles")
    pyr = RT.tile_pyramid(band1, z_base=Z, z_min=Z - 1, resampling="nearest")
    tiles = pyr.select("band", "z", "tile_x", "tile_y", "checksum")
    rid, n = CP.resumable_write(tiles, path, ["z"])
    assert n == tiles.count() and rid is not None
    # idempotent re-run
    rid2, n2 = CP.resumable_write(tiles, path, ["z"])
    assert rid2 is None and n2 == 0
    # read back partition-pruned
    back = spark.read.parquet(path).where(f"z = {Z - 1}")
    assert back.count() == tiles.where(f"z = {Z - 1}").count()
