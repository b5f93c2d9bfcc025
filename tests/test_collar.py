"""clean-collar (nearblack) — both algorithms vs an in-test brute
force: directional edge scans (twopasses) and border-BFS (floodfill),
on the collar64 fixture (border + isolated lake + L-shaped bay)."""

from collections import deque

import numpy as np
import pytest

from gdal_spark.raster import collar, model

W = H = 64


@pytest.fixture(scope="module")
def near():
    full = np.stack(
        [model.collar_values(0, 0, W, H, b) for b in (1, 2, 3)]
    )
    return (np.abs(full.astype(np.int64)) <= 15).all(axis=0)


def _brute_twopasses(near):
    mask = np.zeros((H, W), bool)
    for y in range(H):
        nn = np.nonzero(~near[y])[0]
        lo, hi = (nn.min(), nn.max()) if len(nn) else (W, -1)
        mask[y, : min(lo, W)] = True
        if hi >= 0:
            mask[y, hi + 1 :] = True
        else:
            mask[y, :] = True
    for x in range(W):
        nn = np.nonzero(~near[:, x])[0]
        lo, hi = (nn.min(), nn.max()) if len(nn) else (H, -1)
        mask[: min(lo, H), x] = True
        if hi >= 0:
            mask[hi + 1 :, x] = True
        else:
            mask[:, x] = True
    return mask


def _brute_floodfill(near):
    mask = np.zeros((H, W), bool)
    dq = deque()
    for x in range(W):
        for y in (0, H - 1):
            if near[y, x] and not mask[y, x]:
                mask[y, x] = True
                dq.append((y, x))
    for y in range(H):
        for x in (0, W - 1):
            if near[y, x] and not mask[y, x]:
                mask[y, x] = True
                dq.append((y, x))
    while dq:
        y, x = dq.popleft()
        for dy, dx in ((1, 0), (-1, 0), (0, 1), (0, -1)):
            ny, nx = y + dy, x + dx
            if 0 <= ny < H and 0 <= nx < W and near[ny, nx] and not mask[ny, nx]:
                mask[ny, nx] = True
                dq.append((ny, nx))
    return mask


def _engine_mask(spark, algorithm):
    blocks = model.synth_blocks(spark, model.collar64_spec())
    out = collar.clean_collar(blocks, W, H, algorithm=algorithm)
    rows = out.where("band = 0").collect()
    m = np.zeros((H, W), bool)
    for r in rows:
        a = model.decode((r.buf, r.height, r.width, r.dtype))
        m[r.y0 : r.y0 + r.height, r.x0 : r.x0 + r.width] = a == 0
    return m


def test_twopasses_matches_bruteforce(spark, near):
    assert np.array_equal(_engine_mask(spark, "twopasses"), _brute_twopasses(near))


def test_floodfill_matches_bruteforce(spark, near):
    assert np.array_equal(_engine_mask(spark, "floodfill"), _brute_floodfill(near))


def test_algorithm_difference_is_the_bay(spark, near):
    """The L-shaped bay (pocket reachable only around a corner) is
    exactly the floodfill-minus-twopasses difference; the isolated
    lake survives both (nearblack only removes edge-connected
    collar)."""
    m2 = _brute_twopasses(near)
    mf = _brute_floodfill(near)
    assert mf[25, 38] and not m2[25, 38]  # pocket interior
    assert not mf[32, 22] and not m2[32, 22]  # lake interior
    assert (mf & ~m2).sum() > 0 and (m2 & ~mf).sum() == 0


def test_collar_pixels_replaced_with_color(spark):
    blocks = model.synth_blocks(spark, model.collar64_spec())
    out = collar.clean_collar(blocks, W, H, algorithm="twopasses")
    rows = out.where("band = 1 and bx = 0 and by = 0").collect()
    r = rows[0]
    a = model.decode((r.buf, r.height, r.width, r.dtype))
    # top-left corner is always border collar -> replaced with 0
    assert a[0, 0] == 0 and a[1, 0] == 0


def test_bad_algorithm_raises(spark):
    blocks = model.synth_blocks(spark, model.collar64_spec())
    with pytest.raises(ValueError):
        collar.clean_collar(blocks, W, H, algorithm="threepasses")
