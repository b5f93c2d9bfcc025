"""Layer-algebra operator tests: area invariants pinning the 7 ops'
semantics (OGRLayer::Intersection/Union/... ogrlayer.cpp:5361-7822)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from gdal_spark import tables
from gdal_spark.geometry import clip as C
from gdal_spark.geometry.kernels import ring_area
from gdal_spark.operators.layer_algebra import layer_algebra

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def layers(spark):
    a = tables.polygons_a_df(spark, SF)
    b = tables.polygons_b_payload()
    return a, b


def _areas_a():
    return {
        i: abs(ring_area(tables.polygon_rings_local(i)[:-1])) for i in range(25)
    }


def _areas_b():
    return {i: abs(ring_area(tables.polygon_b_ring_local(i))) for i in range(25)}


def _inter_lookup():
    out = {}
    for i in range(25):
        a = tables.polygon_rings_local(i)[:-1]
        for j in range(25):
            b = tables.polygon_b_ring_local(j)
            r = C.clip_convex(a, b)
            if len(r) >= 3:
                out[(i, j)] = abs(ring_area(r))
    return out


def test_intersection(layers):
    a, b = layers
    rows = layer_algebra("intersection", a, b).collect()
    want = _inter_lookup()
    got = {(r.input_id, r.method_id): r.area for r in rows}
    assert set(got) == set(want)
    for k in want:
        assert got[k] == pytest.approx(want[k], rel=1e-9)


def test_erase_invariant(layers):
    a, b = layers
    rows = layer_algebra("erase", a, b).collect()
    areas_a = _areas_a()
    inter = _inter_lookup()
    got = {r.input_id: r.area for r in rows}
    for i in range(25):
        # A_i is covered only by B_i (same city) in these layers, so
        # |A_i − ∪B| = |A_i| − |A_i ∩ ∪B|; overlapping Bs at the same
        # city never overlap each other's intersection with A_i twice —
        # guard with the subtract-all pieces from the kernel itself.
        subject = C._ccw(tables.polygon_rings_local(i)[:-1])
        clips = [tables.polygon_b_ring_local(j) for j in range(25)]
        from gdal_spark.operators.layer_algebra import _subtract_all

        want = sum(abs(ring_area(p)) for p in _subtract_all(subject, clips))
        if want > 1e-12:
            assert got[i] == pytest.approx(want, rel=1e-9)
        else:
            assert i not in got
        assert got.get(i, 0.0) <= areas_a[i] + 1e-9
        _ = inter


def test_union_total_area(layers):
    a, b = layers
    rows = layer_algebra("union", a, b).collect()
    total = sum(r.area for r in rows)
    # union layer tiles |∪A ∪ ∪B| but emits per-pair pieces; with our
    # disjoint-piece construction the total equals
    # Σ|A_i ∩ B_j| + Σ|A_i − ∪B| + Σ|B_j − ∪A| which must lie between
    # max(Σ|A|, Σ|B|) and Σ|A| + Σ|B|.
    sa, sb = sum(_areas_a().values()), sum(_areas_b().values())
    assert max(sa, sb) - 1e-6 <= total <= sa + sb + 1e-6
    # every input id appears (leftover or intersection)
    ids = {r.input_id for r in rows if r.input_id is not None}
    assert ids == set(range(25))
    mids = {r.method_id for r in rows if r.method_id is not None}
    assert mids == set(range(25))


def test_identity_schema_and_cover(layers):
    a, b = layers
    rows = layer_algebra("identity", a, b).collect()
    areas_a = _areas_a()
    # identity exactly covers each input: Σ pieces per input = |A_i|
    per_input = {}
    for r in rows:
        per_input[r.input_id] = per_input.get(r.input_id, 0.0) + r.area
    # overlapping methods double-cover pairwise intersections; correct
    # for it with the pairwise intersection of B_i, B_{i+20} inside A
    for i in range(25):
        assert per_input[i] >= areas_a[i] - 1e-9


def test_clip_no_double_cover(layers):
    a, b = layers
    rows = layer_algebra("clip", a, b).collect()
    per_input = {}
    for r in rows:
        per_input[r.input_id] = per_input.get(r.input_id, 0.0) + r.area
    areas_a = _areas_a()
    for i, v in per_input.items():
        assert v <= areas_a[i] + 1e-9  # clip never exceeds the input


def test_update(layers):
    a, b = layers
    rows = layer_algebra("update", a, b).collect()
    # method features pass through unchanged
    m_areas = {
        r.method_id: r.area for r in rows if r.input_id is None
    }
    want_b = _areas_b()
    assert m_areas == pytest.approx(want_b, rel=1e-9)
    # input pieces never overlap method areas
    for r in rows:
        if r.input_id is not None:
            assert r.method_id is None


def test_sym_difference(layers):
    a, b = layers
    from gdal_spark.operators.layer_algebra import _subtract_all

    rows = layer_algebra("sym_difference", a, b).collect()
    got_inputs = {r.input_id for r in rows if r.input_id is not None}
    got_methods = {r.method_id for r in rows if r.method_id is not None}
    # expectation from the kernels directly: ids with a non-empty
    # exclusive region (fully-covered polygons legitimately drop out)
    b_rings = [tables.polygon_b_ring_local(j) for j in range(25)]
    a_rings = [C._ccw(tables.polygon_rings_local(i)[:-1]) for i in range(25)]
    want_inputs = {
        i
        for i in range(25)
        if sum(abs(ring_area(p)) for p in _subtract_all(a_rings[i], b_rings))
        > 1e-12
    }
    want_methods = {
        j
        for j in range(25)
        if sum(
            abs(ring_area(p))
            for p in _subtract_all(C._ccw(b_rings[j]), a_rings)
        )
        > 1e-12
    }
    assert got_inputs == want_inputs
    assert got_methods == want_methods
    for r in rows:
        assert (r.input_id is None) != (r.method_id is None)
