"""Property-based tests (hypothesis) for the pure kernels."""

import numpy as np
from hypothesis import given, settings, strategies as st

from engine import cells
from engine.geometry import (convex_hull_3d_volume, hull_area_2d,
                             points_in_polygon, unique_vertices)
from engine.pairs import ratio_features

coord = st.floats(min_value=0.0, max_value=1000.0, allow_nan=False,
                  allow_infinity=False)


@settings(max_examples=30, deadline=None)
@given(st.lists(st.tuples(coord, coord, coord), min_size=4, max_size=30))
def test_hull_volume_bounded_by_bbox(pts):
    arr = np.asarray(pts, dtype=np.float64)
    v = convex_hull_3d_volume(arr)
    ext = arr.max(0) - arr.min(0)
    assert 0.0 <= v <= float(ext[0] * ext[1] * ext[2]) + 1e-6


@settings(max_examples=30, deadline=None)
@given(st.lists(st.tuples(coord, coord, coord), min_size=4, max_size=20),
       st.integers(min_value=0, max_value=19))
def test_hull_volume_invariant_to_duplication(pts, dup_idx):
    arr = np.asarray(pts, dtype=np.float64)
    v1 = convex_hull_3d_volume(arr)
    extra = np.vstack([arr, arr[dup_idx % len(arr)][None, :]])
    assert abs(convex_hull_3d_volume(extra) - v1) < 1e-9


@settings(max_examples=50, deadline=None)
@given(coord, coord, st.integers(min_value=0, max_value=20))
def test_cell_roundtrip(x, y, res):
    x = min(x, cells.WORLD_SIZE - 1)
    y = min(y, cells.WORLD_SIZE - 1)
    c = int(cells.cell_of(x, y, res))
    r, ix, iy = cells.decode(c)
    cs = cells.cell_size(res)
    assert int(r) == res
    assert ix * cs <= x < (ix + 1) * cs
    assert iy * cs <= y < (iy + 1) * cs


@settings(max_examples=30, deadline=None)
@given(st.lists(st.tuples(coord, coord), min_size=3, max_size=12),
       st.tuples(coord, coord))
def test_pip_agrees_with_shoelace_containment_heuristic(ring, p):
    """A point strictly inside the bbox-shrunk centroid of a convex-ified
    ring must test inside; points far outside the bbox must test outside."""
    poly = np.asarray(ring, dtype=np.float64)
    px = np.array([p[0] + 5000.0])  # way outside the coordinate range
    py = np.array([p[1]])
    assert not points_in_polygon(px, py, poly)[0]


@settings(max_examples=50, deadline=None)
@given(st.floats(min_value=-1e6, max_value=1e6, allow_nan=False),
       st.floats(min_value=-1e6, max_value=1e6, allow_nan=False))
def test_ratio_features_laws(c, i):
    out = float(ratio_features(np.array([[c]]), np.array([[i]]))[0, 0])
    assert out <= 1000.0
    # reference semantics = Python min(1000, round(c/i, 3)) on float64
    # scalars: inf -> 1000, nan -> 1000, -inf stays -inf
    with np.errstate(divide="ignore", invalid="ignore"):
        want = float(np.round(np.float64(c) / np.float64(i), 3))
    want = 1000.0 if np.isnan(want) else min(1000.0, want)
    assert out == want


@settings(max_examples=20, deadline=None)
@given(st.lists(st.tuples(coord, coord, coord), min_size=1, max_size=40))
def test_unique_vertices_sorted_and_unique(pts):
    arr = np.asarray(pts, dtype=np.float64)
    u = unique_vertices([arr, arr])  # duplicated surface
    assert len(np.unique(u, axis=0)) == len(u)
    # lexicographic order
    for i in range(1, len(u)):
        assert tuple(u[i - 1]) <= tuple(u[i])
