"""Geometric kernels: mesh parsing, 25 intrinsic object properties, convex
hulls (pure numpy — no scipy in this environment), point-in-polygon.

Property semantics replicate the reference's ObjectPropertiesProcessor
(/root/reference/object_properties.py:72-310) including its quirks:

* ``convex_hull_area`` is scipy's ``ConvexHull(pts_2d).area`` — which for 2D is
  the hull *perimeter*, not the enclosed area (object_properties.py:217-220).
* ``area`` is floored at 1 (object_properties.py:100-107); ``perimeter`` uses
  the first surface whose vertices all sit at min-z, falling back to max-z
  with a floor of 1 (object_properties.py:145-186).
* ``num_floors`` = count of distinct z coordinates (object_properties.py:241).
* vertices are deduplicated with np.unique(axis=0) — lexicographic sort —
  exactly as pipelines.py:137-139; centroid is their mean (pipelines.py:132-135).

Deterministic-arithmetic notes (why tests can assert exact equality against a
SQL oracle): sums of exactly-representable terms are accumulated sequentially,
and signed-volume kernels accumulate integer-valued numerators and divide by 6
ONCE at the end, so for dyadic-rational inputs the results are exact IEEE
doubles.  This is our engine's defined semantics (SURVEY.md §7.4.1), not a
bit-copy of the reference's float accumulation order.
"""

from __future__ import annotations

import json
import math

import numpy as np

# Canonical property order — mirrors config.Features.object_properties
# (/root/reference/config.py:44-49).
PROPERTY_NAMES = [
    "bounding_box_width", "bounding_box_length", "area", "perimeter",
    "perimeter_ind", "volume", "convex_hull_area", "convex_hull_volume",
    "ave_centroid_distance", "height_diff", "num_floors", "axes_symmetry",
    "compactness_2d", "compactness_3d", "density", "elongation", "shape_ind",
    "hemisphericality", "fractality", "cubeness", "circumference",
    "aligned_bounding_box_width", "aligned_bounding_box_length",
    "aligned_bounding_box_height", "num_vertices",
]

MIN_SURFACES_NUM = 10  # reference pipelines.py:17


def parse_geom_payload(text: str):
    """Parse a geom-span JSON payload -> (origin ndarray(2,), surfaces list of
    ndarray(n,3)).  Returns None if the payload has < MIN_SURFACES_NUM surfaces
    (the reference drops those objects, pipelines.py:144-145)."""
    obj = json.loads(text)
    surfaces = obj["surfaces"]
    if len(surfaces) < MIN_SURFACES_NUM:
        return None
    origin = np.asarray(obj.get("origin", [0.0, 0.0]), dtype=np.float64)
    return origin, [np.asarray(s, dtype=np.float64) for s in surfaces]


def unique_vertices(surfaces: list[np.ndarray]) -> np.ndarray:
    """np.unique over all surface vertices — lexsorted, like pipelines.py:137-139."""
    return np.unique(np.concatenate(surfaces, axis=0), axis=0)


def _polygon_area(poly: np.ndarray) -> float:
    """Triangle-fan surface area of one (possibly non-planar) polygon
    (object_properties.py:124-143)."""
    n = len(poly)
    if n < 3:
        return 0.0
    a = 0.0
    v0 = poly[0]
    for i in range(1, n - 1):
        nrm = np.cross(poly[i] - v0, poly[i + 1] - v0)
        a += 0.5 * math.sqrt(float(nrm[0] * nrm[0] + nrm[1] * nrm[1] + nrm[2] * nrm[2]))
    return a


def mesh_area(surfaces: list[np.ndarray]) -> float:
    a = 0.0
    for s in surfaces:
        a += _polygon_area(s)
    return a


def mesh_volume(surfaces: list[np.ndarray]) -> float:
    """|Σ det(v0, vi, vi+1)| / 6 over the triangle fans of all surfaces
    (object_properties.py:203-215).  The numerator is accumulated first and
    divided once, so dyadic inputs give an exact result."""
    acc = 0.0
    for poly in surfaces:
        v0 = poly[0]
        for i in range(1, len(poly) - 1):
            v1, v2 = poly[i], poly[i + 1]
            acc += float(
                v0[0] * (v1[1] * v2[2] - v1[2] * v2[1])
                - v0[1] * (v1[0] * v2[2] - v1[2] * v2[0])
                + v0[2] * (v1[0] * v2[1] - v1[1] * v2[0])
            )
    return abs(acc) / 6.0


def _perimeter_at(surfaces: list[np.ndarray], z_ref: float) -> float:
    """Perimeter of the first surface whose every vertex has z == z_ref
    (exact float comparison, like object_properties.py:145-163)."""
    for poly in surfaces:
        if np.all(poly[:, 2] == z_ref):
            per = 0.0
            n = len(poly)
            for i in range(n):
                d = poly[i] - poly[(i + 1) % n]
                per += math.sqrt(float(d[0] * d[0] + d[1] * d[1] + d[2] * d[2]))
            return per
    return 0.0


def mesh_perimeter(surfaces: list[np.ndarray], z_values: np.ndarray) -> float:
    per = _perimeter_at(surfaces, float(z_values.min()))
    if per == 0.0:
        per = _perimeter_at(surfaces, float(z_values.max()))
        per = max(per, 1.0)
    return per


# ---------------------------------------------------------------------------
# Convex hulls (numpy-only replacements for scipy.spatial.ConvexHull)
# ---------------------------------------------------------------------------

def convex_hull_2d(points: np.ndarray) -> np.ndarray:
    """Monotone-chain hull of (n,2) points, CCW, strict turns (collinear
    points excluded).  Returns hull vertices in order."""
    pts = np.unique(points, axis=0)
    if len(pts) <= 2:
        return pts
    pts = pts[np.lexsort((pts[:, 1], pts[:, 0]))]

    def half(seq):
        out = []
        for p in seq:
            while len(out) >= 2:
                o, a = out[-2], out[-1]
                if (a[0] - o[0]) * (p[1] - o[1]) - (a[1] - o[1]) * (p[0] - o[0]) <= 0:
                    out.pop()
                else:
                    break
            out.append(p)
        return out

    lower = half(pts)
    upper = half(pts[::-1])
    return np.array(lower[:-1] + upper[:-1])


def hull_perimeter_2d(points: np.ndarray) -> float:
    """Perimeter of the 2D convex hull — scipy's 2D ``.area`` quirk."""
    hull = convex_hull_2d(points)
    n = len(hull)
    if n < 2:
        return 0.0
    per = 0.0
    for i in range(n):
        d = hull[i] - hull[(i + 1) % n]
        per += math.sqrt(float(d[0] * d[0] + d[1] * d[1]))
    return per


def hull_area_2d(points: np.ndarray) -> float:
    """Enclosed area of the 2D convex hull (shoelace; scipy's 2D ``.volume``)."""
    hull = convex_hull_2d(points)
    if len(hull) < 3:
        return 0.0
    acc = 0.0
    n = len(hull)
    for i in range(n):
        x1, y1 = hull[i]
        x2, y2 = hull[(i + 1) % n]
        acc += float(x1 * y2 - x2 * y1)
    return abs(acc) / 2.0


def convex_hull_3d_volume(points: np.ndarray) -> float:
    """Volume of the 3D convex hull via incremental quickhull (pure numpy).

    Signed tetra determinants are accumulated and divided by 6 once at the
    end (exact for dyadic inputs).  Degenerate (rank<3) inputs return 0.0.
    """
    faces = _quickhull_3d(points)
    if faces is None:
        return 0.0
    acc = 0.0
    for (a, b, c) in faces:
        acc += float(
            a[0] * (b[1] * c[2] - b[2] * c[1])
            - a[1] * (b[0] * c[2] - b[2] * c[0])
            + a[2] * (b[0] * c[1] - b[1] * c[0])
        )
    return abs(acc) / 6.0


def _quickhull_3d(points: np.ndarray):
    """Incremental convex hull; returns list of outward-oriented triangles
    (as vertex-coordinate triples) or None when degenerate."""
    pts = np.unique(np.asarray(points, dtype=np.float64), axis=0)
    n = len(pts)
    if n < 4:
        return None
    # initial simplex: extreme point pairs, then farthest from line / plane
    i0 = int(np.argmin(pts[:, 0]))
    i1 = int(np.argmax(pts[:, 0]))
    if i0 == i1:
        i1 = int(np.argmax(pts[:, 1]))
        if i0 == i1:
            return None
    d = pts - pts[i0]
    line = pts[i1] - pts[i0]
    cross = np.cross(d, line)
    dist2 = np.einsum("ij,ij->i", cross, cross)
    i2 = int(np.argmax(dist2))
    if dist2[i2] <= 0.0:
        return None
    normal = np.cross(pts[i1] - pts[i0], pts[i2] - pts[i0])
    h = d @ normal
    i3 = int(np.argmax(np.abs(h)))
    if h[i3] == 0.0:
        return None

    def orient(tri, apex):
        a, b, c = pts[tri[0]], pts[tri[1]], pts[tri[2]]
        nrm = np.cross(b - a, c - a)
        return tri if (pts[apex] - a) @ nrm < 0 else (tri[0], tri[2], tri[1])

    faces = [orient((i0, i1, i2), i3), orient((i0, i1, i3), i2),
             orient((i0, i2, i3), i1), orient((i1, i2, i3), i0)]

    def face_plane(f):
        a, b, c = pts[f[0]], pts[f[1]], pts[f[2]]
        nrm = np.cross(b - a, c - a)
        return nrm, a

    # assign outside points
    remaining = np.ones(n, dtype=bool)
    for f in faces:
        for i in f:
            remaining[i] = False
    outside = {}
    for fi, f in enumerate(faces):
        nrm, a = face_plane(f)
        idx = np.nonzero(remaining)[0]
        if len(idx) == 0:
            outside[fi] = np.empty(0, dtype=int)
            continue
        dd = (pts[idx] - a) @ nrm
        outside[fi] = idx[dd > 1e-12 * max(1.0, float(np.abs(dd).max()))] if len(dd) else idx[:0]

    alive = {i: True for i in range(len(faces))}
    work = [fi for fi in range(len(faces)) if len(outside[fi])]
    while work:
        fi = work.pop()
        if not alive.get(fi) or not len(outside[fi]):
            continue
        f = faces[fi]
        nrm, a = face_plane(f)
        cand = outside[fi]
        dd = (pts[cand] - a) @ nrm
        far = int(cand[int(np.argmax(dd))])
        # find visible faces from `far`
        visible = []
        for gi, g in enumerate(faces):
            if not alive.get(gi):
                continue
            gn, ga = face_plane(g)
            if (pts[far] - ga) @ gn > 0.0:
                visible.append(gi)
        # horizon edges = edges shared by exactly one visible face
        edge_count = {}
        for gi in visible:
            g = faces[gi]
            for e in ((g[0], g[1]), (g[1], g[2]), (g[2], g[0])):
                key = (min(e), max(e))
                edge_count[key] = edge_count.get(key, (0, e))[0] + 1, e
        horizon = [e for (cnt, e) in edge_count.values() if cnt == 1]
        # collect orphaned outside points
        orphan = [far_idx for gi in visible for far_idx in outside[gi]]
        for gi in visible:
            alive[gi] = False
            outside[gi] = np.empty(0, dtype=int)
        new_ids = []
        for (ea, eb) in horizon:
            tri = (ea, eb, far)
            a0, b0, c0 = pts[tri[0]], pts[tri[1]], pts[tri[2]]
            tn = np.cross(b0 - a0, c0 - a0)
            # orient outward: interior reference = centroid of initial simplex
            interior = (pts[i0] + pts[i1] + pts[i2] + pts[i3]) / 4.0
            if (interior - a0) @ tn > 0:
                tri = (tri[0], tri[2], tri[1])
            faces.append(tri)
            ni = len(faces) - 1
            alive[ni] = True
            outside[ni] = np.empty(0, dtype=int)
            new_ids.append(ni)
        orphan = np.array([o for o in set(orphan) if o != far], dtype=int)
        for ni in new_ids:
            if not len(orphan):
                break
            nn, na = face_plane(faces[ni])
            dd = (pts[orphan] - na) @ nn
            sel = dd > 1e-12 * max(1.0, float(np.abs(dd).max()))
            outside[ni] = orphan[sel]
            orphan = orphan[~sel]
        work.extend([ni for ni in new_ids if len(outside[ni])])

    return [(pts[f[0]], pts[f[1]], pts[f[2]]) for fi, f in enumerate(faces)
            if alive.get(fi)]


# ---------------------------------------------------------------------------
# Point in polygon (ray crossing) — north-rule operator
# ---------------------------------------------------------------------------

def points_in_polygon(px: np.ndarray, py: np.ndarray, poly: np.ndarray) -> np.ndarray:
    """Vectorized even-odd ray-crossing test: are (px, py) strictly inside the
    simple polygon ``poly`` (m,2)?  Points exactly on an edge are
    implementation-defined (our corpora never place points on edges)."""
    inside = np.zeros(len(px), dtype=bool)
    m = len(poly)
    for i in range(m):
        x1, y1 = poly[i]
        x2, y2 = poly[(i + 1) % m]
        cond = (y1 > py) != (y2 > py)
        if not cond.any():
            continue
        xin = (x2 - x1) * (py - y1) / (y2 - y1) + x1
        inside ^= cond & (px < xin)
    return inside


# ---------------------------------------------------------------------------
# The 25-property kernel
# ---------------------------------------------------------------------------

def compute_properties(surfaces: list[np.ndarray], log_transform: bool = False) -> dict:
    """All 25 reference properties for one object.  Returns {name: float}.

    Mirrors object_properties.py:72-310; memoized base quantities (area,
    perimeter, volume) become plain locals.  With ``log_transform`` every
    value v becomes log1p(v) (object_properties.py:64-66).
    """
    verts = unique_vertices(surfaces)
    centroid = verts.mean(axis=0)
    xs = np.unique(verts[:, 0])
    ys = np.unique(verts[:, 1])
    zs = np.unique(verts[:, 2])

    area = max(mesh_area(surfaces), 1.0)
    perimeter = mesh_perimeter(surfaces, zs)
    volume = mesh_volume(surfaces)
    ch_per = hull_perimeter_2d(verts[:, :2])
    ch_vol = convex_hull_3d_volume(verts)

    cov = np.cov(verts, rowvar=False)
    eigenvalues, eigenvectors = np.linalg.eigh(cov)
    aligned = verts @ eigenvectors
    amin, amax = aligned.min(axis=0), aligned.max(axis=0)

    props = {
        "bounding_box_width": float(xs.max() - xs.min()),
        "bounding_box_length": float(ys.max() - ys.min()),
        "area": area,
        "perimeter": perimeter,
        "perimeter_ind": 2.0 * math.sqrt(math.pi * area) / perimeter,
        "volume": volume,
        "convex_hull_area": ch_per,
        "convex_hull_volume": ch_vol,
        "ave_centroid_distance": float(
            np.mean(np.sqrt(((verts - centroid) ** 2).sum(axis=1)))),
        "height_diff": float(zs.max() - zs.min()),
        "num_floors": float(len(zs)),
        "axes_symmetry": float(np.mean([np.std(xs), np.std(ys), np.std(zs)])),
        "compactness_2d": area / ch_per if ch_per else 0.0,
        "compactness_3d": volume / ch_vol if ch_vol else 0.0,
        "density": area / perimeter,
        "elongation": float(np.sqrt(eigenvalues.max() / eigenvalues.min()))
        if eigenvalues.min() > 0 else 0.0,
        "shape_ind": perimeter / math.sqrt(4 * math.pi * area),
        "hemisphericality": 3.0 * math.sqrt(2.0) * math.sqrt(math.pi) * volume
        / (area * math.sqrt(area)),
        "fractality": 1.0 - math.log(volume) / (1.5 * math.log(area))
        if volume > 0 else 0.0,
        "cubeness": 6.0 * math.pow(volume, 2.0 / 3.0) / area,
        "circumference": 4.0 * math.pi
        * math.pow(3.0 * volume / (4.0 * math.pi), 2.0 / 3.0) / area,
        "aligned_bounding_box_width": float(amax[0] - amin[0]),
        "aligned_bounding_box_length": float(amax[1] - amin[1]),
        "aligned_bounding_box_height": float(amax[2] - amin[2]),
        "num_vertices": float(len(verts)),
    }
    if log_transform:
        props = {k: float(np.log1p(v)) for k, v in props.items()}
    return props
