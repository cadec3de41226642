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
    (object_properties.py:124-143).  Scalar fan: the mesh polygons are 3-4
    vertices, where per-call numpy slicing overhead dominated (profiled);
    term order matches the previous vectorized sum, and each triangle term
    is exact for dyadic rectangle faces, so summation order is free anyway."""
    n = len(poly)
    if n < 3:
        return 0.0
    p = poly.tolist()
    x0, y0, z0 = p[0]
    acc = 0.0
    for i in range(1, n - 1):
        ux, uy, uz = p[i][0] - x0, p[i][1] - y0, p[i][2] - z0
        vx, vy, vz = p[i + 1][0] - x0, p[i + 1][1] - y0, p[i + 1][2] - z0
        cx = uy * vz - uz * vy
        cy = uz * vx - ux * vz
        cz = ux * vy - uy * vx
        acc += 0.5 * math.sqrt(cx * cx + cy * cy + cz * cz)
    return acc


def mesh_area(surfaces: list[np.ndarray]) -> float:
    a = 0.0
    for s in surfaces:
        a += _polygon_area(s)
    return a


def mesh_volume(surfaces: list[np.ndarray]) -> float:
    """|Σ det(v0, vi, vi+1)| / 6 over the triangle fans of all surfaces
    (object_properties.py:203-215).  The numerator is accumulated first and
    divided once, so dyadic inputs give an exact result.  Scalar fan (see
    _polygon_area)."""
    acc = 0.0
    for poly in surfaces:
        n = len(poly)
        if n < 3:
            continue
        p = poly.tolist()
        x0, y0, z0 = p[0]
        for i in range(1, n - 1):
            x1, y1, z1 = p[i]
            x2, y2, z2 = p[i + 1]
            acc += (x0 * (y1 * z2 - z1 * y2)
                    - y0 * (x1 * z2 - z1 * x2)
                    + z0 * (x1 * y2 - y1 * x2))
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


def convex_hull_3d_volume(points: np.ndarray,
                          assume_unique: bool = False) -> float:
    """Volume of the 3D convex hull via incremental quickhull (pure numpy).

    Signed tetra determinants are accumulated and divided by 6 once at the
    end (exact for dyadic inputs).  Degenerate (rank<3) inputs return 0.0.
    ``assume_unique``: skip the defensive np.unique when the caller already
    deduplicated (compute_properties passes unique_vertices output).
    """
    faces = _quickhull_3d(points, assume_unique=assume_unique)
    if faces is None:
        return 0.0
    acc = 0.0
    for (a, b, c) in faces:
        acc += (
            a[0] * (b[1] * c[2] - b[2] * c[1])
            - a[1] * (b[0] * c[2] - b[2] * c[0])
            + a[2] * (b[0] * c[1] - b[1] * c[0])
        )
    return abs(acc) / 6.0


def _quickhull_3d(points: np.ndarray, assume_unique: bool = False):
    """Incremental convex hull; returns list of outward-oriented triangles
    (as vertex-coordinate triples) or None when degenerate.  Face-local
    arithmetic is scalar Python: hull inputs here are ~16-point building
    vertex sets, where tiny-array numpy call overhead dominated (profiled
    ~40% of the whole property kernel before)."""
    pts = np.asarray(points, dtype=np.float64)
    if not assume_unique:
        pts = np.unique(pts, axis=0)
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
    lx, ly, lz = (float(pts[i1, 0] - pts[i0, 0]),
                  float(pts[i1, 1] - pts[i0, 1]),
                  float(pts[i1, 2] - pts[i0, 2]))
    dx, dy, dz = d[:, 0], d[:, 1], d[:, 2]
    # manual cross/norm: same elementwise formulas as np.cross (bit-equal),
    # without the moveaxis wrapper overhead on these tiny arrays
    cx = dy * lz - dz * ly
    cy = dz * lx - dx * lz
    cz = dx * ly - dy * lx
    dist2 = cx * cx + cy * cy + cz * cz
    i2 = int(np.argmax(dist2))
    if dist2[i2] <= 0.0:
        return None
    ux, uy, uz = lx, ly, lz
    vx, vy, vz = (float(pts[i2, 0] - pts[i0, 0]),
                  float(pts[i2, 1] - pts[i0, 1]),
                  float(pts[i2, 2] - pts[i0, 2]))
    nx0 = uy * vz - uz * vy
    ny0 = uz * vx - ux * vz
    nz0 = ux * vy - uy * vx
    h = dx * nx0 + dy * ny0 + dz * nz0
    i3 = int(np.argmax(np.abs(h)))
    if h[i3] == 0.0:
        return None

    P = pts.tolist()
    px, py, pz = (np.ascontiguousarray(pts[:, 0]),
                  np.ascontiguousarray(pts[:, 1]),
                  np.ascontiguousarray(pts[:, 2]))
    ix_, iy_, iz_ = ((P[i0][0] + P[i1][0] + P[i2][0] + P[i3][0]) / 4.0,
                     (P[i0][1] + P[i1][1] + P[i2][1] + P[i3][1]) / 4.0,
                     (P[i0][2] + P[i1][2] + P[i2][2] + P[i3][2]) / 4.0)
    faces: list[tuple] = []     # oriented index triples
    d_cols: list[np.ndarray] = []  # signed distance of every point to each face
    face_far: list[tuple] = []  # cached (argmax idx, max value) per face —
    #                             a face's distance column never changes, so
    #                             the far-point scan needn't re-argmax it
    alive: list[bool] = []

    def add_face(a, b, c):
        ax, ay, az = P[a]
        bx, by, bz = P[b]
        cx, cy, cz = P[c]
        ux, uy, uz = bx - ax, by - ay, bz - az
        vx, vy, vz = cx - ax, cy - ay, cz - az
        nx = uy * vz - uz * vy
        ny = uz * vx - ux * vz
        nz = ux * vy - uy * vx
        if (ix_ - ax) * nx + (iy_ - ay) * ny + (iz_ - az) * nz > 0:
            b, c = c, b
            nx, ny, nz = -nx, -ny, -nz
        faces.append((a, b, c))
        col = (px * nx + py * ny + pz * nz
               - (ax * nx + ay * ny + az * nz))
        d_cols.append(col)
        j = int(np.argmax(col))
        face_far.append((j, float(col[j])))
        alive.append(True)
        return len(faces) - 1

    for tri in ((i0, i1, i2), (i0, i1, i3), (i0, i2, i3), (i1, i2, i3)):
        add_face(*tri)

    guard = 0
    while True:
        guard += 1
        if guard > 8 * n:  # safety net on degenerate inputs
            break
        far, fsel = -1, -1
        for fi in range(len(faces)):
            if not alive[fi]:
                continue
            j, mx = face_far[fi]
            if mx > 1e-12 * max(1.0, abs(mx)):
                far, fsel = j, fi
                break
        if fsel < 0:
            break
        # faces visible from `far` + their horizon edges
        edge_count: dict[tuple, int] = {}
        for gi in range(len(faces)):
            if not alive[gi] or d_cols[gi][far] <= 0.0:
                continue
            alive[gi] = False
            g = faces[gi]
            for e in ((g[0], g[1]), (g[1], g[2]), (g[2], g[0])):
                key = (e[0], e[1]) if e[0] < e[1] else (e[1], e[0])
                got = edge_count.get(key)
                edge_count[key] = (got[0] + 1, e) if got else (1, e)
        for cnt, (ea, eb) in edge_count.values():
            if cnt == 1:
                add_face(ea, eb, far)

    return [(P[f[0]], P[f[1]], P[f[2]]) for fi, f in enumerate(faces)
            if alive[fi]]


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

def compute_properties(surfaces: list[np.ndarray], log_transform: bool = False,
                       verts: np.ndarray | None = None) -> dict:
    """All 25 reference properties for one object.  Returns {name: float}.

    Mirrors object_properties.py:72-310; memoized base quantities (area,
    perimeter, volume) become plain locals.  With ``log_transform`` every
    value v becomes log1p(v) (object_properties.py:64-66).  ``verts`` may be
    passed by callers that already deduplicated (avoids a second np.unique).
    """
    if verts is None:
        verts = unique_vertices(surfaces)
    centroid = verts.mean(axis=0)
    xs = np.unique(verts[:, 0])
    ys = np.unique(verts[:, 1])
    zs = np.unique(verts[:, 2])

    area = max(mesh_area(surfaces), 1.0)
    perimeter = mesh_perimeter(surfaces, zs)
    volume = mesh_volume(surfaces)
    ch_per = hull_perimeter_2d(verts[:, :2])
    ch_vol = convex_hull_3d_volume(verts, assume_unique=True)

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
