"""Deterministic 3D building generator.

Every building is a pure integer-arithmetic function of its document key
``k`` so that (a) the corpus is bit-reproducible at any scale without any
stored fixture, and (b) a SQL oracle (DuckDB) can recompute the generative
parameters with the *same* exact arithmetic.  All dimensions are dyadic
rationals (integers + eighths), hence exactly representable as IEEE doubles;
products and sums of the magnitudes used here stay far below 2**53, so the
closed-form property values (volume = w*l*h for a flat box, etc.) are *exact*
in both Python and SQL — enabling bit-for-bit correctness checks of the
geometric kernels without any rounding tolerance.

Mesh shape mirrors the reference's object record ("polygon_mesh": list of
surfaces, each a list of [x, y, z] vertices — /root/reference/pipelines.py:142-151).
Walls and floor/roof are split into panels so every object has >= 12 surfaces,
clearing the reference's min_surfaces_num = 10 filter
(/root/reference/pipelines.py:17,144-145).

Coordinates inside the mesh are *local* (origin at (0,0,0)); the world
placement is carried separately as ``origin = (x0, y0)``.  Property kernels are
translation-invariant, and keeping geometry local keeps all kernel arithmetic
exact (world coordinates ~1e5 would overflow the 53-bit exact window for
volume-sized products).
"""

from __future__ import annotations

import json

# Multiplicative hash constants — mirrored verbatim in the SQL oracle strings.
HASH_A = 2654435761  # Knuth multiplicative constant
HASH_B = 12345

ROOF_FLAT = 0
ROOF_SHED = 1
ROOF_GABLED = 2
ROOF_HIPPED = 3
ROOF_PYRAMIDAL = 4

INDEX_EXTRA_OFFSET = 10_000_000  # key offset for index-only (unmatched) docs
WORLD_SIZE = 131072.0  # 2**17 m — power of two so grid-cell sizes are dyadic
PLACE_RANGE = 99000  # x0, y0 in [0, 99000); max footprint ~35 m → fits world


def building_params(k: int) -> dict:
    """All generative parameters for document key ``k``.

    Pure integer arithmetic + division by 8.0 (exact), expressible 1:1 in
    DuckDB SQL:  h = (k * 2654435761 + 12345);  w = 4 + (h % 24) + ((h // 24) % 8) / 8.0 ...
    """
    h = k * HASH_A + HASH_B
    w = 4 + (h % 24) + ((h // 24) % 8) / 8.0
    l = 5 + ((h // 192) % 30) + ((h // 1536) % 8) / 8.0
    ht = 3 + ((h // 12288) % 18) + ((h // 98304) % 8) / 8.0
    rise = 1 + ((h // 786432) % 6) + ((h // 4718592) % 8) / 8.0
    roof = k % 5
    h2 = ((k * 1000003 + 7) % 1000000007) * 1103515245 + 54321
    x0 = float(h2 % PLACE_RANGE)
    y0 = float((h2 // PLACE_RANGE) % PLACE_RANGE)
    # index-side perturbation (applied only when source == 'index' and the doc
    # is a matched copy): each dimension moves by {-1, 0, +1}/8
    p = h2 // 9801000000
    dw = ((p % 3) - 1) / 8.0
    dl = ((p // 3 % 3) - 1) / 8.0
    dh = ((p // 9 % 3) - 1) / 8.0
    matched = (p // 27) % 100 < 85
    return {
        "k": k, "w": w, "l": l, "h": ht, "rise": rise, "roof": roof,
        "x0": x0, "y0": y0, "dw": dw, "dl": dl, "dh": dh, "matched": matched,
    }


def _quad(a, b, c, d):
    return [list(a), list(b), list(c), list(d)]


def _tri(a, b, c):
    return [list(a), list(b), list(c)]


def build_mesh(w: float, l: float, h: float, roof: int, rise: float) -> list:
    """Surfaces (outward-oriented) of a w×l×h box with the given roof.

    Floor and flat roof are split into two panels at y = l/2 and every wall
    into two panels at z = h/2, so each mesh has 12-14 surfaces (≥ the
    reference's 10-surface minimum).  The *first* surface is a floor panel
    whose every vertex has z = 0, which pins the reference's perimeter kernel
    (first all-at-min-z surface — /root/reference/object_properties.py:145-163)
    to the w × l/2 panel: perimeter = 2*w + l.
    """
    yl = l / 2.0
    zh = h / 2.0
    s = []
    # floor: two panels, outward normal (0,0,-1)
    s.append(_quad((0, 0, 0), (0, yl, 0), (w, yl, 0), (w, 0, 0)))
    s.append(_quad((0, yl, 0), (0, l, 0), (w, l, 0), (w, yl, 0)))
    # walls up to h, split at h/2; outward normals -y, +x, +y, -x
    for z0, z1 in ((0.0, zh), (zh, h)):
        s.append(_quad((0, 0, z0), (w, 0, z0), (w, 0, z1), (0, 0, z1)))   # y=0
        s.append(_quad((w, 0, z0), (w, l, z0), (w, l, z1), (w, 0, z1)))   # x=w
        s.append(_quad((w, l, z0), (0, l, z0), (0, l, z1), (w, l, z1)))   # y=l
        s.append(_quad((0, l, z0), (0, 0, z0), (0, 0, z1), (0, l, z1)))   # x=0
    if roof == ROOF_FLAT:
        s.append(_quad((0, 0, h), (w, 0, h), (w, yl, h), (0, yl, h)))
        s.append(_quad((0, yl, h), (w, yl, h), (w, l, h), (0, l, h)))
    elif roof == ROOF_SHED:
        # top rises from z=h at y=0 to z=h+rise at y=l
        top = h + rise
        s.append(_quad((0, 0, h), (w, 0, h), (w, l, top), (0, l, top)))    # slope
        s.append(_quad((w, l, h), (0, l, h), (0, l, top), (w, l, top)))    # back wall strip
        s.append(_tri((0, l, h), (0, 0, h), (0, l, top)))                  # x=0 wedge
        s.append(_tri((w, 0, h), (w, l, h), (w, l, top)))                  # x=w wedge
    elif roof == ROOF_GABLED:
        # ridge along y at x = w/2, height h+rise
        xm, top = w / 2.0, h + rise
        s.append(_quad((0, 0, h), (xm, 0, top), (xm, l, top), (0, l, h)))  # west slope
        s.append(_quad((xm, 0, top), (w, 0, h), (w, l, h), (xm, l, top)))  # east slope
        s.append(_tri((0, 0, h), (w, 0, h), (xm, 0, top)))                 # y=0 gable
        s.append(_tri((w, l, h), (0, l, h), (xm, l, top)))                 # y=l gable
    elif roof == ROOF_HIPPED:
        # ridge along y from (w/2, ins) to (w/2, l-ins) at height h+rise
        xm, top = w / 2.0, h + rise
        ins = min(w, l) / 4.0
        r0, r1 = (xm, ins, top), (xm, l - ins, top)
        s.append(_quad((0, 0, h), r0, r1, (0, l, h)))                      # west slope
        s.append(_quad(r0, (w, 0, h), (w, l, h), r1))                      # east slope
        s.append(_tri((0, 0, h), (w, 0, h), r0))                           # y=0 hip
        s.append(_tri((w, l, h), (0, l, h), r1))                           # y=l hip
    elif roof == ROOF_PYRAMIDAL:
        apex = (w / 2.0, l / 2.0, h + rise)
        s.append(_tri((0, 0, h), (w, 0, h), apex))
        s.append(_tri((w, 0, h), (w, l, h), apex))
        s.append(_tri((w, l, h), (0, l, h), apex))
        s.append(_tri((0, l, h), (0, 0, h), apex))
    else:
        raise ValueError(f"unknown roof type {roof}")
    return s


def expected_volume(w: float, l: float, h: float, roof: int, rise: float) -> float:
    """Closed-form solid volume (exact reals) — test oracle."""
    base = w * l * h
    if roof == ROOF_FLAT:
        return base
    if roof == ROOF_SHED:
        return base + w * l * rise / 2.0
    if roof == ROOF_GABLED:
        return base + w * l * rise / 2.0
    if roof == ROOF_PYRAMIDAL:
        return base + w * l * rise / 3.0
    if roof == ROOF_HIPPED:
        ins = min(w, l) / 4.0
        # central gable prism + two hip-end pyramids (each w*ins*rise/3)
        return base + w * rise / 2.0 * (l - 2 * ins) + 2.0 * (w * ins * rise / 3.0)
    raise ValueError(roof)


def mesh_to_span_text(surfaces: list, x0: float, y0: float) -> str:
    """Serialize mesh + world origin as the geom-span payload (JSON)."""
    return json.dumps({"origin": [x0, y0], "surfaces": surfaces},
                      separators=(",", ":"))


def doc_spans(k: int, source: str) -> list[dict]:
    """The interleaved span sequence for document ``k`` of one source.

    Matches BASELINE.json's input_hint: list<struct<kind,text,media_ref,offset>>
    with strictly increasing offsets.  The index-side copy of a matched doc is
    dimension-perturbed (ratio features ≠ 1), mirroring how the reference's two
    municipal datasets model the same buildings slightly differently.
    """
    p = building_params(k)
    w, l, h = p["w"], p["l"], p["h"]
    if source == "index" and k < INDEX_EXTRA_OFFSET:
        w, l, h = w + p["dw"], l + p["dl"], h + p["dh"]
    mesh = build_mesh(w, l, h, p["roof"], p["rise"])
    spans = [
        {"kind": "text", "media_ref": "", "offset": 0,
         "text": f"building {k} loc {p['x0']:.0f} {p['y0']:.0f}"},
        {"kind": "geom", "media_ref": "", "offset": 1,
         "text": mesh_to_span_text(mesh, p["x0"], p["y0"])},
        {"kind": "media", "media_ref": f"png://{k}/0", "offset": 2, "text": ""},
    ]
    if k % 3 == 0:
        spans.append({"kind": "text", "media_ref": "", "offset": 3,
                      "text": f"roof type {p['roof']} rise {p['rise']}"})
    return spans
