"""DuckDB oracle SQL for the geo queries.

These strings recompute, in exact integer/dyadic arithmetic, the closed-form
values of what the Ray pipelines derive geometrically from the mesh payloads.
The generative parameter formulas mirror datagen/buildings.py verbatim.

Exactness contract (see datagen/buildings.py docstring): dims are dyadic
rationals; products/sums stay below 2**53; sqrt is IEEE-correctly-rounded in
both numpy and DuckDB — so the checked columns match BIT-FOR-BIT, no rounding.
"""

# Common prefix: generative dims for the flat-roof cands subset (roof = k % 5 = 0).
_DIMS_FLAT = """
WITH h AS (
  SELECT doc_id AS k, (doc_id * 2654435761 + 12345) AS hv
  FROM documents WHERE doc_id % 5 = 0
), d AS (
  SELECT k,
    4 + (hv % 24) + ((hv // 24) % 8) / 8.0 AS w,
    5 + ((hv // 192) % 30) + ((hv // 1536) % 8) / 8.0 AS l,
    3 + ((hv // 12288) % 18) + ((hv // 98304) % 8) / 8.0 AS ht
  FROM h
)
"""

# Dims + world placement for ALL cands keys (any roof).
_DIMS_ALL = """
WITH h AS (
  SELECT doc_id AS k, (doc_id * 2654435761 + 12345) AS hv,
         ((doc_id * 1000003 + 7) % 1000000007) * 1103515245 + 54321 AS h2
  FROM documents
), d AS (
  SELECT k,
    4 + (hv % 24) + ((hv // 24) % 8) / 8.0 AS w,
    5 + ((hv // 192) % 30) + ((hv // 1536) % 8) / 8.0 AS l,
    3 + ((hv // 12288) % 18) + ((hv // 98304) % 8) / 8.0 AS ht,
    CAST(h2 % 99000 AS DOUBLE) AS x0,
    CAST((h2 // 99000) % 99000 AS DOUBLE) AS y0
  FROM h
)
"""

GEO_PROPERTIES = _DIMS_FLAT + """
SELECT CAST(k AS VARCHAR) AS doc_id,
  w AS bounding_box_width,
  l AS bounding_box_length,
  2*w*l + 2*w*ht + 2*l*ht AS area,
  2*w + l AS perimeter,
  2 * sqrt(pi() * (2*w*l + 2*w*ht + 2*l*ht)) / (2*w + l) AS perimeter_ind,
  w*l*ht AS volume,
  2*(w+l) AS convex_hull_area,
  w*l*ht AS convex_hull_volume,
  ht AS height_diff,
  3.0 AS num_floors,
  (w/2 + sqrt((l*l/2)/3) + sqrt((ht*ht/2)/3))/3 AS axes_symmetry,
  (2*w*l + 2*w*ht + 2*l*ht) / (2*(w+l)) AS compactness_2d,
  (w*l*ht) / (w*l*ht) AS compactness_3d,
  (2*w*l + 2*w*ht + 2*l*ht) / (2*w + l) AS density,
  (2*w + l) / sqrt(4*pi()*(2*w*l + 2*w*ht + 2*l*ht)) AS shape_ind,
  3*sqrt(2)*sqrt(pi())*(w*l*ht) / ((2*w*l + 2*w*ht + 2*l*ht) * sqrt(2*w*l + 2*w*ht + 2*l*ht)) AS hemisphericality,
  16.0 AS num_vertices
FROM d
"""

GEO_CENTROIDS = _DIMS_ALL + """
SELECT CAST(k AS VARCHAR) AS doc_id,
  x0 + w/2 AS cx,
  y0 + l/2 AS cy
FROM d WHERE k % 5 = 0
"""
