"""Property stage: interleaved documents -> 25 geometric property columns.

The reference fans out one multiprocessing task per *property*, each walking
every object and re-shipping the whole object dict
(/root/reference/object_properties.py:39-67).  Here it is a single
``map_batches`` over zero-copy Arrow blocks: one pass per *object*, all 25
properties fused (the reference's per-property orientation was a
parallelization artifact, not semantics — SURVEY.md §1.1), which also turns
its area/perimeter/volume memoization into plain locals.

Output schema: doc_id, source, x0, y0, cx, cy (world centroid), and the 25
double columns of geometry.PROPERTY_NAMES.  ``spans`` never enters this
table — derived tables are narrow; the document table itself is untouched
(span pass-through invariant).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from engine.geometry import (PROPERTY_NAMES, compute_properties,
                             parse_geom_payload, unique_vertices)


def _props_batch(batch: pa.Table, log_transform: bool) -> pa.Table:
    out = {
        "doc_id": [], "source": [], "x0": [], "y0": [], "cx": [], "cy": [],
        **{p: [] for p in PROPERTY_NAMES},
    }
    import pyarrow.compute as pc
    # Arrow-side extraction of just the geom-span payloads (avoids
    # materializing every span's text/media strings into Python)
    spans = batch.column("spans")
    if isinstance(spans, pa.ChunkedArray):
        spans = spans.combine_chunks()
    flat = pc.list_flatten(spans)
    parents = pc.list_parent_indices(spans).to_numpy()
    mask = pc.equal(pc.struct_field(flat, "kind"), pa.scalar("geom"))
    geo_rows = parents[mask.to_numpy(zero_copy_only=False)]
    geo_texts = pc.struct_field(flat, "text").filter(mask).to_pylist()
    ids = batch.column("doc_id").to_pylist()
    srcs = batch.column("source").to_pylist()
    for row, gtext in zip(geo_rows, geo_texts):
        doc_id, source = ids[row], srcs[row]
        parsed = parse_geom_payload(gtext)
        if parsed is None:  # < 10 surfaces -> dropped, reference pipelines.py:144-145
            continue
        origin, surfaces = parsed
        verts = unique_vertices(surfaces)
        props = compute_properties(surfaces, log_transform=log_transform,
                                   verts=verts)
        c = verts.mean(axis=0)
        out["doc_id"].append(doc_id)
        out["source"].append(source)
        out["x0"].append(float(origin[0]))
        out["y0"].append(float(origin[1]))
        out["cx"].append(float(origin[0] + c[0]))
        out["cy"].append(float(origin[1] + c[1]))
        for p in PROPERTY_NAMES:
            out[p].append(props[p])
    arrays = {
        "doc_id": pa.array(out["doc_id"], type=pa.string()),
        "source": pa.array(out["source"], type=pa.string()),
    }
    for col in ("x0", "y0", "cx", "cy", *PROPERTY_NAMES):
        arrays[col] = pa.array(np.asarray(out[col], dtype=np.float64),
                               type=pa.float64())
    return pa.table(arrays)


def properties_dataset(docs: ray.data.Dataset, log_transform: bool = False,
                       batch_size: int = 256) -> ray.data.Dataset:
    """docs (doc_id, source, spans) -> per-object property table."""
    return docs.map_batches(
        lambda b: _props_batch(b, log_transform),
        batch_format="pyarrow", batch_size=batch_size)
