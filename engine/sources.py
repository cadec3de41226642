"""Alternate sources: CityJSON file reader (the reference's native input
format) and GeoJSON coordinate extraction.

The reference lists a directory of ``*.city.json`` files and parses each
CityObject into a mesh record (S1/S2 — /root/reference/pipelines.py:204-244,
readers per dataset at :161-202).  Here each file maps to one read task
(``ray.data.read_binary_files`` + parse batch), key standardization included
(pipelines.py:246-253).
"""

from __future__ import annotations

import json

import numpy as np
import pyarrow as pa
import ray.data

from engine.geometry import MIN_SURFACES_NUM
from engine.schema import SPAN_TYPE


def standardize_obj_key(obj_key: str, object_type: str) -> str:
    """Key standardization exactly as pipelines.py:246-253: cands keys are
    'bag_X' -> X; index keys 'NL.IMBAG.Pand.X-0...' -> X."""
    if object_type == "cands":
        return obj_key.split("bag_")[1]
    if object_type == "index":
        return obj_key.split("NL.IMBAG.Pand.")[1].split("-0")[0]
    raise ValueError("Invalid source")


def parse_cityjson_bytes(data: bytes, source: str,
                         min_surfaces_num: int = MIN_SURFACES_NUM) -> list[dict]:
    """One CityJSON file -> list of {doc_id, source, spans} rows.

    Geometry extraction mirrors pipelines.py:142-151: vertices indexed via
    data['vertices']; boundaries = geometry[0]['boundaries'][0]; objects with
    fewer than ``min_surfaces_num`` surfaces are dropped; malformed objects
    are skipped (the reference's bare except, pipelines.py:242-243).
    """
    doc = json.loads(data)
    vertices = doc["vertices"]
    out = []
    for obj_key in doc.get("CityObjects", {}):
        try:
            new_key = standardize_obj_key(obj_key, source)
            boundaries = doc["CityObjects"][obj_key]["geometry"][0]["boundaries"][0]
            if len(boundaries) < min_surfaces_num:
                continue
            surfaces = [[list(map(float, vertices[i]))
                         for sub in surface for i in sub]
                        for surface in boundaries]
            payload = json.dumps({"origin": [0.0, 0.0], "surfaces": surfaces},
                                 separators=(",", ":"))
            out.append({
                "doc_id": new_key,
                "source": source,
                "spans": [{"kind": "geom", "text": payload, "media_ref": "",
                           "offset": 0}],
            })
        except Exception:
            continue
    return out


def read_cityjson(paths, source: str) -> ray.data.Dataset:
    """Directory/list of CityJSON files -> interleaved-document Dataset
    (file parallelism = one read task per file, replacing the reference's
    multiprocessing.Pool at pipelines.py:211)."""
    files = ray.data.read_binary_files(paths)

    def parse(batch: pa.Table) -> pa.Table:
        rows = []
        for data in batch.column("bytes").to_pylist():
            rows.extend(parse_cityjson_bytes(data, source))
        return pa.table({
            "doc_id": pa.array([r["doc_id"] for r in rows], type=pa.string()),
            "source": pa.array([r["source"] for r in rows], type=pa.string()),
            "spans": pa.array([r["spans"] for r in rows],
                              type=pa.list_(SPAN_TYPE)),
        })

    return files.map_batches(parse, batch_format="pyarrow")


def geojson_polygon_coords(geojson_text: str) -> list[np.ndarray]:
    """features[*].geometry.coordinates with the closing vertex dropped
    (utils.py:226-235)."""
    doc = json.loads(geojson_text)
    out = []
    for feat in doc.get("features", []):
        coords = feat["geometry"]["coordinates"]
        ring = np.asarray(coords[0] if isinstance(coords[0][0], (list, tuple))
                          else coords, dtype=np.float64)
        if len(ring) > 1 and np.array_equal(ring[0], ring[-1]):
            ring = ring[:-1]
        out.append(ring)
    return out


def close_polygon(ring: np.ndarray) -> np.ndarray:
    """Append the first vertex if the ring is open (utils.py:26-29)."""
    if len(ring) and not np.array_equal(ring[0], ring[-1]):
        return np.vstack([ring, ring[0]])
    return ring
