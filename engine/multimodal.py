"""Multimodal column handling: media spans as opaque refs with typed metadata.

The image/audio libraries are not in this container, so the decode kernel is a
STUB (deterministic fake features keyed by media_ref, clearly marked); the Ray
plumbing — actor-pool stage, schema, batch sizing, output layout — is real and
tested.  Mirrors the reference's ViT/CLIP embedding path
(/root/reference/utils.py:45-67: model load once, then batch encode), which
would slot into MediaFeatureActor.__init__/__call__ unchanged.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import ray.data

FEATURE_DIM = 8


def _decode_image_stub(media_ref: str) -> tuple[np.ndarray, np.ndarray, float]:
    """STUB decode: a real implementation would fetch + decode the image and
    run the vision encoder here (raise NotImplementedError if wired to real
    refs).  Deterministic fake: unit-normalized bytes of md5(media_ref).
    Returns (normalized feature, raw integer-valued bytes, norm) — the raw
    bytes + norm let downstream cosine scoring use exact-integer dot products
    (order-independent, hence SQL-replicable bit-for-bit)."""
    h = hashlib.md5(media_ref.encode()).digest()
    v = np.frombuffer(h[:FEATURE_DIM], dtype=np.uint8).astype(np.float64)
    n = float(np.sqrt(float((v * v).sum())))
    return (v / n if n else v), v, n


class MediaFeatureActor:
    """Actor-pool stage: 'model' initialised once per actor, features per batch.

    Input: documents with spans; output: one row per media span
    (doc_id, media_ref, offset, feature: list<double>[8]).
    """

    def __init__(self):
        # real impl: load vision model weights here (once per actor)
        self.decode = _decode_image_stub

    def __call__(self, batch: pa.Table) -> pa.Table:
        has_source = "source" in batch.column_names
        sources = batch.column("source").to_pylist() if has_source             else [""] * batch.num_rows
        doc_ids, srcs, refs, offsets = [], [], [], []
        feats, raws, norms = [], [], []
        for d, so, spans in zip(batch.column("doc_id").to_pylist(), sources,
                                batch.column("spans").to_pylist()):
            for s in spans:
                if s["kind"] != "media" or not s["media_ref"]:
                    continue
                doc_ids.append(d)
                srcs.append(so)
                refs.append(s["media_ref"])
                offsets.append(s["offset"])
                f, r, n = self.decode(s["media_ref"])
                feats.append(f.tolist())
                raws.append(r.tolist())
                norms.append(n)
        return pa.table({
            "doc_id": pa.array(doc_ids, type=pa.string()),
            "source": pa.array(srcs, type=pa.string()),
            "media_ref": pa.array(refs, type=pa.string()),
            "offset": pa.array(offsets, type=pa.int32()),
            "feature": pa.array(feats, type=pa.list_(pa.float64())),
            "raw": pa.array(raws, type=pa.list_(pa.float64())),
            "norm": pa.array(norms, type=pa.float64()),
        })


def media_features(docs: ray.data.Dataset, concurrency: int = 2,
                   batch_size: int = 256) -> ray.data.Dataset:
    """Media spans -> deterministic feature vectors (actor pool).  Small
    batch_size on purpose: real binary payloads are heap-heavy per row."""
    return docs.map_batches(MediaFeatureActor, batch_format="pyarrow",
                            batch_size=batch_size, concurrency=(1, concurrency))
