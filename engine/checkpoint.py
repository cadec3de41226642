"""Per-stage checkpointing with per-partition lineage + metrics manifests.

North-rule requirement: a killed job resumes from completed work.  Replaces
the reference's coarse joblib artifact caching (/root/reference/config.py:24-31,
pipelines.py:49-55,437-443) with:

* each stage writes its output table to ``<root>/<stage>/data.tmp/`` then
  atomically renames to ``data/`` and writes ``manifest.json`` listing every
  partition file with row count, byte size, content sha256, plus stage wall
  time and the lineage (inputs description) — the per-partition metrics the
  north rule asks for;
* ``run_stage`` skips any stage whose manifest validates against the files on
  disk (a partial/killed write leaves no manifest -> stage reruns).
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import time

import ray.data


def _file_sha(path: str, cap: int = 1 << 20) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as f:
        h.update(f.read(cap))
    return h.hexdigest()


def manifest_path(root: str, stage: str) -> str:
    return os.path.join(root, stage, "manifest.json")


def is_complete(root: str, stage: str) -> bool:
    mp = manifest_path(root, stage)
    if not os.path.exists(mp):
        return False
    try:
        m = json.load(open(mp))
    except Exception:
        return False
    data_dir = os.path.join(root, stage, "data")
    for part in m.get("partitions", []):
        p = os.path.join(data_dir, part["file"])
        if not os.path.exists(p) or os.path.getsize(p) != part["bytes"]:
            return False
    return True


def run_stage(root: str, stage: str, build_fn, lineage: dict | None = None,
              force: bool = False) -> ray.data.Dataset:
    """Return the stage's output Dataset, recomputing only when needed.

    ``build_fn() -> Dataset`` runs lazily; output is written as partitioned
    parquet (resumable layout: the whole stage is the atomic unit, partition
    files are enumerated in the manifest for audit/lineage).
    """
    stage_dir = os.path.join(root, stage)
    data_dir = os.path.join(stage_dir, "data")
    if not force and is_complete(root, stage):
        return ray.data.read_parquet(data_dir)

    os.makedirs(stage_dir, exist_ok=True)
    tmp = os.path.join(stage_dir, "data.tmp")
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    if os.path.exists(data_dir):
        shutil.rmtree(data_dir)
    t0 = time.time()
    ds = build_fn()
    ds.write_parquet(tmp)
    wall = time.time() - t0

    parts = []
    import pyarrow.parquet as pq
    for fn in sorted(os.listdir(tmp)):
        p = os.path.join(tmp, fn)
        if not fn.endswith(".parquet"):
            continue
        parts.append({
            "file": fn,
            "rows": pq.ParquetFile(p).metadata.num_rows,
            "bytes": os.path.getsize(p),
            "sha256_1mb": _file_sha(p),
        })
    os.rename(tmp, data_dir)
    with open(manifest_path(root, stage), "w") as f:
        json.dump({
            "stage": stage,
            "created_unix": time.time(),
            "wall_s": round(wall, 3),
            "lineage": lineage or {},
            "partitions": parts,
            "total_rows": sum(p["rows"] for p in parts),
        }, f, indent=1)
    return ray.data.read_parquet(data_dir)


def read_manifest(root: str, stage: str) -> dict:
    return json.load(open(manifest_path(root, stage)))
