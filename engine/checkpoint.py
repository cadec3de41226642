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

from engine.storage import read_parquet_clean


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
        return read_parquet_clean(data_dir)

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
    return read_parquet_clean(data_dir)


def read_manifest(root: str, stage: str) -> dict:
    return json.load(open(manifest_path(root, stage)))


def _part_valid(pdir: str, entry: dict) -> bool:
    for f in entry.get("files", []):
        p = os.path.join(pdir, f["file"])
        if not os.path.exists(p) or os.path.getsize(p) != f["bytes"]:
            return False
    return True


def run_stage_partitioned(root: str, stage: str, part_keys: list[str],
                          build_part_fn, lineage: dict | None = None,
                          force: bool = False) -> ray.data.Dataset:
    """Partition-grained resume: each input shard / key range is its own
    atomic unit under ``<stage>/parts/<key>/`` with a manifest entry (rows,
    bytes, sha, wall seconds, lineage).  The manifest is rewritten after
    EVERY completed partition, so a killed run re-executes ONLY the
    partitions whose entry is missing or fails validation — the north
    rule's "skip finished partitions" semantics, one level finer than
    ``run_stage``'s whole-stage atomicity.

    ``build_part_fn(key) -> Dataset`` produces one partition's rows.
    Returns the union Dataset over all partition directories.
    """
    import pyarrow.parquet as pq
    stage_dir = os.path.join(root, stage)
    parts_root = os.path.join(stage_dir, "parts")
    os.makedirs(parts_root, exist_ok=True)
    mp = manifest_path(root, stage)
    manifest = {"stage": stage, "mode": "partitioned",
                "lineage": lineage or {}, "partitions": {}}
    if os.path.exists(mp) and not force:
        try:
            manifest = json.load(open(mp))
        except Exception:
            pass
    done = manifest.setdefault("partitions", {})

    for key in part_keys:
        pdir = os.path.join(parts_root, str(key))
        if not force and key in done and _part_valid(pdir, done[key]):
            continue
        tmp = pdir + ".tmp"
        for d in (tmp, pdir):
            if os.path.exists(d):
                shutil.rmtree(d)
        t0 = time.time()
        build_part_fn(key).write_parquet(tmp)
        files = []
        for fn in sorted(os.listdir(tmp)):
            if not fn.endswith(".parquet"):
                continue
            p = os.path.join(tmp, fn)
            files.append({"file": fn,
                          "rows": pq.ParquetFile(p).metadata.num_rows,
                          "bytes": os.path.getsize(p),
                          "sha256_1mb": _file_sha(p)})
        os.rename(tmp, pdir)
        done[key] = {"files": files, "wall_s": round(time.time() - t0, 3),
                     "rows": sum(f["rows"] for f in files),
                     "created_unix": time.time()}
        # persist progress after every partition (kill-safe)
        with open(mp + ".tmp", "w") as f:
            json.dump(manifest, f, indent=1)
        os.replace(mp + ".tmp", mp)

    files = []
    for k in part_keys:
        pdir = os.path.join(parts_root, str(k))
        files += [os.path.join(pdir, f) for f in sorted(os.listdir(pdir))
                  if f.endswith(".parquet")]
    return read_parquet_clean(files)
