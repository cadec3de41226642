"""Deterministic train/test partitioning + negative sampling.

Replaces the reference's pickled partition dicts
(/root/reference/data_partition.py:31-148) with shuffle-free seeded hash
bucketing: membership is a pure function of (doc_id, seed), so any worker can
evaluate it without coordination and results are identical at any parallelism.

Negative sampling reproduces data_partition.py:55-60 semantics — per cand, n
index ids drawn without replacement, seeded by (seed, cand_id) — with a
*stable* hash instead of Python's salted builtin.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from engine.joins import stable_hash64


def split_bucket(doc_ids, seed: int, train_pct: int = 50) -> np.ndarray:
    """True where doc belongs to the train split."""
    h = stable_hash64([f"{d}|{seed}" for d in doc_ids])
    return (h % 100) < train_pct


def train_test_ids(intersection_ids: list[str], seed: int,
                   train_pct: int = 50) -> tuple[list[str], list[str]]:
    mask = split_bucket(intersection_ids, seed, train_pct)
    ids = np.asarray(intersection_ids, dtype=object)
    return ids[mask].tolist(), ids[~mask].tolist()


def negative_sample_pairs(cand_ids: ray.data.Dataset | list,
                          index_ids: list[str], neg_num: int,
                          seed: int) -> ray.data.Dataset:
    """(cand_id, cand_id) positive + ``neg_num`` sampled negatives per cand,
    labels included.  Distributed map_batches with the index id list
    broadcast; per-row RNG seeded by stable hash (deterministic)."""
    index_sorted = sorted(index_ids, key=int)
    ref = ray.put(np.asarray(index_sorted, dtype=object))

    def sample(batch: pa.Table) -> pa.Table:
        idx = ray.get(ref)
        cands, indexes, labels = [], [], []
        for cid in batch.column("cand_id").to_pylist():
            cands.append(cid)
            indexes.append(cid)
            labels.append(1)
            h = int(stable_hash64([cid])[0] % 1_000_000)
            rng = np.random.default_rng(seed + h)
            for neg in rng.choice(len(idx), size=min(neg_num, len(idx)),
                                  replace=False):
                nid = idx[neg]
                if nid != cid:  # reference drops accidental self-pairs
                    cands.append(cid)
                    indexes.append(nid)
                    labels.append(0)
        return pa.table({
            "cand_id": pa.array(cands, type=pa.string()),
            "index_id": pa.array(indexes, type=pa.string()),
            "label": pa.array(labels, type=pa.int8()),
        })

    if isinstance(cand_ids, list):
        cand_ids = ray.data.from_arrow(
            pa.table({"cand_id": pa.array(cand_ids, type=pa.string())}))
    cand_ids = cand_ids.repartition(16)
    return cand_ids.map_batches(sample, batch_format="pyarrow", batch_size=2048)
