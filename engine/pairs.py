"""Pair feature stage: (cand_id, index_id) pairs -> ratio feature vectors.

Reference semantics (/root/reference/process_pairs.py:42-66): for each of the
25 properties, feature = min(1000, round(cand_val / index_val, 3)); any error
(division by zero) -> 0.0.  Feature order = property order
(utils.get_feature_name_list / config.py:44-49).

Physical plan: property tables are broadcast as {doc_id -> float64[25]}
matrices (ray.put once, read per actor — the reference re-ships its whole
dict per Pool task, object_properties.py:43-48, which we avoid) and the ratio
kernel is fully vectorized per batch.  For index sides too large to
broadcast, use joins.bucketed_hash_join twice instead (documented scale path).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from engine.geometry import PROPERTY_NAMES

MAX_RATIO_VAL = 1000.0  # reference config.py:23
RATIO_FEATURE_NAMES = [f"{p}_ratio" for p in PROPERTY_NAMES]


def props_matrix(props_df: pd.DataFrame) -> tuple[dict, np.ndarray]:
    """{doc_id -> row index} + float64 (n, 25) matrix from a property table."""
    ids = {d: i for i, d in enumerate(props_df["doc_id"].tolist())}
    mat = props_df[PROPERTY_NAMES].to_numpy(dtype=np.float64)
    return ids, mat


def ratio_features(cand_vals: np.ndarray, index_vals: np.ndarray) -> np.ndarray:
    """Vectorized reference ratio kernel: min(1000, round(c/i, 3)).

    Reference values are numpy float64 scalars, so i == 0 never raises
    (the except-branch at process_pairs.py:51-53 is dead for the division
    operator): c/0 -> inf -> min(1000, inf) = 1000, and 0/0 -> nan ->
    Python min(1000, nan) = 1000.  We reproduce exactly that."""
    with np.errstate(divide="ignore", invalid="ignore"):
        r = cand_vals / index_vals
    r = np.round(r, 3)
    r[np.isnan(r)] = MAX_RATIO_VAL
    return np.minimum(r, MAX_RATIO_VAL)


def pair_features_dataset(pairs: ray.data.Dataset,
                          cand_props: pd.DataFrame,
                          index_props: pd.DataFrame,
                          concurrency: int = 4) -> ray.data.Dataset:
    """pairs (cand_id, index_id, ...) -> + 25 `<prop>_ratio` columns."""
    c_ids, c_mat = props_matrix(cand_props)
    i_ids, i_mat = props_matrix(index_props)
    ref = ray.put((c_ids, c_mat, i_ids, i_mat))

    class RatioActor:
        def __init__(self):
            self.c_ids, self.c_mat, self.i_ids, self.i_mat = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            cand = batch.column("cand_id").to_pylist()
            index = batch.column("index_id").to_pylist()
            ci = np.fromiter((self.c_ids[c] for c in cand), dtype=np.int64,
                             count=len(cand))
            ii = np.fromiter((self.i_ids[i] for i in index), dtype=np.int64,
                             count=len(index))
            feats = ratio_features(self.c_mat[ci], self.i_mat[ii])
            for j, name in enumerate(RATIO_FEATURE_NAMES):
                batch = batch.append_column(
                    name, pa.array(feats[:, j], type=pa.float64()))
            return batch

    # stateless TASK pool with the per-worker-process cache pattern
    # (pipeline.matching_inference_pipeline): the side matrices are plasma
    # refs fetched once per worker — no actor ramp, no ray#53727 surface,
    # fully elastic across whatever cores the executor has free
    holder: dict = {}

    def ratio_fn(batch: pa.Table) -> pa.Table:
        if "a" not in holder:
            holder["a"] = RatioActor()
        return holder["a"](batch)

    return pairs.map_batches(ratio_fn, batch_format="pyarrow",
                             batch_size=16384, concurrency=concurrency)


BROADCAST_MAX_SIDE_ROWS = 2_000_000  # ~430 MB of f64 side matrix per side


def pair_features_join(pairs: ray.data.Dataset, props: ray.data.Dataset,
                       num_buckets: int = 32,
                       strategy: str = "auto") -> ray.data.Dataset:
    """Dataset-native pair feature stage with size-aware plan selection.

    ``strategy='broadcast'`` (the small-side fast case — chosen by 'auto'
    when both property sides fit comfortably in a worker heap): each side's
    narrow (doc_id + 25 props) matrix is collected once, ``ray.put`` once,
    and pairs stream through a no-shuffle vectorized ratio map.

    ``strategy='join'`` (the 10^12 path — chosen by 'auto' beyond
    BROADCAST_MAX_SIDE_ROWS): pairs ⋈ props(cands) on cand_id, ⋈
    props(index) on index_id via two explicit bucketed hash joins
    (SURVEY §7.3); no property table ever lands on the driver.
    Both plans produce identical rows (tested).
    """
    import pyarrow.compute as pc

    from engine.joins import bucketed_hash_join

    if strategy == "auto":
        strategy = "broadcast" \
            if props.count() <= 2 * BROADCAST_MAX_SIDE_ROWS else "join"

    if strategy == "broadcast":
        # ONE narrow collect for both sides (was two full scans)
        pdf = props.select_columns(
            ["doc_id", "source", *PROPERTY_NAMES]).to_pandas()
        return pair_features_dataset(pairs,
                                     pdf[pdf.source == "cands"],
                                     pdf[pdf.source == "index"])

    def side(source: str, suffix: str) -> ray.data.Dataset:
        def pick(b: pa.Table) -> pa.Table:
            b = b.filter(pc.equal(b.column("source"), pa.scalar(source)))
            cols = {"doc_id": b.column("doc_id")}
            for p in PROPERTY_NAMES:
                cols[p + suffix] = b.column(p)
            return pa.table(cols)
        return props.map_batches(pick, batch_format="pyarrow")

    j = bucketed_hash_join(pairs, side("cands", "__c"),
                           "cand_id", "doc_id", num_buckets).drop_columns(["doc_id"])
    j = bucketed_hash_join(j, side("index", "__i"),
                           "index_id", "doc_id", num_buckets).drop_columns(["doc_id"])
    tmp_cols = [p + s for p in PROPERTY_NAMES for s in ("__c", "__i")]

    def ratio(batch: pa.Table) -> pa.Table:
        c = np.column_stack([batch.column(p + "__c").to_numpy()
                             for p in PROPERTY_NAMES])
        i = np.column_stack([batch.column(p + "__i").to_numpy()
                             for p in PROPERTY_NAMES])
        feats = ratio_features(c, i)
        batch = batch.drop_columns(tmp_cols)
        for k, name in enumerate(RATIO_FEATURE_NAMES):
            batch = batch.append_column(
                name, pa.array(feats[:, k], type=pa.float64()))
        return batch

    return j.map_batches(ratio, batch_format="pyarrow")


def concatenation_features_dataset(pairs: ray.data.Dataset,
                                   cand_props: pd.DataFrame,
                                   index_props: pd.DataFrame) -> ray.data.Dataset:
    """The reference's 'concatenation' operator variant
    (process_pairs.py:30-40): [cand props..., index props...] columns."""
    c_ids, c_mat = props_matrix(cand_props)
    i_ids, i_mat = props_matrix(index_props)
    ref = ray.put((c_ids, c_mat, i_ids, i_mat))

    def attach(batch: pa.Table) -> pa.Table:
        c_ids_, c_mat_, i_ids_, i_mat_ = ray.get(ref)
        cand = batch.column("cand_id").to_pylist()
        index = batch.column("index_id").to_pylist()
        ci = np.fromiter((c_ids_[c] for c in cand), dtype=np.int64, count=len(cand))
        ii = np.fromiter((i_ids_[i] for i in index), dtype=np.int64, count=len(index))
        for j, p in enumerate(PROPERTY_NAMES):
            batch = batch.append_column(f"{p}_cand",
                                        pa.array(c_mat_[ci, j], type=pa.float64()))
        for j, p in enumerate(PROPERTY_NAMES):
            batch = batch.append_column(f"{p}_index",
                                        pa.array(i_mat_[ii, j], type=pa.float64()))
        return batch

    return pairs.map_batches(attach, batch_format="pyarrow", batch_size=16384)
