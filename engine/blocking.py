"""BKAFI blocking: feature-importance-selected property vectors -> RobustScaler
-> exact kNN -> ranked candidate-pair table.

Reference: /root/reference/blocking.py.  Mapping:

* RobustScaler fit on cands / transform index (blocking.py:107-112) -> exact
  median/IQR quantiles computed over the (narrow) selected cand columns, then
  broadcast as constants.  At 10^12 rows this becomes a t-digest sketch
  aggregate; the two-pass shape is identical (SURVEY.md §7.4.2).
* KDTree.query(k=21) (blocking.py:113-118) -> actor-pool brute-force kNN per
  batch against the broadcast scaled index matrix (vectorized argpartition).
  Tie-break: (distance, numeric index id) — defined semantics, the KDTree's
  tie order is unspecified.
* incremental k-prefix pair lists (blocking.py:211-230) -> one ranked nn
  table; pairs for any k are `rank <= k` filters (no recompute).
* SDR factor (blocking.py:166-174): cand columns scaled by the train
  property-ratio means before the search.
* bkafi_criterion 'feature_importance' vs 'std' (blocking.py:135-142).
"""

from __future__ import annotations

import time

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from engine.geometry import PROPERTY_NAMES

NN_PARAM = 21  # config.py:60-61: max cand pairs per item (20) + 1


def robust_scale_stats(df: pd.DataFrame, cols: list[str]):
    """(median, iqr) per column — sklearn RobustScaler defaults
    (centering=median, scale=q75-q25); iqr of 0 degrades to 1 like sklearn."""
    med = np.array([np.percentile(df[c].to_numpy(), 50) for c in cols])
    q75 = np.array([np.percentile(df[c].to_numpy(), 75) for c in cols])
    q25 = np.array([np.percentile(df[c].to_numpy(), 25) for c in cols])
    iqr = q75 - q25
    iqr[iqr == 0.0] = 1.0
    return med, iqr


def weighted_percentile(values: np.ndarray, counts: np.ndarray, q: float) -> float:
    """np.percentile(method='linear') over a weighted (value, count)
    distribution, replicating numpy's virtual-index + lerp arithmetic
    bit-for-bit (numpy _quantile: virtual = q/100 * (n-1); lerp uses
    b - (b-a)*(1-t) for t >= 0.5).  ``values`` must be sorted ascending."""
    n = int(counts.sum())
    virtual = (q / 100.0) * (n - 1)
    lo = int(np.floor(virtual))
    t = virtual - lo
    cum = np.cumsum(counts)
    a = float(values[np.searchsorted(cum, lo, side="right")])
    hi = min(lo + 1, n - 1)
    b = float(values[np.searchsorted(cum, hi, side="right")])
    diff = b - a
    if t >= 0.5:
        return b - diff * (1.0 - t)
    return a + diff * t


def robust_scale_stats_ds(ds: ray.data.Dataset, cols: list[str],
                          sdr: np.ndarray | None = None):
    """Distributed RobustScaler stats: per-block (col, value) count partials
    -> one groupby-sum shuffle -> exact weighted percentiles from the merged
    distribution.  Driver memory is O(distinct values), never O(rows), and
    the result is bit-equal to np.percentile over the collected column
    (tested).  At 10^12 rows the exact count merge becomes a t-digest
    sketch; the two-pass fit->broadcast shape is unchanged (SURVEY §7.4.2).

    ``sdr``: positive per-column factors applied to the values BEFORE the
    percentiles (the reference's fit-on-sdr-scaled-cands semantics)."""
    def counts(batch: pa.Table) -> pa.Table:
        outs = []
        for j, c in enumerate(cols):
            v, n = np.unique(batch.column(c).to_numpy(), return_counts=True)
            outs.append(pa.table({
                "col": pa.array(np.full(len(v), j, dtype=np.int32)),
                "value": pa.array(v, type=pa.float64()),
                "n": pa.array(n.astype(np.int64)),
            }))
        return pa.concat_tables(outs)

    # two-phase aggregate: per-block unique+count partials (combiner) are
    # collected and merged on the driver — a full (col, value) groupby
    # shuffle costs a ~20s all-to-all here for zero benefit, since the
    # merged distribution must land on the driver anyway
    partials = ds.select_columns(cols) \
        .map_batches(counts, batch_format="pyarrow").to_pandas()
    agg = partials.groupby(["col", "value"], as_index=False)["n"].sum()
    sdr = np.ones(len(cols)) if sdr is None else np.asarray(sdr, dtype=np.float64)
    med, q25, q75 = (np.empty(len(cols)) for _ in range(3))
    for j in range(len(cols)):
        g = agg[agg.col == j].sort_values("value")
        vals = g["value"].to_numpy() * sdr[j]
        cnt = g["n"].to_numpy()
        med[j] = weighted_percentile(vals, cnt, 50)
        q75[j] = weighted_percentile(vals, cnt, 75)
        q25[j] = weighted_percentile(vals, cnt, 25)
    iqr = q75 - q25
    iqr[iqr == 0.0] = 1.0
    return med, iqr


def select_blocking_features(feature_importances: list[tuple[str, float]],
                             property_ratios: dict[str, dict],
                             bkafi_dim: int,
                             criterion: str = "feature_importance") -> list[str]:
    """Top-d property names.  'feature_importance': by model importance desc
    (blocking.py:139-141); 'std': by train property-ratio std asc
    (blocking.py:136-138; ratios are pre-sorted by std in classifier.py:231)."""
    if criterion == "std":
        return [p for p in list(property_ratios)[:bkafi_dim]]
    return [f.split("_ratio")[0] for f, _ in feature_importances[:bkafi_dim]]


def topk_l2_f32(X32: np.ndarray, idx32: np.ndarray, idx_sq: np.ndarray,
                idx_num: np.ndarray, k: int,
                tile: int = 64, chunk: int = 4096):
    """Threshold-pruned EXACT k-NN over L2-resident f32 tiles, tie-resolved
    by (d2, numeric index id).

    Per cand tile, only the FIRST index chunk pays a selection (argpartition
    for the kth value, then a tie-complete <= sweep); every later chunk does
    one SIMD compare of its distance block against the running kth-best and
    merges only the (rare) survivors with a tie-exact (d2, idx_num) lexsort.
    The old argpartition-per-chunk merge scanned every chunk with an
    introselect — measured 2x slower; the scan was selection-bound, not
    GEMM-bound.  Returns (top index positions, sqrt distances) shaped
    (n, min(k, n_idx)), rows ordered by (d2, idx_num)."""
    n_idx = len(idx32)
    kk = min(k, n_idx)
    chunk = max(chunk, kk)  # the seed chunk must hold a full top-k
    tops, dists = [], []
    for t0 in range(0, len(X32), tile):
        Xt = X32[t0:t0 + tile]
        nt = len(Xt)
        x_sq = (Xt * Xt).sum(1)[:, None]
        e0 = min(chunk, n_idx)
        d2 = x_sq - 2.0 * (Xt @ idx32[:e0].T) + idx_sq[None, :e0]
        best_d = np.empty((nt, kk), dtype=d2.dtype)
        best_i = np.empty((nt, kk), dtype=np.int64)
        if kk < e0:
            part = np.argpartition(d2, kk - 1, axis=1)[:, :kk]
            thr = np.take_along_axis(d2, part, axis=1).max(axis=1)
        else:
            thr = d2.max(axis=1)
        for r in range(nt):
            cols = np.nonzero(d2[r] <= thr[r])[0]
            o = np.lexsort((idx_num[cols], d2[r, cols]))[:kk]
            best_d[r] = d2[r, cols[o]]
            best_i[r] = cols[o]
            thr[r] = best_d[r, -1]
        for c in range(chunk, n_idx, chunk):
            e = min(c + chunk, n_idx)
            d2 = x_sq - 2.0 * (Xt @ idx32[c:e].T) + idx_sq[None, c:e]
            hit_r, hit_c = np.nonzero(d2 <= thr[:, None])
            for r in np.unique(hit_r):
                cols = hit_c[hit_r == r]
                dall = np.concatenate([best_d[r], d2[r, cols]])
                iall = np.concatenate([best_i[r], cols + c])
                o = np.lexsort((idx_num[iall], dall))[:kk]
                best_d[r] = dall[o]
                best_i[r] = iall[o]
                thr[r] = best_d[r, -1]
        tops.append(best_i)
        dists.append(np.sqrt(np.maximum(best_d, 0.0)))
    return np.concatenate(tops, 0), np.concatenate(dists, 0)


def bkafi_nn_dataset(cand_props: ray.data.Dataset, index_df: pd.DataFrame,
                     features: list[str], bkafi_dim: int,
                     sdr_factors: np.ndarray | None = None,
                     nn_param: int = NN_PARAM,
                     concurrency: int = 4,
                     stats: tuple | None = None,
                     exact: bool = False) -> tuple[ray.data.Dataset, float]:
    """kNN of every cand against the index in the selected feature space.

    ``cand_props`` streams; ``index_df`` (doc_id + selected columns, pandas)
    is scaled and broadcast (the small side by design — the shuffle
    alternative is cell_blocking).  Scaler stats are fit on the cand side
    with the DISTRIBUTED exact-quantile aggregate (never collects the
    column), on the sdr-scaled cand values (reference blocking.py:154-174 +
    107-112 multiplies cand vectors by the factor BEFORE fit_transform, so
    the factor's net effect falls on the index transform while cand query
    points are unchanged).  ``stats``: optional precomputed (med, iqr).

    ``exact``: f64 precision-parameterized variant of the same operator —
    distances accumulate elementwise per feature in declared order
    (sum((c_f - i_f)^2), left-associated) so every d2/dist is a
    deterministic IEEE chain replicable 1:1 in SQL; chunk merges are
    tie-correct via (d2, idx_num) lexsort.  This is the path the DuckDB
    oracle checks bit-for-bit; the default f32-tile path is the
    throughput configuration (same ranking semantics up to precision).
    Returns (nn dataset with bkafi_dim/cand_id/index_id/rank/dist, exec_seconds).
    """
    sdr = np.ones(len(features)) if sdr_factors is None else np.asarray(
        sdr_factors, dtype=np.float64)
    med, iqr = stats if stats is not None else robust_scale_stats_ds(
        cand_props, features, sdr=sdr)

    idx_mat = (index_df[features].to_numpy(dtype=np.float64) - med) / iqr
    idx_ids = index_df["doc_id"].to_numpy()
    idx_num = index_df["doc_id"].astype(np.int64).to_numpy()
    start = time.time()
    ref = ray.put((idx_mat, idx_ids, idx_num, med, iqr))

    # float32 like the reference's vectors (blocking.py:109-110).  Tile sizes
    # keep the distance block (tile*chunk*4B ~ 1 MiB) L2-resident: this stage
    # is DRAM-bandwidth-bound when run on every core, and large temporaries
    # collapse multi-worker scaling (measured 13x on 16 workers).
    TILE, CHUNK = 64, 4096

    class KnnActor:
        def __init__(self):
            self.idx_mat, self.idx_ids, self.idx_num, self.med, self.iqr = ray.get(ref)
            self.idx32 = np.ascontiguousarray(self.idx_mat, dtype=np.float32)
            self.idx_sq = (self.idx32 * self.idx32).sum(1)

        def _topk_exact_tile(self, Xt: np.ndarray):
            """Exact-f64 top-k for one cand tile: per-feature elementwise
            (c-i)^2 accumulation in declared feature order (left-assoc IEEE
            chain — SQL-replicable), chunked over the index with a
            tie-correct (d2, idx_num) lexsort merge."""
            n = len(Xt)
            n_idx = len(self.idx_mat)
            best_d = best_i = None
            rows = np.arange(n)[:, None]
            for s in range(0, n_idx, CHUNK):
                e = min(s + CHUNK, n_idx)
                d2 = np.zeros((n, e - s))
                for f in range(Xt.shape[1]):
                    d = Xt[:, f][:, None] - self.idx_mat[None, s:e, f]
                    d2 += d * d
                kk = min(nn_param, e - s)
                loc = np.lexsort((self.idx_num[s:e][None, :].repeat(n, 0), d2),
                                 axis=1)[:, :kk]
                dloc = d2[rows, loc]
                iloc = loc.astype(np.int64) + s
                if best_d is None:
                    best_d, best_i = dloc, iloc
                else:
                    dall = np.concatenate([best_d, dloc], axis=1)
                    iall = np.concatenate([best_i, iloc], axis=1)
                    kk2 = min(nn_param, dall.shape[1])
                    order = np.lexsort((self.idx_num[iall], dall),
                                       axis=1)[:, :kk2]
                    best_d = np.take_along_axis(dall, order, axis=1)
                    best_i = np.take_along_axis(iall, order, axis=1)
            order = np.lexsort((self.idx_num[best_i], best_d), axis=1)
            top = np.take_along_axis(best_i, order, axis=1)
            return top, np.sqrt(np.take_along_axis(best_d, order, axis=1))

        def _topk_tile(self, Xt: np.ndarray):
            """top nn_param for one cand tile: threshold-pruned exact scan
            (topk_l2_f32), tie-exact by (d2, idx_num)."""
            return topk_l2_f32(Xt, self.idx32, self.idx_sq, self.idx_num,
                               nn_param, tile=TILE, chunk=CHUNK)

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids = batch.column("doc_id").to_pylist()
            X = np.column_stack([batch.column(c).to_numpy() for c in features])
            X = (X * sdr - self.med) / self.iqr
            topk = self._topk_exact_tile if exact else self._topk_tile
            if not exact:
                X = X.astype(np.float32)
            tops, dists = [], []
            for s in range(0, len(X), TILE):
                t, d = topk(X[s:s + TILE])
                tops.append(t)
                dists.append(d)
            top = np.concatenate(tops, axis=0)
            dtop = np.concatenate(dists, axis=0)
            n, kk = top.shape
            return pa.table({
                "bkafi_dim": pa.array(np.full(n * kk, bkafi_dim, dtype=np.int32)),
                "cand_id": pa.array(np.repeat(np.asarray(ids, dtype=object), kk).tolist(),
                                    type=pa.string()),
                "index_id": pa.array(self.idx_ids[top].ravel().tolist(), type=pa.string()),
                "rank": pa.array(np.tile(np.arange(1, kk + 1, dtype=np.int32), n)),
                "dist": pa.array(dtop.ravel().astype(np.float64), type=pa.float64()),
            })

    # stateless TASK pool with the worker-process cache pattern from the
    # fused apply path (pipeline.matching_inference_pipeline): the closure is
    # deserialized once per worker, so the scaled index tiles are built once
    # per process from the plasma ref — no actor ramp, fully elastic, and
    # identical math to the former actor pool
    holder: dict = {}

    def knn_fn(batch: pa.Table) -> pa.Table:
        if "a" not in holder:
            holder["a"] = KnnActor()
        return holder["a"](batch)

    cands = cand_props.select_columns(["doc_id", *features]) \
        .repartition(concurrency * 4)
    nn = cands.map_batches(knn_fn, batch_format="pyarrow", batch_size=1024,
                           concurrency=concurrency)
    return nn, time.time() - start


def pairs_from_nn(nn: ray.data.Dataset, k: int) -> ray.data.Dataset:
    """Candidate pairs at cutoff k = rank<=k filter over the ranked nn table
    (the reference's incremental prefix dicts, blocking.py:211-230).
    Adds the key-equality label (pipelines.py:433-434)."""
    import pyarrow.compute as pc

    def cut(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.less_equal(batch.column("rank"), pa.scalar(k)))
        lbl = pc.cast(pc.equal(batch.column("cand_id"), batch.column("index_id")),
                      pa.int8())
        return batch.append_column("label", lbl)

    return nn.map_batches(cut, batch_format="pyarrow")


def threshold_filter(nn: ray.data.Dataset, threshold: float) -> ray.data.Dataset:
    """Keep neighbors with dist <= threshold (bkafi_with_threshold.py:232-255)."""
    import pyarrow.compute as pc
    return nn.map_batches(
        lambda b: b.filter(pc.less_equal(b.column("dist"), pa.scalar(threshold))),
        batch_format="pyarrow")


def centroid_nn_dataset(cand_df: pd.DataFrame, index_df: pd.DataFrame,
                        nn_param: int = NN_PARAM,
                        transform: bool = False) -> pd.DataFrame:
    """The 'centroid' / 'centroid_with_transform' exhaustive blockers
    (blocking.py:62-92): brute-force L2 over 2D world centroids, optional
    Kabsch/SVD rigid alignment of the cand cloud onto the index cloud.

    Distances are EXACT elementwise (cx-ix)^2 + (cy-iy)^2 in f64 — on the
    dyadic-rational corpus every d2 is an exact dyadic value, so the output
    (incl. dist2) is bit-checkable against the DuckDB window-SQL oracle.
    Computed in cand tiles to bound the (tile, n_index) temporary."""
    cxy = cand_df[["cx", "cy"]].to_numpy(dtype=np.float64)
    ixy = index_df[["cx", "cy"]].to_numpy(dtype=np.float64)
    if transform:
        cxy = kabsch_transform(cxy, ixy)
    idx_num = index_df["doc_id"].astype(np.int64).to_numpy()
    idx_ids = index_df["doc_id"].to_numpy()
    kk = min(nn_param, len(ixy))
    TILE = 256
    tops, d2s = [], []
    for s in range(0, len(cxy), TILE):
        ct = cxy[s:s + TILE]
        dx = ct[:, 0][:, None] - ixy[None, :, 0]
        dy = ct[:, 1][:, None] - ixy[None, :, 1]
        d2 = dx * dx + dy * dy
        part = np.argpartition(d2, kk - 1, axis=1)[:, :kk]
        rows = np.arange(len(ct))[:, None]
        order = np.lexsort((idx_num[part], d2[rows, part]), axis=1)
        top = part[rows, order]
        tops.append(top)
        d2s.append(d2[rows, top])
    top = np.concatenate(tops, 0)
    d2 = np.concatenate(d2s, 0)
    return pd.DataFrame({
        "cand_id": np.repeat(cand_df["doc_id"].to_numpy(), kk),
        "index_id": idx_ids[top].ravel(),
        "rank": np.tile(np.arange(1, kk + 1, dtype=np.int32), len(cxy)),
        "dist2": d2.ravel(),
    })


def kabsch_transform(source: np.ndarray, target: np.ndarray) -> np.ndarray:
    """SVD rigid alignment + isotropic scale of ``source`` onto ``target``'s
    frame (the reference's centroid_with_transform step, blocking.py:78-92:
    global means -> covariance H -> SVD -> rotation with det fix -> scale)."""
    src_mean = source.mean(axis=0)
    tgt_mean = target.mean(axis=0)
    sc = source - src_mean
    tc = target - tgt_mean
    m = min(len(sc), len(tc))
    H = sc[:m].T @ tc[:m]
    U, S, Vt = np.linalg.svd(H)
    R = U @ Vt
    if np.linalg.det(R) < 0:
        Vt[-1, :] *= -1
        R = U @ Vt
    s = np.linalg.norm(tc[:m]) / np.linalg.norm(sc[:m])
    return s * (sc @ R) + tgt_mean


# ---------------------------------------------------------------------------
# Blocker registry — the reference's name -> method dispatch (blocking.py:47-56)
# ---------------------------------------------------------------------------

def embedding_nn_dataset(cand_emb: ray.data.Dataset, index_emb: pd.DataFrame,
                         nn_param: int = NN_PARAM,
                         exact: bool = False,
                         repartition_blocks: int | None = None
                         ) -> ray.data.Dataset:
    """Embedding blocker (the reference's ViT path, blocking.py:176-191):
    inner-product top-k over per-object embedding vectors, as a streaming
    map_batches with the (small-side) index embedding matrix broadcast —
    the same physical shape as its bkafi sibling, never a driver-side
    all-pairs matmul.  ``cand_emb`` streams (doc_id, feature); ties by
    numeric doc id like every other blocker.

    ``exact``: SQL-replicable cosine precision mode — expects integer-valued
    ``raw`` feature vectors plus a precomputed ``norm`` column on both sides
    and scores cosine as int_dot / (norm_c * norm_i).  The integer dot is
    exact in f64 regardless of summation order, and the two remaining
    roundings (one multiply, one divide) are single IEEE operations, so a
    DuckDB oracle reproduces every score bit-for-bit.  The default mode dots
    the pre-normalized float vectors (the shape a real CLIP/ViT encoder
    output takes)."""
    from engine.joins import list_column_matrix
    feat_col = "raw" if exact else "feature"
    iv = np.asarray(index_emb[feat_col].tolist(), dtype=np.float64)
    idx_ids = index_emb["doc_id"].to_numpy()
    idx_num = index_emb["doc_id"].astype(np.int64).to_numpy()
    idx_norm = index_emb["norm"].to_numpy(dtype=np.float64) if exact else None
    ref = ray.put((iv, idx_ids, idx_num, idx_norm))

    def topk(batch: pa.Table) -> pa.Table:
        iv_, ids_, num_, inorm_ = ray.get(ref)
        cv = list_column_matrix(batch.column(feat_col))
        sim = cv @ iv_.T
        if exact:
            cnorm = batch.column("norm").to_numpy(zero_copy_only=False)
            sim = sim / (cnorm[:, None] * inorm_[None, :])
        kk = min(nn_param, sim.shape[1])
        rows = np.arange(len(cv))[:, None]
        # full tie-aware ranking (score desc, numeric id asc) — argpartition
        # alone breaks boundary ties arbitrarily
        order = np.lexsort((np.broadcast_to(num_, sim.shape), -sim),
                           axis=1)[:, :kk]
        n = len(cv)
        return pa.table({
            "cand_id": pa.array(
                np.repeat(np.asarray(batch.column("doc_id").to_pylist(),
                                     dtype=object), kk).tolist(),
                type=pa.string()),
            "index_id": pa.array(ids_[order].ravel().tolist(),
                                 type=pa.string()),
            "rank": pa.array(np.tile(np.arange(1, kk + 1, dtype=np.int32), n)),
            "score": pa.array(sim[rows, order].ravel(), type=pa.float64()),
        })

    # repartition is opt-in: the cand side usually arrives with enough read
    # blocks for full width, and an unconditional repartition added an
    # all-to-all barrier per call; pass repartition_blocks for single-block
    # inputs.
    if repartition_blocks:
        cand_emb = cand_emb.repartition(repartition_blocks)
    return cand_emb.map_batches(
        topk, batch_format="pyarrow", batch_size=1024)


# Declared broadcast bound for the embedding blocker's index side: under
# this many rows the index matrix is one driver DataFrame + ray.put (the
# reference's faiss-index shape); above it embedding_nn_sharded stages the
# matrix shard-by-shard so the driver never holds the whole index.
MAX_BROADCAST_INDEX_ROWS = 1_000_000


def embedding_nn_sharded(cand_emb: ray.data.Dataset,
                         index_emb: ray.data.Dataset,
                         nn_param: int = NN_PARAM,
                         shard_rows: int = 65536,
                         exact: bool = False,
                         repartition_blocks: int | None = None
                         ) -> ray.data.Dataset:
    """Exact inner-product top-k for an index side too large to collect as
    one broadcast DataFrame: the index embedding matrix is staged
    shard-by-shard into the object store (driver peak memory = one shard)
    and each cand batch folds the shards through a running tie-aware
    (score desc, numeric id asc) top-k merge.  Sharding splits the index
    ROWS, never the dot-product reduction, and the tie order is total, so
    every output row is bit-identical to embedding_nn_dataset's — pinned by
    test_operators equality.  This is still the honest exact-kNN scan; at
    10^12 index rows route through the approximate siblings
    (similarity.lsh_knn / ivf_knn) or blocking.cell_blocking."""
    from engine.joins import list_column_matrix
    feat_col = "raw" if exact else "feature"
    if hasattr(index_emb, "iter_batches"):
        index_batches = index_emb.iter_batches(batch_size=shard_rows,
                                               batch_format="pyarrow")
    else:                      # pre-pulled batch iterable (the auto gate)
        index_batches = index_emb
    shard_refs, total = [], 0
    for b in index_batches:
        iv = list_column_matrix(b.column(feat_col))
        id_list = b.column("doc_id").to_pylist()
        ids = np.asarray(id_list, dtype=object)
        num = np.asarray(id_list).astype(np.int64)
        inorm = b.column("norm").to_numpy(zero_copy_only=False) if exact \
            else None
        total += len(ids)
        shard_refs.append(ray.put((iv, ids, num, inorm)))
    kk = min(nn_param, total)

    def topk(batch: pa.Table) -> pa.Table:
        cv = list_column_matrix(batch.column(feat_col))
        n = len(cv)
        cnorm = batch.column("norm").to_numpy(zero_copy_only=False) \
            if exact else None
        # NaN (not -inf) is the empty-slot sentinel: np.lexsort sorts NaN
        # LAST, so sentinels lose to every real entry — including real
        # entries whose exact-mode score is itself NaN (zero-norm vectors),
        # where the secondary numeric-id key decides, exactly like the
        # broadcast path's one-shot lexsort.  A -inf sentinel would WIN
        # against NaN-scored real entries and surface null ids.
        best_s = np.full((n, kk), np.nan)
        best_n = np.full((n, kk), np.iinfo(np.int64).max, dtype=np.int64)
        best_i = np.full((n, kk), None, dtype=object)
        rows = np.arange(n)[:, None]
        for ref in shard_refs:
            iv_, ids_, num_, inorm_ = ray.get(ref)
            sim = cv @ iv_.T
            if exact:
                sim = sim / (cnorm[:, None] * inorm_[None, :])
            all_s = np.concatenate([best_s, sim], axis=1)
            all_n = np.concatenate(
                [best_n, np.broadcast_to(num_, sim.shape)], axis=1)
            all_i = np.concatenate(
                [best_i, np.broadcast_to(ids_, sim.shape)], axis=1)
            order = np.lexsort((all_n, -all_s), axis=1)[:, :kk]
            best_s = all_s[rows, order]
            best_n = all_n[rows, order]
            best_i = all_i[rows, order]
        return pa.table({
            "cand_id": pa.array(
                np.repeat(np.asarray(batch.column("doc_id").to_pylist(),
                                     dtype=object), kk).tolist(),
                type=pa.string()),
            "index_id": pa.array(best_i.ravel().tolist(), type=pa.string()),
            "rank": pa.array(np.tile(np.arange(1, kk + 1, dtype=np.int32),
                                     n)),
            "score": pa.array(best_s.ravel(), type=pa.float64()),
        })

    if repartition_blocks:   # opt-in, same contract as the broadcast path
        cand_emb = cand_emb.repartition(repartition_blocks)
    return cand_emb.map_batches(
        topk, batch_format="pyarrow", batch_size=1024)


def embedding_nn_auto(cand_emb: ray.data.Dataset,
                      index_emb: ray.data.Dataset,
                      nn_param: int = NN_PARAM,
                      exact: bool = False,
                      max_broadcast_rows: int = MAX_BROADCAST_INDEX_ROWS,
                      shard_rows: int = 65536) -> ray.data.Dataset:
    """Size-gated embedding blocker (the same size-aware plan pairs.py:83
    and relational.shipping_priority use), decided in ONE streaming pass
    over the index side: batches accumulate on the driver only while the
    running row count stays under ``max_broadcast_rows`` (then broadcast —
    the reference's faiss-index shape); the moment the bound trips, the
    prefix plus the rest of the SAME stream become object-store shards
    (bit-identical output either way, never an O(index) driver collect and
    never a second counting execution)."""
    import itertools
    cols = ["doc_id", "raw", "norm"] if exact else ["doc_id", "feature"]
    proj = index_emb.select_columns(cols)
    # iter() is load-bearing: iter_batches returns an ITERABLE whose every
    # iteration restarts the stream — chaining the iterable itself would
    # replay the prefix rows a second time.
    it = iter(proj.iter_batches(batch_size=shard_rows,
                                batch_format="pyarrow"))
    prefix, total = [], 0
    for b in it:
        prefix.append(b)
        total += b.num_rows
        if total > max_broadcast_rows:
            return embedding_nn_sharded(
                cand_emb, itertools.chain(prefix, it), nn_param=nn_param,
                shard_rows=shard_rows, exact=exact)
    index_df = pa.concat_tables(prefix).to_pandas() if prefix else \
        proj.limit(0).to_pandas()
    return embedding_nn_dataset(cand_emb, index_df,
                                nn_param=nn_param, exact=exact)


BLOCKER_REGISTRY = {
    "bkafi": bkafi_nn_dataset,             # feature-space kNN (actor pool)
    "centroid": centroid_nn_dataset,       # exhaustive 2D centroid L2
    "centroid_with_transform": lambda c, i, **kw: centroid_nn_dataset(
        c, i, transform=True, **kw),
    "embedding": embedding_nn_dataset,     # ViT/CLIP-slot inner-product top-k
}


def get_blocker(name: str):
    try:
        return BLOCKER_REGISTRY[name]
    except KeyError:
        raise ValueError(f"unknown blocking method {name!r}; "
                         f"available: {sorted(BLOCKER_REGISTRY)}")


# ---------------------------------------------------------------------------
# Cell-partitioned candidate generation (the 10^12-scale blocking path)
# ---------------------------------------------------------------------------

def cell_blocking(props: ray.data.Dataset, res: int = 9, ring: int = 1,
                  salt_threshold: int = 2000, nn_param: int = NN_PARAM) -> ray.data.Dataset:
    """Candidate pairs via spatial-cell co-partitioning — no broadcast index.

    Replaces the global KDTree with a shuffle (SURVEY.md §2.5 J3(b)): every
    object maps to its centroid's cell; cands additionally replicate to the
    Chebyshev ring (so near-boundary matches are not lost); one
    groupby(cell) co-partitions both sources; per cell, each cand takes its
    top-`nn_param` nearest index objects locally; a final per-cand re-reduce
    merges cell-local candidates (rank re-assigned globally).

    Skew handling: a hot cell (more rows than ``salt_threshold``) is split by
    a stable hash of the *index* id into sub-cells, and the cands of that
    cell replicate to every sub-cell — same output as unsalted, bounded
    group size (tested).  Output: cand_id, index_id, rank, dist2.
    """
    import pyarrow.compute as pc

    from engine import cells as cell_mod
    from engine.joins import fast_hash64

    cs = cell_mod.cell_size(res)

    R = 2 * ring + 1
    dxy = np.array([(dx, dy) for dx in range(-ring, ring + 1)
                    for dy in range(-ring, ring + 1)], dtype=np.int64)

    def assign(batch: pa.Table) -> pa.Table:
        """Vectorized cell assignment: index rows -> their cell; cand rows
        -> the full Chebyshev ring (np.repeat explode + Table.take — no
        per-row Python, same shape as spatial.tiles_dataset)."""
        import pyarrow.compute as pc
        cx = batch.column("cx").to_numpy()
        cy = batch.column("cy").to_numpy()
        is_cand = pc.equal(batch.column("source"), pa.scalar("cands")) \
            .to_numpy(zero_copy_only=False)
        ix = np.floor(cx / cs).astype(np.int64)
        iy = np.floor(cy / cs).astype(np.int64)
        n_side = 1 << res
        idx_rows = np.nonzero(~is_cand)[0]
        cand_rows = np.nonzero(is_cand)[0]
        jx = ix[cand_rows][:, None] + dxy[None, :, 0]
        jy = iy[cand_rows][:, None] + dxy[None, :, 1]
        valid = ((jx >= 0) & (jx < n_side) & (jy >= 0) & (jy < n_side)).ravel()
        take_c = np.repeat(cand_rows, R * R)[valid]
        cell_c = cell_mod.encode(res, jx.ravel()[valid], jy.ravel()[valid])
        cell_i = cell_mod.encode(res, ix[idx_rows], iy[idx_rows])
        out = batch.take(pa.array(np.concatenate([idx_rows, take_c])))
        return out.append_column(
            "cell", pa.array(np.concatenate([cell_i, cell_c]),
                             type=pa.int64()))

    # pinned to the object store: feeds both the hot-cell count and the salt
    # stage (lazy branches would re-execute the assignment twice)
    assigned = props.select_columns(["doc_id", "source", "cx", "cy"]) \
        .map_batches(assign, batch_format="pyarrow").materialize()

    # hot-cell salting: count per cell, broadcast the hot set, split index
    # rows into sub-cells (cands replicate to all salts of their cell)
    from ray.data.aggregate import Count
    counts = assigned.groupby("cell").aggregate(Count(alias_name="n")).to_pandas()
    hot = {int(c): int(np.ceil(n / salt_threshold))
           for c, n in zip(counts.cell, counts.n) if n > salt_threshold}
    hot_ref = ray.put(hot)

    def salt(batch: pa.Table) -> pa.Table:
        """Vectorized hot-cell salting: index rows hash into one sub-cell,
        cand rows of hot cells replicate to every sub-cell (np.repeat
        index arithmetic + Table.take — no per-row .as_py())."""
        hot_map = ray.get(hot_ref)
        if not hot_map:
            return batch.append_column(
                "salted", pc.cast(pc.shift_left(batch.column("cell"),
                                                pa.scalar(6)), pa.int64()))
        cell = batch.column("cell").to_numpy()
        is_cand = pc.equal(batch.column("source"), pa.scalar("cands")) \
            .to_numpy(zero_copy_only=False)
        h = fast_hash64(batch.column("doc_id").to_pylist())
        n_salt = pd.Series(cell).map(hot_map).fillna(1).to_numpy(np.int64)
        reps = np.where(is_cand, n_salt, 1)
        idx = np.repeat(np.arange(batch.num_rows), reps)
        start = np.cumsum(reps) - reps
        # per-replica offset 0..reps_i-1 (cand rows enumerate sub-cells)
        offset = np.arange(int(reps.sum()), dtype=np.int64) \
            - np.repeat(start, reps)
        base = (h % n_salt.astype(np.uint64)).astype(np.int64)
        salt_vals = np.where(np.repeat(is_cand, reps), offset,
                             np.repeat(base, reps))
        salted = (np.repeat(cell, reps).astype(np.int64) << 6) | salt_vals
        out = batch.take(pa.array(idx))
        return out.append_column("salted", pa.array(salted, type=pa.int64()))

    # coarse shuffle buckets: one Ray group per ~64th of the key space, with
    # C-speed pandas segmentation inside — per-KEY map_groups would pay
    # ~1 ms of per-group overhead on tens of thousands of near-empty cells
    NUM_BUCKETS = 64

    def add_bucket(batch: pa.Table) -> pa.Table:
        s = batch.column("salted").to_numpy()
        return batch.append_column(
            "__bucket", pa.array(((s ^ (s >> 17)) % NUM_BUCKETS).astype(np.int64)))

    salted = assigned.map_batches(salt, batch_format="pyarrow") \
        .map_batches(add_bucket, batch_format="pyarrow")

    _EMPTY = {"cand_id": pd.Series([], dtype="object"),
              "index_id": pd.Series([], dtype="object"),
              "dist2": pd.Series([], dtype="float64")}

    def local_pairs_bucket(g: pd.DataFrame) -> pd.DataFrame:
        """Vectorized per-cell candidate generation for one shuffle bucket:
        ONE cands⋈index merge on the cell key replaces per-cell slicing
        (cell cross-products are bounded by the salting cap), then a
        cumcount top-k per (cell, cand)."""
        C = g[g.source == "cands"][["doc_id", "salted", "cx", "cy"]] \
            .rename(columns={"doc_id": "cand_id", "cx": "ccx", "cy": "ccy"})
        I = g[g.source == "index"][["doc_id", "salted", "cx", "cy"]] \
            .rename(columns={"doc_id": "index_id", "cx": "icx", "cy": "icy"})
        m = C.merge(I, on="salted")
        if m.empty:
            return pd.DataFrame(_EMPTY)
        dx = m.ccx.to_numpy() - m.icx.to_numpy()
        dy = m.ccy.to_numpy() - m.icy.to_numpy()
        m["dist2"] = dx * dx + dy * dy
        m["_num"] = m.index_id.astype(np.int64)
        m = m.sort_values(["salted", "cand_id", "dist2", "_num"],
                          kind="mergesort")
        rk = m.groupby(["salted", "cand_id"], sort=False).cumcount()
        m = m[rk.to_numpy() < nn_param]
        return m[["cand_id", "index_id", "dist2"]].reset_index(drop=True)

    local = salted.groupby("__bucket").map_groups(
        local_pairs_bucket, batch_format="pandas")

    def add_cand_bucket(batch: pa.Table) -> pa.Table:
        num = pc.cast(batch.column("cand_id"), pa.int64()).to_numpy()
        return batch.append_column(
            "__cb", pa.array((num % NUM_BUCKETS).astype(np.int64)))

    def rerank_bucket(g: pd.DataFrame) -> pd.DataFrame:
        """Fully vectorized per-cand top-k within the bucket: dedup, sort by
        (cand, dist2, numeric id), cumcount rank, cut at nn_param."""
        g = g.drop_duplicates(["cand_id", "index_id"]).copy()
        g["_num"] = g.index_id.astype(np.int64)
        g = g.sort_values(["cand_id", "dist2", "_num"], kind="mergesort")
        g["rank"] = (g.groupby("cand_id", sort=False).cumcount() + 1) \
            .astype(np.int32)
        g = g[g["rank"] <= nn_param]
        return g.drop(columns=["_num", "__cb"]).reset_index(drop=True)

    return local.map_batches(add_cand_bucket, batch_format="pyarrow") \
        .groupby("__cb").map_groups(rerank_bucket, batch_format="pandas")
