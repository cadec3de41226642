"""Similarity search over an embedding column (list<float>).

Baseline: brute-force cosine top-k — the big side streams, the (small) query
matrix is broadcast, each batch emits local top-k which a tiny driver reduce
merges (local partial top-k + re-reduce; no global sort).  Scale path: LSH /
IVF bucketing (random hyperplanes) that restricts the scan to matching
buckets — same physical shape as the reference's faiss IndexLSH alternative
(/root/reference/blocking.py:94-104).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from engine.joins import list_column_matrix


def _query_matrix(emb: ray.data.Dataset, query_ids: list[int]):
    """(qids, unit-normalized query matrix) — the tiny broadcast side."""
    import pyarrow.compute as pc
    qset = pa.array(query_ids, type=pa.int64())
    qdf = emb.map_batches(
        lambda b: b.filter(pc.is_in(b.column("vec_id"), value_set=qset)),
        batch_format="pyarrow").to_pandas()
    qv = np.asarray(qdf["embedding"].tolist(), dtype=np.float64)
    qn = qv / np.linalg.norm(qv, axis=1, keepdims=True)
    return qdf["vec_id"].to_numpy(), qn


def brute_knn(emb: ray.data.Dataset, query_ids: list[int], k: int = 10) -> pd.DataFrame:
    """Exact cosine top-k: (qid, neighbor_id, rank) — rank by (sim desc, id asc)."""
    qids, qn = _query_matrix(emb, query_ids)
    ref = ray.put((qids, qn))

    def local_topk(batch: pa.Table) -> pa.Table:
        qids_, qn_ = ray.get(ref)
        vecs = list_column_matrix(batch.column("embedding"))
        ids = batch.column("vec_id").to_numpy()
        vn = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
        sim = qn_ @ vn.T  # (nq, nb)
        kk = min(k, sim.shape[1])
        # tie-aware local reduce: full lexsort by (-sim, id) per row so the
        # local top-k agrees with the global (sim DESC, id ASC) tie-break —
        # argpartition alone keeps an arbitrary subset of boundary ties
        order = np.lexsort((np.broadcast_to(ids, sim.shape), -sim),
                           axis=1)[:, :kk]
        return pa.table({
            "qid": pa.array(np.repeat(qids_.astype(np.int64), kk)),
            "neighbor_id": pa.array(ids[order].ravel().astype(np.int64)),
            "sim": pa.array(np.take_along_axis(sim, order, axis=1).ravel(),
                            type=pa.float64()),
        })

    partials = emb.map_batches(local_topk, batch_format="pyarrow").to_pandas()
    # final re-reduce on the (tiny) union of local top-k sets
    partials = partials.sort_values(
        ["qid", "sim", "neighbor_id"], ascending=[True, False, True])
    partials["rank"] = partials.groupby("qid").cumcount() + 1
    out = partials[partials["rank"] <= k][["qid", "neighbor_id", "rank"]]
    out["rank"] = out["rank"].astype(np.int32)
    return out.reset_index(drop=True)


def _kmeans_fit(sample: np.ndarray, n_clusters: int, n_iter: int = 10
                ) -> np.ndarray:
    """Deterministic mini k-means (no RNG: first-rows init, fixed iteration
    count, stable argmin ties) — the IVF coarse quantizer.  Distances via the
    |a-b|^2 = |a|^2 - 2ab + |b|^2 matmul identity: the temporaries are
    (n, k), not (n, k, dim) — the 3-D broadcast version allocated ~30 MB per
    iteration, which this host's big-allocation pathology turns into seconds
    (see BASELINE.md host notes)."""
    centroids = sample[:n_clusters].copy()
    s_sq = (sample * sample).sum(1)[:, None]
    for _ in range(n_iter):
        d2 = s_sq - 2.0 * (sample @ centroids.T) + (centroids * centroids).sum(1)[None, :]
        assign = d2.argmin(axis=1)
        for c in range(n_clusters):
            m = assign == c
            if m.any():
                centroids[c] = sample[m].mean(axis=0)
    return centroids


def ivf_knn(emb: ray.data.Dataset, query_ids: list[int], k: int = 10,
            n_clusters: int = 16, n_probe: int = 6,
            max_sample: int = 8192) -> pd.DataFrame:
    """IVF-bucketed ANN — the faiss IndexIVFFlat recipe as Ray stages.

    Coarse quantizer: deterministic k-means fit on a hash-thinned sample
    BOUNDED to ``max_sample`` rows regardless of corpus size (the thinning
    modulus derives from a metadata count, so the driver collect is O(fixed),
    never O(corpus) — a percentage sample would OOM the driver at 10^12
    vectors).  Scan: corpus streams once; each batch assigns its vectors to
    centroids (broadcast) and each query scores ONLY vectors in its
    ``n_probe`` nearest clusters — at scale the cluster id becomes the
    partition key so probes touch a bounded fraction of the corpus.
    Same output schema as brute_knn; recall vs brute measured in tests."""
    qids, qn = _query_matrix(emb, query_ids)

    # bounded deterministic sample for the quantizer fit: metadata row count
    # -> thinning modulus -> vec_id-mod filter -> hard cap via limit()
    n_total = emb.count()
    mod = max(1, -(-n_total // max_sample))  # ceil division
    sample = emb.map_batches(
        lambda b: b.filter(pa.array(
            b.column("vec_id").to_numpy() % mod == 0)),
        batch_format="pyarrow").limit(max_sample).to_pandas()
    sv = np.asarray(sample["embedding"].tolist(), dtype=np.float64)
    sv = sv / np.linalg.norm(sv, axis=1, keepdims=True)
    centroids = _kmeans_fit(sv, n_clusters)

    qd2 = ((qn[:, None, :] - centroids[None, :, :]) ** 2).sum(-1)
    probes = np.argsort(qd2, axis=1, kind="stable")[:, :n_probe]
    allowed = {int(qid): set(map(int, row)) for qid, row in zip(qids, probes)}
    ref = ray.put((qids, qn, centroids, allowed))

    def local_topk(batch: pa.Table) -> pa.Table:
        qids_, qn_, cents_, allowed_ = ray.get(ref)
        vecs = list_column_matrix(batch.column("embedding"))
        ids = batch.column("vec_id").to_numpy()
        vn = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
        vd2 = (vn * vn).sum(1)[:, None] - 2.0 * (vn @ cents_.T) \
            + (cents_ * cents_).sum(1)[None, :]
        vc = vd2.argmin(axis=1)
        out_q, out_n, out_s = [], [], []
        for qi, qvec in zip(qids_, qn_):
            mask = np.isin(vc, list(allowed_[int(qi)]))
            if not mask.any():
                continue
            sim = vn[mask] @ qvec
            sel = ids[mask]
            kk = min(k, len(sim))
            order = np.lexsort((sel, -sim))[:kk]
            out_q.extend([int(qi)] * kk)
            out_n.extend(sel[order].tolist())
            out_s.extend(sim[order].tolist())
        return pa.table({"qid": pa.array(out_q, type=pa.int64()),
                         "neighbor_id": pa.array(out_n, type=pa.int64()),
                         "sim": pa.array(out_s, type=pa.float64())})

    partials = emb.map_batches(local_topk, batch_format="pyarrow").to_pandas()
    partials = partials.sort_values(
        ["qid", "sim", "neighbor_id"], ascending=[True, False, True])
    partials["rank"] = partials.groupby("qid").cumcount() + 1
    out = partials[partials["rank"] <= k][["qid", "neighbor_id", "rank"]]
    out["rank"] = out["rank"].astype(np.int32)
    return out.reset_index(drop=True)


def lsh_knn(emb: ray.data.Dataset, query_ids: list[int], k: int = 10,
            bits: int = 4, seed: int = 11) -> pd.DataFrame:
    """Approximate top-k: hyperplane-bucketed scan (bucket + neighbors by
    Hamming<=1).  Returns same schema as brute_knn; recall measured in tests."""
    qids, qn = _query_matrix(emb, query_ids)
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((bits, qn.shape[1]))
    qbuck = ((qn @ planes.T) > 0).astype(np.int64) @ (1 << np.arange(bits))
    # allowed buckets per query: exact + Hamming-1
    allowed = {}
    for qi, b in zip(qids, qbuck):
        s = {int(b)} | {int(b) ^ (1 << i) for i in range(bits)}
        allowed[int(qi)] = s
    ref = ray.put((qids, qn, planes, allowed))

    def local_topk(batch: pa.Table) -> pa.Table:
        qids_, qn_, planes_, allowed_ = ray.get(ref)
        vecs = list_column_matrix(batch.column("embedding"))
        ids = batch.column("vec_id").to_numpy()
        vn = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
        vbuck = ((vn @ planes_.T) > 0).astype(np.int64) @ (1 << np.arange(planes_.shape[0]))
        out_q, out_n, out_s = [], [], []
        for qi, qvec in zip(qids_, qn_):
            mask = np.isin(vbuck, list(allowed_[int(qi)]))
            if not mask.any():
                continue
            sim = vn[mask] @ qvec
            sel_ids = ids[mask]
            kk = min(k, len(sim))
            part = np.argpartition(-sim, kk - 1)[:kk]
            out_q.extend([int(qi)] * kk)
            out_n.extend(sel_ids[part].tolist())
            out_s.extend(sim[part].tolist())
        return pa.table({"qid": pa.array(out_q, type=pa.int64()),
                         "neighbor_id": pa.array(out_n, type=pa.int64()),
                         "sim": pa.array(out_s, type=pa.float64())})

    partials = emb.map_batches(local_topk, batch_format="pyarrow").to_pandas()
    partials = partials.sort_values(
        ["qid", "sim", "neighbor_id"], ascending=[True, False, True])
    partials["rank"] = partials.groupby("qid").cumcount() + 1
    out = partials[partials["rank"] <= k][["qid", "neighbor_id", "rank"]]
    out["rank"] = out["rank"].astype(np.int32)
    return out.reset_index(drop=True)
