"""Cell-partitioned blocking: recall on planted matches, salted == unsalted
(SURVEY.md §7.4.5 skew-correctness requirement)."""

import numpy as np
import pandas as pd
import pytest
import ray.data

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def props_df(ray_session):
    from engine.corpus import corpus_dataset
    from engine.properties import properties_dataset
    return properties_dataset(corpus_dataset(SF)).to_pandas()


def _pairs_key(df):
    return set(zip(df.cand_id, df.index_id))


def test_cell_blocking_finds_planted_matches(props_df, ray_session):
    from engine.blocking import cell_blocking
    ds = ray.data.from_pandas(props_df[["doc_id", "source", "cx", "cy"]])
    out = cell_blocking(ds, res=9, ring=1).to_pandas()
    cands = set(props_df[props_df.source == "cands"].doc_id)
    index = set(props_df[props_df.source == "index"].doc_id)
    inter = cands & index
    # a matched index doc's centroid is within ~0.1 m of its cand's -> same
    # or adjacent cell, so cell blocking must recover essentially all of them
    found = {c for c, i in _pairs_key(out) if c == i}
    recall = len(found & inter) / len(inter)
    assert recall >= 0.99, recall


def test_cell_blocking_salted_equals_unsalted(props_df, ray_session):
    from engine.blocking import cell_blocking
    ds = ray.data.from_pandas(props_df[["doc_id", "source", "cx", "cy"]])
    # salt_threshold=25 forces many hot cells at res 5 (big cells)
    unsalted = cell_blocking(ds, res=5, ring=1, salt_threshold=10**9).to_pandas()
    salted = cell_blocking(ds, res=5, ring=1, salt_threshold=25).to_pandas()
    u = unsalted.sort_values(["cand_id", "rank"]).reset_index(drop=True)
    s = salted.sort_values(["cand_id", "rank"]).reset_index(drop=True)
    assert len(u) == len(s)
    assert (u.cand_id.to_numpy() == s.cand_id.to_numpy()).all()
    assert (u.index_id.to_numpy() == s.index_id.to_numpy()).all()
    assert (u.dist2.to_numpy() == s.dist2.to_numpy()).all()


def test_topk_l2_f32_equals_bruteforce():
    """The threshold-pruned running top-k equals a full lexsort brute force
    — including tie resolution by (d2, numeric id) — across random shapes,
    duplicate index rows (forced distance ties) and k >= n_idx."""
    import numpy as np
    from engine.blocking import topk_l2_f32
    rng = np.random.default_rng(42)
    for trial, (n, n_idx, dim, k, chunk) in enumerate(
            [(37, 500, 6, 5, 64), (5, 3, 4, 7, 2), (64, 4096, 6, 5, 512),
             (130, 1000, 3, 10, 100)]):
        X = rng.standard_normal((n, dim)).astype(np.float32)
        idx = rng.standard_normal((n_idx, dim)).astype(np.float32)
        # plant exact duplicates so distance ties exercise the id tiebreak
        if n_idx >= 10:
            idx[1] = idx[0]
            idx[7] = idx[3]
        idx_num = rng.permutation(n_idx).astype(np.int64)  # ids != positions
        idx_sq = (idx * idx).sum(1)
        top, dist = topk_l2_f32(X, idx, idx_sq, idx_num, k,
                                tile=16, chunk=chunk)
        kk = min(k, n_idx)
        assert top.shape == (n, kk)
        d2 = ((X[:, None, :] - idx[None, :, :]) ** 2).sum(2)
        x_sq = (X * X).sum(1)[:, None]
        d2_kernel = x_sq - 2.0 * (X @ idx.T) + idx_sq[None, :]
        for r in range(n):
            order = np.lexsort((idx_num, d2_kernel[r]))[:kk]
            assert (top[r] == order).all(), (trial, r)
            want = np.sqrt(np.maximum(d2_kernel[r, order], 0.0))
            assert (dist[r] == want).all(), (trial, r)
