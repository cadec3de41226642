"""Deterministic contrastive-head matching over media-span features.

Analogue of the reference's CLIP contrastive baseline
(/root/reference/contrastive_training_matching_with contamination.py:74-88,
91-131): a Siamese encoder feeds |emb_a - emb_b| into a
Linear(d,128)->ReLU->Linear(128,1) head trained with BCE on the
blocking-based train pairs, evaluated P/R/F1 on the blocking-based test
pairs.  The vision encoder itself is torch-bound and out of scope (the
declared stub in engine.multimodal supplies the per-doc media features);
everything downstream — the |diff| pair construction, the same-pair-protocol
split, the BCE-trained head — is reproduced with the deterministic numpy MLP
(seeded init, full-batch Adam, fixed epochs), so results are identical at
any parallelism.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data


def media_feature_frames(feats: ray.data.Dataset
                         ) -> tuple[pd.DataFrame, pd.DataFrame]:
    """Split the per-media-span feature table into (cands, index) frames of
    (doc_id, feature).  Narrow collect: one FEATURE_DIM vector per doc —
    the broadcast small side of the pair construction."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def narrow(b: pa.Table) -> pa.Table:
        return b.select(["doc_id", "source", "feature"])

    df = feats.map_batches(narrow, batch_format="pyarrow").to_pandas()
    return (df[df.source == "cands"].drop(columns=["source"]),
            df[df.source == "index"].drop(columns=["source"]))


def pair_diff_matrix(pairs_df: pd.DataFrame, cand_feats: pd.DataFrame,
                     index_feats: pd.DataFrame) -> np.ndarray:
    """|f_cand - f_index| per pair — the reference head's input
    (contrastive_training...py:86: diff = torch.abs(emb1 - emb2))."""
    cmap = {d: np.asarray(f, dtype=np.float64)
            for d, f in zip(cand_feats.doc_id, cand_feats.feature)}
    imap = {d: np.asarray(f, dtype=np.float64)
            for d, f in zip(index_feats.doc_id, index_feats.feature)}
    return np.vstack([np.abs(cmap[c] - imap[i])
                      for c, i in zip(pairs_df.cand_id, pairs_df.index_id)])


def fit_contrastive_head(train_pairs: pd.DataFrame, cand_feats: pd.DataFrame,
                         index_feats: pd.DataFrame, seed: int = 1,
                         epochs: int = 200):
    """Train the deterministic |diff| -> (128,) -> 1 head (the reference's
    ContrastiveBinaryClassifier.classifier) on blocking-based train pairs."""
    from engine.matching import MLP
    X = pair_diff_matrix(train_pairs, cand_feats, index_feats)
    y = train_pairs["label"].to_numpy(dtype=np.int8)
    return MLP(hidden=(128,), epochs=epochs, random_state=seed).fit(X, y)


def score_pairs(head, pairs_df: pd.DataFrame, cand_feats: pd.DataFrame,
                index_feats: pd.DataFrame) -> pd.DataFrame:
    """(cand_id, index_id, label, pred) for the given pairs under the head."""
    X = pair_diff_matrix(pairs_df, cand_feats, index_feats)
    out = pairs_df[["cand_id", "index_id", "label"]].copy()
    out["pred"] = head.predict(X).astype(np.int8)
    return out.reset_index(drop=True)
