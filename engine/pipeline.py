"""Flagship end-to-end pipeline: ingest -> properties -> split -> prep-train
-> blocking -> pair features -> matching -> metrics.

Mirrors the reference lifecycle (SURVEY.md §3): PipelineManager's stages
(/root/reference/pipelines.py:408-420, 589-626) as one composable Ray flow.

Residency policy (sandbox-honest, scale-documented): the *document* stream and
all per-row stages are ray.data Datasets end to end.  Property tables are
additionally collected to the driver as pandas for the stateful orchestration
steps — classifier fit (driver-side in the reference too, classifier.py:150),
kNN index broadcast, and ratio-matrix broadcast.  At 10^12 rows those
collect/broadcast steps are replaced by engine.joins.bucketed_hash_join and a
sketch-based scaler (exercised separately); the stage graph is unchanged.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data

from engine import blocking as blk
from engine import matching, metrics, pairs, splits
from engine.corpus import corpus_dataset
from engine.geometry import PROPERTY_NAMES
from engine.pairs import RATIO_FEATURE_NAMES
from engine.properties import properties_dataset


def build_property_tables(sf_dir: str, n_cands: int | None = None,
                          concurrency: int | None = None):
    """docs -> properties Dataset (materialized) + driver-side frames."""
    docs = corpus_dataset(sf_dir, n_cands)
    props = properties_dataset(docs).materialize()
    pdf = props.to_pandas()
    cand_df = pdf[pdf.source == "cands"].reset_index(drop=True)
    index_df = pdf[pdf.source == "index"].reset_index(drop=True)
    return props, cand_df, index_df


def prep_train(cand_df: pd.DataFrame, index_df: pd.DataFrame, seed: int = 1,
               neg_num: int = 2, model_name: str = "RandomForest"):
    """Preparatory phase (pipelines.py:601-616): negative-sampled train pairs
    -> ratio features -> fit model -> feature importances + property ratios.

    Training matrix is canonically sorted by (cand_id, index_id) so the fit is
    independent of any upstream parallelism (SURVEY.md §7.4.6).
    """
    inter = sorted(set(cand_df.doc_id) & set(index_df.doc_id), key=int)
    train_ids, test_ids = splits.train_test_ids(inter, seed)
    pair_ds = splits.negative_sample_pairs(
        sorted(train_ids, key=int), index_df.doc_id.tolist(), neg_num, seed)
    feat_ds = pairs.pair_features_dataset(pair_ds, cand_df, index_df)
    train_df = feat_ds.to_pandas().sort_values(
        ["cand_id", "index_id"]).reset_index(drop=True)
    X = train_df[RATIO_FEATURE_NAMES].to_numpy(dtype=np.float64)
    y = train_df["label"].to_numpy(dtype=np.int8)
    model = matching.MODEL_REGISTRY[model_name](random_state=seed).fit(X, y)
    importances = sorted(zip(RATIO_FEATURE_NAMES, model.feature_importances_),
                         key=lambda kv: kv[1], reverse=True)
    matched_c = cand_df[cand_df.doc_id.isin(train_ids)]
    matched_i = index_df[index_df.doc_id.isin(train_ids)]
    ratios = metrics.property_ratio_stats(matched_c, matched_i, PROPERTY_NAMES)
    return {
        "model": model, "importances": importances, "ratios": ratios,
        "train_ids": train_ids, "test_ids": test_ids, "train_df": train_df,
    }


def run_flagship(sf_dir: str, n_cands: int | None = None, seed: int = 1,
                 bkafi_dim: int = 6, k: int = 10, neg_num: int = 2,
                 concurrency: int = 4):
    """Full blocking->matching pipeline; returns dict of results/datasets."""
    props, cand_df, index_df = build_property_tables(sf_dir, n_cands)
    prep = prep_train(cand_df, index_df, seed=seed, neg_num=neg_num)

    # test split (blocking evaluation runs on held-out cands, all index)
    test_cand_df = cand_df[cand_df.doc_id.isin(prep["test_ids"])]
    test_cands = ray.data.from_pandas(
        test_cand_df[["doc_id", *PROPERTY_NAMES]].reset_index(drop=True))

    features = blk.select_blocking_features(
        prep["importances"], prep["ratios"], bkafi_dim)
    nn, exec_s = blk.bkafi_nn_dataset(
        test_cands, index_df, features, bkafi_dim, concurrency=concurrency)
    nn = nn.materialize()

    pair_ds = blk.pairs_from_nn(nn, k)
    feat_ds = pairs.pair_features_dataset(pair_ds, cand_df, index_df,
                                          concurrency=concurrency)
    scored = matching.predict_dataset(
        feat_ds, prep["model"], RATIO_FEATURE_NAMES, concurrency=concurrency)
    scored = scored.materialize()

    n_inter = len(set(test_cand_df.doc_id) & set(index_df.doc_id))
    recall = metrics.blocking_recall(nn, n_inter, ks=[1, 5, 10, 20])
    prf = metrics.precision_recall_f1(scored)
    return {
        "props": props, "cand_df": cand_df, "index_df": index_df,
        "prep": prep, "nn": nn, "scored": scored,
        "blocking_recall": recall, "matching": prf,
        "blocking_exec_s": exec_s,
        "n_test_cands": len(test_cand_df), "n_index": len(index_df),
    }
