"""Flagship end-to-end pipeline: ingest -> properties -> split -> prep-train
-> blocking -> pair features -> matching -> metrics.

Mirrors the reference lifecycle (SURVEY.md §3): PipelineManager's stages
(/root/reference/pipelines.py:408-420, 589-626) as one composable Ray flow.

Residency policy (scale-first): the document stream, the property table and
every per-row stage are ray.data Datasets end to end.  Driver-side state is
limited to (a) narrow id lists (doc_id/source) that drive the deterministic
splits, (b) the broadcast small sides the physical plan calls for — the kNN
index matrix (the reference's KDTree index, blocking.py:106-118) — and (c)
the collected TRAIN matrix, which is small by construction and fit on the
driver exactly as the reference does (classifier.py:150-163).  Pair features
run through bucketed hash joins (pairs.pair_features_join); scaler stats
through the distributed exact-quantile aggregate (blocking.robust_scale_stats_ds).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from engine import blocking as blk
from engine import matching, metrics, pairs, splits
from engine.corpus import corpus_dataset
from engine.geometry import PROPERTY_NAMES
from engine.joins import broadcast_semi_join
from engine.pairs import RATIO_FEATURE_NAMES, ratio_features
from engine.properties import _props_batch, properties_dataset


STATE_VERSION = "r2"  # bump when prepare-state semantics change


def property_table(sf_dir: str, n_cands: int | None = None,
                   log_transform: bool = False) -> ray.data.Dataset:
    """docs -> materialized property Dataset (stays distributed; nothing is
    collected here)."""
    docs = corpus_dataset(sf_dir, n_cands)
    return properties_dataset(docs, log_transform=log_transform).materialize()


def side_dataset(props: ray.data.Dataset, source: str,
                 cols: list[str] | None = None) -> ray.data.Dataset:
    """One side ('cands'|'index') of the two-source property table."""
    import pyarrow.compute as pc

    def pick(b: pa.Table) -> pa.Table:
        b = b.filter(pc.equal(b.column("source"), pa.scalar(source)))
        return b.select(cols) if cols else b

    return props.map_batches(pick, batch_format="pyarrow")


def side_frame(props: ray.data.Dataset, source: str,
               cols: list[str]) -> pd.DataFrame:
    """Broadcast-side collect: a NARROW column set for the side the physical
    plan broadcasts (the kNN index matrix — the reference's in-memory KDTree
    side).  The streaming side is never collected."""
    return side_dataset(props, source, cols).to_pandas()


def side_ids(props: ray.data.Dataset) -> tuple[list[str], list[str]]:
    """Narrow (doc_id, source) collect — test-fixture helper only; the prep
    path applies the split predicate dataset-side (split_cands_dataset) and
    never collects the cands id column."""
    pdf = props.select_columns(["doc_id", "source"]).to_pandas()
    return (pdf[pdf.source == "cands"].doc_id.tolist(),
            pdf[pdf.source == "index"].doc_id.tolist())


def split_cands_dataset(cands: ray.data.Dataset, index_sorted_ref,
                        seed: int, train: bool) -> ray.data.Dataset:
    """cands ∩ index restricted to one side of the hash-bucket train/test
    split, with BOTH predicates applied inside map_batches: membership via
    searchsorted against the broadcast sorted-int64 index-id array (the
    declared small side — the same side the KDTree and the negative-sampling
    space already broadcast), split via splits.split_bucket on the id
    strings.  Set-identical to the old driver-side
    ``sorted(set(cands) & set(index))`` + train_test_ids path, but no
    O(corpus) cands-id collect ever reaches the driver."""
    def f(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id").to_pylist()
        if not ids:
            return b
        idx = ray.get(index_sorted_ref)
        if len(idx) == 0:   # empty index side -> empty intersection
            return b.filter(pa.array(np.zeros(len(ids), dtype=bool)))
        v = np.asarray([int(i) for i in ids], dtype=np.int64)
        pos = np.searchsorted(idx, v)
        pos[pos == len(idx)] = 0
        in_idx = idx[pos] == v
        tr = splits.split_bucket(ids, seed)
        return b.filter(pa.array(in_idx & (tr if train else ~tr)))

    return cands.map_batches(f, batch_format="pyarrow")


def prep_train(props: ray.data.Dataset, seed: int = 1,
               neg_num: int = 2, model_name: str = "RandomForest",
               grid: bool = False):
    """Preparatory phase (pipelines.py:601-616): negative-sampled train pairs
    -> ratio features (bucketed joins) -> fit model -> feature importances +
    property ratios.

    Training matrix is canonically sorted by (cand_id, index_id) so the fit is
    independent of any upstream parallelism (SURVEY.md §7.4.6).  ``grid``
    enables the deterministic grid-search CV (classifier.py:150-163).
    """
    # index ids: the declared broadcast side (KDTree / negative-sampling
    # space); cands ids NEVER collect to the driver — the split predicate
    # runs dataset-side and only the train subset materializes.
    # BROADCAST-SIZE CONTRACT: the index SIDE of this pipeline is the small
    # side by design (the reference's index/candidate asymmetry) — its id
    # array and scaled matrix are ray.put once and read per worker.  When
    # the index side itself is corpus-scale (10^9+ rows), this prep is the
    # wrong plan: route blocking through blocking.cell_blocking (spatial
    # co-partitioning, no broadcast) and the split through
    # split_cands_dataset with a bucketed semi-join instead of the
    # searchsorted membership.
    index_ids = side_dataset(props, "index", ["doc_id"]) \
        .to_pandas().doc_id.tolist()
    split_ref = ray.put(np.sort(np.asarray(index_ids, dtype=np.int64)))
    # ONE pass over the cands side: intersection membership + split flag,
    # materialized as a narrow (doc_id, is_train) id table in the object
    # store; only the train subset then collects to the driver and the test
    # count is the complement — no second scan of the property table
    def tag(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id").to_pylist()
        if not ids:
            return pa.table({"doc_id": pa.array([], type=pa.string()),
                             "is_train": pa.array([], type=pa.bool_())})
        idx = ray.get(split_ref)
        v = np.asarray([int(i) for i in ids], dtype=np.int64)
        if len(idx):
            pos = np.searchsorted(idx, v)
            pos[pos == len(idx)] = 0
            in_idx = idx[pos] == v
        else:
            in_idx = np.zeros(len(v), dtype=bool)
        tr = splits.split_bucket(ids, seed)
        b = b.filter(pa.array(in_idx))
        return pa.table({"doc_id": b.column("doc_id"),
                         "is_train": pa.array(tr[in_idx])})

    inter_ds = side_dataset(props, "cands", ["doc_id"]) \
        .map_batches(tag, batch_format="pyarrow").materialize()
    train_ids = sorted(
        inter_ds.map_batches(lambda b: b.filter(b.column("is_train")),
                             batch_format="pyarrow")
        .to_pandas().doc_id.tolist(), key=int)
    n_test = inter_ds.count() - len(train_ids)
    pair_ds = splits.negative_sample_pairs(train_ids, index_ids, neg_num,
                                           seed)
    feat_ds = pairs.pair_features_join(pair_ds, props)
    train_df = feat_ds.to_pandas().sort_values(
        ["cand_id", "index_id"]).reset_index(drop=True)
    X = train_df[RATIO_FEATURE_NAMES].to_numpy(dtype=np.float64)
    y = train_df["label"].to_numpy(dtype=np.int8)
    if grid:
        model, _, _ = matching.grid_search_fit(
            model_name, matching.DEFAULT_GRIDS[model_name], X, y, seed=seed)
    else:
        model = matching.MODEL_REGISTRY[model_name](random_state=seed).fit(X, y)
    importances = sorted(zip(RATIO_FEATURE_NAMES, model.feature_importances_),
                         key=lambda kv: kv[1], reverse=True)
    # train-matched property rows: a small semi-join collect (train ids only)
    tr = broadcast_semi_join(props, "doc_id", train_ids).to_pandas()
    ratios = metrics.property_ratio_stats(
        tr[tr.source == "cands"], tr[tr.source == "index"], PROPERTY_NAMES)
    return {
        "model": model, "importances": importances, "ratios": ratios,
        "train_ids": train_ids, "train_df": train_df,
        "index_ids": index_ids, "n_test": n_test,
        "seed": seed, "split_ref": split_ref,
    }


def run_flagship(sf_dir: str, n_cands: int | None = None, seed: int = 1,
                 bkafi_dim: int = 6, k: int = 10, neg_num: int = 2,
                 concurrency: int = 4, train_mode: str = "blocking-based",
                 log_transform: bool = False,
                 model_name: str = "RandomForest", grid: bool = False,
                 props: ray.data.Dataset | None = None,
                 prep: dict | None = None):
    """Full blocking->matching pipeline; returns dict of results/datasets.

    ``train_mode``: 'blocking-based' trains the matcher on pairs produced by
    running the blocker over the *train* cands (hard negatives — the
    reference's matching_cands_generation='blocking-based',
    pipelines.py:426-432 / data_partition.py:401-415); 'negative_sampling'
    uses the random negatives from the preparatory phase only.
    ``log_transform`` runs the property stage under log1p normalization (the
    reference default, config.py:52).  ``props``/``prep`` let callers share
    ONE materialized property table and preparatory training pass across
    several evaluation queries (engine.queries._prep) instead of refitting.
    """
    if props is None:
        props = property_table(sf_dir, n_cands, log_transform=log_transform)
    if prep is None:
        prep = prep_train(props, seed=seed, neg_num=neg_num,
                          model_name=model_name, grid=grid)

    features = blk.select_blocking_features(
        prep["importances"], prep["ratios"], bkafi_dim)
    index_feat_df = side_frame(props, "index", ["doc_id", *features])
    cands_all = side_dataset(props, "cands", ["doc_id", *PROPERTY_NAMES])

    matcher = prep["model"]
    if train_mode == "blocking-based":
        train_cands = broadcast_semi_join(cands_all, "doc_id", prep["train_ids"])
        tnn, _ = blk.bkafi_nn_dataset(
            train_cands, index_feat_df, features, bkafi_dim,
            concurrency=concurrency)
        tnn = tnn.materialize()  # kNN/join fusion boundary (see prepare_state)
        tpairs = blk.pairs_from_nn(tnn, k).select_columns(
            ["cand_id", "index_id", "label"])
        tfeat = pairs.pair_features_join(tpairs, props)
        tdf = tfeat.to_pandas().sort_values(
            ["cand_id", "index_id"]).reset_index(drop=True)
        Xb = tdf[RATIO_FEATURE_NAMES].to_numpy(dtype=np.float64)
        yb = tdf["label"].to_numpy(dtype=np.int8)
        matcher = matching.MODEL_REGISTRY[model_name](random_state=seed).fit(Xb, yb)

    # test split (blocking evaluation runs on held-out cands, all index) —
    # dataset-side split predicate, no test-id list on the driver
    test_cands = split_cands_dataset(cands_all, prep["split_ref"],
                                     prep["seed"], train=False)
    nn, exec_s = blk.bkafi_nn_dataset(
        test_cands, index_feat_df, features, bkafi_dim, concurrency=concurrency)
    nn = nn.materialize()

    pair_ds = blk.pairs_from_nn(nn, k)
    feat_ds = pairs.pair_features_join(pair_ds, props)
    scored = matching.predict_dataset(
        feat_ds, matcher, RATIO_FEATURE_NAMES, concurrency=concurrency)
    scored = scored.materialize()

    # every test cand is in the index by construction (test ⊆ cands ∩ index),
    # so the recall denominator equals the distributed test count
    n_inter = prep["n_test"]
    recall = metrics.blocking_recall(nn, n_inter, ks=[1, 5, 10, 20])
    prf = metrics.precision_recall_f1(scored)
    return {
        "props": props, "prep": prep, "nn": nn, "scored": scored,
        "blocking_recall": recall, "matching": prf,
        "blocking_exec_s": exec_s,
        "n_test_cands": prep["n_test"],
        "n_index": len(prep["index_ids"]),
    }


def prepare_state(sf_dir: str, n_cands: int | None = None, seed: int = 1,
                  bkafi_dim: int = 6, k: int = 5, neg_num: int = 2,
                  concurrency: int = 8, cache: bool = False,
                  log_transform: bool = False,
                  props: ray.data.Dataset | None = None,
                  prep: dict | None = None) -> dict:
    """Train/prepare everything the apply-path needs (model, blocking
    features, scaler stats, scaled index matrix, index property matrix).

    This is the analogue of everything the reference does *before* its timed
    blocking run (Table 3 times only the search — blocking.py:129-132): the
    returned state is broadcast to the fused inference pipeline.  With
    ``cache`` the (deterministic) state is pickled under /tmp and reused —
    bench runs at different CPU counts then share one training pass.
    """
    import os
    import pickle
    cache_path = None
    if cache:
        # STATE_VERSION invalidates caches across engine-semantics changes
        tag = (f"{STATE_VERSION}_{os.path.basename(os.path.normpath(sf_dir))}"
               f"_n{n_cands}"
               f"_s{seed}_d{bkafi_dim}_k{k}_g{neg_num}_l{int(log_transform)}")
        cache_path = f"/tmp/ray_geo_state/{tag}.pkl"
        if os.path.exists(cache_path):
            with open(cache_path, "rb") as f:
                return pickle.load(f)
    if props is None:
        props = property_table(sf_dir, n_cands, log_transform=log_transform)
    if prep is None:
        prep = prep_train(props, seed=seed, neg_num=neg_num)
    features = blk.select_blocking_features(
        prep["importances"], prep["ratios"], bkafi_dim)
    index_feat_df = side_frame(props, "index", ["doc_id", *features])
    cands_all = side_dataset(props, "cands", ["doc_id", *PROPERTY_NAMES])

    train_cands = broadcast_semi_join(cands_all, "doc_id", prep["train_ids"])
    tnn, _ = blk.bkafi_nn_dataset(
        train_cands, index_feat_df, features, bkafi_dim, concurrency=concurrency)
    # boundary on the NARROW nn table: without it the streaming executor
    # fuses the bandwidth-bound kNN stage with the downstream ratio join and
    # the fused tasks serialize (measured 37 s lazy vs 17 s split at sf0.1)
    tnn = tnn.materialize()
    tpairs = blk.pairs_from_nn(tnn, k).select_columns(
        ["cand_id", "index_id", "label"])
    tfeat = pairs.pair_features_join(tpairs, props)
    tdf = tfeat.to_pandas().sort_values(
        ["cand_id", "index_id"]).reset_index(drop=True)
    matcher = matching.RandomForest(random_state=seed).fit(
        tdf[RATIO_FEATURE_NAMES].to_numpy(dtype=np.float64),
        tdf["label"].to_numpy(dtype=np.int8))

    # scaler stats fit on ALL cands, distributed exact quantiles
    med, iqr = blk.robust_scale_stats_ds(cands_all, features)
    feat_idx = [PROPERTY_NAMES.index(f) for f in features]
    # the index side is the broadcast small side of this physical plan (the
    # reference's in-memory KDTree/property dict); at 10^12 index rows the
    # cell-shuffle blocker replaces the broadcast (blocking.cell_blocking)
    index_df = side_frame(props, "index", ["doc_id", *PROPERTY_NAMES])
    idx_props = index_df[PROPERTY_NAMES].to_numpy(dtype=np.float64)
    idx_scaled = np.ascontiguousarray(
        (idx_props[:, feat_idx] - med) / iqr, dtype=np.float32)
    state = {
        "features": features, "feat_idx": feat_idx, "med": med, "iqr": iqr,
        "matcher": matcher, "k": k, "log_transform": log_transform,
        "idx_ids": index_df["doc_id"].to_numpy(),
        "idx_num": index_df["doc_id"].astype(np.int64).to_numpy(),
        "idx_scaled": idx_scaled, "idx_props": idx_props,
        "n_index": len(index_df),
    }
    if cache_path:
        os.makedirs(os.path.dirname(cache_path), exist_ok=True)
        tmp = cache_path + ".tmp"
        with open(tmp, "wb") as f:
            pickle.dump(state, f)
        os.replace(tmp, cache_path)
    return state


FUSED_TILE, FUSED_CHUNK = 64, 4096  # L2-resident distance tiles (blocking.py)


def fused_apply_batch(batch: pa.Table, s: dict, idx_sq: np.ndarray,
                      log_transform: bool) -> pa.Table:
    """The fused per-batch work: parse + 25 properties -> scale -> kNN ->
    ratio features -> classify.  Module-level (not a closure) so the
    hardware-envelope control (jobs/envelope_control.py) can run EXACTLY
    this function under bare multiprocessing — no Ray, no object store —
    and bound what any scheduler could achieve on this host."""
    import pyarrow.compute as pc
    out = _props_batch(batch, log_transform)
    out = out.filter(pc.equal(out.column("source"), pa.scalar("cands")))
    if out.num_rows == 0:
        return pa.table({
            "cand_id": pa.array([], type=pa.string()),
            "index_id": pa.array([], type=pa.string()),
            "rank": pa.array([], type=pa.int32()),
            "dist": pa.array([], type=pa.float64()),
            "label": pa.array([], type=pa.int8()),
            "pred": pa.array([], type=pa.int8()),
        })
    try:
        # contract: the fused path requires int64-castable doc_ids (the
        # corpus generator emits numeric strings); numeric ids are what let
        # the kernel and the label compare stay allocation-free.
        ids_num = pc.cast(out.column("doc_id"), pa.int64()).to_numpy()
    except pa.ArrowInvalid as e:
        raise ValueError(
            "fused pipeline requires numeric-string doc_ids (int64-"
            "castable); corpora with arbitrary string ids must route "
            "through the unfused stages (properties_dataset -> "
            "bkafi_nn_dataset -> pair_ratio_features)") from e
    P = np.column_stack([out.column(c).to_numpy() for c in PROPERTY_NAMES])
    Xs = ((P[:, s["feat_idx"]] - s["med"]) / s["iqr"]).astype(np.float32)
    top, dist = blk.topk_l2_f32(Xs, s["idx_scaled"], idx_sq,
                                s["idx_num"], s["k"],
                                tile=FUSED_TILE, chunk=FUSED_CHUNK)
    n, kk = top.shape
    cand_rep = np.repeat(np.arange(n), kk)
    flat = top.ravel()
    feats = ratio_features(P[cand_rep], s["idx_props"][flat])
    pred = s["matcher"].predict(feats)
    # numeric ids end to end: the label compare and the string columns
    # are vectorized int64 ops / Arrow casts — no per-pair Python
    # string objects ride through the allocator
    cand_num = np.repeat(ids_num, kk)
    index_num = s["idx_num"][flat]
    label = (cand_num == index_num).astype(np.int8)
    return pa.table({
        "cand_id": pc.cast(pa.array(cand_num), pa.string()),
        "index_id": pc.cast(pa.array(index_num), pa.string()),
        "rank": pa.array(np.tile(np.arange(1, kk + 1, dtype=np.int32), n)),
        "dist": pa.array(dist.ravel().astype(np.float64), type=pa.float64()),
        "label": pa.array(label, type=pa.int8()),
        "pred": pa.array(pred.astype(np.int8), type=pa.int8()),
    })


def matching_inference_pipeline(docs: ray.data.Dataset, state: dict,
                                concurrency: int = 8,
                                num_cpus_per_task: float | None = None
                                ) -> ray.data.Dataset:
    """The fused apply path: interleaved docs -> parse + 25 properties ->
    kNN blocking -> ratio features -> match classification, in ONE streaming
    execution.  Output: (cand_id, index_id, rank, dist, label, pred) pairs.

    Physical form: a stateless TASK pool with the prepared state broadcast
    via ray.put and cached per worker process (zero-copy plasma reads).
    Measured 35% faster than the equivalent actor pool on this host — task
    pools have no ramp and stay fully elastic; actor pools remain the right
    shape when per-actor setup is expensive (model load), which a plasma get
    is not.  ``concurrency`` is kept for API compatibility (tasks are
    scheduled by the executor).
    """
    import pyarrow as pa

    state_ref = ray.put(state)
    worker_cache: dict = {}
    log_transform = bool(state.get("log_transform", False))

    def fused(batch: pa.Table) -> pa.Table:
        if "s" not in worker_cache:
            s = ray.get(state_ref)
            worker_cache["s"] = s
            worker_cache["idx_sq"] = (s["idx_scaled"] * s["idx_scaled"]).sum(1)
        return fused_apply_batch(batch, worker_cache["s"],
                                 worker_cache["idx_sq"], log_transform)

    kwargs = {}
    if num_cpus_per_task:
        # >1.0 leaves breathing room for the object store / raylet at full
        # width (host-steal mitigation measured on this box)
        kwargs["num_cpus"] = num_cpus_per_task
    return docs.map_batches(fused, batch_format="pyarrow", **kwargs)


def train_test_features(sf_dir: str, seed: int = 1, bkafi_dim: int = 6,
                        k: int = 5, neg_num: int = 2, concurrency: int = 4,
                        log_transform: bool = False,
                        props: ray.data.Dataset | None = None,
                        prep: dict | None = None):
    """Blocking-based train + test pair-feature matrices — the matching
    evaluation inputs (reference pipelines.py:426-432, 516-523: train pairs
    from a blocker pass over train cands, test pairs over test cands).
    Returns (train_df, test_df, prep) with canonical (cand_id, index_id)
    ordering.  ``props``/``prep`` share one training pass (see run_flagship)."""
    if props is None:
        props = property_table(sf_dir, log_transform=log_transform)
    if prep is None:
        prep = prep_train(props, seed=seed, neg_num=neg_num)
    features = blk.select_blocking_features(
        prep["importances"], prep["ratios"], bkafi_dim)
    index_feat_df = side_frame(props, "index", ["doc_id", *features])
    cands_all = side_dataset(props, "cands", ["doc_id", *PROPERTY_NAMES])

    def feats_for(cands):
        nn, _ = blk.bkafi_nn_dataset(cands, index_feat_df, features,
                                     bkafi_dim, concurrency=concurrency)
        fd = pairs.pair_features_join(
            blk.pairs_from_nn(nn, k).select_columns(
                ["cand_id", "index_id", "label"]), props)
        return fd.to_pandas().sort_values(
            ["cand_id", "index_id"]).reset_index(drop=True)

    train_cands = broadcast_semi_join(cands_all, "doc_id", prep["train_ids"])
    test_cands = split_cands_dataset(cands_all, prep["split_ref"],
                                     prep["seed"], train=False)
    return feats_for(train_cands), feats_for(test_cands), prep


def seed_averaged_eval(sf_dir: str, seeds=(1, 2, 3), n_cands: int | None = None,
                       bkafi_dim: int = 6, k: int = 5,
                       concurrency: int = 4,
                       normalizations=(False, True)) -> pd.DataFrame:
    """Multi-seed evaluation averaged like the reference (main.py:32-36,
    utils.py:280-346): per seed and normalization mode (raw vs the reference
    default log_transform, config.py:52), blocking recall at each k and
    matching P/R/F1; mean across seeds per mode (seed == -1 rows)."""
    rows = []
    for log_transform in normalizations:
        norm = "log_transform" if log_transform else "raw"
        for seed in seeds:
            res = run_flagship(sf_dir, n_cands=n_cands, seed=seed,
                               bkafi_dim=bkafi_dim, k=k,
                               concurrency=concurrency,
                               log_transform=log_transform)
            rec = res["blocking_recall"]
            m = res["matching"]
            row = {"normalization": norm, "seed": seed,
                   "precision": m["precision"],
                   "recall": m["recall"], "f1": m["f1"]}
            for _, r in rec.iterrows():
                row[f"blocking_recall_at_{int(r.k)}"] = r.blocking_recall
            rows.append(row)
    df = pd.DataFrame(rows)
    means = []
    for norm, g in df.groupby("normalization"):
        mean = g.drop(columns=["seed", "normalization"]).mean().to_dict()
        mean["seed"] = -1  # -1 = average row
        mean["normalization"] = norm
        means.append(mean)
    return pd.concat([df, pd.DataFrame(means)], ignore_index=True)
