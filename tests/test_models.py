"""Model zoo tests: Bagging/AdaBoost families, per-model evaluation sweep,
contamination retraining experiment (reference classifier.py:43-54,106-176 and
contamination_experiments.py:137-161)."""

import numpy as np
import pytest

SF = "/root/testdata/sf0.001"


def _blobs(n=400, seed=3):
    rng = np.random.default_rng(seed)
    X0 = rng.standard_normal((n // 2, 4)) + 0.0
    X1 = rng.standard_normal((n // 2, 4)) + 2.0
    X = np.vstack([X0, X1])
    y = np.r_[np.zeros(n // 2, dtype=np.int8), np.ones(n // 2, dtype=np.int8)]
    return X, y


def test_bagging_and_adaboost_separate_blobs():
    from engine.matching import AdaBoost, Bagging
    X, y = _blobs()
    for cls in (Bagging, AdaBoost):
        m = cls(random_state=1).fit(X, y)
        acc = float((m.predict(X) == y).mean())
        assert acc >= 0.95, (cls.__name__, acc)
        imp = m.feature_importances_
        assert imp.shape == (4,) and abs(imp.sum() - 1.0) < 1e-9


def test_adaboost_deterministic():
    from engine.matching import AdaBoost
    X, y = _blobs(seed=5)
    a = AdaBoost(n_estimators=30).fit(X, y)
    b = AdaBoost(n_estimators=30).fit(X, y)
    assert np.array_equal(a._margin(X), b._margin(X))


def test_registry_has_seven_families():
    """The reference's six-family model_list (config.py:75-76) plus the
    LogisticRegression extra; both grid sets cover every family."""
    from engine.matching import DEFAULT_GRIDS, FULL_GRIDS, MODEL_REGISTRY
    assert set(MODEL_REGISTRY) == {"RandomForest", "GradientBoosting",
                                   "Bagging", "AdaBoost", "XGBoost", "MLP",
                                   "LogisticRegression"}
    assert set(DEFAULT_GRIDS) == set(MODEL_REGISTRY)
    assert set(FULL_GRIDS) == set(MODEL_REGISTRY)


def test_xgboost_and_mlp_separate_blobs():
    from engine.matching import MLP, XGBoost
    X, y = _blobs()
    for cls in (XGBoost, MLP):
        m = cls(random_state=1).fit(X, y)
        acc = float((m.predict(X) == y).mean())
        assert acc >= 0.95, (cls.__name__, acc)
        imp = m.feature_importances_
        assert imp.shape == (4,) and abs(imp.sum() - 1.0) < 1e-9
        # deterministic refit
        m2 = cls(random_state=1).fit(X, y)
        assert np.array_equal(m.predict_proba(X), m2.predict_proba(X))


def test_grid_search_distributed_matches_serial(ray_session):
    """The Ray fan-out over (combo x fold) CV fits must be bit-identical to
    the serial loop — same scores, same first-combo-wins tie policy."""
    from itertools import product

    from engine.matching import (MODEL_REGISTRY, _cv_fit_score, f1_binary,
                                 grid_search_fit)
    X, y = _blobs(n=240, seed=7)
    grid = {"n_estimators": [10, 20], "max_depth": [3, 5]}
    model, best, cv_f1 = grid_search_fit("RandomForest", grid, X, y, seed=1)
    # serial reference: same loop, no Ray
    keys = sorted(grid)
    fold = np.arange(len(y)) % 3
    ref = None
    for combo in product(*(grid[k] for k in keys)):
        params = dict(zip(keys, combo))
        scores = [_cv_fit_score(X, y, fold, "RandomForest", params, f, 1)
                  for f in range(3)]
        s = float(np.mean(scores))
        if ref is None or s > ref[0] + 1e-12:
            ref = (s, params)
    assert best == ref[1] and abs(cv_f1 - ref[0]) < 1e-15
    m2 = MODEL_REGISTRY["RandomForest"](random_state=1, **ref[1]).fit(X, y)
    assert np.array_equal(model.predict(X), m2.predict(X))


@pytest.fixture(scope="module")
def models_eval(ray_session):
    from engine.queries import matching_models_eval
    return matching_models_eval(SF)


def test_models_eval_best_at_least_rf(models_eval):
    df = models_eval
    rf = df[df.model == "RandomForest"].f1.iloc[0]
    assert df.f1.max() >= rf
    # every tree-ensemble family + the new XGB/MLP slots clear the floor
    for fam in ("RandomForest", "Bagging", "AdaBoost", "GradientBoosting",
                "XGBoost", "MLP"):
        assert df[df.model == fam].f1.iloc[0] >= 0.9, fam
    assert (df.train_sec > 0).all() and (df.inference_sec >= 0).all()


def test_contrastive_head_quality_and_contamination_delta(ray_session):
    """The contrastive |diff| head clears a strong F1 floor on the clean
    blocking-based test pairs (matched docs share media features, so the
    head must learn the near-zero-diff rule), and contaminating the
    index-side features at scoring time degrades F1 — the reference's
    contamination experiment shape."""
    import pandas as pd

    from engine import contrastive
    from engine.corpus import corpus_dataset
    from engine.matching import f1_binary
    from engine.multimodal import media_features
    from engine.queries import _ttf
    tr, te, _ = _ttf(SF)
    cand_feats, index_feats = contrastive.media_feature_frames(
        media_features(corpus_dataset(SF)))
    head = contrastive.fit_contrastive_head(tr, cand_feats, index_feats)
    clean = contrastive.score_pairs(head, te, cand_feats, index_feats)
    f1c, _, _ = f1_binary(clean.label.to_numpy(), clean.pred.to_numpy())
    assert f1c >= 0.9, f1c
    # deterministic refit
    again = contrastive.score_pairs(
        contrastive.fit_contrastive_head(tr, cand_feats, index_feats),
        te, cand_feats, index_feats)
    assert clean.equals(again)
    # contaminate 50% of index-side feature vectors (seeded), rescore
    rng = np.random.default_rng(1)
    dirty = index_feats.copy()
    mask = rng.random(len(dirty)) < 0.5
    dirty.loc[mask, "feature"] = [
        (np.asarray(f) + rng.standard_normal(len(f))).tolist()
        for f in dirty.loc[mask, "feature"]]
    cont = contrastive.score_pairs(head, te, cand_feats, dirty)
    f1d, _, _ = f1_binary(cont.label.to_numpy(), cont.pred.to_numpy())
    assert f1d < f1c, (f1d, f1c)


def test_concat_variant_runs_and_ratios_beat_it(ray_session):
    """The concatenation pair-feature variant (process_pairs.py:30-40) runs
    end to end; the RATIO features dominate it — the reference's stated
    motivation for the division operator (scale-invariant pair evidence vs
    absolute per-side values axis-aligned trees struggle with)."""
    import numpy as np
    from engine.matching import RandomForest, f1_binary
    from engine.pairs import RATIO_FEATURE_NAMES
    from engine.queries import _ttf, geo_match_concat
    df = geo_match_concat(SF)
    assert ((df.cand_id == df.index_id) == (df.label == 1)).all()
    concat_f1, _, _ = f1_binary(df.label.to_numpy(), df.pred.to_numpy())
    tr, te, _ = _ttf(SF)
    m = RandomForest(random_state=1).fit(
        tr[RATIO_FEATURE_NAMES].to_numpy(dtype=np.float64),
        tr["label"].to_numpy(dtype=np.int8))
    ratio_f1, _, _ = f1_binary(
        te["label"].to_numpy(dtype=np.int8),
        m.predict(te[RATIO_FEATURE_NAMES].to_numpy(dtype=np.float64)))
    assert ratio_f1 >= 0.9
    assert ratio_f1 > concat_f1


def test_blocking_recall_std_criterion(ray_session):
    """'std' criterion keys also block well on the planted corpus
    (blocking.py:136-138 semantics: lowest-ratio-std properties)."""
    from engine.queries import geo_blocking_recall_std
    df = geo_blocking_recall_std(SF)
    for crit in ("feature_importance", "std"):
        r5 = df[(df.criterion == crit) & (df.k == 5)].blocking_recall.iloc[0]
        assert r5 >= 0.95, (crit, r5)


def test_contamination_retrain_degrades_or_holds(ray_session):
    from engine.queries import contamination_retrain
    df = contamination_retrain(SF)
    clean = df[df.train_fraction_contaminated == 0.0].f1.iloc[0]
    worst = df[df.train_fraction_contaminated == 0.5].f1.iloc[0]
    assert clean >= 0.9
    # retraining on contaminated features must not IMPROVE the matcher
    # beyond noise (the reference reports degradation)
    assert worst <= clean + 0.01
    assert (df.f1_delta_vs_clean.iloc[0] == 0.0)


def test_png_codec_round_trip(ray_session):
    """decode_png_gray inverts encode_png_gray exactly on arbitrary
    canvases — the real-bytes media path round-trips its own codec."""
    from engine.multimodal import decode_png_gray
    from engine.render import encode_png_gray
    rng = np.random.default_rng(3)
    for shape in ((64, 64), (16, 32), (1, 7)):
        img = rng.integers(0, 256, size=shape, dtype=np.uint8)
        assert (decode_png_gray(encode_png_gray(img)) == img).all()


def test_multimodal_real_planted_recall(ray_session):
    """Real-bytes patch-embedding blocking: a matched index doc is a
    lightly jittered copy of its cand, so its wireframe render — and hence
    its patch embedding — must rank it into the cosine top-5 for nearly
    every cand; embeddings are deterministic across runs."""
    from engine.queries import multimodal_real
    nn = multimodal_real(SF).to_pandas()
    assert set(nn.columns) >= {"cand_id", "index_id", "rank"}
    hits = nn[nn.cand_id == nn.index_id].cand_id.nunique()
    n_cands = nn.cand_id.nunique()
    # 85% of cands have a matched (jittered) index entity; require recall
    # >= 0.9 over those
    assert hits >= 0.9 * 0.85 * n_cands, (hits, n_cands)
    again = multimodal_real(SF).to_pandas()
    assert nn.sort_values(["cand_id", "rank"]).reset_index(drop=True).equals(
        again.sort_values(["cand_id", "rank"]).reset_index(drop=True))


def test_media_resize_and_frame_sample(ray_session):
    """Resize: output PNGs decode to (16,16) with content from the source
    canvas (deterministic CRCs); frame-sample: every stride-th media span
    kept in order on a constructed multi-span doc."""
    import pyarrow as pa
    import ray.data
    from engine.multimodal import (decode_png_gray, frame_sample,
                                   resize_png_gray)
    from engine.queries import media_resize as q_resize
    from engine.render import encode_png_gray
    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, size=(64, 64), dtype=np.uint8)
    small = decode_png_gray(resize_png_gray(encode_png_gray(img), 16))
    assert small.shape == (16, 16)
    assert (small == img[::4, ::4]).all()  # nearest-neighbor stride
    out = q_resize(SF).to_pandas()
    assert len(out) > 0 and (out.png_bytes_out < out.png_bytes_in).all()
    key = ["doc_id", "source"]  # doc_id repeats across the two sources
    again = q_resize(SF).to_pandas().sort_values(key)
    assert out.sort_values(key).png_crc_out.tolist() \
        == again.png_crc_out.tolist()
    # frame sampling on a 5-media-span doc
    spans = [{"kind": "media", "text": "", "media_ref": f"png://f/{i}",
              "offset": i} for i in range(5)]
    spans.insert(2, {"kind": "text", "text": "x", "media_ref": "",
                     "offset": 99})
    docs = ray.data.from_items([{"doc_id": "7", "spans": spans}])
    f = frame_sample(docs, stride=2).to_pandas()
    assert f.media_ref.tolist() == ["png://f/0", "png://f/2", "png://f/4"]
    assert f.frame_idx.tolist() == [0, 2, 4]


def test_audio_features_closed_forms(ray_session):
    """Square-wave DSP: zero crossings = floor((n-1)/p), minimal-shift
    period = 2p, energy = n * A^2 — the real scans must equal the closed
    forms for arbitrary refs."""
    import hashlib
    import pyarrow as pa
    from engine.multimodal import AudioFeatureActor
    a = AudioFeatureActor()
    refs = [f"png://{k}/0" for k in (0, 7, 999, 10000042, 123456789)]
    spans = [[{"kind": "media", "text": "", "media_ref": r, "offset": 0}]
             for r in refs]
    t = pa.table({"doc_id": pa.array([str(i) for i in range(len(refs))]),
                  "spans": pa.array(spans)})
    out = a(t).to_pydict()
    for i, r in enumerate(refs):
        h = int.from_bytes(hashlib.md5(r.encode()).digest()[:8], "little")
        p = 2 + h % 31
        assert out["energy"][i] == 256 * 64
        assert out["zero_crossings"][i] == 255 // p
        assert out["period_est"][i] == 2 * p
