"""Tests for the coverage-completing operators: CityJSON reader, CRS,
polygon utils, contamination, concatenation features, log transform,
grid search, model registry."""

import json
import os

import numpy as np
import pytest
import ray.data


def _write_cityjson(tmp_path, source):
    """Build CityJSON files from datagen meshes using the reference's key
    conventions (bag_X / NL.IMBAG.Pand.X-0)."""
    from datagen.buildings import build_mesh, building_params
    files = []
    for fi in range(2):
        vertices, objects = [], {}
        for k in range(fi * 3, fi * 3 + 3):
            p = building_params(k)
            mesh = build_mesh(p["w"], p["l"], p["h"], p["roof"], p["rise"])
            boundaries = []
            for surf in mesh:
                idxs = []
                for v in surf:
                    idxs.append(len(vertices))
                    vertices.append(v)
                boundaries.append([[idxs]])
            key = f"bag_{k}" if source == "cands" else f"NL.IMBAG.Pand.{k}-0XYZ"
            objects[key] = {"geometry": [{"boundaries": [
                [s[0] for s in boundaries]]}]}
        path = tmp_path / f"{source}_{fi}.city.json"
        path.write_text(json.dumps(
            {"vertices": vertices, "CityObjects": objects}))
        files.append(str(path))
    return files


def test_cityjson_reader_roundtrip(ray_session, tmp_path):
    from engine.properties import properties_dataset
    from engine.sources import read_cityjson
    from datagen.buildings import building_params, expected_volume
    files = _write_cityjson(tmp_path, "cands")
    docs = read_cityjson(files, "cands")
    pdf = properties_dataset(docs).to_pandas()
    assert len(pdf) == 6
    assert sorted(pdf.doc_id.astype(int)) == list(range(6))
    for _, row in pdf.iterrows():
        p = building_params(int(row.doc_id))
        want = expected_volume(p["w"], p["l"], p["h"], p["roof"], p["rise"])
        assert row.volume == pytest.approx(want, rel=1e-9)


def test_cityjson_index_key_standardization(ray_session, tmp_path):
    from engine.sources import read_cityjson
    files = _write_cityjson(tmp_path, "index")
    docs = read_cityjson(files, "index").to_pandas()
    assert sorted(docs.doc_id.astype(int)) == list(range(6))


def test_geojson_coords():
    from engine.sources import geojson_polygon_coords
    gj = json.dumps({"features": [
        {"geometry": {"coordinates": [[[0, 0], [1, 0], [1, 1], [0, 0]]]}}]})
    rings = geojson_polygon_coords(gj)
    assert len(rings) == 1
    assert len(rings[0]) == 3  # closing vertex dropped


def test_close_polygon():
    from engine.sources import close_polygon
    ring = np.array([[0.0, 0.0], [1.0, 0.0], [1.0, 1.0]])
    closed = close_polygon(ring)
    assert len(closed) == 4 and (closed[0] == closed[-1]).all()
    assert len(close_polygon(closed)) == 4  # idempotent


def test_crs_roundtrip():
    from engine.crs import lonlat_to_utm, utm_to_lonlat
    lon = np.array([33.0, 34.5, 35.9])   # inside zone 36
    lat = np.array([31.0, 52.08, -15.0])
    e, n = lonlat_to_utm(lon, lat, zone=36)
    lon2, lat2 = utm_to_lonlat(e, n, zone=36, south=False)
    # southern point wraps; test the two northern ones round trip to ~1e-8 deg
    assert np.abs(lon2[:2] - lon[:2]).max() < 1e-7
    assert np.abs(lat2[:2] - lat[:2]).max() < 1e-7
    # sanity vs known magnitudes: zone central meridian -> easting 500 km
    e0, _ = lonlat_to_utm(33.0, 45.0)
    assert e0 == pytest.approx(500000.0, abs=1e-3)


def test_contamination_deterministic(ray_session):
    from engine.contamination import contaminate
    import pyarrow as pa
    t = pa.table({
        "cand_id": [str(i) for i in range(100)],
        "index_id": [str(i) for i in range(100)],
        **{c: pa.array(np.full(100, 2.0)) for c in ("a_ratio", "b_ratio")},
    })
    ds = ray.data.from_arrow(t)
    o1 = contaminate(ds, 0.3, seed=5, feature_cols=["a_ratio", "b_ratio"]).to_pandas()
    o2 = contaminate(ds, 0.3, seed=5, feature_cols=["a_ratio", "b_ratio"]).to_pandas()
    o1 = o1.sort_values("cand_id").reset_index(drop=True)
    o2 = o2.sort_values("cand_id").reset_index(drop=True)
    assert (o1.contaminated == o2.contaminated).all()
    assert 10 <= o1.contaminated.sum() <= 50
    assert (o1[o1.contaminated].a_ratio == 0.5).all()   # 1/2.0
    assert (o1[~o1.contaminated].a_ratio == 2.0).all()


def test_concatenation_features(ray_session):
    import pyarrow as pa
    from engine.geometry import PROPERTY_NAMES
    from engine.pairs import concatenation_features_dataset
    import pandas as pd
    props = pd.DataFrame({"doc_id": ["1", "2"],
                          **{p: [float(i + 1), float(i + 2)]
                             for i, p in enumerate(PROPERTY_NAMES)}})
    pairs_ds = ray.data.from_arrow(pa.table({
        "cand_id": ["1"], "index_id": ["2"]}))
    out = concatenation_features_dataset(pairs_ds, props, props).to_pandas()
    assert out[f"{PROPERTY_NAMES[0]}_cand"].iloc[0] == 1.0
    assert out[f"{PROPERTY_NAMES[0]}_index"].iloc[0] == 2.0
    assert len(out.columns) == 2 + 50


def test_log_transform():
    from datagen.buildings import build_mesh
    from engine.geometry import compute_properties
    mesh = [np.asarray(s, dtype=float) for s in build_mesh(4.0, 6.0, 3.0, 0, 2.0)]
    plain = compute_properties(mesh)
    logd = compute_properties(mesh, log_transform=True)
    assert logd["volume"] == pytest.approx(np.log1p(plain["volume"]))


def test_grid_search_fit():
    from engine.matching import grid_search_fit
    rng = np.random.default_rng(2)
    X = np.vstack([rng.normal(0, 1, (200, 4)), rng.normal(2, 1, (200, 4))])
    y = np.repeat([0, 1], 200).astype(np.int8)
    model, best_params, score = grid_search_fit(
        "RandomForest", {"n_estimators": [5, 10], "max_depth": [3]}, X, y, cv=3)
    assert score > 0.8
    assert best_params["max_depth"] == 3
    assert model.predict(X[:5]).shape == (5,)


def test_logistic_regression_model():
    from engine.matching import MODEL_REGISTRY
    rng = np.random.default_rng(6)
    X = np.vstack([rng.normal(0, 1, (300, 6)), rng.normal(1.5, 1, (300, 6))])
    y = np.repeat([0, 1], 300).astype(np.int8)
    m = MODEL_REGISTRY["LogisticRegression"]().fit(X, y)
    acc = (m.predict(X) == y).mean()
    assert acc > 0.8
    assert m.feature_importances_.shape == (6,)
    m2 = MODEL_REGISTRY["LogisticRegression"]().fit(X, y)
    assert (m.w_ == m2.w_).all()


def test_blocker_registry():
    from engine.blocking import get_blocker
    assert get_blocker("bkafi") is not None
    with pytest.raises(ValueError):
        get_blocker("nope")


def test_sdr_factor_scales_cands(ray_session):
    """SDR factor (blocking.py:166-174): cand vectors multiplied by the
    train property-ratio means before the search changes the ranking when
    factors != 1."""
    import pandas as pd
    import ray.data
    from engine import blocking as blk
    rng = np.random.default_rng(0)
    feats = ["f1", "f2"]
    index_df = pd.DataFrame({"doc_id": [str(i) for i in range(50)],
                             "f1": rng.normal(10, 2, 50),
                             "f2": rng.normal(5, 1, 50)})
    cand_df = pd.DataFrame({"doc_id": ["100"], "f1": [10.0], "f2": [5.0]})
    cands = ray.data.from_pandas(cand_df)
    nn1, _ = blk.bkafi_nn_dataset(cands, index_df, feats, 2, nn_param=5,
                                  concurrency=1)
    nn2, _ = blk.bkafi_nn_dataset(ray.data.from_pandas(cand_df), index_df,
                                  feats, 2, sdr_factors=np.array([2.0, 0.5]),
                                  nn_param=5, concurrency=1)
    a = nn1.to_pandas().sort_values("rank").index_id.tolist()
    b = nn2.to_pandas().sort_values("rank").index_id.tolist()
    assert a != b  # the factor genuinely alters the query point


def test_bkafi_std_criterion():
    from engine.blocking import select_blocking_features
    ratios = {"volume": {"mean": 1.0, "std": 0.01},
              "area": {"mean": 1.0, "std": 0.02},
              "height_diff": {"mean": 1.0, "std": 0.5}}
    imp = [("area_ratio", 0.9), ("height_diff_ratio", 0.5), ("volume_ratio", 0.1)]
    assert select_blocking_features(imp, ratios, 2, "std") == ["volume", "area"]
    assert select_blocking_features(imp, ratios, 2) == ["area", "height_diff"]


def test_query_oracle_registry_consistency():
    """Every oracle_sql key names a registered query; every query is
    callable; the driver-facing registries stay in sync."""
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "_entry", os.path.join(os.path.dirname(__file__), "..",
                               "__ray_entry__.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    qs, osql = mod.queries(), mod.oracle_sql()
    assert set(osql) <= set(qs), set(osql) - set(qs)
    assert all(callable(f) for f in qs.values())
    assert all(isinstance(s, str) and "SELECT" in s.upper()
               for s in osql.values())
    # the declared rows-only set stays the documented one
    rows_only = set(qs) - set(osql)
    assert rows_only <= {
        "contamination_retrain", "contrastive_matching",
        "geo_blocking_recall_grid", "geo_blocking_recall_std",
        "geo_contamination", "geo_match", "geo_match_concat",
        "geo_properties_all", "geo_render", "matching_models_eval",
        "media_frames", "media_resize", "multimodal_real", "sim_knn_ivf",
    }, rows_only - {"..."}
