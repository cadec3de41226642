"""End-to-end pipeline tests at sf0.001 (fast): blocking recall on planted
matches, matching quality floor, fused-vs-staged parity, checkpoint resume
(SURVEY.md §5 items (b), (d), (e))."""

import numpy as np
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def flagship(ray_session):
    from engine.pipeline import run_flagship
    return run_flagship(SF, seed=1, bkafi_dim=6, k=5)


def test_blocking_recall_planted(flagship):
    r = flagship["blocking_recall"]
    assert r[r.k == 1].blocking_recall.iloc[0] >= 0.99
    assert r[r.k == 5].blocking_recall.iloc[0] == 1.0


def test_matching_quality_floor(flagship):
    m = flagship["matching"]
    assert m["f1"] >= 0.9, m
    assert m["precision"] >= 0.85 and m["recall"] >= 0.9


def test_pairs_have_reference_label_semantics(flagship):
    df = flagship["scored"].to_pandas()
    assert ((df.cand_id == df.index_id) == (df.label == 1)).all()
    assert df["rank"].between(1, 5).all()


def test_fused_pipeline_matches_quality(ray_session):
    from engine.corpus import corpus_dataset
    from engine.pipeline import matching_inference_pipeline, prepare_state
    state = prepare_state(SF, seed=1, bkafi_dim=6, k=5, concurrency=2)
    out = matching_inference_pipeline(
        corpus_dataset(SF), state, concurrency=2).to_pandas()
    # every cand produced exactly k rows, ranked
    counts = out.groupby("cand_id").size()
    assert (counts == 5).all()
    # match quality at least as good as the staged pipeline floor
    tp = int(((out.label == 1) & (out.pred == 1)).sum())
    fp = int(((out.label == 0) & (out.pred == 1)).sum())
    fn = int(((out.label == 1) & (out.pred == 0)).sum())
    p = tp / (tp + fp)
    r = tp / (tp + fn)
    assert 2 * p * r / (p + r) >= 0.9


def test_checkpoint_resume_byte_identical(ray_session, tmp_path):
    import pyarrow.parquet as pq
    from engine.checkpoint import read_manifest, run_stage
    from engine.corpus import corpus_dataset
    from engine.properties import properties_dataset

    root = str(tmp_path)
    d1 = run_stage(root, "props", lambda: properties_dataset(corpus_dataset(SF)),
                   lineage={"input": SF})
    n1 = d1.count()
    t0 = d1.to_pandas().sort_values(["doc_id", "source"]).reset_index(drop=True)
    man1 = read_manifest(root, "props")
    # rerun: must skip (build_fn would raise)
    d2 = run_stage(root, "props",
                   lambda: (_ for _ in ()).throw(AssertionError("rebuilt")))
    assert d2.count() == n1
    # simulate a killed write: delete manifest -> rerun rebuilds
    import os
    os.remove(f"{root}/props/manifest.json")
    d3 = run_stage(root, "props", lambda: properties_dataset(corpus_dataset(SF)))
    man3 = read_manifest(root, "props")
    assert man3["total_rows"] == man1["total_rows"]
    # byte-identical partition content (sorted by doc_id/source)
    t1 = d3.to_pandas().sort_values(["doc_id", "source"]).reset_index(drop=True)
    assert (t1["volume"].to_numpy() == t0["volume"].to_numpy()).all()


def test_partitioned_resume_skips_finished(ray_session, tmp_path):
    """Partition-grained resume: a killed run (simulated by deleting two
    partition dirs) recomputes ONLY the missing partitions; total content
    is unchanged."""
    import pyarrow as pa
    import ray.data
    import shutil
    from engine.checkpoint import read_manifest, run_stage_partitioned

    calls = []

    def build(key):
        calls.append(key)
        base = int(key[1:]) * 100
        return ray.data.from_arrow(pa.table({
            "doc_id": pa.array(range(base, base + 50), type=pa.int64()),
            "part": pa.array([key] * 50)}))

    root = str(tmp_path)
    keys = ["p0", "p1", "p2", "p3"]
    d1 = run_stage_partitioned(root, "sharded", keys, build,
                               lineage={"demo": True})
    a = d1.to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert len(a) == 200 and sorted(calls) == keys
    # resume with nothing missing: zero rebuilds
    calls.clear()
    d2 = run_stage_partitioned(root, "sharded", keys, build)
    assert d2.count() == 200 and calls == []
    # kill simulation: two partitions lost
    for k in ("p1", "p3"):
        shutil.rmtree(f"{root}/sharded/parts/{k}")
    calls.clear()
    d3 = run_stage_partitioned(root, "sharded", keys, build)
    assert sorted(calls) == ["p1", "p3"]  # only the missing ones rebuilt
    b = d3.to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert a.equals(b)
    m = read_manifest(root, "sharded")
    assert set(m["partitions"]) == set(keys)
    assert all(e["rows"] == 50 for e in m["partitions"].values())


def test_threshold_filter_monotonic(ray_session):
    """bkafi_with_threshold semantics: shrinking threshold shrinks the nn
    table monotonically (M13/T12)."""
    from engine import blocking as blk
    from engine.pipeline import property_table, side_dataset, side_frame
    props = property_table(SF)
    feats = ["volume", "area", "height_diff"]
    cands = side_dataset(props, "cands", ["doc_id", *feats])
    index_df = side_frame(props, "index", ["doc_id", *feats])
    nn, _ = blk.bkafi_nn_dataset(cands, index_df, feats, 3, concurrency=2)
    nn = nn.materialize()
    dists = nn.to_pandas()["dist"]
    qs = np.percentile(dists, [10, 50, 90])
    counts = [blk.threshold_filter(nn, float(q)).count() for q in qs]
    assert counts[0] <= counts[1] <= counts[2]
    assert counts[2] <= nn.count()


def test_dirty_split_semantics(ray_session):
    """Dirty blocking split (data_partition_dirty.py analogue): removed
    cands have no true entity in the index side; recall over the matchable
    subset stays high; the removal fraction is about non_matched_rat."""
    from engine import splits
    from engine.pipeline import property_table, side_ids
    from engine.queries import geo_blocking_dirty
    props = property_table(SF)
    cand_ids, index_ids = side_ids(props)
    # the query runs over the exact-f64 flat-roof subset (oracle mode)
    cand_ids = [d for d in cand_ids if int(d) % 5 == 0]
    index_ids = [d for d in index_ids if int(d) % 5 == 0]
    test_cands, index_keep, removed = splits.dirty_blocking_split(
        cand_ids, index_ids, seed=1)
    assert set(removed) <= set(test_cands)
    assert not (set(removed) & set(index_keep))
    frac = len(removed) / len(test_cands)
    assert 0.1 <= frac <= 0.3
    df = geo_blocking_dirty(SF)
    assert (df.n_unmatched == len(removed)).all()
    assert df[df.k == 5].recall_matchable.iloc[0] >= 0.95


def test_prep_split_is_dataset_side_and_bounded(ray_session):
    """prep_train's driver-side collects are bounded by the train split:
    the prep dict carries NO test/cands id lists, and the dataset-side
    split predicate (split_cands_dataset) reproduces the old driver-side
    set-intersection + hash-bucket membership exactly."""
    from engine import splits
    from engine.pipeline import (prep_train, property_table, side_ids,
                                 split_cands_dataset, side_dataset)
    props = property_table(SF)
    prep = prep_train(props, seed=1)
    # no O(corpus) id list rides in prep — only the train subset + the
    # declared index broadcast
    assert "test_ids" not in prep and "cand_ids" not in prep
    # reference semantics check vs the (test-only) driver-side computation
    cand_ids, index_ids = side_ids(props)
    inter = sorted(set(cand_ids) & set(index_ids), key=int)
    want_train, want_test = splits.train_test_ids(inter, seed=1)
    assert prep["train_ids"] == sorted(want_train, key=int)
    assert prep["n_test"] == len(want_test)
    got_test = split_cands_dataset(
        side_dataset(props, "cands", ["doc_id"]), prep["split_ref"],
        prep["seed"], train=False).to_pandas().doc_id.tolist()
    assert sorted(got_test, key=int) == sorted(want_test, key=int)


def test_pair_features_plans_agree(ray_session):
    """The broadcast fast case and the bucketed-join 10^12 path of the pair
    feature stage produce identical rows."""
    import pyarrow as pa
    import ray.data
    from engine import pairs as P
    from engine.pipeline import property_table, side_ids
    props = property_table(SF)
    cand_ids, index_ids = side_ids(props)
    matched = sorted(set(cand_ids) & set(index_ids), key=int)[:40]
    pair_ds = ray.data.from_arrow(pa.table({
        "cand_id": pa.array(matched + matched, type=pa.string()),
        "index_id": pa.array(matched + list(reversed(matched)),
                             type=pa.string()),
    }))
    a = P.pair_features_join(pair_ds, props, strategy="broadcast") \
        .to_pandas().sort_values(["cand_id", "index_id"]).reset_index(drop=True)
    b = P.pair_features_join(pair_ds, props, strategy="join") \
        .to_pandas().sort_values(["cand_id", "index_id"]).reset_index(drop=True)
    assert len(a) == len(b) == 80
    for c in P.RATIO_FEATURE_NAMES:
        assert (a[c].to_numpy() == b[c].to_numpy()).all(), c


def test_flagship_log_transform_quality(ray_session):
    """Quality floor holds under the reference's default log1p property
    normalization (config.py:52) — blocking recall and matching F1."""
    from engine.pipeline import run_flagship
    res = run_flagship(SF, seed=1, bkafi_dim=6, k=5, log_transform=True)
    assert res["matching"]["f1"] >= 0.9
    r = res["blocking_recall"]
    assert r[r.k == 5].blocking_recall.iloc[0] >= 0.99


def test_flagship_fully_deterministic(ray_session):
    """Same seed -> bit-identical scored pairs across independent runs
    (stable hashes, seeded RF, deterministic tie-breaks — SURVEY §7.4.6)."""
    from engine.pipeline import run_flagship
    a = run_flagship(SF, seed=2, bkafi_dim=4, k=3)["scored"].to_pandas()
    b = run_flagship(SF, seed=2, bkafi_dim=4, k=3)["scored"].to_pandas()
    a = a.sort_values(["cand_id", "index_id"]).reset_index(drop=True)
    b = b.sort_values(["cand_id", "index_id"]).reset_index(drop=True)
    assert (a.index_id.to_numpy() == b.index_id.to_numpy()).all()
    assert (a.pred.to_numpy() == b.pred.to_numpy()).all()
    assert (a.dist.to_numpy() == b.dist.to_numpy()).all()


def test_size_aware_blocks_bounds():
    """Block sizing: floors at min(min_blocks, requested), caps at
    requested, scales with row count, and probes at most a bounded number
    of parquet footers (extrapolation for many-file corpora)."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import tempfile, os
    from engine.corpus import size_aware_blocks
    with tempfile.TemporaryDirectory() as d:
        t = pa.table({"x": pa.array(range(100), type=pa.int64())})
        for i in range(40):  # 4000 rows over 40 files
            pq.write_table(t, os.path.join(d, f"p{i:03d}.parquet"))
        n = size_aware_blocks(d, requested=64, rows_per_block=256)
        assert n == 16, n  # ceil(4000/256)
        assert size_aware_blocks(d, requested=8) == 8      # cap
        one = os.path.join(d, "p000.parquet")
        assert size_aware_blocks(one, requested=64) == 8   # floor


def test_partitioned_resume_survives_sigkill_sf01(ray_session, tmp_path):
    """Real kill/resume at partition grain over the sf0.1 documents table:
    a subprocess running run_stage_partitioned is SIGKILLed after >= 2
    partitions commit; the in-session resume (a) validates and SKIPS every
    committed partition (manifest created_unix timestamps unchanged), (b)
    recomputes only the rest, and (c) the final table equals an uninterrupted
    build, file-for-file identical by the manifest's per-file sha."""
    import json
    import os
    import signal
    import subprocess
    import sys
    import time

    from engine.checkpoint import read_manifest, run_stage_partitioned
    from tests.partition_kill_runner import PART_KEYS, build_doc_part

    sf = "/root/testdata/sf0.1"
    root = str(tmp_path / "killrun")
    runner = os.path.join(os.path.dirname(__file__),
                          "partition_kill_runner.py")
    env = dict(os.environ)
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(runner))
    proc = subprocess.Popen([sys.executable, runner, root, sf], env=env,
                            stdout=subprocess.DEVNULL,
                            stderr=subprocess.DEVNULL)
    mp = os.path.join(root, "docstats", "manifest.json")
    deadline = time.time() + 300
    try:
        while time.time() < deadline:
            if os.path.exists(mp):
                try:
                    n_done = len(json.load(open(mp)).get("partitions", {}))
                except Exception:
                    n_done = 0
                if n_done >= 2:
                    break
            if proc.poll() is not None:
                break
            time.sleep(0.05)
        assert proc.poll() is None, "runner finished before the kill"
        proc.send_signal(signal.SIGKILL)   # hard kill mid-stage
    finally:
        proc.wait()

    survivors = read_manifest(root, "docstats")["partitions"]
    assert 2 <= len(survivors) < len(PART_KEYS), sorted(survivors)
    stamps = {k: v["created_unix"] for k, v in survivors.items()}

    # resume in this session: only missing partitions recompute
    d = run_stage_partitioned(root, "docstats", PART_KEYS,
                              build_doc_part(sf))
    man = read_manifest(root, "docstats")
    assert set(man["partitions"]) == set(PART_KEYS)
    for k, ts in stamps.items():   # committed partitions untouched
        assert man["partitions"][k]["created_unix"] == ts, k

    # content equals an uninterrupted build exactly (parquet FILE bytes
    # embed Ray's per-run write UUID in name+footer, so identity is at the
    # value level: same rows, same order, same dtypes per partition)
    clean_root = str(tmp_path / "cleanrun")
    d2 = run_stage_partitioned(clean_root, "docstats", PART_KEYS,
                               build_doc_part(sf))
    man2 = read_manifest(clean_root, "docstats")
    for k in PART_KEYS:
        assert man["partitions"][k]["rows"] == man2["partitions"][k]["rows"]
    a = d.to_pandas()
    b = d2.to_pandas()
    assert a.equals(b)          # row-for-row, order included
    assert a.doc_id.is_unique and len(a) == 5000


def test_read_schemas_stay_hashable(ray_session):
    """Regression guard for the schema-dedup fix: blocks read from
    pandas-written parquet must carry metadata-free (hashable) schemas —
    an unhashable schema silently defeats Ray's unify_schemas early exit
    and floods 'Failed to hash the schemas' warnings at every block merge."""
    from engine.storage import read_parquet_clean
    for cols in (None, ["doc_id", "text"]):
        b = read_parquet_clean("/root/testdata/sf0.001/documents.parquet",
                               columns=cols).take_batch(
            5, batch_format="pyarrow")
        assert b.schema.metadata is None
        hash(b.schema)   # must not raise
