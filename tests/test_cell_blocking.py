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
