"""Golden check: Ray property pipeline vs DuckDB closed-form oracle, exact
(bit-for-bit) equality on the flat-roof subset (SURVEY.md §5 item (b))."""

import duckdb
import numpy as np

from engine import oracles
from engine.corpus import corpus_dataset
from engine.properties import properties_dataset

SF = "/root/testdata/sf0.001"

EXACT_COLS = [
    "bounding_box_width", "bounding_box_length", "area", "perimeter",
    "perimeter_ind", "volume", "convex_hull_area", "convex_hull_volume",
    "height_diff", "num_floors", "axes_symmetry", "compactness_2d",
    "compactness_3d", "density", "shape_ind", "hemisphericality",
    "num_vertices",
]


def _oracle(sql):
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')")
    return con.sql(sql).df().sort_values("doc_id").reset_index(drop=True)


def test_properties_match_oracle_exactly():
    props = properties_dataset(corpus_dataset(SF)).to_pandas()
    flat = props[(props.source == "cands")
                 & (props.doc_id.astype(int) % 5 == 0)]
    flat = flat[["doc_id", *EXACT_COLS]].sort_values("doc_id").reset_index(drop=True)
    odf = _oracle(oracles.GEO_PROPERTIES)[["doc_id", *EXACT_COLS]]
    assert len(flat) == len(odf) > 0
    for c in EXACT_COLS:
        a, b = flat[c].to_numpy(), odf[c].to_numpy()
        assert (a == b).all(), f"{c}: max diff {np.abs(a - b).max()}"


def test_centroids_match_oracle_exactly():
    props = properties_dataset(corpus_dataset(SF)).to_pandas()
    got = props[(props.source == "cands") & (props.doc_id.astype(int) % 5 == 0)]
    got = got[["doc_id", "cx", "cy"]].sort_values("doc_id").reset_index(drop=True)
    odf = _oracle(oracles.GEO_CENTROIDS)
    assert (got.cx.to_numpy() == odf.cx.to_numpy()).all()
    assert (got.cy.to_numpy() == odf.cy.to_numpy()).all()


def test_corpus_shape_and_sources():
    import pyarrow.parquet as pq
    from engine.corpus import ensure_corpus
    t = pq.read_table(ensure_corpus(SF))
    src = t.column("source").to_pylist()
    n_c = src.count("cands")
    n_i = src.count("index")
    assert n_c == 500
    assert n_i > n_c  # matched copies + one extra per key
