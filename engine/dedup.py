"""Deduplication operators: exact, n-gram Jaccard, MinHash+LSH, SimHash,
embedding-cosine near-dup.

Ray-native shapes (ray_guide.md "Aggregation at scale"): content hash in a
vectorized map_batches -> groupby(hash) keep-first for exact; shingle ->
minhash -> band explode -> groupby(band) -> verify for LSH.  A corpus with
*planted* duplicates (every doc_id % 7 == 0 re-emitted under doc_id+100000)
makes the checks non-trivial at any scale.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data


def planted_dup_corpus(docs: ray.data.Dataset) -> ray.data.Dataset:
    """documents ∪ duplicates of every doc_id % 7 == 0 at doc_id+100000."""
    def dup(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy()
        mask = ids % 7 == 0
        extra = batch.filter(pa.array(mask))
        extra = extra.set_column(
            extra.schema.get_field_index("doc_id"), "doc_id",
            pa.array(extra.column("doc_id").to_numpy() + 100000))
        return pa.concat_tables([batch, extra])

    return docs.select_columns(["doc_id", "text"]).map_batches(
        dup, batch_format="pyarrow")


def exact_dedup(docs: ray.data.Dataset) -> ray.data.Dataset:
    """Keep min(doc_id) per identical text; emit (doc_id, dup_count).

    Shape: per-block PARTIAL aggregate on the content digest (combiner —
    only (digest, min_id, count) rows ride the shuffle, never text), then a
    coarse 64-bucket shuffle with ONE vectorized pandas aggregate per bucket.
    A per-digest groupby would pay ~1 ms of per-group overhead on one
    near-singleton Ray group per distinct document (the shape this repo
    measured at 75 s / 400k groups and replaced everywhere else).
    """
    NUM_BUCKETS = 64

    def partial(batch: pa.Table) -> pa.Table:
        # full 128-bit md5 as two int64 columns: no hex-string objects, no
        # second hashing pass for the bucket (bucket = h1 % B directly)
        texts = batch.column("text").to_pylist()
        hs = np.empty((len(texts), 2), dtype=np.uint64)
        for i, t in enumerate(texts):
            hs[i] = np.frombuffer(hashlib.md5(t.encode()).digest(),
                                  dtype=np.uint64)
        h = hs.view(np.int64)
        df = pd.DataFrame({"__h1": h[:, 0], "__h2": h[:, 1],
                           "doc_id": batch.column("doc_id").to_numpy()})
        r = df.groupby(["__h1", "__h2"], as_index=False).agg(
            doc_id=("doc_id", "min"), n=("doc_id", "size"))
        return pa.table({
            "__h1": pa.array(r["__h1"].to_numpy()),
            "__h2": pa.array(r["__h2"].to_numpy()),
            "doc_id": pa.array(r["doc_id"].to_numpy(), type=pa.int64()),
            "n": pa.array(r["n"].to_numpy().astype(np.int64)),
            "__b": pa.array((r["__h1"].to_numpy().view(np.uint64)
                             % NUM_BUCKETS).astype(np.int64)),
        })

    def bucket_agg(g: pd.DataFrame) -> pd.DataFrame:
        r = g.groupby(["__h1", "__h2"], as_index=False).agg(
            doc_id=("doc_id", "min"), dup_count=("n", "sum"))
        return r[["doc_id", "dup_count"]]

    return docs.map_batches(partial, batch_format="pyarrow") \
        .groupby("__b").map_groups(bucket_agg, batch_format="pandas")


def _shingles(text: str, n: int = 3, pad: bool = False) -> set[str]:
    """n-gram word shingles.  Docs shorter than n tokens produce the empty
    set (matching the SQL oracle's generate_series semantics) unless ``pad``
    (used by minhash, which needs >= 1 shingle per doc)."""
    toks = text.split(" ")
    if len(toks) < n:
        return {" ".join(toks)} if pad else set()
    return {" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)}


def ngram_jaccard_pairs(docs: ray.data.Dataset, threshold: float = 0.6,
                        n: int = 3, max_df: int = 1000,
                        df_cap: int = 200_000) -> ray.data.Dataset:
    """All-pairs n-gram Jaccard >= threshold among docs sharing a shingle.

    Shape (fully streaming, no driver materialization anywhere): explode
    (shingle, doc) -> groupby(shingle) pair generation -> distributed
    distinct -> bucketed-join exact verify.  Exact Jaccard values are ratios
    of ints (SQL-exact).  Emits (a_id, b_id, jaccard) with a_id < b_id.

    ``max_df``: document-frequency cutoff — a shingle appearing in more than
    ``max_df`` docs is skipped for pair *generation* (its O(df^2) pair
    explosion would dominate; any pair clearing a 0.6 threshold shares many
    shingles, so high-DF stop-shingles are redundant as candidates).  This
    bounds every group; pairs connected ONLY through dropped stop-shingles
    are not generated (documented approximation; raise max_df to disable).

    ``df_cap``: the driver-side document-frequency table is a capped
    heavy-hitters table, NOT the full distinct-shingle map: only the top
    ``df_cap`` shingles by (df DESC, shingle ASC), among those with df >= 2,
    are kept (per-bucket top-K then a final driver cut, so driver memory is
    O(df_cap) at any corpus size).  Every shingle outside the table is
    treated as df = 1.  The AllPairs prefix filter is LOSSLESS under ANY
    globally-consistent shingle order, and (df_capped(s), s) is consistent
    across all docs — truncation only affects pruning *efficiency* (the
    highest-df shingles, which drive the pruning, are exactly the ones
    kept), never the verified output.  Tie policy: rank by (df DESC,
    shingle ASC), deterministic at any parallelism.
    """
    NUM_BUCKETS = 64
    import ray as _ray

    from engine.joins import fast_hash64

    def explode(batch: pa.Table) -> pa.Table:
        ids, shs = [], []
        for d, t in zip(batch.column("doc_id").to_pylist(),
                        batch.column("text").to_pylist()):
            for s in _shingles(t, n):
                ids.append(d)
                shs.append(s)
        return pa.table({"doc_id": pa.array(ids, type=pa.int64()),
                         "shingle": pa.array(shs)})

    # global shingle document frequencies, BOUNDED: per-block partial counts
    # (combiner) -> coarse-bucket shuffle -> per-bucket exact sum + top-K cut
    # -> final driver cut to df_cap.  They define the canonical rare-first
    # order for PREFIX FILTERING; see the df_cap contract in the docstring.
    def block_df(batch: pa.Table) -> pa.Table:
        v, c = np.unique(batch.column("shingle").to_numpy(zero_copy_only=False),
                         return_counts=True)
        return pa.table({"shingle": pa.array(v),
                         "n": pa.array(c.astype(np.int64)),
                         "__b": pa.array(
                             (fast_hash64(v) % NUM_BUCKETS).astype(np.int64))})

    def topk_bucket(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby("shingle", as_index=False)["n"].sum()
        s = s[s.n >= 2]  # df=1 shingles pair with nothing
        s = s.sort_values(["n", "shingle"], ascending=[False, True],
                          kind="mergesort").head(df_cap)
        return s[["shingle", "n"]]

    dfp = docs.map_batches(explode, batch_format="pyarrow") \
        .map_batches(block_df, batch_format="pyarrow") \
        .groupby("__b").map_groups(topk_bucket, batch_format="pandas") \
        .to_pandas()
    dfp = dfp.sort_values(["n", "shingle"], ascending=[False, True],
                          kind="mergesort").head(df_cap)
    df_ref = _ray.put(dict(zip(dfp.shingle, dfp.n)))

    def prefix_explode(batch: pa.Table) -> pa.Table:
        """AllPairs/SSJoin prefix filter (Bayardo et al. 2007): under a
        global (df, shingle) order, any pair with Jaccard >= t shares a
        shingle within each side's first |S| - ceil(t*|S|) + 1 shingles —
        so candidate generation over PREFIX shingles only is lossless while
        skipping every high-DF shingle outside the rare prefix."""
        dfmap = _ray.get(df_ref)
        ids, shs = [], []
        for d, t in zip(batch.column("doc_id").to_pylist(),
                        batch.column("text").to_pylist()):
            sh = _shingles(t, n)
            if not sh:
                continue
            p = len(sh) - int(np.ceil(threshold * len(sh))) + 1
            ordered = sorted(sh, key=lambda s: (dfmap.get(s, 1), s))[:p]
            for s in ordered:
                ids.append(d)
                shs.append(s)
        t_ = pa.table({"doc_id": pa.array(ids, type=pa.int64()),
                       "shingle": pa.array(shs)})
        # coarse shuffle bucket (all rows of one shingle share a bucket);
        # per-SHINGLE map_groups would pay ~1 ms of per-group overhead on
        # tens of thousands of near-singleton groups
        return t_.append_column("__b", pa.array(
            (fast_hash64(shs) % NUM_BUCKETS).astype(np.int64)))

    exploded = docs.map_batches(prefix_explode, batch_format="pyarrow")

    def pairs_in_bucket(g: pd.DataFrame) -> pd.DataFrame:
        """Vectorized pair generation for every shingle in the bucket: DF
        filter (2..max_df) then one self-merge on the shingle key."""
        df = g.groupby("shingle")["doc_id"].transform("size")
        g = g[(df >= 2) & (df <= max_df)][["doc_id", "shingle"]]
        if g.empty:
            return pd.DataFrame({"a_id": pd.Series([], dtype="int64"),
                                 "b_id": pd.Series([], dtype="int64")})
        m = g.merge(g, on="shingle")
        m = m[m.doc_id_x < m.doc_id_y]
        m = m.drop_duplicates(["doc_id_x", "doc_id_y"])
        return pd.DataFrame({"a_id": m.doc_id_x.to_numpy(),
                             "b_id": m.doc_id_y.to_numpy()})

    cand = exploded.groupby("__b").map_groups(
        pairs_in_bucket, batch_format="pandas")
    return _verify_pairs_join(docs, _distinct_pairs(cand), n, threshold)


def _distinct_pairs(cand: ray.data.Dataset) -> ray.data.Dataset:
    """Distributed (a_id, b_id) distinct: per-block pre-dedup (combiner),
    coarse hash-bucket shuffle, then ONE vectorized drop_duplicates per
    bucket — a per-key groupby/aggregate would pay per-group overhead on
    hundreds of thousands of near-singleton pair groups (measured 75s for
    400k rows; this shape takes ~2s)."""
    NUM_BUCKETS = 64

    def block_dedup(b: pa.Table) -> pa.Table:
        df = pd.DataFrame({"a_id": b.column("a_id").to_numpy(),
                           "b_id": b.column("b_id").to_numpy()})
        df = df.drop_duplicates(["a_id", "b_id"])
        a = df.a_id.to_numpy()
        bb = df.b_id.to_numpy()
        h = (a.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)) \
            ^ bb.astype(np.uint64)
        return pa.table({
            "a_id": pa.array(a, type=pa.int64()),
            "b_id": pa.array(bb, type=pa.int64()),
            "__pb": pa.array((h % NUM_BUCKETS).astype(np.int64)),
        })

    def dedup_bucket(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates(["a_id", "b_id"])[["a_id", "b_id"]]

    return cand.map_batches(block_dedup, batch_format="pyarrow") \
        .groupby("__pb").map_groups(dedup_bucket, batch_format="pandas")


def _dedup_keyed_rows(ds: ray.data.Dataset,
                      keys: list[str]) -> ray.data.Dataset:
    """Defensive exactly-once on a final pair table: drop any duplicated
    key rows (all columns kept; duplicates, when they occur, are identical
    copies of the same verified pair).  Same coarse-bucket shape as
    ``_distinct_pairs``.  Belt-and-braces: one sweep observed a transient
    duplicate-row anomaly at the end of a long multi-query session (7 dup
    rows out of 90, unreproducible across 10+ reruns); an independent final
    dedup pass squares the probability of any such anomaly surviving."""
    NUM_BUCKETS = 64

    def tag(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return b.append_column("__db", pa.array([], type=pa.int64()))
        h = np.zeros(b.num_rows, dtype=np.uint64)
        for k in keys:  # fold every key column into the bucket hash
            h = (h ^ b.column(k).to_numpy().astype(np.uint64)) \
                * np.uint64(0x9E3779B97F4A7C15)
        return b.append_column(
            "__db", pa.array((h % NUM_BUCKETS).astype(np.int64)))

    def dedup_bucket(g: pd.DataFrame) -> pd.DataFrame:
        out = g.drop_duplicates(keys).drop(columns=["__db"])
        if len(out) != len(g):
            # observe recurrence instead of silently absorbing it (see the
            # anomaly note above): worker-side log with exact counts
            import logging
            logging.getLogger("engine.dedup").warning(
                "_dedup_keyed_rows dropped %d duplicate key rows "
                "(bucket of %d) — exactly-once anomaly recurred",
                len(g) - len(out), len(g))
        return out

    return ds.map_batches(tag, batch_format="pyarrow") \
        .groupby("__db").map_groups(dedup_bucket, batch_format="pandas")


def _batch_shingle_hashes(texts: list[str], n: int, pad: bool):
    """Per-batch shingle hashing with md5 computed once per UNIQUE shingle:
    returns (counts per doc, uint64 hash stream in doc order).  The
    per-shingle interpreter loop runs over the (much smaller) unique set."""
    sh_lists = [sorted(_shingles(t, n, pad=pad)) for t in texts]
    counts = np.fromiter((len(s) for s in sh_lists), dtype=np.int64,
                         count=len(sh_lists))
    flat = [s for sl in sh_lists for s in sl]
    if not flat:
        return counts, np.empty(0, dtype=np.uint64)
    uniq, inv = np.unique(np.asarray(flat, dtype=object), return_inverse=True)
    hs = np.empty(len(uniq), dtype=np.uint64)
    for i, s in enumerate(uniq):
        hs[i] = int.from_bytes(hashlib.md5(s.encode()).digest()[:8], "little")
    return counts, hs[inv]


def _shingle_signatures(docs: ray.data.Dataset, n: int,
                        pad: bool) -> ray.data.Dataset:
    """(doc_id, shs: list<uint64>) per-doc sorted shingle-hash signatures —
    int lists flow zero-copy into numpy for the vectorized verify."""
    def sig(batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        counts, stream = _batch_shingle_hashes(texts, n, pad)
        starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
        sets_ = [np.sort(stream[s:s + c])
                 for s, c in zip(starts, counts)]
        ids = pc.cast(batch.column("doc_id"), pa.int64())
        return pa.table({"doc_id": ids,
                         "shs": pa.array(sets_, type=pa.list_(pa.uint64()))})

    return docs.map_batches(sig, batch_format="pyarrow")


def _involved_filter(ds: ray.data.Dataset, id_col: str,
                     involved: np.ndarray) -> ray.data.Dataset:
    """Filter ``ds`` to rows whose ``id_col`` is in the broadcast sorted
    int64 ``involved`` array (ray.put once, searchsorted membership per
    batch) — the shared scan of every driver-verify gate."""
    inv_ref = ray.put(involved)

    def keep(bt: pa.Table) -> pa.Table:
        arr = ray.get(inv_ref)
        ids = bt.column(id_col).to_numpy()
        pos = np.searchsorted(arr, ids)
        pos[pos == len(arr)] = 0
        return bt.filter(pa.array(arr[pos] == ids))

    return ds.map_batches(keep, batch_format="pyarrow")


# Driver-verify bound for _verify_pairs_join: candidate pair tables are
# bounded upstream (stop-bucket / max_df / banding caps), so they are
# usually tiny; under this many pairs the exact-Jaccard verify runs on the
# driver over ONE filtered signature scan instead of paying two bucketed
# joins.  Above it, the no-driver join plan runs.
MAX_DRIVER_VERIFY_PAIRS = 50_000
# ... and a CELL budget on what the driver-verify gates may collect (shingle
# hashes / embedding floats across all involved docs, ~8 bytes each —
# 50M cells ~= 400 MB): pair count alone says nothing about row width.
MAX_DRIVER_VERIFY_CELLS = 50_000_000


def _verify_pairs_join(docs: ray.data.Dataset, cand_pairs: ray.data.Dataset,
                       n: int, threshold: float,
                       pad: bool = False,
                       max_driver_pairs: int | None = None
                       ) -> ray.data.Dataset:
    """Exact-Jaccard verification of candidate pairs, size-gated.

    SMALL pair tables (<= MAX_DRIVER_VERIFY_PAIRS — the common case, since
    every candidate generator caps its buckets): one scan of the corpus
    computes shingle signatures, FILTERED to the <= 2x|pairs| involved docs
    via a broadcast sorted-id array; the exact int-ratio Jaccard then runs
    on the driver with the identical numpy math as the join path's kernel.

    LARGE pair tables: pairs ⋈ signatures(a side) ⋈ signatures(b side) via
    two bucketed hash joins, then a per-row exact Jaccard + threshold
    filter — nothing materializes on the driver; both joins bound
    per-group memory by bucket count."""
    from engine.joins import bucketed_hash_join

    cand_pairs = cand_pairs.materialize()
    bound = MAX_DRIVER_VERIFY_PAIRS if max_driver_pairs is None \
        else max_driver_pairs
    shs_map = None
    if cand_pairs.count() <= bound:
        pdf = cand_pairs.to_pandas()
        empty = pa.table({"a_id": pa.array([], type=pa.int64()),
                          "b_id": pa.array([], type=pa.int64()),
                          "jaccard": pa.array([], type=pa.float64())})
        if len(pdf) == 0:
            return ray.data.from_arrow(empty)
        a = pdf["a_id"].to_numpy(dtype=np.int64)
        b = pdf["b_id"].to_numpy(dtype=np.int64)
        involved = np.unique(np.concatenate([a, b]))
        # BYTE bound as well as the row bound: the involved docs' shingle
        # sets land on the driver, and pair count says nothing about set
        # width.  Stream the filtered scan and bail to the join plan if
        # the total cell count exceeds the budget (the join plan never
        # drivers a doc->shingles map).
        shs_map, cells = {}, 0
        for bt in _involved_filter(_shingle_signatures(docs, n, pad),
                                   "doc_id", involved) \
                .iter_batches(batch_format="pyarrow"):
            kdf = bt.to_pandas()
            for did, shs in zip(kdf["doc_id"].to_numpy(dtype=np.int64),
                                kdf["shs"]):
                shs_map[did] = shs
                cells += len(shs)
            if cells > MAX_DRIVER_VERIFY_CELLS:
                shs_map = None     # too wide: fall through to the joins
                break
    if shs_map is not None:
        out = np.empty(len(pdf))
        for i in range(len(pdf)):
            sa = np.asarray(shs_map.get(a[i], ()), dtype=np.uint64)
            sb = np.asarray(shs_map.get(b[i], ()), dtype=np.uint64)
            if not len(sa) or not len(sb):
                out[i] = 0.0
                continue
            inter = np.intersect1d(sa, sb, assume_unique=True).size
            out[i] = inter / (len(sa) + len(sb) - inter)
        m = out >= threshold
        return ray.data.from_arrow(pa.table({
            "a_id": pa.array(a[m], type=pa.int64()),
            "b_id": pa.array(b[m], type=pa.int64()),
            "jaccard": pa.array(out[m], type=pa.float64()),
        }) if m.any() else empty)

    # materialize (to the distributed object store, not the driver): the
    # signature table feeds BOTH join sides
    sigs = _shingle_signatures(docs, n, pad).materialize()

    def sig_side(prefix: str) -> ray.data.Dataset:
        def f(b: pa.Table) -> pa.Table:
            return pa.table({f"{prefix}_doc": b.column("doc_id"),
                             f"{prefix}_shs": b.column("shs")})
        return sigs.map_batches(f, batch_format="pyarrow")

    j = bucketed_hash_join(cand_pairs, sig_side("a"),
                           "a_id", "a_doc").drop_columns(["a_doc"])
    j = bucketed_hash_join(j, sig_side("b"),
                           "b_id", "b_doc").drop_columns(["b_doc"])

    def jac(batch: pa.Table) -> pa.Table:
        def flat(col):
            arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
            return (arr.values.to_numpy(zero_copy_only=False),
                    arr.offsets.to_numpy(zero_copy_only=False))

        av, ao = flat(batch.column("a_shs"))
        bv, bo = flat(batch.column("b_shs"))
        out = np.empty(batch.num_rows)
        for i in range(batch.num_rows):
            sa = av[ao[i]:ao[i + 1]]
            sb = bv[bo[i]:bo[i + 1]]
            if not len(sa) or not len(sb):
                out[i] = 0.0
                continue
            # sorted unique uint64 arrays -> C-speed intersection size
            inter = np.intersect1d(sa, sb, assume_unique=True).size
            out[i] = inter / (len(sa) + len(sb) - inter)
        t = pa.table({
            "a_id": batch.column("a_id").cast(pa.int64()),
            "b_id": batch.column("b_id").cast(pa.int64()),
            "jaccard": pa.array(out, type=pa.float64()),
        })
        return t.filter(pc.greater_equal(t.column("jaccard"),
                                         pa.scalar(threshold)))

    return j.map_batches(jac, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

_MERSENNE = (1 << 61) - 1


def _perm_params(num_perm: int, seed: int = 7):
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE, size=num_perm, dtype=np.int64).astype(object)
    b = rng.integers(0, _MERSENNE, size=num_perm, dtype=np.int64).astype(object)
    return a, b


def minhash_signatures(docs: ray.data.Dataset, num_perm: int = 64,
                       n: int = 3) -> ray.data.Dataset:
    """Per-doc minhash signature over n-gram shingles (vectorized perms)."""
    a, b = _perm_params(num_perm)
    a64 = np.asarray([int(x) for x in a], dtype=np.uint64)
    b64 = np.asarray([int(x) for x in b], dtype=np.uint64)

    def sig(batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        counts, stream = _batch_shingle_hashes(texts, n, pad=True)
        # universal hash family: (a*h + b) mod 2^64 (wraparound ok) over the
        # whole shingle stream at once, then a per-doc segmented min
        vals = stream[:, None] * a64[None, :] + b64[None, :]
        starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
        mins = np.minimum.reduceat(vals, starts, axis=0) \
            if len(vals) else np.empty((0, len(a64)), dtype=np.uint64)
        out = mins.astype(np.int64)
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "sig": pa.array([o.tolist() for o in out],
                            type=pa.list_(pa.int64())),
        })

    return docs.map_batches(sig, batch_format="pyarrow")


def minhash_lsh_pairs(docs: ray.data.Dataset, num_perm: int = 64,
                      bands: int = 16, threshold: float = 0.5,
                      n: int = 3, max_bucket: int = 2000) -> ray.data.Dataset:
    """Banded LSH candidate pairs, verified with exact Jaccard.

    shingle -> minhash -> (band_id, band_hash, doc_id) explode ->
    groupby(band) pairs -> distributed distinct -> bucketed-join verify
    (ray_guide.md near-dup recipe); no driver-side pair materialization.

    ``max_bucket`` caps LSH bucket size: a band bucket holding more than
    ``max_bucket`` docs is dropped entirely (classic stop-bucket removal —
    such buckets are near-degenerate hashes whose O(size^2) pair explosion
    would dominate; true near-dup clusters that large still surface through
    their other 15 bands).  Bounds every group at scale.
    """
    rows_per_band = num_perm // bands
    sigs = minhash_signatures(docs, num_perm, n)

    NUM_BUCKETS = 64
    from engine.joins import list_column_matrix  # hoisted: workers can't import late

    def band_explode(batch: pa.Table) -> pa.Table:
        """Vectorized: band key = a 64-bit multiply-xor mix of the band's
        signature values (equality-equivalent to hashing the band tuple —
        only bucket EQUALITY matters downstream, which the SQL oracle
        replicates by grouping on the tuple itself)."""
        n = batch.num_rows
        if n == 0:
            return pa.table({"doc_id": pa.array([], type=pa.int64()),
                             "band": pa.array([], type=pa.int32()),
                             "bh": pa.array([], type=pa.int64()),
                             "__b": pa.array([], type=pa.int64())})
        M = list_column_matrix(batch.column("sig"), dtype=np.int64) \
            .view(np.uint64).reshape(n, bands, rows_per_band)
        mix = np.full((n, bands), 0xcbf29ce484222325, dtype=np.uint64)
        for r in range(rows_per_band):   # FNV-style fold over the band tuple
            mix = (mix ^ M[:, :, r]) * np.uint64(0x100000001b3)
        ids = np.repeat(batch.column("doc_id").to_numpy(), bands)
        band_ids = np.tile(np.arange(bands, dtype=np.int32), n)
        bh = mix.reshape(-1).view(np.int64)
        # coarse shuffle bucket (all rows of one LSH bucket co-locate)
        return pa.table({"doc_id": pa.array(ids, type=pa.int64()),
                         "band": pa.array(band_ids),
                         "bh": pa.array(bh),
                         "__b": pa.array(
                             (mix.reshape(-1) % np.uint64(NUM_BUCKETS))
                             .astype(np.int64))})

    def pairs_in_shuffle_bucket(g: pd.DataFrame) -> pd.DataFrame:
        """Vectorized pair generation for every (band, bh) bucket in the
        shuffle group: stop-bucket removal then one self-merge."""
        sz = g.groupby(["band", "bh"])["doc_id"].transform("size")
        g = g[(sz >= 2) & (sz <= max_bucket)][["doc_id", "band", "bh"]]
        if g.empty:
            return pd.DataFrame({"a_id": pd.Series([], dtype="int64"),
                                 "b_id": pd.Series([], dtype="int64")})
        m = g.merge(g, on=["band", "bh"])
        m = m[m.doc_id_x < m.doc_id_y]
        m = m.drop_duplicates(["doc_id_x", "doc_id_y"])
        return pd.DataFrame({"a_id": m.doc_id_x.to_numpy(),
                             "b_id": m.doc_id_y.to_numpy()})

    cand = sigs.map_batches(band_explode, batch_format="pyarrow") \
        .groupby("__b").map_groups(pairs_in_shuffle_bucket,
                                   batch_format="pandas")
    return _verify_pairs_join(docs, _distinct_pairs(cand), n, threshold,
                              pad=True)


def simhash_signatures(docs: ray.data.Dataset) -> ray.data.Dataset:
    """64-bit SimHash over tokens: per-bit sign sum of token hashes.

    Vectorized: md5 is computed once per UNIQUE token in the batch (the
    earlier per-row×per-token interpreter loop dominated the hot text path);
    per-doc bit sums come from one ``np.add.reduceat`` over the token
    stream.  Token repeats still count (sum over occurrences, acc > 0
    strictly) — bit-identical to the scalar definition, which the DuckDB
    oracle replicates."""
    def sim(batch: pa.Table) -> pa.Table:
        shifts = np.arange(64, dtype=np.uint64)
        texts = batch.column("text").to_pylist()
        if not texts:
            return pa.table({"doc_id": batch.column("doc_id"),
                             "simhash": pa.array([], type=pa.uint64())})
        tok_lists = [t.split(" ") for t in texts]
        counts = np.fromiter((len(ws) for ws in tok_lists),
                             dtype=np.int64, count=len(tok_lists))
        flat = np.asarray([w for ws in tok_lists for w in ws], dtype=object)
        uniq, inv = np.unique(flat, return_inverse=True)
        hs = np.empty(len(uniq), dtype=np.uint64)
        for i, w in enumerate(uniq):
            hs[i] = int.from_bytes(hashlib.md5(w.encode()).digest()[:8],
                                   "little")
        bits = ((hs[:, None] >> shifts[None, :]) & np.uint64(1)) \
            .astype(np.int64)                      # (U, 64)
        starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
        S = np.add.reduceat(bits[inv], starts, axis=0)  # per-doc bit sums
        acc = 2 * S - counts[:, None]              # sum of ±1 per bit
        out = np.bitwise_or.reduce(
            (acc > 0).astype(np.uint64) << shifts[None, :], axis=1)
        return pa.table({"doc_id": batch.column("doc_id"),
                         "simhash": pa.array(out)})

    return docs.map_batches(sim, batch_format="pyarrow")


def simhash_pairs(docs: ray.data.Dataset, max_hamming: int = 3,
                  bands: int = 4, max_bucket: int = 2000,
                  max_driver_pairs: int | None = None) -> ray.data.Dataset:
    """SimHash near-dup pairs: banded exact-match blocking + popcount verify.

    The 64-bit signature splits into ``bands`` equal slices; by pigeonhole
    any pair within hamming distance <= bands-1 matches exactly on at least
    one slice, so the banded groupby is LOSSLESS for ``max_hamming <=
    bands - 1`` (the default).  Verification joins each side's signature
    back via the bucketed hash join and filters on vectorized popcount of
    the XOR.  Emits (a_id, b_id, hamming), a_id < b_id."""
    from engine.joins import bucketed_hash_join, fast_hash64

    assert max_hamming <= bands - 1, "banded blocking lossless only there"
    sigs = simhash_signatures(docs).materialize()
    width = 64 // bands
    mask = np.uint64((1 << width) - 1)
    NUM_BUCKETS = 64

    def band_explode(b: pa.Table) -> pa.Table:
        h = b.column("simhash").to_numpy()
        ids = b.column("doc_id").to_numpy()
        shifts = (np.arange(bands, dtype=np.uint64) * np.uint64(width))
        vals = (h[:, None] >> shifts[None, :]) & mask
        band_idx = np.tile(np.arange(bands, dtype=np.int32), len(ids))
        t_ = pa.table({
            "doc_id": pa.array(np.repeat(ids, bands), type=pa.int64()),
            "band": pa.array(band_idx),
            "bv": pa.array(vals.ravel().astype(np.int64)),
        })
        key = band_idx.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15) \
            ^ vals.ravel()
        return t_.append_column("__b", pa.array(
            (key % NUM_BUCKETS).astype(np.int64)))

    def pairs_in_shuffle_bucket(g: pd.DataFrame) -> pd.DataFrame:
        sz = g.groupby(["band", "bv"])["doc_id"].transform("size")
        g = g[(sz >= 2) & (sz <= max_bucket)][["doc_id", "band", "bv"]]
        if g.empty:
            return pd.DataFrame({"a_id": pd.Series([], dtype="int64"),
                                 "b_id": pd.Series([], dtype="int64")})
        m = g.merge(g, on=["band", "bv"])
        m = m[m.doc_id_x < m.doc_id_y].drop_duplicates(["doc_id_x", "doc_id_y"])
        return pd.DataFrame({"a_id": m.doc_id_x.to_numpy(),
                             "b_id": m.doc_id_y.to_numpy()})

    cand = sigs.map_batches(band_explode, batch_format="pyarrow") \
        .groupby("__b").map_groups(pairs_in_shuffle_bucket,
                                   batch_format="pandas")
    dd = _distinct_pairs(cand).materialize()

    # driver-verify gate (the _verify_pairs_join pattern): banding caps
    # bound the pair table, and a signature is ONE uint64 per doc — under
    # the bound, pull only the <= 2x|pairs| involved signatures via a
    # broadcast-membership scan and popcount-verify fully vectorized on
    # the driver; identical rows to the two-join plan (pinned by test).
    bound = MAX_DRIVER_VERIFY_PAIRS if max_driver_pairs is None \
        else max_driver_pairs
    if dd.count() <= bound:
        pdf = dd.to_pandas()
        empty = pa.table({"a_id": pa.array([], type=pa.int64()),
                          "b_id": pa.array([], type=pa.int64()),
                          "hamming": pa.array([], type=pa.int32())})
        if len(pdf) == 0:
            return ray.data.from_arrow(empty)
        a = pdf["a_id"].to_numpy(dtype=np.int64)
        b = pdf["b_id"].to_numpy(dtype=np.int64)
        involved = np.unique(np.concatenate([a, b]))
        kept = _involved_filter(sigs, "doc_id", involved).to_pandas()
        order = np.argsort(kept["doc_id"].to_numpy(dtype=np.int64))
        kid = kept["doc_id"].to_numpy(dtype=np.int64)[order]
        ksig = kept["simhash"].to_numpy().astype(np.uint64)[order]
        xa = ksig[np.searchsorted(kid, a)]
        xb = ksig[np.searchsorted(kid, b)]
        x = (xa ^ xb).view(np.uint8).reshape(-1, 8)
        ham = np.unpackbits(x, axis=1).sum(axis=1).astype(np.int32)
        m = ham <= max_hamming
        return ray.data.from_arrow(pa.table({
            "a_id": pa.array(a[m], type=pa.int64()),
            "b_id": pa.array(b[m], type=pa.int64()),
            "hamming": pa.array(ham[m]),
        }) if m.any() else empty)

    def sig_side(prefix: str) -> ray.data.Dataset:
        def f(b: pa.Table) -> pa.Table:
            return pa.table({f"{prefix}_doc": b.column("doc_id"),
                             f"{prefix}_sig": b.column("simhash")})
        return sigs.map_batches(f, batch_format="pyarrow")

    j = bucketed_hash_join(dd, sig_side("a"),
                           "a_id", "a_doc").drop_columns(["a_doc"])
    j = bucketed_hash_join(j, sig_side("b"),
                           "b_id", "b_doc").drop_columns(["b_doc"])

    def verify(b: pa.Table) -> pa.Table:
        xa = b.column("a_sig").to_numpy().astype(np.uint64)
        xb = b.column("b_sig").to_numpy().astype(np.uint64)
        x = (xa ^ xb).view(np.uint8).reshape(-1, 8)
        ham = np.unpackbits(x, axis=1).sum(axis=1).astype(np.int32)
        t = pa.table({
            "a_id": b.column("a_id").cast(pa.int64()),
            "b_id": b.column("b_id").cast(pa.int64()),
            "hamming": pa.array(ham),
        })
        return t.filter(pc.less_equal(t.column("hamming"),
                                      pa.scalar(max_hamming, type=pa.int32())))

    return j.map_batches(verify, batch_format="pyarrow")


def planted_neardup_embeddings(emb: ray.data.Dataset) -> ray.data.Dataset:
    """embeddings ∪ jittered copies of every vec_id % 5 == 0 at
    vec_id+100000 (deterministic ~±1% uniform perturbation -> cosine ≈
    0.9997), so the near-dup operator has planted positives at any scale.

    The jitter is md5-derived, not RNG-derived, so the whole planting is
    bit-replicable in the DuckDB oracle: jit[d] = float32(v[d] + 0.02*u -
    0.01) with u = md5_u64_le(f"{vid}:{d}") / 2^64 — DuckDB's
    ``md5_number_upper`` is the same first-8-digest-bytes little-endian
    integer, and its DOUBLE→REAL cast is the same round-to-nearest as
    numpy's astype(float32) (both verified; see oracles.DEDUP_EMBEDDING)."""
    from engine.joins import list_column_matrix  # driver-level: closure capture

    def dup(batch: pa.Table) -> pa.Table:
        ids = batch.column("vec_id").to_numpy()
        mask = ids % 5 == 0
        keep = batch.filter(pa.array(mask))
        vecs = list_column_matrix(keep.column("embedding"))  # f64 of f32 values
        kept_ids = keep.column("vec_id").to_numpy()
        n, dim = vecs.shape if vecs.size else (0, 0)
        strs = [f"{int(v)}:{d}" for v in kept_ids for d in range(dim)]
        raw = np.fromiter(
            (int.from_bytes(hashlib.md5(s.encode()).digest()[:8], "little")
             for s in strs), dtype=np.uint64, count=len(strs))
        u = raw.astype(np.float64).reshape(n, dim) * 2.0 ** -64
        jit = (vecs + (0.02 * u - 0.01)).astype(np.float32)
        extra = pa.table({
            "vec_id": pa.array(kept_ids + 100000),
            "embedding": pa.array([v.tolist() for v in jit],
                                  type=batch.schema.field("embedding").type),
        })
        base = pa.table({"vec_id": batch.column("vec_id"),
                         "embedding": batch.column("embedding")})
        return pa.concat_tables([base, extra])

    return emb.select_columns(["vec_id", "embedding"]).map_batches(
        dup, batch_format="pyarrow")


def embedding_near_dup(emb: ray.data.Dataset, threshold: float = 0.95,
                       bands: int = 8, bits_per_band: int = 8,
                       max_bucket: int = 2000, dim: int = 64,
                       seed: int = 11,
                       max_driver_pairs: int | None = None
                       ) -> ray.data.Dataset:
    """Embedding-cosine near-dup, banded (the minhash_lsh_pairs shape).

    ``bands`` independent random-hyperplane tables of ``bits_per_band`` bits
    each: a pair of vectors at angle θ matches one band with prob
    (1 - θ/π)^bits, and is a candidate if ANY band matches — so recall for
    cosine ≥ ``threshold`` pairs is 1-(1-p)^bands (≈1-8e-4 at cos 0.98 with
    the defaults) while the candidate key space has bands·2^bits buckets,
    not the 2^6 = 64 global buckets of the earlier single-table variant.

    Scale shape: only (vec_id, band, bucket) rides the shuffle — embeddings
    do NOT; a (band, bucket) bucket larger than ``max_bucket`` is dropped
    entirely (stop-bucket removal, as in minhash_lsh_pairs — degenerate
    directions whose O(size²) pair explosion would dominate; clusters that
    large still surface through their other bands); candidate pairs go
    through the distributed distinct and a bucketed-JOIN exact-cosine
    verify, never an in-group all-pairs over a corpus fraction.
    Emits (a_id, b_id, cosine) with a_id < b_id, cosine >= threshold."""
    import ray
    from engine.joins import bucketed_hash_join, list_column_matrix
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((bands * bits_per_band, dim))
    planes_ref = ray.put(planes)
    NUM_BUCKETS = 64
    pow2 = (1 << np.arange(bits_per_band)).astype(np.int64)

    emb = emb.materialize()  # feeds bucketing AND both verify-join sides

    def band_explode(batch: pa.Table) -> pa.Table:
        pl = ray.get(planes_ref)
        vecs = list_column_matrix(batch.column("embedding"))
        ids = batch.column("vec_id").to_numpy()
        bits = ((vecs @ pl.T) > 0).astype(np.int64)
        # (n, bands) bucket keys: pack each band's bit slice
        bv = bits.reshape(len(ids), bands, bits_per_band) @ pow2
        band_idx = np.tile(np.arange(bands, dtype=np.int32), len(ids))
        bvr = bv.ravel()
        key = band_idx.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15) \
            ^ bvr.astype(np.uint64)
        return pa.table({
            "doc_id": pa.array(np.repeat(ids, bands), type=pa.int64()),
            "band": pa.array(band_idx),
            "bv": pa.array(bvr),
            "__b": pa.array((key % NUM_BUCKETS).astype(np.int64)),
        })

    def pairs_in_shuffle_bucket(g: pd.DataFrame) -> pd.DataFrame:
        sz = g.groupby(["band", "bv"])["doc_id"].transform("size")
        g = g[(sz >= 2) & (sz <= max_bucket)][["doc_id", "band", "bv"]]
        if g.empty:
            return pd.DataFrame({"a_id": pd.Series([], dtype="int64"),
                                 "b_id": pd.Series([], dtype="int64")})
        m = g.merge(g, on=["band", "bv"])
        m = m[m.doc_id_x < m.doc_id_y].drop_duplicates(["doc_id_x", "doc_id_y"])
        return pd.DataFrame({"a_id": m.doc_id_x.to_numpy(),
                             "b_id": m.doc_id_y.to_numpy()})

    cand = emb.map_batches(band_explode, batch_format="pyarrow") \
        .groupby("__b").map_groups(pairs_in_shuffle_bucket,
                                   batch_format="pandas")
    dd = _distinct_pairs(cand).materialize()

    # driver-verify gate (the _verify_pairs_join pattern): under the bound,
    # pull only the <= 2x|pairs| involved embeddings via a broadcast-
    # membership scan and verify the exact cosine vectorized on the driver
    # — same per-row numpy expression as the join kernel, so bit-identical
    # (pinned by test); above the bound the two bucketed joins run.
    bound = MAX_DRIVER_VERIFY_PAIRS if max_driver_pairs is None \
        else max_driver_pairs
    if dd.count() <= bound and \
            2 * dd.count() * dim <= MAX_DRIVER_VERIFY_CELLS:
        pdf = dd.to_pandas()
        empty = pa.table({"a_id": pa.array([], type=pa.int64()),
                          "b_id": pa.array([], type=pa.int64()),
                          "cosine": pa.array([], type=pa.float64())})
        if len(pdf) == 0:
            return ray.data.from_arrow(empty)
        a = pdf["a_id"].to_numpy(dtype=np.int64)
        b = pdf["b_id"].to_numpy(dtype=np.int64)
        involved = np.unique(np.concatenate([a, b]))
        kbs = list(_involved_filter(emb, "vec_id", involved)
                   .iter_batches(batch_format="pyarrow"))
        if not kbs:          # defensive: pairs imply involved rows exist
            return ray.data.from_arrow(empty)
        kt = pa.concat_tables(kbs)
        order = np.argsort(kt.column("vec_id").to_numpy())
        kid = kt.column("vec_id").to_numpy()[order]
        kv = list_column_matrix(kt.column("embedding"))[order]
        va = kv[np.searchsorted(kid, a)]
        vb = kv[np.searchsorted(kid, b)]
        cos = (va * vb).sum(1) / (np.linalg.norm(va, axis=1)
                                  * np.linalg.norm(vb, axis=1))
        keepm = cos >= threshold
        cosq = np.floor(cos[keepm] * 1e9) / 1e9
        return ray.data.from_arrow(pa.table({
            "a_id": pa.array(a[keepm], type=pa.int64()),
            "b_id": pa.array(b[keepm], type=pa.int64()),
            "cosine": pa.array(cosq, type=pa.float64()),
        }) if keepm.any() else empty)

    def emb_side(prefix: str) -> ray.data.Dataset:
        def f(b: pa.Table) -> pa.Table:
            return pa.table({f"{prefix}_vid": b.column("vec_id"),
                             f"{prefix}_emb": b.column("embedding")})
        return emb.map_batches(f, batch_format="pyarrow")

    j = bucketed_hash_join(dd, emb_side("a"),
                           "a_id", "a_vid").drop_columns(["a_vid"])
    j = bucketed_hash_join(j, emb_side("b"),
                           "b_id", "b_vid").drop_columns(["b_vid"])

    def verify(b: pa.Table) -> pa.Table:
        va = list_column_matrix(b.column("a_emb"))
        vb = list_column_matrix(b.column("b_emb"))
        if len(va) == 0:
            return pa.table({"a_id": pa.array([], type=pa.int64()),
                             "b_id": pa.array([], type=pa.int64()),
                             "cosine": pa.array([], type=pa.float64())})
        cos = (va * vb).sum(1) / (np.linalg.norm(va, axis=1)
                                  * np.linalg.norm(vb, axis=1))
        keepm = cos >= threshold
        # emitted cosine is quantized to 1e-9 so the value is independent of
        # float accumulation order (numpy pairwise sum vs the oracle's
        # sequential SQL sum differ in the last ulps); the threshold test
        # stays on the raw value
        cosq = np.floor(cos[keepm] * 1e9) / 1e9
        return pa.table({
            "a_id": b.column("a_id").cast(pa.int64()).filter(pa.array(keepm)),
            "b_id": b.column("b_id").cast(pa.int64()).filter(pa.array(keepm)),
            "cosine": pa.array(cosq, type=pa.float64())})

    return j.map_batches(verify, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Near-dup clustering: connected components over duplicate pairs
# ---------------------------------------------------------------------------

def dup_clusters(pairs: ray.data.Dataset,
                 max_iters: int = 50,
                 small_graph_rows: int = 2_000_000) -> ray.data.Dataset:
    """Connected components over a (a_id, b_id) duplicate-pair table:
    one row per distinct doc appearing in a pair, labeled with the MIN doc id
    of its component (the canonical representative a dedup pass keeps).

    Distributed min-label propagation (the classic BSP / "hash-to-min"
    shape): labels start at min(self, neighbors); each round ships every
    node's current label across its edges (bucketed hash join, never a
    driver-side graph) and takes a per-node min (one Ray sort-based
    aggregate).  Labels decrease monotonically, so a round with an unchanged
    global label sum is a fixpoint; rounds needed = component diameter.
    Near-dup components are shallow (dup clusters are quasi-cliques — the
    pair generators emit most intra-cluster edges directly), so a handful of
    rounds suffices at any corpus size; ``max_iters`` bounds the worst case.
    Each round is a full streaming pass — nothing driver-side but the
    1-row convergence aggregate.
    Size-aware escape hatch: a pair table at or under ``small_graph_rows``
    (the VERIFIED near-dup pairs — a vanishing fraction of any real corpus,
    bounded by the LSH stop-bucket caps upstream) is a small-side problem;
    it collects once and runs driver-side union-find with min-root labels —
    identical output, none of the BSP rounds' shuffle latency.  Pass 0 to
    force the distributed path (tests do).
    """
    from ray.data.aggregate import Min, Sum
    from engine.joins import bucketed_hash_join

    pairs = pairs.select_columns(["a_id", "b_id"]).materialize()

    if pairs.count() <= small_graph_rows:
        edges_df = pairs.to_pandas()
        a = edges_df["a_id"].to_numpy(dtype=np.int64)
        b = edges_df["b_id"].to_numpy(dtype=np.int64)
        nodes = np.unique(np.concatenate([a, b]))
        ai = np.searchsorted(nodes, a)
        bi = np.searchsorted(nodes, b)
        # vectorized union-find: alternate full pointer-jumping compression
        # (parent = parent[parent] to fixpoint) with a batched hook that
        # points every edge's larger root at the smallest root seen for it
        # (np.minimum.at).  O(log n) rounds of pure int-array ops — no
        # per-edge Python loop, so the small-graph threshold is safe at
        # millions of edges.  Labels converge to the component-min node,
        # identical to serial union-by-min (equality pinned vs the BSP
        # path by test_dup_clusters_*).
        parent = np.arange(len(nodes))
        while True:
            while True:                      # full path compression
                gp = parent[parent]
                if np.array_equal(gp, parent):
                    break
                parent = gp
            ra, rb = parent[ai], parent[bi]
            lo = np.minimum(ra, rb)
            hi = np.maximum(ra, rb)
            live = lo != hi
            if not live.any():
                break
            np.minimum.at(parent, hi[live], lo[live])
        labels_np = nodes[parent]
        return ray.data.from_arrow(pa.table({
            "doc_id": pa.array(nodes, type=pa.int64()),
            "cluster_id": pa.array(labels_np, type=pa.int64())}))

    def undirected(batch: pa.Table) -> pa.Table:
        a = batch.column("a_id").to_numpy()
        b = batch.column("b_id").to_numpy()
        return pa.table({"src": pa.array(np.concatenate([a, b])),
                         "dst": pa.array(np.concatenate([b, a]))})

    edges = pairs.map_batches(undirected, batch_format="pyarrow").materialize()

    # initial labels: per-node min over (self, every neighbor)
    def self_and_nbr(batch: pa.Table) -> pa.Table:
        return pa.table({"node": batch.column("src"),
                         "lbl": pc.min_element_wise(batch.column("src"),
                                                    batch.column("dst"))})

    labels = edges.map_batches(self_and_nbr, batch_format="pyarrow") \
        .groupby("node").aggregate(Min("lbl")) \
        .map_batches(lambda b: b.rename_columns(["node", "lbl"]),
                     batch_format="pyarrow").materialize()
    total = labels.aggregate(Sum("lbl"))["sum(lbl)"]

    for _ in range(max_iters):
        # ship labels across edges: neighbor's label is a candidate for mine
        msgs = bucketed_hash_join(edges, labels, "src", "node") \
            .map_batches(lambda b: pa.table({"node": b.column("dst"),
                                             "lbl": b.column("lbl")}),
                         batch_format="pyarrow")
        labels = labels.union(msgs).groupby("node").aggregate(Min("lbl")) \
            .map_batches(lambda b: b.rename_columns(["node", "lbl"]),
                         batch_format="pyarrow").materialize()
        new_total = labels.aggregate(Sum("lbl"))["sum(lbl)"]
        if new_total == total:   # monotone-decreasing -> fixpoint
            break
        total = new_total

    return labels.map_batches(
        lambda b: pa.table({"doc_id": b.column("node").cast(pa.int64()),
                            "cluster_id": b.column("lbl").cast(pa.int64())}),
        batch_format="pyarrow")


def semantic_dedup_ids(emb: ray.data.Dataset, threshold: float = 0.98,
                       pairs: ray.data.Dataset | None = None,
                       **near_dup_kw) -> ray.data.Dataset:
    """SemDeDup-style corpus-level near-dup REMOVAL (Abbas et al. 2023's
    keep-one-per-semantic-cluster, on exact pairwise cosine rather than
    cluster centroids): embedding near-dup pairs -> connected components
    (dup_clusters) -> drop every component member except its min-id
    representative.  Returns the KEPT (vec_id) rows of the input corpus.

    Scale shape: the drop set flows through a bucketed anti-join, never a
    driver collect — at 100 TB a heavily-duplicated corpus makes the
    exclusion side corpus-scale, so broadcast_semi_join(anti=True) would be
    the wrong plan.

    ``pairs`` accepts a precomputed near-dup pair table (a_id, b_id, ...) so
    callers running dedup_embedding / dedup_clusters on the same corpus
    share one pair computation instead of recomputing the LSH chain."""
    import pyarrow.compute as pc

    from engine.joins import bucketed_anti_join
    if pairs is None:
        pairs = embedding_near_dup(emb, threshold=threshold, **near_dup_kw)
    clusters = dup_clusters(pairs)

    def non_reps(b: pa.Table) -> pa.Table:
        keep = pc.not_equal(b.column("doc_id"), b.column("cluster_id"))
        return b.filter(keep).select(["doc_id"])

    drops = clusters.map_batches(non_reps, batch_format="pyarrow")
    ids = emb.select_columns(["vec_id"])
    return bucketed_anti_join(ids, drops, "vec_id", "doc_id")


def decontaminate(train: ray.data.Dataset, benchmark: ray.data.Dataset,
                  n: int = 3) -> ray.data.Dataset:
    """Benchmark n-gram decontamination — the train/eval-overlap scrub every
    published pre-training pipeline runs (GPT-3 appendix C / Llama 2 §A.6:
    flag a training document if it shares any word n-gram with an evaluation
    benchmark).

    Scale shape: the benchmark side is tiny by construction (benchmarks are
    megabytes even when the training corpus is 100 TB), so its DISTINCT
    shingle-hash set is reduced per-batch, unioned once on the driver and
    ``ray.put`` as one sorted uint64 array; the training corpus then STREAMS
    through a stateless map_batches doing a vectorized sorted-membership
    test (searchsorted) — no shuffle, no join, one pass.  If the benchmark
    side ever outgrew a broadcast, the bucketed-join path
    (``_verify_pairs_join``-style) is the fallback plan.

    Emits one row per training doc: (doc_id, n_grams, n_hits, contaminated)
    where n_grams counts the doc's DISTINCT n-grams and n_hits those also
    present anywhere in the benchmark.  All counts are exact ints (md5
    64-bit shingle hashing, same injectivity convention as the dedup
    operators), so the table is SQL-exact."""
    import ray as _ray

    def bench_hashes(batch: pa.Table) -> pa.Table:
        _, stream = _batch_shingle_hashes(batch.column("text").to_pylist(),
                                          n, pad=False)
        return pa.table({"h": pa.array(np.unique(stream))})

    parts = benchmark.map_batches(bench_hashes, batch_format="pyarrow") \
        .to_pandas()  # DISTINCT hashes only — the declared small side
    bench_sorted = np.unique(parts["h"].to_numpy(dtype=np.uint64))
    bench_ref = _ray.put(bench_sorted)

    def flag(batch: pa.Table) -> pa.Table:
        bench = _ray.get(bench_ref)
        counts, stream = _batch_shingle_hashes(batch.column("text").to_pylist(),
                                               n, pad=False)
        if len(stream) and len(bench):
            idx = np.searchsorted(bench, stream)
            idx[idx == len(bench)] = 0
            hit = (bench[idx] == stream).astype(np.int64)
        else:
            hit = np.zeros(len(stream), dtype=np.int64)
        # per-doc segment sums via cumsum (exact for zero-gram docs anywhere
        # in the batch, unlike reduceat whose clamped starts could swallow
        # the preceding doc's final hit when a zero-gram doc ends the batch)
        counts = np.asarray(counts, dtype=np.int64)
        cs = np.concatenate([[0], np.cumsum(hit)])
        ends = np.cumsum(counts)
        hits = (cs[ends] - cs[ends - counts]).astype(np.int64)
        return pa.table({
            "doc_id": pc.cast(batch.column("doc_id"), pa.int64()),
            "n_grams": pa.array(counts),
            "n_hits": pa.array(hits),
            "contaminated": pa.array(hits > 0),
        })

    return train.map_batches(flag, batch_format="pyarrow")


# Broadcast bound for substring_dup_stats' duplicated-gram set: under this
# many grams the set ships as one sorted array (ray.put once, searchsorted
# membership inside the second doc scan); above it the bucketed-join path
# runs (no broadcast assumption).
MAX_BROADCAST_DUP_GRAMS = 5_000_000


def substring_dup_stats(docs: ray.data.Dataset, w: int = 8,
                        num_buckets: int = 64,
                        hash_grams: bool = True,
                        max_broadcast_dup_grams: int | None = None
                        ) -> ray.data.Dataset:
    """Substring-level duplication profile (Lee et al. 2022, "Deduplicating
    Training Data Makes Language Models Better" — the ExactSubstr signal at
    token-window granularity): for every token position, is the w-token
    window starting there present in at least one OTHER document?  Per doc:
    total positions, duplicated positions, their exact fraction, and a
    flag_remove at dup fraction >= 1/2 (integer cross-multiplication).

    Scale shape: (1) per-doc (gram, count) explode — positions are
    pre-aggregated per doc so a doc contributes one row per DISTINCT gram;
    (2) document frequency per gram via the per-block partial-count
    combiner + pre-aggregated groupby (each (doc, gram) row is one distinct
    doc, so block counts sum to df); (3) SIZE-GATED tail: the df>=2 gram
    set is usually tiny (only cross-doc duplicates), so under
    MAX_BROADCAST_DUP_GRAMS it broadcasts as one sorted array and a second
    doc scan emits the complete per-doc profile in one pass (searchsorted
    membership; per-doc sums are local because each doc's grams are
    computed inside one call) — zero post-aggregate shuffles; above the
    bound, the original no-broadcast plan runs: bucketed hash join on the
    gram, per-doc sum combiner + groupby, LEFT join against the per-doc
    position base.

    By default (``hash_grams=True``) only 8-byte md5-low-8 gram HASHES ride
    the two shuffles — ~10x fewer shuffle bytes than w-token strings at
    corpus scale.  The oracle stays bit-exact: DuckDB's md5_number_upper(s)
    equals int.from_bytes(md5(s).digest()[:8], 'little'), so both sides
    group/join on the same u64 (a collision, were one ever to occur, is
    replicated identically on both sides).  ``hash_grams=False`` keeps the
    string path for A/B equality testing.

    Collision bounds, both replicated identically by the oracle: per-TOKEN
    hashes are truncated to 48 bits (the widest that keeps every
    token_hash x B^j product under 2^112 in the oracle's signed-128-bit
    HUGEINT arithmetic: 2^48 x 2^64, sum of 8 < 2^115) — birthday 50% at
    ~2^24 ~= 16.7M distinct tokens, far above any natural-language
    vocabulary; a colliding token PAIR only conflates grams that contain
    one of the two tokens at the same window offset.  The 64-bit rolling
    GRAM hash then collides a given gram pair with p = 2^-64."""
    from engine.joins import bucketed_hash_join
    from ray.data.aggregate import Sum

    def base(batch: pa.Table) -> pa.Table:
        n_pos = np.asarray(
            [max(len(t.split(" ")) - w + 1, 0)
             for t in batch.column("text").to_pylist()], dtype=np.int64)
        return pa.table({"doc_id": batch.column("doc_id"),
                         "n_positions": pa.array(n_pos)})

    # rolling-polynomial gram hash over 32-bit token hashes: one md5 per
    # UNIQUE token (batch cache), then 8 vectorized uint64 ops per doc —
    # no per-gram string joins or md5 calls.  uint64 wraparound per term
    # is congruent mod 2^64 to the oracle's full-precision HUGEINT sum,
    # so both sides group on the same value (collisions, astronomically
    # rare, replicate identically).  Shipped as the int64 two's-complement
    # view (bijective; Ray's groupby keeps int64 native where uint64 falls
    # back to pickled objects).
    B = np.uint64(1000003)
    POWS = np.empty(w, dtype=np.uint64)
    POWS[w - 1] = 1
    with np.errstate(over="ignore"):       # wraparound mod 2^64 is the point
        for j in range(w - 2, -1, -1):
            POWS[j] = POWS[j + 1] * B      # B^(w-1-j) mod 2^64

    def explode(batch: pa.Table) -> pa.Table:
        ids, grams, cnts = [], [], []
        tok_lists = [t.split(" ") for t in batch.column("text").to_pylist()]
        if hash_grams:
            cache: dict[str, int] = {}
            for tl in tok_lists:
                for tok in tl:
                    if tok not in cache:
                        cache[tok] = int.from_bytes(
                            hashlib.md5(tok.encode()).digest()[:8],
                            "little") & 0xFFFFFFFFFFFF
        hs_out = []
        for d, toks in zip(batch.column("doc_id").to_pylist(), tok_lists):
            n_pos = len(toks) - w + 1
            if n_pos <= 0:
                continue
            if hash_grams:
                th = np.fromiter((cache[t] for t in toks), dtype=np.uint64,
                                 count=len(toks))
                acc = np.zeros(n_pos, dtype=np.uint64)
                for j in range(w):
                    acc += th[j:j + n_pos] * POWS[j]
                u, c = np.unique(acc, return_counts=True)
                hs_out.append(u)
            else:
                u, c = np.unique(
                    [" ".join(toks[i:i + w]) for i in range(n_pos)],
                    return_counts=True)
                grams.extend(u.tolist())
            ids.extend([d] * len(u))
            cnts.extend(c.tolist())
        if hash_grams:
            hs = np.concatenate(hs_out) if hs_out \
                else np.empty(0, dtype=np.uint64)
            gram_col = pa.array(hs.view(np.int64), type=pa.int64())
        else:
            gram_col = pa.array(grams, type=pa.string())
        return pa.table({
            "doc_id": pa.array(ids, type=pa.int64()),
            "gram": gram_col,
            "c": pa.array(np.asarray(cnts, dtype=np.int64)),
        })

    # pg is consumed twice (df aggregate + join left side); the explode is
    # recomputed rather than materialized — at corpus scale a pinned gram
    # table is O(total positions), while the re-scan streams
    pg = docs.map_batches(explode, batch_format="pyarrow")

    def block_df(batch: pa.Table) -> pa.Table:
        if hash_grams:
            g, n = np.unique(batch.column("gram").to_numpy(),
                             return_counts=True)
            gcol = pa.array(g, type=pa.int64())
        else:
            g, n = np.unique(np.asarray(batch.column("gram").to_pylist(),
                                        dtype=object), return_counts=True)
            gcol = pa.array(g.tolist(), type=pa.string())
        return pa.table({"gram": gcol,
                         "n": pa.array(n.astype(np.int64))})

    df = pg.map_batches(block_df, batch_format="pyarrow") \
        .groupby("gram").aggregate(Sum("n", alias_name="df"))

    import pyarrow.compute as pc
    dup_grams = df.map_batches(
        lambda b: b.filter(pc.greater_equal(b.column("df"), pa.scalar(2))),
        batch_format="pyarrow").materialize()

    # Size-gated tail (the same size-aware plan pairs.py uses): the
    # duplicated-gram set is usually a vanishing fraction of the corpus
    # (only grams appearing in >=2 docs).  Under the bound it broadcasts as
    # one sorted array and a SECOND doc scan emits the complete per-doc
    # profile in one pass — membership via searchsorted, per-doc sums local
    # to the scan (each doc's grams are computed inside one call), zero
    # joins or groupbys after the df aggregate.  A pathologically
    # duplicated corpus falls back to the bucketed-join path below.
    bound = MAX_BROADCAST_DUP_GRAMS if max_broadcast_dup_grams is None \
        else max_broadcast_dup_grams
    if dup_grams.count() <= bound:
        if hash_grams:
            parts = [b.column("gram").to_numpy() for b in
                     dup_grams.iter_batches(batch_format="pyarrow")]
            dup_arr = np.sort(np.concatenate(parts)) if parts else \
                np.empty(0, dtype=np.int64)
        else:
            vals: list[str] = []
            for b in dup_grams.iter_batches(batch_format="pyarrow"):
                vals.extend(b.column("gram").to_pylist())
            # object (not 'U') dtype: a numpy U array is FIXED-width, so
            # one long gram would inflate every slot (rows x longest x 4
            # bytes); python-str searchsorted is slower but memory-sane,
            # and the string path is the A/B-test flavor only
            dup_arr = np.sort(np.asarray(vals, dtype=object)) if vals else \
                np.empty(0, dtype=object)
        dup_ref = ray.put(dup_arr)

        def profile(batch: pa.Table) -> pa.Table:
            arr = ray.get(dup_ref)
            tok_lists = [t.split(" ")
                         for t in batch.column("text").to_pylist()]
            if hash_grams:
                cache = {}
                for tl in tok_lists:
                    for tok in tl:
                        if tok not in cache:
                            cache[tok] = int.from_bytes(
                                hashlib.md5(tok.encode()).digest()[:8],
                                "little") & 0xFFFFFFFFFFFF
            n_pos_out = np.empty(len(tok_lists), dtype=np.int64)
            dp_out = np.zeros(len(tok_lists), dtype=np.int64)
            for i, toks in enumerate(tok_lists):
                n_pos = len(toks) - w + 1
                n_pos_out[i] = max(n_pos, 0)
                if n_pos <= 0 or len(arr) == 0:
                    continue
                if hash_grams:
                    th = np.fromiter((cache[t] for t in toks),
                                     dtype=np.uint64, count=len(toks))
                    acc = np.zeros(n_pos, dtype=np.uint64)
                    with np.errstate(over="ignore"):
                        for jj in range(w):
                            acc += th[jj:jj + n_pos] * POWS[jj]
                    u, c = np.unique(acc.view(np.int64),
                                     return_counts=True)
                else:
                    u, c = np.unique(
                        [" ".join(toks[k:k + w]) for k in range(n_pos)],
                        return_counts=True)
                pos = np.searchsorted(arr, u)
                pos[pos == len(arr)] = 0
                dp_out[i] = int(c[arr[pos] == u].sum())
            with np.errstate(invalid="ignore"):
                frac = np.where(n_pos_out > 0,
                                dp_out / np.maximum(n_pos_out, 1), 0.0)
            return pa.table({
                "doc_id": batch.column("doc_id"),
                "n_positions": pa.array(n_pos_out),
                "dup_positions": pa.array(dp_out),
                "dup_frac": pa.array(frac, type=pa.float64()),
                "flag_remove": pa.array((dp_out * 2 >= n_pos_out)
                                        & (n_pos_out > 0)),
            })

        return docs.map_batches(profile, batch_format="pyarrow")

    j = bucketed_hash_join(pg, dup_grams, "gram", "gram",
                           num_buckets=num_buckets)

    def block_doc_sum(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy()
        cs = batch.column("c").to_numpy()
        u, inv = np.unique(ids, return_inverse=True)
        s = np.zeros(len(u), dtype=np.int64)
        np.add.at(s, inv, cs)
        return pa.table({"doc_id": pa.array(u, type=pa.int64()),
                         "dup_positions": pa.array(s)})

    dup = j.map_batches(block_doc_sum, batch_format="pyarrow") \
        .groupby("doc_id").aggregate(Sum("dup_positions",
                                         alias_name="dup_positions"))
    # schema-pinning empty seed: with zero duplicated grams (an all-unique
    # corpus) the aggregate is empty and schema-less, which would crash the
    # downstream left join — the union keeps the dtype contract either way
    dup = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([], type=pa.int64()),
        "dup_positions": pa.array([], type=pa.int64())})).union(dup)

    base_ds = docs.map_batches(base, batch_format="pyarrow")
    out = bucketed_hash_join(base_ds, dup, "doc_id", "doc_id",
                             num_buckets=num_buckets, how="left")

    def finish(batch: pa.Table) -> pa.Table:
        n_pos = batch.column("n_positions").to_numpy()
        dp = batch.column("dup_positions").to_numpy(zero_copy_only=False)
        dp = np.nan_to_num(dp, nan=0.0).astype(np.int64)
        with np.errstate(invalid="ignore"):
            frac = np.where(n_pos > 0, dp / np.maximum(n_pos, 1), 0.0)
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "n_positions": pa.array(n_pos),
            "dup_positions": pa.array(dp),
            "dup_frac": pa.array(frac, type=pa.float64()),
            "flag_remove": pa.array((dp * 2 >= n_pos) & (n_pos > 0)),
        })

    return out.map_batches(finish, batch_format="pyarrow")
