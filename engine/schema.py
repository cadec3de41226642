"""Arrow schemas + the per-row span-sequence invariant.

Input table (BASELINE.json input_hint):
    doc_id: string
    source: string                 ('cands' | 'index')
    spans:  list<struct<kind:string, text:string, media_ref:string, offset:int32>>

The invariant: every stage must preserve each row's (kind, text, media_ref,
offset-order) sequence byte-for-byte.  Derived values are *added columns*;
``spans`` is never rewritten.  ``span_fingerprint`` gives a cheap per-row
digest used by tests and by the lineage manifests.
"""

from __future__ import annotations

import hashlib

import pyarrow as pa

SPAN_TYPE = pa.struct([
    ("kind", pa.string()),
    ("text", pa.string()),
    ("media_ref", pa.string()),
    ("offset", pa.int32()),
])

DOC_SCHEMA = pa.schema([
    ("doc_id", pa.string()),
    ("source", pa.string()),
    ("spans", pa.list_(SPAN_TYPE)),
])


def span_fingerprint_column(spans_col: pa.ChunkedArray | pa.Array) -> pa.Array:
    """64-hex digest of each row's span sequence (kind, text, media_ref, order)."""
    if isinstance(spans_col, pa.ChunkedArray):
        spans_col = spans_col.combine_chunks()
    out = []
    for row in spans_col.to_pylist():
        hsh = hashlib.sha256()
        for s in sorted(row, key=lambda s: s["offset"]):
            hsh.update(s["kind"].encode())
            hsh.update(b"\x00")
            hsh.update(s["text"].encode())
            hsh.update(b"\x00")
            hsh.update(s["media_ref"].encode())
            hsh.update(b"\x01")
        out.append(hsh.hexdigest())
    return pa.array(out, type=pa.string())


def assert_spans_preserved(before: pa.Table, after: pa.Table, key: str = "doc_id"):
    """Test helper: per-doc span fingerprints must be identical before/after."""
    def fp_map(tbl):
        fps = span_fingerprint_column(tbl.column("spans"))
        keys = tbl.column(key).to_pylist()
        return dict(zip(keys, fps.to_pylist()))

    fb, fa = fp_map(before), fp_map(after)
    missing = [k for k in fa if k not in fb]
    assert not missing, f"rows appeared out of nowhere: {missing[:5]}"
    bad = [k for k, v in fa.items() if fb[k] != v]
    assert not bad, f"span sequences mutated for doc_ids {bad[:5]}"
