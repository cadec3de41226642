"""Storage seam: Lance when available, parquet otherwise (SURVEY.md §7.0).

The north rule names Lance tables; this container has no pylance, so parquet
is the physical format behind the same call sites.  Swapping is this module
only — read/write signatures are identical.
"""

from __future__ import annotations

import glob
import os

import pyarrow as pa
import pyarrow.parquet as pq
import ray.data

try:  # pragma: no cover - lance absent in this environment
    import lance  # noqa: F401
    HAVE_LANCE = True
except Exception:
    HAVE_LANCE = False


def read_parquet_clean(path, columns=None, **kw) -> ray.data.Dataset:
    """`ray.data.read_parquet` with the file's schema metadata stripped.

    Pandas-written parquet carries a ``b'pandas'`` schema-metadata dict;
    a pyarrow Schema holding a metadata dict is UNHASHABLE here, which
    defeats Ray Data's schema dedup (`unify_schemas` early-exit) — every
    block merge logs "Failed to hash the schemas" and pays the expensive
    unify path.  Stripping costs one footer read on the driver and makes
    every downstream block schema hashable."""
    p0 = path
    if isinstance(path, (list, tuple)):
        p0 = path[0]
    if os.path.isdir(p0):
        files = sorted(glob.glob(os.path.join(p0, "**", "*.parquet"),
                                 recursive=True))
        if not files:  # empty dir: let read_parquet raise its own error
            return ray.data.read_parquet(path, columns=columns, **kw)
        p0 = files[0]
    sch = pq.read_schema(p0).remove_metadata()
    if columns:
        sch = pa.schema([sch.field(c) for c in columns])
    return ray.data.read_parquet(path, columns=columns, schema=sch, **kw)


def read_table(path: str, columns=None, override_num_blocks=None) -> ray.data.Dataset:
    if HAVE_LANCE:
        return ray.data.read_lance(path, columns=columns)
    return read_parquet_clean(path, columns=columns,
                              override_num_blocks=override_num_blocks)


def write_table(ds: ray.data.Dataset, path: str, **kw) -> None:
    if HAVE_LANCE:
        ds.write_lance(path, **kw)
        return
    ds.write_parquet(path, **kw)
