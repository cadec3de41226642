"""Storage seam: Lance when available, parquet otherwise (SURVEY.md §7.0).

The north rule names Lance tables; this container has no pylance, so parquet
is the physical format behind the same call sites.  Swapping is this module
only — read/write signatures are identical.
"""

from __future__ import annotations

import ray.data

try:  # pragma: no cover - lance absent in this environment
    import lance  # noqa: F401
    HAVE_LANCE = True
except Exception:
    HAVE_LANCE = False


def read_table(path: str, columns=None, override_num_blocks=None) -> ray.data.Dataset:
    if HAVE_LANCE:
        return ray.data.read_lance(path, columns=columns)
    return ray.data.read_parquet(path, columns=columns,
                                 override_num_blocks=override_num_blocks)


def write_table(ds: ray.data.Dataset, path: str, **kw) -> None:
    if HAVE_LANCE:
        ds.write_lance(path, **kw)
        return
    ds.write_parquet(path, **kw)
