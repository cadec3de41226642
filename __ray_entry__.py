"""Driver contract for the Ray-Data-native geospatial ER engine.

The driver initialises Ray itself before importing this module; nothing here
(or in the engine library) calls ray.init()/ray.shutdown().  See SURVEY.md §2
for the operator inventory each queries() entry maps to.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable
from typing import Any

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry() -> Any:
    """Flagship pipeline at sf0.001: interleaved-doc corpus -> geometry parse
    -> 25-property stage -> prep-train -> BKAFI blocking (kNN actor pool) ->
    ratio features -> match classification.  Returns the scored pair table."""
    from engine.pipeline import run_flagship
    res = run_flagship("/root/testdata/sf0.001", seed=1, bkafi_dim=6, k=5)
    return res["scored"].select_columns(
        ["cand_id", "index_id", "rank", "dist", "label", "pred"])


def queries() -> dict[str, Callable[[str], Any]]:
    from engine.queries import QUERIES
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from engine.queries import oracle_sql as _o
    return _o()
