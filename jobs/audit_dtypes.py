"""Audit per-column dtype *kind* agreement between every queries() result and
its oracle_sql() DuckDB result.  The driver's correctness gate canonicalizes
values before hashing; an int64 column on one side vs a float64 (e.g. DuckDB
HUGEINT sum -> float64 in pandas) on the other compares ==-equal but hashes
differently ("500" vs "500.0") — exactly the r04 text_repetition red row.
Usage: python jobs/audit_dtypes.py [sf_dir] [name...]"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    import ray
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False
    import logging
    logging.getLogger("ray.data").setLevel(logging.ERROR)

    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "__ray_entry__", os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "__ray_entry__.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * "
                f"FROM read_parquet('{sf_dir}/{t}.parquet')")

    from jobs.check_queries import to_pandas
    qs, sql = mod.queries(), mod.oracle_sql()
    n_flag = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        if name not in sql:
            continue
        try:
            got = to_pandas(fn(sf_dir))
            want = con.sql(sql[name]).df()
        except Exception as e:
            print(f"ERR   {name}: {type(e).__name__}: {e}")
            n_flag += 1
            continue
        flags = []
        for c in sorted(set(got.columns) & set(want.columns)):
            gk, wk = got[c].dtype.kind, want[c].dtype.kind
            # treat all integer kinds alike; bool-vs-bool alike
            norm = {"i": "i", "u": "i", "f": "f", "b": "b",
                    "O": "O", "U": "O", "M": "M"}
            if norm.get(gk, gk) != norm.get(wk, wk):
                flags.append(f"{c}: ray {got[c].dtype} vs oracle {want[c].dtype}")
            elif wk == "O" and len(want) and not isinstance(want[c].iloc[0], str) \
                    and want[c].iloc[0] is not None:
                flags.append(f"{c}: oracle object holds "
                             f"{type(want[c].iloc[0]).__name__}")
        if flags:
            print(f"FLAG  {name}: " + "; ".join(flags))
            n_flag += 1
        else:
            print(f"ok    {name}")
    print(f"\n{n_flag} flagged")
    return 1 if n_flag else 0


if __name__ == "__main__":
    raise SystemExit(main())
