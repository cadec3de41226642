"""Driver-contract emulation: run every queries() entry at a given sf and
compare against oracle_sql() via DuckDB (row count + schema + order-insensitive
value comparison).  Usage: python jobs/check_queries.py [sf_dir] [name...]"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import numpy as np
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def to_pandas(res):
    import pyarrow as pa
    import ray.data
    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def compare(name, got: pd.DataFrame, want: pd.DataFrame) -> list[str]:
    issues = []
    if len(got) != len(want):
        issues.append(f"rowcount {len(got)} != {len(want)}")
    if sorted(got.columns) != sorted(want.columns):
        issues.append(f"columns {sorted(got.columns)} != {sorted(want.columns)}")
        return issues
    g, w = canon(got), canon(want)
    if len(g) == len(w):
        for c in g.columns:
            a, b = g[c].to_numpy(), w[c].to_numpy()
            if a.dtype.kind == "f" or b.dtype.kind == "f":
                ok = (a == b) | (pd.isna(a) & pd.isna(b))
                if not ok.all():
                    bad = int((~ok).sum())
                    i = int(np.nonzero(~ok)[0][0])
                    issues.append(f"col {c}: {bad} value diffs, first {a[i]!r} vs {b[i]!r}")
            else:
                if not (a == b).all():
                    bad = int((a != b).sum())
                    i = int(np.nonzero(a != b)[0][0])
                    issues.append(f"col {c}: {bad} diffs, first {a[i]!r} vs {b[i]!r}")
    return issues


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
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
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    qs = mod.queries()
    sql = mod.oracle_sql()
    n_ok = n_bad = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            got = to_pandas(fn(sf_dir))
        except Exception as e:
            print(f"FAIL  {name}: query raised {type(e).__name__}: {e}")
            n_bad += 1
            continue
        dt = time.time() - t0
        if name in sql:
            try:
                want = con.sql(sql[name]).df()
            except Exception as e:
                print(f"FAIL  {name}: oracle raised {e}")
                n_bad += 1
                continue
            issues = compare(name, got, want)
            if issues:
                print(f"FAIL  {name} ({dt:.1f}s, {len(got)} rows): " + "; ".join(issues))
                n_bad += 1
            else:
                print(f"OK    {name} ({dt:.1f}s, {len(got)} rows, oracle exact)")
                n_ok += 1
        else:
            print(f"OK*   {name} ({dt:.1f}s, {len(got)} rows, rows-only)")
            n_ok += 1
    print(f"\n{n_ok} ok, {n_bad} failed")
    return 1 if n_bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
