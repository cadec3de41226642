"""Shared build logic + standalone runner for the kill/resume test.

As a module: `build_doc_part(sf_dir)` returns the per-partition build
function used by both the subprocess run (killed mid-stage) and the
in-session resume — identical code, so surviving partitions must validate
and only missing ones recompute.

As a script: `python partition_kill_runner.py <root> <sf_dir>` runs the
partitioned stage in its own Ray session until killed.
"""
from __future__ import annotations

import sys

PART_KEYS = [str(i) for i in range(8)]


def build_doc_part(sf_dir: str):
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    from engine.storage import read_parquet_clean

    def build(key):
        k = int(key)

        def stats(b: pa.Table) -> pa.Table:
            ids = b.column("doc_id").to_numpy()
            t = b.filter(pa.array(ids % len(PART_KEYS) == k))
            return pa.table({
                "doc_id": t.column("doc_id"),
                "n_chars": pc.utf8_length(t.column("text"))
                             .cast(pa.int64()),
            })

        return read_parquet_clean(f"{sf_dir}/documents.parquet",
                                  columns=["doc_id", "text"]) \
            .map_batches(stats, batch_format="pyarrow") \
            .sort("doc_id").repartition(1)   # deterministic single file

    return build


if __name__ == "__main__":
    root, sf_dir = sys.argv[1], sys.argv[2]
    import os
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import ray
    ray.init(address="local", num_cpus=4, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False
    from engine.checkpoint import run_stage_partitioned
    inner = build_doc_part(sf_dir)

    def braked(key):
        # widen the kill window deterministically: >=0.4 s between
        # partition commits so the test's poll (0.05 s) cannot miss the
        # 2-committed state even on a machine that builds instantly
        import time
        time.sleep(0.4)
        return inner(key)

    run_stage_partitioned(root, "docstats", PART_KEYS, braked)
    ray.shutdown()
