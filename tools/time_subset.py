#!/usr/bin/env python
"""Time an explicit subset of catalog queries with bench.py's methodology
(same session warm-up, same count() action, N repeats, per-query min) —
for isolating a query during optimization without paying a full catalog
pass. Prints one JSON line to stdout.

Usage:
    python tools/time_subset.py q1 q2 ...        [--repeats 3]
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python tools/time_subset.py ...
"""

from __future__ import annotations

import argparse
import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_REAL_STDOUT = sys.stdout
sys.stdout = sys.stderr

from bytesme_etl_batch_pipeline_spark.plans import queries as catalog
from bytesme_etl_batch_pipeline_spark.session import get_spark


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("names", nargs="+")
    p.add_argument("--repeats", type=int, default=3)
    args = p.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("bytesme-time-subset")
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).count()

    # Same host probe as bench.py so numbers can be compared across runs
    # of this tool under this host's load swings.
    import numpy as np

    rng = np.random.default_rng(20260816)
    a = rng.standard_normal((1024, 1024))
    b = rng.standard_normal((1024, 1024))
    t0 = time.perf_counter()
    for _ in range(5):
        a @ b
    matmul = round(time.perf_counter() - t0, 4)
    big = rng.standard_normal(64 * 1024 * 1024 // 8)
    t0 = time.perf_counter()
    for _ in range(20):
        big.copy()
    memcpy = round(time.perf_counter() - t0, 4)

    runs: dict[str, list[float]] = {}
    for name in args.names:
        fn = catalog.SPARK_QUERIES[name]
        spark.sparkContext.setJobDescription(f"time_subset: {name}")
        samples = []
        for _ in range(args.repeats):
            t0 = time.perf_counter()
            fn(spark, sf_dir).count()
            samples.append(round(time.perf_counter() - t0, 4))
        gc.collect()
        runs[name] = samples
    out = {
        "queries": {k: min(v) for k, v in runs.items()},
        "runs": runs,
        "host": {"host_matmul_x5": matmul, "host_memcpy_x20": memcpy},
        "total_min": round(sum(min(v) for v in runs.values()), 4),
    }
    print(json.dumps(out), file=_REAL_STDOUT)


if __name__ == "__main__":
    main()
