#!/usr/bin/env python
"""Split each catalog query's wall time into DataFrame CONSTRUCTION
(python-side plan building: py4j traffic, literal trees, any eager work
the builder does) vs EXECUTION (count() on the already-built frame).
Identifies whether the sf0.1 long-tail floor is plan-building overhead or
actual compute. Prints one JSON line; run on a quiet host.

Usage: python tools/profile_overhead.py [name ...]   # default: whole catalog
"""

from __future__ import annotations

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
    names = sys.argv[1:] or list(catalog.SPARK_QUERIES)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("bytesme-profile-overhead")
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).count()

    rows = {}
    for name in names:
        fn = catalog.SPARK_QUERIES[name]
        # warm once (codegen/classload), then measure the warm repeat split
        try:
            fn(spark, sf_dir).count()
        except Exception as exc:  # keep the sweep alive; record the failure
            rows[name] = {"error": str(exc)[:200]}
            continue
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        t1 = time.perf_counter()
        df.count()
        t2 = time.perf_counter()
        rows[name] = {
            "build": round(t1 - t0, 4),
            "exec": round(t2 - t1, 4),
        }
    ok = {k: v for k, v in rows.items() if "error" not in v}
    out = {
        "rows": rows,
        "total_build": round(sum(v["build"] for v in ok.values()), 2),
        "total_exec": round(sum(v["exec"] for v in ok.values()), 2),
        "n": len(rows),
    }
    print(json.dumps(out), file=_REAL_STDOUT)


if __name__ == "__main__":
    main()
