#!/usr/bin/env python
"""Benchmark harness: runs the headline catalog queries at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) and prints ONE JSON
line: {"metric": ..., "value": total_sec, "unit": "sec", "queries": {...},
"sf": ...}.

Each query is executed to completion (count() action — no driver-side
collect of big results) after a warm-up of the session.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bytesme_etl_batch_pipeline_spark.plans import queries as catalog
from bytesme_etl_batch_pipeline_spark.session import get_spark

# Headline set: one per operator family, ordered cheap → expensive.
HEADLINE = [
    "pricing_summary",
    "dedup_keep_first",
    "dup_report",
    "dim_join_rollup",
    "anti_join_customers_without_orders",
    "topk_orders",
    "window_topk_per_customer",
    "group_sequence_codes",
    "union_all_entities",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("bytesme-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Warm up JVM + parquet footer caches so per-query numbers measure the
    # plan, not session startup.
    spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).count()

    names = [n for n in HEADLINE if n in catalog.SPARK_QUERIES]
    names += [n for n in catalog.SPARK_QUERIES if n not in names]

    timings: dict[str, float] = {}
    for name in names:
        fn = catalog.SPARK_QUERIES[name]
        t0 = time.perf_counter()
        fn(spark, sf_dir).count()
        timings[name] = round(time.perf_counter() - t0, 4)

    total = round(sum(timings.values()), 4)
    print(
        json.dumps(
            {
                "metric": "catalog_total_runtime",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
