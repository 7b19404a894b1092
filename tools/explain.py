#!/usr/bin/env python
"""Dump the formatted physical plan of any catalog query by name:

    python tools/explain.py minhash_lsh_candidates [sf_dir]

Evidence tool for plan-quality review (broadcasts, pushdown, pruning,
exchange count) without writing a scratch script. Default data:
/root/testdata/sf0.01 (plan shapes are SF-independent).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bytesme_etl_batch_pipeline_spark.plans import queries as catalog
from bytesme_etl_batch_pipeline_spark.session import get_spark


def main() -> None:
    if len(sys.argv) < 2 or sys.argv[1] not in catalog.SPARK_QUERIES:
        print(f"usage: {sys.argv[0]} <query> [sf_dir]", file=sys.stderr)
        print("queries:", ", ".join(catalog.SPARK_QUERIES), file=sys.stderr)
        sys.exit(2)
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    spark = get_spark("explain")
    spark.sparkContext.setLogLevel("ERROR")
    df = catalog.SPARK_QUERIES[name](spark, sf_dir)
    print(
        df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
    )


if __name__ == "__main__":
    main()
