#!/usr/bin/env python
"""Build an sf1-scale testdata dir by deterministic 10x replication of the
driver's sf0.1 tables (VERDICT r4 item 6: one empirical scale point for the
100 TB plan-level arguments).

Mechanics: K copies of every fact table with all join keys shifted by
``copy * 10_000_000`` so referential integrity holds WITHIN each copy and
key spaces never collide across copies; the tiny dims (region, nation) stay
verbatim, as TPC-H scaling does. Content columns that drive similarity /
dedup pair generation are perturbed per copy (a copy tag appended to
``documents.text``, a tiny deterministic jitter on ``embeddings.embedding``)
— otherwise every doc/vector would gain 9 bit-identical twins and pairwise
operators would scale quadratically in the copy count, which would measure
the synthetic data's degeneracy, not the engine.

Usage:
    python tools/make_scaled_testdata.py [--copies 10] \
        [--src /root/testdata/sf0.1] [--dst /root/repo/.scratch/sf1]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OFFSET = 10_000_000

# per-table: columns to shift by copy*OFFSET
KEY_SHIFTS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
VERBATIM = ["region", "nation"]


def main() -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--copies", type=int, default=10)
    p.add_argument("--src", default="/root/testdata/sf0.1")
    p.add_argument("--dst", default="/root/repo/.scratch/sf1")
    args = p.parse_args()

    from pyspark.sql import functions as F

    from bytesme_etl_batch_pipeline_spark.session import get_spark

    spark = get_spark("make-scaled-testdata")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(args.dst, exist_ok=True)

    for t in VERBATIM:
        df = spark.read.parquet(os.path.join(args.src, f"{t}.parquet"))
        df.write.mode("overwrite").parquet(os.path.join(args.dst, f"{t}.parquet"))
        print(t, "verbatim", df.count(), flush=True)

    for t, keys in KEY_SHIFTS.items():
        base = spark.read.parquet(os.path.join(args.src, f"{t}.parquet"))
        parts = []
        for k in range(args.copies):
            c = base
            for col in keys:
                c = c.withColumn(col, (F.col(col) + F.lit(k * OFFSET)).cast("long"))
            if t == "documents" and "text" in c.columns and k > 0:
                # Hold the DUPLICATION RATE constant across scale: a mere
                # suffix leaves copies as near-duplicates of each other
                # (word-bigram Jaccard ~0.95), so the shared-shingle join
                # correctly finds ~10 true twins per doc and pair volume
                # grows ~quadratically in the copy count — measuring the
                # data's degeneracy, not the engine. Mutating every other
                # WORD in place with a copy tag (no token-position shift)
                # makes every word bigram copy-specific, so cross-copy
                # shared shingles drop to ~zero while within-copy near-dup
                # structure is preserved (the mutation is position-
                # deterministic, identical texts stay identical, aligned
                # regions of near-dups keep their shared shingles).
                c = c.withColumn(
                    "text",
                    F.when(
                        F.col("text").isNotNull(),
                        F.expr(
                            "array_join(transform(split(text, ' '), "
                            f"(tok, i) -> IF(i % 2 = 1, concat(tok, '~c{k:02d}'), tok)"
                            "), ' ')"
                        ),
                    ),
                )
            if t == "embeddings" and "embedding" in c.columns and k > 0:
                # Same control for vector ops: translate each copy by a
                # fixed pseudo-random offset at NORM scale (elements are
                # ~N(0,1); per-element offsets in [-0.5, 0.5] scaled by
                # 2.0 push cross-copy cosine to ~0.7, below semantic-dup
                # thresholds) while preserving within-copy L2 structure
                # exactly (translation) and cosine structure approximately.
                c = c.withColumn(
                    "embedding",
                    F.when(
                        F.col("embedding").isNotNull(),
                        F.expr(
                            "transform(embedding, (x, i) -> cast(x + "
                            f"((((({k} * 31 + i + 7) * 2654435761) % 1000) "
                            "/ 1000.0 - 0.5) * 2.0) as float))"
                        ),
                    ),
                )
            parts.append(c)
        out = parts[0]
        for c in parts[1:]:
            out = out.unionByName(c)
        dst = os.path.join(args.dst, f"{t}.parquet")
        out.repartition(8).write.mode("overwrite").parquet(dst)
        print(t, "x", args.copies, spark.read.parquet(dst).count(), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
