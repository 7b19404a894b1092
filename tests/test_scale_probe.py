"""Opt-in sf1 scale-regression probe (VERDICT r4 item 6, automated).

Asserts the empirical property the 100 TB arguments rest on: a 10x data
increase costs at most ~linear wall time on the expensive catalog tail,
with no driver-side memory growth beyond the documented bounded artifacts.

Gated behind SPARK_GRAFT_SF1_DIR (build the data first):

    python tools/make_scaled_testdata.py          # ~1 min, 170 MB
    SPARK_GRAFT_SF1_DIR=/root/repo/.scratch/sf1 \
        python -m pytest tests/test_scale_probe.py -q

The ratio bound is deliberately loose (12x for 10x rows, after a warm-up
run of each query at both SFs): the point is catching SUPER-linear
blowups — an accidental all-pairs join, a driver collect that grows with
the data — not benchmarking; shared-host noise makes tighter bounds flap.
"""

from __future__ import annotations

import os
import time

import pytest

SF1_DIR = os.environ.get("SPARK_GRAFT_SF1_DIR")

# The r04 expensive tail: pair-generating dedup, ANN, streaming state,
# multi-join TPC-H — the shapes where super-linear scaling would hide.
PROBE_QUERIES = [
    "llm_corpus_pipeline",
    "minhash_lsh_candidates",
    "neardup_clusters",
    "neardup_keep_best_docs",
    "ann_recall_report",
    "tpch_q2_min_cost_supplier",
    "streaming_session_counts",
]

MAX_RATIO = 12.0  # 10x rows; >12x means something scales super-linearly


@pytest.mark.skipif(
    not SF1_DIR or not os.path.isdir(SF1_DIR),
    reason="sf1 probe data absent; run tools/make_scaled_testdata.py and "
    "set SPARK_GRAFT_SF1_DIR",
)
@pytest.mark.parametrize("name", PROBE_QUERIES)
def test_sf1_ratio_stays_linear(spark, sf_dir, name):
    from bytesme_etl_batch_pipeline_spark.plans import queries as Q

    sf01 = "/root/testdata/sf0.1"

    def warm_min(d: str, runs: int = 2) -> float:
        import gc

        best = float("inf")
        for _ in range(runs + 1):  # first run warms caches, then min-of-N
            t0 = time.perf_counter()
            Q.SPARK_QUERIES[name](spark, d).count()
            dt = time.perf_counter() - t0
            # free the run's checkpoint blocks before timing the next one
            # (ContextCleaner reclaims only after Python drops the refs;
            # without this, sf1 passes accumulate blocks until heap OOM)
            gc.collect()
            best = min(best, dt)
        return best

    t_small = warm_min(sf01)
    t_big = warm_min(SF1_DIR)
    ratio = t_big / max(t_small, 1e-6)
    assert ratio <= MAX_RATIO, (
        f"{name}: sf0.1={t_small:.2f}s sf1={t_big:.2f}s ratio={ratio:.1f}x "
        f"(> {MAX_RATIO}x for 10x rows — super-linear scaling)"
    )


@pytest.mark.skipif(
    not SF1_DIR or not os.path.isdir(SF1_DIR),
    reason="sf1 probe data absent",
)
def test_sf1_driver_rss_stays_flat(spark):
    """Python driver RSS must not grow with the data: every result is
    consumed with count(), and the documented driver-side artifacts
    (centroids, BPE vocab, 1-row scalars) are data-size-independent."""
    from bytesme_etl_batch_pipeline_spark.plans import queries as Q

    def rss_mb() -> int:
        with open("/proc/self/status", encoding="ascii") as f:
            for ln in f:
                if ln.startswith("VmRSS"):
                    return int(ln.split()[1]) // 1024
        raise RuntimeError("VmRSS not found")

    import gc

    for name in PROBE_QUERIES:  # warm allocator high-water first
        Q.SPARK_QUERIES[name](spark, SF1_DIR).count()
        gc.collect()
    before = rss_mb()
    for name in PROBE_QUERIES:
        Q.SPARK_QUERIES[name](spark, SF1_DIR).count()
        gc.collect()
    after = rss_mb()
    assert after - before < 200, (
        f"driver RSS grew {after - before} MB across a repeated sf1 pass "
        "— a result set or per-query artifact is accumulating on the driver"
    )
