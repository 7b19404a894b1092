#!/usr/bin/env python
"""Compare bench passes against the tracked per-query floor.

VERDICT r7 item 1: the sf0.1 floor must be re-established on a quiet host
— three isolated min-of-3 passes, judged per-query against
``min(BENCH_DETAIL_r06, BENCH_DETAIL_r07)``. This tool takes any number
of BENCH_DETAIL-shaped JSON files as the candidate passes, folds them to
a per-query min ("best of the isolated passes"), and reports:

* total-of-mins over the queries SHARED with the floor (new catalog
  entries are excluded from the comparison, listed separately),
* the ratio distribution vs the floor (median / p90 / worst),
* every query whose best isolated min stays above ``--flag`` x its floor
  (default 1.3 — the VERDICT's treat-as-regression threshold), and
* (VERDICT r8 item 3) the HOST-NORMALIZED view: bench passes since round
  9 carry a ``canary`` block — two fixed probes (pure-codegen
  pricing_summary x10 and a full-outer-join x10) timed immediately
  before and after the catalog pass. When both the candidate passes and
  at least one floor file carry canaries, the tool computes
  ``host_factor = median(candidate probe times) / median(floor probe
  times)`` and reports ratios divided by it, so a uniform host-throughput
  shift (r7: x1.33, r8: x1.27 on identical engine code) no longer needs
  per-round re-adjudication. Raw ratios are always reported alongside.

Queries with a 0.0 floor (sub-100µs timer artifacts) cannot form a
ratio; they are listed under ``zero_floor`` and checked by absolute
time against --zero-floor-abs (default 1.0 s) instead of being silently
exempted from the --flag check.

Usage:
    python tools/bench_floor_compare.py PASS1.json [PASS2.json ...] \
        [--floors BENCH_DETAIL_r06.json BENCH_DETAIL_r07.json] \
        [--flag 1.3]
"""

from __future__ import annotations

import argparse
import json
import statistics
import sys


def _load(path: str) -> dict:
    with open(path) as f:
        return json.load(f)


def _canary_median(blobs: list[dict]) -> float | None:
    """Fold the canary blocks of several pass files to one scalar: the
    median over every probe sample (pre+post of both probes, all files).
    Median, not min — the canary estimates TYPICAL host throughput for
    the window, and an interference burst on one sample must not hide a
    genuinely slow host (nor a lucky sample claim a fast one)."""
    samples: list[float] = []
    for blob in blobs:
        canary = blob.get("canary") or {}
        for phase in ("pre", "post"):
            samples.extend(float(v) for v in (canary.get(phase) or {}).values())
    if not samples:
        return None
    return statistics.median(samples)


def main() -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("passes", nargs="+")
    p.add_argument(
        "--floors",
        nargs="+",
        default=["BENCH_DETAIL_r06.json", "BENCH_DETAIL_r07.json"],
    )
    p.add_argument("--flag", type=float, default=1.3)
    p.add_argument(
        "--zero-floor-abs",
        type=float,
        default=1.0,
        help="flag a zero-floor query whose best candidate time exceeds "
        "this many seconds (ratio undefined, so check absolute time)",
    )
    args = p.parse_args()

    floor_blobs = [_load(path) for path in args.floors]
    floor: dict[str, float] = {}
    for blob in floor_blobs:
        for q, t in blob["queries"].items():
            floor[q] = min(float(t), floor.get(q, float("inf")))

    pass_blobs = [_load(path) for path in args.passes]
    best: dict[str, float] = {}
    for blob in pass_blobs:
        for q, t in blob["queries"].items():
            best[q] = min(float(t), best.get(q, float("inf")))

    shared = sorted(set(best) & set(floor))
    new_only = sorted(set(best) - set(floor))
    zero_floor = sorted(q for q in shared if floor[q] <= 0.0)
    ratable = [q for q in shared if floor[q] > 0.0]
    if not ratable:
        print(
            "ERROR: no shared queries with a nonzero floor between the "
            f"passes ({sorted(best)[:3]}...) and the floors "
            f"({sorted(floor)[:3]}...) — wrong files?",
            file=sys.stderr,
        )
        return 2

    ratios = {q: best[q] / floor[q] for q in ratable}
    rs = sorted(ratios.values())
    flagged = {
        q: {"best": best[q], "floor": floor[q], "ratio": round(ratios[q], 3)}
        for q in ratable
        if ratios[q] > args.flag
    }
    zero_floor_flagged = {
        q: {"best": best[q], "floor": 0.0}
        for q in zero_floor
        if best[q] > args.zero_floor_abs
    }

    cand_canary = _canary_median(pass_blobs)
    floor_canary = _canary_median(floor_blobs)
    host_factor = (
        round(cand_canary / floor_canary, 4)
        if cand_canary is not None and floor_canary is not None
        and floor_canary > 0
        else None
    )

    out = {
        "n_passes": len(args.passes),
        "n_shared": len(shared),
        "new_queries_excluded": new_only,
        "zero_floor": zero_floor,
        "zero_floor_flagged_abs": zero_floor_flagged,
        "total_best_shared": round(sum(best[q] for q in ratable), 2),
        "total_floor_shared": round(sum(floor[q] for q in ratable), 2),
        "total_ratio": round(
            sum(best[q] for q in ratable) / sum(floor[q] for q in ratable), 3
        ),
        "ratio_median": round(statistics.median(rs), 3),
        "ratio_p90": round(rs[int(0.9 * (len(rs) - 1))], 3),
        "ratio_worst": round(rs[-1], 3),
        "flagged_over_threshold": dict(
            sorted(flagged.items(), key=lambda kv: -kv[1]["ratio"])
        ),
        # host-normalized view (null fields mean a side lacks canaries —
        # pre-r9 floors; normalization starts once an r9+ floor exists)
        "canary_candidate_median": cand_canary,
        "canary_floor_median": floor_canary,
        "host_factor": host_factor,
    }
    if host_factor:
        norm = {q: r / host_factor for q, r in ratios.items()}
        nrs = sorted(norm.values())
        out["normalized"] = {
            "total_ratio": round(out["total_ratio"] / host_factor, 3),
            "ratio_median": round(statistics.median(nrs), 3),
            "ratio_p90": round(nrs[int(0.9 * (len(nrs) - 1))], 3),
            "ratio_worst": round(nrs[-1], 3),
            "flagged_over_threshold": {
                q: {
                    "best": best[q],
                    "floor": floor[q],
                    "norm_ratio": round(norm[q], 3),
                }
                for q in sorted(norm, key=lambda q: -norm[q])
                if norm[q] > args.flag
            },
        }
    print(json.dumps(out, indent=1))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
