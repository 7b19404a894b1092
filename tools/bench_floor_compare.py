#!/usr/bin/env python
"""Compare bench passes against the tracked per-query floor.

VERDICT r7 item 1: the sf0.1 floor must be re-established on a quiet host
— three isolated min-of-3 passes, judged per-query against
``min(BENCH_DETAIL_r06, BENCH_DETAIL_r07)``. This tool takes any number
of BENCH_DETAIL-shaped JSON files as the candidate passes, folds them to
a per-query min ("best of the isolated passes"), and reports:

* total-of-mins over the queries SHARED with the floor (new catalog
  entries are excluded from the comparison, listed separately),
* the ratio distribution vs the floor (median / p90 / worst), and
* every query whose best isolated min stays above ``--flag`` x its floor
  (default 1.3 — the VERDICT's treat-as-regression threshold).

Usage:
    python tools/bench_floor_compare.py PASS1.json [PASS2.json ...] \
        [--floors BENCH_DETAIL_r06.json BENCH_DETAIL_r07.json] \
        [--flag 1.3]
"""

from __future__ import annotations

import argparse
import json
import statistics


def _load_queries(path: str) -> dict[str, float]:
    with open(path) as f:
        return json.load(f)["queries"]


def main() -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("passes", nargs="+")
    p.add_argument(
        "--floors",
        nargs="+",
        default=["BENCH_DETAIL_r06.json", "BENCH_DETAIL_r07.json"],
    )
    p.add_argument("--flag", type=float, default=1.3)
    args = p.parse_args()

    floor: dict[str, float] = {}
    for path in args.floors:
        for q, t in _load_queries(path).items():
            floor[q] = min(t, floor.get(q, float("inf")))

    best: dict[str, float] = {}
    for path in args.passes:
        for q, t in _load_queries(path).items():
            best[q] = min(t, best.get(q, float("inf")))

    shared = sorted(set(best) & set(floor))
    new_only = sorted(set(best) - set(floor))
    ratios = {q: best[q] / floor[q] if floor[q] > 0 else 1.0 for q in shared}
    rs = sorted(ratios.values())
    flagged = {
        q: {"best": best[q], "floor": floor[q], "ratio": round(ratios[q], 3)}
        for q in shared
        if ratios[q] > args.flag
    }
    out = {
        "n_passes": len(args.passes),
        "n_shared": len(shared),
        "new_queries_excluded": new_only,
        "total_best_shared": round(sum(best[q] for q in shared), 2),
        "total_floor_shared": round(sum(floor[q] for q in shared), 2),
        "total_ratio": round(
            sum(best[q] for q in shared) / sum(floor[q] for q in shared), 3
        ),
        "ratio_median": round(statistics.median(rs), 3),
        "ratio_p90": round(rs[int(0.9 * (len(rs) - 1))], 3),
        "ratio_worst": round(rs[-1], 3),
        "flagged_over_threshold": dict(
            sorted(flagged.items(), key=lambda kv: -kv[1]["ratio"])
        ),
    }
    print(json.dumps(out, indent=1))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
