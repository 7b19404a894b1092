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
  at least one floor file carry canaries, the tool computes a per-probe
  ratio ``median(candidate samples of probe K) / median(floor samples of
  probe K)`` over the probe keys PRESENT ON BOTH SIDES, then takes
  ``host_factor = median(per-probe ratios)`` (ADVICE r9: a pooled median
  over mixed-magnitude probes biases when the probe set shifts). Since
  round 10 the canary block also carries ENGINE-INDEPENDENT ``host_*``
  probes (NumPy matmul / memcpy — no Spark code path); when both sides
  have them, host_factor uses ONLY those, so an engine-wide regression
  cannot inflate the canary and be divided out of the normalized view
  (ADVICE r9, medium). A materially non-uniform probe-ratio spread
  (max/min > 1.15) is reported as ``canary_disagreement``.

POLICY (ADVICE r9): RAW ratios are primary. The normalized view is
advisory context for uniform host shifts; a host_factor above ~1.1 is
itself reported (``host_factor_suspicious``) rather than silently
absorbed — especially when derived from engine-executed probes (no
host_* keys on one side), where an engine-wide regression could hide
inside it.

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


def _canary_samples(blobs: list[dict]) -> dict[str, list[float]]:
    """Collect canary samples per probe key (pre+post, all files)."""
    out: dict[str, list[float]] = {}
    for blob in blobs:
        canary = blob.get("canary") or {}
        for phase in ("pre", "post"):
            for key, v in (canary.get(phase) or {}).items():
                out.setdefault(key, []).append(float(v))
    return out


def _host_factor(
    cand: dict[str, list[float]], floor: dict[str, list[float]]
) -> tuple[float | None, dict[str, float], str | None]:
    """Per-probe candidate/floor ratio over MATCHING keys, folded by
    median (ADVICE r9: pooling mixed-magnitude probes into one median
    biases when the probe set or relative probe cost shifts). Prefers
    engine-independent ``host_*`` probes when both sides carry them —
    those cannot be inflated by an engine-wide regression. Returns
    (host_factor, per_probe_ratios, basis) where basis is 'host' or
    'engine' or None."""
    shared = sorted(set(cand) & set(floor))
    host_keys = [k for k in shared if k.startswith("host_")]
    basis_keys, basis = (host_keys, "host") if host_keys else (shared, "engine")
    ratios: dict[str, float] = {}
    for k in basis_keys:
        fm = statistics.median(floor[k])
        if fm > 0:
            ratios[k] = round(statistics.median(cand[k]) / fm, 4)
    if not ratios:
        return None, {}, None
    return round(statistics.median(ratios.values()), 4), ratios, basis


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

    cand_samples = _canary_samples(pass_blobs)
    floor_samples = _canary_samples(floor_blobs)
    host_factor, probe_ratios, canary_basis = _host_factor(
        cand_samples, floor_samples
    )
    canary_disagreement = None
    if len(probe_ratios) >= 2:
        spread = max(probe_ratios.values()) / min(probe_ratios.values())
        if spread > 1.15:
            canary_disagreement = {
                "spread": round(spread, 3),
                "per_probe": probe_ratios,
                "note": "probe ratios disagree materially — host shift is "
                "not uniform; treat host_factor with suspicion",
            }

    out = {
        "n_passes": len(args.passes),
        # VERDICT r9 item 2: the r9-vs-r8 comparison silently used r8's
        # best single pass as the floor instead of the r8 min-of-3 fold,
        # overstating ×0.91 for a true ×0.999. Echo the exact file lists
        # so every emitted comparison is self-documenting about what
        # formed each side.
        "pass_files": list(args.passes),
        "floor_files": list(args.floors),
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
        # pre-r9 floors; normalization starts once an r9+ floor exists).
        # POLICY: raw ratios above are PRIMARY; normalized is advisory.
        "host_factor": host_factor,
        "host_factor_basis": canary_basis,
        "host_factor_per_probe": probe_ratios,
        "canary_disagreement": canary_disagreement,
        "host_factor_suspicious": (
            {
                "host_factor": host_factor,
                "basis": canary_basis,
                "note": "host_factor > 1.1 — if its rise coincides with an "
                "engine diff, the 'host shift' may itself be an engine-wide "
                "regression (certain when basis=engine; host-basis probes "
                "cannot be engine-inflated but still warrant a look)",
            }
            if host_factor is not None and host_factor > 1.1
            else None
        ),
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
