#!/usr/bin/env python
"""Merge resumed driver_gate sweep logs into one final summary JSON.

A scale sweep can be interrupted and resumed with ``--names`` (the r7 sf10
sweep ran as three segments: the initial full run, a resume after the
per-query-connection fix, and a single-query re-run of the rewritten
triangle oracle). Later segments override earlier ones per query, so a RED
row that was re-run green counts green — the PER-SEGMENT logs stay in the
tree as the audit trail of what failed when.

Usage:
    python tools/merge_gate_logs.py OUT.json LOG1 LOG2 ... \
        [--skip name ...] [--sf-dir DIR]
"""

from __future__ import annotations

import argparse
import json
import re

LINE = re.compile(r"^(\w+)\s+(.*\S)\s+\((\d+(?:\.\d+)?)s\)$")


def parse_log(path: str) -> dict[str, tuple[str, float]]:
    out: dict[str, tuple[str, float]] = {}
    with open(path, errors="replace") as f:
        for raw in f:
            # progress bars are \r-separated on the same physical line
            for seg in raw.split("\r"):
                m = LINE.match(seg.strip())
                if m and not m.group(1).startswith("Stage"):
                    out[m.group(1)] = (m.group(2).strip(), float(m.group(3)))
    return out


def main() -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("out")
    p.add_argument("logs", nargs="+")
    p.add_argument("--skip", nargs="*", default=[])
    p.add_argument("--sf-dir", default="")
    args = p.parse_args()

    merged: dict[str, tuple[str, float]] = {}
    for path in args.logs:
        merged.update(parse_log(path))  # later segments win

    green = sorted(n for n, (s, _) in merged.items() if s == "green")
    red = sorted(n for n, (s, _) in merged.items() if s.startswith("RED"))
    no_oracle = sorted(
        n for n, (s, _) in merged.items() if s.startswith("no_oracle")
    )
    bigout = sorted(
        n for n, (s, _) in merged.items() if s.startswith("bigout")
    )
    summary = {
        "sf_dir": args.sf_dir,
        "segments": args.logs,
        "checked": len(merged),
        "green": len(green),
        "no_oracle": no_oracle,
        "bigout_fingerprint": bigout,
        "skipped": args.skip,
        "red": red,
        "red_detail": {n: merged[n][0] for n in red},
        "slowest": sorted(
            ((n, t) for n, (_, t) in merged.items()),
            key=lambda kv: -kv[1],
        )[:10],
    }
    with open(args.out, "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps({k: summary[k] for k in ("checked", "green", "red")}))
    return 1 if red else 0


if __name__ == "__main__":
    raise SystemExit(main())
