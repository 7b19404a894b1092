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
import os
import re
import sys

LINE = re.compile(r"^(\w+)\s+(.*\S)\s+\((\d+(?:\.\d+)?)s\)$")
# a line that carries the per-query timing suffix but failed the full row
# match — e.g. the tail fragment of a (pre-fix) multi-line RED status
SUSPECT = re.compile(r"\(\d+(?:\.\d+)?s\)$")


def parse_log(path: str) -> tuple[dict[str, tuple[str, float]], list[str]]:
    out: dict[str, tuple[str, float]] = {}
    suspects: list[str] = []
    with open(path, errors="replace") as f:
        for raw in f:
            # progress bars are \r-separated on the same physical line
            for seg in raw.split("\r"):
                seg = seg.strip()
                m = LINE.match(seg)
                if m and not m.group(1).startswith("Stage"):
                    out[m.group(1)] = (m.group(2).strip(), float(m.group(3)))
                elif not m and SUSPECT.search(seg) and not seg.startswith("["):
                    suspects.append(seg)
    return out, suspects


def main() -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("out")
    p.add_argument("logs", nargs="+")
    p.add_argument("--skip", nargs="*", default=[])
    p.add_argument("--sf-dir", default="")
    p.add_argument(
        "--expect",
        # '+' not '*': an explicitly EMPTY --expect would fall through to
        # "use the full catalog" — the opposite of what a caller merging a
        # partial segment sweep intended. Require at least one name.
        nargs="+",
        default=None,
        help="expected query names (at least one); default when the flag "
        "is absent: the full catalog from plans.queries. A merged summary "
        "missing any expected name FAILS (exit 2) — a RED row whose "
        "status text broke the one-line log contract would otherwise "
        "vanish silently and read as 0 red.",
    )
    args = p.parse_args()

    if args.expect is not None:
        expected = set(args.expect)
    else:
        sys.path.insert(
            0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        )
        from bytesme_etl_batch_pipeline_spark.plans import queries as catalog

        expected = set(catalog.SPARK_QUERIES)
    expected -= set(args.skip)

    merged: dict[str, tuple[str, float]] = {}
    suspects: list[str] = []
    for path in args.logs:
        seg_rows, seg_suspects = parse_log(path)
        merged.update(seg_rows)  # later segments win
        suspects.extend(seg_suspects)
    for s in suspects[:10]:
        print(f"WARN unparsed timing-suffixed line: {s[:160]}", file=sys.stderr)

    missing = sorted(expected - set(merged))
    extra = sorted(set(merged) - expected)

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
        "missing": missing,
        "unexpected": extra,
        "slowest": sorted(
            ((n, t) for n, (_, t) in merged.items()),
            key=lambda kv: -kv[1],
        )[:10],
    }
    with open(args.out, "w") as f:
        json.dump(summary, f, indent=1)
    print(
        json.dumps(
            {k: summary[k] for k in ("checked", "green", "red", "missing")}
        )
    )
    if missing:
        print(
            f"FAIL: {len(missing)} expected queries absent from merged logs "
            f"(first: {missing[:5]})",
            file=sys.stderr,
        )
        return 2
    return 1 if red else 0


if __name__ == "__main__":
    raise SystemExit(main())
