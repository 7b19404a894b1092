#!/usr/bin/env python
"""Per-query job/stage profiler (guide §1.1/§7.1 without the UI).

Runs the named catalog queries with the Spark event log enabled, then
parses the log into a per-query breakdown: jobs (count, wall), stages
(duration, task count, shuffle bytes), and the gap between job wall and
query wall (= driver-side plan construction / py4j / scheduling).

Usage:
    python tools/profile_query.py ivfpq_topk bloom_decontaminate \
        [--sf-dir /root/testdata/sf0.1] [--repeats 2]

Writes nothing to the repo; prints a compact report to stdout.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("names", nargs="+")
    p.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    p.add_argument("--repeats", type=int, default=2)
    args = p.parse_args()

    evdir = "/tmp/spark-events-profile"
    os.makedirs(evdir, exist_ok=True)
    for f in os.listdir(evdir):
        try:
            os.remove(os.path.join(evdir, f))
        except OSError:
            pass

    from bytesme_etl_batch_pipeline_spark.session import get_spark

    spark = get_spark(
        "profile-query",
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": evdir,
            "spark.eventLog.compress": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    from bytesme_etl_batch_pipeline_spark.plans import queries as catalog

    # session warm-up: parquet footer + python workers (mirror bench.py)
    warm = spark.read.parquet(os.path.join(args.sf_dir, "lineitem.parquet"))
    warm.count()
    from pyspark.sql import functions as F
    from pyspark.sql.functions import PandasUDFType, pandas_udf

    _w = pandas_udf(lambda v: v * 1.0, "double", PandasUDFType.SCALAR)
    spark.range(32).select(_w(F.col("id").cast("double")).alias("y")).agg(
        F.sum("y")
    ).collect()

    walls: dict[str, list[float]] = {}
    build: dict[str, list[float]] = {}
    for name in args.names:
        fn = catalog.SPARK_QUERIES[name]
        walls[name] = []
        build[name] = []
        for r in range(args.repeats):
            spark.sparkContext.setJobDescription(f"PROF|{name}|{r}")
            t0 = time.perf_counter()
            df = fn(spark, args.sf_dir)
            t1 = time.perf_counter()
            df.count()
            t2 = time.perf_counter()
            walls[name].append(t2 - t0)
            build[name].append(t1 - t0)
        spark.sparkContext.setJobDescription(None)
    app_id = spark.sparkContext.applicationId
    spark.stop()

    # parse the event log (Spark 4: a rolling DIRECTORY eventlog_v2_<app>)
    cands = [os.path.join(evdir, f) for f in os.listdir(evdir) if app_id in f]
    if not cands:
        cands = [os.path.join(evdir, f) for f in os.listdir(evdir)]
    path = max(cands, key=os.path.getmtime)
    if os.path.isdir(path):
        parts = sorted(
            os.path.join(path, f)
            for f in os.listdir(path)
            if f.startswith("events_")
        )
    else:
        parts = [path]

    def _lines():
        for pt in parts:
            with open(pt) as f:
                yield from f

    jobs: dict[int, dict] = {}
    stages: dict[int, dict] = {}
    if True:
        for line in _lines():
            ev = json.loads(line)
            e = ev.get("Event")
            if e == "SparkListenerJobStart":
                jid = ev["Job ID"]
                desc = ev.get("Properties", {}).get("spark.job.description", "")
                jobs[jid] = {
                    "desc": desc,
                    "t0": ev["Submission Time"],
                    "stages": [s["Stage ID"] for s in ev.get("Stage Infos", [])],
                }
            elif e == "SparkListenerJobEnd":
                jid = ev["Job ID"]
                if jid in jobs:
                    jobs[jid]["t1"] = ev["Completion Time"]
            elif e == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                sid = si["Stage ID"]
                stages[sid] = {
                    "name": si.get("Stage Name", "")[:60],
                    "tasks": si.get("Number of Tasks"),
                    "ms": (si.get("Completion Time", 0) - si.get("Submission Time", 0))
                    if si.get("Submission Time")
                    else None,
                }

    per_q: dict[str, dict] = {}
    for jid, j in sorted(jobs.items()):
        desc = j.get("desc", "")
        if not desc.startswith("PROF|"):
            continue
        _, name, rep = desc.split("|")
        d = per_q.setdefault(f"{name}|{rep}", {"n_jobs": 0, "job_ms": 0, "stages": []})
        d["n_jobs"] += 1
        d["job_ms"] += j.get("t1", j["t0"]) - j["t0"]
        for sid in j["stages"]:
            if sid in stages and stages[sid]["ms"] is not None:
                d["stages"].append((sid, stages[sid]))

    for name in args.names:
        print(f"\n=== {name} ===")
        for r in range(args.repeats):
            key = f"{name}|{r}"
            d = per_q.get(key, {"n_jobs": 0, "job_ms": 0, "stages": []})
            w = walls[name][r]
            b = build[name][r]
            print(
                f"  rep{r}: wall {w:6.3f}s  build {b:6.3f}s  jobs {d['n_jobs']:3d}"
                f"  job-wall {d['job_ms']/1000:6.3f}s"
                f"  gap {w - b - d['job_ms']/1000:6.3f}s"
            )
            if r == args.repeats - 1:
                big = sorted(d["stages"], key=lambda s: -(s[1]["ms"] or 0))[:8]
                for sid, s in big:
                    print(
                        f"      stage {sid:4d} {s['ms']:6d}ms tasks={s['tasks']:3d}"
                        f"  {s['name']}"
                    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
