#!/usr/bin/env python3
"""Merge per-query minima across bench runs.

Single-run totals on a shared box are not comparable: contention
spikes of 2-7x move between queries run to run (see BASELINE.md).
The per-query minimum across >=2 runs is the stable statistic; this
merges any number of graft.Bench full-artifact JSONs into one
minima artifact.

Usage: merge_bench.py RUN1.json RUN2.json [RUN3.json ...] OUT.json
"""
import json
import sys


def merge(in_paths, out_path):
    runs = [json.load(open(p)) for p in in_paths]
    names = set(runs[0]["queries"])
    for r in runs[1:]:
        if set(r["queries"]) != names:
            raise SystemExit("query sets differ across runs")
    out = {"metric": "total", "unit": "sec", "sf": runs[0]["sf"],
           # an input may itself be a merged pool — carry its run count
           "runs": sum(r.get("runs", 1) for r in runs),
           "reps_per_run": runs[0].get("reps", 2), "queries": {}}
    total = 0.0
    for q in sorted(names):
        reps = [t for r in runs for t in r["queries"][q]["reps"]]
        m = min(reps)
        out["queries"][q] = {"reps": reps, "min": m}
        total += m
    out["value"] = round(total, 4)
    json.dump(out, open(out_path, "w"), indent=1)
    print(out_path, "total:", out["value"])


if __name__ == "__main__":
    if len(sys.argv) < 4:
        raise SystemExit(__doc__)
    merge(sys.argv[1:-1], sys.argv[-1])
