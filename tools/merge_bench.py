#!/usr/bin/env python3
"""Merge per-query minima across bench runs, keyed by plan digest.

Single-run totals on a shared box are not comparable: contention
spikes of 2-7x move between queries run to run (see BASELINE.md).
The per-query minimum across >=2 runs is the stable statistic; this
merges any number of graft.Bench full-artifact JSONs into one
minima artifact.

Minima are DIGEST-KEYED: each rep carries the plan fingerprint it
executed under (graft.PlanDigest), and a query's pooled min is taken
only over reps whose digest matches the LAST input's digest (the
current tree). Reps recorded before a semantic/plan change stay in
the pool but cannot own the minimum. Legacy reps without digests are
treated as non-matching (kept, excluded from minima).

Usage: merge_bench.py RUN1.json RUN2.json [RUN3.json ...] OUT.json
"""
import json
import sys


def _aligned_digests(q):
    reps = q.get("reps", [])
    digs = q.get("digests", [])
    pad = [""] * max(0, len(reps) - len(digs))
    return list(zip(reps, pad + digs))


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
        pairs = [td for r in runs for td in _aligned_digests(
            r["queries"][q])]
        # the last input's digest is authoritative (current tree) —
        # but an ERR:<cls> pseudo-digest (fingerprinting failed) is
        # not a plan identity: falling straight through to
        # min-over-all-reps would readmit stale-plan reps, the exact
        # flattery digest keying exists to prevent. Prefer the most
        # recent VALID digest instead, and warn loudly when the
        # min had to be taken over unkeyed reps.
        cur = ""
        for r in reversed(runs):
            cur = r["queries"][q].get("digest", "")
            if cur and not cur.startswith("ERR:"):
                break
        if cur.startswith("ERR:"):
            cur = ""
        matching = [t for t, d in pairs
                    if d and not d.startswith("ERR:") and d == cur]
        if matching:
            m = min(matching)
        else:
            m = min(t for t, _ in pairs)
            print(f"WARNING: {q}: no valid current-plan digest "
                  f"(latest digest is ERR:/absent) — min taken over "
                  f"ALL {len(pairs)} reps including possibly "
                  f"stale-plan ones", file=sys.stderr)
        out["queries"][q] = {
            "reps": [t for t, _ in pairs],
            "digests": [d for _, d in pairs],
            "digest": cur,
            "min": m,
            "min_any_plan": min(t for t, _ in pairs)}
        total += m
    out["value"] = round(total, 4)
    json.dump(out, open(out_path, "w"), indent=1)
    print(out_path, "total:", out["value"])


if __name__ == "__main__":
    if len(sys.argv) < 4:
        raise SystemExit(__doc__)
    merge(sys.argv[1:-1], sys.argv[-1])
