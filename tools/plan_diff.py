#!/usr/bin/env python3
"""Dev-only plan-drift gate: diff two PlanDigest JSON artifacts.

Exit 1 if any query's plan shape changed, was removed, or errored —
the plan-level analogue of the bench-regression gate. New queries are
reported but don't fail (they have no baseline yet).

Usage: python3 tools/plan_diff.py <baseline.json> <current.json>
"""
import json, sys


def main(base_path: str, cur_path: str) -> None:
    base = json.load(open(base_path))
    cur = json.load(open(cur_path))
    changed, removed, errored = [], [], []
    for name, b in sorted(base.items()):
        c = cur.get(name)
        if c is None:
            removed.append(name)
        elif c["shape"].startswith("ERROR:"):
            errored.append((name, c["shape"]))
        elif c["digest"] != b["digest"]:
            changed.append(name)
    added = sorted(set(cur) - set(base))
    for name in changed:
        print(f"DRIFT {name}")
        print(f"  was: {base[name]['shape'][:300]}")
        print(f"  now: {cur[name]['shape'][:300]}")
    for name in removed:
        print(f"REMOVED {name}")
    for name, err in errored:
        print(f"ERROR {name}: {err}")
    for name in added:
        print(f"new {name} (no baseline)")
    n_bad = len(changed) + len(removed) + len(errored)
    print(f"== {len(base) - n_bad - len(removed)} stable, "
          f"{len(changed)} drifted, {len(removed)} removed, "
          f"{len(errored)} errored, {len(added)} new ==")
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
