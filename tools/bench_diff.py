#!/usr/bin/env python3
"""Round-over-round bench pool diff, digest-guarded.

Compares per-query pooled minima between two graft.Bench pool
artifacts (e.g. last round's BENCH_FULL.json via `git show` and this
round's). A per-query comparison is only meaningful when both pools'
minima were taken under the SAME plan fingerprint — a semantic/plan
change between rounds makes "0.24 s then, 0.42 s now" a statement
about two different queries. By default this tool REFUSES to compare
a query whose digests differ (it reports the set and exits 1);
--allow-mixed downgrades the refusal to a labeled section so an
intentional-change round can still read its unchanged-query deltas.

Usage: bench_diff.py OLD.json NEW.json [--allow-mixed]
       [--threshold-ratio 1.3] [--threshold-abs 0.15]
"""
import json
import sys


def main(argv):
    args = [a for a in argv if not a.startswith("--")]
    if len(args) != 2:
        raise SystemExit(__doc__)
    allow_mixed = "--allow-mixed" in argv

    def opt(name, default):
        for a in argv:
            if a.startswith(f"--{name}="):
                return float(a.split("=", 1)[1])
        return default
    thr_ratio = opt("threshold-ratio", 1.3)
    thr_abs = opt("threshold-abs", 0.15)

    old = json.load(open(args[0]))
    new = json.load(open(args[1]))
    shared = sorted(set(old["queries"]) & set(new["queries"]))
    mixed, regress, improve = [], [], []
    old_total = new_total = 0.0
    for q in shared:
        oq, nq = old["queries"][q], new["queries"][q]
        od, nd = oq.get("digest", ""), nq.get("digest", "")
        if od != nd or not od or od.startswith("ERR:"):
            mixed.append((q, od[:8] or "-", nd[:8] or "-"))
            continue
        om, nm = oq["min"], nq["min"]
        old_total += om
        new_total += nm
        if nm > om * thr_ratio and nm - om > thr_abs:
            regress.append((q, om, nm))
        elif om > nm * thr_ratio and om - nm > thr_abs:
            improve.append((q, om, nm))

    n_cmp = len(shared) - len(mixed)
    print(f"comparable: {n_cmp}/{len(shared)} shared queries; "
          f"like-for-like total {old_total:.1f} -> {new_total:.1f} s")
    for q, om, nm in sorted(regress, key=lambda x: x[1] - x[2]):
        print(f"  REGRESSION {q}: {om:.3f} -> {nm:.3f} s")
    for q, om, nm in sorted(improve, key=lambda x: x[2] - x[1]):
        print(f"  improvement {q}: {om:.3f} -> {nm:.3f} s")
    if mixed:
        print(f"{len(mixed)} quer{'y' if len(mixed)==1 else 'ies'} "
              f"with changed/missing plan digests "
              f"(minima NOT comparable):")
        for q, od, nd in mixed:
            print(f"  MIXED-DIGEST {q}: {od} -> {nd}")
        if not allow_mixed:
            print("refusing mixed-digest comparison "
                  "(pass --allow-mixed to read the rest anyway)")
            return 1
    return 1 if regress else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
