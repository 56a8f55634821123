#!/usr/bin/env python3
"""Dev tool: compare two Bench full artifacts (per-query min times) and
report scaling ratios, flagging super-linear queries.

Usage: python3 tools/scale_compare.py BENCH_small.json BENCH_big.json MULT
MULT is the data multiplier between the two runs (e.g. 10 for sf0.1->sf1).
"""
import json, sys

def main(small_path, big_path, mult):
    small = json.load(open(small_path))["queries"]
    big = json.load(open(big_path))["queries"]
    mult = float(mult)
    # Fixed per-query overhead (planning, job launch, tiny shuffles) is
    # ~0.1-0.3 s and doesn't scale with data; measure scaling on the
    # overhead-subtracted part, floored so sub-overhead queries read
    # as flat rather than dividing noise by noise.
    floor = 0.25
    rows = []
    for q in sorted(small):
        if q not in big:
            continue
        s, b = small[q]["min"], big[q]["min"]
        ratio = b / max(s, floor)
        rows.append((q, s, b, ratio))
    rows.sort(key=lambda r: -r[3])
    total_s = sum(r[1] for r in rows)
    total_b = sum(r[2] for r in rows)
    print(f"{'query':38s} {'small':>8s} {'big':>8s} {'ratio':>7s}")
    for q, s, b, ratio in rows:
        flag = " <-- SUPER-LINEAR" if ratio > mult * 1.3 and b > 1.0 else ""
        print(f"{q:38s} {s:8.3f} {b:8.3f} {ratio:6.1f}x{flag}")
    print(f"\ntotals: {total_s:.1f}s -> {total_b:.1f}s "
          f"({total_b / total_s:.2f}x on {mult:.0f}x data; "
          f"{len(rows)} queries)")
    over = [r for r in rows if r[3] > mult * 1.3 and r[2] > 1.0]
    print(f"super-linear (> {mult * 1.3:.0f}x and > 1s): {len(over)}")

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], sys.argv[3])
