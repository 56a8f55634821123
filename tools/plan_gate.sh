#!/usr/bin/env bash
# Dev-only plan-drift gate: regenerate the whole-registry physical-plan
# fingerprints on the committed sf0.001 data and diff them against the
# committed baseline artifact. Run before closing a round; when a drift
# is INTENDED (a deliberate plan improvement), regenerate the baseline:
#   tools/run_main.sh graft.PlanDigest /root/testdata/sf0.001 PLANS_r12.json
#
# Usage: tools/plan_gate.sh [baseline-json]
set -euo pipefail
cd "$(dirname "$0")/.."
BASE="${1:-$(ls PLANS_r*.json 2>/dev/null | sort | tail -1)}"
[ -n "$BASE" ] || { echo "no PLANS_r*.json baseline committed"; exit 1; }
OUT=/tmp/plans_current.json
tools/run_main.sh graft.PlanDigest /root/testdata/sf0.001 "$OUT" \
  | tail -1
python3 tools/plan_diff.py "$BASE" "$OUT"
