#!/usr/bin/env bash
# CI gate: the fast suite + bench smoke.  Every round-final commit must pass
# this (VERDICT r2 #1).  Usage:
#   tools/ci.sh          # fast suite (excludes -m slow) + bench smoke
#   tools/ci.sh --full   # everything including slow e2e tests
set -euo pipefail
cd "$(dirname "$0")/.."

# per-file processes: this box's XLA:CPU JIT segfaults under large
# single-process compile counts (tools/run_suite.sh header)
if [[ "${1:-}" == "--full" ]]; then
    tools/run_suite.sh
else
    tools/run_suite.sh -m "not slow"
fi

# bench smoke: the benchmark path must import, compile, and print its JSON
# line (tiny sizes; not a measurement)
python bench.py --smoke | tail -1 | python -c '
import json, sys
line = sys.stdin.read().strip()
d = json.loads(line)
assert "metric" in d and "value" in d and "vs_baseline" in d, d
print("bench smoke OK:", d["metric"], d["value"])
'
echo "CI PASS"
