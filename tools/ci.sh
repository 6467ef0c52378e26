#!/usr/bin/env bash
# CI gate: the fast suite + bench smoke.  Every round-final commit must pass
# this (VERDICT r2 #1).  Usage:
#   tools/ci.sh          # fast suite (excludes -m slow) + bench smoke
#   tools/ci.sh --full   # everything including slow e2e tests
set -euo pipefail
cd "$(dirname "$0")/.."

if [[ "${1:-}" == "--full" ]]; then
    python -m pytest tests/ -q
else
    python -m pytest tests/ -q -m "not slow"
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
