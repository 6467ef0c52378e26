#!/usr/bin/env bash
# Run the test suite one file per process.
#
# This box's XLA:CPU JIT segfaults sporadically once a single process has
# compiled a few hundred executables (see tests/conftest.py header); per-file
# processes keep each run far below the threshold while staying serial so the
# persistent compile cache is never written concurrently.
#
# Usage: tools/run_suite.sh [extra pytest args...]
set -uo pipefail
cd "$(dirname "$0")/.."

fail=0
declare -a failed_files=()
for f in tests/test_*.py; do
    echo "=== $f"
    python -m pytest "$f" -q -p no:cacheprovider "$@"
    rc=$?
    if [[ $rc -ne 0 && $rc -ne 5 ]]; then   # 5 = no tests collected
        fail=1
        failed_files+=("$f")
    fi
done
if [[ $fail -ne 0 ]]; then
    echo "FAILED files: ${failed_files[*]}"
    exit 1
fi
echo "ALL FILES PASSED"
