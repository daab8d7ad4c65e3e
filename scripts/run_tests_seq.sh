#!/bin/bash
# Robust suite runner: one pytest process per test FILE, sequentially.
# Bounds XLA:CPU compilations per process (the long-process segfault
# hazard — see CLAUDE.md) and isolates any crash to one file's report.
# Usage: scripts/run_tests_seq.sh [pytest extra args...]
cd "$(dirname "$0")/.."
mkdir -p /tmp/test_logs
rc=0
for f in tests/test_*.py; do
  name=$(basename "$f" .py)
  if ! python -m pytest "$f" -q -o addopts="" "$@" \
        > "/tmp/test_logs/$name.log" 2>&1; then
    rc=1
    echo "FAIL $f (tail below)"
    tail -5 "/tmp/test_logs/$name.log"
  else
    tail -1 "/tmp/test_logs/$name.log" | sed "s|^|OK   $name: |"
  fi
done
exit $rc
