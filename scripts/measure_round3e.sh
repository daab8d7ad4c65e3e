#!/bin/bash
# Round-3 fifth wave: pairing batch scaling (clamp raised to 2^12) and
# the final default-config warm/confirmation run.  Sequential; NEVER
# kill mid-run.
set -x
cd "$(dirname "$0")/.."
export ZIKKURAT_BENCH_BUDGET=100000
LOGS=/tmp/bench_logs_r3
python bench.py --workload pairing --n 8  2>>$LOGS/e_pair256.err  | tee -a $LOGS/results.jsonl
python bench.py --workload pairing --n 10 2>>$LOGS/e_pair1024.err | tee -a $LOGS/results.jsonl
python bench.py                            2>>$LOGS/e_default.err  | tee -a $LOGS/results.jsonl
echo DONE5
