#!/bin/bash
# Round-3 final wave: confirm driver-default config + rewarm dependents.
set -x
cd "$(dirname "$0")/.."
export ZIKKURAT_BENCH_BUDGET=100000
LOGS=/tmp/bench_logs_r3
python bench.py                          2>>$LOGS/g_default.err | tee -a $LOGS/results.jsonl
python bench.py --workload kzg --n 12    2>>$LOGS/g_kzg.err     | tee -a $LOGS/results.jsonl
python bench.py --n 22 --check 4         2>>$LOGS/g_msm22.err   | tee -a $LOGS/results.jsonl
python bench.py --n 18                   2>>$LOGS/g_msm18.err   | tee -a $LOGS/results.jsonl
echo DONE7
