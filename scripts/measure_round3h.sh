#!/bin/bash
# Round-3 wave 8: grouped split sort rewarm + G2 effect.  Sequential.
set -x
cd "$(dirname "$0")/.."
export ZIKKURAT_BENCH_BUDGET=100000
LOGS=/tmp/bench_logs_r3
python bench.py                       2>>$LOGS/h_default.err | tee -a $LOGS/results.jsonl
python bench.py --n 16 --group g2     2>>$LOGS/h_g2.err      | tee -a $LOGS/results.jsonl
python bench.py --n 18                2>>$LOGS/h_msm18.err   | tee -a $LOGS/results.jsonl
echo DONE8
