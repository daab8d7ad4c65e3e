#!/bin/bash
# Round-3 sixth wave: other curves + c sweep at the headline size.
# Sequential; NEVER kill mid-run.
set -x
cd "$(dirname "$0")/.."
export ZIKKURAT_BENCH_BUDGET=100000
LOGS=/tmp/bench_logs_r3
python bench.py --curve BN128 --n 16       2>>$LOGS/f_bn16.err   | tee -a $LOGS/results.jsonl
python bench.py --curve BLS12-377 --n 16   2>>$LOGS/f_377_16.err | tee -a $LOGS/results.jsonl
python bench.py --n 20 --c 15              2>>$LOGS/f_msm20c15.err | tee -a $LOGS/results.jsonl
python bench.py --curve BN128 --workload pairing --n 10 2>>$LOGS/f_bnpair.err | tee -a $LOGS/results.jsonl
echo DONE6
