#!/bin/bash
# Round-3 second wave: hunt the 2^18 MSM regression (146.7k vs round-2's
# 245k) with kernel/sort/block A/Bs.  Sequential; NEVER kill mid-run.
set -x
cd "$(dirname "$0")/.."
export ZIKKURAT_BENCH_BUDGET=100000
LOGS=/tmp/bench_logs_r3
mkdir -p $LOGS
python bench.py --n 18                   2>>$LOGS/msm18b.err    | tee -a $LOGS/results.jsonl
ZIKKURAT_NO_MSM_KERNEL=1 python bench.py --n 18 \
                                         2>>$LOGS/msm18nk.err   | tee -a $LOGS/results.jsonl
ZIKKURAT_SPLIT_SORT=1 python bench.py --n 18 \
                                         2>>$LOGS/msm18ss.err   | tee -a $LOGS/results.jsonl
ZIKKURAT_LOGDEPTH_WSUM=1 python bench.py --n 18 \
                                         2>>$LOGS/msm18lw.err   | tee -a $LOGS/results.jsonl
ZIKKURAT_LOGDEPTH_WSUM=1 python bench.py --n 16 --group g2 \
                                         2>>$LOGS/msm16g2lw.err | tee -a $LOGS/results.jsonl
python bench.py --n 18 --block 512       2>>$LOGS/msm18b512.err | tee -a $LOGS/results.jsonl
echo DONE2
