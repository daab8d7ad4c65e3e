#!/bin/bash
# Round-3 third wave: new defaults (split sort ON, wsum auto) across
# sizes/groups + block/c sweeps + big-N attempts.  Sequential; NEVER
# kill mid-run (wedges the tunneled TPU ~2h).
set -x
cd "$(dirname "$0")/.."
export ZIKKURAT_BENCH_BUDGET=100000
LOGS=/tmp/bench_logs_r3
mkdir -p $LOGS
python bench.py --n 18                   2>>$LOGS/c_msm18.err    | tee -a $LOGS/results.jsonl
python bench.py --n 20                   2>>$LOGS/c_msm20.err    | tee -a $LOGS/results.jsonl
python bench.py --n 16 --group g2        2>>$LOGS/c_msm16g2.err  | tee -a $LOGS/results.jsonl
python bench.py --n 18 --block 512       2>>$LOGS/c_msm18b512.err | tee -a $LOGS/results.jsonl
python bench.py --n 18 --c 15            2>>$LOGS/c_msm18c15.err | tee -a $LOGS/results.jsonl
python bench.py --n 21                   2>>$LOGS/c_msm21.err    | tee -a $LOGS/results.jsonl
python bench.py --n 22 --check 4         2>>$LOGS/c_msm22.err    | tee -a $LOGS/results.jsonl
python bench.py --workload kzg --n 12    2>>$LOGS/c_kzg.err      | tee -a $LOGS/results.jsonl
echo DONE3
