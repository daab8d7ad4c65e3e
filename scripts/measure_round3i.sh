#!/bin/bash
# Round-3 wave 9: radix-4 NTT A/B.  Sequential; NEVER kill mid-run.
set -x
cd "$(dirname "$0")/.."
export ZIKKURAT_BENCH_BUDGET=100000
LOGS=/tmp/bench_logs_r3
python bench.py --workload ntt --n 22                        2>>$LOGS/i_ntt22r4.err | tee -a $LOGS/results.jsonl
python bench.py --workload ntt --n 20                        2>>$LOGS/i_ntt20r4.err | tee -a $LOGS/results.jsonl
ZIKKURAT_NTT_RADIX4=0 python bench.py --workload ntt --n 22  2>>$LOGS/i_ntt22r2.err | tee -a $LOGS/results.jsonl
python bench.py --workload kzg --n 12                        2>>$LOGS/i_kzg.err     | tee -a $LOGS/results.jsonl
echo DONE9
