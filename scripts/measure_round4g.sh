#!/bin/bash
# Round-4 wave 6: NTT path composition + confirm new shape-aware defaults.
set -x
cd "$(dirname "$0")/.."
export ZIKKURAT_BENCH_BUDGET=100000
LOGS=/tmp/bench_logs_r4g
mkdir -p $LOGS
ZIKKURAT_NTT_FOURSTEP=16 ZIKKURAT_NTT_KERNEL=1 python bench.py --workload ntt --n 22 2>$LOGS/ntt22_4sk.err | tee -a $LOGS/results.jsonl
ZIKKURAT_NTT_FOURSTEP=16 python bench.py --workload ntt --n 20 2>$LOGS/ntt20_4s.err | tee -a $LOGS/results.jsonl
ZIKKURAT_NTT_KERNEL=1 python bench.py --workload ntt --n 20 2>$LOGS/ntt20_k.err | tee -a $LOGS/results.jsonl
python bench.py --n 18                 2>$LOGS/m18_def.err | tee -a $LOGS/results.jsonl
python bench.py --group g2 --n 16      2>$LOGS/g2_def.err  | tee -a $LOGS/results.jsonl
python bench.py                        2>$LOGS/m20_def.err | tee -a $LOGS/results.jsonl
echo DONE_R4G
