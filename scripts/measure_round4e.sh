#!/bin/bash
# Round-4 wave 4: refresh every BASELINE workload on the new toolchain.
set -x
cd "$(dirname "$0")/.."
export ZIKKURAT_BENCH_BUDGET=100000
LOGS=/tmp/bench_logs_r4e
mkdir -p $LOGS
python bench.py --n 18                   2>$LOGS/msm18.err    | tee -a $LOGS/results.jsonl
python bench.py --group g2 --n 16        2>$LOGS/msm_g2.err   | tee -a $LOGS/results.jsonl
python bench.py --workload ntt --n 20    2>$LOGS/ntt20.err    | tee -a $LOGS/results.jsonl
python bench.py --workload ntt --n 22    2>$LOGS/ntt22.err    | tee -a $LOGS/results.jsonl
python bench.py --workload pairing --n 10 2>$LOGS/pairing.err | tee -a $LOGS/results.jsonl
python bench.py --workload kzg --n 12    2>$LOGS/kzg.err      | tee -a $LOGS/results.jsonl
python bench.py --workload fieldmul --n 20 2>$LOGS/fieldmul.err | tee -a $LOGS/results.jsonl
echo DONE_R4E
