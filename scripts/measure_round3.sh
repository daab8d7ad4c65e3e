#!/bin/bash
# Round-3 measurement chain — sequential, NEVER kill mid-run (killing a
# TPU client, even during compile, wedges the tunneled session ~2h).
# Run with the host otherwise idle; timings use honest host fetches.
set -x
cd "$(dirname "$0")/.."
export ZIKKURAT_BENCH_BUDGET=100000     # no CPU fallback during measurement
LOGS=/tmp/bench_logs_r3
mkdir -p $LOGS
python bench.py --n 18                  2>>$LOGS/msm18.err   | tee -a $LOGS/results.jsonl
python bench.py --workload ntt --n 22   2>>$LOGS/ntt22.err   | tee -a $LOGS/results.jsonl
python bench.py --workload ntt --n 20   2>>$LOGS/ntt20.err   | tee -a $LOGS/results.jsonl
python bench.py --n 20                  2>>$LOGS/msm20.err   | tee -a $LOGS/results.jsonl
python bench.py --workload fieldmul --n 20 2>>$LOGS/fieldmul.err | tee -a $LOGS/results.jsonl
python bench.py --workload pairing --n 6   2>>$LOGS/pairing.err  | tee -a $LOGS/results.jsonl
python bench.py --workload kzg --n 12      2>>$LOGS/kzg.err      | tee -a $LOGS/results.jsonl
python bench.py --n 16 --group g2          2>>$LOGS/msm16g2.err  | tee -a $LOGS/results.jsonl
echo DONE
