#!/bin/bash
# Full TPU measurement chain — run sequentially, never kill mid-run
# (killing a client wedges the tunneled session for ~2h).
set -x
cd "$(dirname "$0")/.."
mkdir -p /tmp/bench_logs
python bench.py --workload fieldmul --n 20 2>>/tmp/bench_logs/fieldmul.err | tee -a /tmp/bench_logs/results.jsonl
python bench.py --n 16 --check 6     2>>/tmp/bench_logs/msm16.err    | tee -a /tmp/bench_logs/results.jsonl
python bench.py --n 18               2>>/tmp/bench_logs/msm18.err    | tee -a /tmp/bench_logs/results.jsonl
python bench.py --n 20               2>>/tmp/bench_logs/msm20.err    | tee -a /tmp/bench_logs/results.jsonl
python bench.py --workload ntt --n 20 2>>/tmp/bench_logs/ntt20.err   | tee -a /tmp/bench_logs/results.jsonl
python bench.py --workload ntt --n 22 2>>/tmp/bench_logs/ntt22.err   | tee -a /tmp/bench_logs/results.jsonl
python bench.py --workload kzg --n 12 2>>/tmp/bench_logs/kzg.err     | tee -a /tmp/bench_logs/results.jsonl
python bench.py --workload pairing --n 6 2>>/tmp/bench_logs/pairing.err | tee -a /tmp/bench_logs/results.jsonl
echo DONE
