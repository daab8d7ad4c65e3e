#!/bin/bash
# Round-2 third-wave measurement: four-step NTT A/B + variadic-sort MSM.
# Sequential; never kill mid-run (wedges the tunneled TPU for ~2h).
set -x
cd "$(dirname "$0")/.."
mkdir -p /tmp/bench_logs
python scripts/profile_ntt.py 22          2>&1 | tee /tmp/bench_logs/profile_ntt22.log
python bench.py --workload ntt --n 22     2>>/tmp/bench_logs/ntt22.err | tee -a /tmp/bench_logs/results.jsonl
python bench.py --workload ntt --n 20     2>>/tmp/bench_logs/ntt20.err | tee -a /tmp/bench_logs/results.jsonl
python bench.py --n 18                    2>>/tmp/bench_logs/msm18.err | tee -a /tmp/bench_logs/results.jsonl
python bench.py --n 20                    2>>/tmp/bench_logs/msm20.err | tee -a /tmp/bench_logs/results.jsonl
echo DONE
