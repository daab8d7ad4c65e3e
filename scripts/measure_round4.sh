#!/bin/bash
# Round-4 wave 1: stage profile at the headline shape + the hoisted-wsum
# A/B the advisor asked to see measured (ADVICE.md) + c sweep under the
# hoisted default.  Sequential; NEVER kill mid-run (CLAUDE.md hazard).
set -x
cd "$(dirname "$0")/.."
export ZIKKURAT_BENCH_BUDGET=100000
LOGS=/tmp/bench_logs_r4
mkdir -p $LOGS
python scripts/profile_msm4.py 20                    2>$LOGS/a_prof20.err | tee $LOGS/a_prof20.out
python bench.py                                      2>$LOGS/a_msm20_hoist.err | tee -a $LOGS/results.jsonl
ZIKKURAT_HOISTED_WSUM=0 python bench.py              2>$LOGS/a_msm20_legacy.err | tee -a $LOGS/results.jsonl
python bench.py --c 16                               2>$LOGS/a_msm20_c16.err | tee -a $LOGS/results.jsonl
echo DONE_R4A
