#!/bin/bash
# Round-4 wave 1, on an OTHERWISE IDLE host (CLAUDE.md hazard):
#  a) isolated sort timings: sharded vs unsharded (the hypothesis test)
#  b) stage profile at the 2^20 headline shape
#  c) headline bench (warms the default compile cache)
#  d) sharded-sort A/B at 2^20 (shard 2^16 / 2^15)
#  e) hoisted-wsum A/B the advisor asked to see measured (ADVICE.md)
# Sequential; NEVER kill mid-run.
set -x
cd "$(dirname "$0")/.."
export ZIKKURAT_BENCH_BUDGET=100000
LOGS=/tmp/bench_logs_r4
mkdir -p $LOGS
python scripts/sort_shard_experiment.py 20 4          2>$LOGS/a_sortexp.err | tee $LOGS/a_sortexp.out
python scripts/profile_msm4.py 20                     2>$LOGS/b_prof20.err | tee $LOGS/b_prof20.out
python bench.py                                       2>$LOGS/c_msm20_default.err | tee -a $LOGS/results.jsonl
ZIKKURAT_SORT_SHARD=16 python bench.py                2>$LOGS/d_msm20_shard16.err | tee -a $LOGS/results.jsonl
ZIKKURAT_SORT_SHARD=15 python bench.py                2>$LOGS/d_msm20_shard15.err | tee -a $LOGS/results.jsonl
ZIKKURAT_HOISTED_WSUM=0 python bench.py               2>$LOGS/e_msm20_legacy_wsum.err | tee -a $LOGS/results.jsonl
echo DONE_R4A
