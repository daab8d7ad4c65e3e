#!/bin/bash
# Round-4 wave 2 (post sort-merge fix), idle host, sequential, no kills.
set -x
cd "$(dirname "$0")/.."
export ZIKKURAT_BENCH_BUDGET=100000
LOGS=/tmp/bench_logs_r4b
mkdir -p $LOGS
python bench.py                         2>$LOGS/a_default.err      | tee -a $LOGS/results.jsonl
sleep 30
ZIKKURAT_SORT_SHARD=16 python bench.py  2>$LOGS/b_shard16.err      | tee -a $LOGS/results.jsonl
sleep 30
ZIKKURAT_HOISTED_WSUM=0 python bench.py 2>$LOGS/c_legacy_wsum.err  | tee -a $LOGS/results.jsonl
sleep 30
ZIKKURAT_SORT_SHARD=15 python bench.py  2>$LOGS/d_shard15.err      | tee -a $LOGS/results.jsonl
echo DONE_R4B
