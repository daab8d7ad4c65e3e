#!/bin/bash
# Round-4 wave 5: untangle toolchain regressions from new defaults.
set -x
cd "$(dirname "$0")/.."
export ZIKKURAT_BENCH_BUDGET=100000
LOGS=/tmp/bench_logs_r4f
mkdir -p $LOGS
ZIKKURAT_GATHER_BUCKETS=pos python bench.py --n 18 2>$LOGS/m18_pos.err | tee -a $LOGS/results.jsonl
ZIKKURAT_GATHER_BUCKETS=0 python bench.py --n 18   2>$LOGS/m18_scat.err | tee -a $LOGS/results.jsonl
ZIKKURAT_MSM_UNROLL=8 python bench.py --n 18       2>$LOGS/m18_u8.err  | tee -a $LOGS/results.jsonl
ZIKKURAT_GATHER_BUCKETS=0 python bench.py --group g2 --n 16 2>$LOGS/g2_scat.err | tee -a $LOGS/results.jsonl
ZIKKURAT_NTT_KERNEL=1 python bench.py --workload ntt --n 22 2>$LOGS/ntt_k.err | tee -a $LOGS/results.jsonl
ZIKKURAT_NTT_RADIX4=1 python bench.py --workload ntt --n 22 2>$LOGS/ntt_r4.err | tee -a $LOGS/results.jsonl
ZIKKURAT_NTT_FOURSTEP=16 python bench.py --workload ntt --n 22 2>$LOGS/ntt_4s.err | tee -a $LOGS/results.jsonl
ZIKKURAT_GATHER_BUCKETS=pos python bench.py        2>$LOGS/m20_pos.err | tee -a $LOGS/results.jsonl
echo DONE_R4F
