#!/bin/bash
# Round-3 fourth wave: kernel unroll sweep, 2^20 window-chunk gamble,
# pairing batch scaling, virtual-mesh scaling.  Sequential; NEVER kill
# mid-run (wedges the tunneled TPU ~2h).
set -x
cd "$(dirname "$0")/.."
export ZIKKURAT_BENCH_BUDGET=100000
LOGS=/tmp/bench_logs_r3
mkdir -p $LOGS
python bench.py --n 20                    2>>$LOGS/d_msm20b512.err | tee -a $LOGS/results.jsonl
python bench.py --n 16 --group g2         2>>$LOGS/d_msm16g2a.err  | tee -a $LOGS/results.jsonl
ZIKKURAT_MSM_UNROLL=16 python bench.py --n 18 \
                                          2>>$LOGS/d_msm18u16.err | tee -a $LOGS/results.jsonl
ZIKKURAT_MSM_UNROLL=32 python bench.py --n 18 \
                                          2>>$LOGS/d_msm18u32.err | tee -a $LOGS/results.jsonl
python bench.py --n 20 --window-chunk 8   2>>$LOGS/d_msm20wc8.err | tee -a $LOGS/results.jsonl
python bench.py --workload pairing --n 8  2>>$LOGS/d_pair256.err  | tee -a $LOGS/results.jsonl
python bench.py --workload pairing --n 10 2>>$LOGS/d_pair1024.err | tee -a $LOGS/results.jsonl
python bench.py --workload scaling --cpu  2>>$LOGS/d_scaling.err  | tee -a $LOGS/results.jsonl
echo DONE4
