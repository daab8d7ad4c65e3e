#!/bin/bash
# Round-5 wave 1 — run sequentially on an IDLE host; never kill mid-run
# (a killed TPU client wedges the tunneled session ~2h).
set -x
cd "$(dirname "$0")/.."
mkdir -p /tmp/bench_logs
# 1. today's reference point, default path (compile-cache warmth check)
python bench.py 2>>/tmp/bench_logs/r5_base20.err | tee -a /tmp/bench_logs/r5.jsonl
# 2. hoisted batched sort at the 2^20 headline — the gate fix makes a
#    forced flag either take effect or WARN (ADVICE round-4 closure)
ZIKKURAT_HOISTED_SORT=1 python bench.py 2>>/tmp/bench_logs/r5_hs20.err | tee -a /tmp/bench_logs/r5.jsonl
# 3. hoisted at 2^18 (wc=8, nchunks=3 regime)
ZIKKURAT_HOISTED_SORT=1 python bench.py --n 18 2>>/tmp/bench_logs/r5_hs18.err | tee -a /tmp/bench_logs/r5.jsonl
# 4. unstable+iota split sort at 2^20 (stable-vs-iota re-sweep on the
#    2026-08 toolchain; round-3 default flip was measured on the old one)
ZIKKURAT_STABLE_SORT=0 python bench.py 2>>/tmp/bench_logs/r5_us20.err | tee -a /tmp/bench_logs/r5.jsonl
# 5. hoisted G2 at 2^16
ZIKKURAT_HOISTED_SORT=1 python bench.py --n 16 --group g2 2>>/tmp/bench_logs/r5_hsg2.err | tee -a /tmp/bench_logs/r5.jsonl
echo R5_WAVE1_DONE
