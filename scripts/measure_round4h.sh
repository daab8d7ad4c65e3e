#!/bin/bash
# Round-4 wave 7: hoisted batched sort A/B (run sequentially on an IDLE
# host; never kill mid-run — a killed TPU client wedges the tunnel ~2h).
set -x
cd "$(dirname "$0")/.."
mkdir -p /tmp/bench_logs
# 1. today's reference point on the unchanged default path (warm cache
#    expected: the refactor is trace-identical for the default flags)
python bench.py 2>>/tmp/bench_logs/r4h_base20.err | tee -a /tmp/bench_logs/r4h.jsonl
# 2. hoisted batched sort at the 2^20 headline (cold compile ~200 s)
ZIKKURAT_HOISTED_SORT=1 python bench.py --n 20 2>>/tmp/bench_logs/r4h_hs20.err | tee -a /tmp/bench_logs/r4h.jsonl
# 3. hoisted at 2^18 (different wc regime: wc=8, nchunks=3)
ZIKKURAT_HOISTED_SORT=1 python bench.py --n 18 2>>/tmp/bench_logs/r4h_hs18.err | tee -a /tmp/bench_logs/r4h.jsonl
# 4. hoisted G2 at 2^16
ZIKKURAT_HOISTED_SORT=1 python bench.py --n 16 --group g2 2>>/tmp/bench_logs/r4h_hsg2.err | tee -a /tmp/bench_logs/r4h.jsonl
echo R4H_DONE
