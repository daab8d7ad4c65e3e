#!/bin/bash
# Round-5 wave 2 — sequential, idle host only.
set -x
cd "$(dirname "$0")/.."
mkdir -p /tmp/bench_logs
# 1. default path now = hoisted sort (auto ON): expect ~408k from the
#    wave-1 compiled graph (same HLO as the forced run)
python bench.py 2>>/tmp/bench_logs/r5b_base20.err | tee -a /tmp/bench_logs/r5.jsonl
# 2. G2 2^16 with unified flag resolution (stable sort + packed flags
#    reach G2 for the first time) — cold compile
python bench.py --n 16 --group g2 2>>/tmp/bench_logs/r5b_g2.err | tee -a /tmp/bench_logs/r5.jsonl
# 3. window-chunk 8 under the hoisted sort at 2^20 (the wc=4 cap was
#    derived pre-hoisting; the sort no longer scales with nchunks)
python bench.py --window-chunk 8 2>>/tmp/bench_logs/r5b_wc8.err | tee -a /tmp/bench_logs/r5.jsonl
# 4. NTT 2^22: four-step x Pallas butterfly composition (unmeasured)
ZIKKURAT_NTT_KERNEL=1 python bench.py --workload ntt --n 22 2>>/tmp/bench_logs/r5b_nttk.err | tee -a /tmp/bench_logs/r5.jsonl
# 5. NTT 2^22 default re-confirmation on today's toolchain
python bench.py --workload ntt --n 22 2>>/tmp/bench_logs/r5b_ntt.err | tee -a /tmp/bench_logs/r5.jsonl
echo R5_WAVE2_DONE
