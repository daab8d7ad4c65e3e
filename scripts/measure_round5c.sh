#!/bin/bash
# Round-5 wave 3 — sequential, idle host only.  BUDGET RAISED so each
# step WAITS for its own cold compile instead of orphaning the child
# into the next step's timing window (the wave-2 G2 lesson).
set -x
cd "$(dirname "$0")/.."
mkdir -p /tmp/bench_logs
export ZIKKURAT_BENCH_BUDGET=2400
# 1. G2 2^16 on the restored round-3/4 graph (fp2-aware autos)
python bench.py --n 16 --group g2 2>>/tmp/bench_logs/r5c_g2.err | tee -a /tmp/bench_logs/r5.jsonl
# 2. G1 2^16 with the hoisted sort (BASELINE config 3 shape, BLS)
python bench.py --n 16 2>>/tmp/bench_logs/r5c_g116.err | tee -a /tmp/bench_logs/r5.jsonl
# 3. BN128 G1 2^16 (BASELINE config 3 proper)
python bench.py --n 16 --curve BN128 2>>/tmp/bench_logs/r5c_bn.err | tee -a /tmp/bench_logs/r5.jsonl
# 4. G1 2^18 default re-confirmation (hoisted auto)
python bench.py --n 18 2>>/tmp/bench_logs/r5c_g118.err | tee -a /tmp/bench_logs/r5.jsonl
# 5. KZG 2^12 and pairing re-confirmation on today's toolchain
python bench.py --workload kzg --n 12 2>>/tmp/bench_logs/r5c_kzg.err | tee -a /tmp/bench_logs/r5.jsonl
python bench.py --workload pairing --n 10 2>>/tmp/bench_logs/r5c_pair.err | tee -a /tmp/bench_logs/r5.jsonl
# 6. NTT 2^20 default re-confirmation
python bench.py --workload ntt --n 20 2>>/tmp/bench_logs/r5c_ntt20.err | tee -a /tmp/bench_logs/r5.jsonl
# 7. field-mul sustained re-confirmation
python bench.py --workload fieldmul --n 20 2>>/tmp/bench_logs/r5c_fm.err | tee -a /tmp/bench_logs/r5.jsonl
echo R5_WAVE3_DONE
