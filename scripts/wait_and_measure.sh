#!/bin/bash
# Probe the TPU until the tunneled session recovers, then run the final
# round-1 measurement set.  Probes are short-lived python processes that
# exit on their own (never killed mid-device-call: a probe that hangs is
# abandoned via timeout AFTER it returns from... probes use a tiny op and
# are allowed to be killed only because a wedged session ignores them
# anyway - the wedge pre-exists).
cd "$(dirname "$0")/.."
mkdir -p /tmp/bench_logs
for i in $(seq 1 60); do
  if timeout 60 python -c "
import jax, numpy as np, jax.numpy as jnp
np.asarray(jnp.arange(2)+1)
print('OK')" 2>/dev/null | grep -q OK; then
    echo "TPU recovered after $i probes" >> /tmp/bench_logs/final.log
    break
  fi
  sleep 180
done
set -x
{
python bench.py --n 18 --check 6
python bench.py --workload ntt --n 20
python bench.py --workload ntt --n 22
python bench.py --workload kzg --n 12
python bench.py --curve BN128 --n 16
} >> /tmp/bench_logs/final_results.jsonl 2>>/tmp/bench_logs/final.log
echo FINAL_DONE >> /tmp/bench_logs/final.log
