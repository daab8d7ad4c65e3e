#!/usr/bin/env python
"""Standalone timing of the MSM split-sort stage vs a SHARDED variant.

Hypothesis: XLA:TPU's sort is a bitonic network with ~k(k+1)/2 passes
over every operand (k = log2 n), so sorting S independent shards of
n/S elements each costs k'(k'+1)/2 passes (k' = k - log2 S) over the
same total data — 1.5-2x less traffic at the MSM headline shape.  The
MSM only needs digits GROUPED (segments contiguous), not globally
sorted, so shard-local sorting is valid if the bucket scatter targets
per-shard bucket arrays that are then group-added across shards
(~B*log2(S) extra adds per window, ~6% of the level-1 madd work).

Usage: python scripts/sort_shard_experiment.py [log2n] [wc]
Prints ms per (sort of wc windows x 26 rows) for each shard count.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from zikkurat_algebra_tpu.utils.cache import setup_cache

setup_cache(jax)

from zikkurat_algebra_tpu.utils.profiling import timed


def main():
    log2n = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    wc = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    n = 1 << log2n
    NROWS = 24          # BLS12-381 G1: 12 packed rows per coordinate
    GROUP = 13

    rng = np.random.RandomState(0)
    ad = jnp.asarray(rng.randint(0, 1 << 14, size=(wc, n), dtype=np.int32))
    rows = [
        jnp.asarray(rng.randint(-(1 << 31), 1 << 31, size=(wc, n),
                                dtype=np.int64).astype(np.int32))
        for _ in range(NROWS)
    ]

    for shards in (1, 4, 16, 64):
        ns = n // shards

        def split_sorts(ad, rows):
            a = ad.reshape(wc * shards, ns)
            rs = [r.reshape(wc * shards, ns) for r in rows]
            out_rows = []
            for off in range(0, NROWS, GROUP):
                # barrier the key past group 0: XLA otherwise merges the
                # same-key sorts into one 26-operand scoped-VMEM bomb
                key = a if off == 0 else lax.optimization_barrier(a)
                out = lax.sort([key] + rs[off:off + GROUP], dimension=1,
                               num_keys=1, is_stable=True)
                out_rows += list(out[1:])
            return out[0], out_rows

        fn = jax.jit(split_sorts)
        secs, _ = timed(fn, ad, rows, iters=3)
        print(f"shards={shards:3d} (each 2^{log2n - shards.bit_length() + 1}"
              f"): {secs * 1e3:7.1f} ms", flush=True)


if __name__ == "__main__":
    main()
