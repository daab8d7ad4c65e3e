#!/usr/bin/env python
"""MSM sort-formulation A/B on hardware.

The MSM profile has XLA's sort at ~53% of end-to-end time at 2^18.  The
current formulation broadcasts the key across all payload rows and calls
sort_key_val on (R, wc, n) 3D arrays (each row pair is an independent
stable sort — consistent permutations via stability), plus ONE extra
key-only sort for d_sorted.  Alternatives measured here:

  A. status quo: sort_key_val((R,wc,n) bcast keys, (R,wc,n) payload)
     + lax.sort(ad)
  B. ONE variadic lax.sort with num_keys=1: operands = [key, row0..rowR]
     each (wc, n) — comparator reads only the key operand.
  C. B with fewer payload rows (what a radix-2^32 repack would buy).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
from zikkurat_algebra_tpu.utils.cache import setup_cache
setup_cache(jax)
import jax.numpy as jnp
import numpy as np
from jax import lax


def timeit(fn, *args, iters=5):
    out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0])[:1]
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
        np.asarray(jax.tree_util.tree_leaves(out)[-1])[:1]
    return (time.time() - t0) / iters


def main():
    wc, logn, R = 8, 18, 27
    n = 1 << logn
    rng = np.random.RandomState(0)
    ad = jnp.asarray(rng.randint(0, 1 << 13, size=(wc, n), dtype=np.int32))
    payload = jnp.asarray(
        rng.randint(0, 1 << 30, size=(R, wc, n), dtype=np.int32)
    )

    @jax.jit
    def sort_a(ad, payload):
        keys = jnp.broadcast_to(ad[None], payload.shape)
        _, sp = lax.sort_key_val(keys, payload, dimension=2)
        ds = lax.sort(ad, dimension=1)
        return ds, sp

    @jax.jit
    def sort_b(ad, payload):
        ops = [ad] + [payload[i] for i in range(payload.shape[0])]
        out = lax.sort(ops, dimension=1, num_keys=1, is_stable=True)
        return out[0], jnp.stack(out[1:])

    @jax.jit
    def sort_b_nostack(ad, payload):
        ops = [ad] + [payload[i] for i in range(payload.shape[0])]
        out = lax.sort(ops, dimension=1, num_keys=1, is_stable=True)
        return out

    ta = timeit(sort_a, ad, payload)
    tb = timeit(sort_b, ad, payload)
    tbn = timeit(sort_b_nostack, ad, payload)
    print(f"A  sort_key_val bcast ({R} rows): {ta*1e3:8.1f} ms")
    print(f"B  variadic num_keys=1 + stack  : {tb*1e3:8.1f} ms")
    print(f"B' variadic no restack          : {tbn*1e3:8.1f} ms")

    # correctness: same permutation?
    da, pa = sort_a(ad, payload)
    db, pb = sort_b(ad, payload)
    ok = bool(jnp.all(da == db)) and bool(jnp.all(pa == pb))
    print("match:", ok)

    for R2 in (25, 14):
        p2 = payload[:R2]

        @jax.jit
        def sort_c(ad, p2):
            ops = [ad] + [p2[i] for i in range(R2)]
            return lax.sort(ops, dimension=1, num_keys=1, is_stable=True)

        tc = timeit(sort_c, ad, p2)
        print(f"C  variadic {R2:2d} rows             : {tc*1e3:8.1f} ms")


if __name__ == "__main__":
    main()
