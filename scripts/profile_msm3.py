#!/usr/bin/env python
"""Stage-level MSM profile for the ROUND-3 defaults (pack32 payload,
two split variadic sorts, Pallas bucket kernel, serial weighted sum).
Usage: python scripts/profile_msm3.py [log2n] [c] [wc] [block]
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import time
import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from zikkurat_algebra_tpu.utils.cache import setup_cache

setup_cache(jax)

from zikkurat_algebra_tpu import params as P
from zikkurat_algebra_tpu.ops.field import Field

if jax.devices()[0].platform != "cpu" and not os.environ.get("ZIKKURAT_NO_PALLAS"):
    Field.use_pallas = True
from zikkurat_algebra_tpu.ops.curve import get_curves
from zikkurat_algebra_tpu.ops import msm as M
from zikkurat_algebra_tpu.ops.limbs15 import pack32
from zikkurat_algebra_tpu.utils.profiling import timed


def main():
    log2n = int(sys.argv[1]) if len(sys.argv) > 1 else 18
    n = 1 << log2n
    c = int(sys.argv[2]) if len(sys.argv) > 2 else M.window_size(n)
    wc = int(sys.argv[3]) if len(sys.argv) > 3 else max(
        1, min(8, (1 << 22) // n))
    block = int(sys.argv[4]) if len(sys.argv) > 4 else 512
    nbuckets = (1 << (c - 1)) + 1

    ck = get_curves(P.BLS12_381)
    fr = ck.fr
    ops = ck.g1
    f = ops.f
    key = jax.random.PRNGKey(0)
    k = fr.from_mont(fr.rnd(key, (n,)))
    G = ck.encode_g1([ck.oracle_g1.gen] * 256)
    pts = tuple(
        jnp.tile(x, (1,) * (x.ndim - 1) + (n // 256,)) for x in G[:2]
    ) + (jnp.tile(G[2], n // 256),)
    A = (f.norm(pts[0]), f.norm(pts[1]))
    infi = pts[2].astype(jnp.int32)

    nbits = fr.p.bit_length()
    digits = M.signed_digits(M.digits_from_limbs(k, c, nbits), c)
    print(f"n=2^{log2n} c={c} W={digits.shape[0]} wc={wc} block={block}",
          flush=True)
    dchunk = digits[:wc]

    cbits = f.p.bit_length()
    packed_rows = [pack32(p, cbits).reshape(-1, n) for p in A]
    packed = jnp.concatenate(packed_rows, 0)
    nx = packed_rows[0].shape[0]
    print("payload rows:", packed.shape, flush=True)

    def split_sorts(dg):
        ad = jnp.abs(dg)
        sg = (dg < 0).astype(jnp.int32)
        flagrow = sg | (infi[None] << 1)
        iota = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32)[None], (wc, n))
        out1 = lax.sort(
            [ad, iota]
            + [jnp.broadcast_to(packed[i], (wc, n)) for i in range(nx)]
            + [flagrow], dimension=1, num_keys=2)
        out2 = lax.sort(
            [ad, iota]
            + [jnp.broadcast_to(packed[i], (wc, n))
               for i in range(nx, packed.shape[0])], dimension=1, num_keys=2)
        return out1[0], list(out1[2:-1]) + list(out2[2:]) + [out1[-1]]

    secs, (d_sorted, srows) = timed(jax.jit(split_sorts), dchunk, iters=3)
    print(f"split sorts ({wc} windows): {secs*1e3:.0f} ms", flush=True)

    def kernel_stage(d_sorted, srows):
        return M._buckets_pallas(
            ops,
            jnp.stack(srows[:nx]),
            jnp.stack(srows[nx:nx + packed_rows[1].shape[0]]),
            srows[-1], d_sorted, block, nbuckets,
        )

    secs, buckets = timed(jax.jit(kernel_stage), d_sorted, srows, iters=3)
    print(f"bucket kernel + scatter + level2: {secs*1e3:.0f} ms", flush=True)

    def wsum_stage(buckets):
        b = tuple(x[..., 1:nbuckets] for x in buckets)
        return M._weighted_bucket_sum(ops, b)

    secs, Wp = timed(jax.jit(wsum_stage), buckets, iters=3)
    print(f"weighted bucket sum: {secs*1e3:.0f} ms", flush=True)

    nchunks = -(-digits.shape[0] // wc)
    print(f"(x {nchunks} chunks + Horner)", flush=True)


if __name__ == "__main__":
    main()
