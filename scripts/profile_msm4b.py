#!/usr/bin/env python
"""In-context MSM stage decomposition: times the REAL pipeline with
later stages progressively removed, all inside the same scan-over-chunks
structure as msm_std (isolated per-stage jits measured inconsistently
with end-to-end — XLA schedules the full graph differently).

  A: digits + scan(sorts)                      -> sort floor
  B: digits + scan(sorts + kernel + scatter)   -> + bucket accumulation
  C: full msm_std                              -> + wsum + Horner

Usage: python scripts/profile_msm4b.py [log2n]
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

from zikkurat_algebra_tpu import params as P
from zikkurat_algebra_tpu.ops.field import Field

if jax.devices()[0].platform != "cpu" and not os.environ.get("ZIKKURAT_NO_PALLAS"):
    Field.use_pallas = True
from zikkurat_algebra_tpu.ops.curve import get_curves
from zikkurat_algebra_tpu.ops import msm as M
from zikkurat_algebra_tpu.ops.limbs15 import pack32
from zikkurat_algebra_tpu.utils.profiling import timed


def main():
    log2n = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    n = 1 << log2n
    c = M.window_size(n)
    wc = max(1, min(8, (1 << 22) // n))
    block = 512
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

    nbits = fr.p.bit_length()
    cbits = f.p.bit_length()
    W32 = -(-cbits // 32)
    flag_shift = cbits - 32 * (W32 - 1)

    def digits_of(k):
        d = M.signed_digits(M.digits_from_limbs(k, c, nbits), c)
        W = d.shape[0]
        nch = -(-W // wc)
        if nch * wc != W:
            d = jnp.concatenate(
                [d, jnp.zeros((nch * wc - W, n), jnp.int32)], 0
            )
        return d.reshape(nch, wc, n)

    A = (f.norm(pts[0]), f.norm(pts[1]))
    packed_rows = [pack32(p, cbits).reshape(-1, n) for p in A]
    packed = jnp.concatenate(packed_rows, 0)
    nx = packed_rows[0].shape[0]
    topx = nx - 1
    infi = pts[2].astype(jnp.int32)

    def sorts_of(digit):
        ad = jnp.abs(digit)
        sg = (digit < 0).astype(jnp.int32)
        flagrow = sg | (infi[None] << 1)
        rows_all = [
            (packed[i][None] | (flagrow << flag_shift)) if i == topx
            else jnp.broadcast_to(packed[i], (wc, n))
            for i in range(packed.shape[0])
        ]
        GROUP = 13
        srows = []
        d_sorted = None
        for off in range(0, len(rows_all), GROUP):
            kk = ad if off == 0 else lax.optimization_barrier(ad)
            out = lax.sort([kk] + rows_all[off:off + GROUP],
                           dimension=1, num_keys=1, is_stable=True)
            if d_sorted is None:
                d_sorted = out[0]
            srows += list(out[1:])
        return d_sorted, srows

    def variant_a(k):
        digits = digits_of(k)

        def per_chunk(_, digit):
            d_sorted, srows = sorts_of(digit)
            # cheap consumption that can't be elided but adds no real work
            return None, [r[:, ::4096].sum() for r in [d_sorted] + srows]

        _, outs = lax.scan(per_chunk, None, digits)
        return outs

    def variant_b(k):
        digits = digits_of(k)

        def per_chunk(_, digit):
            d_sorted, srows = sorts_of(digit)
            flag_clear = jnp.int32(np.int32(np.uint32(
                ((1 << 32) - 1) ^ (3 << flag_shift))))
            flag_sorted = (srows[topx] >> flag_shift) & 3
            srows[topx] = srows[topx] & flag_clear
            buckets = M._buckets_pallas(
                ops, jnp.stack(srows[:nx]), jnp.stack(srows[nx:]),
                flag_sorted, d_sorted, block, nbuckets,
            )
            return None, tuple(b[..., 1:nbuckets] for b in buckets)

        _, outs = lax.scan(per_chunk, None, digits)
        return outs

    msm = ck.msm("g1")

    for name, fn in (("A sorts-only  ", jax.jit(variant_a)),
                     ("B sorts+kernel", jax.jit(variant_b))):
        secs, _ = timed(fn, k, iters=3)
        print(f"{name}: {secs*1e3:6.0f} ms", flush=True)
    secs, _ = timed(
        lambda kk: msm.msm_std(kk, pts, None, None, block), k, iters=3
    )
    print(f"C full msm_std: {secs*1e3:6.0f} ms", flush=True)


if __name__ == "__main__":
    main()
