#!/usr/bin/env python
"""Stage-level MSM profiling on hardware (one jit per stage; the ~28 ms
launch floor is negligible at these sizes).  Usage:
    python scripts/profile_msm.py [log2n] [c] [wc] [block]
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
from zikkurat_algebra_tpu.utils.profiling import timed


def main():
    log2n = int(sys.argv[1]) if len(sys.argv) > 1 else 18
    c = int(sys.argv[2]) if len(sys.argv) > 2 else M.window_size(1 << log2n)
    wc = int(sys.argv[3]) if len(sys.argv) > 3 else max(
        1, min(8, (1 << 21) >> log2n))
    block = int(sys.argv[4]) if len(sys.argv) > 4 else 128

    ck = get_curves(P.BLS12_381)
    fr = ck.fr
    ops = ck.g1
    n = 1 << log2n
    nbuckets = 1 << c
    key = jax.random.PRNGKey(0)
    k = fr.from_mont(fr.rnd(key, (n,)))
    G = ck.encode_g1([ck.oracle_g1.gen] * 256)
    pts = tuple(
        jnp.tile(x, (1,) * (x.ndim - 1) + (n // 256,)) for x in G[:2]
    ) + (jnp.tile(G[2], n // 256),)
    Pp = (ops.f.norm(pts[0]), ops.f.norm(pts[1]))
    inf = pts[2].astype(jnp.int32)

    nbits = fr.p.bit_length()
    digits = M.digits_from_limbs(k, c, nbits)
    W = digits.shape[0]
    print(f"n=2^{log2n} c={c} W={W} wc={wc} block={block}", flush=True)
    dchunk = digits[:wc]

    # packed payload
    packed_rows = []
    for p in Pp:
        flatp = p.reshape(-1, n)
        if flatp.shape[0] % 2:
            flatp = jnp.concatenate(
                [flatp, jnp.zeros((1, n), flatp.dtype)], 0)
        half = flatp.shape[0] // 2
        packed_rows.append(flatp[:half] | (flatp[half:] << 15))
    packed = jnp.concatenate(packed_rows, 0)
    print("payload rows:", packed.shape, flush=True)

    def sort_stage(dg):
        flat = jnp.broadcast_to(packed[:, None, :], (packed.shape[0], wc, n))
        keys = jnp.broadcast_to(dg[None], flat.shape)
        _, sf = lax.sort_key_val(keys, flat, dimension=2)
        return sf, lax.sort(dg, dimension=1)

    secs, (sorted_flat, d_sorted) = timed(jax.jit(sort_stage), dchunk, iters=3)
    print(f"sort+payload ({wc} windows): {secs*1e3:.0f} ms", flush=True)

    # unpack
    def unpack(sf):
        lo = sf & 32767
        hi = (sf >> 15) & 32767
        full = jnp.concatenate([lo, hi], 0)
        L = ops.f.L
        x = full[:L].reshape(L, wc, n)
        y = full[packed_rows[0].shape[0]:packed_rows[0].shape[0] + L].reshape(L, wc, n)
        return x, y

    # blocked segment reduce
    def seg_stage(sf, ds):
        lo = sf & 32767
        hi = (sf >> 15) & 32767
        Ps = []
        off = 0
        for p, pr in zip(Pp, packed_rows):
            rc = pr.shape[0]
            full = jnp.concatenate([lo[off:off + rc], hi[off:off + rc]], 0)
            rows = 1
            for s in p.shape[:-1]:
                rows *= s
            Ps.append(full[:rows].reshape(p.shape[:-1] + (wc, n)))
            off += rc
        aff = (Ps[0], Ps[1], jnp.zeros((wc, n), jnp.bool_))
        return M._segment_reduce_blocked(ops, aff, ds, block, nbuckets)

    secs, seg_out = timed(jax.jit(seg_stage), sorted_flat, d_sorted, iters=3)
    print(f"blocked segreduce: {secs*1e3:.0f} ms", flush=True)
    ys, tail, C, cidx = seg_out

    def bucket_stage(ys, tail, ds, C, cidx):
        rows = jnp.arange(wc, dtype=jnp.int32)[:, None]
        idx = jnp.where(tail, ds, nbuckets)
        binf = ops.infinity((wc, nbuckets + 1))
        buckets = tuple(
            b.at[..., rows, idx].set(s) for b, s in zip(binf, ys))
        corr = tuple(
            b.at[..., rows, cidx].set(s) for b, s in zip(binf, C))
        buckets = ops.add(buckets, corr)
        return tuple(b[..., 1:nbuckets] for b in buckets)

    secs, buckets = timed(jax.jit(bucket_stage), ys, tail, d_sorted, C, cidx,
                          iters=3)
    print(f"bucket scatter+corr: {secs*1e3:.0f} ms", flush=True)

    def weighted_old(buckets):
        suffix = lax.associative_scan(
            lambda A, B: ops.add(A, B), buckets,
            axis=buckets[0].ndim - 1, reverse=True)
        return M._tree_reduce(ops, suffix)

    secs, Wres = timed(jax.jit(weighted_old), buckets, iters=3)
    print(f"suffix+tree ({nbuckets - 1} buckets): {secs*1e3:.0f} ms", flush=True)

    secs, Wres2 = timed(
        jax.jit(lambda b: M._weighted_bucket_sum(ops, b)), buckets, iters=3)
    print(f"two-level weighted sum: {secs*1e3:.0f} ms", flush=True)

    # fused Pallas level-1 bucket pipeline (the default path on hardware)
    if getattr(ops.f, "use_pallas", False) and ops.b3_small:
        sg = (dchunk < 0).astype(jnp.int32)  # unsigned digits here: zeros
        def kernel_stage(sf, ds):
            half = (1 << (c - 1))
            nb2 = half + 1
            buckets = M._buckets_pallas(
                ops, sf[:packed_rows[0].shape[0]],
                sf[packed_rows[0].shape[0]:
                   packed_rows[0].shape[0] + packed_rows[1].shape[0]],
                sf[-1] * 0, jnp.minimum(ds, nb2), block, nb2,
            )
            return M._weighted_bucket_sum(
                ops, tuple(b[..., 1:nb2] for b in buckets))

        flat1 = jnp.broadcast_to(packed[:, None, :],
                                 (packed.shape[0], wc, n))
        flat1 = jnp.concatenate(
            [flat1, jnp.zeros((1, wc, n), jnp.int32)], 0)
        secs, _ = timed(jax.jit(kernel_stage), flat1, d_sorted, iters=3)
        print(f"pallas bucket kernel + weighted sum: {secs*1e3:.0f} ms",
              flush=True)
    print("done", flush=True)


if __name__ == "__main__":
    main()
