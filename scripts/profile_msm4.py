#!/usr/bin/env python
"""Stage-level MSM profile for the ROUND-4 defaults (pack32 payload,
STABLE single-key split sorts with packed sign|inf flags, Pallas bucket
kernel, HOISTED weighted bucket sum).
Usage: python scripts/profile_msm4.py [log2n] [c] [wc] [block]
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
    W = digits.shape[0]
    nchunks = -(-W // wc)
    print(f"n=2^{log2n} c={c} W={W} wc={wc} block={block} "
          f"nchunks={nchunks}", flush=True)
    dchunk = digits[:wc]

    cbits = f.p.bit_length()
    packed_rows = [pack32(p, cbits).reshape(-1, n) for p in A]
    packed = jnp.concatenate(packed_rows, 0)
    nx = packed_rows[0].shape[0]
    print("payload rows:", packed.shape, flush=True)
    flag_shift = cbits - 32 * (nx - 1)
    flag_clear = jnp.int32(np.int32(np.uint32(
        ((1 << 32) - 1) ^ (3 << flag_shift))))
    topx = nx - 1

    def split_sorts(dg):
        # mirrors the default: stable single-key sorts, flags packed into
        # the spare top bits of the last x row, groups of <= 13 rows
        ad = jnp.abs(dg)
        sg = (dg < 0).astype(jnp.int32)
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
            # barrier the key past group 0: XLA otherwise merges the
            # same-key sorts into one 26-operand scoped-VMEM bomb
            key = ad if off == 0 else lax.optimization_barrier(ad)
            out = lax.sort([key] + rows_all[off:off + GROUP],
                           dimension=1, num_keys=1, is_stable=True)
            if d_sorted is None:
                d_sorted = out[0]
            srows += list(out[1:])
        flag_sorted = (srows[topx] >> flag_shift) & 3
        srows[topx] = srows[topx] & flag_clear
        return d_sorted, srows, flag_sorted

    secs, (d_sorted, srows, flag_sorted) = timed(
        jax.jit(split_sorts), dchunk, iters=3)
    print(f"split sorts ({wc} windows): {secs*1e3:.0f} ms", flush=True)

    def kernel_stage(d_sorted, srows, flag_sorted):
        return M._buckets_pallas(
            ops,
            jnp.stack(srows[:nx]),
            jnp.stack(srows[nx:nx + packed_rows[1].shape[0]]),
            flag_sorted, d_sorted, block, nbuckets,
        )

    secs, buckets = timed(
        jax.jit(kernel_stage), d_sorted, srows, flag_sorted, iters=3)
    print(f"bucket kernel + scatter + level2: {secs*1e3:.0f} ms", flush=True)

    # HOISTED weighted sum: ONE wsum over all W windows' bucket planes
    def wsum_stage(buckets):
        b = tuple(
            jnp.broadcast_to(
                x[..., None, :, 1:nbuckets],
                x.shape[:-2] + (nchunks, wc, nbuckets - 1),
            ).reshape(x.shape[:-2] + (nchunks * wc, nbuckets - 1))
            for x in buckets
        )
        return M._weighted_bucket_sum(ops, b)

    secs, Wp = timed(jax.jit(wsum_stage), buckets, iters=3)
    print(f"hoisted weighted bucket sum (all {nchunks*wc} windows): "
          f"{secs*1e3:.0f} ms", flush=True)

    def horner(Wp):
        def combine(res, Wpt):
            def dbl_step(_, r):
                return ops.dbl(r)
            res = lax.fori_loop(0, c, dbl_step, res)
            return ops.add(res, Wpt), None
        res0 = ops.infinity(())
        Ws_scan = tuple(jnp.moveaxis(x, -1, 0) for x in Wp)
        res, _ = lax.scan(combine, res0, Ws_scan)
        return res

    secs, _ = timed(jax.jit(horner), Wp, iters=3)
    print(f"Horner combine ({Wp[0].shape[-1]} windows): {secs*1e3:.0f} ms",
          flush=True)
    print(f"(sort+kernel x {nchunks} chunks; wsum+Horner once)", flush=True)


if __name__ == "__main__":
    main()
