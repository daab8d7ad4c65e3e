#!/usr/bin/env python
"""Kernel-stage decomposition (in the real scan-over-chunks context):

  B0: sorts + RAW Pallas level-1 kernel (no scatter/level2/corr)
  B:  sorts + kernel + scatter + level2 (the full bucket stage)

plus a tile/unroll sweep of B0 on the current toolchain.
Usage: python scripts/profile_msm4c.py [log2n]
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
from zikkurat_algebra_tpu.ops.pallas_curve import block_madd_scan, NEW_BIT
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

    A = (f.norm(pts[0]), f.norm(pts[1]))
    packed_rows = [pack32(p, cbits).reshape(-1, n) for p in A]
    packed = jnp.concatenate(packed_rows, 0)
    nx = packed_rows[0].shape[0]
    topx = nx - 1
    infi = pts[2].astype(jnp.int32)

    def digits_of(k):
        d = M.signed_digits(M.digits_from_limbs(k, c, nbits), c)
        W = d.shape[0]
        nch = -(-W // wc)
        if nch * wc != W:
            d = jnp.concatenate(
                [d, jnp.zeros((nch * wc - W, n), jnp.int32)], 0
            )
        return d.reshape(nch, wc, n)

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
        flag_clear = jnp.int32(np.int32(np.uint32(
            ((1 << 32) - 1) ^ (3 << flag_shift))))
        flag_sorted = (srows[topx] >> flag_shift) & 3
        srows[topx] = srows[topx] & flag_clear
        return d_sorted, srows, flag_sorted

    def raw_kernel(d_sorted, srows, flag_sorted, tile, unroll):
        px = jnp.stack(srows[:nx])
        py = jnp.stack(srows[nx:])
        L = f.L
        wcs, nn = d_sorted.shape
        nblk = nn // block
        B = wcs * nblk
        d_blk = d_sorted.reshape(wcs, nblk, block)

        def stream(rows):
            z = rows.reshape(rows.shape[0], wcs, nblk, block)
            return jnp.moveaxis(z, -1, 0).reshape(block, rows.shape[0], B)

        prev = jnp.concatenate([d_blk[..., :1], d_blk[..., :-1]], -1)
        new_seg = (d_blk != prev).at[..., 0].set(True)
        new_m = jnp.moveaxis(new_seg, -1, 0)
        flg = (
            stream(flag_sorted[None])[:, 0]
            | jnp.where(new_m, NEW_BIT, 0).reshape(block, B)
        )
        X, Y, Z = block_madd_scan(
            stream(px), stream(py), flg, L, f.p_np, f.pinv15, ops.b3,
            f.one_np, tile=tile, unroll=unroll,
            interpret=f.pallas_interpret,
        )
        return X, Y, Z

    def make_b0(tile, unroll):
        def b0(k):
            digits = digits_of(k)

            def per_chunk(_, digit):
                d_sorted, srows, flag_sorted = sorts_of(digit)
                X, Y, Z = raw_kernel(d_sorted, srows, flag_sorted,
                                     tile, unroll)
                return None, tuple(o[..., -1, ::64] for o in (X, Y, Z))

            _, outs = lax.scan(per_chunk, None, digits)
            return outs
        return b0

    for tile, unroll in ((512, 8), (512, 16), (256, 8), (1024, 8)):
        secs, _ = timed(jax.jit(make_b0(tile, unroll)), k, iters=3)
        print(f"B0 sorts+raw-kernel tile={tile} unroll={unroll}: "
              f"{secs*1e3:6.0f} ms", flush=True)


if __name__ == "__main__":
    main()
