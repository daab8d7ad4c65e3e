#!/usr/bin/env python
"""Bucket-scatter strategy A/B (in the real scan-over-chunks context).

The wave-3 decomposition at 2^20: sorts 1385 ms, raw kernel 605 ms,
scatter+level2+corr 572 ms, tail 280 ms.  The scatter processes n
updates per chunk of which ~98% land in the dump slot.  Variants:

  S1: current — .at[rows, idx].set, dump slot = nbuckets
  S2: dump via OOB index + mode='drop' (dropped updates need no write)
  S3: searchsorted-gather — relayout running values to (L, wc, n),
      bucket[b] = running[last position of b] via take_along_axis
      (B gathers instead of n scatters)

Usage: python scripts/profile_msm4d.py [log2n]
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
    nblk = n // block
    B = wc * nblk

    def digits_of(k):
        d = M.signed_digits(M.digits_from_limbs(k, c, nbits), c)
        W = d.shape[0]
        nch = -(-W // wc)
        if nch * wc != W:
            d = jnp.concatenate(
                [d, jnp.zeros((nch * wc - W, n), jnp.int32)], 0
            )
        return d.reshape(nch, wc, n)

    def sorts_and_kernel(digit):
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
        px = jnp.stack(srows[:nx])
        py = jnp.stack(srows[nx:])
        d_blk = d_sorted.reshape(wc, nblk, block)

        def stream(rows):
            z = rows.reshape(rows.shape[0], wc, nblk, block)
            return jnp.moveaxis(z, -1, 0).reshape(block, rows.shape[0], B)

        prev = jnp.concatenate([d_blk[..., :1], d_blk[..., :-1]], -1)
        new_seg = (d_blk != prev).at[..., 0].set(True)
        new_m = jnp.moveaxis(new_seg, -1, 0)
        flg = (
            stream(flag_sorted[None])[:, 0]
            | jnp.where(new_m, NEW_BIT, 0).reshape(block, B)
        )
        X, Y, Z = block_madd_scan(
            stream(px), stream(py), flg, f.L, f.p_np, f.pinv15, ops.b3,
            f.one_np, tile=512, unroll=8, interpret=f.pallas_interpret,
        )
        return d_sorted, d_blk, (X, Y, Z)

    def tails_of(d_sorted):
        return jnp.concatenate(
            [d_sorted[..., 1:] != d_sorted[..., :-1],
             jnp.ones((wc, 1), jnp.bool_)], axis=-1
        )

    def s1(digit):
        d_sorted, d_blk, XYZ = sorts_and_kernel(digit)
        C, cidx = M._level2_carries(ops, d_blk, tuple(
            o[..., -1, :].reshape(o.shape[:-2] + (wc, nblk)) for o in XYZ
        ), nbuckets)
        tail = tails_of(d_sorted).reshape(wc, nblk, block)
        tail_s = jnp.moveaxis(tail, -1, 0)
        d_s = jnp.moveaxis(d_blk, -1, 0)
        idx = jnp.where(tail_s, d_s, nbuckets)
        rows = jnp.arange(wc, dtype=jnp.int32)[None, :, None]
        rows2 = jnp.arange(wc, dtype=jnp.int32)[:, None]
        binf = ops.infinity((wc, nbuckets + 1))
        buckets = tuple(
            b.at[..., rows, idx].set(
                o.reshape(o.shape[:-2] + (block, wc, nblk))
            )
            for b, o in zip(binf, XYZ)
        )
        corr = tuple(b.at[..., rows2, cidx].set(s) for b, s in zip(binf, C))
        return tuple(x[..., 1:nbuckets] for x in ops.add(buckets, corr))

    def s2(digit):
        d_sorted, d_blk, XYZ = sorts_and_kernel(digit)
        C, cidx = M._level2_carries(ops, d_blk, tuple(
            o[..., -1, :].reshape(o.shape[:-2] + (wc, nblk)) for o in XYZ
        ), nbuckets)
        tail = tails_of(d_sorted).reshape(wc, nblk, block)
        tail_s = jnp.moveaxis(tail, -1, 0)
        d_s = jnp.moveaxis(d_blk, -1, 0)
        OOB = jnp.int32(1 << 30)
        idx = jnp.where(tail_s, d_s, OOB)
        rows = jnp.arange(wc, dtype=jnp.int32)[None, :, None]
        rows2 = jnp.arange(wc, dtype=jnp.int32)[:, None]
        binf = ops.infinity((wc, nbuckets + 1))
        buckets = tuple(
            b.at[..., rows, idx].set(
                o.reshape(o.shape[:-2] + (block, wc, nblk)),
                mode="drop",
            )
            for b, o in zip(binf, XYZ)
        )
        corr = tuple(b.at[..., rows2, cidx].set(s) for b, s in zip(binf, C))
        return tuple(x[..., 1:nbuckets] for x in ops.add(buckets, corr))

    def s3(digit):
        d_sorted, d_blk, XYZ = sorts_and_kernel(digit)
        C, cidx = M._level2_carries(ops, d_blk, tuple(
            o[..., -1, :].reshape(o.shape[:-2] + (wc, nblk)) for o in XYZ
        ), nbuckets)
        # relayout running values (L, m, wc*nblk) -> (L, wc, n)
        run = tuple(
            jnp.moveaxis(
                o.reshape(o.shape[:-2] + (block, wc, nblk)), -3, -1
            ).reshape(o.shape[:-2] + (wc, n))
            for o in XYZ
        )
        # last position of bucket b = searchsorted_right(d, b) - 1
        bvals = jnp.arange(nbuckets, dtype=jnp.int32)
        pos = jax.vmap(
            lambda row: jnp.searchsorted(row, bvals, side="right")
        )(d_sorted).astype(jnp.int32) - 1          # (wc, nbuckets)
        posc = jnp.maximum(pos, 0)
        present = jnp.logical_and(
            pos >= 0,
            jnp.take_along_axis(d_sorted, posc, axis=-1) == bvals[None],
        )                                           # (wc, nbuckets)
        idxb = jnp.broadcast_to(posc, run[0].shape[:-1] + (nbuckets,))
        vals = tuple(
            jnp.take_along_axis(r, idxb, axis=-1) for r in run
        )
        binf = ops.infinity((wc, nbuckets))
        buckets = ops.select(present, vals, binf)
        rows2 = jnp.arange(wc, dtype=jnp.int32)[:, None]
        binf1 = ops.infinity((wc, nbuckets + 1))
        corr = tuple(b.at[..., rows2, cidx].set(s) for b, s in zip(binf1, C))
        return tuple(
            x[..., 1:nbuckets]
            for x in ops.add(buckets, tuple(cc[..., :nbuckets] for cc in corr))
        )

    for name, stage in (("S1 scatter-set ", s1), ("S2 scatter-drop", s2),
                        ("S3 gather      ", s3)):
        def run(k, stage=stage):
            digits = digits_of(k)

            def per_chunk(_, digit):
                return None, stage(digit)

            _, outs = lax.scan(per_chunk, None, digits)
            return outs

        try:
            secs, _ = timed(jax.jit(run), k, iters=3)
            print(f"{name}: {secs*1e3:6.0f} ms", flush=True)
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:120]}",
                  flush=True)


if __name__ == "__main__":
    main()
