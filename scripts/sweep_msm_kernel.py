#!/usr/bin/env python
"""Sweep tile/unroll of the MSM level-1 Pallas kernel on hardware.

Times block_madd_scan ALONE (one jit, fixed inputs, host-fetch barrier)
at the 2^18-chunk shape: m=128, B = wc * nblk = 8 * 2048 = 16384.
Usage: python scripts/sweep_msm_kernel.py [log2n] [wc]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import numpy as np
import jax.numpy as jnp

from zikkurat_algebra_tpu.utils.cache import setup_cache

setup_cache(jax)

from zikkurat_algebra_tpu import params as P
from zikkurat_algebra_tpu.ops.field import get_field
from zikkurat_algebra_tpu.ops.pallas_curve import (
    block_madd_scan, NEW_BIT,
)


def main():
    log2n = int(sys.argv[1]) if len(sys.argv) > 1 else 18
    wc = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    m = 128
    B = wc * ((1 << log2n) // m)

    f = get_field(P.BLS12_381.fp)
    key = jax.random.PRNGKey(0)

    def pack(planes):                        # (L, m, B) -> (m, Lp, B)
        if planes.shape[0] % 2:
            planes = jnp.concatenate(
                [planes,
                 jnp.zeros((1,) + planes.shape[1:], planes.dtype)], 0)
        half = planes.shape[0] // 2
        return jnp.moveaxis(planes[:half] | (planes[half:] << 15), 1, 0)

    px = pack(f.norm(f.rnd(key, (m, B))))
    py = pack(f.norm(f.rnd(jax.random.PRNGKey(1), (m, B))))
    rng = np.random.default_rng(2)
    flg = jnp.asarray(
        np.where(rng.integers(0, 16, (m, B)) == 0, NEW_BIT, 0)
        .astype(np.int32)
    )
    flg = flg.at[0].set(NEW_BIT)

    print(f"m={m} B={B} L={f.L}", flush=True)
    for tile in (256, 512, 1024):
        for unroll in (1, 2, 4, 8):
            fn = jax.jit(
                lambda px, py, flg: block_madd_scan(
                    px, py, flg, f.L, f.p_np, f.pinv15, 12, f.one_np,
                    tile=tile, unroll=unroll,
                )
            )
            try:
                X, Y, Z = fn(px, py, flg)
                np.asarray(X[:, 0, :4])
                t0 = time.time()
                iters = 3
                for _ in range(iters):
                    X, Y, Z = fn(px, py, flg)
                    np.asarray(X[:, 0, :4])
                per = (time.time() - t0) / iters
                madds = m * B
                print(f"tile={tile:5d} unroll={unroll}: {per*1e3:7.1f} ms "
                      f"({madds/per/1e6:.1f} M madd/s)", flush=True)
            except Exception as e:
                print(f"tile={tile:5d} unroll={unroll}: FAILED "
                      f"{type(e).__name__}: {str(e)[:120]}", flush=True)


if __name__ == "__main__":
    main()
