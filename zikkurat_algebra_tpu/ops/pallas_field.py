"""Pallas TPU kernels for the field hot path.

The XLA formulation runs CIOS as a lax.scan (a `while` op with L trips);
that is compile-friendly but pays loop overhead and blocks cross-limb
instruction scheduling.  Here the ENTIRE limb loop is unrolled inside one
Mosaic kernel: every limb row is a separate (1, T) tile, so the kernel
body is straight-line vector code with all index bookkeeping done at
trace time — the TPU analog of the reference's fully-unrolled generated C
(bigint256.c / *_mont.c).

Used via `field.use_pallas = True` (opt-in until benchmarked everywhere);
`interpret=True` makes the same kernel runnable on CPU for tests.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import limbs15 as rl

I32 = jnp.int32
LB = rl.LB
MASK = rl.MASK


def _mont_mul_kernel(L: int, pinv15: int, a_ref, b_ref, p_ref, o_ref):
    # per-limb rows as separate arrays: fully unrolled CIOS
    a = [a_ref[i, :] for i in range(L)]
    b = [b_ref[i, :] for i in range(L)]
    p = [p_ref[i, :] for i in range(L)]       # broadcast rows (T,)
    T = a[0].shape

    acc = [jnp.zeros(T, I32) for _ in range(L + 1)]
    carry = jnp.zeros(T, I32)
    pinv = jnp.int32(pinv15)

    for j in range(L):
        bj = b[j]
        pa = [ai * bj for ai in a]            # exact int32 products
        c0 = acc[0] + carry + (pa[0] & MASK)
        m = ((c0 & MASK) * pinv) & MASK
        mp = [pi * m for pi in p]
        carry = (c0 + (mp[0] & MASK)) >> LB
        # cols 1..L accumulate the remaining halves, then shift down
        nxt = [None] * (L + 1)
        for k in range(1, L + 1):
            v = acc[k]
            if k < L:
                v = v + (pa[k] & MASK) + (mp[k] & MASK)
            v = v + (pa[k - 1] >> LB) + (mp[k - 1] >> LB)
            nxt[k - 1] = v
        nxt[L] = jnp.zeros(T, I32)
        acc = nxt

    # fold the threaded carry back, + p, then full carry propagation
    # (unrolled) — canonical band output
    acc[0] = acc[0] + carry
    for k in range(L):
        acc[k] = acc[k] + p[k]
    c = jnp.zeros(T, I32)
    for k in range(L):
        t = acc[k] + c
        o_ref[k, :] = t & MASK
        c = t >> LB
    # top column provably zero (value < 3.2p << 2^(15L))


@functools.lru_cache(maxsize=None)
def _build_mont_mul(L: int, pinv15: int, n: int, tile: int, interpret: bool):
    kernel = functools.partial(_mont_mul_kernel, L, pinv15)
    grid = (n // tile,)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((L, n), I32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((L, tile), lambda i: (0, i), memory_space=pltpu.ANY
                         if False else pltpu.VMEM),
            pl.BlockSpec((L, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((L, tile), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((L, tile), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )


def mont_mul_pallas(a: jax.Array, b: jax.Array, p_np, pinv15: int,
                    tile: int = 512, interpret: bool = False) -> jax.Array:
    """Drop-in for rl.mont_mul on 2-D (L, N) operands with N % tile == 0.
    Falls back to the XLA scan for other shapes."""
    L = a.shape[0]
    if a.ndim != 2 or a.shape[1] % tile or a.shape != b.shape:
        p = jnp.asarray(p_np).reshape((L,) + (1,) * (a.ndim - 1))
        return rl.mont_mul(a, b, p, pinv15)
    n = a.shape[1]
    pb = jnp.broadcast_to(jnp.asarray(p_np)[:, None], (L, tile))
    call = _build_mont_mul(L, pinv15, n, tile, interpret)
    return call(a, b, pb)
