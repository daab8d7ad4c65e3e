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


def _cios(L: int, pinv15: int, a, b, p):
    """Straight-line CIOS Montgomery product on (L, T) int32 tiles —
    the shared body of every field Pallas kernel.  Every step is
    (L, T)-shaped vector work so the limb axis PACKS THE SUBLANES (vs
    1-row ops wasting 7/8 of each vreg); the column shift-down is a
    static slice + pad.  Returns canonical nonneg limbs (value < 3.2p,
    exactly rl.mont_mul's contract)."""
    T = a.shape[1]
    pinv = jnp.int32(pinv15)

    zrow = jnp.zeros((1, T), I32)
    acc = jnp.zeros((L + 1, T), I32)
    carry = jnp.zeros((1, T), I32)

    for j in range(L):
        bj = b[j:j + 1, :]                     # (1, T)
        pa = a * bj                            # exact int32 products (L, T)
        pa_lo = pa & MASK
        pa_hi = pa >> LB
        c0 = acc[0:1] + carry + pa_lo[0:1]
        m = ((c0 & MASK) * pinv) & MASK
        mp = p * m                             # (L, T)
        mp_lo = mp & MASK
        mp_hi = mp >> LB
        carry = (c0 + mp_lo[0:1]) >> LB
        upper = (
            acc[1:]
            + jnp.concatenate([pa_lo[1:], zrow], 0)
            + pa_hi
            + jnp.concatenate([mp_lo[1:], zrow], 0)
            + mp_hi
        )
        acc = jnp.concatenate([upper, zrow], 0)

    # fold the carry back, + p, then the (inherently serial) full carry
    # (concat-built: .at[].add lowers to scatter-add, unsupported here)
    acc = jnp.concatenate([acc[0:1] + carry, acc[1:]], 0)
    acc = acc + jnp.concatenate([p, zrow], 0)
    c = jnp.zeros((1, T), I32)
    rows = []
    for k in range(L):
        t = acc[k:k + 1] + c
        rows.append(t & MASK)
        c = t >> LB
    return jnp.concatenate(rows, 0)
    # top column provably zero (value < 3.2p << 2^(15L))


def _partial_carry(x):
    """One scan-free partial-carry pass (rl.partial_carry semantics):
    top limb left unsplit to absorb the sign."""
    T = x.shape[1]
    lo = x & MASK
    hi = x >> LB
    shifted = jnp.concatenate([jnp.zeros((1, T), I32), hi[:-1]], 0)
    return jnp.concatenate([lo[:-1], x[-1:]], 0) + shifted


def _mont_mul_kernel(L: int, pinv15: int, a_ref, b_ref, p_ref, o_ref):
    o_ref[:, :] = _cios(L, pinv15, a_ref[:, :], b_ref[:, :], p_ref[:, :])


@functools.lru_cache(maxsize=None)
def _build_mont_mul(L: int, pinv15: int, n: int, tile: int, interpret: bool):
    kernel = functools.partial(_mont_mul_kernel, L, pinv15)
    grid = (n // tile,)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((L, n), I32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((L, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((L, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((L, tile), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((L, tile), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )


def _butterfly_kernel(L: int, pinv15: int, u_ref, v_ref, tw_ref, p_ref,
                      hi_ref, lo_ref):
    """Fused NTT butterfly: t = v*tw (CIOS), hi = u+t, lo = u-t with one
    partial-carry pass each — the whole stage body in ONE kernel (the
    XLA formulation pays 3 separate HBM round trips; cf. the reference's
    in-place butterfly, bn128_poly_mont.c:444-449)."""
    u = u_ref[:, :]
    t = _cios(L, pinv15, v_ref[:, :], tw_ref[:, :], p_ref[:, :])
    hi_ref[:, :] = _partial_carry(u + t)
    lo_ref[:, :] = _partial_carry(u - t)


@functools.lru_cache(maxsize=None)
def _build_butterfly(L: int, pinv15: int, n: int, tile: int, interpret: bool):
    kernel = functools.partial(_butterfly_kernel, L, pinv15)
    grid = (n // tile,)
    spec = pl.BlockSpec((L, tile), lambda i: (0, i), memory_space=pltpu.VMEM)
    cspec = pl.BlockSpec((L, tile), lambda i: (0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((L, n), I32),
            jax.ShapeDtypeStruct((L, n), I32),
        ),
        grid=grid,
        in_specs=[spec, spec, spec, cspec],
        out_specs=(spec, spec),
        interpret=interpret,
    )


def butterfly_pallas(u: jax.Array, v: jax.Array, tw: jax.Array, p_np,
                     pinv15: int, tile: int = 512,
                     interpret: bool = False):
    """(u + v*tw, u - v*tw) on (L, *batch) operands, one fused kernel.
    Returns None if the batch is too small to pay for a launch (caller
    falls back to the composed XLA ops)."""
    L = u.shape[0]
    batch_shape = u.shape[1:]
    nb = 1
    for s in batch_shape:
        nb *= s
    if nb < tile or u.shape != v.shape or v.shape != tw.shape:
        return None
    uf = u.reshape(L, nb)
    vf = v.reshape(L, nb)
    twf = tw.reshape(L, nb)
    pad = (-nb) % tile
    if pad:
        uf = jnp.pad(uf, ((0, 0), (0, pad)))
        vf = jnp.pad(vf, ((0, 0), (0, pad)))
        twf = jnp.pad(twf, ((0, 0), (0, pad)))
    n = nb + pad
    pb = jnp.broadcast_to(jnp.asarray(p_np)[:, None], (L, tile))
    call = _build_butterfly(L, pinv15, n, tile, interpret)
    hi, lo = call(uf, vf, twf, pb)
    if pad:
        hi = hi[:, :nb]
        lo = lo[:, :nb]
    return (hi.reshape((L,) + batch_shape), lo.reshape((L,) + batch_shape))


def mont_mul_pallas(a: jax.Array, b: jax.Array, p_np, pinv15: int,
                    tile: int = 512, interpret: bool = False) -> jax.Array:
    """Drop-in for rl.mont_mul on arbitrary (L, *batch) operands: the
    batch is flattened and padded to a tile multiple.  Small batches
    (< one tile) fall back to the XLA scan — the kernel-launch overhead
    wouldn't pay."""
    L = a.shape[0]
    batch_shape = a.shape[1:]
    nb = 1
    for s in batch_shape:
        nb *= s
    if a.shape != b.shape or nb < tile:
        p = jnp.asarray(p_np).reshape((L,) + (1,) * (a.ndim - 1))
        return rl.mont_mul(a, b, p, pinv15)
    af = a.reshape(L, nb)
    bf = b.reshape(L, nb)
    pad = (-nb) % tile
    if pad:
        af = jnp.pad(af, ((0, 0), (0, pad)))
        bf = jnp.pad(bf, ((0, 0), (0, pad)))
    n = nb + pad
    pb = jnp.broadcast_to(jnp.asarray(p_np)[:, None], (L, tile))
    call = _build_mont_mul(L, pinv15, n, tile, interpret)
    out = call(af, bf, pb)
    if pad:
        out = out[:, :nb]
    return out.reshape((L,) + batch_shape)
