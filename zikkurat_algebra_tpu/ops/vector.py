"""Pointwise / vector operations over field-element arrays.

TPU analog of the reference's pointwise-array kernels
(lib/cbits/curves/array/mont/*_arr_mont.c — C15): mul_add/mul_sub,
dot_prod, geometric `powers`, scale, Ax_plus_y, Ax_plus_By.  Plain
pointwise neg/add/sub/sqr/mul/inv/div need no code here — the Field/tower
kernels are batch-first already, so `field.mul(a, b)` on (L, N) IS the
pointwise array op.

Reductions exploit the redundant representation: chunked lazy int32
column sums (|cols| < 2^23 for 256-element chunks) with one Montgomery
wide reduction per chunk — a log-depth replacement for the reference's
serial loops."""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from .field import Field
from . import limbs15 as rl

I32 = jnp.int32

_CHUNK = 256  # 256 * (2^15 + 8) < 2^24 per column — no int32 overflow


def reduce_wide(f: Field, v: jax.Array) -> jax.Array:
    """Reduce lazy columns (L, *batch), |cols| < 2^26, to a field element."""
    return f.reduce_wide(v)


def sum_mod(f: Field, a: jax.Array, axis: int = -1) -> jax.Array:
    """Modular sum of field elements along a batch axis (chunked lazy
    int32 sums + Montgomery wide reduction; log-depth)."""
    if axis < 0:
        axis = a.ndim + axis
    assert axis >= 1, "axis 0 is the limb axis"
    a = jnp.moveaxis(a, axis, -1)
    while a.shape[-1] > 1:
        n = a.shape[-1]
        c = min(n, _CHUNK)
        pad = (-n) % c
        if pad:
            a = jnp.pad(a, [(0, 0)] * (a.ndim - 1) + [(0, pad)])
        a = a.reshape(a.shape[:-1] + ((n + pad) // c, c))
        lazy = jnp.sum(a, axis=-1, dtype=I32)
        a = f.reduce_wide(lazy)
    return a[..., 0]


_GRAM_CHUNK = 1 << 20   # 31^2 * 2^20 < 2^31: int32 Gram accumulator bound
_SPLIT = 5              # 15-bit limb -> three 5-bit planes (fit int8)


def _gram_wide(f: Field, a: jax.Array, b: jax.Array) -> jax.Array:
    """Whole-chunk dot product as ONE int8 MXU matmul (measured 2.5x the
    VPU path at 2^20, scripts/mxu_experiment.py): the lazy wide
    accumulator factorizes as wide[k] = sum_{i+j=k} G[i,j] with
    G = As @ Bs^T the Gram matrix of the 5-bit limb planes — the only
    hot op with genuine matmul structure (elementwise modmul has none).

    a, b: (L, n) CANONICAL limb planes, n <= _GRAM_CHUNK.  Returns lazy
    wide columns (2L+2, 1) int32 with |cols| < 2^25 (recombination is
    int32-safe by construction: every added term is split below 2^19)."""
    L, n = a.shape
    ns = rl.LB // _SPLIT

    def split(x):
        planes = [(x >> (_SPLIT * s)) & ((1 << _SPLIT) - 1)
                  for s in range(ns)]
        return jnp.concatenate(planes, 0).astype(jnp.int8)

    G = lax.dot_general(
        split(a), split(b), (((1,), (1,)), ((), ())),
        preferred_element_type=I32,
    )                                   # (3L, 3L) int32, entries < 31^2*n
    Glo = G & 32767                     # 15-bit split keeps the
    Ghi = G >> 15                       # anti-diagonal sums in int32
    wide = jnp.zeros((2 * L + 2,), I32)
    for s in range(ns):
        for t in range(ns):
            for part, extra in ((Glo, 0), (Ghi, 15)):
                blk = part[s * L:(s + 1) * L, t * L:(t + 1) * L]
                flip = jnp.fliplr(blk)
                D = jnp.stack([
                    jnp.trace(flip, offset=L - 1 - k, dtype=I32)
                    for k in range(2 * L - 1)
                ])                       # D[k] = sum_{i+j=k} blk, < 2^20
                q, r = divmod(_SPLIT * (s + t) + extra, rl.LB)
                d0 = (D & 32767) << r    # < 2^29
                d1 = (D >> 15) << r      # < 2^19
                wide = wide.at[q:q + 2 * L - 1].add(d0 & 32767)
                wide = wide.at[q + 1:q + 2 * L].add((d0 >> 15) + d1)
    return wide[:, None]


def dot_prod(f: Field, a: jax.Array, b: jax.Array) -> jax.Array:
    """<a, b> = sum_i a_i * b_i  (cf. arr_mont `dot_prod`).

    On TPU (f.use_mxu) large batches go through the Gram-matmul MXU
    formulation chunk-wise; one Montgomery wide reduction per chunk
    replaces the elementwise-product + chunked-sum pipeline."""
    if (getattr(f, "use_mxu", False) and a.ndim == 2
            and a.shape == b.shape and a.shape[1] >= 2048):
        an, bn = f.norm(a), f.norm(b)
        n = an.shape[1]
        parts = []
        for off in range(0, n, _GRAM_CHUNK):
            wide = _gram_wide(
                f, an[:, off:off + _GRAM_CHUNK], bn[:, off:off + _GRAM_CHUNK]
            )
            parts.append(rl.mont_redc_wide(
                wide, jnp.asarray(f.p_np).reshape(f.L, 1), f.pinv15
            ))
        if len(parts) == 1:
            return parts[0][:, 0]
        return sum_mod(f, jnp.concatenate(parts, axis=1))
    return sum_mod(f, f.mul(a, b))


def mul_add(f: Field, a, b, c):
    """a*b + c fused (cf. arr_mont `mul_add`)."""
    return f.add(f.mul(a, b), c)


def mul_sub(f: Field, a, b, c):
    return f.sub(f.mul(a, b), c)


def ax_plus_y(f: Field, a, x, y):
    """A*x + y with scalar A (L, *1) and vectors x, y (cf. `Ax_plus_y`)."""
    return f.add(f.mul(jnp.broadcast_to(a, x.shape), x), y)


def ax_plus_by(f: Field, a, x, b, y):
    px, py = f.mul_list([
        (jnp.broadcast_to(a, x.shape), x),
        (jnp.broadcast_to(b, y.shape), y),
    ])
    return f.add(px, py)


def scale(f: Field, s, a):
    """s * a_i for scalar s (L,) or (L,1)."""
    s = s.reshape((f.L,) + (1,) * (a.ndim - 1))
    return f.mul(jnp.broadcast_to(s, a.shape), a)


def powers(f: Field, a: jax.Array, b: jax.Array, n: int) -> jax.Array:
    """Geometric series [a, a*b, ..., a*b^(n-1)] -> (L, n)
    (cf. arr_mont `powers`, bn128_arr_mont.c:187).  Log-depth prefix
    product."""
    elems = jnp.concatenate(
        [a[:, None], jnp.broadcast_to(b[:, None], (f.L, n - 1))], 1
    )
    return lax.associative_scan(lambda u, v: f.mul(u, v), elems, axis=1)


def lin_comb(f: Field, coeffs, vecs):
    """sum_k coeffs_k * vecs_k: coeffs (L, K), vecs (L, K, N) -> (L, N)
    (cf. Class/Vector.hs linComb1/linComb2)."""
    prods = f.mul(jnp.broadcast_to(coeffs[:, :, None], vecs.shape), vecs)
    return sum_mod(f, prods, axis=1)
