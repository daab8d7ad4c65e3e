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


def dot_prod(f: Field, a: jax.Array, b: jax.Array) -> jax.Array:
    """<a, b> = sum_i a_i * b_i  (cf. arr_mont `dot_prod`)."""
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
