"""Batched Montgomery prime-field kernels bound to one `FieldParams`.

TPU analog of the reference's per-field generated C modules
(lib/cbits/curves/fields/mont/*_mont.c: REDC mul/sqr, pow, batch_inv,
from_std/to_std — bn128_Fr_mont.c:140-357) and of the std-representation
modules (curves/fields/std).  Unlike the reference, every operation is
batch-first: arrays are uint32 limb planes of shape ``(L, *batch)`` in
Montgomery form, and the "unit op" is just batch size 1.
"""

from __future__ import annotations

from functools import cached_property
from typing import Optional, Sequence, Union

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from ..params import FieldParams
from ..utils.convert import int_to_bits, ints_to_limbs, limbs_to_ints
from ..utils.jit import jit_method
from . import limbs as lb

U32 = jnp.uint32


class Field:
    """Montgomery-form prime field over uint32 limb planes.

    Hashable/static by identity so it can be closed over by jitted
    functions; all constants are held as numpy and materialized as XLA
    constants at trace time.
    """

    struct_ndim = 1  # leading non-batch axes (just the limb axis)

    def __init__(self, params: FieldParams):
        self.params = params
        self.p = params.p
        self.L = params.nlimbs
        self.p_np = ints_to_limbs(params.p, self.L)
        self.pinv16 = params.p_inv_neg_limb
        r = params.r_mont
        self.one_std_np = ints_to_limbs(1, self.L)
        self.one_np = ints_to_limbs(r % params.p, self.L)          # R mod p
        self.r2_np = ints_to_limbs(params.r2_mont, self.L)         # R^2 mod p
        self.r3_np = ints_to_limbs(params.r3_mont, self.L)         # R^3 mod p
        self.zero_np = np.zeros(self.L, np.uint32)
        # Fermat exponent bits (LSB first) for inversion: a^(p-2)
        self.p_minus_2_bits = int_to_bits(params.p - 2)

    # -- static-constant accessors (broadcastable (L, 1...)) ---------------
    def _c(self, arr: np.ndarray, batch_ndim: int) -> jax.Array:
        return jnp.asarray(arr).reshape((self.L,) + (1,) * batch_ndim)

    def consts(self, a: jax.Array):
        nb = a.ndim - 1
        return self._c(self.p_np, nb)

    def zero(self, batch_shape=()) -> jax.Array:
        return jnp.zeros((self.L,) + tuple(batch_shape), U32)

    def one(self, batch_shape=()) -> jax.Array:
        return jnp.broadcast_to(
            self._c(self.one_np, len(batch_shape)), (self.L,) + tuple(batch_shape)
        )

    # -- ring ops ----------------------------------------------------------
    @jit_method
    def add(self, a, b):
        return lb.add_mod(a, b, self.consts(a))

    @jit_method
    def sub(self, a, b):
        return lb.sub_mod(a, b, self.consts(a))

    @jit_method
    def neg(self, a):
        return lb.neg_mod(a, self.consts(a))

    @jit_method
    def mul(self, a, b):
        return lb.mont_mul(a, b, self.consts(a), self.pinv16)

    @jit_method
    def sqr(self, a):
        return lb.mont_sqr(a, self.consts(a), self.pinv16)

    @jit_method
    def div2(self, a):
        return lb.div2_mod(a, self.consts(a))

    @jit_method(static_argnums=(2,))
    def muli(self, a, k: int):
        """Multiply by a small static integer constant (e.g. curve b)."""
        if k == 0:
            return jnp.zeros_like(a)
        if k == 1:
            return a
        mont_k = ints_to_limbs((k * self.params.r_mont) % self.p, self.L)
        return lb.mont_mul(a, self._c(mont_k, a.ndim - 1), self.consts(a), self.pinv16)

    def is_zero(self, a):
        return lb.is_zero(a)

    def eq(self, a, b):
        return lb.eq(a, b)

    def select(self, pred, a, b):
        return lb.select(pred, a, b)

    # -- exponentiation ----------------------------------------------------
    @jit_method
    def pow_bits(self, a: jax.Array, bits: jax.Array) -> jax.Array:
        """a ** e where `bits` is the little-endian bit array of e
        (uint32 (B,)).  LSB-first square-and-multiply as a lax.scan —
        branch-free select instead of the reference's data-dependent
        loop (bn128_Fr_mont.c:222-249 `pow_gen`)."""
        one = self.one(a.shape[1:])

        def body(carry, bit):
            acc, base = carry
            acc2 = lb.select(bit == 1, self.mul(acc, base), acc)
            return (acc2, self.sqr(base)), None

        (acc, _), _ = lax.scan(body, (one, a), jnp.asarray(bits, U32))
        return acc

    def pow_static(self, a: jax.Array, e: int) -> jax.Array:
        if e < 0:
            return self.pow_static(self.inv(a), -e)
        if e == 0:
            return self.one(a.shape[1:])
        return self.pow_bits(a, jnp.asarray(int_to_bits(e)))

    @jit_method
    def inv(self, a: jax.Array) -> jax.Array:
        """Field inverse by Fermat (a^(p-2)): constant-iteration, branch
        free — replaces the reference's data-dependent binary Euclid
        (bn128_Fr_std.c:252-315).  inv(0) == 0 as in the reference."""
        return self.pow_bits(a, jnp.asarray(self.p_minus_2_bits))

    @jit_method
    def div(self, a, b):
        return self.mul(a, self.inv(b))

    @jit_method
    def batch_inv(self, a: jax.Array) -> jax.Array:
        """Montgomery batch-inversion over the flattened batch.

        The reference's serial prefix-product trick
        (bn128_Fr_mont.c:258-285) re-formulated with two
        `associative_scan`s (log-depth) + ONE Fermat inversion.
        Zeros map to zero."""
        batch_shape = a.shape[1:]
        x = a.reshape(self.L, -1)
        n = x.shape[1]
        if n == 1:
            return self.inv(a)
        zero_mask = lb.is_zero(x)
        one = self.one((n,))
        x1 = lb.select(zero_mask, one, x)
        mulfn = lambda u, v: self.mul(u, v)
        prefix = lax.associative_scan(mulfn, x1, axis=1)            # P_i
        suffix = lax.associative_scan(mulfn, x1, axis=1, reverse=True)  # S_i
        total_inv = self.inv(prefix[:, -1:])                        # (L, 1)
        # inv_i = total_inv * P_{i-1} * S_{i+1}
        p_shift = jnp.concatenate([self.one((1,)), prefix[:, :-1]], 1)
        s_shift = jnp.concatenate([suffix[:, 1:], self.one((1,))], 1)
        out = self.mul(self.mul(p_shift, s_shift),
                       jnp.broadcast_to(total_inv, x.shape))
        out = lb.select(zero_mask, jnp.zeros_like(out), out)
        return out.reshape(a.shape)

    # -- representation conversions ---------------------------------------
    @jit_method
    def to_mont(self, a_std: jax.Array) -> jax.Array:
        """standard -> Montgomery:  a * R mod p == REDC(a * R^2)."""
        r2 = self._c(self.r2_np, a_std.ndim - 1)
        return lb.mont_mul(a_std, r2, self.consts(a_std), self.pinv16)

    @jit_method
    def from_mont(self, a: jax.Array) -> jax.Array:
        return lb.mont_from(a, self.consts(a), self.pinv16)

    # -- host encode / decode ---------------------------------------------
    def encode(self, values: Union[int, Sequence[int]], mont: bool = True):
        """Python ints (standard rep, any residue) -> device limb planes."""
        if isinstance(values, int):
            vals: Union[int, list] = values % self.p
            if mont:
                vals = (vals * self.params.r_mont) % self.p
        else:
            vals = [v % self.p for v in values]
            if mont:
                vals = [(v * self.params.r_mont) % self.p for v in vals]
        return jnp.asarray(ints_to_limbs(vals, self.L))

    def decode(self, limbs, mont: bool = True):
        """Device limb planes -> Python int(s) in standard rep."""
        out = limbs_to_ints(np.asarray(limbs))
        rinv = pow(self.params.r_mont, -1, self.p)
        if isinstance(out, int):
            return (out * rinv) % self.p if mont else out
        return [(v * rinv) % self.p if mont else v for v in out]

    # -- randomness (device) ----------------------------------------------
    def rnd(self, key: jax.Array, batch_shape=()) -> jax.Array:
        """Nearly-uniform random Montgomery-form elements: REDC of a
        uniform 2L-limb integer (bias < 2^-240; mirrors the reference's
        `rnd` API, Fr/Mont.hs:107-113)."""
        shape = (2 * self.L,) + tuple(batch_shape)
        wide = jax.random.randint(key, shape, 0, 1 << 16, dtype=jnp.int32)
        wide = wide.astype(U32)
        nb = len(batch_shape)
        return lb.mont_redc(wide, self._c(self.p_np, nb), self.pinv16)

    # make hashable-by-identity for closure in jitted fns
    def __hash__(self):
        return id(self)

    def __eq__(self, other):
        return self is other

    def __repr__(self):
        return f"Field({self.params.name}, L={self.L})"


_FIELD_CACHE: dict = {}


def get_field(params: FieldParams) -> Field:
    f = _FIELD_CACHE.get(params.name)
    if f is None:
        f = Field(params)
        _FIELD_CACHE[params.name] = f
    return f
