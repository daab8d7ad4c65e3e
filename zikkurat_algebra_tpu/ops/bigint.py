"""Standalone big-integer API over the exact 16-bit limb kernels.

The analog of the reference's BigInt128..768 modules
(lib/cbits/bigint/bigintN.c + lib/src/ZK/Algebra/BigInt/BigIntN.hs, C2/H3):
fixed-width unsigned arithmetic with carry/borrow outs, full and
truncated products, shifts and word scaling — but width-generic (any
multiple of 64 bits) and batch-first.

This exact-radix layer is the INTERCHANGE / test layer; the field kernels
use the redundant radix-2^15 core (ops/limbs15.py) instead.
"""

from __future__ import annotations

from typing import List, Sequence, Union

import numpy as np
import jax
import jax.numpy as jnp

from ..utils.convert import ints_to_limbs, limbs_to_ints
from ..utils.jit import jit_method
from . import limbs as lb


class BigInt:
    """Fixed-width (16*L)-bit unsigned integers on uint32 limb planes."""

    def __init__(self, bits: int):
        assert bits % 64 == 0, "width must be a multiple of 64 bits"
        self.bits = bits
        self.L = bits // 16

    # -- host conversions ---------------------------------------------------
    def encode(self, values: Union[int, Sequence[int]]) -> jax.Array:
        return jnp.asarray(ints_to_limbs(values, self.L))

    def decode(self, limbs) -> Union[int, List[int]]:
        return limbs_to_ints(np.asarray(limbs))

    # -- predicates ----------------------------------------------------------
    def is_zero(self, a):
        return lb.is_zero(a)

    def is_one(self, a):
        return lb.is_one(a)

    def eq(self, a, b):
        return lb.eq(a, b)

    def geq(self, a, b):
        return lb.geq(a, b)

    # -- arithmetic ----------------------------------------------------------
    @jit_method
    def add(self, a, b):
        """(a + b) mod 2^bits, plus carry-out plane."""
        return lb.add(a, b)

    @jit_method
    def sub(self, a, b):
        """(a - b) mod 2^bits, plus borrow-out plane."""
        return lb.sub(a, b)

    @jit_method
    def neg(self, a):
        """Two's complement -a mod 2^bits."""
        d, _ = lb.sub(jnp.zeros_like(a), a)
        return d

    @jit_method
    def mul_ext(self, a, b):
        """Full double-width product (cf. `mulExt`, BigInt256.hs:9-29)."""
        return lb.mul_full(a, b)

    @jit_method
    def sqr_ext(self, a):
        return lb.sqr_full(a)

    @jit_method
    def mul(self, a, b):
        """Truncated product mod 2^bits (cf. `mul_truncated`)."""
        return lb.mul_trunc(a, b, self.L)

    @jit_method
    def scale_ext(self, w, a):
        """16-bit word plane times bigint -> one extra limb (cf. `scale`)."""
        return lb.scale_word(w, a)

    @jit_method
    def inc(self, a):
        """a + 1 with carry-out (cf. bigint256 `inc`)."""
        one = jnp.zeros_like(a).at[0].set(1)
        return lb.add(a, one)

    @jit_method
    def dec(self, a):
        """a - 1 with borrow-out (cf. bigint256 `dec`)."""
        one = jnp.zeros_like(a).at[0].set(1)
        return lb.sub(a, one)

    # -- shifts --------------------------------------------------------------
    def shift_left(self, a, k: int):
        """Left shift by k bits (static), dropping overflow."""
        limbs, bits = divmod(k, 16)
        x = lb.shl_limbs(a, limbs) if limbs else a
        if bits:
            x, _ = lb.shl_bits(x, bits)
        return x

    def shift_right(self, a, k: int):
        limbs, bits = divmod(k, 16)
        x = lb.shr_limbs(a, limbs) if limbs else a
        if bits:
            x = lb.shr_bits(x, bits)
        return x

    def __hash__(self):
        return id(self)

    def __eq__(self, other):
        return self is other


_BIGINT_CACHE: dict = {}


def bigint(bits: int) -> BigInt:
    b = _BIGINT_CACHE.get(bits)
    if b is None:
        b = BigInt(bits)
        _BIGINT_CACHE[bits] = b
    return b
