"""Extension-field towers Fp2 / Fp6 / Fp12 on limb planes.

TPU analog of the reference's generated tower kernels
(lib/cbits/curves/fields/mont/*_Fp{2,6,12}_mont.c): Karatsuba mul/sqr,
closed-form inverses, Frobenius via precomputed gamma tables.

Element layout — the LIMB axis stays leading (so carry scans and all
base-field kernels apply unchanged), extension components are extra
batch-like axes right after it, outermost extension first:

    Fp   : (L, *batch)
    Fp2  : (L, 2, *batch)              u^2 = -1
    Fp6  : (L, 3, 2, *batch)           v^3 = xi
    Fp12 : (L, 2, 3, 2, *batch)        w^2 = v

Each level's own component axis is axis 1 of its element view, so
``a[:, i]`` is the i-th coefficient (an element of the level below).
Add/sub/neg need no per-component code at all — the base field treats
component axes as batch.  Coefficient order matches the oracle's
``coeffs()`` (little-endian in the tower / reference `packPrimeBase`).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from jax import lax

from ..params import CurveParams
from ..utils.convert import int_to_bits
from .field import Field, get_field
from ..utils.jit import jit_method

U32 = jnp.uint32


class _FieldOps:
    """Shared generic machinery (pow, select, div) for tower levels."""

    struct_ndim: int = 1  # leading non-batch axes (L + extension axes)

    def batch_shape(self, a) -> tuple:
        return a.shape[self.struct_ndim:]

    def select(self, pred, a, b):
        """Branch-free: pred (*batch,) ? a : b."""
        idx = (None,) * self.struct_ndim
        return jnp.where(pred[idx], a, b)

    def div(self, a, b):
        return self.mul(a, self.inv(b))

    def pow_bits(self, a, bits):
        one = self.one(self.batch_shape(a))

        def body(carry, bit):
            acc, base = carry
            acc2 = self.select(bit == 1, self.mul(acc, base), acc)
            return (acc2, self.sqr(base)), None

        (acc, _), _ = lax.scan(body, (one, a), jnp.asarray(bits, U32))
        return acc

    def pow_static(self, a, e: int):
        if e < 0:
            return self.pow_static(self.inv(a), -e)
        if e == 0:
            return self.one(self.batch_shape(a))
        return self.pow_bits(a, jnp.asarray(int_to_bits(e)))

    def __hash__(self):
        return id(self)

    def __eq__(self, other):
        return self is other


class _Ext(_FieldOps):
    deg: int

    def __init__(self, base, name=""):
        self.base = base
        self.name = name
        self.struct_ndim = base.struct_ndim + 1

    def comp(self, a, i):
        return a[:, i]

    def stack(self, cs):
        return jnp.stack(cs, axis=1)

    def zero(self, batch_shape=()):
        return self.stack([self.base.zero(batch_shape)] * self.deg)

    def one(self, batch_shape=()):
        z = self.base.zero(batch_shape)
        return self.stack([self.base.one(batch_shape)] + [z] * (self.deg - 1))

    def from_base(self, a):
        z = jnp.zeros_like(a)
        return self.stack([a] + [z] * (self.deg - 1))

    # componentwise ops: base field treats the component axis as batch
    def add(self, a, b):
        return self.base.add(a, b)

    def sub(self, a, b):
        return self.base.sub(a, b)

    def neg(self, a):
        return self.base.neg(a)

    def scale_base(self, k, a):
        """Multiply every coefficient by base element k (*batch shapes)."""
        return self.stack(
            [self.base.mul(k, self.comp(a, i)) for i in range(self.deg)]
        )

    def is_zero(self, a):
        out = self.base.is_zero(self.comp(a, 0))
        for i in range(1, self.deg):
            out = jnp.logical_and(out, self.base.is_zero(self.comp(a, i)))
        return out

    def eq(self, a, b):
        out = self.base.eq(self.comp(a, 0), self.comp(b, 0))
        for i in range(1, self.deg):
            out = jnp.logical_and(out, self.base.eq(self.comp(a, i), self.comp(b, i)))
        return out


class QuadExt(_Ext):
    """base[u]/(u^2 - nr); `mul_nr` multiplies a base element by nr.

    cf. *_Fp2_mont.c:183-237 (Karatsuba 3-mul, specialized inverse) and
    *_Fp12_mont.c:195-254 (same shape over Fp6 with nr = v)."""

    deg = 2

    def __init__(self, base, mul_nr, name=""):
        super().__init__(base, name)
        self.mul_nr = mul_nr

    @jit_method
    def mul(self, a, b):
        f = self.base
        a0, a1 = a[:, 0], a[:, 1]
        b0, b1 = b[:, 0], b[:, 1]
        t0 = f.mul(a0, b0)
        t1 = f.mul(a1, b1)
        t2 = f.mul(f.add(a0, a1), f.add(b0, b1))
        c0 = f.add(t0, self.mul_nr(t1))
        c1 = f.sub(f.sub(t2, t0), t1)
        return self.stack([c0, c1])

    @jit_method
    def sqr(self, a):
        f = self.base
        a0, a1 = a[:, 0], a[:, 1]
        t0 = f.sqr(a0)
        t1 = f.sqr(a1)
        t2 = f.sqr(f.add(a0, a1))
        c0 = f.add(t0, self.mul_nr(t1))
        c1 = f.sub(f.sub(t2, t0), t1)
        return self.stack([c0, c1])

    @jit_method
    def conj(self, a):
        return self.stack([a[:, 0], self.base.neg(a[:, 1])])

    @jit_method
    def inv(self, a):
        # (a0 - a1 u) / (a0^2 - nr a1^2); inv(0) == 0
        f = self.base
        a0, a1 = a[:, 0], a[:, 1]
        d = f.sub(f.sqr(a0), self.mul_nr(f.sqr(a1)))
        dinv = f.inv(d)
        return self.stack([f.mul(a0, dinv), f.neg(f.mul(a1, dinv))])


class CubicExt(_Ext):
    """base[v]/(v^3 - xi).

    cf. *_Fp6_mont.c:197-295 (6-mul Karatsuba, closed-form inverse)."""

    deg = 3

    def __init__(self, base, mul_xi, name=""):
        super().__init__(base, name)
        self.mul_xi = mul_xi

    @jit_method
    def mul(self, a, b):
        f = self.base
        a0, a1, a2 = a[:, 0], a[:, 1], a[:, 2]
        b0, b1, b2 = b[:, 0], b[:, 1], b[:, 2]
        m0 = f.mul(a0, b0)
        m1 = f.mul(a1, b1)
        m2 = f.mul(a2, b2)
        s12 = f.mul(f.add(a1, a2), f.add(b1, b2))
        s01 = f.mul(f.add(a0, a1), f.add(b0, b1))
        s02 = f.mul(f.add(a0, a2), f.add(b0, b2))
        c0 = f.add(m0, self.mul_xi(f.sub(f.sub(s12, m1), m2)))
        c1 = f.add(f.sub(f.sub(s01, m0), m1), self.mul_xi(m2))
        c2 = f.add(f.sub(f.sub(s02, m0), m2), m1)
        return self.stack([c0, c1, c2])

    @jit_method
    def sqr(self, a):
        return self.mul(a, a)

    @jit_method
    def mul_by_v(self, a):
        """(a0, a1, a2) -> (xi*a2, a0, a1)."""
        return self.stack([self.mul_xi(a[:, 2]), a[:, 0], a[:, 1]])

    @jit_method
    def inv(self, a):
        # closed form, cf. bls12_381_Fp6_mont.c:265-295
        f = self.base
        a0, a1, a2 = a[:, 0], a[:, 1], a[:, 2]
        t0 = f.sub(f.sqr(a0), self.mul_xi(f.mul(a1, a2)))
        t1 = f.sub(self.mul_xi(f.sqr(a2)), f.mul(a0, a1))
        t2 = f.sub(f.sqr(a1), f.mul(a0, a2))
        d = f.add(
            f.mul(a0, t0),
            self.mul_xi(f.add(f.mul(a2, t1), f.mul(a1, t2))),
        )
        dinv = f.inv(d)
        return self.stack([f.mul(t0, dinv), f.mul(t1, dinv), f.mul(t2, dinv)])


class TowerKernels:
    """The full tower for one curve, plus Frobenius constant tables.

    cf. the reference's per-curve tower modules and the Frobenius gamma
    machinery (codegen/src/Zikkurat/CodeGen/ExtField.hs:810-886 — there
    generated sparse C tables, here oracle-computed Montgomery constants
    baked as XLA literals)."""

    def __init__(self, curve: CurveParams):
        from ..oracle.ext import Tower as OracleTower

        self.curve = curve
        self.oracle = OracleTower(curve)
        self.fp: Field = get_field(curve.fp)
        self.fr: Field = get_field(curve.fr)

        self.fp2 = QuadExt(self.fp, self.fp.neg, name="Fp2")
        self.xi_mont = self.encode_fp2_const(self.oracle.fp2.xi)  # (L, 2)

        def mul_xi(a_fp2):
            xib = jnp.reshape(
                self.xi_mont,
                self.xi_mont.shape + (1,) * (a_fp2.ndim - self.xi_mont.ndim),
            )
            return self.fp2.mul(a_fp2, jnp.broadcast_to(xib, a_fp2.shape))

        self.mul_xi = mul_xi
        self.fp6 = CubicExt(self.fp2, mul_xi, name="Fp6")
        self.fp12 = QuadExt(self.fp6, self.fp6.mul_by_v, name="Fp12")

        # Frobenius gamma_i = xi^{i (p-1)/6} for i = 0..5, Montgomery form
        gs = self.oracle.fp12._gammas()
        self._gammas_dev = [self.encode_fp2_const(g) for g in gs]

    # -- constant encoders --------------------------------------------------
    def encode_fp2_const(self, c) -> jax.Array:
        """(c0, c1) ints -> (L, 2) Montgomery device constant."""
        return jnp.stack([self.fp.encode(c[0]), self.fp.encode(c[1])], 1)

    def encode_fp2(self, cs: Sequence) -> jax.Array:
        """list of oracle Fp2 elements -> (L, 2, N)."""
        c0 = self.fp.encode([c[0] for c in cs])
        c1 = self.fp.encode([c[1] for c in cs])
        return jnp.stack([c0, c1], 1)

    def decode_fp2(self, a):
        c0 = self.fp.decode(a[:, 0])
        c1 = self.fp.decode(a[:, 1])
        if isinstance(c0, int):
            return (c0, c1)
        return list(zip(c0, c1))

    def encode_fp6(self, cs: Sequence) -> jax.Array:
        return jnp.stack(
            [self.encode_fp2([c[i] for c in cs]) for i in range(3)], 1
        )

    def decode_fp6(self, a):
        comps = [self.decode_fp2(a[:, i]) for i in range(3)]
        if isinstance(comps[0], tuple):
            return tuple(comps)
        return [tuple(c[k] for c in comps) for k in range(len(comps[0]))]

    def encode_fp12(self, cs: Sequence) -> jax.Array:
        return jnp.stack(
            [self.encode_fp6([c[i] for c in cs]) for i in range(2)], 1
        )

    def decode_fp12(self, a):
        comps = [self.decode_fp6(a[:, i]) for i in range(2)]
        if isinstance(comps[0], tuple):
            return tuple(comps)
        return [tuple(c[k] for c in comps) for k in range(len(comps[0]))]

    # -- Fp12 Frobenius -----------------------------------------------------
    def fp12_frobenius(self, a, k: int = 1):
        """x -> x^(p^k) via W-coefficient gamma multiplication
        (bit-exact vs oracle Fp12Field._frob1)."""
        for _ in range(k % 12):
            a = self._frob1(a)
        return a

    @jit_method
    def _frob1(self, a):
        f2 = self.fp2
        # x = A0 + B0 w + A1 w^2 + B1 w^3 + A2 w^4 + B2 w^5, c_i in Fp2
        cs = [a[:, 0, 0], a[:, 1, 0], a[:, 0, 1], a[:, 1, 1], a[:, 0, 2], a[:, 1, 2]]
        nb = a.ndim - 4  # batch rank
        out = []
        for c, g in zip(cs, self._gammas_dev):
            gb = jnp.reshape(g, g.shape + (1,) * nb)
            out.append(f2.mul(f2.conj(c), jnp.broadcast_to(gb, c.shape)))
        fp6_a = jnp.stack([out[0], out[2], out[4]], 1)
        fp6_b = jnp.stack([out[1], out[3], out[5]], 1)
        return jnp.stack([fp6_a, fp6_b], 1)

    @jit_method
    def fp12_conj(self, a):
        """x^(p^6): cheap inverse for cyclotomic-subgroup elements."""
        return jnp.stack([a[:, 0], self.fp6.neg(a[:, 1])], 1)

    def __hash__(self):
        return id(self)

    def __eq__(self, other):
        return self is other


_TOWER_CACHE: dict = {}


def get_tower(curve: CurveParams) -> TowerKernels:
    t = _TOWER_CACHE.get(curve.name)
    if t is None:
        t = TowerKernels(curve)
        _TOWER_CACHE[curve.name] = t
    return t
