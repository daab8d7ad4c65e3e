"""Extension-field towers Fp2 / Fp6 / Fp12 on redundant limb planes.

TPU analog of the reference's generated tower kernels
(lib/cbits/curves/fields/mont/*_Fp{2,6,12}_mont.c): Karatsuba mul/sqr,
closed-form inverses, Frobenius via precomputed gamma tables.

Element layout — the LIMB axis stays leading, extension components are
extra batch-like axes right after it, outermost extension first:

    Fp   : (L, *batch)
    Fp2  : (L, 2, *batch)              u^2 = -1
    Fp6  : (L, 3, 2, *batch)           v^3 = xi
    Fp12 : (L, 2, 3, 2, *batch)        w^2 = v

KEY DESIGN: every level exposes `mul_list([(a, b), ...])` which expands
its Karatsuba tree one level down and recurses, so ALL base-field
multiplications of an arbitrary batch of tower products land in ONE CIOS
scan (`Field.mul_many`).  An Fp12 multiplication is 54 base products —
one kernel instead of 54 (compile time) and a 54x wider batch (runtime).
Additions are carry-free (ops/limbs15.py), xi-multiplication is a
small-integer limb scaling, so a full tower op contains exactly one scan.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from ..params import CurveParams
from ..utils.convert import int_to_bits
from ..utils.jit import jit_method
from .field import Field, get_field

U32 = jnp.uint32


class _FieldOps:
    """Shared generic machinery (pow, select, div) for tower levels."""

    struct_ndim: int = 1

    def batch_shape(self, a) -> tuple:
        return a.shape[self.struct_ndim:]

    def select(self, pred, a, b):
        idx = (None,) * self.struct_ndim
        return jnp.where(pred[idx], a, b)

    def div(self, a, b):
        return self.mul(a, self.inv(b))

    def pow_bits(self, a, bits):
        one = self.one(self.batch_shape(a))

        def body(carry, bit):
            acc, base = carry
            prods = self.mul_list([(acc, base), (base, base)])
            acc2 = self.select(bit == 1, prods[0], acc)
            return (acc2, prods[1]), None

        (acc, _), _ = lax.scan(body, (one, a), jnp.asarray(bits, U32))
        return acc

    def pow_static(self, a, e: int):
        if e < 0:
            return self.pow_static(self.inv(a), -e)
        if e == 0:
            return self.one(self.batch_shape(a))
        return self.pow_bits(a, jnp.asarray(int_to_bits(e)))

    def mul(self, a, b):
        return self.mul_list([(a, b)])[0]

    def sqr(self, a):
        return self.mul_list([(a, a)])[0]

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

    # componentwise carry-free ops (component axes are just batch)
    def add(self, a, b):
        return self.base.add(a, b)

    def sub(self, a, b):
        return self.base.sub(a, b)

    def neg(self, a):
        return self.base.neg(a)

    def scale_base(self, k, a):
        """Multiply every coefficient by base element k — batched into
        one kernel via mul_list."""
        prods = self.base.mul_list(
            [(k, self.comp(a, i)) for i in range(self.deg)]
        )
        return self.stack(prods)

    def scale_small(self, a, k: int):
        """Small-integer scaling — carry-free, componentwise."""
        return self.base.scale_small(a, k)

    def norm(self, a):
        """Canonical [0, p) limbs, componentwise."""
        return self.base.norm(a)

    def is_zero(self, a):
        out = self.base.is_zero(self.comp(a, 0))
        for i in range(1, self.deg):
            out = jnp.logical_and(out, self.base.is_zero(self.comp(a, i)))
        return out

    def eq(self, a, b):
        out = self.base.eq(self.comp(a, 0), self.comp(b, 0))
        for i in range(1, self.deg):
            out = jnp.logical_and(
                out, self.base.eq(self.comp(a, i), self.comp(b, i))
            )
        return out


class QuadExt(_Ext):
    """base[u]/(u^2 - nr); `mul_nr` multiplies a base element by nr
    (carry-free: neg for Fp2, mul_by_v for Fp12).

    cf. *_Fp2_mont.c:183-237 and *_Fp12_mont.c:195-254."""

    deg = 2

    def __init__(self, base, mul_nr, name=""):
        super().__init__(base, name)
        self.mul_nr = mul_nr

    def mul_list(self, pairs):
        f = self.base
        base_pairs = []
        for a, b in pairs:
            a0, a1 = a[:, 0], a[:, 1]
            b0, b1 = b[:, 0], b[:, 1]
            base_pairs += [(a0, b0), (a1, b1), (f.add(a0, a1), f.add(b0, b1))]
        prods = f.mul_list(base_pairs)
        out = []
        for i in range(len(pairs)):
            t0, t1, t2 = prods[3 * i:3 * i + 3]
            c0 = f.add(t0, self.mul_nr(t1))
            c1 = f.sub(f.sub(t2, t0), t1)
            out.append(self.stack([c0, c1]))
        return out

    def conj(self, a):
        return self.stack([a[:, 0], self.base.neg(a[:, 1])])

    @jit_method
    def inv(self, a):
        # (a0 - a1 u) / (a0^2 - nr a1^2); inv(0) == 0
        f = self.base
        a0, a1 = a[:, 0], a[:, 1]
        s0, s1 = f.mul_list([(a0, a0), (a1, a1)])
        d = f.sub(s0, self.mul_nr(s1))
        dinv = f.inv(d)
        q0, q1 = f.mul_list([(a0, dinv), (a1, dinv)])
        return self.stack([q0, f.neg(q1)])


class CubicExt(_Ext):
    """base[v]/(v^3 - xi);  `mul_xi` is carry-free (small-int scaling).

    cf. *_Fp6_mont.c:197-295."""

    deg = 3

    def __init__(self, base, mul_xi, name=""):
        super().__init__(base, name)
        self.mul_xi = mul_xi

    def mul_list(self, pairs):
        f = self.base
        base_pairs = []
        for a, b in pairs:
            a0, a1, a2 = a[:, 0], a[:, 1], a[:, 2]
            b0, b1, b2 = b[:, 0], b[:, 1], b[:, 2]
            base_pairs += [
                (a0, b0), (a1, b1), (a2, b2),
                (f.add(a1, a2), f.add(b1, b2)),
                (f.add(a0, a1), f.add(b0, b1)),
                (f.add(a0, a2), f.add(b0, b2)),
            ]
        prods = f.mul_list(base_pairs)
        out = []
        for i in range(len(pairs)):
            m0, m1, m2, s12, s01, s02 = prods[6 * i:6 * i + 6]
            c0 = f.add(m0, self.mul_xi(f.sub(f.sub(s12, m1), m2)))
            c1 = f.add(f.sub(f.sub(s01, m0), m1), self.mul_xi(m2))
            c2 = f.add(f.sub(f.sub(s02, m0), m2), m1)
            out.append(self.stack([c0, c1, c2]))
        return out

    def mul_by_v(self, a):
        """(a0, a1, a2) -> (xi*a2, a0, a1) — carry-free."""
        return self.stack([self.mul_xi(a[:, 2]), a[:, 0], a[:, 1]])

    @jit_method
    def inv(self, a):
        # closed form, cf. bls12_381_Fp6_mont.c:265-295
        f = self.base
        a0, a1, a2 = a[:, 0], a[:, 1], a[:, 2]
        p0, p1, p2, q12, q01, q02 = f.mul_list([
            (a0, a0), (a1, a1), (a2, a2), (a1, a2), (a0, a1), (a0, a2),
        ])
        t0 = f.sub(p0, self.mul_xi(q12))
        t1 = f.sub(self.mul_xi(p2), q01)
        t2 = f.sub(p1, q02)
        u0, u1, u2 = f.mul_list([(a0, t0), (a2, t1), (a1, t2)])
        d = f.add(u0, self.mul_xi(f.add(u1, u2)))
        dinv = f.inv(d)
        r = f.mul_list([(t0, dinv), (t1, dinv), (t2, dinv)])
        return self.stack(r)


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

        qnr = getattr(curve.tower, "qnr", -1)
        self.qnr = qnr
        if qnr == -1:
            mul_u2 = self.fp.neg
        else:
            # u^2 = qnr (small): carry-free limb scaling
            mul_u2 = lambda a: self.fp.scale_small(a, qnr)
        self.fp2 = QuadExt(self.fp, mul_u2, name="Fp2")
        # the G2 Pallas bucket kernel (ops/pallas_curve.py) needs the
        # nonresidue as a static int to mirror mul_u2 in-kernel
        self.fp2.qnr = qnr

        xi0, xi1 = curve.tower.xi0, curve.tower.xi1

        def mul_xi(a_fp2):
            """(a0 + a1 u)(xi0 + xi1 u) = (xi0 a0 + qnr xi1 a1)
            + (xi1 a0 + xi0 a1) u — small-int limb scalings, carry-free
            (xi in {9+u, 1+u, u})."""
            fp = self.fp
            a0, a1 = a_fp2[:, 0], a_fp2[:, 1]
            c0 = fp.add(fp.scale_small(a0, xi0),
                        fp.scale_small(a1, qnr * xi1))
            c1 = fp.add(fp.scale_small(a0, xi1), fp.scale_small(a1, xi0))
            return jnp.stack([c0, c1], 1)

        self.mul_xi = mul_xi
        self.fp6 = CubicExt(self.fp2, mul_xi, name="Fp6")
        self.fp12 = QuadExt(self.fp6, self.fp6.mul_by_v, name="Fp12")

        # Frobenius gamma_i = xi^{i (p-1)/6} for i = 0..5, Montgomery form
        gs = self.oracle.fp12._gammas()
        self._gammas_dev = [self.encode_fp2_const(g) for g in gs]
        with jax.ensure_compile_time_eval():
            self._qnr_inv_mont = self.fp.encode(
                pow(qnr, -1, curve.fp.p)
            )

    @jit_method
    def fp2_sqrt(self, a):
        """Branch-free Fp2 square root by the complex method over
        u^2 = -1 (device analog of the oracle's oracle/ext.py:91-108;
        the reference's C has no extension-field sqrt at all).

        sqrt(a0 + a1 u): with s = sqrt(a0^2 + a1^2), the root is
        t + (a1 / 2t) u for t = sqrt((a0 +- s)/2); the a1 = 0 branch
        (root in Fp, or sqrt(-a0) u) is folded in with selects.
        Returns (root, is_square) where is_square is verified by one
        squaring — constant work, no data-dependent control flow."""
        f = self.fp
        a0, a1 = a[:, 0], a[:, 1]
        # N(a) = a0^2 - qnr a1^2 (= a0^2 + a1^2 for u^2 = -1)
        n = f.norm(f.sub(f.sqr(a0), f.scale_small(f.sqr(a1), self.qnr)))
        s, _ = f.sqrt(n)
        t1, ok1 = f.sqrt(f.div2(f.add(a0, s)))
        t2, _ = f.sqrt(f.div2(f.sub(a0, s)))
        t = f.select(ok1, t1, t2)
        # guard the 1/(2t) against t = 0 (a = 0 or non-residue): inv(0)
        # is well-defined garbage, and the final squaring check rejects
        x1 = f.mul(a1, f.inv(f.add(t, t)))
        z1 = f.is_zero(a1)
        r0, okr0 = f.sqrt(a0)
        # pure-u root: (x1 u)^2 = qnr x1^2 = a0  =>  x1 = sqrt(a0 / qnr)
        qc = self._qnr_inv_mont.reshape((f.L,) + (1,) * (a0.ndim - 1))
        rn, _ = f.sqrt(f.mul(a0, jnp.broadcast_to(qc, a0.shape)))
        zero = jnp.zeros_like(a0)
        c0 = f.select(z1, f.select(okr0, r0, zero), t)
        c1 = f.select(z1, f.select(okr0, zero, rn), x1)
        root = jnp.stack([c0, c1], 1)
        ok = self.fp2.eq(self.fp2.sqr(root), a)
        return root, ok

    # -- per-level tower Frobenius (device analog of the reference's
    #    Fp2/Fp6 `frobenius` surface, bls12_381_Fp2_mont.c:253-283 and
    #    bls12_381_Fp6_mont.h:9-10) ----------------------------------------
    def fp2_frobenius(self, a):
        """x -> x^p over Fp2: conjugation (u^2 = -1, p = 3 mod 4)."""
        return self.fp2.conj(a)

    @jit_method
    def fp6_frobenius(self, a):
        """x -> x^p over Fp6: conj each Fp2 coefficient, scale coefficient
        i by gamma_{2i} = xi^(i(p-1)/3); ONE fused Fp2 mul batch."""
        f2 = self.fp2
        nb = a.ndim - 3
        pairs = []
        for i, g in ((1, self._gammas_dev[2]), (2, self._gammas_dev[4])):
            c = f2.conj(a[:, i])
            gb = jnp.broadcast_to(
                jnp.reshape(g, g.shape + (1,) * nb), c.shape
            )
            pairs.append((c, gb))
        o1, o2 = f2.mul_list(pairs)
        return jnp.stack([f2.conj(a[:, 0]), o1, o2], 1)

    # -- constant encoders --------------------------------------------------
    def encode_fp2_const(self, c) -> jax.Array:
        return jnp.stack([self.fp.encode(c[0]), self.fp.encode(c[1])], 1)

    def encode_fp2(self, cs: Sequence) -> jax.Array:
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
        for _ in range(k % 12):
            a = self._frob1(a)
        return a

    @jit_method
    def _frob1(self, a):
        """x -> x^p via W-coefficient conj + gamma multiplication (ONE
        batched mul for all six coefficients)."""
        f2 = self.fp2
        cs = [a[:, 0, 0], a[:, 1, 0], a[:, 0, 1], a[:, 1, 1], a[:, 0, 2], a[:, 1, 2]]
        nb = a.ndim - 4
        pairs = []
        for c, g in zip(cs, self._gammas_dev):
            gb = jnp.broadcast_to(jnp.reshape(g, g.shape + (1,) * nb), c.shape)
            pairs.append((f2.conj(c), gb))
        out = f2.mul_list(pairs)
        fp6_a = jnp.stack([out[0], out[2], out[4]], 1)
        fp6_b = jnp.stack([out[1], out[3], out[5]], 1)
        return jnp.stack([fp6_a, fp6_b], 1)

    def fp12_conj(self, a):
        return jnp.stack([a[:, 0], self.fp6.neg(a[:, 1])], 1)

    def __hash__(self):
        return id(self)

    def __eq__(self, other):
        return self is other


_TOWER_CACHE: dict = {}


def get_tower(curve: CurveParams) -> TowerKernels:
    t = _TOWER_CACHE.get(curve.name)
    if t is None:
        with jax.ensure_compile_time_eval():   # see ntt.get_domain note
            t = TowerKernels(curve)
        _TOWER_CACHE[curve.name] = t
    return t
