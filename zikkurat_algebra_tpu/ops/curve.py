"""Elliptic-curve group kernels on limb planes (G1 over Fp, G2 over Fp2).

TPU analog of lib/cbits/curves/g1/{affine,proj,jac}/ and curves/g2/ (C8-C12).
Deliberate architectural departure from the reference: instead of the
reference's branchy Jacobian formulas with infinity special-cases
(bn128_G1_jac.c:235-361), we use the COMPLETE homogeneous-projective
addition formulas of Renes-Costello-Batina 2015 for a=0 curves
(algorithms 7/8/9) — one branch-free formula valid for every input
including doubling and infinity (0:1:0), which is exactly what a
vectorized TPU kernel needs (SURVEY.md §7.2 hard part 4).

The independent multiplications inside each formula are grouped into
`mul_list` batches (one CIOS scan per group), so a complete addition is
~3 fused kernels over Fp or Fp2 alike.  Points are (X, Y, Z) tuples of
coordinate-field elements; affine interchange uses an explicit infinity
mask (the analog of the all-0xFF sentinel, bn128_G1_affine.c:43-92).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple, Union

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from ..params import CurveParams
from ..utils.convert import int_to_bits
from ..utils.jit import jit_method
from . import limbs15 as rl

I32 = jnp.int32
U32 = jnp.uint32

Point = Tuple[jax.Array, jax.Array, jax.Array]     # projective (X, Y, Z)
AffBatch = Tuple[jax.Array, jax.Array, jax.Array]  # (x, y, inf_mask)


class ProjCurveOps:
    """Branch-free projective group law over a coordinate field `f`.

    b3: either a small int (3*b for G1 — applied as a carry-free limb
    scaling) or a coordinate-field constant array (G2's 3*b' in Fp2)."""

    def __init__(self, f, b3: Union[int, jax.Array], scalar_bits: int, name=""):
        self.f = f
        self.b3 = b3
        self.b3_small = isinstance(b3, int)
        self.scalar_bits = scalar_bits
        self.name = name

    # -- constants ----------------------------------------------------------
    def mul_b3(self, t: jax.Array) -> jax.Array:
        if self.b3_small:
            return self.f.scale_small(t, self.b3)
        b3 = jnp.broadcast_to(
            jnp.reshape(self.b3, self.b3.shape + (1,) * (t.ndim - self.b3.ndim)),
            t.shape,
        )
        return self.f.mul(t, b3)

    def infinity(self, batch_shape=()) -> Point:
        f = self.f
        return (f.zero(batch_shape), f.one(batch_shape), f.zero(batch_shape))

    # -- predicates ----------------------------------------------------------
    def is_inf(self, P: Point) -> jax.Array:
        return self.f.is_zero(P[2])

    def eq(self, P: Point, Q: Point) -> jax.Array:
        """Projective equality via cross-multiplication (cf. `is_equal`);
        infinity == infinity."""
        f = self.f
        xz1, xz2, yz1, yz2 = f.mul_list(
            [(P[0], Q[2]), (Q[0], P[2]), (P[1], Q[2]), (Q[1], P[2])]
        )
        x_eq = f.eq(xz1, xz2)
        y_eq = f.eq(yz1, yz2)
        both_inf = jnp.logical_and(self.is_inf(P), self.is_inf(Q))
        neither = jnp.logical_not(
            jnp.logical_or(self.is_inf(P), self.is_inf(Q))
        )
        return jnp.logical_or(
            both_inf, jnp.logical_and(neither, jnp.logical_and(x_eq, y_eq))
        )

    def is_on_curve(self, P: Point) -> jax.Array:
        """3*(Y^2 Z) == 3*X^3 + (3b)*Z^3 (homogenized, a=0)."""
        f = self.f
        y2, x2, z2 = f.mul_list([(P[1], P[1]), (P[0], P[0]), (P[2], P[2])])
        lhs, x3, z3 = f.mul_list([(y2, P[2]), (x2, P[0]), (z2, P[2])])
        bz3 = self.mul_b3(z3)
        return f.eq(f.scale_small(lhs, 3),
                    f.add(f.scale_small(x3, 3), bz3))

    # -- group law (complete formulas) ---------------------------------------
    def neg(self, P: Point) -> Point:
        return (P[0], self.f.neg(P[1]), P[2])

    @jit_method
    def add(self, P: Point, Q: Point) -> Point:
        """Complete projective addition, RCB15 algorithm 7 (a=0):
        12M + 2m_b3 in 3 fused mul batches; valid for ALL inputs."""
        f = self.f
        X1, Y1, Z1 = P
        X2, Y2, Z2 = Q
        t0, t1, t2, m3, m4, m5 = f.mul_list([
            (X1, X2), (Y1, Y2), (Z1, Z2),
            (f.add(X1, Y1), f.add(X2, Y2)),
            (f.add(Y1, Z1), f.add(Y2, Z2)),
            (f.add(X1, Z1), f.add(X2, Z2)),
        ])
        t3 = f.sub(m3, f.add(t0, t1))
        t4 = f.sub(m4, f.add(t1, t2))
        Y3 = f.sub(m5, f.add(t0, t2))
        X3 = f.scale_small(t0, 3)
        t2b = self.mul_b3(t2)
        Z3 = f.add(t1, t2b)
        t1 = f.sub(t1, t2b)
        Y3 = self.mul_b3(Y3)
        p0, p1, p2, p3, p4, p5 = f.mul_list([
            (t3, t1), (t4, Y3), (Y3, X3), (t1, Z3), (Z3, t4), (X3, t3),
        ])
        return (f.sub(p0, p1), f.add(p2, p3), f.add(p4, p5))

    @jit_method
    def dbl(self, P: Point) -> Point:
        """Complete projective doubling, RCB15 algorithm 9 (a=0)."""
        f = self.f
        X, Y, Z = P
        t0, t1, t2, xy = f.mul_list([(Y, Y), (Y, Z), (Z, Z), (X, Y)])
        Z3 = f.scale_small(t0, 8)
        t2 = self.mul_b3(t2)                       # 3b Z^2
        Y3 = f.add(t0, t2)
        t0 = f.sub(t0, f.scale_small(t2, 3))
        q0, q1, q2, q3 = f.mul_list([
            (t2, Z3), (t1, Z3), (t0, Y3), (t0, xy),
        ])
        return (f.scale_small(q3, 2), f.add(q0, q2), q1)

    @jit_method
    def madd(self, P: Point, Q: AffBatch) -> Point:
        """Mixed addition P + (x2, y2, inf2), RCB15 algorithm 8 (a=0),
        affine infinity handled by one final select (cf. madd-1998-cmo
        usage, bn128_G1_proj.c:333)."""
        f = self.f
        X1, Y1, Z1 = P
        X2, Y2, inf2 = Q
        t0, t1, m3, m4, m5 = f.mul_list([
            (X1, X2), (Y1, Y2),
            (f.add(X2, Y2), f.add(X1, Y1)),
            (X2, Z1), (Y2, Z1),
        ])
        t3 = f.sub(m3, f.add(t0, t1))
        t4 = f.add(m4, X1)
        t5 = f.add(m5, Y1)
        X3 = f.scale_small(t0, 3)
        t2 = self.mul_b3(Z1)
        Z3 = f.add(t1, t2)
        t1 = f.sub(t1, t2)
        Y3 = self.mul_b3(t4)
        p0, p1, p2, p3, p4, p5 = f.mul_list([
            (t3, t1), (t5, Y3), (Y3, X3), (t1, Z3), (Z3, t5), (X3, t3),
        ])
        X3n = f.sub(p0, p1)
        Y3n = f.add(p2, p3)
        Z3n = f.add(p4, p5)
        sel = lambda a, b: self.f.select(inf2, a, b)
        return (sel(X1, X3n), sel(Y1, Y3n), sel(Z1, Z3n))

    @jit_method
    def sub(self, P: Point, Q: Point) -> Point:
        return self.add(P, self.neg(Q))

    def select(self, pred, P: Point, Q: Point) -> Point:
        s = self.f.select
        return (s(pred, P[0], Q[0]), s(pred, P[1], Q[1]), s(pred, P[2], Q[2]))

    # -- affine conversion ---------------------------------------------------
    @jit_method
    def to_affine(self, P: Point) -> AffBatch:
        """Batch normalize: (X/Z, Y/Z, inf_mask) via batched inverse
        (cf. batch_to_affine / batch_inv)."""
        f = self.f
        inf = self.is_inf(P)
        zinv = f.batch_inv(P[2]) if hasattr(f, "batch_inv") else f.inv(P[2])
        x, y = f.mul_list([(P[0], zinv), (P[1], zinv)])
        return (x, y, inf)

    def from_affine(self, A: AffBatch) -> Point:
        f = self.f
        x, y, inf = A
        bs = x.shape[f.struct_ndim:]
        one = f.one(bs)
        zero = f.zero(bs)
        s = f.select
        return (s(inf, zero, x), s(inf, one, y), s(inf, zero, one))

    # -- scalar multiplication ----------------------------------------------
    @jit_method
    def scalar_mul_bits(self, bits: jax.Array, P: Point) -> Point:
        """[k] P with k as little-endian bit planes (B, *batch):
        branch-free double-and-add scan (the simple reference formulation,
        kept as the differential baseline for the windowed kernel)."""
        bs = P[0].shape[self.f.struct_ndim:]
        acc0 = self.infinity(bs)

        def body(carry, bit):
            acc, base = carry
            acc2 = self.select(bit == 1, self.add(acc, base), acc)
            return (acc2, self.dbl(base)), None

        (acc, _), _ = lax.scan(body, (acc0, P), jnp.asarray(bits, U32))
        return acc

    WINDOW = 4  # scalar-mul window bits (16-entry table, like the
    #             reference's scl_windowed, bls12_381_G1_proj.c:434-468)

    def _window_table(self, P: Point):
        """[0..15] P as ONE batched point with a leading table axis per
        coordinate.  Built in log-depth batched levels (3 dbl + 3 add
        rounds over growing batches) instead of 14 serial adds."""
        inf = self.infinity(P[0].shape[self.f.struct_ndim:])
        tab = {0: inf, 1: P}
        size = 1 << self.WINDOW

        def cat(Ps):
            return tuple(
                jnp.stack([q[i] for q in Ps], axis=self.f.struct_ndim)
                for i in range(3)
            )

        def uncat(Pb, n):
            idx = [slice(None)] * self.f.struct_ndim
            return [
                tuple(q[tuple(idx + [j])] for q in Pb) for j in range(n)
            ]

        k = 1
        while 2 * k < size:
            # evens 2t = dbl(t) for t in [k, 2k); odds 2t+1 = evens + P
            srcs = [tab[t] for t in range(k, 2 * k)]
            evens = uncat(self.dbl(cat(srcs)), k)
            odds = uncat(self.add(cat(evens), cat([P] * k)), k)
            for j in range(k):
                tab[2 * (k + j)] = evens[j]
                tab[2 * (k + j) + 1] = odds[j]
            k *= 2
        return cat([tab[t] for t in range(size)])

    def _select_entry(self, table: Point, digit: jax.Array) -> Point:
        """Branch-free 16-way table lookup: a where-chain over the table
        axis (TPUs have no hardware gather; 15 selects cost ~2% of the
        group add they feed)."""
        axis = self.f.struct_ndim
        idx0 = [slice(None)] * axis
        out = tuple(t[tuple(idx0 + [0])] for t in table)
        for tval in range(1, 1 << self.WINDOW):
            ent = tuple(t[tuple(idx0 + [tval])] for t in table)
            out = self.select(digit == tval, ent, out)
        return out

    @jit_method
    def scalar_mul_digits(self, digits: jax.Array, P: Point) -> Point:
        """[k] P with k as MSB-first 4-bit digit planes (S, *batch):
        windowed double-and-add — 4 dblings + ONE table add per digit
        (~64 adds instead of ~255 for a 255-bit scalar).  TPU analog of
        the reference's scl_windowed (bls12_381_G1_proj.c:434-468), with
        the 15-entry table batched across all points at once."""
        table = self._window_table(P)
        bs = P[0].shape[self.f.struct_ndim:]
        acc0 = self.infinity(bs)

        def body(acc, digit):
            for _ in range(self.WINDOW):
                acc = self.dbl(acc)
            return self.add(acc, self._select_entry(table, digit)), None

        acc, _ = lax.scan(body, acc0, jnp.asarray(digits, jnp.int32))
        return acc

    def scalar_mul_static(self, k: int, P: Point) -> Point:
        if k == 0:
            return self.infinity(P[0].shape[self.f.struct_ndim:])
        if k < 0:
            return self.neg(self.scalar_mul_static(-k, P))
        digits = int_to_digits_msb(k, self.WINDOW)
        bs = P[0].shape[self.f.struct_ndim:]
        d = jnp.asarray(digits, jnp.int32).reshape(
            (len(digits),) + (1,) * len(bs)
        )
        return self.scalar_mul_digits(
            jnp.broadcast_to(d, (len(digits),) + bs), P
        )

    # -- subgroup machinery (cf. is_in_subgroup / cofactor muls,
    #    bn128_G1_affine.c:113-130, bls12_381_G2_proj.c:198-207) ----------
    def set_subgroup_params(self, order: int, cofactor: int):
        self._order = order
        self._cofactor = cofactor
        self._glv = None

    def set_glv(self, beta_mont: jax.Array, lam: int):
        """Enable the GLV endomorphism phi(x, y) = (beta x, y) with
        eigenvalue lam on the r-subgroup (beta a Montgomery-form device
        constant; verified against the oracle generator at build time)."""
        self._glv = (beta_mont, lam)

    def endo(self, P: Point) -> Point:
        """phi(X:Y:Z) = (beta X : Y : Z) — ONE field mul."""
        beta, _ = self._glv
        b = jnp.broadcast_to(
            beta.reshape(beta.shape + (1,) * (P[0].ndim - beta.ndim)),
            P[0].shape,
        )
        return (self.f.mul(P[0], b), P[1], P[2])

    def is_in_subgroup(self, P: Point) -> jax.Array:
        """Branch-free subgroup membership.

        Fast paths (beyond the reference's cofactor-order mul,
        bn128_G1_affine.c:113-130): cofactor 1 => on-curve IS membership
        (BN G1); with a GLV endomorphism, on-curve AND phi(P) == lam*P
        (a ~half-width scalar mul — Scott, "A note on group membership
        tests for G1, G2 and GT", ePrint 2021/1130; differentially
        tested against the r*P == inf check incl. on-curve points
        OUTSIDE the subgroup, tests/test_curve.py)."""
        on = self.is_on_curve(P)
        if self._cofactor == 1:
            return on
        if self._glv is not None:
            _, lam = self._glv
            lamP = self.scalar_mul_static(lam, P)
            return jnp.logical_and(on, self.eq(self.endo(P), lamP))
        rP = self.scalar_mul_static(self._order, P)
        return jnp.logical_and(on, self.is_inf(rP))

    def is_in_subgroup_slow(self, P: Point) -> jax.Array:
        """The reference's own definition (on-curve AND r*P == inf) —
        kept as the differential referee for the fast paths."""
        rP = self.scalar_mul_static(self._order, P)
        return jnp.logical_and(self.is_on_curve(P), self.is_inf(rP))

    def clear_cofactor(self, P: Point) -> Point:
        """Multiply by the cofactor, mapping any curve point into the
        prime-order subgroup."""
        return self.scalar_mul_static(self._cofactor, P)

    @jit_method
    def scalar_mul_fr_std(self, k_limbs: jax.Array, P: Point) -> Point:
        """[k] P with k a CANONICAL standard-rep scalar limb plane
        (Lr, *batch) (cf. scl_big / scl_Fr_mont after from_mont);
        windowed."""
        return self.scalar_mul_digits(limbs_to_digits_msb(k_limbs), P)

    def __hash__(self):
        return id(self)

    def __eq__(self, other):
        return self is other


def limbs_to_bits(a: jax.Array) -> jax.Array:
    """(L, *batch) CANONICAL 15-bit limb planes -> (15L, *batch) bit
    planes (LE).  Inputs must be normalized (norm_std / encode)."""
    L = a.shape[0]
    shifts = jnp.arange(rl.LB, dtype=I32).reshape(
        (1, rl.LB) + (1,) * (a.ndim - 1)
    )
    bits = (a[:, None] >> shifts) & 1
    return bits.reshape((L * rl.LB,) + a.shape[1:]).astype(U32)


def limbs_to_digits_msb(a: jax.Array, w: int = 4) -> jax.Array:
    """(L, *batch) CANONICAL limb planes -> (S, *batch) MSB-first w-bit
    digit planes for windowed scalar multiplication (digits straddle the
    15-bit limb boundary, cf. bn128_G1_jac.c:600-605)."""
    bits = limbs_to_bits(a)                       # (15L, *batch) LSB-first
    nb = bits.shape[0]
    pad = (-nb) % w
    if pad:
        bits = jnp.concatenate(
            [bits, jnp.zeros((pad,) + bits.shape[1:], U32)], 0
        )
    s = bits.shape[0] // w
    bits = bits.reshape((s, w) + bits.shape[1:])
    weights = (jnp.uint32(1) << jnp.arange(w, dtype=U32)).reshape(
        (1, w) + (1,) * (bits.ndim - 2)
    )
    digits = jnp.sum(bits * weights, axis=1).astype(I32)
    return jnp.flip(digits, 0)


def int_to_digits_msb(k: int, w: int = 4):
    """Static int -> MSB-first w-bit digit list (at least one digit)."""
    assert k >= 0
    digits = []
    while k:
        digits.append(k & ((1 << w) - 1))
        k >>= w
    if not digits:
        digits = [0]
    return digits[::-1]


class CurveKernels:
    """G1 + G2 kernel bundles for one curve family (the analog of the
    monomorphic Curves.<curve>.G{1,2}.* binding modules H5)."""

    def __init__(self, curve: CurveParams):
        from .tower import get_tower
        from ..oracle.groups import g1_group, g2_group

        self.curve = curve
        self.tower = get_tower(curve)
        self.oracle_g1 = g1_group(curve)
        self.oracle_g2 = g2_group(curve) if curve.b2 is not None else None
        fp = self.tower.fp
        fp2 = self.tower.fp2
        r_bits = curve.fr.p.bit_length()

        self.g1 = ProjCurveOps(fp, 3 * curve.b, r_bits, name=f"{curve.name}/G1")
        self.g1.set_subgroup_params(curve.fr.p, curve.cofactor)
        if curve.glv_beta_lambda is not None and curve.cofactor != 1:
            # pair beta with ITS eigenvalue (lambda or lambda^2 — the
            # recorded pair need not match) by checking phi(G) on the
            # oracle generator, then enable the fast membership test
            beta, lam = curve.glv_beta_lambda
            r = curve.fr.p
            gen = self.oracle_g1.gen
            phi_g = (beta * gen[0] % curve.fp.p, gen[1])
            for cand in (lam, lam * lam % r):
                if self.oracle_g1.scalar_mul(cand, gen) == phi_g:
                    with jax.ensure_compile_time_eval():
                        self.g1.set_glv(fp.encode(beta), cand)
                    break
            else:
                raise ValueError(
                    f"{curve.name}: GLV beta does not match lambda or "
                    "lambda^2 on the generator"
                )

        if curve.b2 is not None:
            b2 = self.oracle_g2.b
            b3_g2 = self.tower.encode_fp2_const(
                (3 * b2[0] % curve.fp.p, 3 * b2[1] % curve.fp.p)
            )
            self.g2 = ProjCurveOps(fp2, b3_g2, r_bits,
                                   name=f"{curve.name}/G2")
            self.g2.set_subgroup_params(curve.fr.p, curve.g2_cofactor)
        else:
            # fields+towers+G1-only family (e.g. BLS12-377, which the
            # reference itself carries only as pure field instances)
            self.g2 = None

        self.fr = self.tower.fr
        self._msm = {}

    def rnd_point(self, key, batch_shape=(), grp: str = "g1") -> Point:
        """Random subgroup points = random scalar * generator, fully on
        device (cf. rndG1, lib/src/.../G1/Proj.hs:138-146)."""
        ops = self.g1 if grp == "g1" else self.g2
        enc = self.encode_g1 if grp == "g1" else self.encode_g2
        og = self.oracle_g1 if grp == "g1" else self.oracle_g2
        import numpy as _np
        n = int(_np.prod(batch_shape)) if batch_shape else 1
        G = ops.from_affine(enc([og.gen] * max(n, 1)))
        k = self.fr.from_mont(self.fr.rnd(key, (max(n, 1),)))
        P = ops.scalar_mul_fr_std(k, G)
        if not batch_shape:
            return tuple(p[..., 0] for p in P)
        return tuple(
            p.reshape(p.shape[:-1] + tuple(batch_shape)) for p in P
        )

    def msm(self, grp: str = "g1"):
        """Pippenger MSM kernels for 'g1' or 'g2' (lazy, cached)."""
        if grp not in self._msm:
            from .msm import CurveMSM

            ops = self.g1 if grp == "g1" else self.g2
            if ops is None:
                from ..errors import UnsupportedError

                raise UnsupportedError(
                    f"{self.curve.name} has no G2 support (fields+towers"
                    "+G1-only family)"
                )
            self._msm[grp] = CurveMSM(ops, self.fr)
        return self._msm[grp]

    # -- compressed interchange (capability extension: the reference's C
    #    has no point compression or sqrt; the device sqrt enables both
    #    batched on TPU) ----------------------------------------------------
    @staticmethod
    def _parity(f, y) -> jax.Array:
        """Parity bit of the canonical STANDARD-rep value (the sign
        convention of the compressed format)."""
        std = f.norm_std(f.from_mont(y))
        return (std[0] & 1).astype(jnp.int32)

    def _parity_fp2(self, y) -> jax.Array:
        """Fp2 sign bit: parity of c0, or of c1 when c0 = 0 (so that
        negation always flips it for y != 0)."""
        f = self.tower.fp
        p0 = self._parity(f, y[:, 0])
        p1 = self._parity(f, y[:, 1])
        return jnp.where(f.is_zero(y[:, 0]), p1, p0)

    def compress_g1(self, A: AffBatch):
        """Affine batch -> (canonical Montgomery x limbs, flags int32:
        bit0 = parity of standard-rep y, bit1 = infinity)."""
        f = self.tower.fp
        x, y, inf = A
        flags = self._parity(f, y) | (inf.astype(jnp.int32) << 1)
        return jnp.where(inf, 0, f.norm(x)), flags

    def decompress_g1(self, x: jax.Array, flags: jax.Array):
        """Inverse of compress_g1: batched device sqrt of x^3 + b and a
        parity-select.  Returns (AffBatch, valid) — valid is False where
        x is not on the curve (x^3 + b a non-residue)."""
        f = self.tower.fp
        par = flags & 1
        inf = (flags & 2) == 2
        b = jnp.broadcast_to(
            f.encode(self.curve.b).reshape((f.L,) + (1,) * (x.ndim - 1)),
            x.shape,
        )
        root, ok = f.sqrt(f.add(f.mul(f.sqr(x), x), b))
        y = f.select(self._parity(f, root) == par, root, f.neg(root))
        return (x, y, inf), jnp.logical_or(ok, inf)

    def compress_g2(self, A: AffBatch):
        """G2 analog of compress_g1 (sign = the Fp2 parity convention)."""
        x, y, inf = A
        flags = self._parity_fp2(y) | (inf.astype(jnp.int32) << 1)
        return jnp.where(inf, 0, self.tower.fp.norm(x)), flags

    def decompress_g2(self, x: jax.Array, flags: jax.Array):
        """Batched Fp2 sqrt of x^3 + b' (tower.fp2_sqrt) + parity-select."""
        t = self.tower
        f2 = t.fp2
        par = flags & 1
        inf = (flags & 2) == 2
        b2 = self.oracle_g2.b
        bb = t.encode_fp2_const((b2[0], b2[1]))
        b = jnp.broadcast_to(
            bb.reshape(bb.shape[:2] + (1,) * (x.ndim - 2)), x.shape
        )
        root, ok = t.fp2_sqrt(f2.add(f2.mul(f2.sqr(x), x), b))
        keep = self._parity_fp2(root) == par
        y = f2.select(keep, root, f2.neg(root))
        return (x, y, inf), jnp.logical_or(ok, inf)

    # -- host encode/decode --------------------------------------------------
    def encode_g1(self, pts: Sequence) -> AffBatch:
        fp = self.tower.fp
        xs = [0 if p is None else p[0] for p in pts]
        ys = [0 if p is None else p[1] for p in pts]
        infs = np.array([p is None for p in pts])
        return (fp.encode(xs), fp.encode(ys), jnp.asarray(infs))

    def decode_g1(self, A: AffBatch):
        fp = self.tower.fp
        xs, ys, infs = fp.decode(A[0]), fp.decode(A[1]), np.asarray(A[2])
        if isinstance(xs, int):
            return None if bool(infs) else (xs, ys)
        return [None if bool(i) else (x, y) for x, y, i in zip(xs, ys, infs)]

    def encode_g2(self, pts: Sequence) -> AffBatch:
        t = self.tower
        zero2 = (0, 0)
        xs = [zero2 if p is None else p[0] for p in pts]
        ys = [zero2 if p is None else p[1] for p in pts]
        infs = np.array([p is None for p in pts])
        return (t.encode_fp2(xs), t.encode_fp2(ys), jnp.asarray(infs))

    def decode_g2(self, A: AffBatch):
        t = self.tower
        xs, ys, infs = t.decode_fp2(A[0]), t.decode_fp2(A[1]), np.asarray(A[2])
        if isinstance(xs, tuple):
            return None if bool(infs) else (xs, ys)
        return [None if bool(i) else (x, y) for x, y, i in zip(xs, ys, infs)]

    def __hash__(self):
        return id(self)

    def __eq__(self, other):
        return self is other


_CURVE_CACHE: dict = {}


def get_curves(curve: CurveParams) -> CurveKernels:
    c = _CURVE_CACHE.get(curve.name)
    if c is None:
        with jax.ensure_compile_time_eval():   # see ntt.get_domain note
            c = CurveKernels(curve)
        _CURVE_CACHE[curve.name] = c
    return c
