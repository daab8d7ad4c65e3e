"""Optimal Ate pairing on limb planes (BN128 and BLS12-381).

TPU analog of lib/cbits/curves/pairing/{bn128,bls12_381}_pairing.c (C13).
Architecture (branch-free, batched, division-free):

* Miller loop over the TWISTED curve: T stays projective over Fp2 (the
  complete-formula curve kernels do the point updates), line values are
  computed denominator-free — the discarded factors all lie in Fp2* and
  die in the final exponentiation.
* Sparse line placement by twist type, derived from the untwist maps
  (psi as in bn128_pairing.c:49-57 / bls12_381_pairing.c:53-60):
    D-type (BN):  l = (Lam*yp)  + (-theta*xp) w  + (theta*xq - Lam*yq) w^3
    M-type (BLS): same triple at w^0 <-> w^3 and w -> w^2 mirrored
  (the reference's (1, w, w^3) D-type combine, bn128_pairing.c:195-202,
  and M-type combine, bls12_381_pairing.c:85-90).
* BN extra Frobenius steps T += pi(Q), T += -pi^2(Q) with the G2
  Frobenius endomorphism phi(x, y) = (g_x * conj x, g_y * conj y),
  g_x = xi^((p-1)/3), g_y = xi^((p-1)/2)  (bn128_pairing.c:327-358).
* Final exponentiation: easy part (p^6-1)(p^2+1) via conjugation, one
  Fp12 inverse and Frobenius; hard part (p^4-p^2+1)/r as one static-bit
  pow scan.  (The reference's multi-exponentiation hard part,
  bls12_381_pairing.c:241-328, is an optimization of the same map; GT
  values agree.)

Everything is batched: e(P_i, Q_i) for whole arrays of pairs at once —
the reference computes one pairing per call.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax

from ..params import CurveParams
from ..utils.jit import jit_method
from .curve import CurveKernels, get_curves, Point, AffBatch

U32 = jnp.uint32


class PairingKernels:
    def __init__(self, curve: CurveParams):
        from ..oracle.pairing import Pairing as OraclePairing

        self.curve = curve
        self.ck: CurveKernels = get_curves(curve)
        self.tower = self.ck.tower
        self.oracle = OraclePairing(curve)

        p = curve.fp.p
        t = self.tower
        # G2-Frobenius constants: psi o frob o psi^-1 gives
        #   x -> conj(x) * xi^(+-(p-1)/3),  y -> conj(y) * xi^(+-(p-1)/2)
        # with + for the D-type untwist (BN, psi uses w^2) and - for the
        # M-type untwist (BLS, psi uses w^-2) — bn128_pairing.c:49-57 vs
        # bls12_381_pairing.c:53-60.
        xi = self.oracle.tower.fp2.xi
        o2 = self.oracle.tower.fp2
        sign = 1 if curve.family == "bn" else -1
        self.gx_const = t.encode_fp2_const(o2.pow(xi, sign * (p - 1) // 3))
        self.gy_const = t.encode_fp2_const(o2.pow(xi, sign * (p - 1) // 2))

        # Miller loop bits of |s|, MSB-first with the leading 1 dropped
        s = curve.ate_loop_count
        self.loop_bits = [int(b) for b in bin(s)[3:]]

        # hard exponent (p^4 - p^2 + 1) // r  (the cyclotomic-phi_12 part)
        self.hard_exp = (p ** 4 - p ** 2 + 1) // curve.fr.p

        # Frobenius decomposition of the hard part: base-p digits e_j so
        # y^hard = prod_j (y^(p^j))^(e_j), run as ONE simultaneous
        # multi-exponentiation over max bitlen(e_j) steps (~p bits) instead
        # of bitlen(hard) (~4p bits) — the TPU analog of the reference's
        # simultaneous hard expo (bls12_381_pairing.c:241-328,
        # bn128_pairing.c:235-321).
        digits = []
        h = self.hard_exp
        while h:
            digits.append(h % p)
            h //= p
        self.hard_digits = digits
        steps = max(d.bit_length() for d in digits)
        import numpy as _np
        idx = _np.zeros(steps, _np.int32)
        for j, d in enumerate(digits):
            for t in range(steps):
                idx[steps - 1 - t] |= ((d >> t) & 1) << j
        self.hard_subset_idx = idx  # MSB-first subset index per step

    # ------------------------------------------------------------------
    def _const2(self, c, like):
        """Broadcast an (L, 2) Fp2 constant against an Fp2 batch array."""
        cb = jnp.reshape(c, c.shape + (1,) * (like.ndim - c.ndim))
        return jnp.broadcast_to(cb, like.shape)

    def g2_frobenius(self, xy: Tuple[jax.Array, jax.Array]):
        """phi(x, y) = (g_x * conj x, g_y * conj y) on affine Fp2 coords
        (the untwist-Frobenius-twist endomorphism, bls12_381_pairing.c:69-75)."""
        f2 = self.tower.fp2
        x, y = xy
        return (
            f2.mul(f2.conj(x), self._const2(self.gx_const, x)),
            f2.mul(f2.conj(y), self._const2(self.gy_const, y)),
        )

    # ------------------------------------------------------------------
    def _sparse12(self, c_y, c_x, c_base):
        """Assemble the sparse line value as a full Fp12 element.

        w-power placement (w-slot i, v-slot j <-> w^(i+2j)):
          D-type: c_y at w^0, c_x at w^1, c_base at w^3
          M-type: c_base at w^0, c_x at w^2, c_y at w^3
        """
        f2 = self.tower.fp2
        z = jnp.zeros_like(c_y)
        if self.curve.family == "bn":
            w0, w1, w2, w3 = c_y, c_x, z, c_base
        else:
            w0, w1, w2, w3 = c_base, z, c_x, c_y
        # fp6 components: A = (w0, w2, w4), B = (w1, w3, w5)
        A = jnp.stack([w0, w2, z], 1)
        B = jnp.stack([w1, w3, z], 1)
        return jnp.stack([A, B], 1)

    def _line_dbl(self, T: Point, xp, yp):
        """Line coefficients for the doubling step (projective T, a=0):
        triple (2YZ^2*yp, -3X^2 Z*xp, 3X^3 - 2Y^2 Z), all Fp2 (xp, yp are
        the G1 affine coordinates, embedded as Fp2 scalars on axis u=0)."""
        f2 = self.tower.fp2
        X, Y, Z = T
        Ysq = f2.sqr(Y)
        Xsq = f2.sqr(X)
        X3 = f2.mul(Xsq, X)
        YZ = f2.mul(Y, Z)
        c_y = f2.scale_base(yp, f2.mul(f2.add(YZ, YZ), Z))      # 2YZ^2 * yp
        t3x2z = f2.mul(f2.add(f2.add(Xsq, Xsq), Xsq), Z)        # 3X^2 Z
        c_x = f2.neg(f2.scale_base(xp, t3x2z))                  # -3X^2 Z * xp
        t3x3 = f2.add(f2.add(X3, X3), X3)
        c_base = f2.sub(t3x3, f2.mul(f2.add(Ysq, Ysq), Z))      # 3X^3 - 2Y^2 Z
        return c_y, c_x, c_base

    def _line_add(self, T: Point, Q: Tuple[jax.Array, jax.Array], xp, yp):
        """Line coefficients for the mixed-addition step:
        theta = Y - yq Z, Lam = X - xq Z;
        triple (Lam*yp, -theta*xp, theta*xq - Lam*yq)."""
        f2 = self.tower.fp2
        X, Y, Z = T
        xq, yq = Q
        theta = f2.sub(Y, f2.mul(yq, Z))
        lam = f2.sub(X, f2.mul(xq, Z))
        c_y = f2.scale_base(yp, lam)
        c_x = f2.neg(f2.scale_base(xp, theta))
        c_base = f2.sub(f2.mul(theta, xq), f2.mul(lam, yq))
        return c_y, c_x, c_base

    # ------------------------------------------------------------------
    @jit_method
    def miller_loop(self, P: AffBatch, Q: AffBatch) -> jax.Array:
        """f_{s,Q}(P) (up to Fp2* factors); batched over the last axis.
        cf. miller_loop bn128_pairing.c:208-230 / bls12_381_pairing.c:214-235."""
        t = self.tower
        f2, f12, fp = t.fp2, t.fp12, t.fp
        g2ops = self.ck.g2
        xp, yp, _p_inf = P
        xq, yq, _q_inf = Q
        batch = xp.shape[1:]

        f = f12.one(batch)
        T = g2ops.from_affine(Q)
        Qp = (xq, yq)

        # one lax.scan over the static loop bits — a single compiled body
        # instead of a 64x-unrolled graph (compile-time critical).  The
        # bit is a SCALAR, so lax.cond stays a real branch on TPU and the
        # add-step work is skipped on zero bits (~35% of Miller time).
        def step(carry, bit):
            f, T = carry
            cy, cx, cb = self._line_dbl(T, xp, yp)
            T2 = g2ops.dbl(T)
            fd = f12.mul(f12.sqr(f), self._sparse12(cy, cx, cb))

            def with_add(args):
                fd, T2 = args
                cy, cx, cb = self._line_add(T2, Qp, xp, yp)
                T3 = g2ops.madd(T2, Q)
                return f12.mul(fd, self._sparse12(cy, cx, cb)), T3

            def without_add(args):
                return args

            fo, To = lax.cond(bit == 1, with_add, without_add, (fd, T2))
            return (fo, To), None

        bits = jnp.asarray(self.loop_bits, U32)
        (f, T), _ = lax.scan(step, (f, T), bits)

        if self.curve.family == "bn":
            # extra Frobenius line steps (bn128_pairing.c:340-355)
            piQ = self.g2_frobenius(Qp)
            pi2Q = self.g2_frobenius(piQ)
            pi2Q = (pi2Q[0], f2.neg(pi2Q[1]))
            inf_mask = jnp.zeros(batch, jnp.bool_)
            cy, cx, cb = self._line_add(T, piQ, xp, yp)
            T = g2ops.madd(T, (piQ[0], piQ[1], inf_mask))
            f = f12.mul(f, self._sparse12(cy, cx, cb))
            cy, cx, cb = self._line_add(T, pi2Q, xp, yp)
            T = g2ops.madd(T, (pi2Q[0], pi2Q[1], inf_mask))
            f = f12.mul(f, self._sparse12(cy, cx, cb))
        # negative BLS seed: the common convention conjugates f here; the
        # reference does NOT (bls12_381_pairing.c) and is the parity anchor
        return f

    @jit_method
    def cyclotomic_sqr(self, a: jax.Array) -> jax.Array:
        """Granger-Scott squaring for elements of the cyclotomic subgroup
        (anything after the easy part of the final exponentiation):
        3 Fp4 squarings = 9 base-field products in ONE fused kernel — half
        the cost of a generic Fp12 squaring.  Formula sign placement was
        derived numerically against the oracle for BOTH curves.

        Fp4 = Fp2[z]/(z^2 - xi) with z = w^3; w-basis pairs
        U=(c0,c3), V=(c1,c4), W=(c2,c5)."""
        t = self.tower
        f2 = t.fp2
        fp = t.fp
        c = [a[:, 0, 0], a[:, 1, 0], a[:, 0, 1], a[:, 1, 1], a[:, 0, 2], a[:, 1, 2]]
        U, V, W = (c[0], c[3]), (c[1], c[4]), (c[2], c[5])
        # the 2x terms go through a fused Montgomery multiplication by the
        # constant 2 so every output term is REDUCED — a raw
        # scale_small(input, 2) compounds x2 per squaring and the value
        # bound explodes over the ~1300-iteration hard-expo chain
        prods = f2.mul_list([
            (U[0], U[0]), (U[1], U[1]), (U[0], U[1]),
            (V[0], V[0]), (V[1], V[1]), (V[0], V[1]),
            (W[0], W[0]), (W[1], W[1]), (W[0], W[1]),
        ])
        d2 = fp.mul_many(
            jnp.stack([U[0], U[1], V[0], V[1], W[0], W[1]], 1),
            jnp.broadcast_to(
                jnp.asarray(fp.encode(2)).reshape(
                    (fp.L,) + (1,) * (U[0].ndim)
                ),
                (fp.L, 6) + U[0].shape[1:],
            ),
        )
        U2, V2, W2 = (d2[:, 0], d2[:, 1]), (d2[:, 2], d2[:, 3]), (d2[:, 4], d2[:, 5])

        def sq4(i):
            x0s, x1s, x01 = prods[3 * i:3 * i + 3]
            return f2.add(x0s, t.mul_xi(x1s)), f2.add(x01, x01)

        sU, sV, sW = sq4(0), sq4(1), sq4(2)
        zW = (t.mul_xi(sW[1]), sW[0])          # z * sq4(W)

        def th(x):
            return f2.scale_small(x, 3)

        o0 = f2.sub(th(sU[0]), U2[0])
        o3 = f2.add(th(sU[1]), U2[1])
        o1 = f2.add(th(zW[0]), V2[0])
        o4 = f2.sub(th(zW[1]), V2[1])
        o2 = f2.sub(th(sV[0]), W2[0])
        o5 = f2.add(th(sV[1]), W2[1])
        fp6_a = jnp.stack([o0, o2, o4], 1)
        fp6_b = jnp.stack([o1, o3, o5], 1)
        return jnp.stack([fp6_a, fp6_b], 1)

    @jit_method
    def final_exp(self, f: jax.Array) -> jax.Array:
        """f^((p^12-1)/r): easy part via conj/inv/frobenius; hard part as
        a SIMULTANEOUS Frobenius multi-exponentiation (Straus): bases
        y^(p^j) from j Frobenius maps, all 2^J subset products
        precomputed, one scan of max-bitlen(e_j) steps, each ONE
        Granger-Scott cyclotomic squaring + ONE Fp12 multiply by the
        table entry picked by the static per-step subset index
        (cf. bls12_381_pairing.c:241-328 — there 4 interleaved bit scans,
        here one table-select scan; ~4x fewer serial squarings than the
        direct ~4p-bit exponent)."""
        t = self.tower
        f12 = t.fp12
        # easy: f <- f^(p^6 - 1) = conj(f) * inv(f)
        f1 = f12.mul(t.fp12_conj(f), f12.inv(f))
        # easy: f <- f^(p^2 + 1)  — lands in the cyclotomic subgroup
        y = f12.mul(t.fp12_frobenius(f1, 2), f1)

        batch = f.shape[4:]
        J = len(self.hard_digits)
        bases = [y]
        for _ in range(1, J):
            bases.append(t.fp12_frobenius(bases[-1], 1))
        # subset products T[s] = prod_{j in s} bases[j]; T[0] = 1
        T = [f12.one(batch)]
        for s in range(1, 1 << J):
            j = (s & -s).bit_length() - 1       # lowest set bit
            rest = s & (s - 1)
            T.append(bases[j] if rest == 0 else f12.mul(T[rest], bases[j]))
        Tstk = jnp.stack(T, axis=4)             # (L,2,3,2, 2^J, *batch)

        def body(acc, i):
            acc = self.cyclotomic_sqr(acc)
            m = lax.dynamic_index_in_dim(Tstk, i, axis=4, keepdims=False)
            return f12.mul(acc, m), None

        acc, _ = lax.scan(
            body, f12.one(batch), jnp.asarray(self.hard_subset_idx)
        )
        return acc

    @jit_method
    def pairing(self, P: AffBatch, Q: AffBatch) -> jax.Array:
        """Full optimal-Ate pairing e(P, Q), batched; infinity inputs give
        1 (bn128_pairing.c:327-333)."""
        t = self.tower
        f12 = t.fp12
        f = self.miller_loop(P, Q)
        out = self.final_exp(f)
        one = f12.one(P[0].shape[1:])
        inf = jnp.logical_or(P[2], Q[2])
        return f12.select(inf, one, out)

    @jit_method
    def pairing_product(self, P: AffBatch, Q: AffBatch) -> jax.Array:
        """prod_i e(P_i, Q_i): the batched Miller loops share ONE final
        exponentiation (the standard multi-pairing verifier trick — the
        reference computes pairings one at a time)."""
        t = self.tower
        f12 = t.fp12
        f = self.miller_loop(P, Q)
        one = f12.one(P[0].shape[1:])
        inf = jnp.logical_or(P[2], Q[2])
        f = f12.select(inf, one, f)
        # tree-reduce the batch axis, then one final exponentiation
        while f.shape[-1] > 1:
            k = f.shape[-1]
            if k % 2:
                f = jnp.concatenate([f, f12.one((1,))], -1)
                k += 1
            f = f12.mul(f[..., :k // 2], f[..., k // 2:])
        return self.final_exp(f[..., 0])

    def __hash__(self):
        return id(self)

    def __eq__(self, other):
        return self is other


_PAIRING_CACHE: dict = {}


def get_pairing(curve: CurveParams) -> PairingKernels:
    if curve.b2 is None:
        from ..errors import UnsupportedError

        raise UnsupportedError(
            f"{curve.name} has no G2/pairing support (fields+towers+G1-"
            "only family; the reference likewise carries it only as pure "
            "field instances)"
        )
    pk = _PAIRING_CACHE.get(curve.name)
    if pk is None:
        with jax.ensure_compile_time_eval():   # see ntt.get_domain note
            pk = PairingKernels(curve)
        _PAIRING_CACHE[curve.name] = pk
    return pk
