"""Short-Weierstrass curve groups on Python ints, generic over the coordinate
field (Fp for G1, Fp2 for G2, Fp12 for pairing untwists).

Semantics anchor: the reference's affine/projective/Jacobian C kernels
(lib/cbits/curves/g1/{affine,proj,jac}/bn128_G1_*.c) and the pure curve layer
(pure/src/ZK/Algebra/Pure/Curve/SomeCurves.hs).  Points at infinity are
represented as Python `None` at the oracle level; the interchange sentinel
(all-0xFFFF limbs, cf. bn128_G1_affine.c:43-92) is applied only at the
serialization boundary.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

AffinePoint = Optional[Tuple]  # None = infinity, else (x, y) over some field


class CurveGroup:
    """y^2 = x^3 + a x + b over `field`, scalar field order `r`."""

    def __init__(self, field, a, b, r: int, gen: AffinePoint, cofactor: int = 1):
        self.f = field
        self.a = a
        self.b = b
        self.r = r
        self.gen = gen
        self.cofactor = cofactor

    # -- predicates ----------------------------------------------------------
    def is_on_curve(self, pt: AffinePoint) -> bool:
        if pt is None:
            return True
        f = self.f
        x, y = pt
        lhs = f.mul(y, y)
        rhs = f.add(f.add(f.mul(f.mul(x, x), x), f.mul(self.a, x)), self.b)
        return f.eq(lhs, rhs)

    def is_in_subgroup(self, pt: AffinePoint) -> bool:
        return self.is_on_curve(pt) and self.scalar_mul(self.r, pt) is None

    # -- group ops (affine, branchy - this is the slow oracle) ---------------
    def neg(self, pt: AffinePoint) -> AffinePoint:
        if pt is None:
            return None
        return (pt[0], self.f.neg(pt[1]))

    def dbl(self, pt: AffinePoint) -> AffinePoint:
        if pt is None:
            return None
        f = self.f
        x, y = pt
        if f.is_zero(y):
            return None
        # lambda = (3x^2 + a) / 2y
        num = f.add(_triple(f, f.mul(x, x)), self.a)
        lam = f.div(num, f.add(y, y))
        x3 = f.sub(f.mul(lam, lam), f.add(x, x))
        y3 = f.sub(f.mul(lam, f.sub(x, x3)), y)
        return (x3, y3)

    def add(self, p: AffinePoint, q: AffinePoint) -> AffinePoint:
        if p is None:
            return q
        if q is None:
            return p
        f = self.f
        x1, y1 = p
        x2, y2 = q
        if f.eq(x1, x2):
            if f.eq(y1, y2):
                return self.dbl(p)
            return None
        lam = f.div(f.sub(y2, y1), f.sub(x2, x1))
        x3 = f.sub(f.sub(f.mul(lam, lam), x1), x2)
        y3 = f.sub(f.mul(lam, f.sub(x1, x3)), y1)
        return (x3, y3)

    def sub(self, p: AffinePoint, q: AffinePoint) -> AffinePoint:
        return self.add(p, self.neg(q))

    def scalar_mul(self, k: int, pt: AffinePoint) -> AffinePoint:
        k = k % self.r if self.r else k
        if k < 0:
            k, pt = -k, self.neg(pt)
        acc = None
        while k:
            if k & 1:
                acc = self.add(acc, pt)
            pt = self.dbl(pt)
            k >>= 1
        return acc

    def scalar_mul_unreduced(self, k: int, pt: AffinePoint) -> AffinePoint:
        """Scalar mul WITHOUT reducing k mod r (for cofactor muls)."""
        if k < 0:
            k, pt = -k, self.neg(pt)
        acc = None
        while k:
            if k & 1:
                acc = self.add(acc, pt)
            pt = self.dbl(pt)
            k >>= 1
        return acc

    def msm(self, coeffs: Sequence[int], points: Sequence[AffinePoint]) -> AffinePoint:
        """Slow-reference MSM, cf. MSM_std_coeff_jac_out_slow_reference
        (bn128_G1_jac.c:659-668)."""
        assert len(coeffs) == len(points)
        acc = None
        for k, pt in zip(coeffs, points):
            acc = self.add(acc, self.scalar_mul(k, pt))
        return acc

    def rnd(self, rng) -> AffinePoint:
        return self.scalar_mul(rng.randrange(1, self.r), self.gen)

    # -- group FFT (point-valued radix-2), cf. bn128_G1_jac.c:727-838 --------
    def fft(self, root_field, gen: int, points, inverse: bool = False):
        """NTT over group elements: twiddles in the scalar field."""
        n = len(points)
        assert n & (n - 1) == 0
        if n == 1:
            return list(points)
        if inverse:
            gen = pow(gen, -1, self.r)
        out = self._fft_rec(gen, list(points))
        if inverse:
            ninv = pow(n, -1, self.r)
            out = [self.scalar_mul(ninv, p) for p in out]
        return out

    def _fft_rec(self, gen: int, xs):
        n = len(xs)
        if n == 1:
            return xs
        evens = self._fft_rec(gen * gen % self.r, xs[0::2])
        odds = self._fft_rec(gen * gen % self.r, xs[1::2])
        out = [None] * n
        tw = 1
        for k in range(n // 2):
            t = self.scalar_mul(tw, odds[k])
            out[k] = self.add(evens[k], t)
            out[k + n // 2] = self.sub(evens[k], t)
            tw = tw * gen % self.r
        return out


def _triple(f, x):
    return f.add(f.add(x, x), x)
