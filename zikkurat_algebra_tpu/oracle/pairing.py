"""Optimal Ate pairing oracle (slow, trusted).

Semantics anchor: lib/cbits/curves/pairing/{bn128,bls12_381}_pairing.c.
The reference uses a tuned projective Miller loop with sparse line
multiplication and a multi-exponentiation hard part; this oracle instead:

  * untwists G2 into E(Fp12) (psi conventions exactly as the reference:
    BN D-type psi(x,y) = (x*w^2, y*w^3), bn128_pairing.c:49-57;
    BLS M-type psi(x,y) = (x*w^-2, y*w^-3), bls12_381_pairing.c:53-60),
  * runs a textbook affine Miller loop WITH vertical-line denominators, and
  * computes the final exponentiation directly as f^((p^12-1)/r).

The two strategies agree on the final pairing value (the intermediate Miller
values differ by factors killed by the final exponentiation), which is the
only well-defined interchange object.  The TPU implementation is tested
against this oracle on full pairings.
"""

from __future__ import annotations

from ..params import CurveParams
from .ext import Tower


class Pairing:
    def __init__(self, curve: CurveParams):
        self.cp = curve
        self.tower = Tower(curve)
        f12 = self.tower.fp12
        f6 = self.tower.fp6
        f2 = self.tower.fp2
        self.f12 = f12
        # w as an Fp12 element and its small powers
        w = (f6.zero, (f2.one, f2.zero, f2.zero))
        self.w2 = f12.sqr(w)
        self.w3 = f12.mul(self.w2, w)
        self.inv_w2 = f12.inv(self.w2)
        self.inv_w3 = f12.inv(self.w3)
        self.b12 = self.embed_fp(curve.b)
        self.final_exponent = (curve.fp.p ** 12 - 1) // curve.fr.p

    # -- embeddings ------------------------------------------------------------
    def embed_fp(self, a: int):
        f2, f6 = self.tower.fp2, self.tower.fp6
        return (((a % self.tower.fp.p, 0), f2.zero, f2.zero), f6.zero)

    def embed_fp2(self, a):
        f2, f6 = self.tower.fp2, self.tower.fp6
        return ((a, f2.zero, f2.zero), f6.zero)

    def psi(self, q):
        """Untwist: G2(Fp2) -> E(Fp12)."""
        if q is None:
            return None
        f12 = self.f12
        x, y = self.embed_fp2(q[0]), self.embed_fp2(q[1])
        if self.cp.family == "bn":
            return (f12.mul(x, self.w2), f12.mul(y, self.w3))
        return (f12.mul(x, self.inv_w2), f12.mul(y, self.inv_w3))

    def psi_inv(self, pt):
        """E(Fp12) -> G2(Fp2); valid only on the image of psi."""
        if pt is None:
            return None
        f12 = self.f12
        if self.cp.family == "bn":
            x = f12.mul(pt[0], self.inv_w2)
            y = f12.mul(pt[1], self.inv_w3)
        else:
            x = f12.mul(pt[0], self.w2)
            y = f12.mul(pt[1], self.w3)
        return (x[0][0], y[0][0])

    def frobenius_g2(self, q):
        """The G2 'untwist-Frobenius-twist' endomorphism
        (cf. bls12_381_pairing.c:69-75)."""
        f12 = self.f12
        x, y = self.psi(q)
        return self.psi_inv((f12.frobenius(x), f12.frobenius(y)))

    # -- affine point arithmetic over Fp12 with line values ---------------------
    def _line_dbl(self, t, p):
        """Returns (line value l_{T,T}(P) / v_{2T}(P), 2T)."""
        f = self.f12
        xt, yt = t
        xp, yp = p
        lam = f.div(
            f.add(f.add(f.sqr(xt), f.sqr(xt)), f.sqr(xt)),  # 3 xT^2 (a = 0)
            f.add(yt, yt),
        )
        x2 = f.sub(f.sqr(lam), f.add(xt, xt))
        y2 = f.sub(f.mul(lam, f.sub(xt, x2)), yt)
        l = f.sub(f.sub(yp, yt), f.mul(lam, f.sub(xp, xt)))
        v = f.sub(xp, x2)
        return f.div(l, v), (x2, y2)

    def _line_add(self, t, q, p):
        """Returns (line value l_{T,Q}(P) / v_{T+Q}(P), T+Q)."""
        f = self.f12
        xt, yt = t
        xq, yq = q
        xp, yp = p
        if f.eq(xt, xq):
            if f.eq(yt, yq):
                return self._line_dbl(t, p)
            # vertical line, T + Q = infinity
            return f.sub(xp, xt), None
        lam = f.div(f.sub(yq, yt), f.sub(xq, xt))
        x3 = f.sub(f.sub(f.sqr(lam), xt), xq)
        y3 = f.sub(f.mul(lam, f.sub(xt, x3)), yt)
        l = f.sub(f.sub(yp, yt), f.mul(lam, f.sub(xp, xt)))
        v = f.sub(xp, x3)
        return f.div(l, v), (x3, y3)

    def miller(self, s: int, qe, pe):
        """f_{s,Q}(P) for affine E(Fp12) points, textbook double-and-add."""
        f12 = self.f12
        f = f12.one
        t = qe
        for bit in bin(s)[3:]:  # skip the leading 1
            lv, t = self._line_dbl(t, pe)
            f = f12.mul(f12.sqr(f), lv)
            if bit == "1":
                lv, t = self._line_add(t, qe, pe)
                f = f12.mul(f, lv)
        return f, t

    # -- the pairing -------------------------------------------------------------
    def pairing(self, p1, q2):
        """e(P, Q) for P in G1 (affine ints or None), Q in G2 (affine Fp2 or
        None).  Returns an Fp12 (GT) element; 1 on infinity inputs
        (cf. bn128_pairing.c:327-333)."""
        f12 = self.f12
        if p1 is None or q2 is None:
            return f12.one
        pe = (self.embed_fp(p1[0]), self.embed_fp(p1[1]))
        qe = self.psi(q2)
        s = self.cp.ate_loop_count
        f, t = self.miller(s, qe, pe)
        if self.cp.family == "bn":
            # two extra Frobenius line steps: T += pi(Q), T += -pi^2(Q)
            # (bn128_pairing.c:340-355)
            pi_q = (f12.frobenius(qe[0]), f12.frobenius(qe[1]))
            pi2_q = (f12.frobenius(pi_q[0]), f12.frobenius(pi_q[1]))
            lv, t = self._line_add(t, pi_q, pe)
            f = f12.mul(f, lv)
            lv, t = self._line_add(t, (pi2_q[0], f12.neg(pi2_q[1])), pe)
            f = f12.mul(f, lv)
        # NOTE: for the negative BLS seed the common convention conjugates
        # f here; the REFERENCE does not (bls12_381_pairing.c:214-235), and
        # it is the parity anchor — both are valid bilinear pairings.
        return f12.pow(f, self.final_exponent)

    def gt_pow(self, g, k: int):
        return self.f12.pow(g, k % self.cp.fr.p)
