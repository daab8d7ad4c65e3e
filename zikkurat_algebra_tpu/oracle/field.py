"""Prime-field arithmetic on Python ints.

Semantics anchor: the reference's generic raw kernels
(pure/src/ZK/Algebra/Pure/Raw/Generic.hs:19-50) and the Montgomery interchange
contract (lib/cbits/curves/fields/mont/bn128_Fr_mont.c:325-357): Montgomery
form of `a` is `a * R mod p` with R = 2^(64 * nwords) == 2^(16 * nlimbs).
"""

from __future__ import annotations

from typing import List, Sequence

from ..params import FieldParams, LIMB_BITS, LIMB_MASK


class Fp:
    """A prime field GF(p) acting on plain ints in [0, p)."""

    def __init__(self, params: FieldParams):
        self.params = params
        self.p = params.p
        self.zero = 0
        self.one = 1

    # -- ring ops ----------------------------------------------------------
    def add(self, a: int, b: int) -> int:
        c = a + b
        return c - self.p if c >= self.p else c

    def sub(self, a: int, b: int) -> int:
        c = a - b
        return c + self.p if c < 0 else c

    def neg(self, a: int) -> int:
        return (self.p - a) if a else 0

    def mul(self, a: int, b: int) -> int:
        return (a * b) % self.p

    def sqr(self, a: int) -> int:
        return (a * a) % self.p

    def eq(self, a: int, b: int) -> bool:
        return a == b

    def is_zero(self, a: int) -> bool:
        return a == 0

    def scale_int(self, k: int, a: int) -> int:
        return (k * a) % self.p

    def from_int(self, a: int) -> int:
        return a % self.p

    # -- field ops ----------------------------------------------------------
    def inv(self, a: int) -> int:
        if a == 0:
            # the reference returns 0 for inv(0) (binary-Euclid code path,
            # bn128_Fr_std.c:298-315 yields 0); keep that convention
            return 0
        return pow(a, -1, self.p)

    def div(self, a: int, b: int) -> int:
        return self.mul(a, self.inv(b))

    def div_by_2(self, a: int) -> int:
        # matches bn128_Fr_std.c:241-249: (a + p)/2 when odd
        return a >> 1 if a % 2 == 0 else (a + self.p) >> 1

    def pow(self, a: int, e: int) -> int:
        if e < 0:
            return pow(self.inv(a), -e, self.p)
        return pow(a, e, self.p)

    # -- square roots (Tonelli-Shanks), cf. pure/.../Field/Sqrt.hs ----------
    def is_square(self, a: int) -> bool:
        if a == 0:
            return True
        return pow(a, (self.p - 1) // 2, self.p) == 1

    def sqrt(self, a: int):
        p = self.p
        if a == 0:
            return 0
        if pow(a, (p - 1) // 2, p) != 1:
            return None
        if p % 4 == 3:
            return pow(a, (p + 1) // 4, p)
        # Tonelli-Shanks
        q, s = p - 1, 0
        while q % 2 == 0:
            q //= 2
            s += 1
        z = 2
        while pow(z, (p - 1) // 2, p) != p - 1:
            z += 1
        m, c, t, r = s, pow(z, q, p), pow(a, q, p), pow(a, (q + 1) // 2, p)
        while t != 1:
            i, tt = 0, t
            while tt != 1:
                tt = tt * tt % p
                i += 1
            b = pow(c, 1 << (m - i - 1), p)
            m, c = i, b * b % p
            t, r = t * c % p, r * b % p
        return r

    # -- Montgomery serialization -------------------------------------------
    def to_mont(self, a: int) -> int:
        return (a * self.params.r_mont) % self.p

    def from_mont(self, a: int) -> int:
        return (a * pow(self.params.r_mont, -1, self.p)) % self.p

    def to_limbs(self, a: int) -> List[int]:
        """Little-endian 16-bit limbs (length nlimbs)."""
        return [(a >> (LIMB_BITS * i)) & LIMB_MASK for i in range(self.params.nlimbs)]

    def from_limbs(self, limbs: Sequence[int]) -> int:
        acc = 0
        for i, w in enumerate(limbs):
            acc |= (int(w) & LIMB_MASK) << (LIMB_BITS * i)
        return acc

    def rnd(self, rng) -> int:
        return rng.randrange(self.p)


def batch_inv(field: Fp, xs: Sequence[int]) -> List[int]:
    """Montgomery batch-inversion trick; zeros map to zero
    (cf. bn128_Fr_mont.c:258-285)."""
    n = len(xs)
    prefix = [0] * n
    acc = 1
    for i, x in enumerate(xs):
        prefix[i] = acc
        if x != 0:
            acc = (acc * x) % field.p
    inv_acc = field.inv(acc)
    out = [0] * n
    for i in range(n - 1, -1, -1):
        if xs[i] != 0:
            out[i] = (inv_acc * prefix[i]) % field.p
            inv_acc = (inv_acc * xs[i]) % field.p
    return out


def jacobi(n: int, k: int) -> int:
    """Jacobi symbol (n|k) for odd positive k — the generalized Legendre
    symbol (cf. the reference's pure/src/ZK/Algebra/Pure/Jacobi.hs).
    Binary algorithm via quadratic reciprocity; returns -1/0/1."""
    if k <= 0 or k % 2 == 0:
        raise ValueError("jacobi (n|k): k must be odd and positive")
    n %= k
    t = 1
    while n:
        while n % 2 == 0:
            n //= 2
            if k % 8 in (3, 5):
                t = -t
        n, k = k, n
        if n % 4 == 3 and k % 4 == 3:
            t = -t
        n %= k
    return t if k == 1 else 0
