"""Factory helpers assembling the oracle curve groups G1 / G2 per curve
(the analog of the monomorphic Haskell modules, e.g.
lib/src/ZK/Algebra/Curves/BN128/G1/Affine.hs)."""

from __future__ import annotations

from functools import lru_cache

from ..params import CurveParams
from .curve import CurveGroup
from .ext import Tower
from .field import Fp


@lru_cache(maxsize=None)
def tower(curve: CurveParams) -> Tower:
    return Tower(curve)


@lru_cache(maxsize=None)
def g1_group(curve: CurveParams) -> CurveGroup:
    t = tower(curve)
    return CurveGroup(
        field=t.fp,
        a=curve.a % curve.fp.p,
        b=curve.b % curve.fp.p,
        r=curve.fr.p,
        gen=curve.g1_gen,
        cofactor=curve.cofactor,
    )


@lru_cache(maxsize=None)
def g2_group(curve: CurveParams) -> CurveGroup:
    t = tower(curve)
    f2 = t.fp2
    return CurveGroup(
        field=f2,
        a=f2.zero,
        b=f2.from_ints(*curve.b2),
        r=curve.fr.p,
        gen=(f2.from_ints(*curve.g2_gen[0]), f2.from_ints(*curve.g2_gen[1])),
        cofactor=curve.g2_cofactor,
    )
