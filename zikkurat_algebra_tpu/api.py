"""Top-level per-curve API — the analog of the reference's polymorphic
class layer + umbrella modules (ZK.Algebra.API, Class/Pairing.hs:44-78
`PairingCurve` which ties Fp, Fp2, Fp12, Fr, G1, G2, Poly together, and
the monomorphic re-exports lib/src/ZK/Algebra/Curves/BN128.hs:22-35).

    from zikkurat_algebra_tpu.api import bn128, bls12_381

    f = bn128().fr                 # batched Montgomery field kernels
    P = bn128().g1                 # complete-formula projective group
    r = bn128().msm_g1.msm_mont(coeffs, points)
    e = bn128().pairing.pairing(Pb, Qb)
"""

from __future__ import annotations

from functools import lru_cache

from . import params as P
from .ops.bigint import bigint
from .ops.curve import CurveKernels, get_curves
from .ops.field import Field, get_field
from .ops.gfft import GroupFFT, get_group_fft
from .ops.msm import CurveMSM
from .ops.ntt import NTTDomain, get_domain
from .ops.pairing import PairingKernels, get_pairing
from .ops.poly import get_poly_ops
from .ops.tower import TowerKernels, get_tower


class CurveAPI:
    """Everything for one pairing-friendly curve family."""

    def __init__(self, curve: P.CurveParams):
        self.params = curve
        self.curves: CurveKernels = get_curves(curve)
        self.tower: TowerKernels = self.curves.tower
        self.fr: Field = self.tower.fr
        self.fp: Field = self.tower.fp
        self.fp2 = self.tower.fp2
        self.fp6 = self.tower.fp6
        self.fp12 = self.tower.fp12
        self.g1 = self.curves.g1
        self.g2 = self.curves.g2
        self.poly = get_poly_ops(self.fr)

    # heavier kernels, lazily constructed
    @property
    def msm_g1(self) -> CurveMSM:
        return self.curves.msm("g1")

    @property
    def msm_g2(self) -> CurveMSM:
        return self.curves.msm("g2")

    @property
    def pairing(self) -> PairingKernels:
        return get_pairing(self.params)

    def ntt_domain(self, log2_size: int) -> NTTDomain:
        """Fr evaluation domain (the analog of `getFFTSubgroup`)."""
        return get_domain(self.fr, log2_size)

    def group_fft(self, log2_size: int, grp: str = "g1") -> GroupFFT:
        ops = self.g1 if grp == "g1" else self.g2
        return get_group_fft(ops, self.params.fr, log2_size)

    # encode/decode passthroughs
    def encode_g1(self, pts):
        return self.curves.encode_g1(pts)

    def decode_g1(self, aff):
        return self.curves.decode_g1(aff)

    def encode_g2(self, pts):
        return self.curves.encode_g2(pts)

    def decode_g2(self, aff):
        return self.curves.decode_g2(aff)

    # compressed interchange (batched device sqrt; extension over the
    # reference, whose C has neither sqrt nor compression)
    def compress_g1(self, aff):
        return self.curves.compress_g1(aff)

    def decompress_g1(self, x, flags):
        return self.curves.decompress_g1(x, flags)

    def compress_g2(self, aff):
        return self.curves.compress_g2(aff)

    def decompress_g2(self, x, flags):
        return self.curves.decompress_g2(x, flags)

    def __repr__(self):
        return f"CurveAPI({self.params.name})"


@lru_cache(maxsize=None)
def bn128() -> CurveAPI:
    return CurveAPI(P.BN128)


@lru_cache(maxsize=None)
def bls12_381() -> CurveAPI:
    return CurveAPI(P.BLS12_381)


@lru_cache(maxsize=None)
def curve_api(name: str) -> CurveAPI:
    return CurveAPI(P.CURVES[name])


__all__ = [
    "CurveAPI", "bn128", "bls12_381", "curve_api", "bigint",
    "get_field", "get_domain",
]
