"""KZG polynomial commitment oracle - mirrors examples/KZG.hs exactly:
setup (:42-57), commitPoly (:77-81), commitValues (:83-89),
openingProof (:110-116), verifyProof (:120-124)."""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Tuple

from ..params import CurveParams
from .curve import AffinePoint
from .groups import g1_group, g2_group
from .ntt import subgroup_gen
from .pairing import Pairing
from .poly import Poly


@dataclass
class KZGSetup:
    curve: CurveParams
    log2_size: int
    tau_g1: List[AffinePoint]        # [tau^i * G1]
    lagrange_tau_g1: List[AffinePoint]  # Lagrange-basis SRS (group iFFT of tau_g1)
    g2: AffinePoint
    tau_g2: AffinePoint


def new_setup(curve: CurveParams, log2_size: int, tau: int) -> KZGSetup:
    """Trusted setup from a known tau (for tests only, like mkKZGSetup)."""
    g1 = g1_group(curve)
    g2 = g2_group(curve)
    n = 1 << log2_size
    r = curve.fr.p
    taus = []
    acc = 1
    for _ in range(n):
        taus.append(acc)
        acc = acc * tau % r
    tau_g1 = [g1.scalar_mul(t, g1.gen) for t in taus]
    gen = subgroup_gen(curve.fr, log2_size)
    lagrange = g1.fft(curve.fr, gen, tau_g1, inverse=True)
    return KZGSetup(
        curve=curve,
        log2_size=log2_size,
        tau_g1=tau_g1,
        lagrange_tau_g1=lagrange,
        g2=g2.gen,
        tau_g2=g2.scalar_mul(tau, g2.gen),
    )


def commit_poly(setup: KZGSetup, poly: Poly) -> AffinePoint:
    g1 = g1_group(setup.curve)
    coeffs = poly.coeffs
    assert len(coeffs) <= len(setup.tau_g1), "polynomial too large for setup"
    return g1.msm(coeffs, setup.tau_g1[: len(coeffs)])


def commit_values(setup: KZGSetup, values: List[int]) -> AffinePoint:
    g1 = g1_group(setup.curve)
    assert len(values) == len(setup.lagrange_tau_g1)
    return g1.msm(values, setup.lagrange_tau_g1)


def opening_proof(
    setup: KZGSetup, poly: Poly, x0: int
) -> Tuple[int, AffinePoint]:
    """Returns (y0 = p(x0), commitment to the quotient (p - y0)/(x - x0))."""
    r = setup.curve.fr.p
    y0 = poly.eval_at(x0)
    shifted = poly.sub(Poly(r, [y0]))
    quot = shifted.quot_by_vanishing(1, x0)
    assert quot is not None
    return y0, commit_poly(setup, quot)


def verify_proof(
    setup: KZGSetup,
    commitment: AffinePoint,
    proof: AffinePoint,
    x0: int,
    y0: int,
) -> bool:
    """Check e(comQ, tau*G2) == e(comP + x0*comQ - y0*G1, G2)
    (examples/KZG.hs:120-124)."""
    g1 = g1_group(setup.curve)
    pairing = Pairing(setup.curve)
    lhs = pairing.pairing(proof, setup.tau_g2)
    adj = g1.sub(
        g1.add(commitment, g1.scalar_mul(x0, proof)),
        g1.scalar_mul(y0, g1.gen),
    )
    rhs = pairing.pairing(adj, setup.g2)
    return lhs == rhs
