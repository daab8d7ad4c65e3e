"""KZG polynomial commitment scheme on TPU kernels.

Mirrors examples/KZG.hs exactly: setup (:42-57), commitPoly (:77-81),
commitValues (:83-89), openingProof (:110-116), verifyProof (:120-124) —
but every stage is the batched TPU kernel: powers-of-tau by prefix scan,
Lagrange SRS by group iFFT, commitments by Pippenger MSM, verification by
the batched pairing.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

import jax
import jax.numpy as jnp

from ..params import CurveParams
from ..ops import vector as V
from ..ops.curve import get_curves, AffBatch, Point
from ..ops.gfft import get_group_fft
from ..ops.msm import CurveMSM
from ..ops.pairing import get_pairing
from ..ops.poly import get_poly_ops

U32 = jnp.uint32


@dataclass
class KZGSetup:
    curve: CurveParams
    log2_size: int
    tau_g1: AffBatch          # [tau^i] G1, affine batch (n points)
    lagrange_tau_g1: AffBatch  # Lagrange-basis SRS (group iFFT of tau_g1)
    g2: AffBatch              # G2 generator (batch of 1)
    tau_g2: AffBatch          # [tau] G2


def new_setup(curve: CurveParams, log2_size: int, tau: int,
              use_group_fft: bool = False) -> KZGSetup:
    """Trusted setup from a known tau (tests/bench only, like mkKZGSetup).

    powers of tau: log-depth prefix scan (V.powers); tau^i * G1: ONE
    batched double-and-add over all n points (the reference does n serial
    scalar muls, KZG.hs:48).

    Lagrange SRS: because tau is KNOWN here, the group iFFT collapses to
    scalars — L_j(tau) = (tau^n - 1) / (n (tau w^-j - 1)) — so the
    Lagrange points are ONE more batched scalar multiplication instead of
    a full group FFT.  `use_group_fft=True` forces the general path
    (the one a real ceremony output would need, cf. KZG.hs:55)."""
    ck = get_curves(curve)
    fr = ck.fr
    n = 1 << log2_size

    taus_mont = V.powers(fr, fr.one(()), fr.encode(tau), n)     # (L, n)
    taus_std = fr.from_mont(taus_mont)

    g1gen = ck.encode_g1([ck.oracle_g1.gen] * n)
    G = ck.g1.from_affine(g1gen)
    tau_g1_proj = ck.g1.scalar_mul_fr_std(taus_std, G)
    tau_g1 = ck.g1.to_affine(tau_g1_proj)

    if use_group_fft:
        gfft = get_group_fft(ck.g1, curve.fr, log2_size)
        lagrange_proj = gfft.ifft(ck.g1.from_affine(tau_g1))
    else:
        from ..oracle.ntt import subgroup_gen

        w = subgroup_gen(curve.fr, log2_size)
        w_inv_pows = V.powers(fr, fr.one(()), fr.encode(pow(w, -1, fr.p)), n)
        t_wj = V.scale(fr, fr.encode(tau), w_inv_pows)          # tau w^-j
        denom = fr.mul(
            fr.encode([n] * n),
            fr.sub(t_wj, fr.one((n,))),
        )
        num = fr.encode((pow(tau, n, fr.p) - 1) % fr.p)
        coeffs = fr.mul(
            jnp.broadcast_to(num.reshape(fr.L, 1), (fr.L, n)),
            fr.batch_inv(denom),
        )
        lagrange_proj = ck.g1.scalar_mul_fr_std(fr.from_mont(coeffs), G)
    lagrange = ck.g1.to_affine(lagrange_proj)

    g2 = ck.encode_g2([ck.oracle_g2.gen])
    G2 = ck.g2.from_affine(g2)
    tau_limbs = fr.encode([tau], mont=False)
    tau_g2 = ck.g2.to_affine(ck.g2.scalar_mul_fr_std(tau_limbs, G2))

    return KZGSetup(
        curve=curve,
        log2_size=log2_size,
        tau_g1=tau_g1,
        lagrange_tau_g1=lagrange,
        g2=g2,
        tau_g2=tau_g2,
    )


def _msm(ck) -> CurveMSM:
    return ck.msm("g1")


def commit_poly(setup: KZGSetup, coeffs_mont: jax.Array) -> Point:
    """Commit to coefficient form: MSM(coeffs, tau_g1) (KZG.hs:77-81)."""
    ck = get_curves(setup.curve)
    n = coeffs_mont.shape[-1]
    srs = tuple(t[..., :n] for t in setup.tau_g1)
    return _msm(ck).msm_mont(coeffs_mont, srs)


def commit_values(setup: KZGSetup, values_mont: jax.Array) -> Point:
    """Commit to evaluation form via the Lagrange SRS (KZG.hs:83-89)."""
    ck = get_curves(setup.curve)
    return _msm(ck).msm_mont(values_mont, setup.lagrange_tau_g1)


def opening_proof(setup: KZGSetup, coeffs_mont: jax.Array, x0: jax.Array
                  ) -> Tuple[jax.Array, Point]:
    """(y0 = p(x0), commitment to (p - y0)/(x - x0))  (KZG.hs:110-116).
    x0: (L,) Montgomery field element."""
    ck = get_curves(setup.curve)
    fr = ck.fr
    po = get_poly_ops(fr)
    y0 = po.eval_at(x0, coeffs_mont)                 # (L,)
    shifted = coeffs_mont.at[..., 0].set(fr.sub(coeffs_mont[..., 0], y0))
    quot, ok = po.quot_by_vanishing(shifted, 1, x0)
    del ok  # exact by construction
    return y0, commit_poly(setup, quot)


def verify_proof(setup: KZGSetup, commitment: Point, proof: Point,
                 x0: jax.Array, y0: jax.Array) -> jax.Array:
    """e(comQ, tau*G2) == e(comP + x0*comQ - y0*G1, G2)  (KZG.hs:120-124).
    x0, y0: (L,) Montgomery Fr elements.  Returns a scalar bool array."""
    ck = get_curves(setup.curve)
    pk = get_pairing(setup.curve)
    fr = ck.fr
    g1 = ck.g1
    t = pk.tower

    proof_aff = g1.to_affine(proof)
    x0_std = fr.from_mont(x0.reshape(fr.L, 1))
    y0_std = fr.from_mont(y0.reshape(fr.L, 1))
    x0Q = g1.scalar_mul_fr_std(x0_std[..., 0], proof)
    G = g1.from_affine(ck.encode_g1([ck.oracle_g1.gen]))
    G = tuple(p[..., 0] for p in G)
    y0G = g1.scalar_mul_fr_std(y0_std[..., 0], G)
    adj = g1.sub(g1.add(commitment, x0Q), y0G)

    # single multi-pairing: e(comQ, tau*G2) * e(-adj, G2) == 1 — one
    # shared final exponentiation instead of two full pairings
    neg_adj_aff = g1.to_affine(g1.neg(adj))
    Pb = tuple(
        jnp.concatenate([a, b], axis=-1)
        for a, b in zip(_as_batch(proof_aff), _as_batch(neg_adj_aff))
    )
    Qb = tuple(
        jnp.concatenate([a, b], axis=-1)
        for a, b in zip(setup.tau_g2, setup.g2)
    )
    prod = pk.pairing_product(Pb, Qb)
    return t.fp12.eq(prod, t.fp12.one(()))


def _as_batch(aff: AffBatch) -> AffBatch:
    """Ensure a single affine point has a trailing batch axis of 1."""
    x, y, inf = aff
    if inf.ndim == 0:
        return (x[..., None], y[..., None], inf[None])
    return aff
