"""End-to-end KZG + group-FFT tests vs the oracle (the integration
workload of examples/KZG.hs; mirrors its commit/open/verify roundtrip)."""

import numpy as np
import jax.numpy as jnp
import pytest

from zikkurat_algebra_tpu import params as P
from zikkurat_algebra_tpu.ops.curve import get_curves
from zikkurat_algebra_tpu.ops.gfft import get_group_fft
from zikkurat_algebra_tpu.oracle import kzg as okzg
from zikkurat_algebra_tpu.oracle.poly import Poly as OraclePoly
from zikkurat_algebra_tpu.oracle.ntt import subgroup_gen
from zikkurat_algebra_tpu.protocols import kzg


def test_group_fft_vs_oracle(rng):
    curve = P.BN128
    ck = get_curves(curve)
    og = ck.oracle_g1
    m = 3
    n = 1 << m
    pts = [og.rnd(rng) for _ in range(n)]
    pts[2] = None
    gen = subgroup_gen(curve.fr, m)
    want_f = og.fft(curve.fr, gen, pts)
    want_i = og.fft(curve.fr, gen, pts, inverse=True)
    gf = get_group_fft(ck.g1, curve.fr, m)
    Pp = ck.g1.from_affine(ck.encode_g1(pts))
    got_f = ck.decode_g1(ck.g1.to_affine(gf.fft(Pp)))
    assert got_f == want_f
    got_i = ck.decode_g1(ck.g1.to_affine(gf.ifft(Pp)))
    assert got_i == want_i


def test_kzg_end_to_end(rng):
    curve = P.BN128
    ck = get_curves(curve)
    fr = ck.fr
    m = 3
    n = 1 << m
    tau = rng.randrange(2, fr.p)

    setup = kzg.new_setup(curve, m, tau)
    osetup = okzg.new_setup(curve, m, tau)
    # SRS matches oracle exactly
    assert ck.decode_g1(setup.tau_g1) == osetup.tau_g1
    assert ck.decode_g1(setup.lagrange_tau_g1) == osetup.lagrange_tau_g1
    assert ck.decode_g2(setup.tau_g2) == [osetup.tau_g2]

    coeffs = [rng.randrange(fr.p) for _ in range(n)]
    cm = fr.encode(coeffs)
    com = kzg.commit_poly(setup, cm)
    want_com = okzg.commit_poly(osetup, OraclePoly(fr.p, coeffs))
    assert ck.decode_g1(ck.g1.to_affine(com)) == want_com

    # opening proof at x0
    x0 = rng.randrange(fr.p)
    y0, proof = kzg.opening_proof(setup, cm, fr.encode(x0))
    oy0, oproof = okzg.opening_proof(osetup, OraclePoly(fr.p, coeffs), x0)
    assert fr.decode(y0) == oy0
    assert ck.decode_g1(ck.g1.to_affine(proof)) == oproof

    # verification accepts the honest proof and rejects a corrupted one
    ok = kzg.verify_proof(setup, com, proof, fr.encode(x0), y0)
    assert bool(ok)
    bad_y = fr.encode((oy0 + 1) % fr.p)
    bad = kzg.verify_proof(setup, com, proof, fr.encode(x0), bad_y)
    assert not bool(bad)


def test_commit_values(rng):
    curve = P.BN128
    ck = get_curves(curve)
    fr = ck.fr
    m = 3
    tau = rng.randrange(2, fr.p)
    setup = kzg.new_setup(curve, m, tau)
    osetup = okzg.new_setup(curve, m, tau)
    values = [rng.randrange(fr.p) for _ in range(1 << m)]
    got = kzg.commit_values(setup, fr.encode(values))
    want = okzg.commit_values(osetup, values)
    assert ck.decode_g1(ck.g1.to_affine(got)) == want
