"""Self-tests for the pure-Python oracle.

Mirrors the reference's pure-library self-tests (pure/test/Run.hs:72-134):
field/ring laws, Sage-pinned tower sanity vectors
(pure/src/ZK/Algebra/Pure/Instances/BN254.hs:41-83), curve group laws,
NTT roundtrips, pairing bilinearity, and a KZG end-to-end roundtrip.
"""

import pytest

from zikkurat_algebra_tpu.params import BN128, BLS12_381, FIELDS
from zikkurat_algebra_tpu.oracle.field import Fp, batch_inv
from zikkurat_algebra_tpu.oracle.ext import Tower
from zikkurat_algebra_tpu.oracle.groups import g1_group, g2_group
from zikkurat_algebra_tpu.oracle.ntt import ntt, intt, subgroup_gen
from zikkurat_algebra_tpu.oracle.poly import Poly
from zikkurat_algebra_tpu.oracle.pairing import Pairing
from zikkurat_algebra_tpu.oracle import kzg

CURVES = [BN128, BLS12_381]
N_SAMPLES = 20


# ---------------------------------------------------------------------------
# prime fields
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("fparams", FIELDS.values(), ids=list(FIELDS))
def test_field_laws(fparams, rng):
    f = Fp(fparams)
    for _ in range(N_SAMPLES):
        a, b, c = (f.rnd(rng) for _ in range(3))
        assert f.add(a, f.neg(a)) == 0
        assert f.add(f.add(a, b), c) == f.add(a, f.add(b, c))
        assert f.mul(a, f.add(b, c)) == f.add(f.mul(a, b), f.mul(a, c))
        assert f.mul(a, f.inv(a)) == 1 or a == 0
        assert f.add(f.div_by_2(a), f.div_by_2(a)) == a
        assert f.pow(a, fparams.p - 1) == 1 or a == 0
        assert f.inv(a) == f.pow(a, fparams.p - 2)  # Fermat == ext-Euclid
        # sqrt roundtrip
        s = f.mul(a, a)
        root = f.sqrt(s)
        assert root is not None and f.mul(root, root) == s


@pytest.mark.parametrize("fparams", FIELDS.values(), ids=list(FIELDS))
def test_montgomery_serialization(fparams, rng):
    f = Fp(fparams)
    for _ in range(N_SAMPLES):
        a = f.rnd(rng)
        m = f.to_mont(a)
        assert f.from_mont(m) == a
        assert f.from_limbs(f.to_limbs(a)) == a
    # R in Montgomery form is the limb-encoding used by the reference:
    # mont(1) == R mod p
    assert f.to_mont(1) == fparams.r_mont % fparams.p


def test_batch_inv(rng):
    f = Fp(BN128.fr)
    xs = [f.rnd(rng) for _ in range(17)] + [0, 0]
    got = batch_inv(f, xs)
    assert got == [f.inv(x) for x in xs]


def test_fft_domain_generators():
    for fp in (BN128.fr, BLS12_381.fr):
        m, g = fp.fft_domain
        assert pow(g, 1 << m, fp.p) == 1
        assert pow(g, 1 << (m - 1), fp.p) == fp.p - 1  # exact order 2^m


# ---------------------------------------------------------------------------
# towers - including the reference's Sage-pinned sanity vectors
# ---------------------------------------------------------------------------

def test_bn254_tower_sage_vectors():
    """Hardcoded expected squares from
    pure/src/ZK/Algebra/Pure/Instances/BN254.hs:41-83 (verified vs Sage)."""
    t = Tower(BN128)
    f2, f6, f12 = t.fp2, t.fp6, t.fp12

    ize2 = (111, 222)
    ref2 = (
        21888242871839275222246405745257275088696311157297823662689037894645226171620,
        49284,
    )
    assert f2.sqr(ize2) == ref2

    ize6 = ((111, 222), (333, 444), (555, 666))
    ref6_flat = [
        21888242871839275222246405745257275088696311157297823662689037894645223239222,
        8255070,
        21888242871839275222246405745257275088696311157297823662689037894645224126334,
        6764229,
        21888242871839275222246405745257275088696311157297823662689037894645225949842,
        689976,
    ]
    got6 = f6.coeffs(f6.sqr(ize6))
    assert got6 == ref6_flat

    ize12 = f12.from_coeffs([111 * i for i in range(1, 13)])
    ref12_flat = [
        21888242871839275222246405745257275088696311157297823662689037894645210462345,
        65658609,
        21888242871839275222246405745257275088696311157297823662689037894645213912225,
        55974303,
        21888242871839275222246405745257275088696311157297823662689037894645219727737,
        33180453,
        21888242871839275222246405745257275088696311157297823662689037894645214799337,
        40610016,
        21888242871839275222246405745257275088696311157297823662689037894645218791341,
        29496474,
        21888242871839275222246405745257275088696311157297823662689037894645225247545,
        4484844,
    ]
    assert f12.coeffs(f12.sqr(ize12)) == ref12_flat


@pytest.mark.parametrize("curve", CURVES, ids=lambda c: c.name)
def test_tower_laws(curve, rng):
    t = Tower(curve)
    for field in (t.fp2, t.fp6, t.fp12):
        for _ in range(5):
            a, b = field.rnd(rng), field.rnd(rng)
            assert field.add(a, field.neg(a)) == field.zero
            assert field.mul(a, b) == field.mul(b, a)
            assert field.mul(a, field.inv(a)) == field.one
            assert field.sqr(a) == field.mul(a, a)


@pytest.mark.parametrize("curve", CURVES, ids=lambda c: c.name)
def test_frobenius(curve, rng):
    t = Tower(curve)
    for _ in range(3):
        a = t.fp12.rnd(rng)
        assert t.fp12.frobenius(a) == t.fp12.pow(a, curve.fp.p)
        # 12 applications = identity
        b = a
        for _ in range(12):
            b = t.fp12.frobenius(b)
        assert b == a
    a = t.fp2.rnd(rng)
    assert t.fp2.frobenius(a) == t.fp2.pow(a, curve.fp.p)


# ---------------------------------------------------------------------------
# curves
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("curve", CURVES, ids=lambda c: c.name)
def test_g1_group_laws(curve, rng):
    g1 = g1_group(curve)
    assert g1.is_on_curve(g1.gen)
    assert g1.is_in_subgroup(g1.gen)
    for _ in range(5):
        p, q = g1.rnd(rng), g1.rnd(rng)
        assert g1.is_on_curve(p)
        assert g1.add(p, q) == g1.add(q, p)
        assert g1.add(p, g1.neg(p)) is None
        assert g1.dbl(p) == g1.add(p, p)
        k, l = rng.randrange(g1.r), rng.randrange(g1.r)
        assert g1.scalar_mul(k + l, p) == g1.add(
            g1.scalar_mul(k, p), g1.scalar_mul(l, p)
        )


@pytest.mark.parametrize("curve", CURVES, ids=lambda c: c.name)
def test_g2_group_laws(curve, rng):
    g2 = g2_group(curve)
    assert g2.is_on_curve(g2.gen)
    assert g2.is_in_subgroup(g2.gen)
    p = g2.rnd(rng)
    q = g2.rnd(rng)
    assert g2.is_on_curve(p)
    assert g2.add(p, q) == g2.add(q, p)
    k = rng.randrange(g2.r)
    assert g2.scalar_mul(k, g2.add(p, q)) == g2.add(
        g2.scalar_mul(k, p), g2.scalar_mul(k, q)
    )


def test_msm_matches_scalar_mul_sum(rng):
    g1 = g1_group(BN128)
    pts = [g1.rnd(rng) for _ in range(8)]
    ks = [rng.randrange(g1.r) for _ in range(8)]
    expected = None
    for k, p in zip(ks, pts):
        expected = g1.add(expected, g1.scalar_mul(k, p))
    assert g1.msm(ks, pts) == expected


# ---------------------------------------------------------------------------
# NTT / poly
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("curve", CURVES, ids=lambda c: c.name)
def test_ntt_roundtrip(curve, rng):
    p = curve.fr.p
    g = subgroup_gen(curve.fr, 4)
    xs = [rng.randrange(p) for _ in range(16)]
    ys = ntt(p, g, xs)
    # NTT = evaluation on the subgroup
    pol = Poly(p, xs)
    for k in range(16):
        assert ys[k] == pol.eval_at(pow(g, k, p))
    assert intt(p, g, ys) == xs


def test_poly_ops(rng):
    p = BN128.fr.p
    a = Poly(p, [rng.randrange(p) for _ in range(13)])
    b = Poly(p, [rng.randrange(p) for _ in range(7)])
    # long division roundtrip
    q, r = a.long_div(b)
    assert q.mul(b).add(r) == a
    assert r.degree() < b.degree()
    # div_by_vanishing consistency with long_div
    eta = rng.randrange(p)
    n = 3
    vanishing = Poly(p, [-eta] + [0] * (n - 1) + [1])
    q1, r1 = a.div_by_vanishing(n, eta)
    q2, r2 = a.long_div(vanishing)
    assert (q1, r1) == (q2, r2)
    # quot_by_vanishing exactness flag
    exact = q1.mul(vanishing)
    assert exact.quot_by_vanishing(n, eta) == q1
    assert a.quot_by_vanishing(n, eta) is None or r1.is_zero()
    # Horner evaluation vs naive
    x = rng.randrange(p)
    assert a.eval_at(x) == sum(
        c * pow(x, i, p) for i, c in enumerate(a.coeffs)
    ) % p


# ---------------------------------------------------------------------------
# pairing (slow - keep the sample counts tiny, like the reference's cap of 25)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("curve", CURVES, ids=lambda c: c.name)
def test_pairing_bilinearity(curve, rng):
    pr = Pairing(curve)
    g1 = g1_group(curve)
    g2 = g2_group(curve)
    p, q = g1.gen, g2.gen
    e = pr.pairing(p, q)
    # non-degeneracy
    assert e != pr.f12.one
    # e(a, b)^r == 1 (lands in GT)
    assert pr.f12.pow(e, curve.fr.p) == pr.f12.one
    # bilinearity: e(kP, Q) == e(P, kQ) == e(P, Q)^k
    k = rng.randrange(1, 2**64)
    ek = pr.f12.pow(e, k)
    assert pr.pairing(g1.scalar_mul(k, p), q) == ek
    assert pr.pairing(p, g2.scalar_mul(k, q)) == ek
    # unit on infinity
    assert pr.pairing(None, q) == pr.f12.one
    assert pr.pairing(p, None) == pr.f12.one


# ---------------------------------------------------------------------------
# KZG end-to-end
# ---------------------------------------------------------------------------

def test_kzg_roundtrip(rng):
    curve = BN128
    r = curve.fr.p
    setup = kzg.new_setup(curve, log2_size=3, tau=rng.randrange(r))
    poly = Poly(r, [rng.randrange(r) for _ in range(8)])
    com = kzg.commit_poly(setup, poly)
    # commit via Lagrange basis on evaluations == commit via coefficients
    g = subgroup_gen(curve.fr, 3)
    values = ntt(r, g, poly.coeffs + [0] * (8 - len(poly.coeffs)))
    com2 = kzg.commit_values(setup, values)
    assert com == com2
    x0 = rng.randrange(r)
    y0, proof = kzg.opening_proof(setup, poly, x0)
    assert y0 == poly.eval_at(x0)
    assert kzg.verify_proof(setup, com, proof, x0, y0)
    assert not kzg.verify_proof(setup, com, proof, x0, (y0 + 1) % r)


def test_jacobi_symbol():
    """oracle.field.jacobi vs the reference's pinned Mathematica sums
    (pure/src/ZK/Algebra/Pure/Jacobi.hs test block) + Euler criterion."""
    from zikkurat_algebra_tpu.oracle.field import jacobi

    assert sum((3 + 5 * n + 17 * k) * (3 + jacobi(n, k))
               for n in range(-100, 101) for k in range(1, 101, 2)) == 26191168
    p = 10007
    for a in range(1, 50):
        assert jacobi(a, p) == (1 if pow(a, (p - 1) // 2, p) == 1 else -1)
    assert jacobi(p, p) == 0
