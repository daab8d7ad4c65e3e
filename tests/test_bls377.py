"""BLS12-377 family tests.

The reference carries BLS12-377 at the pure FIELD+TOWER level only
(pure/src/ZK/Algebra/Pure/Instances/BLS12_377.hs, tower u^2+5 / v^3-u /
w^2-v; pure/test/Run.hs:72-134 runs its field property suites).  The
width-generic TPU kernels extend that to G1 (constants derived and
verified offline); G2/pairing are explicitly unsupported and raise
UnsupportedError.
"""

import random

import numpy as np
import pytest

from zikkurat_algebra_tpu import params as P
from zikkurat_algebra_tpu.errors import UnsupportedError
from zikkurat_algebra_tpu.ops.curve import get_curves
from zikkurat_algebra_tpu.ops.field import get_field
from zikkurat_algebra_tpu.ops.ntt import get_domain


@pytest.fixture(scope="module")
def ck():
    return get_curves(P.BLS12_377)


@pytest.fixture
def prng():
    return random.Random(991)


def test_field_roundtrip_and_mul(ck, prng):
    f = ck.tower.fp
    vals = [prng.randrange(f.p) for _ in range(8)] + [0, 1, f.p - 1]
    enc = f.encode(vals)
    assert f.decode(enc) == vals
    got = f.decode(f.mul(enc, enc))
    assert got == [v * v % f.p for v in vals]
    got_inv = f.decode(f.inv(enc))
    assert got_inv == [pow(v, -1, f.p) if v else 0 for v in vals]


def test_fp2_qnr5_tower(ck, prng):
    """Fp2 = Fp[u]/(u^2 + 5): mul/inv/frobenius vs the oracle, and the
    schoolbook identity (a0+a1u)(b0+b1u) = (a0b0-5a1b1) + (a0b1+a1b0)u."""
    t = ck.tower
    f2o = t.oracle.fp2
    a = [f2o.rnd(prng) for _ in range(6)]
    b = [f2o.rnd(prng) for _ in range(6)]
    p = f2o.p
    for x, y in zip(a, b):
        sb = ((x[0] * y[0] - 5 * x[1] * y[1]) % p,
              (x[0] * y[1] + x[1] * y[0]) % p)
        assert f2o.mul(x, y) == sb
    ea, eb = t.encode_fp2(a), t.encode_fp2(b)
    assert t.decode_fp2(t.fp2.mul(ea, eb)) == [
        f2o.mul(x, y) for x, y in zip(a, b)
    ]
    assert t.decode_fp2(t.fp2.inv(ea)) == [f2o.inv(x) for x in a]
    assert t.decode_fp2(t.fp2_frobenius(ea)) == [
        f2o.frobenius(x) for x in a
    ]


def test_fp12_tower(ck, prng):
    t = ck.tower
    f12o = t.oracle.fp12
    c = [f12o.rnd(prng) for _ in range(2)]
    ec = t.encode_fp12(c)
    assert t.decode_fp12(t.fp12.mul(ec, ec)) == [f12o.mul(x, x) for x in c]
    assert t.decode_fp12(t.fp12.inv(ec)) == [f12o.inv(x) for x in c]
    assert t.decode_fp12(t.fp12_frobenius(ec)) == [
        f12o.frobenius(x) for x in c
    ]


def test_fp2_sqrt_qnr5(ck, prng):
    t = ck.tower
    f2o = t.oracle.fp2
    sq = [f2o.sqr(f2o.rnd(prng)) for _ in range(5)] + [(0, 0)]
    root, ok = t.fp2_sqrt(t.encode_fp2(sq))
    assert bool(np.all(np.asarray(ok)))
    assert all(
        f2o.sqr(r) == s for r, s in zip(t.decode_fp2(root), sq)
    )


def test_g1_msm_vs_oracle(ck, prng):
    og = ck.oracle_g1
    msm = ck.msm("g1")
    n = 16
    pts = [og.rnd(prng) for _ in range(n)]
    pts[3] = None
    ks = [prng.randrange(og.r) for _ in range(n)]
    want = og.msm(ks, pts)
    res = msm.msm_std(ck.fr.encode(ks, mont=False), ck.encode_g1(pts), 5)
    assert ck.decode_g1(ck.g1.to_affine(res)) == want


def test_g1_generator_and_glv(ck):
    """The derived G1 generator is in the subgroup; the GLV endomorphism
    phi(P) = (beta x, y) equals lambda * P on it."""
    og = ck.oracle_g1
    G = og.gen
    assert og.scalar_mul(og.r, G) is None
    beta, lam = P.BLS12_377.glv_beta_lambda
    phi = (beta * G[0] % og.f.p, G[1])
    assert og.scalar_mul(lam, G) == phi


def test_fr_ntt_2adicity47(ck, prng):
    from zikkurat_algebra_tpu.oracle.ntt import ntt as oracle_ntt
    from zikkurat_algebra_tpu.oracle.ntt import subgroup_gen

    fr = get_field(P.BLS12_377.fr)
    m = 6
    dom = get_domain(fr, m)
    xs = [prng.randrange(fr.p) for _ in range(1 << m)]
    got = fr.decode(dom.ntt(fr.encode(xs)))
    assert got == oracle_ntt(fr.p, subgroup_gen(P.BLS12_377.fr, m), xs)
    back = fr.decode(dom.intt(dom.ntt(fr.encode(xs))))
    assert back == xs


def test_g2_and_pairing_unsupported(ck):
    from zikkurat_algebra_tpu.ops.pairing import get_pairing

    with pytest.raises(UnsupportedError):
        ck.msm("g2")
    with pytest.raises(UnsupportedError):
        get_pairing(P.BLS12_377)
