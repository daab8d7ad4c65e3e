"""Pairing tests: bilinearity properties + differential vs the oracle
pairing (mirrors test/src/ZK/Test/Curve/Pairings.hs:111-164, with the
fast==reference check being device-vs-oracle here)."""

import numpy as np
import jax.numpy as jnp
import pytest

from zikkurat_algebra_tpu import params as P
from zikkurat_algebra_tpu.ops.pairing import get_pairing


@pytest.fixture(params=[P.BN128, P.BLS12_381], ids=["BN128", "BLS"])
def pk(request):
    return get_pairing(request.param)


def test_g2_frobenius_endomorphism(rng, pk):
    og2 = pk.ck.oracle_g2
    qs = [og2.rnd(rng) for _ in range(3)]
    want = [pk.oracle.frobenius_g2(q) for q in qs]
    t = pk.tower
    x = t.encode_fp2([q[0] for q in qs])
    y = t.encode_fp2([q[1] for q in qs])
    gx, gy = pk.g2_frobenius((x, y))
    got = list(zip(t.decode_fp2(gx), t.decode_fp2(gy)))
    assert got == [tuple(w) for w in want]


def test_pairing_vs_oracle(rng, pk):
    og1, og2 = pk.ck.oracle_g1, pk.ck.oracle_g2
    n = 2
    ps = [og1.rnd(rng) for _ in range(n)]
    qs = [og2.rnd(rng) for _ in range(n)]
    want = [pk.oracle.pairing(p, q) for p, q in zip(ps, qs)]
    Pb = pk.ck.encode_g1(ps)
    Qb = pk.ck.encode_g2(qs)
    got = pk.tower.decode_fp12(pk.pairing(Pb, Qb))
    assert got == want


def test_pairing_bilinearity(rng, pk):
    og1, og2 = pk.ck.oracle_g1, pk.ck.oracle_g2
    o12 = pk.oracle.f12
    p = og1.rnd(rng)
    q = og2.rnd(rng)
    k = rng.randrange(1, 1 << 30)
    kp = og1.scalar_mul(k, p)
    kq = og2.scalar_mul(k, q)
    Pb = pk.ck.encode_g1([p, kp, p])
    Qb = pk.ck.encode_g2([kq, q, q])
    out = pk.pairing(Pb, Qb)
    vals = pk.tower.decode_fp12(out)
    # e(P, kQ) == e(kP, Q) == e(P,Q)^k
    assert vals[0] == vals[1]
    assert vals[0] == o12.pow(vals[2], k)
    # non-degenerate
    assert vals[2] != o12.one


def test_pairing_infinity(rng, pk):
    og1, og2 = pk.ck.oracle_g1, pk.ck.oracle_g2
    p = og1.rnd(rng)
    q = og2.rnd(rng)
    Pb = pk.ck.encode_g1([None, p])
    Qb = pk.ck.encode_g2([q, None])
    vals = pk.tower.decode_fp12(pk.pairing(Pb, Qb))
    assert vals == [pk.oracle.f12.one, pk.oracle.f12.one]


def test_pairing_product(rng, pk):
    """prod e(P_i, Q_i) with one shared final exponentiation."""
    og1, og2 = pk.ck.oracle_g1, pk.ck.oracle_g2
    o12 = pk.oracle.f12
    ps = [og1.rnd(rng) for _ in range(3)]
    qs = [og2.rnd(rng) for _ in range(3)]
    want = o12.one
    for p, q in zip(ps, qs):
        want = o12.mul(want, pk.oracle.pairing(p, q))
    Pb = pk.ck.encode_g1(ps)
    Qb = pk.ck.encode_g2(qs)
    got = pk.tower.decode_fp12(pk.pairing_product(Pb, Qb))
    assert got == want
    # e(P,Q) * e(-P,Q) == 1
    Pb2 = pk.ck.encode_g1([ps[0], og1.neg(ps[0])])
    Qb2 = pk.ck.encode_g2([qs[0], qs[0]])
    one = pk.tower.decode_fp12(pk.pairing_product(Pb2, Qb2))
    assert one == o12.one
