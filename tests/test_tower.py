"""Differential tests for Fp2/Fp6/Fp12 tower kernels vs the oracle.

Mirrors the reference `towers` suite (test/src/ZK/Test/Field/Properties.hs
ext-field extras + AgainstRef differential checks for towers of both
curves)."""

import numpy as np
import jax.numpy as jnp
import pytest

from zikkurat_algebra_tpu import params as P
from zikkurat_algebra_tpu.ops.tower import get_tower

N = 12

CURVES = [P.BN128, P.BLS12_381]
IDS = [c.name for c in CURVES]


@pytest.fixture(params=CURVES, ids=IDS)
def tw(request):
    return get_tower(request.param)


def _rnd2(rng, o, n=N):
    vals = [o.rnd(rng) for _ in range(n)]
    vals[0] = o.zero
    vals[1] = o.one
    return vals


def test_fp2_ops(rng, tw):
    o = tw.oracle.fp2
    av, bv = _rnd2(rng, o), _rnd2(rng, o)
    a, b = tw.encode_fp2(av), tw.encode_fp2(bv)
    f = tw.fp2
    assert tw.decode_fp2(f.add(a, b)) == [o.add(x, y) for x, y in zip(av, bv)]
    assert tw.decode_fp2(f.sub(a, b)) == [o.sub(x, y) for x, y in zip(av, bv)]
    assert tw.decode_fp2(f.neg(a)) == [o.neg(x) for x in av]
    assert tw.decode_fp2(f.mul(a, b)) == [o.mul(x, y) for x, y in zip(av, bv)]
    assert tw.decode_fp2(f.sqr(a)) == [o.sqr(x) for x in av]
    assert tw.decode_fp2(f.inv(a)) == [o.inv(x) for x in av]
    assert tw.decode_fp2(f.conj(a)) == [o.conj(x) for x in av]
    # pow incl. Frobenius exponent x^p == conj (Field laws: frob == naive)
    assert tw.decode_fp2(f.pow_static(a, 5)) == [o.pow(x, 5) for x in av]
    got = tw.decode_fp2(f.pow_static(a, o.p))
    assert got == [o.conj(x) for x in av]
    # mul_xi against oracle
    assert tw.decode_fp2(tw.mul_xi(a)) == [o.mul_xi(x) for x in av]


def test_fp6_ops(rng, tw):
    o = tw.oracle.fp6
    av, bv = _rnd2(rng, o), _rnd2(rng, o)
    a, b = tw.encode_fp6(av), tw.encode_fp6(bv)
    f = tw.fp6
    assert tw.decode_fp6(f.add(a, b)) == [o.add(x, y) for x, y in zip(av, bv)]
    assert tw.decode_fp6(f.mul(a, b)) == [o.mul(x, y) for x, y in zip(av, bv)]
    assert tw.decode_fp6(f.sqr(a)) == [o.sqr(x) for x in av]
    assert tw.decode_fp6(f.inv(a)) == [o.inv(x) for x in av]
    assert tw.decode_fp6(f.mul_by_v(a)) == [o.mul_by_v(x) for x in av]


def test_fp12_ops(rng, tw):
    o = tw.oracle.fp12
    av, bv = _rnd2(rng, o), _rnd2(rng, o)
    a, b = tw.encode_fp12(av), tw.encode_fp12(bv)
    f = tw.fp12
    assert tw.decode_fp12(f.add(a, b)) == [o.add(x, y) for x, y in zip(av, bv)]
    assert tw.decode_fp12(f.mul(a, b)) == [o.mul(x, y) for x, y in zip(av, bv)]
    assert tw.decode_fp12(f.sqr(a)) == [o.sqr(x) for x in av]
    assert tw.decode_fp12(f.inv(a)) == [o.inv(x) for x in av]
    # ring laws: a * inv a == 1 (nonzero), distributivity
    one = [o.one] * N
    prod = tw.decode_fp12(f.mul(a, f.inv(a)))
    assert prod[1:] == one[1:]  # index 0 is zero -> inv 0 = 0


def test_fp12_frobenius(rng, tw):
    o = tw.oracle.fp12
    av = _rnd2(rng, o, 4)
    a = tw.encode_fp12(av)
    got1 = tw.decode_fp12(tw.fp12_frobenius(a, 1))
    assert got1 == [o.frobenius(x) for x in av]
    got2 = tw.decode_fp12(tw.fp12_frobenius(a, 2))
    assert got2 == [o.frobenius(o.frobenius(x)) for x in av]
    # conj == x^(p^6)
    got6 = tw.decode_fp12(tw.fp12_conj(a))
    assert got6 == [o.conj(x) for x in av]


def test_fp2_fp6_frobenius_per_level(rng, tw):
    """Per-level tower Frobenius (device) vs oracle AND vs naive x^p
    (the reference exposes frobenius on Fp2/Fp6 too,
    bls12_381_Fp2_mont.c:253-283, bls12_381_Fp6_mont.h:9-10)."""
    o2, o6 = tw.oracle.fp2, tw.oracle.fp6
    p = o2.p
    av2 = _rnd2(rng, o2, 6)
    a2 = tw.encode_fp2(av2)
    got = tw.decode_fp2(tw.fp2_frobenius(a2))
    assert got == [o2.frobenius(x) for x in av2]
    assert got == [o2.pow(x, p) for x in av2]

    av6 = _rnd2(rng, o6, 4)
    a6 = tw.encode_fp6(av6)
    got6 = tw.decode_fp6(tw.fp6_frobenius(a6))
    assert got6 == [o6.frobenius(x) for x in av6]
    assert got6 == [o6.pow(x, p) for x in av6]
