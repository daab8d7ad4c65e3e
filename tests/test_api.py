"""API surface smoke tests + BigInt module tests (C2/H3 parity)."""

import numpy as np
import jax.numpy as jnp
import pytest

from zikkurat_algebra_tpu.api import bn128, bls12_381, bigint


def test_bigint_widths(rng):
    # the reference instantiates 128..768-bit widths (bigint/bigintN.c)
    for bits in (128, 256, 384, 768):
        B = bigint(bits)
        top = 1 << bits
        av = [rng.randrange(top) for _ in range(9)]
        bv = [rng.randrange(top) for _ in range(9)]
        a, b = B.encode(av), B.encode(bv)
        s, carry = B.add(a, b)
        assert B.decode(s) == [(x + y) % top for x, y in zip(av, bv)]
        assert list(np.asarray(carry)) == [(x + y) // top for x, y in zip(av, bv)]
        assert B.decode(B.mul_ext(a, b)) == [x * y for x, y in zip(av, bv)]
        assert B.decode(B.mul(a, b)) == [(x * y) % top for x, y in zip(av, bv)]
        assert B.decode(B.neg(a)) == [(-x) % top for x in av]
        assert B.decode(B.shift_left(a, 17)) == [(x << 17) % top for x in av]
        assert B.decode(B.shift_right(a, 17)) == [x >> 17 for x in av]


def test_curve_api_shape(rng):
    api = bn128()
    assert api.fr.p == api.params.fr.p
    f = api.fr
    vals = [rng.randrange(f.p) for _ in range(4)]
    a = f.encode(vals)
    assert f.decode(f.sqr(a)) == [v * v % f.p for v in vals]
    dom = api.ntt_domain(3)
    assert dom.n == 8
    # poly ops bound to Fr
    c = f.encode([1, 2, 3])
    assert f.decode(api.poly.eval_at(f.encode(2), c)) == (1 + 4 + 12) % f.p
    assert bls12_381().fp.p == bls12_381().params.fp.p
