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


def test_bigint_inc_dec(rng):
    B = bigint(256)
    top = 1 << 256
    av = [0, 1, top - 1, rng.randrange(top)]
    a = B.encode(av)
    s, carry = B.inc(a)
    assert B.decode(s) == [(v + 1) % top for v in av]
    assert list(np.asarray(carry)) == [(v + 1) // top for v in av]
    d, borrow = B.dec(a)
    assert B.decode(d) == [(v - 1) % top for v in av]
    assert list(np.asarray(borrow)) == [1 if v == 0 else 0 for v in av]


def test_field_is_valid(rng):
    from zikkurat_algebra_tpu.ops.field import get_field
    from zikkurat_algebra_tpu import params as P

    f = get_field(P.BN128_FR)
    vals = [0, 1, f.p - 1]
    a = f.encode(vals, mont=False)
    assert all(np.asarray(f.is_valid(a)))
    import jax.numpy as jnp
    from zikkurat_algebra_tpu.ops.field import ints_to_limbs15

    bad = jnp.asarray(ints_to_limbs15([f.p, f.p + 5], f.L))
    assert not any(np.asarray(f.is_valid(bad)))
