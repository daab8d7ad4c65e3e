"""Differential tests of the limb-plane bigint kernels vs Python ints.

Mirrors the reference's `bigint` test suite
(test/src/ZK/Test/BigInt/Properties.hs semantics): add/sub with
carry/borrow, full mul, shifts, scale — checked bit-exactly against
arbitrary-precision ints.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from zikkurat_algebra_tpu.ops import limbs as lb
from zikkurat_algebra_tpu.utils.convert import ints_to_limbs, limbs_to_ints

N = 64  # batch size per property


def rand_ints(rng, L, n=N, bias_edges=True):
    top = 1 << (16 * L)
    vals = [rng.randrange(top) for _ in range(n)]
    if bias_edges:
        vals[:6] = [0, 1, top - 1, top - 2, top // 2, (1 << (16 * L - 1)) - 1]
    return vals


@pytest.mark.parametrize("L", [8, 16, 24])
def test_add_sub_carry(rng, L):
    av, bv = rand_ints(rng, L), rand_ints(rng, L)
    a, b = jnp.asarray(ints_to_limbs(av, L)), jnp.asarray(ints_to_limbs(bv, L))
    s, carry = lb.add(a, b)
    top = 1 << (16 * L)
    assert limbs_to_ints(np.asarray(s)) == [(x + y) % top for x, y in zip(av, bv)]
    assert list(np.asarray(carry)) == [(x + y) // top for x, y in zip(av, bv)]
    d, borrow = lb.sub(a, b)
    assert limbs_to_ints(np.asarray(d)) == [(x - y) % top for x, y in zip(av, bv)]
    assert list(np.asarray(borrow)) == [1 if x < y else 0 for x, y in zip(av, bv)]
    ge = np.asarray(lb.geq(a, b))
    assert list(ge) == [x >= y for x, y in zip(av, bv)]


@pytest.mark.parametrize("L", [4, 16, 24])
def test_mul_full(rng, L):
    av, bv = rand_ints(rng, L), rand_ints(rng, L)
    a, b = jnp.asarray(ints_to_limbs(av, L)), jnp.asarray(ints_to_limbs(bv, L))
    prod = lb.mul_full(a, b)
    assert prod.shape[0] == 2 * L
    assert limbs_to_ints(np.asarray(prod)) == [x * y for x, y in zip(av, bv)]
    sq = lb.sqr_full(a)
    assert limbs_to_ints(np.asarray(sq)) == [x * x for x in av]


def test_mul_asymmetric(rng):
    La, Lb = 16, 8
    av, bv = rand_ints(rng, La), rand_ints(rng, Lb)
    a, b = jnp.asarray(ints_to_limbs(av, La)), jnp.asarray(ints_to_limbs(bv, Lb))
    prod = lb.mul_full(a, b)
    assert prod.shape[0] == La + Lb
    assert limbs_to_ints(np.asarray(prod)) == [x * y for x, y in zip(av, bv)]


def test_shifts_scale(rng):
    L = 16
    av = rand_ints(rng, L)
    a = jnp.asarray(ints_to_limbs(av, L))
    top = 1 << (16 * L)
    for s in (1, 7, 15):
        shl, carry = lb.shl_bits(a, s)
        assert limbs_to_ints(np.asarray(shl)) == [(x << s) % top for x in av]
        assert list(np.asarray(carry)) == [(x << s) // top for x in av]
        assert limbs_to_ints(np.asarray(lb.shr_bits(a, s))) == [x >> s for x in av]
    assert limbs_to_ints(np.asarray(lb.shr1(a))) == [x >> 1 for x in av]
    assert limbs_to_ints(np.asarray(lb.shr_limbs(a, 3))) == [x >> 48 for x in av]
    assert limbs_to_ints(np.asarray(lb.shl_limbs(a, 3))) == [(x << 48) % top for x in av]
    wv = [rng.randrange(1 << 16) for _ in range(N)]
    w = jnp.asarray(np.array(wv, np.uint32))
    sc = lb.scale_word(w, a)
    assert sc.shape[0] == L + 1
    assert limbs_to_ints(np.asarray(sc)) == [x * y for x, y in zip(av, wv)]


def test_predicates(rng):
    L = 8
    av = [0, 1, 2, 0, 1, (1 << 128) - 1]
    a = jnp.asarray(ints_to_limbs(av, L))
    assert list(np.asarray(lb.is_zero(a))) == [v == 0 for v in av]
    assert list(np.asarray(lb.is_one(a))) == [v == 1 for v in av]
    bv = [0, 1, 3, 5, 1, 7]
    b = jnp.asarray(ints_to_limbs(bv, L))
    assert list(np.asarray(lb.eq(a, b))) == [x == y for x, y in zip(av, bv)]


def test_pack32_unpack32_bitexact(rng):
    """Dense radix-2^32 sort-payload packing (limbs15.pack32/unpack32)
    must be an exact bit concatenation of the canonical 15-bit limbs,
    for several field widths including non-multiples of 32."""
    from zikkurat_algebra_tpu.ops.limbs15 import pack32, unpack32

    for nbits in (31, 45, 64, 254, 255, 381):
        p_hi = 1 << nbits
        L = -(-nbits // 15) + 2            # field layout incl. headroom
        vals = [rng.randrange(p_hi) for _ in range(9)] + [0, p_hi - 1]
        x = np.zeros((L, len(vals)), np.int32)
        for j, v in enumerate(vals):
            for l in range(L):
                x[l, j] = (v >> (15 * l)) & 0x7FFF
        xj = jnp.asarray(x)
        r = pack32(xj, nbits)
        assert r.shape[0] == -(-nbits // 32)
        rn = np.asarray(r).astype(np.uint32)
        for j, v in enumerate(vals):
            got = sum(int(rn[w, j]) << (32 * w) for w in range(r.shape[0]))
            assert got == v
        u = unpack32(r, L)
        assert np.array_equal(np.asarray(u), x)
