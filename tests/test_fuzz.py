"""High-sample fuzz tier + adversarial growth-bound tests.

The reference tests every property on 1000 random samples
(/root/reference/test/src/TestMain.hs:16); the regular suites here use
small N for speed.  This tier restores reference-grade sample depth by
BATCHING: one compiled kernel call checks 1024 samples at once, so the
cost is one compile + one device pass per property.

It also attacks the documented failure class of the signed redundant
radix-2^15 core (ops/limbs15.py "INVARIANT DISCIPLINE"): carry-free op
chains grow the value bound and the CIOS multiply is only exact for
operands bounded by 2^13*p.  The tests drive chains to the edge of that
budget and to the extremes of the redundant limb band and require exact
integer results.
"""

import random

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from zikkurat_algebra_tpu import params as P
from zikkurat_algebra_tpu.ops import limbs15 as rl
from zikkurat_algebra_tpu.ops.field import Field, get_field

N = 1024


@pytest.fixture(params=[P.BN128_FR, P.BLS12_381_FP], ids=lambda p: p.name)
def f(request):
    return get_field(request.param)


def _samples(p, k, seed):
    r = random.Random(seed)
    # bias an eighth of the samples toward boundary values
    vals = [r.randrange(p) for _ in range(k - k // 8)]
    edges = [0, 1, p - 1, p - 2, (p - 1) // 2]
    vals += [edges[i % len(edges)] for i in range(k // 8)]
    r.shuffle(vals)
    return vals


def test_field_properties_1024(f):
    """add/sub/mul/sqr/inv/div2 on 1024 samples, batched, vs ints."""
    p = f.p
    av = _samples(p, N, 1)
    bv = _samples(p, N, 2)
    a, b = f.encode(av), f.encode(bv)
    assert f.decode(f.add(a, b)) == [(x + y) % p for x, y in zip(av, bv)]
    assert f.decode(f.sub(a, b)) == [(x - y) % p for x, y in zip(av, bv)]
    assert f.decode(f.mul(a, b)) == [x * y % p for x, y in zip(av, bv)]
    assert f.decode(f.sqr(a)) == [x * x % p for x in av]
    assert f.decode(f.neg(a)) == [(-x) % p for x in av]
    assert f.decode(f.div2(a)) == [
        x * pow(2, -1, p) % p for x in av
    ]
    got_inv = f.decode(f.batch_inv(a))
    want_inv = [pow(x, -1, p) if x else 0 for x in av]
    assert got_inv == want_inv


def test_mul_chain_at_growth_budget_edge(f):
    """The CIOS precondition is |operand| < 2^13*p.  Build an operand of
    value ~2^12*p by 4095 carry-free adds (one tree-less lazy chain) and
    require the subsequent multiply to still be EXACT."""
    p = f.p
    r = random.Random(3)
    k = 1 << 12
    cols = 8
    flat = [r.randrange(p) for _ in range(k * cols)]
    vals = [flat[i * cols:(i + 1) * cols] for i in range(k)]
    x = f.encode([r.randrange(p) for _ in range(cols)])
    stacked = f.encode(flat).reshape(f.L, k, cols)

    @jax.jit
    def chain(stacked, x):
        def body(acc, row):
            return rl.add(acc, row), None  # carry-free, bound grows

        acc, _ = jax.lax.scan(body, jnp.zeros_like(stacked[:, 0]),
                              jnp.moveaxis(stacked, 1, 0))
        return f.mul(acc, x)               # operand value < 2^12 * p

    got = f.decode(chain(stacked, x))
    xs = f.decode(x)
    want = [
        sum(vals[i][j] for i in range(k)) * xs[j] % p for j in range(cols)
    ]
    assert got == want, "CIOS broke inside its documented growth budget"


def test_extreme_band_limbs(f):
    """Operands driven to the EDGE of the CIOS value budget (|v| just
    under 2^13*p, positive and negative, redundant non-canonical limbs)
    via the maximal legal growth chain (scale by 2^12-ish + partial
    carry) must still multiply exactly: the 2^13*p value bound with
    in-band limbs — not canonicity — is the kernel contract."""
    p = f.p
    v1 = _samples(p, 4, 8)
    v2 = _samples(p, 4, 9)
    e1, e2 = f.encode(v1), f.encode(v2)
    k_hot = (1 << 12) - 1
    # value = k_hot * v1 < 2^12 * p  (positive, near the budget)
    hot_pos = rl.partial_carry(e1 * jnp.int32(k_hot), 2)
    # value = 2048 * (v1 - v2): possibly deeply negative
    hot_neg = rl.partial_carry((e1 - e2) * jnp.int32(2048), 2)
    band_lo, band_hi = -(1 << 14), (1 << 15) + (1 << 14)
    for hot in (hot_pos, hot_neg):
        arr = np.asarray(hot)
        assert arr.min() >= band_lo and arr.max() <= band_hi, \
            "growth chain left the redundant limb band"
    b = f.encode(_samples(p, 4, 10))
    bv = f.decode(b)
    got_pos = f.decode(f.norm(f.mul(hot_pos, b)))
    want_pos = [k_hot * x % p * w % p for x, w in zip(v1, bv)]
    assert got_pos == want_pos
    got_neg = f.decode(f.norm(f.mul(hot_neg, b)))
    want_neg = [2048 * (x - y) % p * w % p
                for x, y, w in zip(v1, v2, bv)]
    assert got_neg == want_neg


def test_curve_dbl_iteration_1000(rng):
    """1000 doublings inside one jit == oracle multiply by 2^1000 — deep
    iteration of the complete formulas without boundary normalization."""
    from zikkurat_algebra_tpu.ops.curve import get_curves

    ck = get_curves(P.BN128)
    og = ck.oracle_g1
    ops = ck.g1
    pt = og.rnd(rng)
    A = ck.encode_g1([pt])
    X = ops.from_affine(A)

    @jax.jit
    def run(Xp):
        def body(_, acc):
            return ops.dbl(acc)

        return jax.lax.fori_loop(0, 1000, body, Xp)

    got = ck.decode_g1(ops.to_affine(run(X)))[0]
    want = og.scalar_mul(pow(2, 1000, og.r), pt)
    assert got == want


def test_tower_mul_1024(rng):
    """Fp2 multiplication on 1024 samples vs int oracle (the Karatsuba
    flattening rides the same fused CIOS as Fp12 — depth via samples)."""
    from zikkurat_algebra_tpu.ops.tower import get_tower

    tw = get_tower(P.BLS12_381)
    f2 = tw.fp2
    p = tw.fp.p
    o2 = tw.oracle.fp2
    av = [(rng.randrange(p), rng.randrange(p)) for _ in range(N)]
    bv = [(rng.randrange(p), rng.randrange(p)) for _ in range(N)]
    a = tw.encode_fp2(av)
    b = tw.encode_fp2(bv)
    got = tw.decode_fp2(f2.mul(a, b))
    want = [tuple(o2.mul(x, y)) for x, y in zip(av, bv)]
    assert [tuple(g) for g in got] == want
