"""Differential + property tests for the Montgomery field kernels.

Mirrors the reference suites `montgomery` and `againstref`
(test/src/ZK/Test/Field/Properties.hs:171-221 ring/field laws;
test/src/ZK/Test/Field/AgainstRef.hs differential testing): every op is
checked bit-exactly against the pure-Python oracle, over all four fields
(BN128 Fp/Fr, BLS12-381 Fp/Fr).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from zikkurat_algebra_tpu import params as P
from zikkurat_algebra_tpu.ops.field import get_field
from zikkurat_algebra_tpu.oracle.field import Fp as OracleFp, batch_inv as oracle_batch_inv

N = 48

ALL_FIELDS = [P.BN128_FP, P.BN128_FR, P.BLS12_381_FP, P.BLS12_381_FR]
IDS = [f.name for f in ALL_FIELDS]


def sample(rng, fp, n=N):
    vals = [rng.randrange(fp.p) for _ in range(n)]
    vals[:4] = [0, 1, fp.p - 1, fp.p - 2]
    return vals


@pytest.fixture(params=ALL_FIELDS, ids=IDS)
def fld(request):
    params = request.param
    return get_field(params), OracleFp(params)


def test_encode_decode_roundtrip(rng, fld):
    f, o = fld
    vals = sample(rng, o)
    a = f.encode(vals)
    assert f.decode(a) == vals
    a_std = f.encode(vals, mont=False)
    assert f.decode(a_std, mont=False) == vals
    # Montgomery interchange contract (bn128_Fr_mont.c:325-357): export to
    # the REFERENCE's R = 2^(64w) word format and compare against the
    # oracle's Montgomery serialization, then round-trip back.
    ref_words = f.export_ref_mont(a)
    for words, v in zip(ref_words, vals):
        m = o.to_mont(v)  # value * R_ref mod p
        expect = [(m >> (64 * i)) & ((1 << 64) - 1)
                  for i in range(f.params.nlimbs // 4)]
        assert words == expect
    back = f.import_ref_mont(ref_words)
    assert f.decode(back) == vals


def test_ring_ops_vs_oracle(rng, fld):
    f, o = fld
    av, bv = sample(rng, o), sample(rng, o)
    a, b = f.encode(av), f.encode(bv)
    assert f.decode(f.add(a, b)) == [o.add(x, y) for x, y in zip(av, bv)]
    assert f.decode(f.sub(a, b)) == [o.sub(x, y) for x, y in zip(av, bv)]
    assert f.decode(f.neg(a)) == [o.neg(x) for x in av]
    assert f.decode(f.mul(a, b)) == [o.mul(x, y) for x, y in zip(av, bv)]
    assert f.decode(f.sqr(a)) == [o.sqr(x) for x in av]
    assert f.decode(f.div2(a)) == [o.div_by_2(x) for x in av]
    assert f.decode(f.muli(a, 3)) == [o.mul(x, 3) for x in av]


def test_mont_conversions(rng, fld):
    f, o = fld
    vals = sample(rng, o)
    a_std = f.encode(vals, mont=False)
    a_mont = f.to_mont(a_std)
    assert f.decode(a_mont) == vals
    back = f.from_mont(a_mont)
    assert f.decode(back, mont=False) == vals


def test_inv_pow_div(rng, fld):
    f, o = fld
    vals = sample(rng, o, 16)
    a = f.encode(vals)
    assert f.decode(f.inv(a)) == [o.inv(x) for x in vals]
    # pow with static exponents incl. edge cases near p (AgainstRef.hs:60-69)
    for e in (0, 1, 2, 5, o.p - 1, o.p, o.p + 1):
        assert f.decode(f.pow_static(a, e)) == [o.pow(x, e) for x in vals]
    bv = sample(rng, o, 16)
    bv = [v if v else 1 for v in bv]
    b = f.encode(bv)
    assert f.decode(f.div(a, b)) == [o.div(x, y) for x, y in zip(vals, bv)]


def test_batch_inv(rng, fld):
    f, o = fld
    vals = sample(rng, o)  # includes a zero
    a = f.encode(vals)
    got = f.decode(f.batch_inv(a))
    assert got == oracle_batch_inv(o, vals)


def test_field_laws(rng, fld):
    """Spot ring/field laws on-device (Field/Properties.hs:171-221)."""
    f, o = fld
    av, bv, cv = sample(rng, o), sample(rng, o), sample(rng, o)
    a, b, c = f.encode(av), f.encode(bv), f.encode(cv)
    # commutativity + associativity + distributivity
    assert f.decode(f.add(a, b)) == f.decode(f.add(b, a))
    assert f.decode(f.mul(a, b)) == f.decode(f.mul(b, a))
    assert f.decode(f.mul(f.add(a, b), c)) == f.decode(
        f.add(f.mul(a, c), f.mul(b, c))
    )
    # units
    one = f.one((N,))
    zero = f.zero((N,))
    assert f.decode(f.mul(a, one)) == av
    assert f.decode(f.add(a, zero)) == av
    # x * inv x == 1 for x != 0
    nz = [v if v else 1 for v in av]
    x = f.encode(nz)
    assert f.decode(f.mul(x, f.inv(x))) == [1] * N
    # halve . double == id
    assert f.decode(f.div2(f.add(a, a))) == av


def test_rnd_device(fld):
    f, o = fld
    key = jax.random.PRNGKey(42)
    x = f.rnd(key, (32,))
    vals = f.decode(x)
    assert all(0 <= v < o.p for v in vals)
    assert len(set(vals)) > 30  # no obvious collisions


def test_jit_composition(rng, fld):
    """Ops compose under jit into one compiled program."""
    f, o = fld
    av, bv = sample(rng, o, 8), sample(rng, o, 8)
    a, b = f.encode(av), f.encode(bv)

    @jax.jit
    def fused(x, y):
        return f.mul(f.add(x, y), f.sub(x, y))  # x^2 - y^2

    got = f.decode(fused(a, b))
    assert got == [
        o.sub(o.sqr(x), o.sqr(y)) for x, y in zip(av, bv)
    ]


def test_std_rep_ops(rng, fld):
    """Standard-representation ops (C3 parity: curves/fields/std)."""
    f, o = fld
    av, bv = sample(rng, o, 8), sample(rng, o, 8)
    a = f.encode(av, mont=False)
    b = f.encode(bv, mont=False)
    assert f.decode(f.std_mul(a, b), mont=False) == [
        o.mul(x, y) for x, y in zip(av, bv)
    ]
    assert f.decode(f.std_inv(a), mont=False) == [o.inv(x) for x in av]
    assert f.decode(f.std_pow(a, 5), mont=False) == [o.pow(x, 5) for x in av]


def test_sqrt_device(rng, fld):
    f, o = fld
    vals = [rng.randrange(o.p) for _ in range(8)]
    squares = [v * v % o.p for v in vals]
    a = f.encode(squares)
    r, ok = f.sqrt(a)
    assert all(np.asarray(ok))
    got = f.decode(f.sqr(r))
    assert got == squares
    # non-residues flagged
    nr = None
    for cand in range(2, 50):
        if o.sqrt(cand) is None:
            nr = cand
            break
    if nr is not None:
        _, ok2 = f.sqrt(f.encode([nr]))
        assert not bool(np.asarray(ok2)[0])
