"""Corner-case prime suite: the field core over near-2^k primes.

The analog of the reference's test-prime table intent
(/root/reference/codegen/src/Zikkurat/Primes.hs:17-62): exercise the
limb machinery at different limb counts L and at primes sitting right at
the radix boundaries, where carry/borrow and reduction corner cases
live.  Every op is differentially checked against the pure-int oracle
on adversarial values (0, 1, p-1, all-ones limbs, 2^(15k) +- 1, ...).
"""

import numpy as np
import pytest

from zikkurat_algebra_tpu.params import TEST_PRIMES, FieldParams
from zikkurat_algebra_tpu.ops.field import Field
from zikkurat_algebra_tpu.ops import limbs15 as rl

# subset keeps one-process XLA compile count bounded (see pytest.ini note)
PRIMES = ["M31", "P45-", "P45+", "P60-", "M61", "goldilocks", "M127",
          "P255-19"]


def corner_values(p: int):
    """Adversarial residues: boundaries of the value range and of every
    15-bit limb plane."""
    vals = [0, 1, 2, 3, p - 1, p - 2, (p - 1) // 2, (p + 1) // 2]
    bits = p.bit_length()
    for k in range(15, bits + 15, 15):
        for d in (-1, 0, 1):
            vals.append(((1 << k) + d) % p)
    vals += [(1 << (bits - 1)) % p, ((1 << bits) - 1) % p]
    # pseudo-random mid values (deterministic)
    rng = np.random.default_rng(bits)
    vals += [int.from_bytes(rng.bytes((bits + 7) // 8), "little") % p
             for _ in range(8)]
    return vals


@pytest.fixture(scope="module", params=PRIMES)
def fld(request):
    return Field(TEST_PRIMES[request.param])


def test_encode_decode_roundtrip(fld):
    p = fld.p
    vals = corner_values(p)
    enc = fld.encode(vals)
    assert fld.decode(enc) == vals
    enc_std = fld.encode(vals, mont=False)
    assert fld.decode(enc_std, mont=False) == vals


def test_ring_ops_vs_oracle(fld):
    p = fld.p
    vals = corner_values(p)
    n = len(vals)
    rng = np.random.default_rng(1234 + p % 100000)
    other = [int.from_bytes(rng.bytes((p.bit_length() + 7) // 8),
                            "little") % p for _ in range(n)]
    a = fld.encode(vals)
    b = fld.encode(other)
    assert fld.decode(fld.add(a, b)) == [(x + y) % p
                                        for x, y in zip(vals, other)]
    assert fld.decode(fld.sub(a, b)) == [(x - y) % p
                                        for x, y in zip(vals, other)]
    assert fld.decode(fld.neg(a)) == [(-x) % p for x in vals]
    assert fld.decode(fld.mul(a, b)) == [x * y % p
                                        for x, y in zip(vals, other)]
    assert fld.decode(fld.sqr(a)) == [x * x % p for x in vals]
    assert fld.decode(fld.div2(a)) == [
        x * pow(2, -1, p) % p for x in vals
    ]


def test_growth_chain_bound_discipline(fld):
    """Adversarial test of the 2^13*p growth bound (limbs15.py invariant
    discipline): iterate add/scale chains to the documented limit and
    confirm a Montgomery multiply still resets/normalizes exactly."""
    p = fld.p
    vals = corner_values(fld.p)
    a = fld.encode(vals)
    acc = a
    val = 1
    # doubling chain: bound grows 2x per add, stay within 2^12 (< 2^13)
    for _ in range(12):
        acc = fld.add(acc, acc)
        val *= 2
    want = [(x * val) % p for x in vals]
    # the chain output must multiply exactly...
    got = fld.decode(fld.mul(acc, fld.one(a.shape[1:])))
    assert got == want
    # ...and normalize exactly
    assert fld.decode(fld.norm(acc)) == want
    # scale_small at its documented limit
    sc = fld.scale_small(a, 1 << 12)
    assert fld.decode(fld.norm(sc)) == [(x << 12) % p for x in vals]


def test_inv_pow_batch(fld):
    p = fld.p
    vals = [v for v in corner_values(p)][:16]
    a = fld.encode(vals)
    inv = fld.decode(fld.inv(a))
    for x, xi in zip(vals, inv):
        assert xi == (pow(x, -1, p) if x else 0)
    binv = fld.decode(fld.batch_inv(a))
    assert binv == inv
    e = (p - 1) // 2 + 7
    got = fld.decode(fld.pow_static(a, e))
    assert got == [pow(x, e, p) for x in vals]


def test_std_rep_ops(fld):
    p = fld.p
    vals = corner_values(p)[:12]
    rng = np.random.default_rng(99)
    other = [int.from_bytes(rng.bytes((p.bit_length() + 7) // 8),
                            "little") % p for _ in range(len(vals))]
    a = fld.encode(vals, mont=False)
    b = fld.encode(other, mont=False)
    got = fld.decode(fld.std_mul(a, b), mont=False)
    assert got == [x * y % p for x, y in zip(vals, other)]
    rt = fld.decode(fld.from_mont(fld.to_mont(a)), mont=False)
    assert rt == vals


def test_sqrt_small_s(fld):
    """Square roots — only for primes with small 2-adicity (the TS loop
    compiles one squaring chain per level; goldilocks' s=32 would emit
    ~500 scans in one jit)."""
    p = fld.p
    q, s = p - 1, 0
    while q % 2 == 0:
        q //= 2
        s += 1
    if s > 4:
        pytest.skip(f"2-adicity {s} too deep for compile budget")
    vals = corner_values(p)[:10]
    squares = [v * v % p for v in vals]
    a = fld.encode(squares)
    r, ok = fld.sqrt(a)
    roots = fld.decode(r)
    assert list(np.asarray(ok)) == [True] * len(squares)
    for v, root in zip(squares, roots):
        assert root * root % p == v
    # a non-residue must report not-square
    g = fld.params.multiplicative_gen
    r2, ok2 = fld.sqrt(fld.encode([g]))
    assert not bool(np.asarray(ok2)[0])


def test_mont_mul_bound_at_limb_boundary(fld):
    """mont_mul's output bound (< 2.1p, lazy) must hold even for inputs at
    the extreme of the redundant band: feed limbs at +-(2^15-1) scaled
    values by pushing adds to the 2^12 bound first."""
    p = fld.p
    L = fld.L
    vals = corner_values(p)[:8]
    a = fld.encode(vals)
    x = a
    for _ in range(11):
        x = fld.add(x, x)
    y = fld.mul(x, x)  # operands near the 2^13*p bound
    import numpy as _np
    arr = _np.asarray(y)
    # output limbs canonical-ish: nonneg, < 2^15 except tiny top residue
    assert int(_np.min(arr)) >= 0
    want = [(v * (1 << 11)) ** 2 % p for v in vals]
    assert fld.decode(y) == want
