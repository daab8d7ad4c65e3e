"""Tests for vector ops, dense polynomials, and NTT vs the oracle.

Mirrors the reference suites `poly` (test/src/ZK/Test/Poly/Properties.hs:
ring laws + vs-reference + division laws) and the NTT path
(bn128_poly_mont.c:418-522), differentially against oracle/{poly,ntt}.py.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from zikkurat_algebra_tpu import params as P
from zikkurat_algebra_tpu.ops.field import get_field
from zikkurat_algebra_tpu.ops import vector as V
from zikkurat_algebra_tpu.ops.poly import PolyOps
from zikkurat_algebra_tpu.ops.ntt import get_domain
from zikkurat_algebra_tpu.oracle.field import Fp as OracleFp
from zikkurat_algebra_tpu.oracle.poly import Poly as OraclePoly
from zikkurat_algebra_tpu.oracle.ntt import ntt as oracle_ntt_fwd, intt as oracle_ntt_inv


@pytest.fixture(params=[P.BN128_FR, P.BLS12_381_FR], ids=["BN128/Fr", "BLS/Fr"])
def fr(request):
    return get_field(request.param), OracleFp(request.param)


def test_vector_ops(rng, fr):
    f, o = fr
    n = 33
    av = [rng.randrange(o.p) for _ in range(n)]
    bv = [rng.randrange(o.p) for _ in range(n)]
    a, b = f.encode(av), f.encode(bv)
    # sum / dot
    assert f.decode(V.sum_mod(f, a)) == sum(av) % o.p
    assert f.decode(V.dot_prod(f, a, b)) == sum(x * y for x, y in zip(av, bv)) % o.p
    # fused ops
    cv = [rng.randrange(o.p) for _ in range(n)]
    c = f.encode(cv)
    assert f.decode(V.mul_add(f, a, b, c)) == [
        (x * y + z) % o.p for x, y, z in zip(av, bv, cv)
    ]
    # powers: a * b^k
    a0, b0 = av[0], bv[0]
    pw = V.powers(f, f.encode(a0), f.encode(b0), 17)
    assert f.decode(pw) == [a0 * pow(b0, k, o.p) % o.p for k in range(17)]
    # ax_plus_by
    s1, s2 = f.encode(av[1]), f.encode(bv[1])
    got = V.ax_plus_by(f, s1.reshape(f.L, 1), a, s2.reshape(f.L, 1), b)
    assert f.decode(got) == [
        (av[1] * x + bv[1] * y) % o.p for x, y in zip(av, bv)
    ]


def test_large_sum(rng, fr):
    """Chunked lazy summation beyond one chunk (n > 256)."""
    f, o = fr
    n = 1000
    av = [rng.randrange(o.p) for _ in range(n)]
    a = f.encode(av)
    assert f.decode(V.sum_mod(f, a)) == sum(av) % o.p


def test_mxu_gram_dot(rng, fr):
    """The Gram-matmul MXU dot product is bit-exact vs the VPU path and
    the oracle, including the multi-chunk accumulation (chunk size
    patched down so two chunks are exercised)."""
    f, o = fr
    n = 4096
    # include boundary values among the samples
    av = [rng.randrange(o.p) for _ in range(n - 3)] + [0, 1, o.p - 1]
    bv = [rng.randrange(o.p) for _ in range(n - 3)] + [o.p - 1, 0, 1]
    a, b = f.encode(av), f.encode(bv)
    want = sum(x * y for x, y in zip(av, bv)) % o.p
    old_flag = f.use_mxu
    import zikkurat_algebra_tpu.ops.vector as Vmod
    old_chunk = Vmod._GRAM_CHUNK
    try:
        type(f).use_mxu = True
        got = f.decode(V.dot_prod(f, a, b))
        assert got == want
        Vmod._GRAM_CHUNK = 2048        # force the 2-chunk path
        got2 = f.decode(V.dot_prod(f, a, b))
        assert got2 == want
    finally:
        type(f).use_mxu = old_flag
        Vmod._GRAM_CHUNK = old_chunk


def test_poly_ring_ops(rng, fr):
    f, o = fr
    po = PolyOps(f)
    na, nb = 13, 9
    av = [rng.randrange(o.p) for _ in range(na)]
    bv = [rng.randrange(o.p) for _ in range(nb)]
    pa, pb = OraclePoly(o.p, av), OraclePoly(o.p, bv)
    a, b = f.encode(av), f.encode(bv)

    def as_ints(arr, n):
        out = f.decode(arr)
        return (out + [0] * n)[:n]

    n = max(na, nb)
    assert as_ints(po.add(a, b), n) == [pa.add(pb).coeff(i) for i in range(n)]
    assert as_ints(po.sub(a, b), n) == [pa.sub(pb).coeff(i) for i in range(n)]
    s = av[0]
    assert as_ints(po.scale(f.encode(s), a), na) == [
        pa.scale(s).coeff(i) for i in range(na)
    ]
    # degree with trailing zeros
    padded = po.pad_to(a, 20)
    assert int(po.degree(padded)) == pa.degree()
    assert int(po.degree(f.encode([0] * 5))) == -1


def test_poly_mul(rng, fr):
    f, o = fr
    po = PolyOps(f)
    for na, nb in [(5, 7), (20, 50)]:
        av = [rng.randrange(o.p) for _ in range(na)]
        bv = [rng.randrange(o.p) for _ in range(nb)]
        pm = OraclePoly(o.p, av).mul(OraclePoly(o.p, bv))
        a, b = f.encode(av), f.encode(bv)
        nout = na + nb - 1
        got_naive = f.decode(po.mul_naive(a, b))
        assert got_naive == [pm.coeff(i) for i in range(nout)]
        got_ntt = f.decode(po.mul_ntt(a, b))
        assert got_ntt == [pm.coeff(i) for i in range(nout)]


def test_poly_eval(rng, fr):
    f, o = fr
    po = PolyOps(f)
    av = [rng.randrange(o.p) for _ in range(12)]
    pa = OraclePoly(o.p, av)
    a = f.encode(av)
    x = rng.randrange(o.p)
    assert f.decode(po.eval_at(f.encode(x), a)) == pa.eval_at(x)
    xs = [rng.randrange(o.p) for _ in range(5)]
    got = f.decode(po.eval_many(f.encode(xs), a))
    assert got == [pa.eval_at(xx) for xx in xs]


def test_long_div(rng, fr):
    f, o = fr
    po = PolyOps(f)
    na, nb = 16, 5
    av = [rng.randrange(o.p) for _ in range(na)]
    bv = [rng.randrange(o.p) for _ in range(nb)]
    bv[-1] = bv[-1] or 1  # nonzero leading coeff (defines degree)
    q_ref, r_ref = OraclePoly(o.p, av).long_div(OraclePoly(o.p, bv))
    q, r = po.long_div(f.encode(av), f.encode(bv))
    assert f.decode(q) == [q_ref.coeff(i) for i in range(na - nb + 1)]
    assert f.decode(r) == [r_ref.coeff(i) for i in range(nb - 1)]


def test_div_by_vanishing(rng, fr):
    f, o = fr
    po = PolyOps(f)
    for na, n in [(17, 4), (16, 4), (7, 8), (30, 5)]:
        av = [rng.randrange(o.p) for _ in range(na)]
        eta = rng.randrange(1, o.p)
        q_ref, r_ref = OraclePoly(o.p, av).div_by_vanishing(n, eta)
        q, r = po.div_by_vanishing(f.encode(av), n, f.encode(eta))
        nq = max(0, na - n)
        assert f.decode(q) if nq else [] == [q_ref.coeff(i) for i in range(nq)]
        if nq:
            assert f.decode(q) == [q_ref.coeff(i) for i in range(nq)]
        assert f.decode(r) == [r_ref.coeff(i) for i in range(n)]
    # exactness flag
    qv = [rng.randrange(o.p) for _ in range(6)]
    pq = OraclePoly(o.p, qv)
    eta = rng.randrange(1, o.p)
    n = 3
    van = OraclePoly(o.p, [o.neg(eta)] + [0] * (n - 1) + [1])
    prod = pq.mul(van)
    coeffs = [prod.coeff(i) for i in range(6 + n)]
    q, ok = po.quot_by_vanishing(f.encode(coeffs), n, f.encode(eta))
    assert bool(ok)
    assert f.decode(q)[:6] == qv
    coeffs[0] = (coeffs[0] + 1) % o.p
    _, ok2 = po.quot_by_vanishing(f.encode(coeffs), n, f.encode(eta))
    assert not bool(ok2)


@pytest.mark.parametrize("m", [0, 1, 3, 6])
def test_ntt_roundtrip_vs_oracle(rng, fr, m):
    f, o = fr
    n = 1 << m
    dom = get_domain(f, m)
    av = [rng.randrange(o.p) for _ in range(n)]
    a = f.encode(av)
    got = f.decode(dom.ntt(a))
    ref = oracle_ntt_fwd(o.p, dom.gen, av)
    if isinstance(got, int):
        got, ref = [got], ref
    assert got == ref
    back = f.decode(dom.intt(dom.ntt(a)))
    if isinstance(back, int):
        back = [back]
    assert back == av
    iref = oracle_ntt_inv(o.p, dom.gen, av)
    igot = f.decode(dom.intt(a))
    if isinstance(igot, int):
        igot = [igot]
    assert igot == iref


@pytest.mark.parametrize("m", [2, 5, 8])
def test_ntt_four_step_vs_oracle(rng, fr, m):
    """The single-chip four-step decomposition (sublane-axis butterflies +
    one transpose) must match both the oracle and the radix-2 lane path."""
    from zikkurat_algebra_tpu.ops.ntt import NTTDomain

    f, o = fr
    n = 1 << m
    dom = NTTDomain(f, m, four_step=True)
    assert dom._four
    av = [rng.randrange(o.p) for _ in range(n)]
    a = f.encode(av)
    assert f.decode(dom.ntt(a)) == oracle_ntt_fwd(o.p, dom.gen, av)
    assert f.decode(dom.intt(a)) == oracle_ntt_inv(o.p, dom.gen, av)
    # batch axis rides through both column transforms and the transpose
    ab = jnp.stack([a, f.encode(av[::-1])], axis=1)
    got_b = dom.ntt(ab)
    assert f.decode(got_b[:, 0]) == oracle_ntt_fwd(o.p, dom.gen, av)
    assert f.decode(got_b[:, 1]) == oracle_ntt_fwd(o.p, dom.gen, av[::-1])


def test_ntt_radix4_differential(rng):
    """The flag-gated fused double-stage (radix-4) path must be
    bit-exact vs the default radix-2 pipeline and the oracle, for even
    AND odd log2 sizes (odd sizes end with one radix-2 stage).  Kept as
    an A/B path only — measured SLOWER end-to-end on v5e (ops/ntt.py)."""
    from zikkurat_algebra_tpu.ops.field import get_field
    from zikkurat_algebra_tpu.ops.ntt import NTTDomain
    from zikkurat_algebra_tpu.oracle.ntt import ntt as oracle_ntt
    from zikkurat_algebra_tpu.oracle.ntt import subgroup_gen

    f = get_field(P.BLS12_381.fr)
    for m in (4, 7):
        dom = NTTDomain(f, m)
        dom._radix4 = True
        xs = [rng.randrange(f.p) for _ in range(1 << m)]
        got = f.decode(dom.ntt(f.encode(xs)))
        assert got == oracle_ntt(f.p, subgroup_gen(P.BLS12_381.fr, m), xs)
        assert f.decode(dom.intt(dom.ntt(f.encode(xs)))) == xs


def test_poly_surface_parity(rng, fr):
    """get_coeff / is_constant / lincomb / quot / rem — the remaining
    bn128_poly_mont.h surface (reference parity polish), differentially
    vs python-int polynomial arithmetic."""
    f, o = fr
    po = PolyOps(f)
    av = [rng.randrange(o.p) for _ in range(9)]
    bv = [rng.randrange(o.p) for _ in range(4)]
    bv[-1] = bv[-1] or 1
    a, b = f.encode(av), f.encode(bv)
    # get_coeff (incl. beyond stored length)
    assert f.decode(po.get_coeff(a, 3)) == av[3]
    assert f.decode(po.get_coeff(a, 99)) == 0
    # is_constant
    assert not bool(po.is_constant(a))
    assert bool(po.is_constant(f.encode([5])))
    assert bool(po.is_constant(f.encode([5, 0, 0])))
    # lincomb over different lengths
    c1, c2 = rng.randrange(o.p), rng.randrange(o.p)
    got = f.decode(po.lincomb([f.encode(c1), f.encode(c2)], [a, b]))
    want = [
        (c1 * (av[i] if i < len(av) else 0)
         + c2 * (bv[i] if i < len(bv) else 0)) % o.p
        for i in range(9)
    ]
    assert got == want
    # quot / rem agree with long_div and reconstruct the dividend
    q = f.decode(po.quot(a, b))
    r = f.decode(po.rem(a, b))
    recon = [0] * 9
    for i, qc in enumerate(q):
        for j, bc in enumerate(bv):
            recon[i + j] = (recon[i + j] + qc * bc) % o.p
    for i, rc in enumerate(r):
        recon[i] = (recon[i] + rc) % o.p
    assert recon == av
