"""Multi-chip tests on the virtual 8-device CPU mesh: shard-count
invariance of MSM, NTT and reductions (SURVEY.md §4 'multi-chip tests
asserting shard-count invariance of results')."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from zikkurat_algebra_tpu import params as P
from zikkurat_algebra_tpu.ops.curve import get_curves
from zikkurat_algebra_tpu.ops.field import get_field
from zikkurat_algebra_tpu.ops.ntt import get_domain
from zikkurat_algebra_tpu.parallel.mesh import make_mesh, shard_batch
from zikkurat_algebra_tpu.parallel.msm import sharded_msm
from zikkurat_algebra_tpu.parallel.ntt import ShardedNTT
from zikkurat_algebra_tpu.parallel.vector import sharded_dot, sharded_sum


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) == 8, "expected 8 virtual CPU devices"
    return make_mesh(8)


def test_sharded_sum_dot(rng, mesh):
    f = get_field(P.BN128_FR)
    n = 64
    av = [rng.randrange(f.p) for _ in range(n)]
    bv = [rng.randrange(f.p) for _ in range(n)]
    a = shard_batch(mesh, f.encode(av))
    b = shard_batch(mesh, f.encode(bv))
    assert f.decode(sharded_sum(f, mesh, a)) == sum(av) % f.p
    assert f.decode(sharded_dot(f, mesh, a, b)) == (
        sum(x * y for x, y in zip(av, bv)) % f.p
    )


def test_sharded_ntt_matches_single_device(rng, mesh):
    f = get_field(P.BN128_FR)
    m = 7
    n = 1 << m
    av = [rng.randrange(f.p) for _ in range(n)]
    a = f.encode(av)
    single = f.decode(get_domain(f, m).ntt(a))
    sntt = ShardedNTT(f, m, mesh)
    got = f.decode(sntt.ntt(shard_batch(mesh, a)))
    assert got == single
    # inverse roundtrip
    back = f.decode(sntt.intt(shard_batch(mesh, get_domain(f, m).ntt(a))))
    assert back == av


def test_sharded_msm_matches_single_device(rng, mesh):
    ck = get_curves(P.BN128)
    og = ck.oracle_g1
    n = 32
    pts = [og.rnd(rng) for _ in range(n)]
    ks = [rng.randrange(og.r) for _ in range(n)]
    want = og.msm(ks, pts)
    k_limbs = shard_batch(mesh, ck.fr.encode(ks, mont=False))
    A = ck.encode_g1(pts)
    A = (shard_batch(mesh, A[0]), shard_batch(mesh, A[1]), shard_batch(mesh, A[2]))
    res = sharded_msm(ck.msm("g1"), mesh, k_limbs, A, c=4)
    got = ck.decode_g1(ck.g1.to_affine(res))
    assert got == want


def test_sharded_poly_mul_eval(rng, mesh):
    """Sharded NTT-mul and distributed evaluation vs the single-device
    PolyOps kernels and python ints."""
    from zikkurat_algebra_tpu.ops.poly import PolyOps
    from zikkurat_algebra_tpu.parallel.poly import ShardedPolyOps

    f = get_field(P.BN128_FR)
    m = 7
    n = 1 << m
    po = PolyOps(f)
    sp = ShardedPolyOps(f, m, mesh)
    av = [rng.randrange(f.p) for _ in range(n // 2)] + [0] * (n // 2)
    bv = [rng.randrange(f.p) for _ in range(n // 2)] + [0] * (n // 2)
    a = shard_batch(mesh, f.encode(av))
    b = shard_batch(mesh, f.encode(bv))
    got = f.decode(sp.mul(a, b))
    want = f.decode(po.mul_ntt(f.encode(av), f.encode(bv)))
    want = want + [0] * (n - len(want))
    assert got == want[:n]

    x = rng.randrange(f.p)
    ev = f.decode(sp.eval_at(f.encode(x), a))
    assert ev == sum(c * pow(x, i, f.p) for i, c in enumerate(av)) % f.p


@pytest.mark.parametrize("n_van", [2, 8, 16])
def test_sharded_div_by_vanishing(rng, mesh, n_van):
    """Sharded (x^n - eta) division: quotient and remainder must equal
    the single-device kernel for blocks nested inside and equal to the
    per-device chunk."""
    from zikkurat_algebra_tpu.ops.poly import PolyOps
    from zikkurat_algebra_tpu.parallel.poly import ShardedPolyOps

    f = get_field(P.BN128_FR)
    m = 7
    n = 1 << m
    po = PolyOps(f)
    sp = ShardedPolyOps(f, m, mesh)
    av = [rng.randrange(f.p) for _ in range(n)]
    eta = rng.randrange(1, f.p)
    a = shard_batch(mesh, f.encode(av))
    q, r = sp.div_by_vanishing(a, n_van, f.encode(eta))
    q_want, r_want = po.div_by_vanishing(f.encode(av), n_van, f.encode(eta))
    got_q = f.decode(q)
    assert got_q[: n - n_van] == f.decode(q_want)
    assert all(v == 0 for v in got_q[n - n_van:])
    assert f.decode(r) == f.decode(r_want)
    # reconstruction: a == q*(x^n_van - eta) + r over ints
    qv = got_q[: n - n_van]
    rv = f.decode(r)
    recon = [0] * n
    for i, c in enumerate(qv):
        recon[i + n_van] = (recon[i + n_van] + c) % f.p
        recon[i] = (recon[i] - c * eta) % f.p
    for i, c in enumerate(rv):
        recon[i] = (recon[i] + c) % f.p
    assert recon == [v % f.p for v in av]


def test_sharded_group_fft_matches_single_device(rng, mesh):
    """Four-step curve FFT over the 8-device mesh == single-chip
    GroupFFT == oracle semantics, forward and inverse roundtrip
    (parallel/gfft.py; cf. fft_forward, bn128_G1_jac.c:727+)."""
    from zikkurat_algebra_tpu.ops.gfft import get_group_fft
    from zikkurat_algebra_tpu.parallel.gfft import ShardedGroupFFT

    ck = get_curves(P.BN128)
    og = ck.oracle_g1
    gops = ck.g1
    m = 6
    n = 1 << m
    pts = [og.scalar_mul(rng.randrange(1, og.r), og.gen) for _ in range(n)]
    pts[3] = None                          # infinity input
    Pa = gops.from_affine(ck.encode_g1(pts))
    single = get_group_fft(gops, P.BN128_FR, m)
    want = ck.decode_g1(gops.to_affine(single.fft(Pa)))
    sg = ShardedGroupFFT(gops, P.BN128_FR, m, mesh)
    Psh = tuple(shard_batch(mesh, x) for x in Pa)
    got = ck.decode_g1(gops.to_affine(sg.fft(Psh)))
    assert got == want
    # inverse roundtrip: ifft(fft(P)) == P
    back = ck.decode_g1(
        gops.to_affine(sg.ifft(tuple(shard_batch(mesh, x)
                                     for x in single.fft(Pa))))
    )
    assert back == ck.decode_g1(gops.to_affine(Pa))
