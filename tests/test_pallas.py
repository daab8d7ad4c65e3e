"""Differential tests for the Pallas TPU kernels (interpret mode on CPU).

Every kernel must be bit-identical to the XLA scan formulation (which is
itself bit-exact vs oracle/) — the bench then only has to check VALUES on
hardware, not re-derive trust.  Sizes are kept small: interpret mode
executes the Mosaic program in pure Python/XLA emulation.
"""

import random

import jax.numpy as jnp
import pytest

from zikkurat_algebra_tpu.params import BLS12_381_FR, BN128_FP
from zikkurat_algebra_tpu.ops.field import get_field
from zikkurat_algebra_tpu.ops.ntt import get_domain
from zikkurat_algebra_tpu.ops.pallas_field import (
    butterfly_pallas,
    mont_mul_pallas,
)
from zikkurat_algebra_tpu.oracle.ntt import ntt as oracle_ntt_fwd

TILE = 128
N = 256


@pytest.fixture(params=[BLS12_381_FR, BN128_FP], ids=lambda p: p.name)
def field(request):
    return get_field(request.param)


def _samples(f, k, seed=7):
    r = random.Random(seed)
    return [r.randrange(f.p) for _ in range(k)]


def test_mont_mul_pallas_bitexact(field):
    f = field
    xs = _samples(f, 2 * N)
    a = f.encode(xs[:N])
    b = f.encode(xs[N:])
    got = mont_mul_pallas(a, b, f.p_np, f.pinv15, tile=TILE, interpret=True)
    want = f.mul(a, b)
    assert jnp.array_equal(got, want)


def test_butterfly_pallas_bitexact(field):
    f = field
    xs = _samples(f, 3 * N)
    u = f.encode(xs[:N])
    v = f.encode(xs[N:2 * N])
    tw = f.encode(xs[2 * N:])
    out = butterfly_pallas(u, v, tw, f.p_np, f.pinv15, tile=TILE,
                           interpret=True)
    assert out is not None
    hi, lo = out
    t = f.mul(v, tw)
    assert jnp.array_equal(hi, f.add(u, t))
    assert jnp.array_equal(lo, f.sub(u, t))
    # value-level vs python ints
    dh, dl = f.decode(hi), f.decode(lo)
    for i in range(0, N, 37):
        assert dh[i] == (xs[i] + xs[N + i] * xs[2 * N + i]) % f.p
        assert dl[i] == (xs[i] - xs[N + i] * xs[2 * N + i]) % f.p


def test_butterfly_pallas_small_batch_falls_back(field):
    f = field
    xs = _samples(f, 3 * 8)
    u = f.encode(xs[:8])
    v = f.encode(xs[8:16])
    tw = f.encode(xs[16:])
    assert butterfly_pallas(u, v, tw, f.p_np, f.pinv15, tile=TILE,
                            interpret=True) is None


def test_ntt_via_pallas_path():
    """End-to-end NTT with use_pallas on (interpret mode): must equal the
    scan path AND the int oracle."""
    f = get_field(BLS12_381_FR)
    m = 9
    dom = get_domain(f, m)
    xs = _samples(f, 1 << m, seed=11)
    x = f.encode(xs)
    want = dom.ntt(x)  # scan path (use_pallas False)
    old = (f.use_pallas, f.pallas_tile, f.pallas_interpret)
    f.use_pallas, f.pallas_tile, f.pallas_interpret = True, TILE, True
    try:
        got = dom._ntt_impl.__wrapped__(
            dom, x, tuple(dom._fwd),
            tuple(jnp.asarray(r) for r in dom._rev_halves),
        )
    finally:
        f.use_pallas, f.pallas_tile, f.pallas_interpret = old
    assert jnp.array_equal(got, want)
    ys = oracle_ntt_fwd(f.p, dom.gen, xs)
    assert list(f.decode(got)) == ys


def _pack15(planes, nbits):
    """(L, m, B) canonical limb planes -> (m, W, B) packed sort-payload
    rows (dense radix-2^32, limbs15.pack32) — the layout ops/msm.py
    ships to the bucket kernel."""
    from zikkurat_algebra_tpu.ops.limbs15 import pack32

    return jnp.moveaxis(pack32(planes, nbits), 1, 0)  # (m, W, B)


@pytest.mark.parametrize("unroll", [1, 4])
def test_block_madd_scan_bitexact(unroll):
    """The streamed masked running mixed-add kernel must be bit-identical
    to the composed ops.madd / from_affine / select scan on the same
    inputs, including sign, infinity and restart flags, for any unroll."""
    import numpy as np
    from zikkurat_algebra_tpu.params import BLS12_381
    from zikkurat_algebra_tpu.ops.curve import get_curves
    from zikkurat_algebra_tpu.ops.pallas_curve import (
        block_madd_scan, SIGN_BIT, INF_BIT, NEW_BIT,
    )

    ck = get_curves(BLS12_381)
    ops = ck.g1
    f = ops.f
    m, B = 8, 64
    r = random.Random(3)
    xs = f.encode([r.randrange(f.p) for _ in range(m * B)]).reshape(f.L, m, B)
    ys = f.encode([r.randrange(f.p) for _ in range(m * B)]).reshape(f.L, m, B)
    px = _pack15(f.norm(xs), f.p.bit_length())
    py = _pack15(f.norm(ys), f.p.bit_length())
    np_r = np.random.default_rng(5)
    sg = np_r.integers(0, 2, (m, B)).astype(bool)
    inf = np_r.integers(0, 5, (m, B)) == 0
    new = np_r.integers(0, 3, (m, B)) == 0
    new[0, :] = True
    flg = (
        np.where(sg, SIGN_BIT, 0)
        | np.where(inf, INF_BIT, 0)
        | np.where(new, NEW_BIT, 0)
    ).astype(np.int32)

    X, Y, Z = block_madd_scan(
        px, py, jnp.asarray(flg), f.L, f.p_np, f.pinv15, ops.b3, f.one_np,
        tile=B, unroll=unroll, interpret=True,
    )  # (L, m, B)

    # XLA reference: same dataflow with the composed curve ops
    sgj = jnp.asarray(sg)
    xs_c, ys_c = f.norm(xs), f.norm(ys)
    acc = ops.infinity((B,))
    for i in range(m):
        y_eff = f.select(sgj[i], f.neg(ys_c[:, i]), ys_c[:, i])
        pt = (xs_c[:, i], y_eff, jnp.asarray(inf[i]))
        summed = ops.madd(acc, pt)
        acc = ops.select(jnp.asarray(new[i]), ops.from_affine(pt), summed)
        assert jnp.array_equal(X[:, i], acc[0]), f"X step {i}"
        assert jnp.array_equal(Y[:, i], acc[1]), f"Y step {i}"
        assert jnp.array_equal(Z[:, i], acc[2]), f"Z step {i}"


@pytest.mark.parametrize("curve_name", ["BLS12_381", "BN128"])
def test_block_madd_scan2_bitexact(curve_name):
    """The Fp2 (G2) streamed running mixed-add kernel must be
    bit-identical to the composed tower ops.madd / from_affine / select
    scan, including sign, infinity and restart flags."""
    import numpy as np
    from zikkurat_algebra_tpu import params as P
    from zikkurat_algebra_tpu.ops.curve import get_curves
    from zikkurat_algebra_tpu.ops.pallas_curve import (
        block_madd_scan2, SIGN_BIT, INF_BIT, NEW_BIT,
    )
    from zikkurat_algebra_tpu.ops.limbs15 import pack32

    ck = get_curves(getattr(P, curve_name))
    ops = ck.g2
    f = ops.f                              # QuadExt (Fp2)
    fb = f.base
    m, B = 4, 64
    r = random.Random(9)
    vals = [(r.randrange(fb.p), r.randrange(fb.p)) for _ in range(2 * m * B)]
    enc = ck.tower.encode_fp2(vals)        # (L, 2, 2*m*B)
    enc = f.norm(enc).reshape(fb.L, 2, 2, m, B)
    xs, ys = enc[:, :, 0], enc[:, :, 1]    # (L, 2, m, B) each
    nbits = fb.p.bit_length()
    pk_x = pack32(xs, nbits)               # (W32, 2, m, B)
    pk_y = pack32(ys, nbits)
    px0, px1 = (jnp.moveaxis(pk_x[:, c], 1, 0) for c in range(2))
    py0, py1 = (jnp.moveaxis(pk_y[:, c], 1, 0) for c in range(2))
    np_r = np.random.default_rng(17)
    sg = np_r.integers(0, 2, (m, B)).astype(bool)
    inf = np_r.integers(0, 5, (m, B)) == 0
    new = np_r.integers(0, 3, (m, B)) == 0
    new[0, :] = True
    flg = (
        np.where(sg, SIGN_BIT, 0)
        | np.where(inf, INF_BIT, 0)
        | np.where(new, NEW_BIT, 0)
    ).astype(np.int32)

    outs = block_madd_scan2(
        px0, px1, py0, py1, jnp.asarray(flg), fb.L, fb.p_np, fb.pinv15,
        f.qnr, ops.b3, fb.one_np, tile=B, unroll=4, interpret=True,
    )
    X = jnp.stack(outs[0:2], 1)            # (L, 2, m, B)
    Y = jnp.stack(outs[2:4], 1)
    Z = jnp.stack(outs[4:6], 1)

    # XLA reference: same dataflow with the composed tower curve ops
    sgj = jnp.asarray(sg)
    acc = ops.infinity((B,))
    for i in range(m):
        y_eff = f.select(sgj[i], f.neg(ys[:, :, i]), ys[:, :, i])
        pt = (xs[:, :, i], y_eff, jnp.asarray(inf[i]))
        summed = ops.madd(acc, pt)
        acc = ops.select(jnp.asarray(new[i]), ops.from_affine(pt), summed)
        assert jnp.array_equal(X[:, :, i], acc[0]), f"X step {i}"
        assert jnp.array_equal(Y[:, :, i], acc[1]), f"Y step {i}"
        assert jnp.array_equal(Z[:, :, i], acc[2]), f"Z step {i}"
