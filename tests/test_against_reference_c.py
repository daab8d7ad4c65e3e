"""Differential tests against the REFERENCE'S OWN COMPILED C
(/root/reference/lib/cbits built by scripts/build_reference.sh) — the
strongest parity evidence: our TPU kernels must agree bit-exactly with
the reference through the Montgomery interchange, on fields, MSM, NTT
and pairings.  Skipped when the library can't be built."""

import numpy as np
import pytest

from zikkurat_algebra_tpu import params as P
from zikkurat_algebra_tpu.utils.reference_ffi import ReferenceLib, ensure_built
from zikkurat_algebra_tpu.ops.field import get_field
from zikkurat_algebra_tpu.ops.curve import get_curves
from zikkurat_algebra_tpu.ops.ntt import get_domain
from zikkurat_algebra_tpu.ops.pairing import get_pairing
from zikkurat_algebra_tpu.oracle.ntt import subgroup_gen

pytestmark = pytest.mark.skipif(
    ensure_built() is None, reason="reference C library not buildable"
)

CURVES = ["BN128", "BLS12-381"]


@pytest.fixture(params=CURVES)
def ref(request):
    return ReferenceLib(request.param), P.CURVES[request.param]


def test_field_ops_vs_reference_c(rng, ref):
    rl, curve = ref
    f = get_field(curve.fr)
    vals = [rng.randrange(f.p) for _ in range(8)]
    other = [rng.randrange(f.p) for _ in range(8)]
    a, b = f.encode(vals), f.encode(other)
    assert f.decode(f.mul(a, b)) == [
        rl.fr_mont("mul", x, y) for x, y in zip(vals, other)
    ]
    assert f.decode(f.add(a, b)) == [
        rl.fr_mont("add", x, y) for x, y in zip(vals, other)
    ]
    assert f.decode(f.inv(a)) == [rl.fr_mont("inv", x) for x in vals]
    # Montgomery WORD interchange: our export == the reference's encoding
    ours = f.export_ref_mont(a)
    theirs = [rl.fr_to_mont_words(v) for v in vals]
    assert ours == theirs


def test_msm_vs_reference_c(rng, ref):
    rl, curve = ref
    ck = get_curves(curve)
    og = ck.oracle_g1
    n = 40
    pts = [og.rnd(rng) for _ in range(n)]
    pts[3] = None
    ks = [rng.randrange(og.r) for _ in range(n)]
    want = rl.msm(ks, pts)
    res = ck.msm("g1").msm_std(ck.fr.encode(ks, mont=False), ck.encode_g1(pts))
    got = ck.decode_g1(ck.g1.to_affine(res))
    assert got == want


def test_ntt_vs_reference_c(rng, ref):
    rl, curve = ref
    f = get_field(curve.fr)
    m = 5
    dom = get_domain(f, m)
    vals = [rng.randrange(f.p) for _ in range(1 << m)]
    want = rl.ntt_forward(vals, m, dom.gen)
    got = f.decode(dom.ntt(f.encode(vals)))
    assert got == want


def test_pairing_vs_reference_c(rng, ref):
    rl, curve = ref
    pk = get_pairing(curve)
    og1, og2 = pk.ck.oracle_g1, pk.ck.oracle_g2
    p1, q2 = og1.rnd(rng), og2.rnd(rng)
    want = rl.pairing(p1, q2)
    got = pk.tower.decode_fp12(
        pk.pairing(pk.ck.encode_g1([p1]), pk.ck.encode_g2([q2]))
    )[0]
    assert got == want
    # and the oracle agrees with the reference C too
    assert pk.oracle.pairing(p1, q2) == want
