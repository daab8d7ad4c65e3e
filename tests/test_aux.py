"""Aux subsystems: SRS checkpoint/resume, Sage export, device point
sampling, profiling helpers (SURVEY.md §5 parity — all new vs reference)."""

import os

import numpy as np
import jax
import pytest

from zikkurat_algebra_tpu import params as P
from zikkurat_algebra_tpu.params import sage_setup
from zikkurat_algebra_tpu.ops.curve import get_curves
from zikkurat_algebra_tpu.protocols import kzg, srs_io
from zikkurat_algebra_tpu.utils.profiling import Counters, timed


def test_srs_checkpoint_roundtrip(rng, tmp_path):
    curve = P.BN128
    ck = get_curves(curve)
    setup = kzg.new_setup(curve, 3, rng.randrange(2, ck.fr.p))
    path = str(tmp_path / "srs.npz")
    srs_io.save_setup(path, setup)
    loaded = srs_io.load_setup(path)
    assert loaded.curve.name == curve.name
    assert loaded.log2_size == 3
    assert ck.decode_g1(loaded.tau_g1) == ck.decode_g1(setup.tau_g1)
    assert ck.decode_g1(loaded.lagrange_tau_g1) == ck.decode_g1(setup.lagrange_tau_g1)
    assert ck.decode_g2(loaded.tau_g2) == ck.decode_g2(setup.tau_g2)
    # a commitment computed from the restored SRS matches
    coeffs = ck.fr.encode([rng.randrange(ck.fr.p) for _ in range(8)])
    a = ck.decode_g1(ck.g1.to_affine(kzg.commit_poly(setup, coeffs)))
    b = ck.decode_g1(ck.g1.to_affine(kzg.commit_poly(loaded, coeffs)))
    assert a == b

    # corrupting any limb data must be detected by the content digest
    import json
    import zipfile

    z = np.load(path, allow_pickle=False)
    arrays = {k: np.array(z[k]) for k in z.files}
    arrays["tau_g1_x"] = arrays["tau_g1_x"].copy()
    arrays["tau_g1_x"].reshape(-1)[0] += 1
    bad = str(tmp_path / "srs_bad.npz")
    np.savez_compressed(bad, **arrays)
    with pytest.raises(ValueError, match="digest"):
        srs_io.load_setup(bad)


def test_sage_setup_export():
    s = sage_setup(P.BN128)
    assert "EllipticCurve" in s and str(P.BN128.fp.p) in s
    assert "GLV" in s  # BN128 has recorded GLV params
    s2 = sage_setup(P.BLS12_381)
    assert str(P.BLS12_381.fr.p) in s2


def test_rnd_point_device(rng):
    ck = get_curves(P.BN128)
    key = jax.random.PRNGKey(3)
    Pp = ck.rnd_point(key, (4,))
    assert all(np.asarray(ck.g1.is_on_curve(Pp)))
    assert not any(np.asarray(ck.g1.is_inf(Pp)))
    pts = ck.decode_g1(ck.g1.to_affine(Pp))
    assert len(set(pts)) == 4  # distinct


def test_profiling_helpers():
    c = Counters()
    c.add("mul", 1000, 0.5)
    c.add("mul", 1000, 0.5)
    assert c.rate("mul") == 2000.0
    import jax.numpy as jnp

    secs, r = timed(jax.jit(lambda x: x * 2), jnp.arange(8), iters=2)
    assert secs >= 0 and int(np.asarray(r)[3]) == 6


def test_typed_boundary_errors():
    """API boundaries raise typed errors (survive python -O), the analog
    of the reference's binding-layer dimension errors (G1/Proj.hs:239,
    Class/FFT.hs:61-63)."""
    import jax.numpy as jnp
    import pytest
    from zikkurat_algebra_tpu import params as P
    from zikkurat_algebra_tpu.errors import (
        DimensionError, DomainSizeError, ZikkuratError)
    from zikkurat_algebra_tpu.ops.field import get_field
    from zikkurat_algebra_tpu.ops.ntt import get_domain
    from zikkurat_algebra_tpu.ops.curve import get_curves

    f = get_field(P.BN128_FR)
    dom = get_domain(f, 3)
    with pytest.raises(DomainSizeError):
        dom.ntt(f.encode(list(range(4))))  # length 4 into a 2^3 domain
    ck = get_curves(P.BN128)
    ks = f.encode([1, 2, 3], mont=False)
    pts = ck.encode_g1([ck.oracle_g1.gen] * 4)
    with pytest.raises(DimensionError):
        ck.msm("g1").msm_std(ks, pts, 4)
    assert issubclass(DimensionError, ZikkuratError)
    assert issubclass(DomainSizeError, ValueError)
