#!/usr/bin/env python
"""MSM three ways + cross-check — mirrors the reference's examples/MSM.hs
(:65-77 triple check: std-coeff MSM vs mont-coeff MSM vs
scalar-mul-and-sum), on the TPU kernels with the oracle as referee."""

import os
import random
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

if __name__ == "__main__":
    os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
    import jax

    # default to CPU: the session env pre-sets JAX_PLATFORMS=axon (the
    # tunneled TPU); opt in to hardware with ZIKKURAT_TPU=1
    if os.environ.get("ZIKKURAT_TPU") != "1":
        jax.config.update("jax_platforms", "cpu")
    from zikkurat_algebra_tpu.utils.cache import setup_cache
    setup_cache(jax)

    from zikkurat_algebra_tpu import params as P
    from zikkurat_algebra_tpu.ops.curve import get_curves

    rng = random.Random(271828)
    curve = P.BN128
    ck = get_curves(curve)
    og = ck.oracle_g1
    fr = ck.fr
    n = 64

    pts = [og.rnd(rng) for _ in range(n)]
    ks = [rng.randrange(og.r) for _ in range(n)]

    A = ck.encode_g1(pts)
    msm = ck.msm("g1")

    # way 1: std coefficients
    r1 = ck.decode_g1(ck.g1.to_affine(msm.msm_std(fr.encode(ks, mont=False), A)))
    # way 2: Montgomery coefficients
    r2 = ck.decode_g1(ck.g1.to_affine(msm.msm_mont(fr.encode(ks), A)))
    # way 3: scalar-mul-and-sum on device
    P3 = ck.g1.scalar_mul_fr_std(fr.encode(ks, mont=False), ck.g1.from_affine(A))
    from zikkurat_algebra_tpu.ops.msm import _tree_reduce

    r3 = ck.decode_g1(ck.g1.to_affine(_tree_reduce(ck.g1, P3)))
    # referee: oracle
    want = og.msm(ks, pts)

    assert r1 == want, f"std-coeff MSM mismatch"
    assert r2 == want, f"mont-coeff MSM mismatch"
    assert r3 == want, f"scalar-mul-sum mismatch"
    print(f"MSM triple-check OK (n={n}, curve={curve.name}): {r1}")
