#!/usr/bin/env python
"""KZG commitment scheme end-to-end — mirrors the reference's
examples/KZG.hs (setup, commit, open, verify) on the TPU kernels,
cross-checked against the oracle implementation."""

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
    from zikkurat_algebra_tpu.protocols import kzg

    rng = random.Random(314159)
    curve = P.BN128
    ck = get_curves(curve)
    fr = ck.fr
    m = 4
    n = 1 << m

    tau = rng.randrange(2, fr.p)
    setup = kzg.new_setup(curve, m, tau)

    coeffs = [rng.randrange(fr.p) for _ in range(n)]
    cm = fr.encode(coeffs)
    com = kzg.commit_poly(setup, cm)

    x0 = rng.randrange(fr.p)
    y0, proof = kzg.opening_proof(setup, cm, fr.encode(x0))

    ok = kzg.verify_proof(setup, com, proof, fr.encode(x0), y0)
    assert bool(ok), "KZG verification REJECTED an honest proof"

    bad = kzg.verify_proof(
        setup, com, proof, fr.encode(x0), fr.encode((fr.decode(y0) + 1) % fr.p)
    )
    assert not bool(bad), "KZG verification ACCEPTED a corrupted proof"

    # referee: oracle value of the commitment
    from zikkurat_algebra_tpu.oracle import kzg as okzg
    from zikkurat_algebra_tpu.oracle.poly import Poly

    osetup = okzg.new_setup(curve, m, tau)
    want = okzg.commit_poly(osetup, Poly(fr.p, coeffs))
    got = ck.decode_g1(ck.g1.to_affine(com))
    assert got == want, "commitment differs from oracle"
    print(f"KZG end-to-end OK (domain 2^{m}, curve {curve.name})")
