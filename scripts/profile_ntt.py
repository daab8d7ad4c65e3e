#!/usr/bin/env python
"""Stage-level NTT profiling on hardware.

Times the bit-reversal, then each butterfly stage separately (one jit per
stage at its real shape), then the full transform — to locate where the
non-mul time goes at large domains.  Usage:
    python scripts/profile_ntt.py [log2n]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from zikkurat_algebra_tpu.utils.cache import setup_cache

setup_cache(jax)

from zikkurat_algebra_tpu import params as P
from zikkurat_algebra_tpu.ops.field import Field, get_field

if jax.devices()[0].platform != "cpu" and not os.environ.get("ZIKKURAT_NO_PALLAS"):
    Field.use_pallas = True

from zikkurat_algebra_tpu.ops.ntt import get_domain, bit_reverse


def fetch(x):
    np.asarray(x.reshape(-1)[:4])


def timeit(fn, *args, iters=3):
    out = fn(*args)
    fetch(out if isinstance(out, jax.Array) else out[0])
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
        fetch(out if isinstance(out, jax.Array) else out[0])
    return (time.time() - t0) / iters


def main():
    m = int(sys.argv[1]) if len(sys.argv) > 1 else 22
    f = get_field(P.BLS12_381.fr)
    from zikkurat_algebra_tpu.ops.ntt import NTTDomain

    dom = NTTDomain(f, m, four_step=False)
    n = 1 << m
    L = f.L
    x = f.rnd(jax.random.PRNGKey(0), (n,))

    rh = tuple(jnp.asarray(r) for r in dom._rev_halves)
    t_rev = timeit(jax.jit(lambda a, ra, rb: bit_reverse(a, ra, rb)), x, *rh)
    print(f"bit_reverse: {t_rev*1e3:8.1f} ms")

    def stage_fn(s):
        half = 1 << (s - 1)
        nblocks = n >> s

        @jax.jit
        def run(a, tw_s):
            xb = a.reshape((L, nblocks, 2, half))
            u = xb[..., 0, :].reshape((L, n // 2))
            v = xb[..., 1, :].reshape((L, n // 2))
            tw = jnp.broadcast_to(
                tw_s.reshape((L, 1, half)), (L, nblocks, half)
            ).reshape((L, n // 2))
            t = f.mul(v, tw)
            hi = f.add(u, t).reshape((L, nblocks, half))
            lo = f.sub(u, t).reshape((L, nblocks, half))
            return jnp.concatenate([hi, lo], axis=-1).reshape((L, n))

        return run

    total = 0.0
    for s in range(1, m + 1):
        t = timeit(stage_fn(s), x, dom._fwd[s - 1])
        total += t
        half = 1 << (s - 1)
        print(f"stage {s:2d} (half={half:7d}): {t*1e3:8.1f} ms")
    print(f"sum of stages: {total*1e3:8.1f} ms")

    t_full = timeit(lambda a: dom.ntt(a), x)
    print(f"full ntt (radix-2 lane path): {t_full*1e3:8.1f} ms")

    dom4 = NTTDomain(f, m, four_step=True)
    t4 = timeit(lambda a: dom4.ntt(a), x)
    print(f"full ntt (four-step):         {t4*1e3:8.1f} ms")
    # cross-check the two paths bit-exactly on a prefix
    a = np.asarray(dom.ntt(x)[:, :8])
    b = np.asarray(dom4.ntt(x)[:, :8])
    import numpy as _np
    assert f.decode(jnp.asarray(a)) == f.decode(jnp.asarray(b)), \
        "four-step != radix-2 on prefix"
    print("four-step == radix-2 on 8-elt prefix: ok")


if __name__ == "__main__":
    main()
