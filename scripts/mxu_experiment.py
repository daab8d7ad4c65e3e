#!/usr/bin/env python
"""MXU go/no-go experiment (VERDICT round-1 item 4).

Question: can the MXU (systolic int8 matmul) accelerate field arithmetic,
which today runs entirely on the VPU as int32 limb vector ops?

Key structural fact: an ELEMENTWISE modmul c_t = a_t * b_t has no shared
operand, so it contains no matmul — each element would need its own
Toeplitz matrix (batched 19x19 int matmuls, which XLA pads to the 128x128
MXU tile: >40x waste).  The one hot-path op with genuine matmul structure
is the INNER PRODUCT  dot(a, b) = sum_t a_t b_t mod p: the lazy wide
accumulator factorizes as

    wide[k] = sum_{i+j=k} G[i, j],   G = A @ B^T   (L x L Gram matrix)

i.e. ONE (L, N) x (N, L) matmul accumulates ALL N products.  With limbs
split 15 = 5+5+5 bits, the operands fit signed int8 (values < 32) and the
int32 accumulator holds N <= 2^20 terms (31^2 * 2^20 < 2^31).

This script measures that formulation against the VPU path of
vector.dot_prod and cross-checks bit-exactness via the oracle.
Usage: python scripts/mxu_experiment.py [log2n]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax

jax.config.update("jax_enable_x64", True)   # recombination needs int64
import numpy as np
import jax.numpy as jnp

from zikkurat_algebra_tpu.utils.cache import setup_cache

setup_cache(jax)

from zikkurat_algebra_tpu import params as P
from zikkurat_algebra_tpu.ops.field import get_field, limbs15_to_ints
from zikkurat_algebra_tpu.ops import limbs15 as rl
from zikkurat_algebra_tpu.ops import vector as V

SPLIT = 5                       # 15-bit limb -> three 5-bit planes
NSPLIT = rl.LB // SPLIT


def gram_dot(f, a, b):
    """dot(a, b) via one int8 MXU matmul.  a, b: (L, N) CANONICAL limbs.
    Returns wide lazy limbs (2L, ) — feed to mont_redc_wide."""
    L, n = a.shape
    assert n <= (1 << 20), "int32 Gram accumulator overflows past 2^20"

    def split(x):                         # (L, N) -> (NSPLIT*L, N) 5-bit
        planes = [(x >> (SPLIT * s)) & ((1 << SPLIT) - 1)
                  for s in range(NSPLIT)]
        return jnp.concatenate(planes, 0).astype(jnp.int8)

    As = split(a)                         # (3L, N)
    Bs = split(b)
    G = jax.lax.dot_general(
        As, Bs,
        (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )                                      # (3L, 3L) int32
    # recombine: plane (s, i) x (t, j) contributes G * 2^(5(s+t)) to
    # wide limb column i + j (with 5-bit sub-shift folding)
    wide = jnp.zeros((2 * L + 2,), jnp.int64)
    Gi = G.astype(jnp.int64)
    for s in range(NSPLIT):
        for t in range(NSPLIT):
            blk = Gi[s * L:(s + 1) * L, t * L:(t + 1) * L]   # (L, L)
            shift = SPLIT * (s + t)
            # anti-diagonal sums: wide[i+j] += blk[i, j] << shift
            flip = jnp.fliplr(blk)
            diag = jnp.stack(
                [jnp.trace(flip, offset=L - 1 - k) for k in range(2 * L - 1)]
            )
            wide = wide.at[:2 * L - 1].add(diag << shift)
    # int64 -> radix-2^15 lazy int32 columns (exact split)
    out = []
    carry = jnp.zeros((), jnp.int64)
    for k in range(2 * L + 2):
        v = wide[k] + carry
        out.append((v & rl.MASK).astype(jnp.int32))
        carry = v >> rl.LB
    return jnp.stack(out)[:, None]


def main():
    log2n = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    n = 1 << log2n
    f = get_field(P.BLS12_381.fr)
    key = jax.random.PRNGKey(0)
    a = f.norm(f.rnd(key, (n,)))
    b = f.norm(f.rnd(jax.random.PRNGKey(1), (n,)))

    # -- correctness (small slice, vs python ints) --
    ns = 256
    asml, bsml = a[:, :ns], b[:, :ns]
    av = limbs15_to_ints(np.asarray(asml))
    bv = limbs15_to_ints(np.asarray(bsml))
    rinv = pow(f.r_int, -1, f.p)
    want = sum(x * y for x, y in zip(av, bv)) * rinv % f.p
    wide = jax.jit(lambda a, b: gram_dot(f, a, b))(asml, bsml)
    got_l = rl.mont_redc_wide(
        wide, jnp.asarray(f.p_np).reshape(f.L, 1), f.pinv15
    )
    got = limbs15_to_ints(np.asarray(f.norm(got_l)))[0]
    print("mxu gram dot == oracle:", got == want, flush=True)
    assert got == want

    # -- timing --
    def fetch(r):
        np.asarray(r)[:4]

    mxu = jax.jit(lambda a, b: gram_dot(f, a, b))
    wide = mxu(a, b)
    fetch(wide)
    t0 = time.time()
    iters = 10
    for _ in range(iters):
        fetch(mxu(a, b))
    mxu_t = (time.time() - t0) / iters

    vpu = jax.jit(lambda a, b: V.dot_prod(f, a, b))
    r = vpu(a, b)
    jax.block_until_ready(r)
    np.asarray(r[:, 0] if r.ndim > 1 else r)
    t0 = time.time()
    for _ in range(iters):
        r = vpu(a, b)
        np.asarray(r)[:2]
    vpu_t = (time.time() - t0) / iters

    print(f"n=2^{log2n}  MXU gram: {mxu_t*1e3:.2f} ms   "
          f"VPU dot_prod: {vpu_t*1e3:.2f} ms   "
          f"speedup {vpu_t/mxu_t:.1f}x", flush=True)


if __name__ == "__main__":
    main()
