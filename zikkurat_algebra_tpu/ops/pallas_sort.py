"""Pallas TPU bitonic sort_key_val for the MSM bucket pipeline.

XLA's comparison sort on TPU streams the full (key, payload) state
through HBM on every compare-exchange pass — measured 188 ms for the
2^18 x 8-window MSM sort, i.e. >50% of end-to-end MSM time (the TPU
reformulation of the reference's data-dependent bucket scatter,
lib/cbits/curves/g1/jac/bn128_G1_jac.c:607-618, is sort + segmented
scan, so the sort IS the scatter here).

A bitonic network only touches HBM once per CROSS-tile pass: every pass
with compare distance < T runs back-to-back on a VMEM-resident tile.

Per window of n = 2^m elements, tiles of T elements:
  1. `local sort` kernel — full bitonic sort of each tile in VMEM
     (~log^2(T)/2 passes, one HBM round trip), direction alternating by
     local tile index so tile pairs form bitonic sequences;
  2. for each global stage k = 2T, 4T, ..., n:
       cross passes j = k/2 .. T: plain XLA compare-exchange on
         (.., n/2j, 2, j) reshape views (elementwise, one HBM round trip
         each — XLA is already optimal for these);
       `local merge` kernel — finishes j = T/2 .. 1 in VMEM with the
         per-tile direction of stage k (one HBM round trip).

HBM traffic: 1 + sum_k (log2(k/T) + 1) round trips instead of the
~log^2(n) of the full network.  The sort is NOT stable — the MSM
segmented reduction only needs equal digits grouped, not input order.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

I32 = jnp.int32


def _cmpex(x, j: int, kk: int, tile_asc):
    """One bitonic compare-exchange pass at distance j on (R1, T) limb
    rows; row 0 is the key.  Partner values arrive via +-j rotations
    (Mosaic lane/sublane rolls — reshapes with tiny trailing dims are
    not supported on hardware).  Element i's 2j-group sorts ascending
    iff ((i & kk) == 0) == tile_asc (kk = 0 gives a uniform merge in
    the tile direction).  Wraparound values of the rolls are never
    selected: i & j == 0 implies i + j = i | j < T."""
    R1, T = x.shape
    up = jnp.roll(x, -j, axis=1)                  # x[i + j]
    dn = jnp.roll(x, j, axis=1)                   # x[i - j]
    i = jax.lax.broadcasted_iota(I32, (1, T), 1)
    is_lo = (i & j) == 0
    partner = jnp.where(is_lo, up, dn)            # x[i ^ j]
    asc = ((i & kk) == 0) == tile_asc
    want_min = is_lo == asc
    k = x[0:1]
    pk = partner[0:1]
    # take-partner predicate without an i1-valued select (Mosaic cannot
    # lower select_n BETWEEN bool vectors): ties keep own on both sides
    take = (want_min & (pk < k)) | (~want_min & (pk > k))
    return jnp.where(take, partner, x)


def _local_sort_kernel(T: int, ntl: int, x_ref, o_ref):
    """Full bitonic sort of one (R1, T) tile in VMEM.  Direction flips
    with the local tile parity so tile pairs are bitonic for the first
    cross-tile merge."""
    t = pl.program_id(0)
    lt = jax.lax.rem(t, ntl)
    tile_asc = (lt & 1) == 0                      # scalar bool
    x = x_ref[:, :]
    kk = 2
    while kk <= T:
        j = kk // 2
        while j >= 1:
            x = _cmpex(x, j, kk, tile_asc)
            j //= 2
        kk *= 2
    o_ref[:, :] = x


def _local_merge_kernel(T: int, ntl: int, k: int, x_ref, o_ref):
    """Finish global stage k inside one tile: passes j = T/2 .. 1 with
    the tile's uniform direction (i & k is constant across a tile when
    k >= 2T)."""
    t = pl.program_id(0)
    lt = jax.lax.rem(t, ntl)
    tile_asc = ((lt * T) & k) == 0
    x = x_ref[:, :]
    j = T // 2
    while j >= 1:
        x = _cmpex(x, j, 0, tile_asc)
        j //= 2
    o_ref[:, :] = x


@functools.lru_cache(maxsize=None)
def _build_local(R1: int, T: int, total: int, ntl: int, k: int,
                 interpret: bool):
    """k = 0 builds the local-sort kernel, else the stage-k merge."""
    if k:
        kernel = functools.partial(_local_merge_kernel, T, ntl, k)
    else:
        kernel = functools.partial(_local_sort_kernel, T, ntl)
    spec = pl.BlockSpec((R1, T), lambda t: (0, t), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((R1, total * T), I32),
        grid=(total,),
        in_specs=[spec],
        out_specs=spec,
        interpret=interpret,
    )


def _xla_cross_pass(x: jax.Array, j: int, k: int) -> jax.Array:
    """Compare-exchange at distance j (>= T) of global stage k on
    (R1, wc, n) — a pure elementwise pass, one HBM round trip."""
    R1, wc, n = x.shape
    xr = x.reshape(R1, wc, n // (2 * j), 2, j)
    u = xr[..., 0, :]
    v = xr[..., 1, :]
    g = jax.lax.broadcasted_iota(I32, (1, 1, n // (2 * j), 1), 2)
    asc = ((g * (2 * j)) & k) == 0
    swap = jnp.where(asc, u[0:1] > v[0:1], v[0:1] > u[0:1])
    nu = jnp.where(swap, v, u)
    nv = jnp.where(swap, u, v)
    return jnp.stack([nu, nv], axis=-2).reshape(R1, wc, n)


def sort_key_val_pallas(keys: jax.Array, payload: jax.Array,
                        tile_log2: int = 13,
                        interpret: bool = False):
    """Sort each window (last axis) of keys (wc, n) int32 ascending and
    carry the payload rows (R, wc, n) along.  n must be a power of two
    >= 2^tile_log2 is NOT required (the tile shrinks to n).  Returns
    (sorted_keys, sorted_payload).  Unstable."""
    wc, n = keys.shape
    R = payload.shape[0]
    assert n & (n - 1) == 0, "pallas sort needs a power-of-two n"
    T = min(1 << tile_log2, n)
    R1 = R + 1
    ntl = n // T
    total = wc * ntl
    x = jnp.concatenate([keys[None], payload], 0)      # (R1, wc, n)
    xf = x.reshape(R1, wc * n)
    xf = _build_local(R1, T, total, ntl, 0, interpret)(xf)
    k = 2 * T
    while k <= n:
        j = k // 2
        x = xf.reshape(R1, wc, n)
        while j >= T:
            x = _xla_cross_pass(x, j, k)
            j //= 2
        xf = x.reshape(R1, wc * n)
        xf = _build_local(R1, T, total, ntl, k, interpret)(xf)
        k *= 2
    x = xf.reshape(R1, wc, n)
    return x[0], x[1:]
