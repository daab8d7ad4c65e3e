"""Differential tests for the Pallas bitonic sort_key_val (interpret
mode) against XLA's sort — the MSM bucket pipeline's sort replacement.

The MSM only needs equal digits GROUPED (any order within a segment),
but these tests check full key-order equality plus exact key->payload
association via per-window column multisets.
"""

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
import pytest

from zikkurat_algebra_tpu.ops.pallas_sort import sort_key_val_pallas


def _check(keys, pay, tile_log2):
    wc = keys.shape[0]
    sk, sp = jax.jit(
        lambda k, p: sort_key_val_pallas(k, p, tile_log2, interpret=True)
    )(keys, pay)
    ref_k = lax.sort(keys, dimension=1)
    assert (np.asarray(sk) == np.asarray(ref_k)).all()
    got = np.asarray(jnp.concatenate([sk[None], sp], 0))
    bk = jnp.broadcast_to(keys[None], pay.shape)
    _, ref_pay = lax.sort_key_val(bk, pay, dimension=2)
    want = np.asarray(jnp.concatenate([ref_k[None], ref_pay], 0))
    for w in range(wc):
        g = sorted(map(tuple, got[:, w].T))
        r = sorted(map(tuple, want[:, w].T))
        assert g == r, f"window {w}: payload association broken"


@pytest.mark.parametrize(
    "wc,n,R,tile_log2",
    [(2, 1 << 11, 4, 9),    # multi-tile, 4 cross stages
     (1, 1 << 9, 27, 13),   # single tile (tile shrinks to n), MSM row count
     (3, 1 << 10, 2, 10)],  # tile == n boundary
)
def test_sort_vs_xla(rng, wc, n, R, tile_log2):
    g = np.random.default_rng(rng.randrange(1 << 30))
    keys = jnp.asarray(g.integers(0, 1 << 14, (wc, n)), jnp.int32)
    pay = jnp.asarray(g.integers(0, 1 << 30, (R, wc, n)), jnp.int32)
    _check(keys, pay, tile_log2)


def test_sort_duplicate_keys(rng):
    """Heavy duplication (the MSM case: n >> nbuckets) and all-equal
    windows; payload rows distinct so association is fully checked."""
    g = np.random.default_rng(7)
    wc, n, R = 2, 1 << 11, 3
    keys = jnp.asarray(g.integers(0, 5, (wc, n)), jnp.int32)
    keys = keys.at[1].set(3)                     # one all-equal window
    pay = jnp.asarray(g.integers(0, 1 << 30, (R, wc, n)), jnp.int32)
    _check(keys, pay, 9)
