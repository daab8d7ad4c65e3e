"""Sharded pointwise / reduction ops.

SURVEY.md §2.4 row 3: pointwise kernels are trivially data-parallel (jit
with NamedSharding does it — no code needed here); the reductions end in a
`psum` of lazy uint32 limb columns over ICI, then one Montgomery wide
reduction (the cross-device analog of ops/vector.py's chunked lazy sums)."""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..ops.field import Field
from ..ops import vector as V
from .mesh import DATA_AXIS


def sharded_sum(f: Field, mesh: Mesh, a: jax.Array) -> jax.Array:
    """Modular sum over the sharded batch axis -> replicated (L,)."""

    @partial(
        shard_map, mesh=mesh,
        in_specs=P(None, DATA_AXIS), out_specs=P(None),
        check_vma=False,
    )
    def run(al):
        local = V.sum_mod(f, al)            # (L,), normalized < p
        lazy = lax.psum(local, DATA_AXIS)   # columns < ndev * 2^16 — safe
        return V.reduce_wide(f, lazy)

    return run(a)


def sharded_dot(f: Field, mesh: Mesh, a: jax.Array, b: jax.Array) -> jax.Array:
    """<a, b> over sharded arrays -> replicated (L,)."""

    @partial(
        shard_map, mesh=mesh,
        in_specs=(P(None, DATA_AXIS), P(None, DATA_AXIS)),
        out_specs=P(None),
        check_vma=False,
    )
    def run(al, bl):
        local = V.dot_prod(f, al, bl)
        lazy = lax.psum(local, DATA_AXIS)
        return V.reduce_wide(f, lazy)

    return run(a, b)
