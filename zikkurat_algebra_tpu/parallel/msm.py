"""Data-parallel MSM over a device mesh.

The TPU-native scale-out of Pippenger (SURVEY.md §2.4 table row 1):
points/scalars are sharded over the 'data' axis, each device runs the local
sort+scan bucket MSM, and the per-device partial results (one projective
point each) are combined with an all_gather + log-depth group-add tree —
collectives ride ICI, replacing the reference's single address space.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..ops.msm import CurveMSM, _tree_reduce
from ..ops.curve import AffBatch, Point
from .mesh import DATA_AXIS


def sharded_msm(msm: CurveMSM, mesh: Mesh, k_limbs: jax.Array,
                points: AffBatch, c: int | None = None) -> Point:
    """MSM with standard-rep scalars over sharded inputs.

    k_limbs (Lr, N), points ((Lc.., N), (Lc.., N), (N,)) — all sharded on
    their batch (last) axis.  Returns a replicated projective point."""
    ops = msm.ops
    coord_rank = points[0].ndim

    def cspec(rank):
        return P(*([None] * (rank - 1) + [DATA_AXIS]))

    in_specs = (
        cspec(k_limbs.ndim),
        (cspec(coord_rank), cspec(coord_rank), P(DATA_AXIS)),
    )

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=in_specs,
        out_specs=(P(), P(), P()),
        check_vma=False,
    )
    def local(k, pts):
        r = msm.msm_std(k, pts, c)                       # local Pippenger
        stacked = jnp.stack(r, 0)                        # (3, Lc..)
        allr = lax.all_gather(stacked, DATA_AXIS)        # (ndev, 3, Lc..)
        allr = jnp.moveaxis(allr, 0, -1)                 # (3, Lc.., ndev)
        Pg = (allr[0], allr[1], allr[2])
        total = _tree_reduce(ops, Pg)                    # replicated result
        return total

    return local(k_limbs, points)
