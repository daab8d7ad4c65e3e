"""Mesh construction helpers.

One flat 'data' axis: every kernel here is data-parallel over the domain
(MSM points, NTT coefficients, array elements).  Multi-host growth is a
matter of `jax.distributed.initialize` + the same mesh spanning hosts
(ICI within a slice, DCN across; cf. SURVEY.md §2.4)."""

from __future__ import annotations

from typing import Optional

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


DATA_AXIS = "data"


def make_mesh(n_devices: Optional[int] = None) -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.array(devs[:n]), (DATA_AXIS,))


def shard_batch(mesh: Mesh, arr, batch_axis: int = -1):
    """Place a limb-plane array with its batch axis sharded over 'data'."""
    ndim = arr.ndim
    if batch_axis < 0:
        batch_axis = ndim + batch_axis
    spec = [None] * ndim
    spec[batch_axis] = DATA_AXIS
    return jax.device_put(arr, NamedSharding(mesh, P(*spec)))


def replicated(mesh: Mesh, arr):
    return jax.device_put(arr, NamedSharding(mesh, P()))
