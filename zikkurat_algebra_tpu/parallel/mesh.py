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


def init_multihost(coordinator_address: Optional[str] = None,
                   num_processes: Optional[int] = None,
                   process_id: Optional[int] = None) -> int:
    """Wire the multi-host runtime: one JAX process per host, devices
    federated over DCN.  Idempotent; returns the global device count.

    On managed platforms (TPU pods via GKE/GCE metadata) the arguments
    are auto-discovered and `init_multihost()` suffices; elsewhere pass
    coordinator "host0:port", the process count, and this host's index
    (standard `jax.distributed` contract).  After this, `jax.devices()`
    is the GLOBAL device list and `make_mesh()` builds a mesh spanning
    hosts — ICI within a slice, DCN across (SURVEY.md §2.4); every
    sharded kernel in this package then runs unchanged.
    """
    if jax.process_count() == 1 and (
        coordinator_address is not None or num_processes is not None
    ):
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    return len(jax.devices())


def make_mesh(n_devices: Optional[int] = None) -> Mesh:
    """Flat 'data'-axis mesh over the first n (default: all) GLOBAL
    devices — spans hosts after `init_multihost`."""
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
