"""Mesh construction and sharding helpers.

TPU-native replacement for the reference's MPI backend
(/root/reference/common/kernel_matrix.cpp:184-483): instead of rank-strided
pair loops with Ssend/Recv gathers to rank 0, the Gram pair axis is sharded
over a device mesh with `NamedSharding`; XLA inserts the collectives, and
results land fully replicated (the all-gather equivalent of the reference's
gather + stride replay).  Rank-0-only I/O (framework.h:135-163) becomes
`jax.process_index() == 0` host writes.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

PAIR_AXIS = "pairs"


def default_mesh(devices=None) -> Mesh:
    """1-D data-parallel mesh over all (or the given) devices."""
    devices = jax.devices() if devices is None else devices
    return Mesh(np.array(devices), (PAIR_AXIS,))


def shard_pairs(mesh: Mesh, arr: jax.Array) -> jax.Array:
    """Shard the leading (pair-batch) axis of ``arr`` across the mesh."""
    spec = P(PAIR_AXIS, *([None] * (arr.ndim - 1)))
    return jax.device_put(arr, NamedSharding(mesh, spec))


def replicate(mesh: Mesh, tree):
    """Fully replicate a pytree of arrays across the mesh."""
    return jax.device_put(tree, NamedSharding(mesh, P()))


def process_zero() -> bool:
    """True on the host responsible for I/O (MPI rank-0 equivalent)."""
    return jax.process_index() == 0
