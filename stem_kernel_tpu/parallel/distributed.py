"""Multi-host bootstrap and scaling-efficiency measurement.

The TPU-native replacement for the reference's MPI process model
(MPIState RAII, /root/reference/common/framework.h:418-433; mpirun rank
spawning):

- :func:`initialize` wires `jax.distributed` when launched across hosts
  (JAX coordinator env or explicit args); single-process runs are no-ops;
- :func:`global_mesh` builds the hosts x local-chips mesh — Gram pair tiles
  shard across it, collectives ride ICI within a host's slice and DCN
  across hosts;
- :func:`scaling_efficiency` measures strong-scaling efficiency of a
  batched kernel on 1..n devices (the >=80% target of BASELINE.md).
"""

from __future__ import annotations

import time

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize(coordinator: str | None = None, num_processes: int | None = None,
               process_id: int | None = None) -> None:
    """jax.distributed.initialize when multi-host; silently no-op otherwise."""
    if coordinator is None and num_processes is None:
        import os

        if "JAX_COORDINATOR_ADDRESS" not in os.environ:
            return  # single host
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )


def global_mesh(axis: str = "pairs") -> Mesh:
    """1-D mesh over every chip of every host (pair-parallel Gram tiles)."""
    return Mesh(np.array(jax.devices()), (axis,))


def scaling_efficiency(kernel_fn, feats_fn, batch_per_device: int,
                       device_counts: list[int] | None = None,
                       reps: int = 3) -> dict[int, float]:
    """Strong-scaling throughput per device count.

    ``feats_fn(batch_size)`` builds a feature batch; ``kernel_fn(x, y)``
    evaluates it.  Returns {n_devices: pairs_per_sec}.
    """
    devices = jax.devices()
    if device_counts is None:
        device_counts = [d for d in (1, 2, 4, 8) if d <= len(devices)]
    out: dict[int, float] = {}
    for nd in device_counts:
        mesh = Mesh(np.array(devices[:nd]), ("pairs",))
        bsz = batch_per_device * nd
        x, y = feats_fn(bsz)
        spec = NamedSharding(mesh, P("pairs"))
        x = {k: jax.device_put(v, spec) for k, v in x.items()}
        y = {k: jax.device_put(v, spec) for k, v in y.items()}
        fn = jax.jit(kernel_fn)
        np.asarray(fn(x, y))  # compile
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            np.asarray(fn(x, y))
            best = min(best, time.perf_counter() - t0)
        out[nd] = bsz / best
    return out
