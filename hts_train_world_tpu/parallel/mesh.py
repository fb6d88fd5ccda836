"""Device mesh helpers.

The reference's only concurrency is a thread pool spawning shells
(data/scripts/parallel.py); here parallelism is a jax.sharding.Mesh:
- `data` axis: utterance batches (the model is small -> replicated);
- `model` axis: tensor parallelism for the acoustic-model hidden layers.

Multi-host: call distributed_init() once per process (the standard
jax.distributed flow); collectives ride ICI within a slice and DCN across.
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def data_mesh(n_devices: int = 0) -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.array(devs[:n]), ("data",))


def dp_tp_mesh(dp: int, tp: int) -> Mesh:
    devs = np.array(jax.devices()[:dp * tp]).reshape(dp, tp)
    return Mesh(devs, ("data", "model"))


def batch_sharding(mesh: Mesh):
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh):
    return NamedSharding(mesh, P())


def distributed_init(coordinator: str | None = None, num_processes: int = 1,
                     process_id: int = 0) -> None:
    """Multi-host bring-up (jax.distributed.initialize)."""
    if num_processes > 1:
        jax.distributed.initialize(coordinator, num_processes, process_id)
