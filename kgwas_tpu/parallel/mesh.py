"""Device mesh helpers for pjit/shard_map distributed training.

The reference has no distributed runtime (SURVEY.md section 2.3); here the
mesh is the foundation: axis 'data' partitions graph nodes/edges (halo
exchange over ICI), axis 'model' shards giant input-embedding matmuls (TP).
"""
from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh


def device_count() -> int:
    return jax.device_count()


def init_distributed(coordinator_address=None, num_processes=None,
                     process_id=None):
    """Initialize multi-host JAX (DCN between hosts, ICI within a slice).
    On TPU pods with standard env vars, bare jax.distributed.initialize()
    autodetects everything; args are for manual CPU/GPU test rigs."""
    kwargs = {}
    if coordinator_address is not None:
        kwargs = dict(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    jax.distributed.initialize(**kwargs)
    return jax.process_index(), jax.process_count()


def make_mesh(data: int = -1, model: int = 1, axis_names=("data", "model")) -> Mesh:
    """data=-1 uses all remaining devices on the data axis."""
    n = jax.device_count()
    if data == -1:
        if n % model != 0:
            raise ValueError(f"{n} devices not divisible by model={model}")
        data = n // model
    if data * model > n:
        raise ValueError(f"mesh {data}x{model} exceeds {n} devices")
    devices = np.asarray(jax.devices()[: data * model]).reshape(data, model)
    return Mesh(devices, axis_names=axis_names)
