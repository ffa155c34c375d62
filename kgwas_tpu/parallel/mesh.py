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
