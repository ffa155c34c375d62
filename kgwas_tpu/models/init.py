"""Parameter initializers matching the reference's torch/PyG distributions.

Exact per-run weights differ (different RNG engines), but the distributions
match so training dynamics are comparable:
  * torch.nn.Linear default: kaiming_uniform(a=sqrt(5)) == U(-1/sqrt(fan_in),
    1/sqrt(fan_in)); bias U(-1/sqrt(fan_in), 1/sqrt(fan_in)).
    (used by SimpleMLP, reference kgwas/model.py:10-16)
  * PyG glorot: U(-s, s), s = sqrt(6 / (fan_in + fan_out))
    (used by GATConv lins and att params, reference kgwas/conv.py:112-120)
  * zeros for GAT bias (reference conv.py:120)

Weights are stored as [in, out] (JAX convention: y = x @ W + b), i.e. the
transpose of torch's [out, in] — the torch-checkpoint importer in
engine/checkpoint.py transposes on load.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def torch_linear_weight(key, fan_in: int, fan_out: int, dtype=jnp.float32):
    bound = 1.0 / np.sqrt(fan_in) if fan_in > 0 else 0.0
    return jax.random.uniform(
        key, (fan_in, fan_out), minval=-bound, maxval=bound, dtype=dtype
    )


def torch_linear_bias(key, fan_in: int, fan_out: int, dtype=jnp.float32):
    bound = 1.0 / np.sqrt(fan_in) if fan_in > 0 else 0.0
    return jax.random.uniform(
        key, (fan_out,), minval=-bound, maxval=bound, dtype=dtype
    )


def glorot_weight(key, fan_in: int, fan_out: int, dtype=jnp.float32):
    s = np.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, (fan_in, fan_out), minval=-s, maxval=s, dtype=dtype)


def glorot_att(key, heads: int, channels: int, dtype=jnp.float32):
    """PyG glorot on an att tensor [1, H, C]: fan from the last two dims
    (reference torch_geometric.nn.inits.glorot)."""
    s = np.sqrt(6.0 / (heads + channels))
    return jax.random.uniform(
        key, (heads, channels), minval=-s, maxval=s, dtype=dtype
    )


def zeros(shape, dtype=jnp.float32):
    return jnp.zeros(shape, dtype=dtype)
