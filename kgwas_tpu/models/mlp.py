"""SimpleMLP: 3-layer encoder matching reference kgwas/model.py:10-22.

h = ReLU(W1 x); h = ReLU(W2 h); out = W3 h   (no final activation)
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .init import torch_linear_weight, torch_linear_bias


def init_mlp(key, input_dim: int, hidden_dim: int, output_dim: int, dtype=jnp.float32):
    ks = jax.random.split(key, 6)
    return {
        "fc1": {
            "w": torch_linear_weight(ks[0], input_dim, hidden_dim, dtype),
            "b": torch_linear_bias(ks[1], input_dim, hidden_dim, dtype),
        },
        "fc2": {
            "w": torch_linear_weight(ks[2], hidden_dim, hidden_dim, dtype),
            "b": torch_linear_bias(ks[3], hidden_dim, hidden_dim, dtype),
        },
        "fc3": {
            "w": torch_linear_weight(ks[4], hidden_dim, output_dim, dtype),
            "b": torch_linear_bias(ks[5], hidden_dim, output_dim, dtype),
        },
    }


def apply_mlp(params, x: jnp.ndarray) -> jnp.ndarray:
    h = jax.nn.relu(x @ params["fc1"]["w"] + params["fc1"]["b"])
    h = jax.nn.relu(h @ params["fc2"]["w"] + params["fc2"]["b"])
    return h @ params["fc3"]["w"] + params["fc3"]["b"]


def apply_mlp_tail(params, h1_pre: jnp.ndarray) -> jnp.ndarray:
    """Encoder tail given a precomputed first-layer pre-activation (the
    streamed-feature path: h1_pre = X @ W1 + b1 computed outside jit)."""
    h = jax.nn.relu(h1_pre)
    h = jax.nn.relu(h @ params["fc2"]["w"] + params["fc2"]["b"])
    return h @ params["fc3"]["w"] + params["fc3"]["b"]
