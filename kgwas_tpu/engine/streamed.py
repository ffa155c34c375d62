"""Training step with host-streamed giant input features.

For node types whose embedding tables exceed HBM (pops 57,742-dim at full KG
scale, reference kgwas_data.py:244), the feature matrix stays host-side and
only the first encoder layer touches it (ops/streaming.py). The jitted
full-graph step runs on the precomputed first-layer activations and returns
their cotangent; a second streamed pass produces the fc1 weight gradients.

Math is identical to the in-HBM path (tests/test_streaming.py proves bitwise
agreement); the cost is 2 host->device passes over the table per step.
"""
from __future__ import annotations

from functools import partial
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ModelConfig
from ..models.hetero_gnn import apply_hetero_gnn, encoder_for
from ..ops.streaming import streamed_grad_w, streamed_matmul


def strip_streamed_features(arrays: dict, streamed_types, padded_nodes) -> dict:
    """Replace giant feature arrays with [N_pad, 1] placeholders so they never
    reach the device; the model routes those types through h1_override."""
    x = dict(arrays["x"])
    for t in streamed_types:
        x[t] = jnp.zeros((padded_nodes[t], 1), dtype=jnp.float32)
    return {"x": x, "edges": arrays["edges"]}


def compute_h1(params, x_host: Dict[str, np.ndarray], padded_nodes,
               col_chunk: int = 8192, row_sharding=None) -> Dict[str, jnp.ndarray]:
    """Streamed first-layer pre-activations, padded to N_pad with bias rows
    (zero features -> fc1 output == bias, matching the in-HBM pad rows).

    row_sharding: shard h1 rows over the mesh data axis (streamed x mesh)."""
    out = {}
    for t, xh in x_host.items():
        enc = params[encoder_for(t)]
        w1, b1 = enc["fc1"]["w"], enc["fc1"]["b"]
        out[t] = streamed_matmul(xh, w1, bias=b1, col_chunk=col_chunk,
                                 row_sharding=row_sharding,
                                 row_pad_to=padded_nodes[t])
    return out


def make_streamed_train_step(
    cfg: ModelConfig,
    meta: dict,
    optimizer,
    streamed_types,
    col_chunk: int = 8192,
    mesh=None,
    arrays_template=None,
):
    """Returns step(params, opt_state, arrays_stripped, x_host, batch_idx,
    y_node, w_node) -> (params, opt_state, loss).

    mesh: optional jax.sharding.Mesh — the streamed-features x mesh
    composition (BASELINE config 3 on multi-chip): h1 and its cotangent are
    row-sharded over the 'data' axis, the inner full-graph step runs GSPMD-
    partitioned exactly like parallel/shard.make_sharded_train_step, and the
    two streamed passes over the host table run row-parallel."""
    row_sharding = None
    jit_kwargs_inner: dict = {}
    jit_kwargs_apply: dict = {"donate_argnums": (0, 2)}
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from ..parallel.shard import (
            graph_shardings,
            node_vector_sharding,
            replicated,
        )

        assert arrays_template is not None
        row_sharding = NamedSharding(mesh, P("data", None))
        rep = replicated(mesh)
        nodes = node_vector_sharding(mesh)
        gsh = graph_shardings(mesh, arrays_template)
        h1_sh = {t: row_sharding for t in streamed_types}
        jit_kwargs_inner = dict(
            in_shardings=(rep, h1_sh, gsh, rep, nodes, nodes),
            out_shardings=(rep, rep, h1_sh),
        )
        jit_kwargs_apply["in_shardings"] = (rep, rep, rep)
        jit_kwargs_apply["out_shardings"] = (rep, rep)

    def loss_fn(params, h1_ov, arrays, batch_idx, y_node, w_node):
        pred = apply_hetero_gnn(
            params, cfg, meta, arrays, training=True, h1_override=h1_ov
        )
        p = jnp.take(pred[:, 0], batch_idx, axis=0)
        y = jnp.take(y_node, batch_idx, axis=0)
        w = jnp.take(w_node, batch_idx, axis=0)
        return jnp.mean(w * (p - y) ** 2)

    @partial(jax.jit, **jit_kwargs_inner)
    def inner(params, h1_ov, arrays, batch_idx, y_node, w_node):
        loss, (gp, gh1) = jax.value_and_grad(loss_fn, argnums=(0, 1))(
            params, h1_ov, arrays, batch_idx, y_node, w_node
        )
        return loss, gp, gh1

    @partial(jax.jit, **jit_kwargs_apply)
    def apply_updates(params, grads, opt_state):
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)
        return params, opt_state

    padded_nodes = meta["padded_nodes"]

    def step(params, opt_state, arrays, x_host, batch_idx, y_node, w_node):
        h1 = compute_h1(params, x_host, padded_nodes, col_chunk,
                        row_sharding=row_sharding)
        loss, grads, gh1 = inner(
            params, h1, arrays, batch_idx, y_node, w_node
        )
        for t in streamed_types:
            enc_name = encoder_for(t)
            n_real = x_host[t].shape[0]
            if row_sharding is not None:
                # keep gh1 padded (rows stay mesh-divisible); chunk rows are
                # zero-padded to match, so dW is unaffected
                grads[enc_name]["fc1"]["w"] = streamed_grad_w(
                    x_host[t], gh1[t], col_chunk,
                    row_sharding=row_sharding, row_pad_to=padded_nodes[t],
                )
            else:
                grads[enc_name]["fc1"]["w"] = streamed_grad_w(
                    x_host[t], gh1[t][:n_real], col_chunk
                )
            # pad rows contribute bias grads too (their h1 == b1)
            grads[enc_name]["fc1"]["b"] = jnp.sum(gh1[t], axis=0)
        params, opt_state = apply_updates(params, grads, opt_state)
        return params, opt_state, loss

    return step
