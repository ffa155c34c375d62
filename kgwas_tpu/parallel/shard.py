"""Sharded full-graph training over a device mesh (pjit / GSPMD).

The scaling axis of this framework is graph size (SURVEY.md section 5): node
feature/label arrays are row-sharded over the 'data' axis, per-relation edge
arrays are sharded along the edge axis, parameters are replicated, and giant
input-embedding feature dims (pops 57k, reference kgwas_data.py:244) are
column-sharded over the 'model' axis so the first encoder matmul runs tensor-
parallel. XLA GSPMD inserts the halo exchanges (all-gathers of source-node
features over ICI) and the gradient psums automatically from these shardings;
the hand-scheduled shard_map/Pallas path can replace hot relations later
without changing this interface.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

import dataclasses

from ..config import ModelConfig
from ..models.hetero_gnn import _merged_path_active, apply_hetero_gnn


def _gspmd_cfg(cfg: ModelConfig) -> ModelConfig:
    """The Pallas kernels are single-device programs; under plain GSPMD the
    XLA segment path partitions correctly. The merged-layer kernels DO have a
    multi-chip form (shard_map halo exchange, parallel/merged_shard.py) —
    _select_kernel_path switches to it when the layouts divide the mesh."""
    if cfg.use_pallas:
        return dataclasses.replace(cfg, use_pallas=False)
    return cfg


def _select_kernel_path(cfg: ModelConfig, meta: dict, mesh: Mesh,
                        training: bool):
    """Returns (cfg, merged_kernel_fns). Prefers the shard_map'd fused
    Pallas path (3x the XLA segment path per chip, benchmarks/RESULTS.md)
    whenever the model hits the merged gate and the layouts split evenly
    over the mesh; otherwise falls back to GSPMD-partitioned XLA ops."""
    import jax as _jax

    from .merged_shard import (
        make_sharded_merged_kernel_fns,
        sharded_merged_eligible,
    )

    if (
        cfg.use_pallas
        and not cfg.sigmoid_gat  # shard_map kernels are softmax-only (the
                                 # unnorm modes fuse single-device only)
        and _merged_path_active(cfg, meta, False, False, training)
        and sharded_merged_eligible(meta, mesh)
    ):
        fns = make_sharded_merged_kernel_fns(
            mesh, meta, cfg.negative_slope, cfg.temperature,
            interpret=_jax.default_backend() != "tpu",
        )
        return cfg, fns
    return _gspmd_cfg(cfg), None

TP_FEATURE_DIM_THRESHOLD = 1024  # shard input feature dim when >= this


def graph_shardings(mesh: Mesh, arrays: dict) -> dict:
    """NamedSharding pytree matching CompiledGraph.arrays()."""
    data_rows = NamedSharding(mesh, P("data", None))
    data_rows_tp = NamedSharding(mesh, P("data", "model"))
    edge_axis = NamedSharding(mesh, P("data"))

    x_shard = {}
    model_axis_size = mesh.shape.get("model", 1)
    for t, x in arrays["x"].items():
        if model_axis_size > 1 and x.shape[1] >= TP_FEATURE_DIM_THRESHOLD:
            x_shard[t] = data_rows_tp
        else:
            x_shard[t] = data_rows
    return {
        "x": x_shard,
        "edges": {
            k: {"src": edge_axis, "dst": edge_axis}
            for k in arrays["edges"]
        },
    }


def node_vector_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_graph_arrays(mesh: Mesh, arrays: dict) -> dict:
    """device_put the compiled graph with mesh shardings. Array dims must be
    divisible by the mesh axes (compile with node_pad_multiple /
    edge_pad_multiple = multiples of the mesh size)."""
    sh = graph_shardings(mesh, arrays)
    return jax.tree_util.tree_map(
        lambda a, s: jax.device_put(a, s), arrays, sh,
        is_leaf=lambda x: not isinstance(x, dict),
    )


def make_sharded_train_step(
    cfg: ModelConfig,
    meta: dict,
    optimizer,
    mesh: Mesh,
    arrays_template: dict,
):
    """Jitted distributed train step: replicated params, sharded graph.

    Same math as engine.loop.make_train_step — full-graph forward, loss
    masked to the seed batch, LDSC-weighted MSE, torch-Adam update — with
    GSPMD partitioning over the mesh; the merged Pallas kernels run via
    shard_map when eligible (see _select_kernel_path).
    """
    cfg, merged_fns = _select_kernel_path(cfg, meta, mesh, training=True)
    rep = replicated(mesh)
    nodes = node_vector_sharding(mesh)
    gsh = graph_shardings(mesh, arrays_template)

    def loss_fn(params, arrays, batch_idx, y_node, w_node):
        pred = apply_hetero_gnn(params, cfg, meta, arrays, training=True,
                                merged_kernel_fns=merged_fns)
        p = jnp.take(pred[:, 0], batch_idx, axis=0)
        y = jnp.take(y_node, batch_idx, axis=0)
        w = jnp.take(w_node, batch_idx, axis=0)
        return jnp.mean(w * (p - y) ** 2)

    @partial(
        jax.jit,
        in_shardings=(rep, rep, gsh, rep, nodes, nodes),
        out_shardings=(rep, rep, rep),
        donate_argnums=(0, 1),
    )
    def train_step(params, opt_state, arrays, batch_idx, y_node, w_node):
        loss, grads = jax.value_and_grad(loss_fn)(
            params, arrays, batch_idx, y_node, w_node
        )
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)
        return params, opt_state, loss

    return train_step


def make_sharded_forward(cfg: ModelConfig, meta: dict, mesh: Mesh,
                         arrays_template: dict):
    cfg, merged_fns = _select_kernel_path(cfg, meta, mesh, training=False)
    rep = replicated(mesh)
    gsh = graph_shardings(mesh, arrays_template)

    @partial(jax.jit, in_shardings=(rep, gsh), out_shardings=rep)
    def forward(params, arrays):
        return apply_hetero_gnn(
            params, cfg, meta, arrays, training=False,
            merged_kernel_fns=merged_fns,
        )[:, 0]

    return forward
