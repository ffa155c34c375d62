"""Jitted training/eval step builders.

The reference's hot loop (reference kgwas/kgwas.py:129-155) iterates
CPU-sampled subgraph minibatches; here a step is ONE full-graph
forward+backward with the loss masked to the step's seed batch — identical
math (full-fanout sampling == full-graph restriction; see
tests/test_model.py::test_full_graph_equals_subgraph_seed_prediction) with
every edge computed exactly once per step on the MXU, and the per-batch
Python dict lookups of LDSC weights (reference kgwas.py:142-143) replaced by
a precomputed device array gather.
"""
from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp

from ..config import ModelConfig
from ..models.hetero_gnn import apply_hetero_gnn
from .optim import torch_adam


def make_train_step(
    cfg: ModelConfig, meta: dict, optimizer
) -> Callable:
    """Returns jitted (params, opt_state, arrays, batch_idx, y_node, w_node)
    -> (params, opt_state, loss)."""

    def loss_fn(params, arrays, batch_idx, y_node, w_node):
        pred = apply_hetero_gnn(params, cfg, meta, arrays, training=True)
        p = jnp.take(pred[:, 0], batch_idx, axis=0)
        y = jnp.take(y_node, batch_idx, axis=0)
        w = jnp.take(w_node, batch_idx, axis=0)
        # LDSC-weighted MSE (reference kgwas/kgwas.py:145)
        return jnp.mean(w * (p - y) ** 2)

    @partial(jax.jit, donate_argnums=(0, 1))
    def train_step(params, opt_state, arrays, batch_idx, y_node, w_node):
        loss, grads = jax.value_and_grad(loss_fn)(
            params, arrays, batch_idx, y_node, w_node
        )
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)
        return params, opt_state, loss

    return train_step


def make_train_scan(cfg: ModelConfig, meta: dict, optimizer) -> Callable:
    """Multi-step train dispatch: (params, opt_state, arrays, batch_mat
    [S, B], y_node, w_node) -> (params, opt_state, losses [S]).

    S optimizer steps run under ONE lax.scan inside one jit — a single
    host dispatch per block instead of per step. Identical math to
    make_train_step iterated S times (same jitted step body; scan just
    removes the host round-trips between steps)."""

    def loss_fn(params, arrays, batch_idx, y_node, w_node):
        pred = apply_hetero_gnn(params, cfg, meta, arrays, training=True)
        p = jnp.take(pred[:, 0], batch_idx, axis=0)
        y = jnp.take(y_node, batch_idx, axis=0)
        w = jnp.take(w_node, batch_idx, axis=0)
        return jnp.mean(w * (p - y) ** 2)

    @partial(jax.jit, donate_argnums=(0, 1))
    def train_scan(params, opt_state, arrays, batch_mat, y_node, w_node):
        def body(carry, bidx):
            params, opt_state = carry
            loss, grads = jax.value_and_grad(loss_fn)(
                params, arrays, bidx, y_node, w_node
            )
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = jax.tree_util.tree_map(
                lambda p, u: p + u, params, updates
            )
            return (params, opt_state), loss

        (params, opt_state), losses = jax.lax.scan(
            body, (params, opt_state), batch_mat
        )
        return params, opt_state, losses

    return train_scan


def make_forward(cfg: ModelConfig, meta: dict) -> Callable:
    """Jitted full-graph forward returning per-SNP predictions [N_snp_pad].
    One call evaluates every SNP — replaces the reference's minibatch eval
    loops (reference kgwas/utils.py:20-39) entirely."""

    @jax.jit
    def forward(params, arrays):
        pred = apply_hetero_gnn(params, cfg, meta, arrays, training=False)
        return pred[:, 0]

    return forward


def make_forward_streamed(cfg: ModelConfig, meta: dict, mesh=None,
                          arrays_template=None, streamed_types=()) -> Callable:
    """Forward with host-streamed giant features: (params, arrays_stripped,
    x_host) -> per-SNP predictions. mesh: optional — row-shard h1 and run the
    graph GSPMD-partitioned (streamed x mesh composition)."""
    from .streamed import compute_h1

    row_sharding = None
    jit_kwargs: dict = {}
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from ..parallel.shard import graph_shardings, replicated

        assert arrays_template is not None
        row_sharding = NamedSharding(mesh, P("data", None))
        rep = replicated(mesh)
        gsh = graph_shardings(mesh, arrays_template)
        h1_sh = {t: row_sharding for t in streamed_types}
        jit_kwargs = dict(in_shardings=(rep, gsh, h1_sh),
                          out_shardings=rep)

    @partial(jax.jit, **jit_kwargs)
    def _fwd(params, arrays, h1):
        pred = apply_hetero_gnn(
            params, cfg, meta, arrays, training=False, h1_override=h1
        )
        return pred[:, 0]

    def forward(params, arrays, x_host):
        h1 = compute_h1(params, x_host, meta["padded_nodes"],
                        row_sharding=row_sharding)
        return _fwd(params, arrays, h1)

    return forward


def build_optimizer(lr: float, weight_decay: float):
    return torch_adam(lr, weight_decay)


def epoch_batches(ids, batch_size: int, shuffle: bool, rng) -> list:
    """Seed-batch schedule: consecutive chunks, drop_last=True (reference
    kgwas.py:93 loader kwargs; NeighborLoader default shuffle=False)."""
    import numpy as np

    ids = np.asarray(ids)
    if shuffle:
        ids = ids[rng.permutation(len(ids))]
    n_steps = len(ids) // batch_size
    return [ids[i * batch_size : (i + 1) * batch_size] for i in range(n_steps)]
