"""Distributed tests on the 8-device virtual CPU mesh: sharded training must
produce the same math as single-device, and the graft entry points must work."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from kgwas_tpu.config import ModelConfig
from kgwas_tpu.engine.loop import build_optimizer, make_forward, make_train_step
from kgwas_tpu.graph import compile_graph, make_synthetic_kg
from kgwas_tpu.models import init_hetero_gnn
from kgwas_tpu.parallel.mesh import make_mesh
from kgwas_tpu.parallel.shard import (
    make_sharded_forward,
    make_sharded_train_step,
    node_vector_sharding,
    replicated,
    shard_graph_arrays,
)

pytestmark = pytest.mark.skipif(
    jax.device_count() < 8, reason="needs 8 virtual devices"
)


def _setup(data_axis, model_axis=1, gene_dim=32):
    g = make_synthetic_kg(
        n_snp=160, n_gene=48, n_go=16, seed=21, gene_dim=gene_dim
    )
    cg = compile_graph(
        g, edge_pad_multiple=64 * data_axis, node_pad_multiple=8 * data_axis
    )
    cfg = ModelConfig(gnn_hidden_dim=16, gnn_num_layers=2)
    meta = cg.meta()
    params = init_hetero_gnn(
        jax.random.PRNGKey(3), cfg, meta, 20, gene_dim, 16
    )
    return g, cg, cfg, meta, params


def test_sharded_forward_matches_single_device():
    g, cg, cfg, meta, params = _setup(data_axis=8)
    single = make_forward(cfg, meta)(params, cg.arrays())

    mesh = make_mesh(data=8, model=1)
    arrays = shard_graph_arrays(mesh, cg.arrays())
    sharded = make_sharded_forward(cfg, meta, mesh, cg.arrays())(params, arrays)
    np.testing.assert_allclose(
        np.asarray(single), np.asarray(sharded), rtol=1e-5, atol=1e-6
    )


def test_sharded_train_step_matches_single_device():
    g, cg, cfg, meta, params = _setup(data_axis=4)
    optimizer = build_optimizer(1e-3, 5e-4)

    n_pad = cg.padded_nodes["SNP"]
    rng = np.random.default_rng(5)
    y_node = jnp.asarray(rng.random(n_pad, dtype=np.float32))
    w_node = jnp.asarray(rng.random(n_pad, dtype=np.float32))
    batch_idx = jnp.asarray(rng.integers(0, cg.num_nodes["SNP"], 32), dtype=jnp.int32)

    # single device
    step1 = make_train_step(cfg, meta, optimizer)
    p1, _, loss1 = step1(
        jax.tree_util.tree_map(jnp.copy, params),
        optimizer.init(params),
        cg.arrays(),
        batch_idx,
        y_node,
        w_node,
    )

    # 4x2 mesh (data x model); gene_dim below TP threshold -> model axis idle
    mesh = make_mesh(data=4, model=2)
    arrays = shard_graph_arrays(mesh, cg.arrays())
    step2 = make_sharded_train_step(cfg, meta, optimizer, mesh, cg.arrays())
    p2, _, loss2 = step2(
        jax.tree_util.tree_map(jnp.copy, params),
        optimizer.init(params),
        arrays,
        jax.device_put(batch_idx, replicated(mesh)),
        jax.device_put(y_node, node_vector_sharding(mesh)),
        jax.device_put(w_node, node_vector_sharding(mesh)),
    )

    np.testing.assert_allclose(float(loss1), float(loss2), rtol=1e-5)
    flat1 = jax.tree_util.tree_leaves(p1)
    flat2 = jax.tree_util.tree_leaves(p2)
    for a, b in zip(flat1, flat2):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-6
        )


def test_tp_sharded_giant_features():
    """gene feature dim >= TP threshold: 'model' axis shards the encoder
    matmul; result must match unsharded."""
    from kgwas_tpu.parallel import shard as shard_mod

    gene_dim = shard_mod.TP_FEATURE_DIM_THRESHOLD
    g, cg, cfg, meta, params = _setup(data_axis=4, gene_dim=gene_dim)
    single = make_forward(cfg, meta)(params, cg.arrays())

    mesh = make_mesh(data=4, model=2)
    arrays = shard_graph_arrays(mesh, cg.arrays())
    sharded = make_sharded_forward(cfg, meta, mesh, cg.arrays())(params, arrays)
    np.testing.assert_allclose(
        np.asarray(single), np.asarray(sharded), rtol=1e-4, atol=1e-5
    )


def test_graft_entry_single_and_multichip():
    import sys

    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert out.shape[1] == 1
    assert np.all(np.isfinite(np.asarray(out)))

    ge.dryrun_multichip(8)


def test_sharded_step_with_pallas_cfg_falls_back():
    """use_pallas configs whose layouts don't divide the mesh (here: 64-node
    padding, no merged layouts) must fall back to the GSPMD XLA path; the
    eligible case takes the shard_map'd kernels (test_merged_shard)."""
    g, cg, cfg, meta, params = _setup(data_axis=8)
    import dataclasses

    cfg_p = dataclasses.replace(cfg, use_pallas=True)
    mesh = make_mesh(data=8, model=1)
    arrays = shard_graph_arrays(mesh, cg.arrays())
    fwd = make_sharded_forward(cfg_p, meta, mesh, cg.arrays())
    sharded = np.asarray(fwd(params, arrays))
    single = np.asarray(make_forward(cfg, meta)(params, cg.arrays()))
    np.testing.assert_allclose(single, sharded, rtol=1e-5, atol=1e-6)
