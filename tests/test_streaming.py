"""Streamed giant-feature path vs the in-HBM path: identical losses, grads,
and updated params."""
import numpy as np
import jax
import jax.numpy as jnp

from kgwas_tpu.config import ModelConfig
from kgwas_tpu.engine.loop import build_optimizer, make_train_step
from kgwas_tpu.engine.streamed import (
    make_streamed_train_step,
    strip_streamed_features,
)
from kgwas_tpu.graph import compile_graph, make_synthetic_kg
from kgwas_tpu.models import init_hetero_gnn
from kgwas_tpu.ops.streaming import streamed_grad_w, streamed_matmul


def test_streamed_matmul_matches_dense():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((50, 300)).astype(np.float32)
    w = jnp.asarray(rng.standard_normal((300, 16)).astype(np.float32))
    b = jnp.asarray(rng.standard_normal(16).astype(np.float32))
    out = streamed_matmul(x, w, bias=b, col_chunk=77)
    np.testing.assert_allclose(
        np.asarray(out), x @ np.asarray(w) + np.asarray(b), rtol=1e-4, atol=1e-5
    )
    dh = rng.standard_normal((50, 16)).astype(np.float32)
    gw = streamed_grad_w(x, jnp.asarray(dh), col_chunk=77)
    np.testing.assert_allclose(np.asarray(gw), x.T @ dh, rtol=1e-4, atol=1e-4)


def test_streamed_train_step_matches_in_hbm():
    gene_dim = 96  # pretend-giant feature dim for the Gene type
    g = make_synthetic_kg(n_snp=120, n_gene=40, n_go=15, seed=17,
                          gene_dim=gene_dim)
    cg = compile_graph(g, edge_pad_multiple=64)
    cfg = ModelConfig(gnn_hidden_dim=16, gnn_num_layers=2)
    meta = cg.meta()
    params = init_hetero_gnn(jax.random.PRNGKey(2), cfg, meta, 20, gene_dim, 16)
    optimizer = build_optimizer(1e-3, 5e-4)

    rng = np.random.default_rng(3)
    n_pad = cg.padded_nodes["SNP"]
    y = jnp.asarray(rng.random(n_pad, dtype=np.float32))
    w = jnp.asarray(rng.random(n_pad, dtype=np.float32))
    bi = jnp.asarray(rng.integers(0, cg.num_nodes["SNP"], 32), dtype=jnp.int32)

    # in-HBM reference
    step_ref = make_train_step(cfg, meta, optimizer)
    p_ref, _, loss_ref = step_ref(
        jax.tree_util.tree_map(jnp.copy, params), optimizer.init(params),
        cg.arrays(), bi, y, w,
    )

    # streamed Gene features (host-resident)
    x_host = {"Gene": np.asarray(cg.node_x["Gene"][: cg.num_nodes["Gene"]])}
    arrays_stripped = strip_streamed_features(
        cg.arrays(), ["Gene"], cg.padded_nodes
    )
    step_s = make_streamed_train_step(cfg, meta, optimizer, ["Gene"],
                                      col_chunk=37)
    p_s, _, loss_s = step_s(
        jax.tree_util.tree_map(jnp.copy, params), optimizer.init(params),
        arrays_stripped, x_host, bi, y, w,
    )

    np.testing.assert_allclose(float(loss_ref), float(loss_s), rtol=1e-5)
    # chunked accumulation reorders float adds; Adam's sqrt(v) normalization
    # amplifies low-order-bit grad differences into ~1e-5 param deltas
    for a, b in zip(jax.tree_util.tree_leaves(p_ref),
                    jax.tree_util.tree_leaves(p_s)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=1e-4)


def test_engine_stream_features_e2e(tmp_path):
    """User-API path: initialize_model(stream_features=['Gene']) trains and
    predicts with host-resident Gene features."""
    from kgwas_tpu import KGWAS, KGWAS_Data

    data = KGWAS_Data.from_synthetic(
        n_snp=150, n_gene=40, n_go=15, seed=5, data_path=str(tmp_path)
    )
    data.load_synthetic_gwas(seed=5)
    data.process_gwas_file()
    data.prepare_split()
    run = KGWAS(data, exp_name="stream_run", seed=5)
    run.initialize_model(gnn_hidden_dim=16, stream_features=["Gene"])
    res = run.train(batch_size=32, epoch=1, save_best_model=False)
    assert np.all(np.isfinite(res.KGWAS_P.values.astype(float)))
    pred = run.predict_all()
    assert len(pred) == 150 and np.all(np.isfinite(pred))

    # streamed predictions match an equivalent non-streamed model with the
    # same params
    run2 = KGWAS(data, exp_name="nostream", seed=5)
    run2.initialize_model(gnn_hidden_dim=16)
    run2.best_params = run.best_params
    pred2 = run2.predict_all()
    np.testing.assert_allclose(pred, pred2, rtol=1e-4, atol=1e-5)


def test_streamed_mesh_composition_matches_single_device():
    """Streamed giant features x data-parallel mesh (VERDICT round-1 item 6 /
    BASELINE config 3): the sharded streamed step reproduces the
    single-device streamed step's losses and params on an 8-device mesh."""
    from kgwas_tpu.parallel.mesh import make_mesh
    from kgwas_tpu.parallel.shard import shard_graph_arrays

    gene_dim = 96
    g = make_synthetic_kg(n_snp=120, n_gene=40, n_go=15, seed=17,
                          gene_dim=gene_dim)
    cg = compile_graph(g, edge_pad_multiple=64, node_pad_multiple=16)
    cfg = ModelConfig(gnn_hidden_dim=16, gnn_num_layers=2)
    meta = cg.meta()
    params = init_hetero_gnn(jax.random.PRNGKey(2), cfg, meta, 20, gene_dim, 16)
    optimizer = build_optimizer(1e-3, 5e-4)

    rng = np.random.default_rng(3)
    n_pad = cg.padded_nodes["SNP"]
    y = jnp.asarray(rng.random(n_pad, dtype=np.float32))
    w = jnp.asarray(rng.random(n_pad, dtype=np.float32))
    bi = jnp.asarray(rng.integers(0, cg.num_nodes["SNP"], 32), dtype=jnp.int32)

    x_host = {"Gene": np.asarray(cg.node_x["Gene"][: cg.num_nodes["Gene"]])}
    stripped = strip_streamed_features(cg.arrays(), ["Gene"], cg.padded_nodes)

    # single-device streamed reference
    step_1 = make_streamed_train_step(cfg, meta, optimizer, ["Gene"],
                                      col_chunk=37)
    p1, _, loss1 = step_1(
        jax.tree_util.tree_map(jnp.copy, params), optimizer.init(params),
        stripped, x_host, bi, y, w,
    )

    # 8-device mesh streamed step
    mesh = make_mesh(data=8, model=1)
    arrays_sh = shard_graph_arrays(mesh, stripped)
    step_m = make_streamed_train_step(cfg, meta, optimizer, ["Gene"],
                                      col_chunk=37, mesh=mesh,
                                      arrays_template=stripped)
    pm, _, lossm = step_m(
        jax.tree_util.tree_map(jnp.copy, params), optimizer.init(params),
        arrays_sh, x_host, bi, y, w,
    )

    np.testing.assert_allclose(float(loss1), float(lossm), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(p1),
                    jax.tree_util.tree_leaves(pm)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=1e-4)


def test_engine_stream_features_with_mesh_e2e(tmp_path):
    """User-API: stream_features + mesh training compose (the round-1
    engine raised ValueError here)."""
    from kgwas_tpu import KGWAS, KGWAS_Data

    data = KGWAS_Data.from_synthetic(
        n_snp=150, n_gene=40, n_go=15, seed=5, data_path=str(tmp_path)
    )
    data.load_synthetic_gwas(seed=5)
    data.process_gwas_file()
    data.prepare_split()
    run = KGWAS(data, exp_name="stream_mesh", seed=5)
    run.initialize_model(gnn_hidden_dim=16, stream_features=["Gene"])
    res = run.train(batch_size=32, epoch=1, save_best_model=False, mesh=8)
    assert np.all(np.isfinite(res.KGWAS_P.values.astype(float)))
