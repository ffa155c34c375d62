"""shard_map'd merged GAT layer on the 8-device virtual CPU mesh: must match
the single-device merged kernel, forward and backward."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from kgwas_tpu.graph import compile_graph, make_synthetic_kg
from kgwas_tpu.ops.pallas_segment import BN as _TILE_BN

# node row spaces follow the shipped kernel tile (BN=512 default; 256/128 via env)
_NODE_PAD = max(256, _TILE_BN)

from kgwas_tpu.graph.merged_layout import build_merged_layouts
from kgwas_tpu.ops.pallas_gat_layer import fused_gat_layer
from kgwas_tpu.parallel.merged_shard import (
    build_device_layouts,
    make_sharded_merged_layer,
)
from kgwas_tpu.parallel.mesh import make_mesh

pytestmark = pytest.mark.skipif(
    jax.device_count() < 8, reason="needs 8 virtual devices"
)

D = 128
N_DEV = 8


@pytest.fixture(scope="module")
def world():
    # need n_tiles divisible by 8 per layout -> bump go count so every type's
    # merged row space has >= 8 tiles
    # sizes chosen so SNP (2 rels x 4 tiles) and Gene (6 rels x 4
    # tiles) merged row spaces split evenly across 8 devices
    g = make_synthetic_kg(n_snp=1000, n_gene=800, n_go=60, seed=61)
    cg = compile_graph(g, edge_pad_multiple=64, node_pad_multiple=_NODE_PAD)
    layouts = build_merged_layouts(cg)
    rng = np.random.default_rng(3)
    return cg, layouts, rng


@pytest.mark.parametrize("dst_t", ["SNP", "Gene"])
def test_sharded_merged_matches_single(world, dst_t):
    cg, layouts, rng = world
    L = layouts[dst_t]
    n_tiles = L.n_rows_total // _TILE_BN
    if n_tiles % N_DEV != 0:
        pytest.skip(f"{dst_t}: {n_tiles} tiles not divisible by {N_DEV}")
    DL = build_device_layouts(L, N_DEV)

    R = len(L.rel_keys)
    xs_all = jnp.asarray(
        rng.standard_normal((L.n_src_total, D)).astype(np.float32)
    )
    att = jnp.asarray(rng.standard_normal((R, D)).astype(np.float32) * 0.1)
    a_dst = jnp.asarray(
        rng.standard_normal(L.n_rows_total).astype(np.float32) * 0.1
    )

    msgs = jnp.take(xs_all, jnp.asarray(L.src), axis=0)
    ref = fused_gat_layer(
        msgs, att, a_dst, L.dst, L.row_offsets, L.tile2rel,
        L.n_rows_total, 0.2, 1.0, True,
    )

    mesh = make_mesh(data=N_DEV, model=1, axis_names=("data", "model"))
    f = make_sharded_merged_layer(mesh, DL, 0.2, 1.0, interpret=True)
    got = f(xs_all, att, a_dst)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)

    # gradients: d_xs must psum across devices correctly
    gmask = jnp.asarray(
        rng.standard_normal((L.n_rows_total, D)).astype(np.float32)
    )

    def loss_ref(x):
        m = jnp.take(x, jnp.asarray(L.src), axis=0)
        return jnp.sum(
            fused_gat_layer(m, att, a_dst, L.dst, L.row_offsets, L.tile2rel,
                            L.n_rows_total, 0.2, 1.0, True) * gmask
        )

    def loss_sharded(x):
        return jnp.sum(f(x, att, a_dst) * gmask)

    g_ref = jax.grad(loss_ref)(xs_all)
    g_sh = jax.grad(loss_sharded)(xs_all)
    np.testing.assert_allclose(np.asarray(g_sh), np.asarray(g_ref),
                               rtol=5e-3, atol=5e-3)


def test_full_model_sharded_pallas_train_matches_single():
    """make_sharded_train_step auto-selects the shard_map'd merged kernels
    (parallel/shard._select_kernel_path) when every dst layout divides the
    mesh; two full train steps must match the single-device merged path."""
    from kgwas_tpu.config import ModelConfig
    from kgwas_tpu.engine.loop import build_optimizer, make_train_step
    from kgwas_tpu.models import init_hetero_gnn
    from kgwas_tpu.parallel.merged_shard import sharded_merged_eligible
    from kgwas_tpu.parallel.shard import (
        _select_kernel_path,
        make_sharded_train_step,
        node_vector_sharding,
        replicated,
        shard_graph_arrays,
    )

    # sizes picked so every merged dst layout has tiles divisible by 8:
    # SNP 2 rels x 4 tiles, Gene 6 x 4, BP 2 x 8, CC/MF 1 x 8 — scaled
    # with the tile so counts are BN-invariant
    _s = _TILE_BN // 256
    g = make_synthetic_kg(n_snp=1000 * _s, n_gene=800 * _s, n_go=1800 * _s,
                          seed=71)
    cg = compile_graph(g, edge_pad_multiple=64, node_pad_multiple=_NODE_PAD)
    cfg = ModelConfig(gnn_hidden_dim=128, gnn_num_layers=2, use_pallas=True)
    meta = cg.meta()
    mesh = make_mesh(data=N_DEV, model=1, axis_names=("data", "model"))
    assert sharded_merged_eligible(meta, mesh)
    # guard: the fast path actually got selected (not the GSPMD fallback)
    sel_cfg, fns = _select_kernel_path(cfg, meta, mesh, training=True)
    assert fns is not None and sel_cfg.use_pallas

    params = init_hetero_gnn(jax.random.PRNGKey(7), cfg, meta, 20, 32, 16)
    optimizer = build_optimizer(1e-3, 5e-4)

    rng = np.random.default_rng(13)
    n_pad = cg.padded_nodes["SNP"]
    y_node = jnp.asarray(rng.random(n_pad, dtype=np.float32))
    w_node = jnp.asarray(rng.random(n_pad, dtype=np.float32))
    batches = [
        jnp.asarray(rng.integers(0, cg.num_nodes["SNP"], 64), dtype=jnp.int32)
        for _ in range(3)
    ]

    # step-1 gradients: per-leaf error relative to leaf scale (post-Adam
    # params are NOT comparable — Adam's sqrt(v) normalization turns
    # noise-level grad entries into full-size sign-flipped updates)
    from kgwas_tpu.models.hetero_gnn import apply_hetero_gnn

    def loss_at(p, kernel_fns):
        pred = apply_hetero_gnn(p, sel_cfg, meta, cg.arrays(), training=True,
                                merged_kernel_fns=kernel_fns)
        pb = jnp.take(pred[:, 0], batches[0], axis=0)
        yb = jnp.take(y_node, batches[0], axis=0)
        wb = jnp.take(w_node, batches[0], axis=0)
        return jnp.mean(wb * (pb - yb) ** 2)

    g_single = jax.grad(lambda p: loss_at(p, None))(params)
    g_shard = jax.grad(lambda p: loss_at(p, fns))(params)
    for a, b in zip(jax.tree_util.tree_leaves(g_single),
                    jax.tree_util.tree_leaves(g_shard)):
        scale = float(np.max(np.abs(np.asarray(a)))) + 1e-12
        err = float(np.max(np.abs(np.asarray(a) - np.asarray(b))))
        assert err <= 1e-4 * scale + 1e-9, (err, scale)

    step1 = make_train_step(cfg, meta, optimizer)
    p1 = jax.tree_util.tree_map(jnp.copy, params)
    s1 = optimizer.init(params)
    losses1 = []
    for b in batches:
        p1, s1, l1 = step1(p1, s1, cg.arrays(), b, y_node, w_node)
        losses1.append(float(l1))

    arrays = shard_graph_arrays(mesh, cg.arrays())
    step2 = make_sharded_train_step(cfg, meta, optimizer, mesh, cg.arrays())
    p2 = jax.tree_util.tree_map(jnp.copy, params)
    s2 = optimizer.init(params)
    losses2 = []
    for b in batches:
        p2, s2, l2 = step2(
            p2, s2, arrays,
            jax.device_put(b, replicated(mesh)),
            jax.device_put(y_node, node_vector_sharding(mesh)),
            jax.device_put(w_node, node_vector_sharding(mesh)),
        )
        losses2.append(float(l2))

    # 3-step loss parity: step-k loss depends on all prior updates through
    # both paths, so this validates the full train step end to end
    np.testing.assert_allclose(losses1, losses2, rtol=1e-4)


def test_sharded_merged_eligibility_gates():
    """Indivisible layouts or an active tensor-parallel axis must fall back."""
    from kgwas_tpu.parallel.merged_shard import sharded_merged_eligible

    g = make_synthetic_kg(n_snp=100, n_gene=60, n_go=20, seed=72)
    cg = compile_graph(g, edge_pad_multiple=64, node_pad_multiple=_NODE_PAD)
    meta = cg.meta()
    # every type pads to 256 -> CC/MF have 1 tile each: not divisible by 8
    mesh = make_mesh(data=N_DEV, model=1, axis_names=("data", "model"))
    assert not sharded_merged_eligible(meta, mesh)
    # model axis active -> ineligible even with divisible layouts
    g2 = make_synthetic_kg(n_snp=1000, n_gene=800, n_go=1800, seed=71)
    cg2 = compile_graph(g2, edge_pad_multiple=64, node_pad_multiple=_NODE_PAD)
    mesh2 = make_mesh(data=4, model=2, axis_names=("data", "model"))
    assert not sharded_merged_eligible(cg2.meta(), mesh2)
