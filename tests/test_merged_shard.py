"""shard_map'd merged GAT layer on the 8-device virtual CPU mesh: must match
the single-device merged kernel, forward and backward."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from kgwas_tpu.graph import compile_graph, make_synthetic_kg
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
    cg = compile_graph(g, edge_pad_multiple=64, node_pad_multiple=256)
    layouts = build_merged_layouts(cg)
    rng = np.random.default_rng(3)
    return cg, layouts, rng


@pytest.mark.parametrize("dst_t", ["SNP", "Gene"])
def test_sharded_merged_matches_single(world, dst_t):
    cg, layouts, rng = world
    L = layouts[dst_t]
    n_tiles = L.n_rows_total // 256
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
