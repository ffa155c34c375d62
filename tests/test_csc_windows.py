"""Fragment-windowed backward permute (graph/merged_layout.build_csc_windows
+ ops/pallas_segment.segment_sum_windows / gather_rows_csc_win).

For SNP-shaped merged groups (small src space, huge E) the backward's
cotangent permute table is the E-row cotangent itself — slow-emitter
territory. The window layout regroups the CSC stream (table_chunk major,
src minor) so the permute runs as per-chunk fast takes and the segment-sum
walks per-src-tile windows. CPU interpret mode.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from kgwas_tpu.config import ModelConfig
from kgwas_tpu.ops.pallas_segment import BN as _TILE_BN

# node row spaces follow the shipped kernel tile (BN=512 default; 256/128 via env)
_NODE_PAD = max(256, _TILE_BN)

from kgwas_tpu.graph import compile_graph, make_synthetic_kg
from kgwas_tpu.graph.merged_layout import build_csc_windows
from kgwas_tpu.models import init_hetero_gnn
from kgwas_tpu.models.hetero_gnn import apply_hetero_gnn
from kgwas_tpu.ops.pallas_segment import (BE, gather_rows_csc_win,
                                          segment_sum_windows)


@pytest.fixture(scope="module")
def world():
    g = make_synthetic_kg(n_snp=900, n_gene=300, n_go=120, seed=7)
    cg = compile_graph(g, edge_pad_multiple=256, node_pad_multiple=_NODE_PAD)
    return g, cg


def test_layout_invariants(world):
    _, cg = world
    for dst_t, L in cg.merged_layouts().items():
        wl = build_csc_windows(L, max_chunk_edges=512)
        e = len(L.csc_perm)
        # per-chunk local perms reference only their table slice, and
        # reassemble a permutation of the full E-space
        seen = []
        for c in range(wl.n_chunks):
            lo, hi = int(wl.edge_bounds[c]), int(wl.edge_bounds[c + 1])
            lp = wl.local_perm[c]
            assert (lp >= 0).all() and (lp < hi - lo).all()
            seen.append(lp + lo)
        seen = np.concatenate(seen) if seen else np.zeros(0, int)
        assert sorted(seen.tolist()) == list(range(e))
        # grouped ids match the permuted stream's src ids
        assert np.array_equal(wl.ids, L.csc_ids[np.argsort(
            np.searchsorted(wl.edge_bounds, L.csc_perm, side="right") - 1,
            kind="stable")])
        # every grouped position covered EXACTLY ONCE by its own tile
        cover = np.zeros(e, dtype=int)
        tile_of = wl.ids // _TILE_BN
        n_src_tiles = -(-L.n_src_total // _TILE_BN)
        for t in range(n_src_tiles):
            for k in range(wl.desc_offsets[t], wl.desc_offsets[t + 1]):
                s0 = wl.desc[k]
                sl = slice(s0, min(s0 + BE, e))
                cover[sl] += tile_of[sl] == t
        assert (cover == 1).all(), dst_t


def test_segment_sum_windows_matches_dense(world):
    _, cg = world
    rng = np.random.default_rng(0)
    for dst_t, L in cg.merged_layouts().items():
        wl = build_csc_windows(L, max_chunk_edges=512)
        e = len(L.csc_perm)
        vals = rng.standard_normal((e, 128)).astype(np.float32)
        dense = np.zeros((L.n_src_total, 128), np.float32)
        np.add.at(dense, wl.ids, vals)
        out = segment_sum_windows(
            jnp.asarray(vals), jnp.asarray(wl.ids),
            jnp.asarray(wl.desc if len(wl.desc) else np.zeros(1, np.int32)),
            jnp.asarray(wl.desc_offsets), L.n_src_total, interpret=True)
        np.testing.assert_allclose(np.asarray(out), dense,
                                   rtol=1e-5, atol=1e-4)


def test_gather_win_grad_matches_take(world):
    _, cg = world
    rng = np.random.default_rng(1)
    L = cg.merged_layouts()["SNP"]
    wl = build_csc_windows(L, max_chunk_edges=512)
    x = jnp.asarray(
        rng.standard_normal((L.n_src_total, 128)).astype(np.float32))
    gm = jnp.asarray(
        rng.standard_normal((len(L.src), 128)).astype(np.float32))
    idx = jnp.asarray(L.src)

    def f_win(x):
        return jnp.vdot(gather_rows_csc_win(
            x, idx, tuple(int(b) for b in wl.edge_bounds),
            tuple(wl.local_perm), wl.ids, wl.desc, wl.desc_offsets,
            L.n_src_total, True), gm)

    def f_ref(x):
        return jnp.vdot(jnp.take(x, idx, axis=0), gm)

    np.testing.assert_allclose(float(f_win(x)), float(f_ref(x)), rtol=1e-5)
    gw = np.asarray(jax.grad(f_win)(x))
    gr = np.asarray(jax.grad(f_ref)(x))
    np.testing.assert_allclose(gw, gr, rtol=1e-4, atol=1e-4)


def test_full_model_windowed_matches_xla(world):
    _, cg = world
    meta = cg.meta()
    n_real = cg.num_nodes["SNP"]
    cfg_x = ModelConfig(gnn_hidden_dim=128, gnn_num_layers=2)
    cfg_w = ModelConfig(gnn_hidden_dim=128, gnn_num_layers=2,
                        use_pallas=True, bwd_window_edges=512,
                        gather_chunk_rows=10 ** 9)  # windows, not chunks
    params = init_hetero_gnn(jax.random.PRNGKey(0), cfg_x, meta, 20, 32, 16)
    arrays = cg.arrays()

    out_x = np.asarray(apply_hetero_gnn(params, cfg_x, meta, arrays))
    out_w = np.asarray(apply_hetero_gnn(params, cfg_w, meta, arrays))
    np.testing.assert_allclose(out_w[:n_real], out_x[:n_real],
                               rtol=1e-4, atol=1e-4)

    def loss(p, cfg):
        pred = apply_hetero_gnn(p, cfg, meta, arrays)
        return jnp.mean(pred[:n_real] ** 2)

    gx = jax.grad(lambda p: loss(p, cfg_x))(params)
    gw = jax.grad(lambda p: loss(p, cfg_w))(params)
    for a, b in zip(jax.tree_util.tree_leaves(gx),
                    jax.tree_util.tree_leaves(gw)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=1e-4)
