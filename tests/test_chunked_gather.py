"""Src-chunked gather path (graph/merged_layout.ChunkedStreamLayout +
ops/pallas_gat_layer.fused_gat_layer_chunked + gather_rows_chunked).

The chunked stream reorders edges (src_chunk major, dst_tile minor) so the
[E, D] message gather runs as per-chunk fast-emitter takes
(scripts/exp_gather.py --chunked: 4.3 vs 11.3 ns/row on v5e). These tests
pin (1) the layout's coverage invariants and (2) forward/gradient parity of
the full model against the XLA composite path, in CPU interpret mode.
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
from kgwas_tpu.graph.merged_layout import get_chunked_stream
from kgwas_tpu.models import init_hetero_gnn
from kgwas_tpu.models.hetero_gnn import apply_hetero_gnn
from kgwas_tpu.ops.pallas_segment import BE


@pytest.fixture(scope="module")
def world():
    g = make_synthetic_kg(n_snp=900, n_gene=300, n_go=120, seed=11)
    cg = compile_graph(g, edge_pad_multiple=256, node_pad_multiple=_NODE_PAD)
    return g, cg


def test_layout_invariants(world):
    _, cg = world
    for dst_t, L in cg.merged_layouts().items():
        cs = get_chunked_stream(L, max_chunk_rows=512)
        # order is a permutation carrying src/dst
        assert sorted(cs.order.tolist()) == list(range(len(L.src)))
        assert np.array_equal(cs.src, L.src[cs.order])
        assert np.array_equal(cs.dst, L.dst[cs.order])
        # chunk boundaries are relation-aligned and local ids in range
        for c in range(cs.n_chunks):
            lo, hi = cs.chunk_edge_base[c], cs.chunk_edge_base[c + 1]
            assert np.array_equal(
                cs.local_ids[c] + cs.src_bounds[c], cs.src[lo:hi])
            assert (cs.local_ids[c] >= 0).all()
            assert (cs.local_ids[c]
                    < cs.src_bounds[c + 1] - cs.src_bounds[c]).all()
            r = np.searchsorted(np.asarray(L.src_base), cs.src_bounds[c],
                                side="right") - 1
            assert L.src_base[r] <= cs.src_bounds[c]
            assert cs.src_bounds[c + 1] <= L.src_base[r + 1]
        # every edge covered EXACTLY ONCE by its own tile's windows
        cover = np.zeros(len(cs.src), dtype=int)
        tile_of = cs.dst // _TILE_BN
        for t in range(L.n_rows_total // _TILE_BN):
            for k in range(cs.desc_offsets[t], cs.desc_offsets[t + 1]):
                s0 = cs.desc[k]
                sl = slice(s0, min(s0 + BE, len(cs.src)))
                cover[sl] += tile_of[sl] == t
        assert (cover == 1).all(), dst_t
        # windows of one tile never overlap and are LANE-aligned
        for t in range(L.n_rows_total // _TILE_BN):
            ws = cs.desc[cs.desc_offsets[t]:cs.desc_offsets[t + 1]]
            assert (np.diff(ws) >= BE).all()
            assert (ws % 128 == 0).all()
        # CSC perm over the new order stays src-sorted
        assert np.array_equal(cs.src[cs.csc_perm], L.csc_ids)
        # block-diagonality: chunk c's CSC positions read only chunk c's
        # stream block, and the per-chunk local perms reassemble csc_perm
        for c in range(cs.n_chunks):
            lo, hi = int(cs.chunk_edge_base[c]), int(cs.chunk_edge_base[c + 1])
            blk = cs.csc_perm[lo:hi]
            assert (blk >= lo).all() and (blk < hi).all()
            assert np.array_equal(cs.local_perm[c], blk - lo)


def test_edge_cap_splits_dense_relations(world):
    """max_chunk_edges bounds every chunk's edge count (keeps the backward
    per-chunk cotangent tables on the fast gather emitter)."""
    from kgwas_tpu.graph.merged_layout import build_chunked_stream

    _, cg = world
    for dst_t, L in cg.merged_layouts().items():
        cs = build_chunked_stream(L, max_chunk_rows=10 ** 9,
                                  max_chunk_edges=1024)
        ec = np.diff(cs.chunk_edge_base)
        # a single 256-row src group may legitimately exceed the cap; all
        # multi-group chunks must respect it
        rows = np.diff(cs.src_bounds)
        assert ((ec <= 1024) | (rows <= 256)).all(), dst_t
        cover = np.sort(cs.order)
        assert np.array_equal(cover, np.arange(len(L.src)))


def test_padded_layout_invariants(world):
    """fully_owned (fragment-padded, v3) stream: every real edge appears
    exactly once, every window's lanes belong to its tile or are sentinels,
    and the padded local perms stay block-diagonal."""
    from kgwas_tpu.graph.merged_layout import build_chunked_stream

    _, cg = world
    for dst_t, L in cg.merged_layouts().items():
        cs = build_chunked_stream(L, max_chunk_rows=512, pad_fragments=True)
        assert cs.fully_owned
        assert cs.num_real_edges == len(L.src)
        ep = len(cs.src)
        assert ep % BE == 0 or cs.n_chunks == 0
        assert len(cs.dst) == ep
        # real edges: multiset equality with the parent stream
        real = cs.dst < L.n_rows_total
        assert real.sum() == len(L.src)
        pairs = np.stack([cs.src[real], cs.dst[real]], 1)
        ref = np.stack([L.src, L.dst], 1)
        o1 = np.lexsort(pairs.T)
        o2 = np.lexsort(ref.T)
        assert np.array_equal(pairs[o1], ref[o2]), dst_t
        # windows: BE-aligned, fully owned, tile the whole padded stream
        seen = np.zeros(ep, dtype=int)
        for t in range(L.n_rows_total // _TILE_BN):
            for k in range(cs.desc_offsets[t], cs.desc_offsets[t + 1]):
                s0 = int(cs.desc[k])
                assert s0 % BE == 0
                d = cs.dst[s0:s0 + BE]
                assert ((d // _TILE_BN == t) | (d == L.n_rows_total)).all(), dst_t
                seen[s0:s0 + BE] += 1
        assert (seen == 1).all(), dst_t
        # per-chunk perms: block-diagonal, real edges only, CSC-ordered
        for c in range(cs.n_chunks):
            lo, hi = int(cs.chunk_edge_base[c]), int(cs.chunk_edge_base[c + 1])
            lp = cs.local_perm[c]
            assert (lp >= 0).all() and (lp < hi - lo).all()
            assert len(cs.local_ids[c]) == hi - lo
        assert np.array_equal(cs.src[cs.csc_perm], L.csc_ids)


def test_padded_chunk_cap_respects_padded_blocks(world):
    """The edge cap is enforced on PADDED block lengths (they are the
    backward cotangent tables)."""
    from kgwas_tpu.graph.merged_layout import build_chunked_stream

    _, cg = world
    for dst_t, L in cg.merged_layouts().items():
        cs = build_chunked_stream(L, max_chunk_rows=10 ** 9,
                                  max_chunk_edges=2048, pad_fragments=True)
        ec = np.diff(cs.chunk_edge_base)
        rows = np.diff(cs.src_bounds)
        assert ((ec <= 2048) | (rows <= 256)).all(), (dst_t, ec.max())


@pytest.mark.parametrize("padded", [False, True])
def test_full_model_chunked_matches_xla(world, padded):
    _, cg = world
    meta = cg.meta()
    n_real = cg.num_nodes["SNP"]
    cfg_x = ModelConfig(gnn_hidden_dim=128, gnn_num_layers=2)
    cfg_c = ModelConfig(gnn_hidden_dim=128, gnn_num_layers=2,
                        use_pallas=True, gather_chunk_rows=512,
                        pad_fragments=padded)
    params = init_hetero_gnn(jax.random.PRNGKey(0), cfg_x, meta, 20, 32, 16)
    arrays = cg.arrays()

    out_x = np.asarray(apply_hetero_gnn(params, cfg_x, meta, arrays))
    out_c = np.asarray(apply_hetero_gnn(params, cfg_c, meta, arrays))
    np.testing.assert_allclose(out_c[:n_real], out_x[:n_real],
                               rtol=1e-4, atol=1e-4)

    def loss(p, cfg):
        pred = apply_hetero_gnn(p, cfg, meta, arrays)
        return jnp.mean(pred[:n_real] ** 2)

    gx = jax.grad(lambda p: loss(p, cfg_x))(params)
    gc = jax.grad(lambda p: loss(p, cfg_c))(params)
    for a, b in zip(jax.tree_util.tree_leaves(gx),
                    jax.tree_util.tree_leaves(gc)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=1e-4)


@pytest.mark.parametrize("padded", [False, True])
def test_full_model_chunked_multihead(world, padded):
    _, cg = world
    meta = cg.meta()
    n_real = cg.num_nodes["SNP"]
    cfg_x = ModelConfig(gnn_hidden_dim=128, gnn_num_layers=2, gat_num_head=2)
    cfg_c = ModelConfig(gnn_hidden_dim=128, gnn_num_layers=2, gat_num_head=2,
                        use_pallas=True, gather_chunk_rows=512,
                        pad_fragments=padded)
    params = init_hetero_gnn(jax.random.PRNGKey(1), cfg_x, meta, 20, 32, 16)
    arrays = cg.arrays()
    out_x = np.asarray(apply_hetero_gnn(params, cfg_x, meta, arrays))
    out_c = np.asarray(apply_hetero_gnn(params, cfg_c, meta, arrays))
    np.testing.assert_allclose(out_c[:n_real], out_x[:n_real],
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("padded", [False, True])
def test_full_model_chunked_sigmoid_matches_xla(world, padded):
    """sigmoid_gat (reference conv.py:217-221) rides the chunked/owned
    gather paths: forward + grads vs the XLA composite path."""
    _, cg = world
    meta = cg.meta()
    n_real = cg.num_nodes["SNP"]
    cfg_x = ModelConfig(gnn_hidden_dim=128, gnn_num_layers=2,
                        sigmoid_gat=True)
    cfg_c = ModelConfig(gnn_hidden_dim=128, gnn_num_layers=2,
                        sigmoid_gat=True, use_pallas=True,
                        gather_chunk_rows=512, pad_fragments=padded)
    params = init_hetero_gnn(jax.random.PRNGKey(2), cfg_x, meta, 20, 32, 16)
    arrays = cg.arrays()

    out_x = np.asarray(apply_hetero_gnn(params, cfg_x, meta, arrays))
    out_c = np.asarray(apply_hetero_gnn(params, cfg_c, meta, arrays))
    np.testing.assert_allclose(out_c[:n_real], out_x[:n_real],
                               rtol=1e-4, atol=1e-4)

    def loss(p, cfg):
        pred = apply_hetero_gnn(p, cfg, meta, arrays)
        return jnp.mean(pred[:n_real] ** 2)

    gx = jax.grad(lambda p: loss(p, cfg_x))(params)
    gc = jax.grad(lambda p: loss(p, cfg_c))(params)
    for a, b in zip(jax.tree_util.tree_leaves(gx),
                    jax.tree_util.tree_leaves(gc)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=1e-4)


@pytest.mark.parametrize("mode", ["sigmoid", "raw"])
def test_owned_plain_gathered_unnorm_modes(world, mode):
    """fused_gat_layer_plain_gathered in the unnormalized modes == gather +
    fused_gat_layer_unnorm on forward AND all input grads."""
    from kgwas_tpu.graph.merged_layout import build_owned_plain_stream
    from kgwas_tpu.ops.pallas_gat_layer import (
        fused_gat_layer_plain_gathered, fused_gat_layer_unnorm)
    from kgwas_tpu.ops.pallas_segment import gather_rows_csc

    _, cg = world
    rng = np.random.default_rng(7)
    for dst_t, L in cg.merged_layouts().items():
        lay = build_owned_plain_stream(L, split_edges=2048)
        R = len(L.rel_keys)
        xs = jnp.asarray(rng.standard_normal((L.n_src_total, 128)),
                         jnp.float32)
        att = jnp.asarray(rng.standard_normal((R, 128)), jnp.float32)
        adst = jnp.asarray(rng.standard_normal(L.n_rows_total), jnp.float32)
        w = jnp.asarray(rng.standard_normal((L.n_rows_total, 128)),
                        jnp.float32)

        def f_ref(xs, att, adst):
            msgs = gather_rows_csc(xs, jnp.asarray(L.src), L.csc_perm,
                                   L.csc_ids, L.csc_offsets, L.n_src_total,
                                   True)
            out = fused_gat_layer_unnorm(msgs, att, adst, L.dst,
                                         L.row_offsets, L.tile2rel,
                                         L.n_rows_total, 0.2, 2.0, mode,
                                         True)
            return jnp.sum(out * w)

        def f_new(xs, att, adst):
            out = fused_gat_layer_plain_gathered(
                xs, att, adst, lay,
                (L.n_src_total, L.n_rows_total, L.tile2rel), 0.2, 2.0, True,
                mode)
            return jnp.sum(out * w)

        v_r, g_r = jax.value_and_grad(f_ref, argnums=(0, 1, 2))(xs, att, adst)
        v_n, g_n = jax.value_and_grad(f_new, argnums=(0, 1, 2))(xs, att, adst)
        np.testing.assert_allclose(float(v_n), float(v_r), rtol=1e-5)
        for a, b in zip(g_n, g_r):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-4, atol=2e-4)


def test_owned_plain_gathered_matches_plain(world):
    """fused_gat_layer_plain_gathered (per-tile BE-padded stream, split
    backward buffers, windowed segsum) == gather_rows_csc + fused_gat_layer
    on forward AND all input grads. split_edges forced small so multiple
    backward buffers engage."""
    from kgwas_tpu.graph.merged_layout import build_owned_plain_stream
    from kgwas_tpu.ops.pallas_gat_layer import (fused_gat_layer,
                                                fused_gat_layer_plain_gathered)
    from kgwas_tpu.ops.pallas_segment import gather_rows_csc

    _, cg = world
    rng = np.random.default_rng(3)
    for dst_t, L in cg.merged_layouts().items():
        lay = build_owned_plain_stream(L, split_edges=2048)
        # layout invariants: real edges preserved, windows fully owned
        real = lay.dst < L.n_rows_total
        assert real.sum() == len(L.src) == lay.num_real_edges
        assert (np.diff(lay.cut_bases) <= 2048).all()
        assert (lay.cut_bases % BE == 0).all()
        seen = np.zeros(len(lay.src), dtype=int)
        for t in range(L.n_rows_total // _TILE_BN):
            for k in range(lay.desc_offsets[t], lay.desc_offsets[t + 1]):
                s0 = int(lay.desc[k])
                assert s0 % BE == 0
                d = lay.dst[s0:s0 + BE]
                assert ((d // _TILE_BN == t) | (d == L.n_rows_total)).all()
                seen[s0:s0 + BE] += 1
        assert (seen == 1).all(), dst_t

        R = len(L.rel_keys)
        xs = jnp.asarray(rng.standard_normal((L.n_src_total, 128)),
                         jnp.float32)
        att = jnp.asarray(rng.standard_normal((R, 128)), jnp.float32)
        adst = jnp.asarray(rng.standard_normal(L.n_rows_total), jnp.float32)
        w = jnp.asarray(rng.standard_normal((L.n_rows_total, 128)),
                        jnp.float32)

        def f_ref(xs, att, adst):
            msgs = gather_rows_csc(xs, jnp.asarray(L.src), L.csc_perm,
                                   L.csc_ids, L.csc_offsets, L.n_src_total,
                                   True)
            out = fused_gat_layer(msgs, att, adst, L.dst, L.row_offsets,
                                  L.tile2rel, L.n_rows_total, 0.2, 1.0, True)
            return jnp.sum(out * w)

        def f_new(xs, att, adst):
            out = fused_gat_layer_plain_gathered(
                xs, att, adst, lay,
                (L.n_src_total, L.n_rows_total, L.tile2rel), 0.2, 1.0, True)
            return jnp.sum(out * w)

        v_r, g_r = jax.value_and_grad(f_ref, argnums=(0, 1, 2))(xs, att, adst)
        v_n, g_n = jax.value_and_grad(f_new, argnums=(0, 1, 2))(xs, att, adst)
        np.testing.assert_allclose(float(v_n), float(v_r), rtol=1e-5)
        for a, b in zip(g_n, g_r):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-4, atol=2e-4)


def test_chunk_gate_small_graph_stays_unchunked(world):
    """Default gate: graphs whose concat src space fits the fast emitter
    keep the plain merged stream (no chunking work)."""
    from kgwas_tpu.graph.merged_layout import EMITTER_FAST_ROWS

    _, cg = world
    for L in cg.merged_layouts().values():
        # gate in models/hetero_gnn.py:
        # n_src_total > min(EMITTER_FAST_ROWS, 2 * chunk_rows)
        assert L.n_src_total <= EMITTER_FAST_ROWS


def test_owned_plain_gathered_t_matches_untyped(world):
    """fused_gat_layer_plain_gathered_t (layout bundle as TRACED operand)
    must match fused_gat_layer_plain_gathered EXACTLY on forward and all
    grads — only the outer HLO (parameter vs literal) may differ. Also:
    a bundle built from a different layout raises at trace time."""
    import pytest

    from kgwas_tpu.graph.merged_layout import build_owned_plain_stream
    from kgwas_tpu.ops.pallas_gat_layer import (
        fused_gat_layer_plain_gathered, fused_gat_layer_plain_gathered_t,
        plain_layout_operand_arrays)

    _, cg = world
    rng = np.random.default_rng(9)
    layouts = cg.merged_layouts()
    for dst_t, L in layouts.items():
        lay = build_owned_plain_stream(L, split_edges=2048)
        aux = (L.n_src_total, L.n_rows_total, L.tile2rel)
        layt = jax.tree_util.tree_map(jnp.asarray,
                                      plain_layout_operand_arrays(lay, aux))
        R = len(L.rel_keys)
        xs = jnp.asarray(rng.standard_normal((L.n_src_total, 128)),
                         jnp.float32)
        att = jnp.asarray(rng.standard_normal((R, 128)), jnp.float32)
        adst = jnp.asarray(rng.standard_normal(L.n_rows_total), jnp.float32)
        w = jnp.asarray(rng.standard_normal((L.n_rows_total, 128)),
                        jnp.float32)

        def f_ref(xs, att, adst):
            out = fused_gat_layer_plain_gathered(
                xs, att, adst, lay, aux, 0.2, 1.0, True)
            return jnp.sum(out * w)

        def f_t(xs, att, adst):
            out = fused_gat_layer_plain_gathered_t(
                xs, att, adst, layt, lay, aux, 0.2, 1.0, True)
            return jnp.sum(out * w)

        v_r, g_r = jax.value_and_grad(f_ref, argnums=(0, 1, 2))(xs, att, adst)
        v_t, g_t = jax.value_and_grad(f_t, argnums=(0, 1, 2))(xs, att, adst)
        assert float(v_t) == float(v_r)
        for a, b in zip(g_t, g_r):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # fingerprint: a bundle from a DIFFERENT split layout must raise
    dst_t, L = next(iter(layouts.items()))
    lay = build_owned_plain_stream(L, split_edges=2048)
    other = build_owned_plain_stream(L, split_edges=4096)
    aux = (L.n_src_total, L.n_rows_total, L.tile2rel)
    stale = jax.tree_util.tree_map(
        jnp.asarray, plain_layout_operand_arrays(other, aux))
    if len(stale["local_perm"]) != len(lay.local_perm):
        xs = jnp.zeros((L.n_src_total, 128), jnp.float32)
        att = jnp.zeros((len(L.rel_keys), 128), jnp.float32)
        adst = jnp.zeros(L.n_rows_total, jnp.float32)
        with pytest.raises(ValueError, match="plain layout operand"):
            fused_gat_layer_plain_gathered_t(
                xs, att, adst, stale, lay, aux, 0.2, 1.0, True)


def test_raw_gathered_t_matches_literal(world):
    """fused_gat_layer_raw_gathered_t (layout bundle as TRACED operand)
    must match gather_rows_csc + fused_gat_layer EXACTLY on forward and
    all grads, with and without rel_fold."""
    from kgwas_tpu.ops.pallas_gat_layer import (
        fused_gat_layer, fused_gat_layer_raw_gathered_t,
        raw_layout_operand_arrays)
    from kgwas_tpu.ops.pallas_segment import gather_rows_csc

    _, cg = world
    rng = np.random.default_rng(17)
    for dst_t, L in cg.merged_layouts().items():
        layr = jax.tree_util.tree_map(jnp.asarray,
                                      raw_layout_operand_arrays(L))
        R = len(L.rel_keys)
        fold = R if L.n_rows_total % R == 0 else 0
        xs = jnp.asarray(rng.standard_normal((L.n_src_total, 128)),
                         jnp.float32)
        att = jnp.asarray(rng.standard_normal((R, 128)), jnp.float32)
        adst = jnp.asarray(rng.standard_normal(L.n_rows_total), jnp.float32)
        out_rows = L.n_rows_total // fold if fold else L.n_rows_total
        w = jnp.asarray(rng.standard_normal((out_rows, 128)), jnp.float32)

        def f_ref(xs, att, adst):
            msgs = gather_rows_csc(xs, jnp.asarray(L.src), L.csc_perm,
                                   L.csc_ids, L.csc_offsets, L.n_src_total,
                                   True)
            out = fused_gat_layer(msgs, att, adst, L.dst, L.row_offsets,
                                  L.tile2rel, L.n_rows_total, 0.2, 1.0,
                                  True, fold)
            return jnp.sum(out * w)

        def f_t(xs, att, adst):
            out = fused_gat_layer_raw_gathered_t(
                xs, att, adst, layr, L, (L.n_src_total, L.n_rows_total),
                0.2, 1.0, True, fold)
            return jnp.sum(out * w)

        v_r, g_r = jax.value_and_grad(f_ref, argnums=(0, 1, 2))(xs, att, adst)
        v_t, g_t = jax.value_and_grad(f_t, argnums=(0, 1, 2))(xs, att, adst)
        assert float(v_t) == float(v_r), dst_t
        for a, b in zip(g_t, g_r):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_raw_and_plain_t_low_residual_matches(world, monkeypatch):
    """Low-residual form of the raw/plain traced ops (recompute the gather
    in the backward): exact gradient parity vs the literal ops."""
    from kgwas_tpu.graph.merged_layout import build_owned_plain_stream
    from kgwas_tpu.ops import pallas_gat_layer as pgl
    from kgwas_tpu.ops.pallas_gat_layer import (
        fused_gat_layer, fused_gat_layer_plain_gathered,
        fused_gat_layer_plain_gathered_t, fused_gat_layer_raw_gathered_t,
        plain_layout_operand_arrays, raw_layout_operand_arrays)
    from kgwas_tpu.ops.pallas_segment import gather_rows_csc

    monkeypatch.setattr(pgl, "LOW_RESIDUAL_MIN_BYTES", 1)
    _, cg = world
    rng = np.random.default_rng(21)
    dst_t, L = next(iter(cg.merged_layouts().items()))
    R = len(L.rel_keys)
    xs = jnp.asarray(rng.standard_normal((L.n_src_total, 128)), jnp.float32)
    att = jnp.asarray(rng.standard_normal((R, 128)), jnp.float32)
    adst = jnp.asarray(rng.standard_normal(L.n_rows_total), jnp.float32)
    w = jnp.asarray(rng.standard_normal((L.n_rows_total, 128)), jnp.float32)

    layr = jax.tree_util.tree_map(jnp.asarray, raw_layout_operand_arrays(L))

    def f_ref(xs, att, adst):
        msgs = gather_rows_csc(xs, jnp.asarray(L.src), L.csc_perm,
                               L.csc_ids, L.csc_offsets, L.n_src_total, True)
        out = fused_gat_layer(msgs, att, adst, L.dst, L.row_offsets,
                              L.tile2rel, L.n_rows_total, 0.2, 1.0, True)
        return jnp.sum(out * w)

    def f_raw(xs, att, adst):
        out = fused_gat_layer_raw_gathered_t(
            xs, att, adst, layr, L, (L.n_src_total, L.n_rows_total),
            0.2, 1.0, True)
        return jnp.sum(out * w)

    v_r, g_r = jax.value_and_grad(f_ref, argnums=(0, 1, 2))(xs, att, adst)
    v_t, g_t = jax.value_and_grad(f_raw, argnums=(0, 1, 2))(xs, att, adst)
    assert float(v_t) == float(v_r)
    for a, b in zip(g_t, g_r):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    lay = build_owned_plain_stream(L, split_edges=2048)
    aux = (L.n_src_total, L.n_rows_total, L.tile2rel)
    layt = jax.tree_util.tree_map(jnp.asarray,
                                  plain_layout_operand_arrays(lay, aux))

    def f_pl_ref(xs, att, adst):
        out = fused_gat_layer_plain_gathered(
            xs, att, adst, lay, aux, 0.2, 1.0, True)
        return jnp.sum(out * w)

    def f_pl_t(xs, att, adst):
        out = fused_gat_layer_plain_gathered_t(
            xs, att, adst, layt, lay, aux, 0.2, 1.0, True)
        return jnp.sum(out * w)

    v_r, g_r = jax.value_and_grad(f_pl_ref, argnums=(0, 1, 2))(xs, att, adst)
    v_t, g_t = jax.value_and_grad(f_pl_t, argnums=(0, 1, 2))(xs, att, adst)
    assert float(v_t) == float(v_r)
    for a, b in zip(g_t, g_r):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
