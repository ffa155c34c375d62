"""Merged GAT layer kernel vs the per-relation XLA composition (interpret
mode), including gradients through the custom VJP and the merged layout."""
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
from kgwas_tpu.ops.segment import (
    edge_valid_mask,
    gather_rows,
    leaky_relu,
    segment_softmax,
    segment_sum,
)

D = 128
SLOPE = 0.2
TEMP = 1.0


@pytest.fixture(scope="module")
def world():
    g = make_synthetic_kg(n_snp=120, n_gene=50, n_go=20, seed=31)
    cg = compile_graph(g, edge_pad_multiple=64, node_pad_multiple=_NODE_PAD)
    layouts = build_merged_layouts(cg)
    rng = np.random.default_rng(7)
    # per-relation params: W_src (identity-free random), att_src, att_dst
    params = {}
    h = {t: jnp.asarray(rng.standard_normal((cg.padded_nodes[t], D))
                        .astype(np.float32))
         for t in cg.num_nodes}
    for rk, r in cg.relations.items():
        params[rk] = {
            "w": jnp.asarray(rng.standard_normal((D, D)).astype(np.float32)
                             * 0.1),
            "att_src": jnp.asarray(rng.standard_normal(D).astype(np.float32)
                                   * 0.1),
            "att_dst_vec": jnp.asarray(
                rng.standard_normal(D).astype(np.float32) * 0.1
            ),
        }
    return cg, layouts, params, h


def xla_reference_out(cg, params, h, dst_t):
    """Sum over relations of per-relation GAT aggregation (XLA ops)."""
    out = None
    for rk, r in sorted(cg.relations.items()):
        if r.dst_type != dst_t:
            continue
        p = params[rk]
        xs = h[r.src_type] @ p["w"]
        a_src = xs @ p["att_src"]
        a_dst = h[dst_t] @ p["att_dst_vec"]
        src = jnp.asarray(r.src.astype(np.int32))
        dst = jnp.asarray(r.dst.astype(np.int32))
        valid = edge_valid_mask(len(r.src), r.num_edges)
        logits = leaky_relu(
            gather_rows(a_src, src) + gather_rows(a_dst, dst), SLOPE
        ) / TEMP
        alpha = segment_softmax(logits, dst, cg.padded_nodes[dst_t], valid)
        alpha = jnp.where(valid, alpha, 0.0)
        o = segment_sum(gather_rows(xs, src) * alpha[:, None], dst,
                        cg.padded_nodes[dst_t])
        out = o if out is None else out + o
    return out


def merged_out(cg, L, params, h):
    xs_parts, att_rows, adst_parts = [], [], []
    for slot, rk in enumerate(L.rel_keys):
        p = params[rk]
        xs_parts.append(h[L.src_types[slot]] @ p["w"])
        att_rows.append(p["att_src"])
        adst_parts.append(h[L.dst_type] @ p["att_dst_vec"])
    xs_all = jnp.concatenate(xs_parts, axis=0)
    att = jnp.stack(att_rows, axis=0)
    a_dst_all = jnp.concatenate(adst_parts, axis=0)
    msgs = jnp.take(xs_all, jnp.asarray(L.src), axis=0)
    out_all = fused_gat_layer(
        msgs, att, a_dst_all, L.dst, L.row_offsets, L.tile2rel,
        L.n_rows_total, SLOPE, TEMP, True,
    )
    R = len(L.rel_keys)
    return out_all.reshape(R, L.n_rows_per_rel, D).sum(axis=0)


def test_layout_invariants(world):
    cg, layouts, params, h = world
    for dst_t, L in layouts.items():
        from kgwas_tpu.ops.pallas_segment import BN

        assert L.n_rows_total % BN == 0
        assert np.all(np.diff(L.row_offsets) >= 0)
        assert L.row_offsets[-1] == len(L.src)
        # every tile belongs to one relation
        assert len(L.tile2rel) == L.n_rows_total // BN
        # dst ids stay inside their slot's row block
        for slot in range(len(L.rel_keys)):
            lo, hi = L.edge_base[slot], L.edge_base[slot + 1]
            dsts = L.dst[lo:hi]
            assert dsts.min() >= slot * L.n_rows_per_rel
            assert dsts.max() < (slot + 1) * L.n_rows_per_rel
        # CSC is a permutation with ascending ids
        assert np.all(np.sort(L.csc_perm) == np.arange(len(L.src)))
        assert np.all(np.diff(L.csc_ids) >= 0)


@pytest.mark.parametrize("dst_t", ["SNP", "Gene", "BiologicalProcess"])
def test_merged_forward_matches_xla(world, dst_t):
    cg, layouts, params, h = world
    L = layouts[dst_t]
    ref = np.asarray(xla_reference_out(cg, params, h, dst_t))
    got = np.asarray(merged_out(cg, L, params, h))
    n_real = cg.num_nodes[dst_t]
    np.testing.assert_allclose(got[:n_real], ref[:n_real], rtol=2e-4,
                               atol=2e-4)


def test_merged_grads_match_xla(world):
    cg, layouts, params, h = world
    dst_t = "Gene"
    L = layouts[dst_t]
    n_real = cg.num_nodes[dst_t]
    rng = np.random.default_rng(9)
    gmask = jnp.asarray(rng.standard_normal((n_real, D)).astype(np.float32))

    def loss_ref(h_in):
        out = xla_reference_out(cg, params, {**h, "Gene": h_in,
                                             "SNP": h["SNP"]}, dst_t)
        return jnp.sum(out[:n_real] * gmask)

    def loss_merged(h_in):
        out = merged_out(cg, L, params, {**h, "Gene": h_in})
        return jnp.sum(out[:n_real] * gmask)

    g_ref = jax.grad(loss_ref)(h["Gene"])
    g_mer = jax.grad(loss_merged)(h["Gene"])
    np.testing.assert_allclose(np.asarray(g_mer), np.asarray(g_ref),
                               rtol=5e-3, atol=5e-3)


def test_full_model_merged_matches_xla():
    """End-to-end HeteroGNN: merged pallas path vs plain XLA path."""
    from kgwas_tpu.config import ModelConfig
    from kgwas_tpu.models import init_hetero_gnn
    from kgwas_tpu.models.hetero_gnn import apply_hetero_gnn

    g = make_synthetic_kg(n_snp=90, n_gene=35, n_go=14, seed=41)
    cg = compile_graph(g, edge_pad_multiple=64, node_pad_multiple=_NODE_PAD)
    meta = cg.meta()
    cfg_x = ModelConfig(gnn_hidden_dim=128, gnn_num_layers=2)
    cfg_m = ModelConfig(gnn_hidden_dim=128, gnn_num_layers=2, use_pallas=True,
                        pallas_mode="merged")
    params = init_hetero_gnn(jax.random.PRNGKey(5), cfg_x, meta, 20, 32, 16)
    arrays = cg.arrays()
    n_real = cg.num_nodes["SNP"]

    out_x = np.asarray(apply_hetero_gnn(params, cfg_x, meta, arrays))
    out_m = np.asarray(apply_hetero_gnn(params, cfg_m, meta, arrays))
    np.testing.assert_allclose(out_m[:n_real], out_x[:n_real],
                               rtol=1e-4, atol=1e-4)

    def loss(p, cfg):
        pred = apply_hetero_gnn(p, cfg, meta, arrays)
        return jnp.mean(pred[:n_real] ** 2)

    gx = jax.grad(lambda p: loss(p, cfg_x))(params)
    gm = jax.grad(lambda p: loss(p, cfg_m))(params)
    for a, b in zip(jax.tree_util.tree_leaves(gx), jax.tree_util.tree_leaves(gm)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=1e-4)


@pytest.mark.parametrize("aggr", ["sum", "mean"])
def test_rel_fold_identical_to_unfolded(aggr):
    """rel_fold (the cross-relation sum folded into the fused ops' custom
    VJP with the `i % fold_tiles` cotangent index map) must be EXACTLY the
    unfolded path: same primitive sequence forward (reshape+sum inside vs
    outside the custom_vjp), and a backward that reads identical cotangent
    row values without materializing the [R*N, D] broadcast. Checked
    end-to-end through the model on forward AND every grad leaf, for both
    sum and mean cross-relation aggregation."""
    from kgwas_tpu.config import ModelConfig
    from kgwas_tpu.models import init_hetero_gnn
    from kgwas_tpu.models.hetero_gnn import apply_hetero_gnn

    g = make_synthetic_kg(n_snp=90, n_gene=35, n_go=14, seed=47)
    cg = compile_graph(g, edge_pad_multiple=64, node_pad_multiple=_NODE_PAD)
    meta = cg.meta()
    kw = dict(gnn_hidden_dim=128, gnn_num_layers=2, gnn_aggr=aggr,
              use_pallas=True, pallas_mode="merged")
    cfg_u = ModelConfig(rel_fold=False, **kw)
    cfg_f = ModelConfig(rel_fold=True, **kw)
    params = init_hetero_gnn(jax.random.PRNGKey(7), cfg_u, meta, 20, 32, 16)
    arrays = cg.arrays()
    n_real = cg.num_nodes["SNP"]

    out_u = np.asarray(apply_hetero_gnn(params, cfg_u, meta, arrays))
    out_f = np.asarray(apply_hetero_gnn(params, cfg_f, meta, arrays))
    np.testing.assert_allclose(out_f[:n_real], out_u[:n_real],
                               rtol=1e-6, atol=1e-6)

    def loss(p, cfg):
        pred = apply_hetero_gnn(p, cfg, meta, arrays)
        return jnp.mean(pred[:n_real] ** 2)

    gu = jax.grad(lambda p: loss(p, cfg_u))(params)
    gf = jax.grad(lambda p: loss(p, cfg_f))(params)
    for a, b in zip(jax.tree_util.tree_leaves(gu),
                    jax.tree_util.tree_leaves(gf)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)


def test_rel_fold_sigmoid_mode_matches_xla():
    """rel_fold through the unnormalized (sigmoid_gat) kernels vs the plain
    XLA path — covers fused_gat_layer_unnorm's folded backward."""
    from kgwas_tpu.config import ModelConfig
    from kgwas_tpu.models import init_hetero_gnn
    from kgwas_tpu.models.hetero_gnn import apply_hetero_gnn

    g = make_synthetic_kg(n_snp=90, n_gene=35, n_go=14, seed=49)
    cg = compile_graph(g, edge_pad_multiple=64, node_pad_multiple=_NODE_PAD)
    meta = cg.meta()
    kw = dict(gnn_hidden_dim=128, gnn_num_layers=2, sigmoid_gat=True)
    cfg_x = ModelConfig(**kw)
    cfg_f = ModelConfig(use_pallas=True, pallas_mode="merged",
                        rel_fold=True, **kw)
    params = init_hetero_gnn(jax.random.PRNGKey(8), cfg_x, meta, 20, 32, 16)
    arrays = cg.arrays()
    n_real = cg.num_nodes["SNP"]

    out_x = np.asarray(apply_hetero_gnn(params, cfg_x, meta, arrays))
    out_f = np.asarray(apply_hetero_gnn(params, cfg_f, meta, arrays))
    np.testing.assert_allclose(out_f[:n_real], out_x[:n_real],
                               rtol=1e-4, atol=1e-4)

    def loss(p, cfg):
        pred = apply_hetero_gnn(p, cfg, meta, arrays)
        return jnp.mean(pred[:n_real] ** 2)

    gx = jax.grad(lambda p: loss(p, cfg_x))(params)
    gf = jax.grad(lambda p: loss(p, cfg_f))(params)
    for a, b in zip(jax.tree_util.tree_leaves(gx),
                    jax.tree_util.tree_leaves(gf)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=1e-4)


def test_layout_operands_identical_and_shrinks_hlo():
    """cfg.layout_operands threads the gathered path's index arrays through
    the arrays pytree as traced args. Checks (a) forward + every grad leaf
    EXACTLY matches the literal-constant path, and (b) the lowered
    stablehlo text actually shrinks by ~the layout bytes (the point of the
    feature: above ~400k SNPs the literal form broke the relay's
    /remote_compile — benchmarks/RESULTS.md round 4)."""
    from kgwas_tpu.config import ModelConfig
    from kgwas_tpu.models import init_hetero_gnn
    from kgwas_tpu.models.hetero_gnn import (apply_hetero_gnn,
                                             build_layout_operands)

    # gather_chunk_rows=256 forces the chunked/gathered path at test size
    g = make_synthetic_kg(n_snp=600, n_gene=200, n_go=60, seed=53)
    cg = compile_graph(g, edge_pad_multiple=64, node_pad_multiple=_NODE_PAD)
    meta = cg.meta()
    kw = dict(gnn_hidden_dim=128, gnn_num_layers=2, use_pallas=True,
              pallas_mode="merged", gather_chunk_rows=256)
    cfg_c = ModelConfig(**kw)
    cfg_t = ModelConfig(layout_operands=True, **kw)
    params = init_hetero_gnn(jax.random.PRNGKey(9), cfg_c, meta, 20, 32, 16)
    arrays = cg.arrays()
    merged_ops = build_layout_operands(cfg_t, meta)
    assert merged_ops, "test graph must engage the gathered path"
    arrays_t = {**arrays, "merged_ops": merged_ops}
    n_real = cg.num_nodes["SNP"]

    out_c = np.asarray(apply_hetero_gnn(params, cfg_c, meta, arrays))
    out_t = np.asarray(apply_hetero_gnn(params, cfg_t, meta, arrays_t))
    np.testing.assert_allclose(out_t[:n_real], out_c[:n_real],
                               rtol=1e-6, atol=1e-6)

    def loss(p, cfg, arr):
        pred = apply_hetero_gnn(p, cfg, meta, arr)
        return jnp.mean(pred[:n_real] ** 2)

    gc = jax.grad(lambda p: loss(p, cfg_c, arrays))(params)
    gt = jax.grad(lambda p: loss(p, cfg_t, arrays_t))(params)
    for a, b in zip(jax.tree_util.tree_leaves(gc),
                    jax.tree_util.tree_leaves(gt)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)

    # (b) serialized-program shrink: grad program, literal vs operand form
    f_c = jax.jit(lambda p, arr: jax.grad(
        lambda q: loss(q, cfg_c, arr))(p))
    f_t = jax.jit(lambda p, arr: jax.grad(
        lambda q: loss(q, cfg_t, arr))(p))
    n_c = len(f_c.lower(params, arrays).as_text())
    n_t = len(f_t.lower(params, arrays_t).as_text())
    lo_bytes = sum(a.nbytes for a in
                   jax.tree_util.tree_leaves(merged_ops))
    assert n_t < n_c, (n_c, n_t)
    # the shrink should be at least the big index arrays' text footprint
    # (stablehlo prints ints as text, >=2 chars/element incl separator)
    assert n_c - n_t > lo_bytes / 4, (n_c, n_t, lo_bytes)


def test_layout_operands_fingerprint_mismatch_raises():
    """A bundle built under a DIFFERENT cfg (gather_chunk_rows) than the
    apply-time one must raise at trace time, not silently truncate/clamp
    (round-4 advisor, medium)."""
    import pytest

    from kgwas_tpu.config import ModelConfig
    from kgwas_tpu.models import init_hetero_gnn
    from kgwas_tpu.models.hetero_gnn import (apply_hetero_gnn,
                                             build_layout_operands)

    g = make_synthetic_kg(n_snp=600, n_gene=200, n_go=60, seed=53)
    cg = compile_graph(g, edge_pad_multiple=64, node_pad_multiple=_NODE_PAD)
    meta = cg.meta()
    kw = dict(gnn_hidden_dim=128, gnn_num_layers=2, use_pallas=True,
              pallas_mode="merged", layout_operands=True)
    cfg_apply = ModelConfig(gather_chunk_rows=256, **kw)
    cfg_other = ModelConfig(gather_chunk_rows=512, **kw)
    params = init_hetero_gnn(jax.random.PRNGKey(9), cfg_apply, meta,
                             20, 32, 16)
    stale = build_layout_operands(cfg_other, meta)
    assert stale, "bundle-producing cfg must engage the gathered path"
    arrays = {**cg.arrays(), "merged_ops": stale}
    with pytest.raises(ValueError, match="layout operand bundle"):
        apply_hetero_gnn(params, cfg_apply, meta, arrays)


def test_full_model_merged_multihead_matches_xla():
    """H>1: one fused kernel per head + concat must match the XLA path
    (forward and grads), including the deeper-layer H*h input widths."""
    from kgwas_tpu.config import ModelConfig
    from kgwas_tpu.models import init_hetero_gnn
    from kgwas_tpu.models.hetero_gnn import apply_hetero_gnn

    g = make_synthetic_kg(n_snp=90, n_gene=35, n_go=14, seed=43)
    cg = compile_graph(g, edge_pad_multiple=64, node_pad_multiple=_NODE_PAD)
    meta = cg.meta()
    cfg_x = ModelConfig(gnn_hidden_dim=128, gnn_num_layers=2, gat_num_head=2)
    cfg_m = ModelConfig(gnn_hidden_dim=128, gnn_num_layers=2, gat_num_head=2,
                        use_pallas=True, pallas_mode="merged")
    params = init_hetero_gnn(jax.random.PRNGKey(6), cfg_x, meta, 20, 32, 16)
    arrays = cg.arrays()
    n_real = cg.num_nodes["SNP"]

    out_x = np.asarray(apply_hetero_gnn(params, cfg_x, meta, arrays))
    out_m = np.asarray(apply_hetero_gnn(params, cfg_m, meta, arrays))
    np.testing.assert_allclose(out_m[:n_real], out_x[:n_real],
                               rtol=1e-4, atol=1e-4)

    def loss(p, cfg):
        pred = apply_hetero_gnn(p, cfg, meta, arrays)
        return jnp.mean(pred[:n_real] ** 2)

    gx = jax.grad(lambda p: loss(p, cfg_x))(params)
    gm = jax.grad(lambda p: loss(p, cfg_m))(params)
    for a, b in zip(jax.tree_util.tree_leaves(gx),
                    jax.tree_util.tree_leaves(gm)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=1e-4)


def test_merged_path_is_active_with_engine_defaults():
    """Guard against silent fallback: with use_pallas and the data layer's
    default compile, the merged path must actually engage."""
    from kgwas_tpu.config import ModelConfig
    from kgwas_tpu.models.hetero_gnn import _merged_path_active
    from kgwas_tpu import KGWAS_Data

    data = KGWAS_Data.from_synthetic(n_snp=80, n_gene=30, n_go=12, seed=1,
                                     data_path="/tmp/mpa_data")
    cg = data.compile()
    meta = cg.meta()
    cfg = ModelConfig(gnn_hidden_dim=128, use_pallas=True)
    assert _merged_path_active(cfg, meta, False, False, False)


def test_merged_bf16_close_to_f32():
    from kgwas_tpu.config import ModelConfig
    from kgwas_tpu.models import init_hetero_gnn
    from kgwas_tpu.models.hetero_gnn import apply_hetero_gnn

    g = make_synthetic_kg(n_snp=80, n_gene=30, n_go=12, seed=51)
    cg = compile_graph(g, edge_pad_multiple=64, node_pad_multiple=_NODE_PAD)
    meta = cg.meta()
    cfg32 = ModelConfig(gnn_hidden_dim=128, use_pallas=True)
    cfg16 = ModelConfig(gnn_hidden_dim=128, use_pallas=True,
                        compute_dtype="bfloat16",
                        matmul_precision="default")
    params = init_hetero_gnn(jax.random.PRNGKey(5), cfg32, meta, 20, 32, 16)
    arrays = cg.arrays()
    n_real = cg.num_nodes["SNP"]
    out32 = np.asarray(apply_hetero_gnn(params, cfg32, meta, arrays))[:n_real]
    out16 = np.asarray(apply_hetero_gnn(params, cfg16, meta, arrays))[:n_real]
    # bf16 has ~3 decimal digits; outputs must agree loosely and be finite
    assert np.all(np.isfinite(out16))
    np.testing.assert_allclose(out16, out32, rtol=0.1, atol=0.05)


def test_layout_operands_split_segsum_backward_matches(monkeypatch):
    """Above CONCAT_COTANGENT_MAX_BYTES the traced gathered backward must
    switch to the split-input windowed segment-sum (no [E, D] concat) and
    produce numerically identical gradients. Threshold forced to 1 byte so
    the split path engages at test scale."""
    from kgwas_tpu import ops
    from kgwas_tpu.config import ModelConfig
    from kgwas_tpu.models import init_hetero_gnn
    from kgwas_tpu.models.hetero_gnn import (apply_hetero_gnn,
                                             build_layout_operands)
    from kgwas_tpu.ops import pallas_gat_layer as pgl

    g = make_synthetic_kg(n_snp=600, n_gene=200, n_go=60, seed=53)
    cg = compile_graph(g, edge_pad_multiple=64, node_pad_multiple=_NODE_PAD)
    meta = cg.meta()
    kw = dict(gnn_hidden_dim=128, gnn_num_layers=2, use_pallas=True,
              pallas_mode="merged", gather_chunk_rows=256)
    cfg_c = ModelConfig(**kw)
    cfg_t = ModelConfig(layout_operands=True, **kw)
    params = init_hetero_gnn(jax.random.PRNGKey(9), cfg_c, meta, 20, 32, 16)
    arrays = cg.arrays()
    n_real = cg.num_nodes["SNP"]

    def loss(p, cfg, arr):
        pred = apply_hetero_gnn(p, cfg, meta, arr)
        return jnp.mean(pred[:n_real] ** 2)

    gc = jax.grad(lambda p: loss(p, cfg_c, arrays))(params)

    monkeypatch.setattr(pgl, "CONCAT_COTANGENT_MAX_BYTES", 1)
    merged_ops = build_layout_operands(cfg_t, meta)
    assert merged_ops, "test graph must engage the gathered path"
    ch = [v["chunked"] for v in merged_ops.values() if "chunked" in v]
    assert ch and all("sum_ids" in b for b in ch), (
        "split arrays must be included under the forced threshold")
    arrays_t = {**arrays, "merged_ops": merged_ops}
    gt = jax.grad(lambda p: loss(p, cfg_t, arrays_t))(params)
    for a, b in zip(jax.tree_util.tree_leaves(gc),
                    jax.tree_util.tree_leaves(gt)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)


def test_layout_operands_low_residual_matches(monkeypatch):
    """With LOW_RESIDUAL_MIN_BYTES forced to 1, the traced ops save source
    tables and recompute the gather in the backward — gradients must be
    identical to the literal path (the at-scale residual policy)."""
    from kgwas_tpu.config import ModelConfig
    from kgwas_tpu.models import init_hetero_gnn
    from kgwas_tpu.models.hetero_gnn import (apply_hetero_gnn,
                                             build_layout_operands)
    from kgwas_tpu.ops import pallas_gat_layer as pgl

    g = make_synthetic_kg(n_snp=600, n_gene=200, n_go=60, seed=53)
    cg = compile_graph(g, edge_pad_multiple=64, node_pad_multiple=_NODE_PAD)
    meta = cg.meta()
    kw = dict(gnn_hidden_dim=128, gnn_num_layers=2, use_pallas=True,
              pallas_mode="merged", gather_chunk_rows=256)
    cfg_c = ModelConfig(**kw)
    cfg_t = ModelConfig(layout_operands=True, **kw)
    params = init_hetero_gnn(jax.random.PRNGKey(9), cfg_c, meta, 20, 32, 16)
    arrays = cg.arrays()
    n_real = cg.num_nodes["SNP"]

    def loss(p, cfg, arr):
        pred = apply_hetero_gnn(p, cfg, meta, arr)
        return jnp.mean(pred[:n_real] ** 2)

    gc = jax.grad(lambda p: loss(p, cfg_c, arrays))(params)
    monkeypatch.setattr(pgl, "LOW_RESIDUAL_MIN_BYTES", 1)
    # out-recompute tier too: drop out/row-stat residuals, rerun the
    # forward kernel inside the backward — still exact
    monkeypatch.setattr(pgl, "OUT_RECOMPUTE_MIN_BYTES", 1)
    merged_ops = build_layout_operands(cfg_t, meta)
    arrays_t = {**arrays, "merged_ops": merged_ops}
    gt = jax.grad(lambda p: loss(p, cfg_t, arrays_t))(params)
    for a, b in zip(jax.tree_util.tree_leaves(gc),
                    jax.tree_util.tree_leaves(gt)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)


def test_split_merged_layout_full_model_parity(monkeypatch):
    """KGWAS_MERGED_MAX_EDGES splits oversized dst groups into dst-node-
    range sub-layouts (the full-KG memory lever). Forward and every grad
    leaf must match the unsplit path exactly — softmax is per dst row, so
    the partition is mathematically exact."""
    from kgwas_tpu.config import ModelConfig
    from kgwas_tpu.models import init_hetero_gnn
    from kgwas_tpu.models.hetero_gnn import apply_hetero_gnn

    g = make_synthetic_kg(n_snp=900, n_gene=300, n_go=120, seed=11)
    cg_a = compile_graph(g, edge_pad_multiple=64, node_pad_multiple=_NODE_PAD)
    meta_a = cg_a.meta()
    monkeypatch.setenv("KGWAS_MERGED_MAX_EDGES", "1500")
    cg_b = compile_graph(g, edge_pad_multiple=64, node_pad_multiple=_NODE_PAD)
    meta_b = cg_b.meta()
    assert len(meta_b["merged"]) > len(meta_a["merged"]), (
        "split must engage at this cap")
    assert any("@" in k for k in meta_b["merged"])

    # rel_fold pinned OFF here so the baseline arm really exercises the
    # unfolded split path (the package default is fold=True since round 5
    # — leaving the default would make the fold-arm comparison vacuous)
    cfg = ModelConfig(gnn_hidden_dim=128, gnn_num_layers=2, use_pallas=True,
                      pallas_mode="merged", rel_fold=False)
    params = init_hetero_gnn(jax.random.PRNGKey(3), cfg, meta_a, 20, 32, 16)
    arrays = cg_a.arrays()
    arrays_b = cg_b.arrays()
    n_real = cg_a.num_nodes["SNP"]

    out_a = np.asarray(apply_hetero_gnn(params, cfg, meta_a, arrays))
    out_b = np.asarray(apply_hetero_gnn(params, cfg, meta_b, arrays_b))
    np.testing.assert_allclose(out_b[:n_real], out_a[:n_real],
                               rtol=1e-6, atol=1e-6)

    def loss(p, meta, arr):
        pred = apply_hetero_gnn(p, cfg, meta, arr)
        return jnp.mean(pred[:n_real] ** 2)

    ga = jax.grad(lambda p: loss(p, meta_a, arrays))(params)
    gb = jax.grad(lambda p: loss(p, meta_b, arrays_b))(params)
    for a, b in zip(jax.tree_util.tree_leaves(ga),
                    jax.tree_util.tree_leaves(gb)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=2e-6)

    # rel_fold + split composition (the full-KG config)
    cfg_f = ModelConfig(gnn_hidden_dim=128, gnn_num_layers=2,
                        use_pallas=True, pallas_mode="merged", rel_fold=True)
    gf = jax.grad(lambda p: jnp.mean(apply_hetero_gnn(
        p, cfg_f, meta_b, arrays_b)[:n_real] ** 2))(params)
    for a, b in zip(jax.tree_util.tree_leaves(ga),
                    jax.tree_util.tree_leaves(gf)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=2e-6)


def test_split_merged_layout_mp_backbone_parity(monkeypatch):
    """Split sub-layouts must also work through the SAGE/GCN/SGC merged
    message-passing path (round-5 review finding: it indexed h by the
    sub-group name and returned partial row blocks)."""
    from kgwas_tpu.config import ModelConfig
    from kgwas_tpu.models import init_hetero_gnn
    from kgwas_tpu.models.hetero_gnn import apply_hetero_gnn

    g = make_synthetic_kg(n_snp=900, n_gene=300, n_go=120, seed=11)
    cg_a = compile_graph(g, edge_pad_multiple=64, node_pad_multiple=_NODE_PAD)
    meta_a = cg_a.meta()
    monkeypatch.setenv("KGWAS_MERGED_MAX_EDGES", "1500")
    cg_b = compile_graph(g, edge_pad_multiple=64, node_pad_multiple=_NODE_PAD)
    meta_b = cg_b.meta()
    assert any("@" in k for k in meta_b["merged"])

    for bb in ("SAGE", "GCN", "SGC"):
        cfg = ModelConfig(gnn_hidden_dim=128, gnn_num_layers=2,
                          gnn_backbone=bb, use_pallas=True,
                          pallas_mode="merged")
        params = init_hetero_gnn(jax.random.PRNGKey(5), cfg, meta_a,
                                 20, 32, 16)
        out_a = np.asarray(apply_hetero_gnn(params, cfg, meta_a,
                                            cg_a.arrays()))
        out_b = np.asarray(apply_hetero_gnn(params, cfg, meta_b,
                                            cg_b.arrays()))
        n_real = cg_a.num_nodes["SNP"]
        np.testing.assert_allclose(out_b[:n_real], out_a[:n_real],
                                   rtol=1e-5, atol=1e-5, err_msg=bb)
