"""Pallas fused segment-softmax-SpMM vs the XLA reference path (interpret
mode on CPU; compiled path exercised on real TPU by bench/TPU test scripts)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from kgwas_tpu.ops.pallas_segment import BN, fused_segment_softmax_spmm
from kgwas_tpu.ops.pallas_segment import BN as _TILE_BN

# node row spaces follow the shipped kernel tile (BN=512 default; 256/128 via env)
_NODE_PAD = max(256, _TILE_BN)

from kgwas_tpu.ops.segment import edge_valid_mask, segment_softmax, segment_sum


def _case(seed, n_rows, e, d):
    rng = np.random.default_rng(seed)
    dst = np.sort(rng.integers(0, n_rows - 1, size=e)).astype(np.int32)
    msgs = rng.standard_normal((e, d)).astype(np.float32)
    logits = rng.standard_normal(e).astype(np.float32) * 2
    counts = np.bincount(dst, minlength=n_rows)
    row_offsets = np.zeros(n_rows + 1, dtype=np.int32)
    np.cumsum(counts, out=row_offsets[1:])
    return msgs, logits, dst, row_offsets


def _xla_reference(msgs, logits, dst, n_rows):
    e = msgs.shape[0]
    valid = edge_valid_mask(e, e)
    alpha = segment_softmax(jnp.asarray(logits), jnp.asarray(dst), n_rows, valid)
    return segment_sum(jnp.asarray(msgs) * alpha[:, None], jnp.asarray(dst), n_rows)


@pytest.mark.parametrize("seed,e,d", [(0, 700, 128), (1, 2048, 128), (2, 64, 256)])
def test_fused_forward_matches_xla(seed, e, d):
    n_rows = BN * 2
    msgs, logits, dst, row_offsets = _case(seed, n_rows, e, d)
    out = fused_segment_softmax_spmm(
        jnp.asarray(msgs), jnp.asarray(logits), jnp.asarray(dst),
        row_offsets, n_rows, True,
    )
    ref = _xla_reference(msgs, logits, dst, n_rows)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


def test_fused_forward_empty_rows_zero():
    n_rows = BN
    rng = np.random.default_rng(3)
    e, d = 100, 128
    # all edges into rows [0, 10): rows >= 10 empty
    dst = np.sort(rng.integers(0, 10, size=e)).astype(np.int32)
    msgs = rng.standard_normal((e, d)).astype(np.float32)
    logits = rng.standard_normal(e).astype(np.float32)
    counts = np.bincount(dst, minlength=n_rows)
    row_offsets = np.zeros(n_rows + 1, dtype=np.int32)
    np.cumsum(counts, out=row_offsets[1:])
    out = np.asarray(
        fused_segment_softmax_spmm(
            jnp.asarray(msgs), jnp.asarray(logits), jnp.asarray(dst),
            row_offsets, n_rows, True,
        )
    )
    np.testing.assert_array_equal(out[10:], 0.0)
    assert np.all(np.isfinite(out))


def test_fused_backward_matches_xla_grads():
    n_rows = BN
    msgs, logits, dst, row_offsets = _case(5, n_rows, 600, 128)
    g_out = np.random.default_rng(6).standard_normal((n_rows, 128)).astype(
        np.float32
    )

    def loss_pallas(m, l):
        out = fused_segment_softmax_spmm(m, l, jnp.asarray(dst), row_offsets,
                                         n_rows, True)
        return jnp.sum(out * g_out)

    def loss_xla(m, l):
        e = m.shape[0]
        valid = edge_valid_mask(e, e)
        alpha = segment_softmax(l, jnp.asarray(dst), n_rows, valid)
        out = segment_sum(m * alpha[:, None], jnp.asarray(dst), n_rows)
        return jnp.sum(out * g_out)

    gm_p, gl_p = jax.grad(loss_pallas, argnums=(0, 1))(
        jnp.asarray(msgs), jnp.asarray(logits)
    )
    gm_x, gl_x = jax.grad(loss_xla, argnums=(0, 1))(
        jnp.asarray(msgs), jnp.asarray(logits)
    )
    np.testing.assert_allclose(np.asarray(gm_p), np.asarray(gm_x),
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gl_p), np.asarray(gl_x),
                               rtol=1e-3, atol=1e-4)


def test_model_pallas_path_matches_xla_path():
    """Full HeteroGNN with use_pallas=True (interpret on CPU) must match the
    XLA path end to end, including gradients through the custom VJP."""
    from kgwas_tpu.config import ModelConfig
    from kgwas_tpu.graph import compile_graph, make_synthetic_kg
    from kgwas_tpu.models import init_hetero_gnn
    from kgwas_tpu.models.hetero_gnn import apply_hetero_gnn

    g = make_synthetic_kg(n_snp=80, n_gene=30, n_go=12, seed=13)
    cg = compile_graph(g, edge_pad_multiple=64, node_pad_multiple=_NODE_PAD)
    meta = cg.meta()
    cfg_x = ModelConfig(gnn_hidden_dim=128, gnn_num_layers=2)
    cfg_p = ModelConfig(gnn_hidden_dim=128, gnn_num_layers=2, use_pallas=True)
    params = init_hetero_gnn(jax.random.PRNGKey(9), cfg_x, meta, 20, 32, 16)
    arrays = cg.arrays()

    n_real = cg.num_nodes["SNP"]
    out_x = apply_hetero_gnn(params, cfg_x, meta, arrays)
    out_p = apply_hetero_gnn(params, cfg_p, meta, arrays)
    # the trash row differs by design: Pallas routes pad-edge mass there,
    # the XLA path zeroes it — only real rows carry semantics
    np.testing.assert_allclose(
        np.asarray(out_x)[:n_real], np.asarray(out_p)[:n_real],
        rtol=1e-4, atol=1e-5,
    )

    def loss(p, cfg):
        pred = apply_hetero_gnn(p, cfg, meta, arrays)
        return jnp.mean(pred[: cg.num_nodes["SNP"]] ** 2)

    gx = jax.grad(lambda p: loss(p, cfg_x))(params)
    gp = jax.grad(lambda p: loss(p, cfg_p))(params)
    for a, b in zip(jax.tree_util.tree_leaves(gx), jax.tree_util.tree_leaves(gp)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-3, atol=1e-5
        )


def test_pallas_segment_sum_matches_dense():
    from kgwas_tpu.ops.pallas_segment import pallas_segment_sum

    rng = np.random.default_rng(11)
    n_rows, e, d = BN, 700, 128
    ids = np.sort(rng.integers(0, n_rows - 1, size=e)).astype(np.int32)
    vals = rng.standard_normal((e, d)).astype(np.float32)
    counts = np.bincount(ids, minlength=n_rows)
    offsets = np.zeros(n_rows + 1, dtype=np.int32)
    np.cumsum(counts, out=offsets[1:])
    out = np.asarray(
        pallas_segment_sum(jnp.asarray(vals), jnp.asarray(ids),
                           jnp.asarray(offsets), n_rows, True)
    )
    dense = np.zeros((n_rows, d), dtype=np.float64)
    for i in range(e):
        dense[ids[i]] += vals[i]
    np.testing.assert_allclose(out, dense, rtol=1e-4, atol=1e-4)


def test_gather_rows_csc_grad_matches_xla():
    from kgwas_tpu.ops.pallas_segment import gather_rows_csc

    rng = np.random.default_rng(12)
    n_src, e, d = BN, 900, 128
    idx = rng.integers(0, n_src - 1, size=e).astype(np.int32)
    x = rng.standard_normal((n_src, d)).astype(np.float32)
    # CSC artifacts (as the shard compiler builds them)
    perm = np.argsort(idx, kind="stable").astype(np.int32)
    ids_sorted = idx[perm]
    counts = np.bincount(ids_sorted, minlength=n_src)
    offsets = np.zeros(n_src + 1, dtype=np.int32)
    np.cumsum(counts, out=offsets[1:])
    g_out = rng.standard_normal((e, d)).astype(np.float32)

    def loss_p(xx):
        return jnp.sum(gather_rows_csc(xx, jnp.asarray(idx), perm, ids_sorted,
                                       offsets, n_src, True) * g_out)

    def loss_x(xx):
        return jnp.sum(jnp.take(xx, jnp.asarray(idx), axis=0) * g_out)

    gp = jax.grad(loss_p)(jnp.asarray(x))
    gx = jax.grad(loss_x)(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(gp), np.asarray(gx),
                               rtol=1e-4, atol=1e-4)


def test_model_sigmoid_gat_pallas_matches_xla():
    """sigmoid_gat rides the segment_sum_edges kernel (no softmax needed);
    must match the XLA path end to end including grads."""
    from kgwas_tpu.config import ModelConfig
    from kgwas_tpu.graph import compile_graph, make_synthetic_kg
    from kgwas_tpu.models import init_hetero_gnn
    from kgwas_tpu.models.hetero_gnn import apply_hetero_gnn

    g = make_synthetic_kg(n_snp=80, n_gene=30, n_go=12, seed=15)
    cg = compile_graph(g, edge_pad_multiple=64, node_pad_multiple=_NODE_PAD)
    meta = cg.meta()
    cfg_x = ModelConfig(gnn_hidden_dim=128, gnn_num_layers=2,
                        sigmoid_gat=True, temperature=2.0)
    cfg_p = ModelConfig(gnn_hidden_dim=128, gnn_num_layers=2,
                        sigmoid_gat=True, temperature=2.0, use_pallas=True)
    params = init_hetero_gnn(jax.random.PRNGKey(11), cfg_x, meta, 20, 32, 16)
    arrays = cg.arrays()

    n_real = cg.num_nodes["SNP"]
    out_x = apply_hetero_gnn(params, cfg_x, meta, arrays)
    out_p = apply_hetero_gnn(params, cfg_p, meta, arrays)
    np.testing.assert_allclose(
        np.asarray(out_x)[:n_real], np.asarray(out_p)[:n_real],
        rtol=1e-4, atol=1e-5,
    )

    def loss(p, cfg):
        pred = apply_hetero_gnn(p, cfg, meta, arrays)
        return jnp.mean(pred[:n_real] ** 2)

    gx = jax.grad(lambda p: loss(p, cfg_x))(params)
    gp = jax.grad(lambda p: loss(p, cfg_p))(params)
    for a, b in zip(jax.tree_util.tree_leaves(gx),
                    jax.tree_util.tree_leaves(gp)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-3, atol=1e-5
        )


def test_raw_attention_conv_pallas_matches_xla():
    """raw (pre-softmax) attention mode through the per-relation conv: the
    segment_sum_edges branch must match the XLA path."""
    from kgwas_tpu.graph import compile_graph, make_synthetic_kg
    from kgwas_tpu.models.convs import apply_gat, init_gat

    g = make_synthetic_kg(n_snp=80, n_gene=30, n_go=12, seed=17)
    cg = compile_graph(g, edge_pad_multiple=64, node_pad_multiple=_NODE_PAD)
    rk = "SNP__TSS__Gene"
    r = cg.relations[rk]
    params = init_gat(jax.random.PRNGKey(3), 128, 128, 128, 1)
    rng = np.random.default_rng(5)
    xs = jnp.asarray(rng.standard_normal(
        (cg.padded_nodes["SNP"], 128)).astype(np.float32))
    xd = jnp.asarray(rng.standard_normal(
        (cg.padded_nodes["Gene"], 128)).astype(np.float32))
    common = dict(
        num_real_edges=r.num_edges,
        num_dst_segments=cg.padded_nodes["Gene"],
        heads=1, out_channels=128, raw_attention=True,
        row_offsets=r.row_offsets,
        csc=(r.csc_perm, r.csc_src_sorted, r.csc_offsets),
        num_src_segments=cg.padded_nodes["SNP"],
    )
    out_x, _ = apply_gat(params, xs, xd, jnp.asarray(r.src),
                         jnp.asarray(r.dst), use_pallas=False, **common)
    out_p, _ = apply_gat(params, xs, xd, jnp.asarray(r.src),
                         jnp.asarray(r.dst), use_pallas=True, **common)
    n_real = cg.num_nodes["Gene"]
    np.testing.assert_allclose(
        np.asarray(out_x)[:n_real], np.asarray(out_p)[:n_real],
        rtol=1e-4, atol=1e-4,
    )


def test_model_pallas_mean_aggr_matches_xla_path():
    """Merged path with gnn_aggr='mean' (cross-relation mean over the
    merged rows + averaged biases) must match the per-relation XLA path's
    _aggregate semantics."""
    from kgwas_tpu.config import ModelConfig
    from kgwas_tpu.graph import compile_graph, make_synthetic_kg
    from kgwas_tpu.models import init_hetero_gnn
    from kgwas_tpu.models.hetero_gnn import apply_hetero_gnn

    g = make_synthetic_kg(n_snp=80, n_gene=30, n_go=12, seed=14)
    cg = compile_graph(g, edge_pad_multiple=64, node_pad_multiple=_NODE_PAD)
    meta = cg.meta()
    cfg_x = ModelConfig(gnn_hidden_dim=128, gnn_num_layers=2,
                        gnn_aggr="mean")
    cfg_p = ModelConfig(gnn_hidden_dim=128, gnn_num_layers=2,
                        gnn_aggr="mean", use_pallas=True)
    params = init_hetero_gnn(jax.random.PRNGKey(9), cfg_x, meta, 20, 32, 16)
    arrays = cg.arrays()

    n_real = cg.num_nodes["SNP"]
    out_x = apply_hetero_gnn(params, cfg_x, meta, arrays)
    out_p = apply_hetero_gnn(params, cfg_p, meta, arrays)
    np.testing.assert_allclose(
        np.asarray(out_x)[:n_real], np.asarray(out_p)[:n_real],
        rtol=1e-4, atol=1e-5,
    )

    def loss(p, cfg):
        pred = apply_hetero_gnn(p, cfg, meta, arrays)
        return jnp.mean(pred[:n_real] ** 2)

    gx = jax.grad(lambda p: loss(p, cfg_x))(params)
    gp = jax.grad(lambda p: loss(p, cfg_p))(params)
    for a, b in zip(jax.tree_util.tree_leaves(gx),
                    jax.tree_util.tree_leaves(gp)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)


def test_model_pallas_sigmoid_gat_matches_xla_path():
    """sigmoid_gat (unnormalized gating, reference conv.py:219-221) through
    the merged fused_gat_layer_unnorm kernels must match the per-relation
    XLA path, forward + grads."""
    from kgwas_tpu.config import ModelConfig
    from kgwas_tpu.graph import compile_graph, make_synthetic_kg
    from kgwas_tpu.models import init_hetero_gnn
    from kgwas_tpu.models.hetero_gnn import apply_hetero_gnn

    g = make_synthetic_kg(n_snp=80, n_gene=30, n_go=12, seed=15)
    cg = compile_graph(g, edge_pad_multiple=64, node_pad_multiple=_NODE_PAD)
    meta = cg.meta()
    kw = dict(gnn_hidden_dim=128, gnn_num_layers=2, sigmoid_gat=True,
              temperature=0.7)
    cfg_x = ModelConfig(**kw)
    cfg_p = ModelConfig(use_pallas=True, **kw)
    params = init_hetero_gnn(jax.random.PRNGKey(9), cfg_x, meta, 20, 32, 16)
    arrays = cg.arrays()

    n_real = cg.num_nodes["SNP"]
    out_x = apply_hetero_gnn(params, cfg_x, meta, arrays)
    out_p = apply_hetero_gnn(params, cfg_p, meta, arrays)
    np.testing.assert_allclose(
        np.asarray(out_x)[:n_real], np.asarray(out_p)[:n_real],
        rtol=1e-4, atol=1e-5,
    )

    def loss(p, cfg):
        pred = apply_hetero_gnn(p, cfg, meta, arrays)
        return jnp.mean(pred[:n_real] ** 2)

    gx = jax.grad(lambda p: loss(p, cfg_x))(params)
    gp = jax.grad(lambda p: loss(p, cfg_p))(params)
    for a, b in zip(jax.tree_util.tree_leaves(gx),
                    jax.tree_util.tree_leaves(gp)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)


def test_fused_gat_layer_unnorm_raw_mode_dense_oracle():
    """mode='raw' (pre-softmax leaky logits as weights, reference
    conv.py:222-223): fused_gat_layer_unnorm vs a dense jnp computation,
    forward + all input grads."""
    from kgwas_tpu.graph import compile_graph, make_synthetic_kg
    from kgwas_tpu.ops.pallas_gat_layer import fused_gat_layer_unnorm

    g = make_synthetic_kg(n_snp=80, n_gene=30, n_go=12, seed=16)
    cg = compile_graph(g, edge_pad_multiple=64, node_pad_multiple=_NODE_PAD)
    rng = np.random.default_rng(4)
    for dst_t, L in cg.merged_layouts().items():
        E = len(L.src)
        msgs = jnp.asarray(rng.standard_normal((E, 128)), jnp.float32)
        R = len(L.rel_keys)
        att = jnp.asarray(rng.standard_normal((R, 128)) * 0.2, jnp.float32)
        adst = jnp.asarray(rng.standard_normal(L.n_rows_total) * 0.2,
                           jnp.float32)
        w_out = jnp.asarray(rng.standard_normal((L.n_rows_total, 128)),
                            jnp.float32)
        t2r = np.asarray(L.tile2rel)
        rel_of_row = np.repeat(t2r, _TILE_BN)[: L.n_rows_total]

        def f_ref(msgs, att, adst):
            z = (jnp.sum(msgs * att[rel_of_row[np.asarray(L.dst)]], axis=1)
                 + adst[np.asarray(L.dst)])
            l = jnp.where(z >= 0, z, 0.2 * z)           # leaky, NO /T (raw)
            out = jax.ops.segment_sum(l[:, None] * msgs,
                                      jnp.asarray(L.dst),
                                      num_segments=L.n_rows_total)
            return jnp.sum(out * w_out)

        def f_new(msgs, att, adst):
            out = fused_gat_layer_unnorm(
                msgs, att, adst, L.dst, L.row_offsets, L.tile2rel,
                L.n_rows_total, 0.2, 1.3, "raw", True,
            )
            return jnp.sum(out * w_out)

        v_r, g_r = jax.value_and_grad(f_ref, argnums=(0, 1, 2))(
            msgs, att, adst)
        v_n, g_n = jax.value_and_grad(f_new, argnums=(0, 1, 2))(
            msgs, att, adst)
        np.testing.assert_allclose(float(v_n), float(v_r), rtol=1e-4)
        for a, b in zip(g_n, g_r):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("backbone", ["SAGE", "GCN", "SGC"])
def test_model_pallas_mp_backbones_match_xla_path(backbone):
    """Merged message-passing path (one gather + one Pallas segment-sum
    per dst type, static degree norms) == the per-relation XLA path for
    SAGE/GCN/SGC, forward + grads."""
    from kgwas_tpu.config import ModelConfig
    from kgwas_tpu.graph import compile_graph, make_synthetic_kg
    from kgwas_tpu.models import init_hetero_gnn
    from kgwas_tpu.models.hetero_gnn import apply_hetero_gnn

    g = make_synthetic_kg(n_snp=80, n_gene=30, n_go=12, seed=17)
    cg = compile_graph(g, edge_pad_multiple=64, node_pad_multiple=_NODE_PAD)
    meta = cg.meta()
    kw = dict(gnn_hidden_dim=128, gnn_num_layers=2, gnn_backbone=backbone)
    cfg_x = ModelConfig(**kw)
    cfg_p = ModelConfig(use_pallas=True, **kw)
    params = init_hetero_gnn(jax.random.PRNGKey(9), cfg_x, meta, 20, 32, 16)
    arrays = cg.arrays()

    n_real = cg.num_nodes["SNP"]
    out_x = apply_hetero_gnn(params, cfg_x, meta, arrays)
    out_p = apply_hetero_gnn(params, cfg_p, meta, arrays)
    np.testing.assert_allclose(
        np.asarray(out_x)[:n_real], np.asarray(out_p)[:n_real],
        rtol=1e-4, atol=1e-5,
    )

    def loss(p, cfg):
        pred = apply_hetero_gnn(p, cfg, meta, arrays)
        return jnp.mean(pred[:n_real] ** 2)

    gx = jax.grad(lambda p: loss(p, cfg_x))(params)
    gp = jax.grad(lambda p: loss(p, cfg_p))(params)
    for a, b in zip(jax.tree_util.tree_leaves(gx),
                    jax.tree_util.tree_leaves(gp)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)
