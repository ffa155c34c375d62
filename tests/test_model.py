"""Model-level tests: per-relation convs vs dense numpy oracles, and the full
HeteroGNN forward (SURVEY.md section 4 test pyramid level 1/2)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from kgwas_tpu.config import ModelConfig
from kgwas_tpu.ops.pallas_segment import BN as _TILE_BN

# node row spaces follow the shipped kernel tile (BN=512 default; 256/128 via env)
_NODE_PAD = max(256, _TILE_BN)

from kgwas_tpu.graph import compile_graph, make_synthetic_kg
from kgwas_tpu.models import (
    apply_gat,
    apply_hetero_gnn,
    apply_collect_attention,
    init_gat,
    init_hetero_gnn,
)


def dense_gat_oracle(params, x_src, x_dst, src, dst, n_dst, H, C,
                     negative_slope=0.2, temperature=1.0, sigmoid_gat=False,
                     raw=False, edge_attr=None):
    """Literal per-edge numpy re-statement of reference kgwas/conv.py:122-228."""
    xs = (x_src @ np.asarray(params["lin_src"]["w"])).reshape(-1, H, C)
    xd = (x_dst @ np.asarray(params["lin_dst"]["w"])).reshape(-1, H, C)
    a_src = (xs * np.asarray(params["att_src"])).sum(-1)  # [Ns,H]
    a_dst = (xd * np.asarray(params["att_dst"])).sum(-1)  # [Nd,H]
    e = len(src)
    alpha = a_src[src] + a_dst[dst]
    if edge_attr is not None:
        # reference conv.py:207-215: edge term added BEFORE leaky_relu
        ea = edge_attr.reshape(e, -1) @ np.asarray(params["lin_edge"]["w"])
        alpha = alpha + (ea.reshape(e, H, C) * np.asarray(params["att_edge"])).sum(-1)
    alpha = np.where(alpha >= 0, alpha, negative_slope * alpha)
    if sigmoid_gat:
        alpha = 1.0 / (1.0 + np.exp(-alpha / temperature))
    elif not raw:
        out_alpha = np.zeros_like(alpha)
        for d in np.unique(dst):
            m = dst == d
            a = alpha[m] / temperature
            a = np.exp(a - a.max(axis=0, keepdims=True))
            out_alpha[m] = a / (a.sum(axis=0, keepdims=True) + 1e-16)
        alpha = out_alpha
    out = np.zeros((n_dst, H, C), dtype=np.float64)
    for i in range(e):
        out[dst[i]] += alpha[i][:, None] * xs[src[i]]
    return out.reshape(n_dst, H * C) + np.asarray(params["bias"]), alpha


def _sorted_edges(rng, n_src, n_dst, e, e_pad):
    src = rng.integers(0, n_src, size=e)
    dst = np.sort(rng.integers(0, n_dst, size=e))
    src_p = np.zeros(e_pad, dtype=np.int32)
    dst_p = np.full(e_pad, n_dst, dtype=np.int32)
    src_p[:e] = src
    dst_p[:e] = dst
    return src_p, dst_p


@pytest.mark.parametrize("heads,sigmoid_gat,raw", [
    (1, False, False), (2, False, False), (1, True, False), (1, False, True),
])
def test_gat_matches_dense_oracle(heads, sigmoid_gat, raw):
    rng = np.random.default_rng(5)
    n_src, n_dst, e, e_pad, din, C = 13, 9, 40, 64, 6, 5
    src, dst = _sorted_edges(rng, n_src, n_dst, e, e_pad)
    x_src = rng.standard_normal((n_src + 1, din)).astype(np.float32)
    x_dst = rng.standard_normal((n_dst + 1, din)).astype(np.float32)
    params = init_gat(jax.random.PRNGKey(0), din, din, C, heads)

    out, alpha = apply_gat(
        params, jnp.asarray(x_src), jnp.asarray(x_dst),
        jnp.asarray(src), jnp.asarray(dst),
        num_real_edges=e, num_dst_segments=n_dst + 1,
        heads=heads, out_channels=C,
        sigmoid_gat=sigmoid_gat, raw_attention=raw, return_alpha=True,
    )
    expected, exp_alpha = dense_gat_oracle(
        params, x_src[:n_src], x_dst[:n_dst], src[:e], dst[:e], n_dst,
        heads, C, sigmoid_gat=sigmoid_gat, raw=raw,
    )
    np.testing.assert_allclose(np.asarray(out)[:n_dst], expected, rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(alpha)[:e], exp_alpha, rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize("edge_dim,heads", [(1, 1), (3, 2)])
def test_gat_edge_attr_matches_dense_oracle(edge_dim, heads):
    """Edge-feature attention (reference conv.py:95-101, 207-215)."""
    rng = np.random.default_rng(9)
    n_src, n_dst, e, e_pad, din, C = 13, 9, 40, 64, 6, 5
    src, dst = _sorted_edges(rng, n_src, n_dst, e, e_pad)
    x_src = rng.standard_normal((n_src + 1, din)).astype(np.float32)
    x_dst = rng.standard_normal((n_dst + 1, din)).astype(np.float32)
    ea = rng.standard_normal((e_pad, edge_dim)).astype(np.float32)
    if edge_dim == 1:
        ea = ea[:, 0]  # dim-1 attrs arrive as [E] (reference conv.py:208-209)
    params = init_gat(jax.random.PRNGKey(0), din, din, C, heads,
                      edge_dim=edge_dim)
    assert "lin_edge" in params and "att_edge" in params

    out, alpha = apply_gat(
        params, jnp.asarray(x_src), jnp.asarray(x_dst),
        jnp.asarray(src), jnp.asarray(dst),
        num_real_edges=e, num_dst_segments=n_dst + 1,
        heads=heads, out_channels=C, return_alpha=True,
        edge_attr=jnp.asarray(ea),
    )
    expected, exp_alpha = dense_gat_oracle(
        params, x_src[:n_src], x_dst[:n_dst], src[:e], dst[:e], n_dst,
        heads, C, edge_attr=np.asarray(ea)[:e],
    )
    np.testing.assert_allclose(np.asarray(out)[:n_dst], expected, rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(alpha)[:e], exp_alpha, rtol=2e-4, atol=2e-5)


def test_gat_pheno_condition_params_created_but_inert():
    """pheno_condition hooks create parameters only — the reference's
    edge_update/message never read pheno_emb (conv.py:70-77 vs 200-228)."""
    p_att = init_gat(jax.random.PRNGKey(1), 6, 6, 5, 1, pheno_condition="ATT")
    assert "lin_edge_" in p_att and "att_edge" in p_att
    p_msg = init_gat(jax.random.PRNGKey(1), 6, 6, 5, 1, pheno_condition="MSG",
                     edge_dim=4)
    assert "pheno_mlp" in p_msg
    with pytest.raises(ValueError):
        init_gat(jax.random.PRNGKey(1), 6, 6, 5, 1, pheno_condition="MSG")

    # inert in the math: identical outputs with/without the hook params
    rng = np.random.default_rng(2)
    n_src, n_dst, e, e_pad, din, C = 7, 5, 12, 16, 6, 5
    src, dst = _sorted_edges(rng, n_src, n_dst, e, e_pad)
    x_src = rng.standard_normal((n_src + 1, din)).astype(np.float32)
    x_dst = rng.standard_normal((n_dst + 1, din)).astype(np.float32)
    base = init_gat(jax.random.PRNGKey(3), din, din, C, 1)
    withp = dict(base)
    withp["lin_edge_"] = p_att["lin_edge_"]
    withp["att_edge"] = p_att["att_edge"]
    kw = dict(num_real_edges=e, num_dst_segments=n_dst + 1, heads=1,
              out_channels=C)
    o1, _ = apply_gat(base, jnp.asarray(x_src), jnp.asarray(x_dst),
                      jnp.asarray(src), jnp.asarray(dst), **kw)
    o2, _ = apply_gat(withp, jnp.asarray(x_src), jnp.asarray(x_dst),
                      jnp.asarray(src), jnp.asarray(dst), **kw)
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))


def test_hetero_gnn_with_edge_dim_config():
    cg = _compiled()
    cfg = ModelConfig(gnn_hidden_dim=16, edge_dim=2)
    meta = cg.meta()
    params = init_hetero_gnn(jax.random.PRNGKey(6), cfg, meta, 20, 32, 16)
    rk0 = next(iter(params["convs"][0]))
    assert "lin_edge" in params["convs"][0][rk0]
    arrays = cg.arrays()
    rng = np.random.default_rng(4)
    for rk, ed in arrays["edges"].items():
        ed["edge_attr"] = jnp.asarray(
            rng.standard_normal((ed["src"].shape[0], 2)).astype(np.float32))
    pred = apply_hetero_gnn(params, cfg, meta, arrays)
    assert np.all(np.isfinite(np.asarray(pred)[: cg.num_nodes["SNP"]]))


def _compiled(seed=7):
    g = make_synthetic_kg(n_snp=60, n_gene=25, n_go=12, seed=seed)
    return compile_graph(g, edge_pad_multiple=64)


@pytest.mark.parametrize("backbone", ["GAT", "SAGE", "GCN", "SGC"])
def test_hetero_gnn_forward_shapes_finite(backbone):
    cg = _compiled()
    cfg = ModelConfig(gnn_backbone=backbone, gnn_hidden_dim=16)
    meta = cg.meta()
    params = init_hetero_gnn(jax.random.PRNGKey(1), cfg, meta, 20, 32, 16)
    pred = apply_hetero_gnn(params, cfg, meta, cg.arrays())
    assert pred.shape == (cg.padded_nodes["SNP"], 1)
    real = np.asarray(pred)[: cg.num_nodes["SNP"]]
    assert np.all(np.isfinite(real))
    assert np.all(real >= 0)  # final ReLU head


def test_hetero_gnn_no_relu_and_grads():
    cg = _compiled()
    cfg = ModelConfig(gnn_hidden_dim=16, no_relu=True)
    meta = cg.meta()
    params = init_hetero_gnn(jax.random.PRNGKey(2), cfg, meta, 20, 32, 16)
    arrays = cg.arrays()

    def loss(p):
        pred = apply_hetero_gnn(p, cfg, meta, arrays)
        return jnp.mean(pred[: cg.num_nodes["SNP"]] ** 2)

    val, grads = jax.value_and_grad(loss)(params)
    assert np.isfinite(float(val))
    flat = jax.tree_util.tree_leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(g))) for g in flat)
    # gradients reach params on paths that influence SNP outputs:
    # last layer Gene->SNP, and first layer SNP->Gene feeding it
    g_last = grads["convs"][-1]["Gene__rev_TSS__SNP"]
    assert float(jnp.abs(g_last["lin_src"]["w"]).sum()) > 0
    g_first = grads["convs"][0]["SNP__TSS__Gene"]
    assert float(jnp.abs(g_first["lin_src"]["w"]).sum()) > 0
    assert float(jnp.abs(grads["snp_feat_mlp"]["fc1"]["w"]).sum()) > 0


def test_hetero_aggr_modes():
    cg = _compiled()
    meta = cg.meta()
    preds = {}
    for aggr in ["sum", "mean", "max", "min"]:
        cfg = ModelConfig(gnn_hidden_dim=8, gnn_aggr=aggr)
        params = init_hetero_gnn(jax.random.PRNGKey(3), cfg, meta, 20, 32, 16)
        preds[aggr] = np.asarray(apply_hetero_gnn(params, cfg, meta, cg.arrays()))
        assert np.all(np.isfinite(preds[aggr][: cg.num_nodes["SNP"]]))
    assert not np.allclose(preds["sum"], preds["mean"])


def test_collect_attention_layers_and_shapes():
    cg = _compiled()
    cfg = ModelConfig(gnn_hidden_dim=8, gnn_num_layers=2)
    meta = cg.meta()
    params = init_hetero_gnn(jax.random.PRNGKey(4), cfg, meta, 20, 32, 16)
    layers = apply_collect_attention(params, cfg, meta, cg.arrays(), raw=True)
    assert len(layers) == 2
    for alphas in layers:
        assert set(alphas.keys()) == set(cg.relations.keys())
        for rk, a in alphas.items():
            assert a.shape == (cg.relations[rk].src.shape[0], cfg.gat_num_head)


def test_full_graph_equals_subgraph_seed_prediction():
    """The load-bearing equivalence: full-graph forward == forward restricted
    to the seeds' L-hop in-neighborhood (what NeighborLoader with
    num_neighbors=[-1]*L computes — reference kgwas/kgwas.py:99-113)."""
    g = make_synthetic_kg(n_snp=40, n_gene=18, n_go=9, seed=11)
    cg = compile_graph(g, edge_pad_multiple=32)
    cfg = ModelConfig(gnn_hidden_dim=8, gnn_num_layers=2)
    meta = cg.meta()
    params = init_hetero_gnn(jax.random.PRNGKey(5), cfg, meta, 20, 32, 16)
    full_pred = np.asarray(apply_hetero_gnn(params, cfg, meta, cg.arrays()))

    # build the exact 2-hop induced subgraph of a few seed SNPs, keeping
    # original node indices (so we can reuse features/params unchanged)
    seeds = np.array([3, 17, 29])
    keep = {t: set() for t in g.node_types}
    keep["SNP"] |= set(seeds.tolist())
    frontier = {t: set(keep[t]) for t in keep}
    for _ in range(cfg.gnn_num_layers):
        new_frontier = {t: set() for t in g.node_types}
        for (src_t, rel, dst_t), ei in g.edge_index.items():
            mask = np.isin(ei[1], list(frontier[dst_t]))
            new_frontier[src_t] |= set(ei[0][mask].tolist())
        for t in keep:
            keep[t] |= new_frontier[t]
        frontier = new_frontier

    from kgwas_tpu.graph import HeteroGraph

    sub = HeteroGraph()
    sub.node_features = dict(g.node_features)  # same index space
    for et, ei in g.edge_index.items():
        dst_t = et[2]
        mask = np.isin(ei[1], list(keep[dst_t]))
        sub.edge_index[et] = ei[:, mask]
    sub_cg = compile_graph(sub, edge_pad_multiple=32)
    sub_pred = np.asarray(
        apply_hetero_gnn(params, cfg, sub_cg.meta(), sub_cg.arrays())
    )
    np.testing.assert_allclose(
        full_pred[seeds], sub_pred[seeds], rtol=1e-4, atol=1e-5
    )


def test_hetero_gnn_multihead_dims_and_grads():
    """gat_num_head>1: layer outputs concat to H*h, deeper layers and the
    scalar head are sized to match. (The reference dimension-errors here —
    its final Linear is declared with hidden_channels inputs, reference
    model.py:50 — so multi-head is a capability the reference lacks.)"""
    cg = _compiled()
    meta = cg.meta()
    H, h = 2, 16
    cfg = ModelConfig(gnn_hidden_dim=h, gnn_num_layers=2, gat_num_head=H)
    params = init_hetero_gnn(jax.random.PRNGKey(4), cfg, meta, 20, 32, 16)
    assert params["convs"][0]["SNP__TSS__Gene"]["lin_src"]["w"].shape == (h, H * h)
    assert params["convs"][1]["SNP__TSS__Gene"]["lin_src"]["w"].shape == (H * h, H * h)
    assert params["lin"]["w"].shape == (H * h, 1)

    pred, hidden = apply_hetero_gnn(params, cfg, meta, cg.arrays(),
                                    return_hidden=True)
    assert pred.shape == (cg.padded_nodes["SNP"], 1)
    assert hidden.shape == (cg.padded_nodes["SNP"], H * h)
    assert np.all(np.isfinite(np.asarray(pred)[: cg.num_nodes["SNP"]]))

    def loss(p):
        out = apply_hetero_gnn(p, cfg, meta, cg.arrays())
        return jnp.mean(out[: cg.num_nodes["SNP"]] ** 2)

    grads = jax.grad(loss)(params)
    flat = jax.tree_util.tree_leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(g))) for g in flat)


def test_stream_dtype_engages_and_stays_close():
    """stream_dtype='bfloat16' must actually change the message-stream
    numerics (engagement check — it once silently no-opped on the XLA
    path) while staying within bf16 rounding of the f32 run."""
    import jax

    from kgwas_tpu.config import ModelConfig
    from kgwas_tpu.graph import compile_graph, make_synthetic_kg
    from kgwas_tpu.models import init_hetero_gnn
    from kgwas_tpu.models.hetero_gnn import apply_hetero_gnn

    g = make_synthetic_kg(n_snp=80, n_gene=30, n_go=12, seed=18)
    cg = compile_graph(g, edge_pad_multiple=64, node_pad_multiple=_NODE_PAD)
    meta = cg.meta()
    outs = {}
    for use_pallas in (False, True):
        for sd in (None, "bfloat16"):
            cfg = ModelConfig(gnn_hidden_dim=128, gnn_num_layers=2,
                              use_pallas=use_pallas, stream_dtype=sd)
            params = init_hetero_gnn(jax.random.PRNGKey(9), cfg, meta,
                                     20, 32, 16)
            outs[(use_pallas, sd)] = np.asarray(
                apply_hetero_gnn(params, cfg, meta, cg.arrays())
            )[: cg.num_nodes["SNP"]]
    for up in (False, True):
        f32, b16 = outs[(up, None)], outs[(up, "bfloat16")]
        assert not np.array_equal(f32, b16), (
            f"stream_dtype had no effect (use_pallas={up})")
        np.testing.assert_allclose(b16, f32, rtol=5e-2, atol=5e-2)


def test_stream_f32_logits_probe_engages():
    """ModelConfig.stream_f32_logits (the gate probe,
    scripts/exp_stream_gate.py) must change the bf16-stream numerics on the
    XLA path (f32 logits vs bf16-derived ones) and be a no-op when
    stream_dtype is unset."""
    import jax

    from kgwas_tpu.config import ModelConfig
    from kgwas_tpu.graph import compile_graph, make_synthetic_kg
    from kgwas_tpu.models import init_hetero_gnn
    from kgwas_tpu.models.hetero_gnn import apply_hetero_gnn

    g = make_synthetic_kg(n_snp=80, n_gene=30, n_go=12, seed=18)
    cg = compile_graph(g, edge_pad_multiple=64, node_pad_multiple=_NODE_PAD)
    meta = cg.meta()

    def run(sd, probe):
        cfg = ModelConfig(gnn_hidden_dim=128, gnn_num_layers=2,
                          use_pallas=False, stream_dtype=sd,
                          stream_f32_logits=probe)
        params = init_hetero_gnn(jax.random.PRNGKey(9), cfg, meta, 20, 32, 16)
        out = apply_hetero_gnn(params, cfg, meta, cg.arrays())
        return np.asarray(out)[: cg.num_nodes["SNP"]]

    assert not np.array_equal(run("bfloat16", False), run("bfloat16", True))
    np.testing.assert_array_equal(run(None, False), run(None, True))
