"""Checkpoint tests: flatten/unflatten round-trip, and the reference
(PyTorch) state_dict importer — built against a real torch module tree shaped
exactly like reference kgwas/model.py."""
import numpy as np
import pytest

from kgwas_tpu.engine.checkpoint import (
    flatten_params,
    import_torch_state_dict,
    unflatten_params,
)


def test_flatten_roundtrip():
    params = {
        "a": {"w": np.ones((2, 3)), "b": np.zeros(3)},
        "convs": [
            {"rel__x__y": {"lin_src": {"w": np.full((4, 4), 2.0)}}},
            {"rel__x__y": {"lin_src": {"w": np.full((4, 4), 3.0)}}},
        ],
    }
    flat = flatten_params(params)
    rebuilt = unflatten_params(flat)
    assert isinstance(rebuilt["convs"], list) and len(rebuilt["convs"]) == 2
    np.testing.assert_array_equal(
        rebuilt["convs"][1]["rel__x__y"]["lin_src"]["w"],
        params["convs"][1]["rel__x__y"]["lin_src"]["w"],
    )
    np.testing.assert_array_equal(rebuilt["a"]["b"], params["a"]["b"])


def _torch_reference_state_dict(hidden=8, heads=1, snp_dim=5, module_prefix=""):
    """Build a torch state_dict with the reference's exact module naming
    (reference kgwas/model.py:24-51: snp/go/gene feat MLPs, HeteroConv
    ModuleDict convs.{L}.convs.{src__rel__dst}.*, head lin)."""
    import torch

    sd = {}

    def mlp(prefix, din):
        sd[f"{prefix}.FC_hidden.weight"] = torch.randn(hidden, din)
        sd[f"{prefix}.FC_hidden.bias"] = torch.randn(hidden)
        sd[f"{prefix}.FC_hidden2.weight"] = torch.randn(hidden, hidden)
        sd[f"{prefix}.FC_hidden2.bias"] = torch.randn(hidden)
        sd[f"{prefix}.FC_output.weight"] = torch.randn(hidden, hidden)
        sd[f"{prefix}.FC_output.bias"] = torch.randn(hidden)

    mlp("snp_feat_mlp", snp_dim)
    mlp("go_feat_mlp", snp_dim)
    mlp("gene_feat_mlp", snp_dim)
    for layer in range(2):
        for rel in ("SNP__TSS__Gene", "Gene__rev_TSS__SNP"):
            p = f"convs.{layer}.convs.{rel}"
            sd[f"{p}.lin_src.weight"] = torch.randn(heads * hidden, hidden)
            sd[f"{p}.lin_dst.weight"] = torch.randn(heads * hidden, hidden)
            sd[f"{p}.att_src"] = torch.randn(1, heads, hidden)
            sd[f"{p}.att_dst"] = torch.randn(1, heads, hidden)
            sd[f"{p}.bias"] = torch.randn(heads * hidden)
    sd["lin.weight"] = torch.randn(1, hidden)
    sd["lin.bias"] = torch.randn(1)
    if module_prefix:
        sd = {module_prefix + k: v for k, v in sd.items()}
    return sd


@pytest.mark.parametrize("module_prefix", ["", "module."])
def test_import_torch_state_dict(module_prefix):
    torch = pytest.importorskip("torch")
    sd = _torch_reference_state_dict(module_prefix=module_prefix)
    params = import_torch_state_dict(sd, num_layers=2)

    raw = {k[len(module_prefix):]: v for k, v in sd.items()}
    # weights transposed [out,in] -> [in,out]
    np.testing.assert_array_equal(
        params["snp_feat_mlp"]["fc1"]["w"],
        raw["snp_feat_mlp.FC_hidden.weight"].numpy().T,
    )
    np.testing.assert_array_equal(
        params["snp_feat_mlp"]["fc1"]["b"],
        raw["snp_feat_mlp.FC_hidden.bias"].numpy(),
    )
    # conv params per layer/relation; att [1,H,C] -> [H,C]
    p0 = params["convs"][0]["SNP__TSS__Gene"]
    np.testing.assert_array_equal(
        p0["lin_src"]["w"], raw["convs.0.convs.SNP__TSS__Gene.lin_src.weight"].numpy().T
    )
    np.testing.assert_array_equal(
        p0["att_src"], raw["convs.0.convs.SNP__TSS__Gene.att_src"].numpy()[0]
    )
    # head
    np.testing.assert_array_equal(params["lin"]["w"], raw["lin.weight"].numpy().T)


def test_imported_params_run_forward():
    """Imported torch params must drive our HeteroGNN forward directly."""
    torch = pytest.importorskip("torch")
    import jax

    from kgwas_tpu.config import ModelConfig
    from kgwas_tpu.graph import HeteroGraph, compile_graph
    from kgwas_tpu.models.hetero_gnn import apply_hetero_gnn

    hidden, snp_dim = 8, 5
    rng = np.random.default_rng(0)
    g = HeteroGraph()
    g.node_features["SNP"] = rng.random((20, snp_dim)).astype(np.float32)
    g.node_features["Gene"] = rng.random((10, snp_dim)).astype(np.float32)
    for t in ("CellularComponent", "BiologicalProcess", "MolecularFunction"):
        g.node_features[t] = rng.random((4, snp_dim)).astype(np.float32)
    g.edge_index[("SNP", "TSS", "Gene")] = np.stack(
        [rng.integers(0, 20, 30), rng.integers(0, 10, 30)]
    )
    g.edge_index[("Gene", "rev_TSS", "SNP")] = g.edge_index[
        ("SNP", "TSS", "Gene")
    ][::-1]
    cg = compile_graph(g, edge_pad_multiple=32)

    torch.manual_seed(0)
    sd = _torch_reference_state_dict(hidden=hidden, snp_dim=snp_dim)
    params = import_torch_state_dict(sd, num_layers=2)
    params = jax.tree_util.tree_map(
        lambda x: np.asarray(x, dtype=np.float32), params
    )
    cfg = ModelConfig(gnn_hidden_dim=hidden, gnn_num_layers=2)
    pred = apply_hetero_gnn(params, cfg, cg.meta(), cg.arrays())
    assert pred.shape[0] == cg.padded_nodes["SNP"]
    assert np.all(np.isfinite(np.asarray(pred)[: cg.num_nodes["SNP"]]))
