"""End-to-end reference-PIPELINE parity oracle (VERDICT round 2, item 2).

Executes the reference's ENTIRE `KGWAS.train()` — /root/reference/kgwas/
kgwas.py:85-212, the one piece of reference code never previously run
against this framework — VERBATIM on the pyg_shim (now including
NeighborLoader + HeteroData, faithful for the reference's full fan-out
`num_neighbors=[-1]*L`), then runs this framework's `KGWAS.train()` from
the SAME initial weights, data, and config, and compares end-to-end:

  * the per-epoch batch schedule / LD-weight application / loss values
    (reference kgwas.py:129-151),
  * the early-stop bookkeeping incl. the drop_last val-metric quirk
    (kgwas.py:92,104,161-173 + utils.py:20-39),
  * the minibatch eval loops (utils.py:20-39),
  * the chained SR + calibration + pred.csv tail (kgwas.py:182-212),

via the final `kgwas_res` (per-SNP `pred` and `KGWAS_P`) and the per-epoch
validation pearson trajectory. A divergence in batch membership, weight
lookup, early-stop epoch, eval coverage, or the SR/calibration chaining
fails this file.
"""
import importlib
import os
import sys
import types

import numpy as np
import pandas as pd
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from kgwas_tpu import KGWAS, KGWAS_Data  # noqa: E402
from kgwas_tpu.engine.checkpoint import import_torch_state_dict  # noqa: E402

SHIM = os.path.join(os.path.dirname(__file__), "pyg_shim")
REF = os.environ.get("KGWAS_REFERENCE_DIR", "/root/reference/kgwas")


@pytest.fixture(scope="module")
def refpkg():
    """Load the reference package (conv/model/utils/eval_utils/kgwas) on
    top of the shim."""
    if not os.path.isfile(os.path.join(REF, "kgwas.py")):
        pytest.skip(f"reference sources not available at {REF}")
    sys.path.insert(0, SHIM)
    for m in list(sys.modules):
        if m.split(".")[0] in ("torch_geometric", "torch_sparse",
                               "refkgwas"):
            del sys.modules[m]
    pkg = types.ModuleType("refkgwas")
    pkg.__path__ = [REF]
    sys.modules["refkgwas"] = pkg
    kgwas_mod = importlib.import_module("refkgwas.kgwas")
    yield types.SimpleNamespace(kgwas=kgwas_mod)
    sys.path.remove(SHIM)


def _make_tpu_data(tmp, seed):
    data = KGWAS_Data.from_synthetic(
        n_snp=1600, n_gene=160, n_go=60, seed=seed,
        data_path=os.path.join(tmp, "tpu"))
    data.load_synthetic_gwas(seed=seed)
    data.process_gwas_file()
    data.prepare_split()
    return data


def _make_ref_data(data, tmp):
    """Reference-side KGWAS_Data stand-in: the same synthetic KG as a shim
    HeteroData plus the SAME host-side stats objects (lr_uni, LDSC weights,
    splits — bit-parity of those computations is proven separately in
    tests/test_stats.py). Mirrors the reference prepare_split side effects
    (kgwas_data.py:522-545)."""
    from torch_geometric.data import HeteroData

    g = data.graph
    hd = HeteroData()
    for t in g.node_types:
        hd[t].x = torch.tensor(np.asarray(g.node_features[t]))
    for et in g.edge_types:
        hd[et].edge_index = torch.tensor(
            np.asarray(g.edge_index[et]), dtype=torch.long)
    hd["SNP"].y = torch.tensor(
        np.asarray(g.node_labels["SNP"], dtype=np.float32))
    for t in g.node_types:
        hd[t].n_id = torch.arange(hd[t].x.shape[0])
    hd.train_mask = data.train_mask
    hd.val_mask = data.val_mask
    hd.test_mask = data.test_mask

    ref_path = os.path.join(tmp, "ref")
    os.makedirs(ref_path, exist_ok=True)
    return types.SimpleNamespace(
        data=hd,
        data_path=ref_path,
        train_input_nodes=data.train_input_nodes,
        val_input_nodes=data.val_input_nodes,
        test_input_nodes=data.test_input_nodes,
        lr_uni=data.lr_uni.copy(),
        id2idx=data.id2idx,
        idx2id=data.idx2id,
        rs_id_to_ldsc_weight=data.rs_id_to_ldsc_weight,
        snp_init_dim_size=data.snp_init_dim_size,
        gene_init_dim_size=data.gene_init_dim_size,
        go_init_dim_size=data.go_init_dim_size,
    )


def test_reference_train_end_to_end_parity(refpkg, tmp_path):
    seed, bs, epochs, lr = 7, 64, 3, 3e-3
    data = _make_tpu_data(str(tmp_path), seed)
    ref_ns = _make_ref_data(data, str(tmp_path))

    # --- reference: the verbatim pipeline -------------------------------
    ref_run = refpkg.kgwas.KGWAS(ref_ns, device="cpu", seed=seed)
    ref_run.initialize_model(gnn_num_layers=2, gnn_hidden_dim=16,
                             no_relu=True)
    # materialize the lazy Linears BEFORE training so the initial weights
    # can be exported (same trick as test_reference_parity.py:263)
    n_snp = data.graph.num_nodes("SNP")
    with torch.no_grad():
        ref_run.model(dict(ref_ns.data.x_dict), ref_ns.data.edge_index_dict,
                      n_snp)
    init_sd = {k: v.clone() for k, v in ref_run.model.state_dict().items()}
    ref_run.train(batch_size=bs, epoch=epochs, lr=lr)
    ref_res = ref_run.kgwas_res

    # --- this framework, from the SAME initial weights ------------------
    run = KGWAS(data, exp_name="e2e_parity", seed=seed)
    run.initialize_model(gnn_num_layers=2, gnn_hidden_dim=16, no_relu=True,
                         use_pallas=False)
    params = import_torch_state_dict(init_sd, num_layers=2)
    run.params = jax.tree_util.tree_map(jnp.asarray, params)
    run.best_params = run.params
    res = run.train(batch_size=bs, epoch=epochs, lr=lr)

    # --- end-to-end comparison ------------------------------------------
    merged = ref_res[["ID", "pred", "P_weighted", "KGWAS_P"]].merge(
        res[["ID", "pred", "P_weighted", "KGWAS_P"]], on="ID",
        suffixes=("_ref", "_tpu"))
    assert len(merged) == len(ref_res) == len(res)
    # tolerance calibrated to honest float drift over 3 epochs x 22
    # sequential Adam steps (different summation orders; per-step parity at
    # 5 steps is rtol 5e-4 in test_reference_parity.py) — a SEAM divergence
    # (wrong batch membership / LD weight / early-stop epoch) moves preds by
    # orders of magnitude more and also breaks the correlation gate below
    pr = merged.pred_ref.values.astype(np.float64)
    pt = merged.pred_tpu.values.astype(np.float64)
    np.testing.assert_allclose(
        pt, pr, rtol=2e-2, atol=1e-3,
        err_msg="per-SNP predictions diverged (train-loop seam)")
    assert np.corrcoef(pt, pr)[0, 1] > 0.99999
    # KGWAS_P runs preds through RANK-based 500-bin SR + a global
    # calibration factor: at 1600 synthetic SNPs (3.2/bin, preds clustered
    # within ~0.2) the float drift above flips bin membership for ~20% of
    # SNPs and shifts the scale factor — intrinsic sensitivity, not a seam
    # bug (the tail CHAIN is compared exactly below on identical preds).
    # Assert (a) the non-flipped majority is EXACTLY equal pre-calibration
    # and (b) the final ranking is preserved.
    pw_ref = merged.P_weighted_ref.values.astype(np.float64)
    pw_tpu = merged.P_weighted_tpu.values.astype(np.float64)
    pw_equal = np.isclose(pw_tpu, pw_ref, rtol=1e-9, atol=0)
    assert pw_equal.mean() > 0.7, (
        f"P_weighted exactly equal on only {pw_equal.mean():.0%} of SNPs — "
        "SR binning code diverged, not just rank noise")
    from scipy.stats import spearmanr

    p_ref = merged.KGWAS_P_ref.values.astype(np.float64)
    p_tpu = merged.KGWAS_P_tpu.values.astype(np.float64)
    assert spearmanr(p_ref, p_tpu).statistic > 0.97

    # exact tail-chain oracle: the reference's OWN best-model preds pushed
    # through THIS framework's finalize_predictions must reproduce the
    # reference pred.csv bit-for-bit (isolates kgwas.py:186-212 chaining
    # from float drift in training)
    from kgwas_tpu.stats.calibration import finalize_predictions

    lr_clean = data.lr_uni.copy()
    for col in ("pred", "abs_pred", "SR_P_val", "SR"):
        lr_clean.drop(columns=[col], errors="ignore", inplace=True)
    tail_res, _ = finalize_predictions(
        lr_clean, ref_res["pred"].values.copy())
    chained = tail_res[["ID", "P_weighted", "KGWAS_P"]].merge(
        ref_res[["ID", "P_weighted", "KGWAS_P"]], on="ID",
        suffixes=("_mine", "_ref"))
    np.testing.assert_array_equal(
        chained.P_weighted_mine.values.astype(np.float64),
        chained.P_weighted_ref.values.astype(np.float64),
        err_msg="SR chaining diverged on identical preds")
    np.testing.assert_array_equal(
        chained.KGWAS_P_mine.values.astype(np.float64),
        chained.KGWAS_P_ref.values.astype(np.float64),
        err_msg="calibration chaining diverged on identical preds")

    # early-stop coverage: the `pred` comparison above ran through the
    # reference's BEST model (kgwas.py:170-173,189) vs our best_params —
    # a diverging early-stop epoch would have failed it. Also pin the
    # best-model VAL metric against the reference's deepcopy'd best model
    # evaluated through its own minibatch loop (utils.py:20-39).
    from refkgwas.utils import compute_metrics, evaluate_minibatch_clean

    val_res = evaluate_minibatch_clean(
        ref_run.val_loader, ref_run.best_model, "cpu")
    ref_best_val = compute_metrics(val_res, False, -1, -1, None)["pearsonr"]
    my_pred_all = run.predict_all(run.best_params)
    val_ids = np.asarray(data.val_mask)
    n_val_eval = (len(val_ids) // bs) * bs
    ids = val_ids[:n_val_eval] if n_val_eval else val_ids
    y = np.asarray(data.graph.node_labels["SNP"])
    my_best_val = float(np.corrcoef(my_pred_all[ids], y[ids])[0, 1])
    # atol 5e-3 distinguishes a wrong early-stop EPOCH (per-epoch val
    # pearson gaps are ~0.03 here) while tolerating the epoch-3 drift
    np.testing.assert_allclose(my_best_val, ref_best_val, atol=5e-3)
    assert len(run.train_history) == epochs


def test_reference_train_loss_schedule_parity(refpkg, tmp_path):
    """First-epoch per-STEP loss values match: pins batch membership,
    batch order, LD-weight lookup, and the torch-Adam-exact optimizer
    against the reference hot loop (kgwas.py:129-151) through the
    verbatim NeighborLoader batches."""
    seed, bs = 3, 64
    data = _make_tpu_data(str(tmp_path), seed)
    ref_ns = _make_ref_data(data, str(tmp_path))

    ref_run = refpkg.kgwas.KGWAS(ref_ns, device="cpu", seed=seed)
    ref_run.initialize_model(gnn_num_layers=2, gnn_hidden_dim=16,
                             no_relu=True)
    n_snp = data.graph.num_nodes("SNP")
    with torch.no_grad():
        ref_run.model(dict(ref_ns.data.x_dict), ref_ns.data.edge_index_dict,
                      n_snp)
    init_sd = {k: v.clone() for k, v in ref_run.model.state_dict().items()}

    # reference hot loop, one epoch, recording per-step losses
    from torch_geometric.loader import NeighborLoader

    loader = NeighborLoader(
        ref_ns.data, num_neighbors=[-1] * 2,
        input_nodes=ref_ns.train_input_nodes, batch_size=bs,
        num_workers=0, drop_last=True)
    opt = torch.optim.Adam(ref_run.model.parameters(), lr=1e-3,
                           weight_decay=5e-4)
    ref_losses = []
    ref_run.model.train()
    for batch in loader:
        opt.zero_grad()
        bsb = batch["SNP"].batch_size
        out = ref_run.model(batch.x_dict, batch.edge_index_dict, bsb)
        pred = out.reshape(-1)
        y_batch = batch["SNP"].y[:bsb]
        rs_id = [ref_ns.idx2id["SNP"][i.item()]
                 for i in batch["SNP"]["n_id"][:bsb]]
        ld_weight = torch.tensor(
            [ref_ns.rs_id_to_ldsc_weight[i] for i in rs_id])
        loss = torch.mean(ld_weight * (pred - y_batch) ** 2)
        loss.backward()
        opt.step()
        ref_losses.append(float(loss))

    run = KGWAS(data, exp_name="e2e_sched", seed=seed)
    run.initialize_model(gnn_num_layers=2, gnn_hidden_dim=16, no_relu=True,
                         use_pallas=False)
    run.params = jax.tree_util.tree_map(
        jnp.asarray, import_torch_state_dict(init_sd, num_layers=2))
    run.best_params = run.params
    run.train(batch_size=bs, epoch=1, lr=1e-3, scan_steps=0,
              metrics_log=None)
    my_losses = run.epoch_losses[0]

    assert len(my_losses) == len(ref_losses) > 0
    np.testing.assert_allclose(my_losses, ref_losses, rtol=5e-4, atol=1e-6)
