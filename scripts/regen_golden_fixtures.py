"""Golden-fixture regeneration protocol (VERDICT round 3, item 7).

Re-runs the reference's VERBATIM `KGWAS.train()` (/root/reference/kgwas/
kgwas.py:85-212) and freezes its outputs into a fixture the test suite
consumes (tests/test_golden_ref_pipeline.py). The point: the live e2e
oracle (tests/test_e2e_reference_pipeline.py) runs both sides on the
builder-authored pyg_shim because real torch_geometric is not installable
in this image — a residual circularity. THIS script closes it the day the
dependency exists:

    # on any machine with real torch_geometric installed:
    python scripts/regen_golden_fixtures.py
    # -> tests/golden/ref_pipeline_v1.npz with provenance pyg="real"

    # smoke mode (this image): falls back to the shim, provenance pyg="shim"
    python scripts/regen_golden_fixtures.py --allow-shim

The fixture freezes, for the exact deterministic synthetic configs the live
oracle uses (seeds 7 / 3):
  * the reference model's INITIAL state_dict (lazy Linears materialized),
  * final kgwas_res per-SNP columns (ID, pred, P_weighted, KGWAS_P),
  * the reference best-model validation pearson (via its own
    evaluate_minibatch_clean loop, reference utils.py:20-39),
  * first-epoch per-STEP losses through the reference NeighborLoader +
    torch.optim.Adam hot loop (reference kgwas.py:129-151) — this is the
    piece that pins REAL PyG's batch membership/order when regenerated
    against the real dependency.

Requires the reference sources (KGWAS_REFERENCE_DIR, default
/root/reference/kgwas) — they are imported, never copied.
"""
from __future__ import annotations

import argparse
import importlib
import json
import os
import sys
import types

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
SHIM = os.path.join(REPO, "tests", "pyg_shim")
REF = os.environ.get("KGWAS_REFERENCE_DIR", "/root/reference/kgwas")
OUT_DEFAULT = os.path.join(REPO, "tests", "golden", "ref_pipeline_v1.npz")

# --- config pinned to tests/test_e2e_reference_pipeline.py ---------------
E2E = dict(seed=7, bs=64, epochs=3, lr=3e-3)
SCHED = dict(seed=3, bs=64, lr=1e-3)
DATA = dict(n_snp=1600, n_gene=160, n_go=60)
MODEL = dict(gnn_num_layers=2, gnn_hidden_dim=16, no_relu=True)


def resolve_pyg(allow_shim: bool) -> str:
    """Prefer REAL torch_geometric; fall back to the shim only if asked."""
    try:
        import torch_geometric  # noqa: F401

        src = getattr(torch_geometric, "__file__", "") or ""
        if not src.startswith(SHIM):
            return "real"
    except ImportError:
        pass
    if not allow_shim:
        sys.exit(
            "real torch_geometric not importable — install it, or pass "
            "--allow-shim to smoke-test against tests/pyg_shim (the fixture "
            "will be marked provenance pyg='shim')"
        )
    sys.path.insert(0, SHIM)
    for m in list(sys.modules):
        if m.split(".")[0] in ("torch_geometric", "torch_sparse"):
            del sys.modules[m]
    return "shim"


def load_reference():
    if not os.path.isfile(os.path.join(REF, "kgwas.py")):
        sys.exit(f"reference sources not found at {REF} "
                 "(set KGWAS_REFERENCE_DIR)")
    pkg = types.ModuleType("refkgwas")
    pkg.__path__ = [REF]
    sys.modules["refkgwas"] = pkg
    return types.SimpleNamespace(
        kgwas=importlib.import_module("refkgwas.kgwas"),
        utils=importlib.import_module("refkgwas.utils"),
    )


def make_tpu_data(tmp: str, seed: int):
    from kgwas_tpu import KGWAS_Data

    data = KGWAS_Data.from_synthetic(
        **DATA, seed=seed, data_path=os.path.join(tmp, f"tpu{seed}"))
    data.load_synthetic_gwas(seed=seed)
    data.process_gwas_file()
    data.prepare_split()
    return data


def make_ref_data(data, tmp: str):
    """Reference-side stand-in: the same synthetic KG as a HeteroData plus
    the same host stats (mirrors reference kgwas_data.py:522-545 side
    effects; same construction as tests/test_e2e_reference_pipeline.py)."""
    import torch
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


def materialized_init_sd(refpkg, ref_run, ref_ns, n_snp):
    """Materialize the lazy Linears so the initial weights are exportable
    (same trick as tests/test_reference_parity.py)."""
    import torch

    with torch.no_grad():
        ref_run.model(dict(ref_ns.data.x_dict), ref_ns.data.edge_index_dict,
                      n_snp)
    return {k: np.array(v.detach().cpu().numpy(), copy=True)
            for k, v in ref_run.model.state_dict().items()}


def run_e2e_arm(refpkg, tmp: str) -> dict:
    data = make_tpu_data(tmp, E2E["seed"])
    ref_ns = make_ref_data(data, tmp)
    ref_run = refpkg.kgwas.KGWAS(ref_ns, device="cpu", seed=E2E["seed"])
    ref_run.initialize_model(**MODEL)
    n_snp = data.graph.num_nodes("SNP")
    init_sd = materialized_init_sd(refpkg, ref_run, ref_ns, n_snp)
    ref_run.train(batch_size=E2E["bs"], epoch=E2E["epochs"], lr=E2E["lr"])
    res = ref_run.kgwas_res

    val_res = refpkg.utils.evaluate_minibatch_clean(
        ref_run.val_loader, ref_run.best_model, "cpu")
    best_val = refpkg.utils.compute_metrics(
        val_res, False, -1, -1, None)["pearsonr"]

    out = {
        "e2e_ids": np.asarray(res["ID"].values, dtype="U"),
        "e2e_pred": res["pred"].values.astype(np.float64),
        "e2e_P_weighted": res["P_weighted"].values.astype(np.float64),
        "e2e_KGWAS_P": res["KGWAS_P"].values.astype(np.float64),
        "e2e_best_val_pearson": np.float64(best_val),
    }
    for k, v in init_sd.items():
        out[f"e2e_sd__{k}"] = v
    return out


def run_sched_arm(refpkg, tmp: str) -> dict:
    import torch
    from torch_geometric.loader import NeighborLoader

    data = make_tpu_data(tmp, SCHED["seed"])
    ref_ns = make_ref_data(data, tmp)
    ref_run = refpkg.kgwas.KGWAS(ref_ns, device="cpu", seed=SCHED["seed"])
    ref_run.initialize_model(**MODEL)
    n_snp = data.graph.num_nodes("SNP")
    init_sd = materialized_init_sd(refpkg, ref_run, ref_ns, n_snp)

    loader = NeighborLoader(
        ref_ns.data, num_neighbors=[-1] * MODEL["gnn_num_layers"],
        input_nodes=ref_ns.train_input_nodes, batch_size=SCHED["bs"],
        num_workers=0, drop_last=True)
    opt = torch.optim.Adam(ref_run.model.parameters(), lr=SCHED["lr"],
                           weight_decay=5e-4)
    losses = []
    ref_run.model.train()
    for batch in loader:
        opt.zero_grad()
        bsb = batch["SNP"].batch_size
        pred = ref_run.model(batch.x_dict, batch.edge_index_dict,
                             bsb).reshape(-1)
        y_batch = batch["SNP"].y[:bsb]
        rs_id = [ref_ns.idx2id["SNP"][i.item()]
                 for i in batch["SNP"]["n_id"][:bsb]]
        ld_weight = torch.tensor(
            [ref_ns.rs_id_to_ldsc_weight[i] for i in rs_id])
        loss = torch.mean(ld_weight * (pred - y_batch) ** 2)
        loss.backward()
        opt.step()
        losses.append(float(loss))

    out = {"sched_losses": np.asarray(losses, dtype=np.float64)}
    for k, v in init_sd.items():
        out[f"sched_sd__{k}"] = v
    return out


def main():
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--out", default=OUT_DEFAULT)
    ap.add_argument("--allow-shim", action="store_true",
                    help="fall back to tests/pyg_shim if real "
                         "torch_geometric is absent (smoke mode)")
    ap.add_argument("--tmp", default=None,
                    help="scratch dir for synthetic data (default: mkdtemp)")
    args = ap.parse_args()

    pyg = resolve_pyg(args.allow_shim)
    import torch
    import torch_geometric

    refpkg = load_reference()
    tmp = args.tmp or __import__("tempfile").mkdtemp(prefix="kgwas_golden_")

    print(f"[regen] pyg={pyg} "
          f"({getattr(torch_geometric, '__version__', 'shim')}), "
          f"torch={torch.__version__}, reference={REF}")
    arrays = {}
    print("[regen] e2e arm: reference KGWAS.train() "
          f"(seed={E2E['seed']}, {E2E['epochs']} epochs)...")
    arrays.update(run_e2e_arm(refpkg, tmp))
    print("[regen] schedule arm: first-epoch per-step losses "
          f"(seed={SCHED['seed']})...")
    arrays.update(run_sched_arm(refpkg, tmp))

    meta = dict(
        version=1, pyg=pyg,
        pyg_version=getattr(torch_geometric, "__version__", "shim"),
        torch_version=torch.__version__,
        e2e=E2E, sched=SCHED, data=DATA, model=MODEL,
    )
    arrays["meta_json"] = np.array(json.dumps(meta))
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    np.savez_compressed(args.out, **arrays)
    print(f"[regen] wrote {args.out} "
          f"({os.path.getsize(args.out) / 1024:.0f} KiB, provenance "
          f"pyg={pyg!r})")
    if pyg == "shim":
        print("[regen] NOTE: shim provenance — regenerate on a machine with "
              "real torch_geometric to close the shim-circularity residual.")


if __name__ == "__main__":
    main()
