"""MEASURED reference-vs-kgwas_tpu baseline on shared hardware (CPU).

BASELINE.md's A100 denominator is an estimate (no A100 exists here and the
reference publishes no numbers). This script produces the first MEASURED
ratio: the reference pipeline — its own model/conv source executed
verbatim on tests/pyg_shim, driven by the faithful full-fan-out
NeighborLoader — against this framework's engine, on the SAME host CPU,
SAME synthetic KG, SAME config (hidden 128, 2 layers, batch 512).

Reference timing is split into sampler time and pure model compute
(forward+backward+optimizer), because the shim's loader is Python where
real PyG's is C++ — the COMPUTE-ONLY number is the fair (conservative)
reference baseline; the total is also reported.

Run: JAX_PLATFORMS=cpu python scripts/exp_cpu_baseline.py [n_snp]
"""
import json
import os
import sys
import time
import types
import importlib

os.environ.setdefault("JAX_PLATFORMS", "cpu")
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import torch

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SHIM = os.path.join(REPO, "tests", "pyg_shim")
REF = os.environ.get("KGWAS_REFERENCE_DIR", "/root/reference/kgwas")


def load_ref():
    sys.path.insert(0, SHIM)
    for m in list(sys.modules):
        if m.split(".")[0] in ("torch_geometric", "torch_sparse",
                               "refkgwas"):
            del sys.modules[m]
    pkg = types.ModuleType("refkgwas")
    pkg.__path__ = [REF]
    sys.modules["refkgwas"] = pkg
    return importlib.import_module("refkgwas.model")


def main():
    n_snp = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    bs, hidden, layers, lr, wd = 512, 128, 2, 1e-4, 5e-4
    seed = 11

    from kgwas_tpu import KGWAS, KGWAS_Data

    data = KGWAS_Data.from_synthetic(
        n_snp=n_snp, n_gene=n_snp // 10, n_go=max(n_snp // 25, 50),
        seed=seed, data_path="/tmp/cpu_baseline")
    data.load_synthetic_gwas(seed=seed)
    data.process_gwas_file()
    data.prepare_split()
    g = data.graph
    edges = sum(int(g.edge_index[et].shape[1]) for et in g.edge_types)

    # ---- reference side (verbatim model/conv on the shim) ----------------
    ref_model_mod = load_ref()
    from torch_geometric.data import HeteroData
    from torch_geometric.loader import NeighborLoader

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

    torch.manual_seed(seed)
    pyg_data = types.SimpleNamespace(edge_types=list(g.edge_types))
    model = ref_model_mod.HeteroGNN(
        pyg_data, hidden, 1, layers, "GAT", "sum",
        data.snp_init_dim_size, data.gene_init_dim_size,
        data.go_init_dim_size, 1)
    with torch.no_grad():  # materialize lazy Linears
        model(dict(hd.x_dict), hd.edge_index_dict, n_snp)
    opt = torch.optim.Adam(model.parameters(), lr=lr, weight_decay=wd)
    loader = NeighborLoader(hd, num_neighbors=[-1] * layers,
                            input_nodes=data.train_input_nodes,
                            batch_size=bs, drop_last=True)
    w_map = data.rs_id_to_ldsc_weight
    idx2id = data.idx2id["SNP"]

    model.train()
    sample_s = compute_s = 0.0
    steps = 0
    t_iter = time.perf_counter()
    for batch in loader:
        t0 = time.perf_counter()
        sample_s += t0 - t_iter
        opt.zero_grad()
        bsb = batch["SNP"].batch_size
        out = model(batch.x_dict, batch.edge_index_dict, bsb)
        pred = out.reshape(-1)
        y_b = batch["SNP"].y[:bsb]
        rs = [idx2id[i.item()] for i in batch["SNP"]["n_id"][:bsb]]
        ldw = torch.tensor([w_map[i] for i in rs])
        loss = torch.mean(ldw * (pred - y_b) ** 2)
        loss.backward()
        opt.step()
        compute_s += time.perf_counter() - t0
        steps += 1
        t_iter = time.perf_counter()
    ref_total = sample_s + compute_s
    print(f"reference (shim, CPU): {steps} steps/epoch  "
          f"sampler {sample_s:.1f}s  compute {compute_s:.1f}s  "
          f"total {ref_total:.1f}s")

    # ---- this framework, same host -----------------------------------------
    run = KGWAS(data, exp_name="cpu_base", seed=seed)
    run.initialize_model(gnn_num_layers=layers, gnn_hidden_dim=hidden,
                         use_pallas=False)
    run.train(batch_size=bs, epoch=2, lr=lr, save_best_model=False)
    # epoch 1 includes jit compile; epoch 2 is the steady state
    ep2 = run.train_history[-1]
    my_epoch_s = ep2["epoch_time_s"]
    print(f"kgwas_tpu (XLA, CPU):  {ep2['steps']} steps/epoch  "
          f"epoch {my_epoch_s:.1f}s  ({ep2['edges_per_sec']:.3g} trav/s)")

    print(json.dumps({
        "metric": "cpu_epoch_time_ratio_ref_over_tpu",
        "n_snp": n_snp, "edges": edges, "steps_per_epoch": steps,
        "ref_compute_s": round(compute_s, 2),
        "ref_total_s": round(ref_total, 2),
        "tpu_engine_epoch_s": round(my_epoch_s, 2),
        "ratio_compute_only": round(compute_s / my_epoch_s, 2),
        "ratio_total": round(ref_total / my_epoch_s, 2),
    }))


if __name__ == "__main__":
    main()
