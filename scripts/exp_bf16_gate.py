"""bf16 quality gate (round-2 item 10): f32 vs bf16 at the KGWAS_P level.

Round 1's soak compared losses (equivalent) and per-SNP pred correlation on a
NO-SIGNAL synthetic (0.70 — meaningless: the predictions there are noise).
This experiment trains on a SIGNAL-BEARING synthetic GWAS (5% causal SNPs at
+4 sigma, graph/synthetic.py:84-88) through the full public pipeline and
compares what users consume: KGWAS_P ranks, top-K hit overlap, val pearson.

Gate (for flipping the TPU-backend engine default to bf16):
  spearman(KGWAS_P) > 0.95 AND top-50 overlap >= 0.9.

Run on CPU (bf16 numerics are backend-independent for these shapes):
    python scripts/exp_bf16_gate.py
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
from scipy.stats import spearmanr

from kgwas_tpu import KGWAS, KGWAS_Data


def run_mode(compute_dtype, tmp, seed=7):
    data = KGWAS_Data.from_synthetic(
        n_snp=4000, n_gene=400, n_go=80, seed=seed,
        data_path=os.path.join(tmp, compute_dtype))
    data.load_synthetic_gwas(seed=seed)
    data.process_gwas_file()
    data.prepare_split()
    run = KGWAS(data, exp_name=f"gate_{compute_dtype}", seed=seed)
    run.initialize_model(gnn_num_layers=2, gnn_hidden_dim=64,
                         compute_dtype=compute_dtype,
                         matmul_precision="default"
                         if compute_dtype == "bfloat16" else "highest")
    res = run.train(batch_size=512, epoch=30, lr=3e-3)
    return res, run


def main():
    tmp = "/tmp/bf16_gate"
    res32, run32 = run_mode("float32", tmp)
    res16, run16 = run_mode("bfloat16", tmp)

    merged = res32[["ID", "KGWAS_P"]].merge(
        res16[["ID", "KGWAS_P"]], on="ID", suffixes=("_32", "_16"))
    merged = merged.astype({"KGWAS_P_32": float, "KGWAS_P_16": float})
    rho = spearmanr(merged.KGWAS_P_32, merged.KGWAS_P_16).statistic

    k = 50
    top32 = set(merged.nsmallest(k, "KGWAS_P_32").ID)
    top16 = set(merged.nsmallest(k, "KGWAS_P_16").ID)
    overlap = len(top32 & top16) / k

    vp32 = run32.train_history[-1]["val_pearsonr"]
    assert not (np.isnan(vp32) or np.isnan(run16.train_history[-1]["val_pearsonr"])), "degenerate run: constant predictions"
    vp16 = run16.train_history[-1]["val_pearsonr"]

    print(f"spearman(KGWAS_P): {rho:.4f}")
    print(f"top-{k} overlap:   {overlap:.2f}")
    print(f"val pearson f32={vp32:.4f} bf16={vp16:.4f}")
    gate = rho > 0.95 and overlap >= 0.9
    print("GATE:", "PASS -> bf16 engine default on TPU is safe"
          if gate else "FAIL -> keep f32 default")


if __name__ == "__main__":
    main()
