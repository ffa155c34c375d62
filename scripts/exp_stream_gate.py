"""bf16-STREAM quality gate: f32 vs f32-with-bf16-edge-streams.

stream_dtype="bfloat16" rounds only the [E, D] gathered message streams
(kernel DMA + aggregation dot operands); params, activations, softmax
state, loss, and Adam stay f32. Full-bf16 failed the round-2 gate
(spearman 0.83, top-50 overlap 0.54 — scripts/exp_bf16_gate.py); this
mode targets the speed win with a far smaller numerics surface.

Gate (same bar as the bf16 one): spearman(KGWAS_P) > 0.95 AND top-50
overlap >= 0.9 on a signal-bearing synthetic GWAS.

Run on CPU: python scripts/exp_stream_gate.py
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
from scipy.stats import spearmanr

from kgwas_tpu import KGWAS, KGWAS_Data


def run_mode(tag, tmp, seed=7, **model_kw):
    data = KGWAS_Data.from_synthetic(
        n_snp=4000, n_gene=400, n_go=80, seed=seed,
        data_path=os.path.join(tmp, tag))
    data.load_synthetic_gwas(seed=seed)
    data.process_gwas_file()
    data.prepare_split()
    run = KGWAS(data, exp_name=f"gate_{tag}", seed=seed)
    run.initialize_model(gnn_num_layers=2, gnn_hidden_dim=64, **model_kw)
    res = run.train(batch_size=512, epoch=30, lr=3e-3)
    return res, run


def compare(tag, res32, res16, run32, run16):
    merged = res32[["ID", "KGWAS_P"]].merge(
        res16[["ID", "KGWAS_P"]], on="ID", suffixes=("_32", "_16"))
    merged = merged.astype({"KGWAS_P_32": float, "KGWAS_P_16": float})
    rho = spearmanr(merged.KGWAS_P_32, merged.KGWAS_P_16).statistic

    k = 50
    top32 = set(merged.nsmallest(k, "KGWAS_P_32").ID)
    top16 = set(merged.nsmallest(k, "KGWAS_P_16").ID)
    overlap = len(top32 & top16) / k

    vp32 = run32.train_history[-1]["val_pearsonr"]
    vp16 = run16.train_history[-1]["val_pearsonr"]
    assert not (np.isnan(vp32) or np.isnan(vp16)), "degenerate run"

    print(f"[{tag}] spearman(KGWAS_P): {rho:.4f}")
    print(f"[{tag}] top-{k} overlap:   {overlap:.2f}")
    print(f"[{tag}] val pearson f32={vp32:.4f} variant={vp16:.4f}")
    gate = rho > 0.95 and overlap >= 0.9
    print(f"[{tag}] GATE:", "PASS -> quality-safe"
          if gate else "FAIL -> keep f32 streams by default")
    return gate


def main():
    tmp = "/tmp/stream_gate"
    res32, run32 = run_mode("f32", tmp)
    res16, run16 = run_mode("stream16", tmp, stream_dtype="bfloat16")
    gate = compare("stream-bf16", res32, res16, run32, run16)

    # hybrid probe: f32 attention logits + bf16 message aggregation — what
    # a merged kernel with an f32 a_src side-stream would compute
    resh, runh = run_mode("hybrid16", tmp, stream_dtype="bfloat16",
                          stream_f32_logits=True)
    compare("f32-logit-hybrid", res32, resh, run32, runh)

    # exit status reflects the PRIMARY stream-bf16 gate so CI can consume
    # it; the hybrid probe is informational
    return 0 if gate else 1


if __name__ == "__main__":
    raise SystemExit(main())
