"""Backbone/mode step-time probe on the real TPU.

Measures the composed train step for every backbone (fused GAT,
SAGE/GCN/SGC via the merged MP path) and sigmoid-mode GAT (merged
unnorm kernels vs the per-relation fallback). Reproduces the numbers in
benchmarks/RESULTS.md ("Secondary backbones merged" / "Unnormalized GAT
modes").

Run: python scripts/exp_backbones.py  (TPU)
"""
import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kgwas_tpu.config import ModelConfig
from kgwas_tpu.ops.pallas_segment import BN as _TILE_BN

_NODE_PAD = max(256, _TILE_BN)  # follow the shipped tile default (BN=512)

from kgwas_tpu.engine.loop import build_optimizer, make_train_step
from kgwas_tpu.graph import compile_graph, make_synthetic_kg
from kgwas_tpu.models import init_hetero_gnn


def measure(cfg, cg, meta, arrays, y, w, bidx, label):
    params = init_hetero_gnn(jax.random.PRNGKey(0), cfg, meta, 20, 128, 128)
    opt = build_optimizer(1e-4, 5e-4)
    o = opt.init(params)
    step = make_train_step(cfg, meta, opt)
    p = params
    p, o, loss = step(p, o, arrays, bidx, y, w)
    _ = float(loss)
    t0 = time.perf_counter()
    for _ in range(5):
        p, o, loss = step(p, o, arrays, bidx, y, w)
    lN = float(loss)
    print(f"{label}: {(time.perf_counter() - t0) / 5 * 1e3:.1f} ms/step "
          f"loss5={lN:.5f}", flush=True)


def main():
    n_snp = int(os.environ.get("BB_N_SNP", 50_000))
    g = make_synthetic_kg(n_snp=n_snp, n_gene=n_snp // 10, n_go=n_snp // 20,
                          snp_dim=20, gene_dim=128, go_dim=128,
                          avg_degree=6, seed=0)
    cg = compile_graph(g, edge_pad_multiple=8192, node_pad_multiple=_NODE_PAD)
    meta = cg.meta()
    arrays = jax.device_put(cg.arrays())
    rng = np.random.default_rng(0)
    n_pad = cg.padded_nodes["SNP"]
    y = jnp.asarray(rng.random(n_pad, dtype=np.float32))
    w = jnp.ones(n_pad, jnp.float32)
    bidx = jnp.asarray(rng.integers(0, cg.num_nodes["SNP"], 512), jnp.int32)

    for bb in ("GAT", "SAGE", "GCN", "SGC"):
        measure(ModelConfig(gnn_hidden_dim=128, gnn_num_layers=2,
                            gnn_backbone=bb, use_pallas=True),
                cg, meta, arrays, y, w, bidx, f"{bb} merged")
    for label, pm in (("sigmoid merged-unnorm", "merged"),
                      ("sigmoid per-relation", "relation")):
        measure(ModelConfig(gnn_hidden_dim=128, gnn_num_layers=2,
                            sigmoid_gat=True, use_pallas=True,
                            pallas_mode=pm),
                cg, meta, arrays, y, w, bidx, label)


if __name__ == "__main__":
    main()
