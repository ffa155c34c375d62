"""Inference (serving) throughput: full-graph forward, all SNPs per call.

One jitted forward evaluates every SNP (replaces the reference's
minibatch eval loops, reference kgwas/utils.py:20-39). Reports ms/call
and SNP scores/sec on the bench-scale graph.

Run: python scripts/exp_infer_throughput.py  (TPU)
"""
import os
import sys
import time

import numpy as np

import jax

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kgwas_tpu.config import ModelConfig
from kgwas_tpu.ops.pallas_segment import BN as _TILE_BN

_NODE_PAD = max(256, _TILE_BN)  # follow the shipped tile default (BN=512)

from kgwas_tpu.engine.loop import make_forward
from kgwas_tpu.graph import compile_graph, make_synthetic_kg
from kgwas_tpu.models import init_hetero_gnn


def main():
    n_snp = int(os.environ.get("INFER_N_SNP", 200_000))
    g = make_synthetic_kg(n_snp=n_snp, n_gene=n_snp // 10, n_go=n_snp // 17,
                          snp_dim=20, gene_dim=128, go_dim=128,
                          avg_degree=6, seed=0)
    cg = compile_graph(g, edge_pad_multiple=8192, node_pad_multiple=_NODE_PAD)
    for dtype in ("float32", "bfloat16"):
        cfg = ModelConfig(
            gnn_hidden_dim=128, gnn_num_layers=2, use_pallas=True,
            compute_dtype=dtype,
            matmul_precision="default" if dtype == "bfloat16" else "highest",
        )
        meta = cg.meta()
        params = init_hetero_gnn(jax.random.PRNGKey(0), cfg, meta, 20, 128,
                                 128)
        arrays = jax.device_put(cg.arrays())
        fwd = make_forward(cfg, meta)
        out = fwd(params, arrays)
        _ = np.asarray(out[:4])          # compile + sync
        n1, n2 = 3, 12
        t = []
        for n in (n1, n2):
            t0 = time.perf_counter()
            for _ in range(n):
                out = fwd(params, arrays)
            _ = np.asarray(out[:4])
            t.append(time.perf_counter() - t0)
        per_call = (t[1] - t[0]) / (n2 - n1)
        print(f"dtype={dtype}: forward {per_call * 1e3:.1f} ms/call, "
              f"{n_snp / per_call:.3g} SNP scores/s "
              f"({cg.total_real_edges() * cfg.gnn_num_layers / per_call:.3g}"
              f" edge-traversals/s)", flush=True)


if __name__ == "__main__":
    main()
