"""Interpretation (attention export) at bench scale — VERDICT r2 weak #5.

get_disease_critical_network's device half is apply_collect_attention
(raw per-relation alpha export, models/hetero_gnn.py); collect_alpha
disqualifies the merged kernels, so it runs the per-relation XLA path.
This measures that path at bench scale on the real chip plus the host
table assembly (interpret/attention.attention_tables), so the cost of
interpretation-at-scale is a published number instead of an unknown.
Reference comparison point: the reference runs this as a full-graph CPU
forward (reference kgwas/utils.py:437-461).

Run: python scripts/exp_interpret_bench.py [n_snp]
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

from kgwas_tpu.graph import compile_graph, make_synthetic_kg
from kgwas_tpu.interpret.attention import attention_tables
from kgwas_tpu.models import init_hetero_gnn
from kgwas_tpu.models.hetero_gnn import apply_collect_attention
from kgwas_tpu.utils import enable_persistent_compilation_cache

enable_persistent_compilation_cache()


def main():
    n_snp = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    g = make_synthetic_kg(n_snp=n_snp, n_gene=n_snp // 10,
                          n_go=max(n_snp // 17, 100), snp_dim=20,
                          gene_dim=128, go_dim=128, avg_degree=6, seed=0)
    cg = compile_graph(g, edge_pad_multiple=8192, node_pad_multiple=_NODE_PAD)
    cfg = ModelConfig(gnn_hidden_dim=128, gnn_num_layers=2,
                      use_pallas=jax.default_backend() == "tpu",
                      matmul_precision="highest")
    meta = cg.meta()
    params = init_hetero_gnn(jax.random.PRNGKey(0), cfg, meta, 20, 128, 128)
    arrays = jax.device_put(cg.arrays())
    edges = cg.total_real_edges()
    print(f"backend={jax.default_backend()} n_snp={n_snp} edges={edges}")

    # device forward with raw-alpha export (compile + steady state)
    t0 = time.perf_counter()
    layers = apply_collect_attention(params, cfg, meta, arrays, raw=True)
    jax.block_until_ready(layers)
    _ = float(np.asarray(next(iter(layers[0].values()))[0]))  # host sync
    compile_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    n = 3
    for _ in range(n):
        layers = apply_collect_attention(params, cfg, meta, arrays, raw=True)
        _ = float(np.asarray(next(iter(layers[0].values()))[0]))
    fwd_s = (time.perf_counter() - t0) / n
    print(f"alpha-export forward: {fwd_s*1e3:.1f} ms "
          f"(first call incl. compile {compile_s:.1f}s)")

    # full host pipeline: device forward + [E] transfers + pandas tables
    t0 = time.perf_counter()
    df = attention_tables(params, cfg, meta, arrays, cg.relations)
    table_s = time.perf_counter() - t0
    print(f"attention_tables end-to-end: {table_s:.2f} s "
          f"({len(df)} edge rows)")


if __name__ == "__main__":
    main()
