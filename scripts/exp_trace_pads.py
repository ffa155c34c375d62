"""Trace-only (no execution) pad census of the composed train step.

KGWAS_TRACE_PADS=1 makes _pad_edge_stream print every padding call with
its stream size at trace time. Runs on CPU — tracing alone, no compile.

Run: KGWAS_TRACE_PADS=1 JAX_PLATFORMS=cpu python scripts/exp_trace_pads.py
"""
import os
import sys

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


def main():
    g = make_synthetic_kg(n_snp=200_000, n_gene=20_000, n_go=12_000,
                          snp_dim=20, gene_dim=128, go_dim=128,
                          avg_degree=6, seed=0)
    cg = compile_graph(g, edge_pad_multiple=8192, node_pad_multiple=_NODE_PAD)
    cfg = ModelConfig(gnn_hidden_dim=128, gnn_num_layers=2,
                      matmul_precision="highest", use_pallas=True)
    meta = cg.meta()
    params = init_hetero_gnn(jax.random.PRNGKey(0), cfg, meta, 20, 128, 128)
    arrays = cg.arrays()
    rng = np.random.default_rng(0)
    n_pad = cg.padded_nodes["SNP"]
    y = jnp.asarray(rng.random(n_pad, dtype=np.float32))
    w = jnp.ones(n_pad, jnp.float32)
    bidx = jnp.asarray(rng.integers(0, cg.num_nodes["SNP"], 512), jnp.int32)

    optimizer = build_optimizer(1e-4, 5e-4)
    opt_state = optimizer.init(params)
    train_step = make_train_step(cfg, meta, optimizer)
    traced = train_step.trace(params, opt_state, arrays, bidx, y, w)
    print("traced OK:", type(traced).__name__)


if __name__ == "__main__":
    main()
