"""Run the shard_map'd merged Pallas path on the REAL chip (round-2 item 3).

The multi-chip fast path (parallel/merged_shard.py) was validated only in
CPU interpret mode in round 1 — and the BN=128 episode proved interpret mode
does not catch Mosaic/DMA bugs. A 1-device mesh (data=1, model=1) makes
`sharded_merged_eligible` true and executes the actual Mosaic kernels through
shard_map + all_gather on the v5e.

Checks, on a 100k-SNP bench-config graph:
  1. the sharded step selects the merged Pallas kernels (not GSPMD fallback)
  2. loss trajectory parity vs the single-device engine step over N steps
  3. slope-timed step cost of both paths (shard_map overhead)

Run: python scripts/exp_merged_shard_tpu.py  (TPU; ~5 min with compiles)
"""
import time

import numpy as np

import jax
import jax.numpy as jnp

from kgwas_tpu.config import ModelConfig
from kgwas_tpu.ops.pallas_segment import BN as _TILE_BN

_NODE_PAD = max(256, _TILE_BN)  # follow the shipped tile default (BN=512)

from kgwas_tpu.engine.loop import build_optimizer, make_train_step
from kgwas_tpu.graph import compile_graph, make_synthetic_kg
from kgwas_tpu.models import init_hetero_gnn
from kgwas_tpu.parallel.merged_shard import sharded_merged_eligible
from kgwas_tpu.parallel.mesh import make_mesh
from kgwas_tpu.parallel.shard import (
    make_sharded_train_step,
    node_vector_sharding,
    replicated,
    shard_graph_arrays,
)

N_STEPS = 8


def main():
    print("backend:", jax.default_backend(), jax.devices(), flush=True)
    g = make_synthetic_kg(n_snp=100_000, n_gene=20_000, n_go=12_000,
                          snp_dim=20, gene_dim=128, go_dim=128,
                          avg_degree=6, seed=0)
    cg = compile_graph(g, edge_pad_multiple=8192, node_pad_multiple=_NODE_PAD)
    cfg = ModelConfig(gnn_hidden_dim=128, gnn_num_layers=2,
                      gnn_backbone="GAT", matmul_precision="highest",
                      use_pallas=True)
    meta = cg.meta()
    params_host = jax.tree.map(
        np.asarray,
        init_hetero_gnn(jax.random.PRNGKey(0), cfg, meta, 20, 128, 128),
    )

    # train steps donate params/opt_state, so every phase needs fresh buffers
    def fresh_params():
        return jax.tree.map(jnp.asarray, params_host)

    optimizer = build_optimizer(1e-4, 5e-4)

    rng = np.random.default_rng(0)
    n_pad = cg.padded_nodes["SNP"]
    y = rng.random(n_pad).astype(np.float32)
    w = np.ones(n_pad, np.float32)
    bidx = rng.integers(0, cg.num_nodes["SNP"], 512).astype(np.int32)

    # --- single-device engine path
    arrays = jax.device_put(cg.arrays())
    step1 = make_train_step(cfg, meta, optimizer)
    p = fresh_params()
    o = optimizer.init(p)
    losses1 = []
    for _ in range(N_STEPS):
        p, o, loss = step1(p, o, arrays, jnp.asarray(bidx),
                           jnp.asarray(y), jnp.asarray(w))
        losses1.append(float(loss))
    print("single-device losses:", [f"{x:.6f}" for x in losses1], flush=True)

    # --- shard_map merged path on a 1-device mesh
    mesh = make_mesh(data=1, model=1)
    assert sharded_merged_eligible(meta, mesh), "merged path must be eligible"
    arrays_sh = shard_graph_arrays(mesh, cg.arrays())
    step2 = make_sharded_train_step(cfg, meta, optimizer, mesh, cg.arrays())
    y_d = jax.device_put(jnp.asarray(y), node_vector_sharding(mesh))
    w_d = jax.device_put(jnp.asarray(w), node_vector_sharding(mesh))
    b_d = jax.device_put(jnp.asarray(bidx), replicated(mesh))
    p = fresh_params()
    o = optimizer.init(p)
    losses2 = []
    for _ in range(N_STEPS):
        p, o, loss = step2(p, o, arrays_sh, b_d, y_d, w_d)
        losses2.append(float(loss))
    print("shard_map losses:    ", [f"{x:.6f}" for x in losses2], flush=True)

    rel = np.abs(np.array(losses1) - np.array(losses2)) / np.abs(losses1)
    print(f"max rel loss diff over {N_STEPS} steps: {rel.max():.2e}",
          flush=True)
    assert rel.max() < 1e-4, "loss trajectory diverged"

    # --- slope timing both paths
    def slope(stepf, args, n1=3, n2=10):
        def run(k):
            pp = fresh_params()
            oo = optimizer.init(pp)
            for _ in range(k):
                pp, oo, loss = stepf(pp, oo, *args)
            float(loss)
        run(2)
        t0 = time.perf_counter(); run(n1); t1 = time.perf_counter()
        run(n2); t2 = time.perf_counter()
        return ((t2 - t1) - (t1 - t0)) / (n2 - n1)

    s1 = slope(step1, (arrays, jnp.asarray(bidx), jnp.asarray(y),
                       jnp.asarray(w)))
    s2 = slope(step2, (arrays_sh, b_d, y_d, w_d))
    trav = cg.total_real_edges() * 2
    print(f"single-device step: {s1*1e3:8.2f} ms  {trav/s1:.3e} trav/s",
          flush=True)
    print(f"shard_map step:     {s2*1e3:8.2f} ms  {trav/s2:.3e} trav/s "
          f"(overhead {100*(s2-s1)/s1:+.1f}%)", flush=True)
    print("MERGED SHARD_MAP PATH OK ON REAL TPU", flush=True)


if __name__ == "__main__":
    main()
