"""Composed-step fwd/bwd/opt split at bench scale (round 2).

Isolated per-piece timings have repeatedly failed to add up to the
composed 139 ms step (per-dispatch overhead inflates small pieces and
scheduling differs), so this measures the split WITHIN composed jit
programs: forward-only loss, value_and_grad (no optimizer), and the full
train step — all slope-timed, chunked-gather default config.

Run: python scripts/exp_composed_split.py  (TPU)
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
from kgwas_tpu.models.hetero_gnn import apply_hetero_gnn


def slope(fn, n1=3, n2=10):
    fn(2)
    t0 = time.perf_counter(); fn(n1); t1 = time.perf_counter()
    fn(n2); t2 = time.perf_counter()
    return ((t2 - t1) - (t1 - t0)) / (n2 - n1)


def main():
    print("backend:", jax.default_backend(), jax.devices(), flush=True)
    g = make_synthetic_kg(n_snp=200_000, n_gene=20_000, n_go=12_000,
                          snp_dim=20, gene_dim=128, go_dim=128,
                          avg_degree=6, seed=0)
    cg = compile_graph(g, edge_pad_multiple=8192, node_pad_multiple=_NODE_PAD)
    for tag, extra in [
        ("chunked-padded", {}),
        ("chunked-rmw", {"pad_fragments": False}),
        ("plain", {"gather_chunk_rows": 0, "bwd_window_edges": 0}),
    ]:
        cfg = ModelConfig(gnn_hidden_dim=128, gnn_num_layers=2,
                          matmul_precision="highest", use_pallas=True,
                          **extra)
        meta = cg.meta()
        params = init_hetero_gnn(jax.random.PRNGKey(0), cfg, meta,
                                 20, 128, 128)
        arrays = jax.device_put(cg.arrays())
        rng = np.random.default_rng(0)
        n_pad = cg.padded_nodes["SNP"]
        y = jnp.asarray(rng.random(n_pad, dtype=np.float32))
        w = jnp.ones(n_pad, jnp.float32)
        bidx = jnp.asarray(rng.integers(0, cg.num_nodes["SNP"], 512),
                           jnp.int32)

        def loss_fn(p):
            pred = apply_hetero_gnn(p, cfg, meta, arrays)[:, 0]
            pb = jnp.take(pred, bidx)
            yb = jnp.take(y, bidx)
            wb = jnp.take(w, bidx)
            return jnp.sum(wb * (pb - yb) ** 2) / jnp.sum(wb)

        fwd = jax.jit(loss_fn)
        vgrad = jax.jit(lambda p: jax.value_and_grad(loss_fn)(p))

        def s_fwd(k):
            acc = jnp.zeros((), jnp.float32)
            for _ in range(k):
                acc = acc + fwd(params)
            float(acc)

        def s_vg(k):
            acc = jnp.zeros((), jnp.float32)
            for _ in range(k):
                l, gr = vgrad(params)
                acc = acc + l + jax.tree_util.tree_leaves(gr)[0].sum()
            float(acc)

        optimizer = build_optimizer(1e-4, 5e-4)
        opt_state = optimizer.init(params)
        train_step = make_train_step(cfg, meta, optimizer)
        state = {"p": params, "o": opt_state}

        def s_ts(k):
            p, o = state["p"], state["o"]
            for _ in range(k):
                p, o, loss = train_step(p, o, arrays, bidx, y, w)
            float(loss)
            state["p"], state["o"] = p, o

        t_f = slope(s_fwd)
        t_g = slope(s_vg)
        t_s = slope(s_ts)
        print(f"[{tag}] fwd={t_f*1e3:7.2f} ms  val+grad={t_g*1e3:7.2f} ms "
              f"(bwd={((t_g-t_f))*1e3:7.2f})  train_step={t_s*1e3:7.2f} ms "
              f"(opt={(t_s-t_g)*1e3:6.2f})", flush=True)


if __name__ == "__main__":
    main()
