"""TPU numerics check: Pallas kernel path vs XLA segment path, fwd + grads.

Validates KGWAS_KERNEL_PRECISION (3-pass bf16 kernel dots) against the
XLA oracle path running at the global matmul precision ("highest") on a
mid-size synthetic graph, on the REAL TPU backend (CPU interpret tests
can't see MXU pass-count effects).

Run: python scripts/exp_tpu_numerics.py
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

from kgwas_tpu.graph import compile_graph, make_synthetic_kg
from kgwas_tpu.models import init_hetero_gnn
from kgwas_tpu.models.hetero_gnn import apply_hetero_gnn


def main():
    print("backend:", jax.default_backend(), flush=True)
    g = make_synthetic_kg(n_snp=30_000, n_gene=4_000, n_go=2_000,
                          snp_dim=20, gene_dim=128, go_dim=128,
                          avg_degree=6, seed=0)
    cg = compile_graph(g, edge_pad_multiple=8192, node_pad_multiple=_NODE_PAD)
    meta = cg.meta()
    arrays = jax.device_put(cg.arrays())
    rng = np.random.default_rng(0)
    n_pad = cg.padded_nodes["SNP"]
    y = jnp.asarray(rng.random(n_pad, dtype=np.float32))
    bidx = jnp.asarray(rng.integers(0, cg.num_nodes["SNP"], 512), jnp.int32)

    outs = {}
    for use_pallas in (False, True):
        cfg = ModelConfig(gnn_hidden_dim=128, gnn_num_layers=2,
                          matmul_precision="highest", use_pallas=use_pallas)
        params = init_hetero_gnn(jax.random.PRNGKey(0), cfg, meta, 20, 128,
                                 128)

        @jax.jit
        def loss_fn(params):
            pred = apply_hetero_gnn(params, cfg, meta, arrays, training=True)
            p = jnp.take(pred[:, 0], bidx, axis=0)
            return jnp.mean((p - jnp.take(y, bidx)) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        fwd = apply_hetero_gnn(params, cfg, meta, arrays, training=False)
        outs[use_pallas] = (float(loss), jax.device_get(grads),
                            np.asarray(fwd[:, 0]))
        print(f"use_pallas={use_pallas} loss={float(loss):.8f}", flush=True)

    l0, g0, f0 = outs[False]
    l1, g1, f1 = outs[True]
    print(f"loss rel diff: {abs(l1 - l0) / max(abs(l0), 1e-12):.3e}")
    fd = np.abs(f1 - f0) / (np.abs(f0) + 1e-6)
    print(f"fwd pred rel diff: max={fd.max():.3e} mean={fd.mean():.3e}")
    flat0 = jax.tree_util.tree_leaves_with_path(g0)
    flat1 = jax.tree_util.tree_leaves(g1)
    # per-leaf gate: rtol on the leaf scale, atol floors out vanishing
    # leaves (layer-0 att_dst/lin_dst grads are 1e-16..1e-7 — numerically
    # zero in BOTH paths; a pure relative metric explodes on them)
    bad = []
    for (path, a), b in zip(flat0, flat1):
        a, b = np.asarray(a), np.asarray(b)
        err = np.abs(a - b).max()
        tol = 5e-3 * max(np.abs(a).max(), np.abs(b).max()) + 5e-6
        if err > tol:
            bad.append((err / tol, jax.tree_util.keystr(path),
                        float(np.abs(a).max()), float(np.abs(b).max())))
    bad.sort(reverse=True)
    for d, name, ma, mb in bad[:8]:
        print(f"  BAD leaf {name}: err/tol {d:.2f} |xla|max={ma:.3e} "
              f"|pallas|max={mb:.3e}")
    print(f"grad leaves failing rtol=5e-3/atol=1e-6: {len(bad)}/"
          f"{len(flat1)}")
    ok = abs(l1 - l0) / max(abs(l0), 1e-12) < 1e-4 and not bad
    print("NUMERICS", "OK" if ok else "FAIL")


if __name__ == "__main__":
    main()
