"""BN=128 model-level bisection (stage 2 of the distillation).

Stage 1 (scripts/debug_bn128_distill.py, run on TPU 2026-08: ALL PASS)
proved the failure is not any single fused_gat_layer op — 18 configs up
to 409k rows x 4 chained calls x grad are clean. The composed 2-layer
5-dst-group model at 50k SNPs still dies (scripts/debug_bn128_repro.py,
re-confirmed same day). This harness bisects the COMPOSED program along
config axes, one subprocess per trial (a backend crash wedges the
client):

  layers      1 | 2
  loss        fwd (no grad) | full-graph masked-mean | take-masked
  dyn128      on | off       (new since the round-2 diagnosis)
  path        chunked+owned (default) | plain (gather_chunk_rows=0)
  n_snp       25k | 50k

Run on TPU: python scripts/debug_bn128_model_bisect.py
Single trial: ... CHILD <n_snp> <layers> <loss> <dyn128> <chunked>
"""
import itertools
import os
import subprocess
import sys

CHILD = len(sys.argv) > 1 and sys.argv[1] == "CHILD"


def child(n_snp, layers, loss_kind, dyn128, chunked):
    os.environ["KGWAS_PALLAS_BN"] = "128"
    os.environ["KGWAS_DYN128"] = "1" if dyn128 else "0"
    import numpy as np
    import jax
    import jax.numpy as jnp

    from kgwas_tpu.config import ModelConfig
    from kgwas_tpu.graph import compile_graph, make_synthetic_kg
    from kgwas_tpu.models import init_hetero_gnn
    from kgwas_tpu.models.hetero_gnn import apply_hetero_gnn

    g = make_synthetic_kg(n_snp=n_snp, n_gene=20000, n_go=12000, seed=0)
    cg = compile_graph(g, edge_pad_multiple=512, node_pad_multiple=256)
    cfg = ModelConfig(gnn_hidden_dim=128, gnn_num_layers=layers,
                      use_pallas=True,
                      gather_chunk_rows=None if chunked else 0)
    meta = cg.meta()
    params = init_hetero_gnn(jax.random.PRNGKey(7), cfg, meta, 20, 32, 16)
    rng = np.random.default_rng(3)
    n_pad = cg.padded_nodes["SNP"]
    y = jnp.asarray(rng.random(n_pad, dtype=np.float32))
    w = jnp.asarray(rng.random(n_pad, dtype=np.float32))
    b = jnp.asarray(rng.integers(0, cg.num_nodes["SNP"], 512),
                    dtype=jnp.int32)
    arrays = cg.arrays()

    def loss_fn(p):
        pred = apply_hetero_gnn(p, cfg, meta, arrays, training=True)
        if loss_kind == "full":
            return jnp.mean(w * (pred[:, 0] - y) ** 2)
        pp = jnp.take(pred[:, 0], b, axis=0)
        return jnp.mean(jnp.take(w, b) * (pp - jnp.take(y, b)) ** 2)

    if loss_kind == "fwd":
        out = jax.jit(lambda p: jnp.sum(
            apply_hetero_gnn(p, cfg, meta, arrays, training=True)))(params)
        print("OK fwd", float(out), flush=True)
    else:
        l, _ = jax.jit(jax.value_and_grad(loss_fn))(params)
        print("OK grad", float(l), flush=True)


def main():
    if CHILD:
        child(int(sys.argv[2]), int(sys.argv[3]), sys.argv[4],
              sys.argv[5] == "1", sys.argv[6] == "1")
        return
    trials = []
    # informative-first order at 50k (known-failing composed scale);
    # crash-hangs burn the full child timeout, so keep it tight — the
    # known failure surfaces in <3 min after a ~90 s compile
    for layers, loss, dyn, ch in itertools.product(
            (2, 1), ("take", "fwd", "full"), (True, False), (True,)):
        trials.append((50000, layers, loss, dyn, ch))
    for layers, loss in (((2), "take"), ((2), "fwd")):
        trials.append((50000, layers, loss, True, False))
    results = []
    for n_snp, layers, loss, dyn, ch in trials:
        cmd = [sys.executable, os.path.abspath(__file__), "CHILD",
               str(n_snp), str(layers), loss, "1" if dyn else "0",
               "1" if ch else "0"]
        try:
            r = subprocess.run(cmd, capture_output=True, text=True,
                               timeout=420, env=dict(os.environ))
            ok = r.returncode == 0 and "OK" in r.stdout
            tail = (r.stdout + r.stderr).strip().splitlines()
            tail = tail[-1][:100] if tail else ""
        except subprocess.TimeoutExpired:
            ok, tail = False, "TIMEOUT"
        results.append((n_snp, layers, loss, dyn, ch, ok))
        print(f"n={n_snp} L={layers} loss={loss:<4} dyn128={int(dyn)} "
              f"chunked={int(ch)} -> {'ok' if ok else 'FAIL ' + tail}",
              flush=True)
    fails = [r for r in results if not r[5]]
    oks = [r for r in results if r[5]]
    print(f"\n{len(fails)} fail / {len(oks)} ok")


if __name__ == "__main__":
    main()
