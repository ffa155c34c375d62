"""BN=128 stage-3 distillation: kernel-only composition over the REAL
merged group layouts (no encoders, no head, no loss).

Stage 1 (debug_bn128_distill.py): one plain fused_gat_layer op chained up
to 4x at 409k rows — ALL PASS. Stage 2 (debug_bn128_model_bisect.py,
2026-08): the composed model fails at 50k SNPs in EVERY form — 1 or 2
layers, forward-only or grad, dyn128 on or off (mode flips between a
hang and 'TPU backend error (Internal)'). So the trigger is between "one
plain op" and "the 5-group model forward": the chunked/owned kernel
VARIANTS (stage 1 never ran those) and/or the multi-group composition.

This harness runs ONLY the fused layer ops for a subset of the compiled
50k graph's merged groups in one jit, one subprocess per subset:

  subsets: each group alone | all | all-but-one | the two big ones

Run on TPU: python scripts/debug_bn128_kernel_compose.py
Single trial: ... CHILD <comma-separated-group-indices>
"""
import os
import subprocess
import sys

CHILD = len(sys.argv) > 1 and sys.argv[1] == "CHILD"


def child(idx_csv, repeat=1):
    os.environ["KGWAS_PALLAS_BN"] = os.environ.get("KGWAS_PALLAS_BN", "128")
    import numpy as np
    import jax
    import jax.numpy as jnp

    from kgwas_tpu.config import ModelConfig
    from kgwas_tpu.graph import compile_graph, make_synthetic_kg
    from kgwas_tpu.models.hetero_gnn import apply_merged_gat_layer

    g = make_synthetic_kg(n_snp=50000, n_gene=20000, n_go=12000, seed=0)
    cg = compile_graph(g, edge_pad_multiple=512, node_pad_multiple=256)
    meta = cg.meta()
    cfg = ModelConfig(gnn_hidden_dim=128, gnn_num_layers=1, use_pallas=True)
    groups = sorted(meta["merged"].keys())
    keep = [groups[i] for i in map(int, idx_csv.split(","))]
    meta = dict(meta)
    meta["merged"] = {k: v for k, v in meta["merged"].items() if k in keep}

    d = cfg.gnn_hidden_dim
    rng = np.random.default_rng(0)
    h = {t: jnp.asarray(rng.normal(size=(n, d)).astype(np.float32) * 0.1)
         for t, n in cg.padded_nodes.items()}
    # minimal per-relation params for the kept groups
    layer_params = {}
    for dst_t, L in meta["merged"].items():
        for rk in L.rel_keys:
            layer_params[rk] = {
                "lin_src": {"w": jnp.asarray(
                    rng.normal(size=(d, d)).astype(np.float32) * 0.05)},
                "att_src": jnp.asarray(
                    rng.normal(size=(1, d)).astype(np.float32)),
                "att_dst": jnp.asarray(
                    rng.normal(size=(1, d)).astype(np.float32)),
                "bias": jnp.zeros((d,), jnp.float32),
            }

    def f(h):
        acc = 0.0
        for _ in range(repeat):
            out = apply_merged_gat_layer(layer_params, cfg, meta, h)
            # chain: perturb inputs so layers can't dedupe/CSE
            h = {t: (v + 1e-3 * out[t] if t in out else v)
                 for t, v in h.items()}
            acc = acc + sum(jnp.sum(v) for v in out.values())
        return acc

    # staged markers: a timeout BEFORE 'COMPILED' is a slow compile (infra),
    # AFTER it is a real execution hang (one of the two observed failure
    # modes; the other raises 'TPU backend error (Internal)')
    prec = os.environ.get("COMPOSE_MM_PRECISION")  # model uses "highest"
    if prec:
        f_in = f

        def f(h):
            with jax.default_matmul_precision(prec):
                return f_in(h)

    compiled = jax.jit(f).lower(h).compile()
    print("COMPILED", flush=True)
    val = compiled(h)
    print("OK", float(val), flush=True)


def main():
    if CHILD:
        child(sys.argv[2],
              int(sys.argv[3]) if len(sys.argv) > 3 else 1)
        return
    import itertools

    # discover group count/order once (host-side, no TPU)
    probe = subprocess.run(
        [sys.executable, "-c",
         "import os; os.environ['JAX_PLATFORMS']='cpu';\n"
         "import jax; jax.config.update('jax_platforms','cpu')\n"
         "from kgwas_tpu.graph import compile_graph, make_synthetic_kg\n"
         "g = make_synthetic_kg(n_snp=50000, n_gene=20000, n_go=12000,"
         " seed=0)\n"
         "cg = compile_graph(g, edge_pad_multiple=512,"
         " node_pad_multiple=256)\n"
         "print(','.join(sorted(cg.meta()['merged'].keys())))"],
        capture_output=True, text=True, timeout=900)
    groups = probe.stdout.strip().splitlines()[-1].split(",")
    n = len(groups)
    print("groups:", groups, flush=True)
    all_g = list(range(n))
    trials = [(all_g, 2), (all_g, 1), (all_g, 3)]
    trials += [([i], 2) for i in range(n)]
    trials += [([j for j in range(n) if j != i], 2) for i in range(n)]
    for subset, repeat in trials:
        csv = ",".join(map(str, subset))
        names = [groups[i][:4] for i in subset]
        cmd = [sys.executable, os.path.abspath(__file__), "CHILD", csv,
               str(repeat)]
        try:
            r = subprocess.run(cmd, capture_output=True, text=True,
                               timeout=420, env=dict(os.environ))
            ok = r.returncode == 0 and "OK" in r.stdout
            tail = (r.stdout + r.stderr).strip().splitlines()
            tail = tail[-1][:90] if tail else ""
        except subprocess.TimeoutExpired as te:
            seen = (te.stdout or b"")
            seen = seen.decode() if isinstance(seen, bytes) else seen
            ok = False
            tail = ("EXEC-HANG (compiled, never returned)"
                    if "COMPILED" in seen else "COMPILE-TIMEOUT")
        print(f"groups={names} x{repeat} -> {'ok' if ok else 'FAIL ' + tail}",
              flush=True)


if __name__ == "__main__":
    main()
