"""On-chip composed-train-step parity across kernel variants (VERDICT r3
item 4 + advisor dyn128 gate).

Each variant runs in a SUBPROCESS (BN and DYN128 are pinned at import of
ops/pallas_segment.py / ops/pallas_gat_layer.py) on the REAL TPU: 8
composed train steps (forward + backward kernels + torch-exact Adam) from
identical init on an identical 50k-SNP graph, recording per-step losses
and final params. The parent compares every variant against the XLA
(use_pallas=False) oracle run in the same process grid:

    xla            — no Pallas, BN-independent ground truth
    bn256_dyn128   — package default
    bn256_nodyn    — pre-dyn128 kernels
    bn512_dyn128   — BENCH default (bench.py)

This is the documented hardware gate for shipping a kernel-variant default:
all variants must agree with XLA on per-step loss (rtol 5e-3) and final
params (max-abs within tol) over >=8 steps. Run on any config change that
touches the merged kernels. (CPU-interpret parity alone is insufficient —
the BN=128 episode proved interpret mode does not catch Mosaic/DMA bugs.)

Run: python scripts/exp_bn_parity_tpu.py   (TPU; ~10 min with compiles)
"""
import json
import os
import subprocess
import sys
import tempfile

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CHILD = r"""
import json, os, sys
import numpy as np
import jax, jax.numpy as jnp

sys.path.insert(0, %(repo)r)
from kgwas_tpu.config import ModelConfig
from kgwas_tpu.engine.loop import build_optimizer, make_train_step
from kgwas_tpu.graph import compile_graph, make_synthetic_kg
from kgwas_tpu.models import init_hetero_gnn
from kgwas_tpu.ops.pallas_segment import BN
from kgwas_tpu.ops.pallas_gat_layer import DYN128

spec = json.loads(os.environ["BN_PARITY_SPEC"])
assert BN == spec["bn"], (BN, spec)
assert DYN128 == bool(spec["dyn128"]), (DYN128, spec)

g = make_synthetic_kg(n_snp=50_000, n_gene=5_000, n_go=3_000, snp_dim=20,
                      gene_dim=128, go_dim=128, avg_degree=6, seed=0)
cg = compile_graph(g, edge_pad_multiple=8192, node_pad_multiple=spec["bn"])
cfg = ModelConfig(gnn_hidden_dim=128, gnn_num_layers=2,
                  use_pallas=spec["pallas"], matmul_precision="highest",
                  rel_fold=bool(spec.get("fold", 0)))
meta = cg.meta()
params = init_hetero_gnn(jax.random.PRNGKey(0), cfg, meta, 20, 128, 128)
arrays = jax.device_put(cg.arrays())
optimizer = build_optimizer(1e-4, 5e-4)
opt_state = optimizer.init(params)
step = make_train_step(cfg, meta, optimizer)

n_pad = cg.padded_nodes["SNP"]
rng = np.random.default_rng(0)
y_node = jnp.asarray(rng.random(n_pad, dtype=np.float32))
w_node = jnp.asarray(np.ones(n_pad, dtype=np.float32))
losses = []
for s in range(8):
    batch_idx = jnp.asarray(
        np.random.default_rng(100 + s).integers(
            0, cg.num_nodes["SNP"], 512), dtype=jnp.int32)
    params, opt_state, loss = step(
        params, opt_state, arrays, batch_idx, y_node, w_node)
    losses.append(float(loss))

flat, _ = jax.tree_util.tree_flatten(params)
out = {"losses": losses,
       "backend": jax.default_backend(),
       "n_leaves": len(flat)}
np.savez(spec["out"],
         meta=json.dumps(out),
         **{f"p{i}": np.asarray(x) for i, x in enumerate(flat)})
print("CHILD_OK", json.dumps(out))
"""

VARIANTS = [
    ("xla", dict(bn=256, dyn128=1, pallas=False)),
    ("bn256_dyn128", dict(bn=256, dyn128=1, pallas=True)),
    ("bn256_nodyn", dict(bn=256, dyn128=0, pallas=True)),
    ("bn512_dyn128", dict(bn=512, dyn128=1, pallas=True)),
]

# BN_PARITY_FOLD=1: the round-5 default-flip gate — rel_fold ON in the
# Pallas variants (the cotangent-broadcast elimination whose hardware gate
# was interrupted in round 4), against the same XLA oracle. 3 children to
# keep fresh relay compiles to a minimum.
if os.environ.get("BN_PARITY_FOLD", "0") == "1":
    VARIANTS = [
        ("xla", dict(bn=256, dyn128=1, pallas=False)),
        ("bn256_fold", dict(bn=256, dyn128=1, pallas=True, fold=1)),
        ("bn512_fold", dict(bn=512, dyn128=1, pallas=True, fold=1)),
    ]


def run_child(name, spec, tmp):
    out = os.path.join(tmp, f"{name}.npz")
    env = dict(os.environ)
    env["KGWAS_PALLAS_BN"] = str(spec["bn"])
    env["KGWAS_DYN128"] = str(spec["dyn128"])
    env["BN_PARITY_SPEC"] = json.dumps({**spec, "out": out})
    print(f"[parent] {name}: BN={spec['bn']} dyn128={spec['dyn128']} "
          f"pallas={spec['pallas']} ...", flush=True)
    # relay remote-compiles are slow and variable (fresh composed-step
    # programs measured >900 s server-side on 2026-08-20; a killed child's
    # compile still completes server-side and caches, so a rerun is fast)
    timeout_s = int(os.environ.get("BN_PARITY_CHILD_TIMEOUT", "2400"))
    r = subprocess.run([sys.executable, "-c", _CHILD % {"repo": REPO}],
                       env=env, capture_output=True, text=True,
                       timeout=timeout_s)
    tail = "\n".join(r.stdout.strip().splitlines()[-3:])
    if r.returncode != 0 or "CHILD_OK" not in r.stdout:
        print(r.stdout[-3000:])
        print(r.stderr[-3000:])
        raise SystemExit(f"{name} child failed (rc={r.returncode})")
    print(f"[parent] {name}: {tail.splitlines()[-1][:120]}", flush=True)
    z = np.load(out, allow_pickle=False)
    meta = json.loads(str(z["meta"]))
    leaves = [z[f"p{i}"] for i in range(meta["n_leaves"])]
    return meta, leaves


def main():
    tmp = tempfile.mkdtemp(prefix="bn_parity_")
    results = {}
    for name, spec in VARIANTS:
        results[name] = run_child(name, spec, tmp)

    ref_meta, ref_leaves = results["xla"]
    print(f"\nbackend={ref_meta['backend']}  per-step losses (xla oracle): "
          f"{['%.6f' % x for x in ref_meta['losses']]}")
    ok = True
    for name, (meta, leaves) in results.items():
        if name == "xla":
            continue
        l_ref = np.array(ref_meta["losses"])
        l_var = np.array(meta["losses"])
        loss_rerr = float(np.max(np.abs(l_var - l_ref) /
                                 np.maximum(np.abs(l_ref), 1e-8)))
        pmax = max(float(np.max(np.abs(a - b)))
                   for a, b in zip(leaves, ref_leaves))
        passed = loss_rerr < 5e-3 and pmax < 5e-3
        ok &= passed
        print(f"{name:>14}: loss rel-err max={loss_rerr:.2e}  "
              f"final-params max|d|={pmax:.2e}  "
              f"{'PASS' if passed else 'FAIL'}")
    print("\nGATE:", "PASS — variants agree with XLA over 8 composed "
          "train steps on hardware" if ok else "FAIL")
    raise SystemExit(0 if ok else 1)


if __name__ == "__main__":
    main()
