"""BN=128 TPU failure repro (run with KGWAS_PALLAS_BN=128 on a real chip).

Round-1 diagnosis (see ROADMAP.md): the composed BN=128 train-step program
dies with an opaque "TPU backend error (Internal)" once the graph is large
enough (threshold between 50k and 100k SNPs for the 2-layer 5-dst-type
program). It is NOT any single kernel (each passes in isolation at the same
row counts), NOT donation, and NOT the take-based loss (at 100k even a
purely elementwise mask-loss step fails; at 50k the full-graph-loss step
passes while the take-masked one fails — program size, not loss form).
BN=256 (default) runs the identical program correctly. Next: HLO/Mosaic
dump diff vs BN=256, newer jaxlib, or smaller scratch/semaphore footprint.
"""
import numpy as np, jax, jax.numpy as jnp
from kgwas_tpu.config import ModelConfig
from kgwas_tpu.graph import compile_graph, make_synthetic_kg
from kgwas_tpu.models import init_hetero_gnn
from kgwas_tpu.models.hetero_gnn import apply_hetero_gnn
from kgwas_tpu.engine.loop import build_optimizer
from kgwas_tpu.ops.pallas_segment import BN

print("BN =", BN, flush=True)
g = make_synthetic_kg(n_snp=50000, n_gene=20000, n_go=12000, seed=0)
cg = compile_graph(g, edge_pad_multiple=512, node_pad_multiple=256)
cfg = ModelConfig(gnn_hidden_dim=128, gnn_num_layers=2, use_pallas=True)
meta = cg.meta()
params = init_hetero_gnn(jax.random.PRNGKey(7), cfg, meta, 20, 32, 16)
rng = np.random.default_rng(3)
n_pad = cg.padded_nodes["SNP"]
y = jnp.asarray(rng.random(n_pad, dtype=np.float32))
w = jnp.asarray(rng.random(n_pad, dtype=np.float32))
b = jnp.asarray(rng.integers(0, cg.num_nodes["SNP"], 512), dtype=jnp.int32)
arrays = cg.arrays()

def loss_masked(p):
    pred = apply_hetero_gnn(p, cfg, meta, arrays, training=True)
    pp = jnp.take(pred[:, 0], b, axis=0)
    return jnp.mean(jnp.take(w, b) * (pp - jnp.take(y, b)) ** 2)

l, grads = jax.jit(jax.value_and_grad(loss_masked))(params)
print("masked-loss grad ok", float(l), flush=True)

def loss_full(p):
    pred = apply_hetero_gnn(p, cfg, meta, arrays, training=True)
    return jnp.mean(w * (pred[:, 0] - y) ** 2)

opt = build_optimizer(1e-3, 5e-4)

@jax.jit
def step_fullloss(p, s):
    l, grads = jax.value_and_grad(loss_full)(p)
    updates, s = opt.update(grads, s, p)
    p = jax.tree_util.tree_map(lambda a, u: a + u, p, updates)
    return p, s, l

p1, s1, l1 = step_fullloss(params, opt.init(params))
print("step FULL-loss+opt ok", float(l1), flush=True)
print("ALL OK", flush=True)
