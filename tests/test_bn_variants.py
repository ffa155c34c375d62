"""BN tile-size variants: parity of the merged Pallas path at BN=512.

BN (dst rows per kernel tile) is read once at import
(ops/pallas_segment.py), so each variant runs in a SUBPROCESS. BN=512
requires node_pad_multiple=512 so every per-relation row/src block is a
whole number of tiles (graph/merged_layout.py asserts). dyn128 stays
active at BN=512 (band height HALF=128 < BN), so this also covers the
generalized `BN >= 2*HALF` dyn128 gate.
"""
import os
import subprocess
import sys

_CHILD = r"""
import os
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
# sitecustomize may have pinned the axon platform at startup; flip before
# any backend initializes (same dance as tests/conftest.py)
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
import numpy as np, jax.numpy as jnp
from kgwas_tpu.config import ModelConfig
from kgwas_tpu.graph import compile_graph, make_synthetic_kg
from kgwas_tpu.models import init_hetero_gnn
from kgwas_tpu.models.hetero_gnn import apply_hetero_gnn
from kgwas_tpu.ops.pallas_segment import BN
from kgwas_tpu.ops.pallas_gat_layer import DYN128

assert BN == int(os.environ["BN_VARIANT"]), BN
assert DYN128, "dyn128 must stay active (BN >= 2*HALF)"
g = make_synthetic_kg(n_snp=3000, n_gene=600, n_go=250, seed=5)
cg = compile_graph(g, edge_pad_multiple=512,
                   node_pad_multiple=max(256, BN))
meta = cg.meta()
arrays = cg.arrays()
outs = {}
for pallas in (True, False):
    cfg = ModelConfig(gnn_hidden_dim=128, gnn_num_layers=2,
                      use_pallas=pallas)
    params = init_hetero_gnn(jax.random.PRNGKey(7), cfg, meta, 20, 32, 16)

    def loss(p):
        pred = apply_hetero_gnn(p, cfg, meta, arrays, training=True)
        return jnp.sum(pred[:, 0] ** 2) / pred.shape[0]

    l, gr = jax.value_and_grad(loss)(params)
    outs[pallas] = (float(l), gr)
d = jax.tree_util.tree_map(
    lambda a, b: float(jnp.max(jnp.abs(a - b))), outs[True][1],
    outs[False][1])
mx = max(jax.tree_util.tree_leaves(d))
assert abs(outs[True][0] - outs[False][0]) < 1e-5, outs
assert mx < 1e-4, mx
print("BN_PARITY_OK")
"""


def _run_variant_child(bn):
    env = dict(os.environ, KGWAS_PALLAS_BN=str(bn), BN_VARIANT=str(bn),
               JAX_PLATFORMS="cpu")
    r = subprocess.run([sys.executable, "-c", _CHILD], env=env,
                       capture_output=True, text=True, timeout=600,
                       cwd=os.path.dirname(os.path.dirname(
                           os.path.abspath(__file__))))
    assert r.returncode == 0 and "BN_PARITY_OK" in r.stdout, (
        r.stdout[-2000:], r.stderr[-2000:])


def test_bn256_merged_parity_vs_xla():
    """BN=256 (the pre-round-5 default, still env-selectable) keeps full
    merged-path parity vs the XLA oracle."""
    _run_variant_child(256)


def test_bn512_merged_parity_vs_xla():
    """BN=512 — the shipped default tile — full merged-path parity vs the
    XLA oracle (subprocess: BN pins at import)."""
    _run_variant_child(512)


def test_bn128_hard_error_at_scale(monkeypatch):
    """BN=128 + TPU backend + >BN128_MAX_ROWS padded rows must RAISE unless
    the explicit KGWAS_ALLOW_BN128=1 escape hatch is set (VERDICT r4: a
    config that probabilistically wedges real runs must not be reachable
    by accident). Interpret/CPU runs and small row spaces stay allowed."""
    import pytest

    from kgwas_tpu.ops import pallas_segment as ps

    monkeypatch.setattr(ps, "BN", 128)
    monkeypatch.setattr(ps.jax, "default_backend", lambda: "tpu")
    monkeypatch.delenv("KGWAS_ALLOW_BN128", raising=False)
    with pytest.raises(RuntimeError, match="KGWAS_ALLOW_BN128"):
        ps._check_bn_supported(ps.BN128_MAX_ROWS + 256)
    # below the scale threshold: warning path only, no raise
    monkeypatch.setattr(ps, "_BN128_WARNED", True)
    ps._check_bn_supported(1024)
    # explicit escape hatch: allowed (the repro harnesses rely on this)
    monkeypatch.setenv("KGWAS_ALLOW_BN128", "1")
    ps._check_bn_supported(ps.BN128_MAX_ROWS + 256)
    # CPU backend (interpret-mode experiments): never gated
    monkeypatch.delenv("KGWAS_ALLOW_BN128", raising=False)
    monkeypatch.setattr(ps.jax, "default_backend", lambda: "cpu")
    ps._check_bn_supported(10**6)
