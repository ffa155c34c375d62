"""Multi-host (DCN) smoke test: 2 jax.distributed CPU processes x 2 local
devices train the synthetic pipeline data-parallel over a global 4-device
mesh and must reproduce the single-process loss trajectory (VERDICT round-1
item 5; SURVEY.md section 2.3 item 3; the reference has no distributed
runtime at all).

The workers run in subprocesses because jax.distributed can only be
initialized once per process (the pytest process already owns a
single-process backend)."""
import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

HERE = os.path.dirname(__file__)
WORKER = os.path.join(HERE, "multihost_worker.py")


def _free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _single_process_losses():
    """Same pipeline/seeds as multihost_worker.py, plain single-device."""
    import jax
    import jax.numpy as jnp

    from kgwas_tpu.config import ModelConfig
    from kgwas_tpu.engine.loop import build_optimizer, make_train_step
    from kgwas_tpu.graph import compile_graph, make_synthetic_kg
    from kgwas_tpu.models import init_hetero_gnn

    g = make_synthetic_kg(n_snp=96, n_gene=40, n_go=16, seed=3)
    cg = compile_graph(g, edge_pad_multiple=64, node_pad_multiple=32)
    cfg = ModelConfig(gnn_hidden_dim=16, no_relu=True)
    meta = cg.meta()
    params = init_hetero_gnn(jax.random.PRNGKey(0), cfg, meta, 20, 32, 16)
    n_snp = cg.num_nodes["SNP"]
    n_pad = cg.padded_nodes["SNP"]
    rng = np.random.default_rng(7)
    y_host = np.zeros(n_pad, np.float32)
    w_host = np.zeros(n_pad, np.float32)
    y_host[:n_snp] = rng.standard_normal(n_snp)
    w_host[:n_snp] = rng.uniform(0.5, 2.0, n_snp)
    optimizer = build_optimizer(1e-3, 5e-4)
    opt_state = optimizer.init(params)
    step = make_train_step(cfg, meta, optimizer)
    arrays = cg.arrays()
    batch_idx = jnp.arange(n_snp, dtype=jnp.int32)
    losses = []
    for _ in range(3):
        params, opt_state, loss = step(
            params, opt_state, arrays, jnp.asarray(batch_idx),
            jnp.asarray(y_host), jnp.asarray(w_host))
        losses.append(float(loss))
    return losses


def test_two_process_dcn_training_matches_single_process(tmp_path):
    port = _free_port()
    out = tmp_path / "mh.json"
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(i), "2", str(port), str(out)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True,
        )
        for i in range(2)
    ]
    outputs = []
    try:
        for p in procs:
            stdout, _ = p.communicate(timeout=600)
            outputs.append(stdout)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail("multihost workers timed out\n" + "\n".join(outputs))
    for p, stdout in zip(procs, outputs):
        assert p.returncode == 0, f"worker failed:\n{stdout[-4000:]}"

    res = json.loads(out.read_text())
    assert res["process_count"] == 2
    assert res["device_count"] == 4

    ref_losses = _single_process_losses()
    np.testing.assert_allclose(res["losses"], ref_losses, rtol=1e-4,
                               atol=1e-6)
