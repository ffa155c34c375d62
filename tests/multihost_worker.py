"""Multi-host (DCN) worker: one jax.distributed process of a 2-process CPU
rig (SURVEY.md section 2.3 item 3 / BASELINE "N>=2 hosts" scaling axis).

Spawned by tests/test_multihost.py as:
    python multihost_worker.py <process_id> <num_processes> <port> <outfile>

Each process owns 2 virtual CPU devices; the global mesh is
(data=2*num_processes, model=1). Both processes build the identical synthetic
pipeline, assemble GLOBAL arrays shard-by-shard (jax.make_array_from_callback
— each process materializes only its addressable shards), and run the same
GSPMD train step as single-host training (parallel/shard.py). Process 0
writes the per-step losses to <outfile> for the parent test to compare
against the single-process trajectory.
"""
import json
import os
import sys

# spawned as `python tests/multihost_worker.py` -> sys.path[0] is tests/,
# not the repo root; self-locate the package (no install, no PYTHONPATH)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    pid, nproc, port, outfile = (
        int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3]), sys.argv[4])

    # CPU with MH_LOCAL_DEVICES (default 2) local devices — must happen
    # before any backend init (sitecustomize pins JAX_PLATFORMS to the TPU
    # tunnel at startup)
    n_local = int(os.environ.get("MH_LOCAL_DEVICES", "2"))
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    os.environ["XLA_FLAGS"] = (
        flags + f" --xla_force_host_platform_device_count={n_local}").strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_default_matmul_precision", "highest")

    from kgwas_tpu.parallel.mesh import init_distributed

    process_index, process_count = init_distributed(
        coordinator_address=f"localhost:{port}",
        num_processes=nproc,
        process_id=pid,
    )
    assert process_count == nproc
    assert jax.device_count() == n_local * nproc
    assert jax.local_device_count() == n_local

    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from kgwas_tpu.config import ModelConfig
    from kgwas_tpu.engine.loop import build_optimizer
    from kgwas_tpu.graph import compile_graph, make_synthetic_kg
    from kgwas_tpu.models import init_hetero_gnn
    from kgwas_tpu.parallel.mesh import make_mesh
    from kgwas_tpu.parallel.shard import (
        graph_shardings,
        make_sharded_train_step,
        node_vector_sharding,
        replicated,
    )

    n_dev = n_local * nproc
    # deterministic identical pipeline on every process. Scale overrides
    # (MH_N_SNP etc.) let scripts/exp_fullkg_2proc drive the SAME worker at
    # full-KG scale: 2 processes x 1 device each routes every collective
    # through the cross-process CPU backend, sidestepping XLA:CPU's
    # in-process 40 s rendezvous wall (benchmarks/RESULTS.md round 4).
    n_snp = int(os.environ.get("MH_N_SNP", "96"))
    if n_snp == 96:
        g = make_synthetic_kg(n_snp=96, n_gene=40, n_go=16, seed=3)
        snp_dim, gene_dim, go_dim = 20, 32, 16
        cg = compile_graph(g, edge_pad_multiple=16 * n_dev,
                           node_pad_multiple=8 * n_dev)
    else:
        snp_dim, gene_dim, go_dim = 20, 128, 128
        g = make_synthetic_kg(
            n_snp=n_snp, n_gene=n_snp // 10, n_go=max(n_snp // 17, 100),
            snp_dim=snp_dim, gene_dim=gene_dim, go_dim=go_dim,
            avg_degree=6, seed=0)
        from kgwas_tpu.ops.pallas_segment import BN as _TILE_BN

        cg = compile_graph(g, edge_pad_multiple=8192,
                           node_pad_multiple=int(
                               os.environ.get("MH_NODE_PAD",
                                              max(256, _TILE_BN))))
    hidden = int(os.environ.get("MH_HIDDEN", "16"))
    cfg = ModelConfig(gnn_hidden_dim=hidden, no_relu=True,
                      stream_dtype=os.environ.get("MH_STREAM_DTYPE") or None,
                      remat=os.environ.get("MH_REMAT", "0") == "1")
    meta = cg.meta()
    params_host = init_hetero_gnn(jax.random.PRNGKey(0), cfg, meta,
                                  snp_dim, gene_dim, go_dim)

    mesh = make_mesh(data=n_dev, model=1)

    def globalize(tree, shardings):
        """Host-identical numpy pytree -> global jax.Arrays."""
        def one(a, s):
            a = np.asarray(a)
            return jax.make_array_from_callback(a.shape, s, lambda idx: a[idx])
        return jax.tree_util.tree_map(
            one, tree, shardings,
            is_leaf=lambda x: not isinstance(x, dict))

    arrays_host = cg.arrays()
    arrays = globalize(arrays_host, graph_shardings(mesh, arrays_host))
    rep = replicated(mesh)
    params = jax.tree_util.tree_map(
        lambda a: jax.make_array_from_callback(
            np.asarray(a).shape, rep, lambda idx: np.asarray(a)[idx]),
        params_host)

    n_snp = cg.num_nodes["SNP"]
    n_pad = cg.padded_nodes["SNP"]
    rng = np.random.default_rng(7)
    y_host = np.zeros(n_pad, np.float32)
    w_host = np.zeros(n_pad, np.float32)
    y_host[:n_snp] = rng.standard_normal(n_snp)
    w_host[:n_snp] = rng.uniform(0.5, 2.0, n_snp)
    nodes = node_vector_sharding(mesh)
    y_node = jax.make_array_from_callback(y_host.shape, nodes,
                                          lambda i: y_host[i])
    w_node = jax.make_array_from_callback(w_host.shape, nodes,
                                          lambda i: w_host[i])
    bidx_host = np.arange(n_snp, dtype=np.int32)
    batch_idx = jax.make_array_from_callback(bidx_host.shape, rep,
                                             lambda i: bidx_host[i])

    optimizer = build_optimizer(1e-3, 5e-4)
    opt_state = optimizer.init(params)
    step = make_sharded_train_step(cfg, meta, optimizer, mesh, arrays)

    import time as _time

    losses = []
    t0 = _time.time()
    step_times = []
    for _ in range(int(os.environ.get("MH_STEPS", "3"))):
        params, opt_state, loss = step(
            params, opt_state, arrays, batch_idx, y_node, w_node)
        losses.append(float(loss))  # replicated scalar: same on every host
        step_times.append(round(_time.time() - t0, 1))
        t0 = _time.time()
        print(f"[multihost_worker {pid}] step {len(losses)} "
              f"loss={losses[-1]:.4f} {step_times[-1]}s", flush=True)

    # REAL per-device byte accounting (the VERDICT item-7 contract)
    per_dev = {}
    for leaf in jax.tree_util.tree_leaves((arrays, y_node, w_node)):
        for sh in leaf.addressable_shards:
            per_dev[sh.device.id] = (per_dev.get(sh.device.id, 0)
                                     + sh.data.nbytes)

    if process_index == 0:
        with open(outfile, "w") as f:
            json.dump({"losses": losses, "device_count": jax.device_count(),
                       "process_count": process_count,
                       "n_snp": n_snp,
                       "real_edges": cg.total_real_edges(),
                       "step_times_s": step_times,
                       "per_device_bytes_p0": per_dev}, f)
    # all processes must reach shutdown together
    jax.distributed.shutdown()
    print(f"[multihost_worker {pid}] ok losses={losses}")


if __name__ == "__main__":
    main()
