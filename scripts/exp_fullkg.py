"""Full-KG-scale residency experiment (VERDICT r3 item 1).

The north star says the KG — millions of SNP nodes, tens of millions of
edges (reference kgwas_data.py:365; SURVEY section 6) — "lives in TPU
HBM". The largest run before round 4 was 400k SNPs / 6.7M edges. This
script scales the bench config toward ~2M SNPs / ~28M edges on ONE v5e:

  * prints the HOST-side layout/compile cost (graph gen + merged layouts),
  * prints a static per-component HBM budget (node tables, edge/layout
    index arrays, per-group message streams at the configured dtype),
  * runs composed train steps, slope-timed, and reports device
    memory_stats peak — or, on RESOURCE_EXHAUSTED, the measured wall.

Options via env (the fit levers, SURVEY section 7.3):
  FULLKG_N_SNP (default 2_000_000), FULLKG_DEG (default 6+1 rev),
  FULLKG_STREAM_DTYPE (e.g. bfloat16), FULLKG_REMAT=1 (jax.checkpoint
  each conv layer: trades recompute for not keeping both layers' stream
  residuals), FULLKG_HIDDEN (128), KGWAS_PALLAS_BN / BENCH_NODE_PAD as in
  bench.py, FULLKG_STEPS (8).

Run: python scripts/exp_fullkg.py
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def human(n):
    for u in ("B", "KiB", "MiB", "GiB"):
        if abs(n) < 1024:
            return f"{n:.2f} {u}"
        n /= 1024
    return f"{n:.2f} TiB"


def main():
    # FULLKG_MESH=N: run the SHARDED train step on an N-device virtual CPU
    # mesh (xla_force_host_platform_device_count) instead of the single
    # real chip — the VERDICT r3 item-1 fallback: demonstrate the full-KG
    # scale partitioned over a mesh with REAL per-device byte accounting
    # (addressable_shards). Uses the GSPMD XLA path (use_pallas=False):
    # interpret-mode Pallas at 33M edges would take hours on CPU, while
    # the XLA segment ops run one step in ~a minute.
    mesh_n = int(os.environ.get("FULLKG_MESH", "0"))
    if mesh_n:
        os.environ["JAX_PLATFORMS"] = "cpu"
        flags = os.environ.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + f" --xla_force_host_platform_device_count={mesh_n}"
            ).strip()

    import jax

    if mesh_n:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from kgwas_tpu.config import ModelConfig
    from kgwas_tpu.engine.loop import build_optimizer, make_train_step
    from kgwas_tpu.graph import compile_graph, make_synthetic_kg
    from kgwas_tpu.models import init_hetero_gnn

    n_snp = int(os.environ.get("FULLKG_N_SNP", 2_000_000))
    avg_degree = int(os.environ.get("FULLKG_DEG", 6))
    hidden = int(os.environ.get("FULLKG_HIDDEN", 128))
    stream_dtype = os.environ.get("FULLKG_STREAM_DTYPE") or None
    remat = os.environ.get("FULLKG_REMAT", "0") == "1"
    steps = int(os.environ.get("FULLKG_STEPS", 8))
    layers = int(os.environ.get("FULLKG_LAYERS", 2))
    from kgwas_tpu.ops.pallas_segment import BN

    node_pad = int(os.environ.get("BENCH_NODE_PAD", max(256, BN)))

    print(f"[fullkg] backend={jax.default_backend()} n_snp={n_snp} "
          f"deg={avg_degree} hidden={hidden} stream_dtype={stream_dtype} "
          f"remat={remat} node_pad={node_pad}", flush=True)

    t0 = time.time()
    g = make_synthetic_kg(
        n_snp=n_snp, n_gene=n_snp // 10, n_go=max(n_snp // 17, 100),
        snp_dim=20, gene_dim=128, go_dim=128, avg_degree=avg_degree, seed=0)
    t_gen = time.time() - t0
    t0 = time.time()
    cg = compile_graph(g, edge_pad_multiple=8192, node_pad_multiple=node_pad)
    merged = cg.meta()["merged"]
    t_compile = time.time() - t0
    edges = cg.total_real_edges()
    print(f"[fullkg] host: kg gen {t_gen:.0f}s, shard-compile+merged "
          f"layouts {t_compile:.0f}s; real edges = {edges:,}", flush=True)

    # ---- static HBM budget ------------------------------------------------
    sdt_bytes = 2 if stream_dtype == "bfloat16" else 4
    budget = {}
    budget["node_features"] = sum(a.nbytes for a in cg.node_x.values())
    arrays_np = cg.arrays()

    def tree_bytes(t):
        return sum(np.asarray(x).nbytes
                   for x in jax.tree_util.tree_leaves(t))

    budget["graph_arrays(edges+masks)"] = tree_bytes(arrays_np)
    lay_bytes = 0
    stream_rows = {}
    for dst_t, L in merged.items():
        for attr in ("src", "dst", "csc_perm", "csc_ids", "csc_offsets",
                     "row_offsets", "tile2rel"):
            v = getattr(L, attr, None)
            if v is not None:
                lay_bytes += np.asarray(v).nbytes
        stream_rows[dst_t] = len(L.src)
    budget["merged_layout_indices"] = lay_bytes
    per_group_stream = {t: r * hidden * sdt_bytes
                        for t, r in stream_rows.items()}
    budget["stream_one_group_max"] = max(per_group_stream.values())
    budget["streams_all_groups_x2layers"] = 2 * sum(per_group_stream.values())
    budget["activations_h(all types)"] = sum(
        cg.padded_nodes[t] * hidden * 4 for t in cg.padded_nodes)
    n_params_approx = (
        sum(a.shape[1] * hidden + hidden * hidden for a in cg.node_x.values())
        + 2 * len(cg.relations) * (hidden * hidden + 2 * hidden))
    budget["params+adam(x3)"] = n_params_approx * 4 * 3
    for k, v in budget.items():
        print(f"[fullkg]   {k:36s} {human(v)}", flush=True)
    print(f"[fullkg]   stream rows/group: "
          f"{ {t: f'{r:,}' for t, r in stream_rows.items()} }", flush=True)

    # ---- run --------------------------------------------------------------
    cfg = ModelConfig(
        gnn_hidden_dim=hidden, gnn_num_layers=layers,
        use_pallas=not mesh_n,
        matmul_precision="highest", stream_dtype=stream_dtype, remat=remat,
        # explicit fit lever at full-KG scale: the unfolded backward
        # materializes the [R*N, D] cross-relation cotangent broadcast
        # (~1-2 GiB at 2M SNPs) — fold it away (opt-in flag, see config.py)
        rel_fold=os.environ.get("FULLKG_REL_FOLD", "0") == "1",
        # layout arrays as traced operands: keeps the 100s-of-MiB layout
        # index arrays OUT of the serialized HLO (the relay's
        # /remote_compile broke on the literal form above ~400k SNPs).
        # Single-chip only: mesh mode forces use_pallas=False and
        # shard_graph_arrays has no sharding rule for merged_ops.
        layout_operands=(not mesh_n) and
        os.environ.get("FULLKG_LAYOUT_OPERANDS", "0") == "1")
    if cfg.layout_operands:
        from kgwas_tpu.models.hetero_gnn import build_layout_operands

        # the merged fast path never touches arrays["edges"] (per-relation
        # src/dst for the XLA fallback) — at 2M that is 679 MiB of dead
        # device-resident weight; slim them to placeholders (the python
        # trace only passes the dict through, it never indexes it on the
        # merged path)
        if os.environ.get("FULLKG_SLIM_EDGES", "1") == "1":
            arrays_np["edges"] = {
                k: {kk: np.zeros(1, np.int32) for kk in v}
                for k, v in arrays_np["edges"].items()
            }
        t0 = time.time()
        arrays_np["merged_ops"] = build_layout_operands(cfg, cg.meta())
        lo_bytes = 0
        for dst_t, tagged in arrays_np["merged_ops"].items():
            for kind, lay in tagged.items():
                for k, v in lay.items():
                    b = sum(np.asarray(x).nbytes for x in
                            (v if isinstance(v, tuple) else (v,)))
                    lo_bytes += b
                    print(f"[fullkg]   merged_ops[{dst_t}].{kind}."
                          f"{k:14s} {human(b)}", flush=True)
        print(f"[fullkg] layout operands: {human(lo_bytes)} moved out of "
              f"the HLO ({time.time()-t0:.0f}s host)", flush=True)
    meta = cg.meta()
    params = init_hetero_gnn(jax.random.PRNGKey(0), cfg, meta, 20, 128, 128)
    optimizer = build_optimizer(1e-4, 5e-4)
    opt_state = optimizer.init(params)

    dev = jax.devices()[0]

    def mem_peak():
        try:
            s = dev.memory_stats()
            return s.get("peak_bytes_in_use", 0)
        except Exception:
            return 0

    # FULLKG_LOWER_ONLY=1: trace + lower the single-chip train step and
    # print the serialized stablehlo size WITHOUT compiling or touching the
    # device — the direct measurement of the /remote_compile payload that
    # killed the round-4 2M attempts (HLO-literal layout arrays).
    if os.environ.get("FULLKG_LOWER_ONLY", "0") == "1" and not mesh_n:
        step = make_train_step(cfg, meta, optimizer)
        params = jax.tree_util.tree_map(np.asarray, params)
        opt_state = jax.tree_util.tree_map(np.asarray, opt_state)
        n_pad = cg.padded_nodes["SNP"]
        rng = np.random.default_rng(0)
        y = rng.random(n_pad).astype(np.float32)
        w = np.ones(n_pad, np.float32)
        bidx = rng.integers(0, cg.num_nodes["SNP"], 512).astype(np.int32)
        t0 = time.time()
        low = step.lower(params, opt_state, arrays_np, bidx, y, w)
        t_trace = time.time() - t0
        t0 = time.time()
        txt_len = len(low.as_text())
        print(json.dumps({
            "lower_only": True, "n_snp": n_snp,
            "layout_operands": cfg.layout_operands,
            "stablehlo_bytes": txt_len,
            "trace_s": round(t_trace, 1),
            "as_text_s": round(time.time() - t0, 1),
        }), flush=True)
        return

    try:
        if mesh_n:
            from kgwas_tpu.parallel.mesh import make_mesh
            from kgwas_tpu.parallel.shard import (make_sharded_train_step,
                                                  node_vector_sharding,
                                                  replicated,
                                                  shard_graph_arrays)

            mesh = make_mesh(data=mesh_n, model=1)
            step = make_sharded_train_step(cfg, meta, optimizer, mesh,
                                           arrays_np)
            arrays = shard_graph_arrays(mesh, arrays_np)
            n_pad = cg.padded_nodes["SNP"]
            rng = np.random.default_rng(0)
            y = jax.device_put(
                jnp.asarray(rng.random(n_pad, dtype=np.float32)),
                node_vector_sharding(mesh))
            w = jax.device_put(jnp.ones(n_pad, jnp.float32),
                               node_vector_sharding(mesh))
            bidx = jax.device_put(
                jnp.asarray(rng.integers(0, cg.num_nodes["SNP"], 512),
                            jnp.int32), replicated(mesh))
            # REAL per-device byte accounting of the sharded graph state
            per_dev = {}
            for leaf in jax.tree_util.tree_leaves((arrays, y, w)):
                for s in leaf.addressable_shards:
                    per_dev[s.device.id] = (per_dev.get(s.device.id, 0)
                                            + s.data.nbytes)
            for did in sorted(per_dev):
                print(f"[fullkg]   device {did}: graph-state "
                      f"{human(per_dev[did])}", flush=True)
        else:
            step = make_train_step(cfg, meta, optimizer)
            arrays = jax.device_put(arrays_np)
            n_pad = cg.padded_nodes["SNP"]
            rng = np.random.default_rng(0)
            y = jnp.asarray(rng.random(n_pad, dtype=np.float32))
            w = jnp.ones(n_pad, jnp.float32)
            bidx = jnp.asarray(rng.integers(0, cg.num_nodes["SNP"], 512),
                               jnp.int32)
        t0 = time.time()
        p, o, loss = step(params, opt_state, arrays, bidx, y, w)
        l0 = float(loss)
        print(f"[fullkg] first step (incl compile): {time.time()-t0:.0f}s "
              f"loss={l0:.4f} peak_hbm={human(mem_peak())}", flush=True)

        def run_n(n, p, o):
            t0 = time.perf_counter()
            for _ in range(n):
                p, o, loss = step(p, o, arrays, bidx, y, w)
            _ = float(loss)
            return time.perf_counter() - t0, p, o, loss

        if steps >= 4:
            n1 = max(steps // 4, 1)
            t1, p, o, _ = run_n(n1, p, o)
            t2, p, o, loss = run_n(steps, p, o)
            dt = (t2 - t1) / (steps - n1)
        else:
            # too few steps to slope-time (dryrun mode) — plain average
            t2, p, o, loss = run_n(steps, p, o)
            dt = t2 / steps
        trav = edges * 2
        print(json.dumps({
            "n_snp": n_snp, "edges": edges, "step_ms": round(dt * 1e3, 1),
            "ns_per_trav": round(dt * 1e9 / trav, 2),
            "trav_per_s": round(trav / dt, 0),
            "peak_hbm_bytes": mem_peak(),
            "stream_dtype": stream_dtype or "float32", "remat": remat,
            "mesh": mesh_n, "loss": float(loss),
        }), flush=True)
    except Exception as e:
        msg = str(e)
        print(f"[fullkg] FAILED: {type(e).__name__}: {msg[:600]}",
              flush=True)
        if "RESOURCE_EXHAUSTED" in msg or "Out of memory" in msg:
            print(f"[fullkg] HBM WALL at n_snp={n_snp} "
                  f"(peak={human(mem_peak())}) — static budget above is "
                  "the accounting", flush=True)
        raise SystemExit(2)


if __name__ == "__main__":
    main()
