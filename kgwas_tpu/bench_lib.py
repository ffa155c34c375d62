"""Benchmark: hetero message-passing training throughput on one chip.

Measures the full training step (full-graph GAT forward + backward + Adam)
on a synthetic KG sized like the fast-mode demo config and reports
KG edge-traversals/sec/chip (each real edge counts once per GNN layer per
forward pass — the unit of hetero message-passing work).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

vs_baseline compares against an estimated A100 PyG reference throughput of
2.0e7 edge-traversals/s for the same model (KGWAS defaults: 2-layer GAT,
hidden 128, heads 1). The reference publishes no numbers (BASELINE.md); this
estimate is deliberately generous to the baseline: it assumes the A100 PyG
stack sustains 20M scatter-gather edge messages/s end-to-end including
NeighborLoader CPU sampling and the ~L-hop neighborhood recomputation that
full-graph training eliminates.
"""
import json
import os
import sys
import time

import numpy as np

# LABELED ESTIMATE for the A100/PyG reference (no A100 in this environment;
# the reference publishes no numbers). Measured anchor (round 3,
# scripts/exp_cpu_baseline.py + BASELINE.md): the reference pipeline run
# verbatim on this host's CPU sustains ~2.4e6 edge-traversals/s at parity
# with this engine's CPU backend; the estimate assumes ~8x CPU->A100 for
# the torch/PyG stack.
REF_EDGE_TRAVERSALS_PER_SEC_A100 = 2.0e7


def main():
    # runs on the default platform (axon TPU under the driver; CPU works too)
    import jax
    import jax.numpy as jnp

    from kgwas_tpu.config import ModelConfig
    from kgwas_tpu.engine.loop import build_optimizer, make_train_step
    from kgwas_tpu.graph import compile_graph, make_synthetic_kg
    from kgwas_tpu.models import init_hetero_gnn

    n_snp = int(os.environ.get("BENCH_N_SNP", 200_000))
    n_gene = int(os.environ.get("BENCH_N_GENE", 20_000))
    n_go = int(os.environ.get("BENCH_N_GO", 12_000))
    avg_degree = int(os.environ.get("BENCH_AVG_DEGREE", 6))
    hidden = int(os.environ.get("BENCH_HIDDEN", 128))
    layers = int(os.environ.get("BENCH_LAYERS", 2))
    batch = int(os.environ.get("BENCH_BATCH", 512))
    steps = int(os.environ.get("BENCH_STEPS", 20))
    heads = int(os.environ.get("BENCH_HEADS", 1))
    dtype = os.environ.get("BENCH_DTYPE", "float32")
    stream_dtype = os.environ.get("BENCH_STREAM_DTYPE") or None
    # XLA-side model-matmul precision override (kernel dots are pinned to
    # Mosaic DEFAULT independently — see benchmarks/RESULTS.md)
    mm_precision = os.environ.get("BENCH_MM_PRECISION") or None
    # scan_steps>1 dispatches that many optimizer steps per host round trip
    # (lax.scan over the same step body) — isolates device step time from
    # the per-dispatch relay overhead
    scan_steps = int(os.environ.get("BENCH_SCAN", "0"))
    use_pallas = os.environ.get("BENCH_PALLAS", "1") == "1"
    # src-chunked gather rows: unset -> ModelConfig default; 0 disables
    gather_chunk = os.environ.get("BENCH_GATHER_CHUNK")
    gather_chunk = None if gather_chunk is None else int(gather_chunk)
    # fragment-windowed backward permute: unset -> default; 0 disables
    bwd_window = os.environ.get("BENCH_BWD_WINDOW")
    bwd_window = None if bwd_window is None else int(bwd_window)

    g = make_synthetic_kg(
        n_snp=n_snp,
        n_gene=n_gene,
        n_go=n_go,
        snp_dim=20,
        gene_dim=128,
        go_dim=128,
        avg_degree=avg_degree,
        seed=0,
    )
    from .ops.pallas_segment import BN

    node_pad = int(os.environ.get("BENCH_NODE_PAD", max(256, BN)))
    cg = compile_graph(g, edge_pad_multiple=8192, node_pad_multiple=node_pad)
    cfg = ModelConfig(
        gnn_hidden_dim=hidden,
        gnn_num_layers=layers,
        gat_num_head=heads,
        gnn_backbone="GAT",
        compute_dtype=dtype,
        stream_dtype=stream_dtype,
        matmul_precision=mm_precision or (
            "default" if dtype == "bfloat16" else "highest"),
        use_pallas=use_pallas,
        gather_chunk_rows=gather_chunk,
        bwd_window_edges=bwd_window,
        # rel-fold A/B knob; default ON = the package default (the
        # BN_PARITY_FOLD hardware gate passed on v5e, round 5)
        rel_fold=os.environ.get("BENCH_REL_FOLD", "1") == "1",
    )
    meta = cg.meta()
    params = init_hetero_gnn(jax.random.PRNGKey(0), cfg, meta, 20, 128, 128)

    arrays = jax.device_put(cg.arrays())
    optimizer = build_optimizer(1e-4, 5e-4)
    opt_state = optimizer.init(params)
    train_step = make_train_step(cfg, meta, optimizer)

    n_pad = cg.padded_nodes["SNP"]
    rng = np.random.default_rng(0)
    y_node = jnp.asarray(rng.random(n_pad, dtype=np.float32))
    w_node = jnp.asarray(np.ones(n_pad, dtype=np.float32))
    batch_idx = jnp.asarray(
        rng.integers(0, cg.num_nodes["SNP"], batch), dtype=jnp.int32
    )

    if scan_steps > 1:
        from kgwas_tpu.engine.loop import make_train_scan

        train_scan = make_train_scan(cfg, meta, optimizer)
        batch_mat = jnp.asarray(
            rng.integers(0, cg.num_nodes["SNP"], (scan_steps, batch)),
            dtype=jnp.int32,
        )

        def run_n(n, params, opt_state):
            t0 = time.perf_counter()
            losses = None
            for _ in range(n):
                params, opt_state, losses = train_scan(
                    params, opt_state, arrays, batch_mat, y_node, w_node
                )
            _ = float(losses[-1])
            return time.perf_counter() - t0, params, opt_state, losses[-1]

        n1 = max(steps // (4 * scan_steps), 1)
        n2 = max(steps // scan_steps, n1 + 1)
        _, params, opt_state, _ = run_n(1, params, opt_state)  # compile
        t1, params, opt_state, _ = run_n(n1, params, opt_state)
        t2, params, opt_state, loss = run_n(n2, params, opt_state)
        steps = (n2 - n1) * scan_steps
        dt = t2 - t1
    else:
        # warmup / compile (float() forces a real host round trip; on
        # relayed platforms block_until_ready can return before execution
        # completes)
        params, opt_state, loss = train_step(
            params, opt_state, arrays, batch_idx, y_node, w_node
        )
        _ = float(loss)

        # slope timing: run N1 then N2 chained steps, each ended by one host
        # sync; the difference cancels fixed dispatch/sync latency
        def run_n(n, params, opt_state):
            t0 = time.perf_counter()
            for _ in range(n):
                params, opt_state, loss = train_step(
                    params, opt_state, arrays, batch_idx, y_node, w_node
                )
            _ = float(loss)
            return time.perf_counter() - t0, params, opt_state

        n1 = max(steps // 4, 1)
        n2 = steps
        t1, params, opt_state = run_n(n1, params, opt_state)
        t2, params, opt_state = run_n(n2, params, opt_state)
        dt = (t2 - t1) / (n2 - n1) * steps  # normalized to `steps` steps
        loss = loss

    real_edges = cg.total_real_edges()
    traversals_per_step = real_edges * layers
    value = traversals_per_step * steps / dt

    from kgwas_tpu.ops.pallas_segment import BN as effective_bn

    print(
        json.dumps(
            {
                "metric": "kg_edge_traversals_per_sec_per_chip",
                "value": round(value, 1),
                "unit": "edge_traversals/s",
                "vs_baseline": round(value / REF_EDGE_TRAVERSALS_PER_SEC_A100, 3),
                # self-describing config echo: bench results are comparable
                # across rounds only with these pinned (advisor round 3)
                "config": {
                    "pallas_bn": effective_bn,
                    "node_pad": node_pad,
                    "n_snp": n_snp,
                    "edges": real_edges,
                    "layers": layers,
                    "dtype": dtype,
                    "scan": scan_steps,
                    "rel_fold": cfg.rel_fold,
                    "step_ms": round(dt / steps * 1e3, 2),
                },
            }
        )
    )
    print(
        f"# device={jax.devices()[0].device_kind} edges={real_edges} "
        f"layers={layers} steps={steps} step_time={dt/steps*1e3:.1f}ms "
        f"dtype={dtype} pallas={use_pallas} loss={float(loss):.4f}",
        file=sys.stderr,
    )


