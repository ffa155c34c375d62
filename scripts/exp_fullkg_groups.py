"""Per-group compile probe at full-KG scale: isolate WHICH merged dst
group's fused op kills the relay's chipless TpuAotCompiler helper at 2M
(benchmarks/RESULTS.md round 5 — the composed step fails, 1.75M passes).

For each merged dst group, jit value_and_grad of that group's fused op
alone (same path choice + layout operands as apply_merged_gat_layer) at
the full-scale shapes and try to compile+run it on the chip. Env:
FULLKG_N_SNP (2M), FULLKG_GROUPS (comma list to restrict), knobs as in
exp_fullkg.
"""
import os
import sys
import time
import traceback

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from kgwas_tpu.config import ModelConfig
    from kgwas_tpu.graph import compile_graph, make_synthetic_kg
    from kgwas_tpu.models.hetero_gnn import build_layout_operands
    from kgwas_tpu.ops.pallas_segment import BN
    from kgwas_tpu.ops.pallas_gat_layer import (
        fused_gat_layer_gathered_t, fused_gat_layer_raw_gathered_t,
        fused_gat_layer_plain_gathered_t)
    from kgwas_tpu.graph.merged_layout import (EMITTER_FAST_ROWS,
                                               get_chunked_stream)

    n_snp = int(os.environ.get("FULLKG_N_SNP", 2_000_000))
    hidden = int(os.environ.get("FULLKG_HIDDEN", 128))
    sdt = os.environ.get("FULLKG_STREAM_DTYPE") or None
    only = [x for x in os.environ.get("FULLKG_GROUPS", "").split(",") if x]

    g = make_synthetic_kg(
        n_snp=n_snp, n_gene=n_snp // 10, n_go=max(n_snp // 17, 100),
        snp_dim=20, gene_dim=128, go_dim=128, avg_degree=6, seed=0)
    cg = compile_graph(g, edge_pad_multiple=8192,
                       node_pad_multiple=max(256, BN))
    meta = cg.meta()
    cfg = ModelConfig(gnn_hidden_dim=hidden, use_pallas=True,
                      stream_dtype=sdt, rel_fold=True, layout_operands=True)
    t0 = time.time()
    ops = build_layout_operands(cfg, meta)
    print(f"[groups] bundles built ({time.time()-t0:.0f}s): "
          f"{ {k: list(v)[0] for k, v in ops.items()} }", flush=True)

    rng = np.random.default_rng(0)
    dt = jnp.dtype(sdt) if sdt else jnp.float32
    for dst_t, L in meta["merged"].items():
        if only and dst_t not in only:
            continue
        kind = list(ops[dst_t])[0] if dst_t in ops else None
        R = len(L.rel_keys)
        fold = R
        print(f"[groups] {dst_t}: kind={kind} E={len(L.src):,} "
              f"n_src={L.n_src_total:,} n_rows={L.n_rows_total:,}",
              flush=True)
        if kind is None:
            print(f"[groups] {dst_t}: literal path (small), skip",
                  flush=True)
            continue
        lay_dev = jax.device_put(jax.tree_util.tree_map(np.asarray,
                                                        ops[dst_t][kind]))
        att = jnp.asarray(rng.standard_normal((R, hidden)) * 0.1, jnp.float32)
        adst = jnp.asarray(rng.standard_normal(L.n_rows_total) * 0.1,
                           jnp.float32)
        try:
            t0 = time.time()
            if kind == "chunked":
                cs = get_chunked_stream(
                    L, EMITTER_FAST_ROWS, pad_fragments=True)
                aux = (L.csc_ids, L.csc_offsets, L.n_src_total,
                       L.n_rows_total, L.tile2rel)
                tabs = tuple(
                    jnp.asarray(rng.standard_normal(
                        (int(cs.src_bounds[c + 1] - cs.src_bounds[c]),
                         hidden)), dt)
                    for c in range(cs.n_chunks))

                def f(lay, tabs, att, adst):
                    out = fused_gat_layer_gathered_t(
                        tabs, att, adst, lay, cs, aux, 0.2, 1.0,
                        False, "softmax", fold)
                    return jnp.sum(out ** 2)

                val, grads = jax.jit(jax.value_and_grad(
                    f, argnums=(1, 2, 3)))(lay_dev, tabs, att, adst)
            else:
                xs = jnp.asarray(
                    rng.standard_normal((L.n_src_total, hidden)), dt)
                if kind == "raw":
                    def f(lay, xs, att, adst):
                        out = fused_gat_layer_raw_gathered_t(
                            xs, att, adst, lay, L,
                            (L.n_src_total, L.n_rows_total), 0.2, 1.0,
                            False, fold)
                        return jnp.sum(out ** 2)
                else:
                    from kgwas_tpu.graph.merged_layout import (
                        get_owned_plain_stream)

                    pl = get_owned_plain_stream(L)

                    def f(lay, xs, att, adst):
                        out = fused_gat_layer_plain_gathered_t(
                            xs, att, adst, lay, pl,
                            (L.n_src_total, L.n_rows_total, L.tile2rel),
                            0.2, 1.0, False, "softmax", fold)
                        return jnp.sum(out ** 2)

                val, grads = jax.jit(jax.value_and_grad(
                    f, argnums=(1, 2, 3)))(lay_dev, xs, att, adst)
            v = float(val)
            print(f"[groups] {dst_t}: OK val={v:.4f} "
                  f"({time.time()-t0:.0f}s)", flush=True)
        except Exception as e:
            print(f"[groups] {dst_t}: FAILED {type(e).__name__}: "
                  f"{str(e)[:300]}", flush=True)


if __name__ == "__main__":
    main()
