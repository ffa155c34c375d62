"""XLA gather-emitter breakpoint probe + chunked-grad real-row parity.

exp_chunk_ab.py measured plain takes at 4.77 ns/row on a 40k-row table
(SNP group) but 11.50 ns/row on a 456k-row table (Gene) — so the slow
emitter kicks in somewhere between. This sweeps table size at fixed index
count to find the breakpoint (sets the chunked-gather engagement gate),
and re-checks the chunked-vs-plain gradient on REAL src rows only (the
0.27 max-diff in exp_chunk_bwd.py is expected to be pad-row garbage).

Run: python scripts/exp_emitter_probe.py  (TPU)
"""
import time

import numpy as np

import jax
import jax.numpy as jnp


def slope(fn, n1=3, n2=10):
    fn(2)
    t0 = time.perf_counter(); fn(n1); t1 = time.perf_counter()
    fn(n2); t2 = time.perf_counter()
    return ((t2 - t1) - (t1 - t0)) / (n2 - n1)


def chain(step):
    def run(k):
        acc = jnp.zeros((), jnp.float32)
        for _ in range(k):
            acc = step(acc)
        float(acc)
    return run


def probe_takes():
    rng = np.random.default_rng(0)
    E = 1_500_000
    d = 128
    take_f = jax.jit(lambda x, i: jnp.take(x, i, axis=0))
    print(f"take of {E} rows from [N,{d}] f32 table:", flush=True)
    for n in (16_384, 32_768, 40_448, 49_152, 65_536, 98_304, 131_072,
              262_144, 456_704):
        x = jnp.asarray(rng.standard_normal((n, d)).astype(np.float32))
        idx = jnp.asarray(rng.integers(0, n, E).astype(np.int32))

        def step(acc, x=x, idx=idx):
            o = take_f(x, idx)
            return acc + o[::4096].sum()

        s = slope(chain(step))
        print(f"  N={n:8d}  {s*1e3:7.2f} ms  {s/E*1e9:6.2f} ns/row",
              flush=True)


def grad_parity_real_rows():
    from kgwas_tpu.config import ModelConfig
    from kgwas_tpu.graph import compile_graph, make_synthetic_kg
    from kgwas_tpu.graph.merged_layout import get_chunked_stream
    from kgwas_tpu.models import init_hetero_gnn
    from kgwas_tpu.ops.pallas_gat_layer import (fused_gat_layer,
                                                fused_gat_layer_chunked)
    from kgwas_tpu.ops.pallas_segment import (gather_rows_chunked,
                                              gather_rows_csc)

    g = make_synthetic_kg(n_snp=50_000, n_gene=8_000, n_go=4_000,
                          snp_dim=20, gene_dim=128, go_dim=128,
                          avg_degree=6, seed=0)
    from kgwas_tpu.ops.pallas_segment import BN as _TILE_BN

    cg = compile_graph(g, edge_pad_multiple=8192,
                       node_pad_multiple=max(256, _TILE_BN))
    cfg = ModelConfig(gnn_hidden_dim=128, gnn_num_layers=2,
                      matmul_precision="highest", use_pallas=True)
    meta = cg.meta()
    _ = init_hetero_gnn(jax.random.PRNGKey(0), cfg, meta, 20, 128, 128)
    rng = np.random.default_rng(0)
    d = 128
    L = meta["merged"]["Gene"]
    cs = get_chunked_stream(L, 16384)
    bounds = [int(b) for b in cs.src_bounds]
    xs_all = jnp.asarray(
        rng.standard_normal((L.n_src_total, d)).astype(np.float32))
    att = jnp.asarray(
        rng.standard_normal((len(L.rel_keys), d)).astype(np.float32))
    adst = jnp.asarray(
        rng.standard_normal(L.n_rows_total).astype(np.float32))
    # cotangent nonzero ONLY on real dst rows of each relation slot
    gm = np.zeros((L.n_rows_total, d), np.float32)
    n_real_dst = cg.num_nodes[L.dst_type]
    for r in range(len(L.rel_keys)):
        base = r * L.n_rows_per_rel
        gm[base:base + n_real_dst] = rng.standard_normal(
            (n_real_dst, d)).astype(np.float32)
    gmask = jnp.asarray(gm)

    def plain_fwd(x):
        msgs = gather_rows_csc(x, jnp.asarray(L.src), L.csc_perm,
                               L.csc_ids, L.csc_offsets, L.n_src_total,
                               False)
        return fused_gat_layer(msgs, att, adst, L.dst, L.row_offsets,
                               L.tile2rel, L.n_rows_total, 0.2, 1.0, False)

    def ch_fwd(x):
        tabs = tuple(x[bounds[c]:bounds[c + 1]] for c in range(cs.n_chunks))
        msgs = gather_rows_chunked(tabs, tuple(cs.local_ids),
                                   tuple(cs.local_perm),
                                   tuple(int(b) for b in cs.chunk_edge_base),
                                   L.csc_ids, L.csc_offsets,
                                   L.n_src_total, False)
        return fused_gat_layer_chunked(
            msgs, att, adst, cs.dst, cs.desc, cs.desc_offsets, L.tile2rel,
            L.n_rows_total, 0.2, 1.0, False)

    g_p = jax.jit(jax.grad(lambda x: jnp.vdot(plain_fwd(x), gmask)))
    g_c = jax.jit(jax.grad(lambda x: jnp.vdot(ch_fwd(x), gmask)))
    dp = np.asarray(g_p(xs_all))
    dc = np.asarray(g_c(xs_all))
    # real src rows: per relation slot, the first num_nodes[src_type] rows
    # of its block in the concat space
    real = np.zeros(L.n_src_total, bool)
    for r, st in enumerate(L.src_types):
        b = int(L.src_base[r])
        real[b:b + cg.num_nodes[st]] = True
    diff_real = np.abs(dp - dc)[real].max()
    diff_all = np.abs(dp - dc).max()
    denom = np.abs(dp[real]).max()
    print(f"grad diff: real rows {diff_real:.3e} (rel "
          f"{diff_real/denom:.3e}), all rows {diff_all:.3e}", flush=True)

    # forward parity on real dst rows
    op = np.asarray(jax.jit(plain_fwd)(xs_all))
    oc = np.asarray(jax.jit(ch_fwd)(xs_all))
    realr = np.zeros(L.n_rows_total, bool)
    for r in range(len(L.rel_keys)):
        base = r * L.n_rows_per_rel
        realr[base:base + n_real_dst] = True
    print(f"fwd diff: real rows {np.abs(op-oc)[realr].max():.3e}, "
          f"all rows {np.abs(op-oc).max():.3e}", flush=True)


def main():
    print("backend:", jax.default_backend(), jax.devices(), flush=True)
    probe_takes()
    grad_parity_real_rows()


if __name__ == "__main__":
    main()
