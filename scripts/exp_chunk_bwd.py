"""Where did the chunked-gather forward win go? Backward decomposition.

exp_chunk_ab.py showed (Gene group, 200k-SNP bench graph): chunked take
4.45 ms vs plain 20.63 ms, chunked kernel 9.27 ms vs plain 7.10 ms — a
~14 ms/layer forward win — yet the composed train step REGRESSED
(168.3 vs 161.8 ms/step). This times the fwd+bwd of the full
(project + gather + fused layer) pipeline per strategy on the Gene group,
plus a chunk-size sweep, to find the backward cost.

Run: python scripts/exp_chunk_bwd.py  (TPU)
"""
import time

import numpy as np

import jax
import jax.numpy as jnp

from kgwas_tpu.config import ModelConfig
from kgwas_tpu.ops.pallas_segment import BN as _TILE_BN

_NODE_PAD = max(256, _TILE_BN)  # follow the shipped tile default (BN=512)

from kgwas_tpu.graph import compile_graph, make_synthetic_kg
from kgwas_tpu.graph.merged_layout import get_chunked_stream
from kgwas_tpu.models import init_hetero_gnn
from kgwas_tpu.ops.pallas_gat_layer import (fused_gat_layer,
                                            fused_gat_layer_chunked)
from kgwas_tpu.ops.pallas_segment import (gather_rows_chunked,
                                          gather_rows_csc)


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


def report(name, secs, rows):
    print(f"{name:34s} {secs*1e3:8.2f} ms  {secs/rows*1e9:6.2f} ns/row",
          flush=True)


def main():
    print("backend:", jax.default_backend(), jax.devices(), flush=True)
    g = make_synthetic_kg(n_snp=200_000, n_gene=20_000, n_go=12_000,
                          snp_dim=20, gene_dim=128, go_dim=128,
                          avg_degree=6, seed=0)
    cg = compile_graph(g, edge_pad_multiple=8192, node_pad_multiple=_NODE_PAD)
    cfg = ModelConfig(gnn_hidden_dim=128, gnn_num_layers=2,
                      matmul_precision="highest", use_pallas=True)
    meta = cg.meta()
    _ = init_hetero_gnn(jax.random.PRNGKey(0), cfg, meta, 20, 128, 128)
    rng = np.random.default_rng(0)
    d = 128

    L = meta["merged"]["Gene"]
    e = len(L.src)
    xs_all = jnp.asarray(
        rng.standard_normal((L.n_src_total, d)).astype(np.float32))
    att = jnp.asarray(
        rng.standard_normal((len(L.rel_keys), d)).astype(np.float32))
    adst = jnp.asarray(
        rng.standard_normal(L.n_rows_total).astype(np.float32))
    gmask = jnp.asarray(
        rng.standard_normal((L.n_rows_total, d)).astype(np.float32))

    # ---- plain: big take + plain kernel, fwd and fwd+bwd
    def plain_fwd(x):
        msgs = gather_rows_csc(x, jnp.asarray(L.src), L.csc_perm,
                               L.csc_ids, L.csc_offsets, L.n_src_total,
                               False)
        return fused_gat_layer(msgs, att, adst, L.dst, L.row_offsets,
                               L.tile2rel, L.n_rows_total, 0.2, 1.0, False)

    f_p = jax.jit(plain_fwd)
    g_p = jax.jit(jax.grad(lambda x: jnp.vdot(plain_fwd(x), gmask)))

    def s_fp(acc):
        return acc + f_p(xs_all)[::4096].sum()
    report("plain fwd(take+kernel)", slope(chain(s_fp)), e)

    def s_gp(acc):
        return acc + g_p(xs_all)[::4096].sum()
    report("plain fwd+bwd", slope(chain(s_gp)), e)

    # ---- chunked at several chunk sizes
    for chunk_rows in (16384, 32768, 65536):
        cs = get_chunked_stream(L, chunk_rows)
        print(f"   [chunk={chunk_rows}] n_chunks={cs.n_chunks} "
              f"windows={len(cs.desc)} read_amp={cs.read_amp:.3f}",
              flush=True)
        bounds = [int(b) for b in cs.src_bounds]

        def ch_fwd(x, cs=cs, bounds=bounds):
            tabs = tuple(x[bounds[c]:bounds[c + 1]]
                         for c in range(cs.n_chunks))
            msgs = gather_rows_chunked(tabs, tuple(cs.local_ids),
                                       tuple(cs.local_perm),
                                       tuple(int(b)
                                             for b in cs.chunk_edge_base),
                                       L.csc_ids, L.csc_offsets,
                                       L.n_src_total, False)
            return fused_gat_layer_chunked(
                msgs, att, adst, cs.dst, cs.desc, cs.desc_offsets,
                L.tile2rel, L.n_rows_total, 0.2, 1.0, False)

        f_c = jax.jit(ch_fwd)
        g_c = jax.jit(jax.grad(lambda x: jnp.vdot(ch_fwd(x), gmask)))

        def s_fc(acc):
            return acc + f_c(xs_all)[::4096].sum()
        report(f"chunk{chunk_rows} fwd(take+kernel)", slope(chain(s_fc)), e)

        def s_gc(acc):
            return acc + g_c(xs_all)[::4096].sum()
        report(f"chunk{chunk_rows} fwd+bwd", slope(chain(s_gc)), e)

        dp = g_p(xs_all)
        dc = g_c(xs_all)
        print(f"   grad parity |plain-chunked| = "
              f"{float(jnp.max(jnp.abs(dp - dc))):.3e}", flush=True)


if __name__ == "__main__":
    main()
