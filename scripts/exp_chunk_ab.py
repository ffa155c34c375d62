"""Chunked-gather A/B at bench scale on the real TPU (round 2).

bench.py with the default 16384-row chunking measured ~168.5 ms/step vs
round 1's ~161.7 ms/step plain — the microbench's 2.6x take win
(scripts/exp_gather.py --chunked) did not survive composition. This script
pins down where it went, in ONE TPU process (axon claims are expensive):

  phase 1: composed train step, gather_chunk_rows in {0, 16384, 8192}
  phase 2: per merged dst-type group, isolated slope timings of
           - plain big-table take           (jnp.take, concat src space)
           - chunked takes                  (gather_rows_chunked, real layout)
           - plain fused kernel             (fused_gat_layer)
           - chunked fused kernel           (fused_gat_layer_chunked)
           plus the layout's read_amp / n_chunks / descriptor counts.

Run: python scripts/exp_chunk_ab.py  (TPU, ~15 min with compiles)
"""
import os
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
from kgwas_tpu.ops.pallas_segment import gather_rows_chunked


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
    print(f"{name:28s} {secs*1e3:8.2f} ms  {rows/secs/1e6:8.1f} Mrow/s  "
          f"{secs/rows*1e9:6.2f} ns/row", flush=True)


def phase1():
    from kgwas_tpu import bench_lib
    for chunk in ("0", "16384", "8192"):
        os.environ["BENCH_GATHER_CHUNK"] = chunk
        os.environ["BENCH_STEPS"] = "16"
        print(f"--- composed train step, gather_chunk_rows={chunk}",
              flush=True)
        bench_lib.main()


def phase2():
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

    for dst_t, L in meta["merged"].items():
        e = len(L.src)
        for chunk_rows in (16384, 8192):
            cs = get_chunked_stream(L, chunk_rows)
            nd = int(np.sum(np.asarray(cs.desc) >= 0)) if hasattr(cs, "desc") else -1
            print(f"-- {dst_t}: E={e} n_src={L.n_src_total} "
                  f"chunk={chunk_rows} n_chunks={cs.n_chunks} "
                  f"windows={len(cs.desc)} nonempty={nd} "
                  f"read_amp={cs.read_amp:.3f}", flush=True)
        cs = get_chunked_stream(L, 16384)

        xs_all = jnp.asarray(
            rng.standard_normal((L.n_src_total, d)).astype(np.float32))
        src = jnp.asarray(L.src)
        att = jnp.asarray(
            rng.standard_normal((len(L.rel_keys), d)).astype(np.float32))
        adst = jnp.asarray(
            rng.standard_normal(L.n_rows_total).astype(np.float32))

        take_f = jax.jit(lambda x, i: jnp.take(x, i, axis=0))
        msgs_plain = take_f(xs_all, src)

        def plain_take_step(acc):
            o = take_f(xs_all, src)
            return acc + o[::4096].sum()
        report("plain_take", slope(chain(plain_take_step)), e)

        tabs = tuple(
            xs_all[int(cs.src_bounds[c]):int(cs.src_bounds[c + 1])]
            for c in range(cs.n_chunks))
        ch_take = jax.jit(lambda ts: gather_rows_chunked(
            ts, tuple(cs.local_ids), tuple(cs.local_perm),
            tuple(int(b) for b in cs.chunk_edge_base),
            L.csc_ids, L.csc_offsets, L.n_src_total, False))
        msgs_ch = ch_take(tabs)

        def ch_take_step(acc):
            o = ch_take(tabs)
            return acc + o[::4096].sum()
        report("chunked_take", slope(chain(ch_take_step)), e)

        layer_f = jax.jit(lambda m, a, ad: fused_gat_layer(
            m, a, ad, L.dst, L.row_offsets, L.tile2rel, L.n_rows_total,
            0.2, 1.0, False))

        def plain_kernel_step(acc):
            o = layer_f(msgs_plain, att, adst)
            return acc + o[::4096].sum()
        report("plain_kernel", slope(chain(plain_kernel_step)), e)

        layer_ch = jax.jit(lambda m, a, ad: fused_gat_layer_chunked(
            m, a, ad, cs.dst, cs.desc, cs.desc_offsets, L.tile2rel,
            L.n_rows_total, 0.2, 1.0, False))

        def ch_kernel_step(acc):
            o = layer_ch(msgs_ch, att, adst)
            return acc + o[::4096].sum()
        report("chunked_kernel", slope(chain(ch_kernel_step)), e)

        out_p = layer_f(msgs_plain, att, adst)
        out_c = layer_ch(msgs_ch, att, adst)
        diff = float(jnp.max(jnp.abs(out_p - out_c)))
        print(f"   kernel parity |plain-chunked| = {diff:.3e}", flush=True)


def main():
    print("backend:", jax.default_backend(), jax.devices(), flush=True)
    phase2()
    phase1()


if __name__ == "__main__":
    main()
