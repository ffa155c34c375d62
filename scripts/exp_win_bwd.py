"""Why did the fragment-windowed SNP backward regress? (round 2)

bench A/B: default-with-windows 145.3 ms/step vs windows-off 139.2 —
the windowed backward LOST ~6 ms despite the emitter math predicting a
win. Hypotheses:
  (H1) per-chunk takes read from SLICES of the big cotangent; XLA fuses
       the slice into the gather so the operand is still the big buffer
       and the slow emitter is used (the forward's chunk tables are
       materialized matmul outputs, which is why chunking won there).
  (H2) the windowed segment-sum kernel is slower than the contiguous one.

Measures, on the real SNP layout at bench scale:
  take_big          jnp.take(g, csc_perm)              (baseline)
  take_sliced       concat of per-chunk takes on g slices (as shipped)
  take_barrier      same, optimization_barrier on each slice
  segsum_contig     pallas_segment_sum on CSC stream
  segsum_windows    segment_sum_windows on grouped stream
  grad_plain        grad of take+fused_gat_layer (plain backward)
  grad_windowed     grad with gather_rows_csc_win

Run: python scripts/exp_win_bwd.py  (TPU)
"""
import time

import numpy as np

import jax
import jax.numpy as jnp

from kgwas_tpu.config import ModelConfig
from kgwas_tpu.ops.pallas_segment import BN as _TILE_BN

_NODE_PAD = max(256, _TILE_BN)  # follow the shipped tile default (BN=512)

from kgwas_tpu.graph import compile_graph, make_synthetic_kg
from kgwas_tpu.graph.merged_layout import build_csc_windows
from kgwas_tpu.models import init_hetero_gnn
from kgwas_tpu.ops.pallas_gat_layer import fused_gat_layer
from kgwas_tpu.ops.pallas_segment import (gather_rows_csc,
                                          gather_rows_csc_win,
                                          pallas_segment_sum,
                                          segment_sum_windows)


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
    print(f"{name:28s} {secs*1e3:8.2f} ms  {secs/rows*1e9:6.2f} ns/row",
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
    L = meta["merged"]["SNP"]
    wl = build_csc_windows(L)
    e = len(L.src)
    print(f"SNP: E={e} n_src={L.n_src_total} chunks={wl.n_chunks} "
          f"windows={len(wl.desc)} read_amp={wl.read_amp:.3f}", flush=True)

    gvals = jnp.asarray(rng.standard_normal((e, d)).astype(np.float32))
    eb = [int(b) for b in wl.edge_bounds]

    take_big = jax.jit(lambda g_: jnp.take(g_, jnp.asarray(L.csc_perm),
                                           axis=0))

    def sliced(g_):
        return jnp.concatenate([
            jnp.take(g_[eb[c]:eb[c + 1]], jnp.asarray(wl.local_perm[c]),
                     axis=0)
            for c in range(wl.n_chunks)], axis=0)

    def barrier(g_):
        return jnp.concatenate([
            jnp.take(jax.lax.optimization_barrier(g_[eb[c]:eb[c + 1]]),
                     jnp.asarray(wl.local_perm[c]), axis=0)
            for c in range(wl.n_chunks)], axis=0)

    take_sliced = jax.jit(sliced)
    take_barrier = jax.jit(barrier)

    for name, f in [("take_big", take_big), ("take_sliced", take_sliced),
                    ("take_barrier", take_barrier)]:
        def step(acc, f=f):
            o = f(gvals)
            return acc + o[::4096].sum()
        report(name, slope(chain(step)), e)

    gs = take_big(gvals)
    seg_c = jax.jit(lambda v: pallas_segment_sum(
        v, jnp.asarray(L.csc_ids), jnp.asarray(L.csc_offsets),
        L.n_src_total, False))
    gw = take_sliced(gvals)
    seg_w = jax.jit(lambda v: segment_sum_windows(
        v, jnp.asarray(wl.ids), jnp.asarray(wl.desc),
        jnp.asarray(wl.desc_offsets), L.n_src_total, False))

    def step_c(acc):
        return acc + seg_c(gs)[::4096].sum()
    report("segsum_contig", slope(chain(step_c)), e)

    def step_w(acc):
        return acc + seg_w(gw)[::4096].sum()
    report("segsum_windows", slope(chain(step_w)), e)
    dc = np.asarray(seg_c(gs))
    dw = np.asarray(seg_w(gw))
    print(f"   segsum parity {np.abs(dc-dw).max():.3e}", flush=True)

    # full gather+layer grad, plain vs windowed backward
    xs_all = jnp.asarray(
        rng.standard_normal((L.n_src_total, d)).astype(np.float32))
    att = jnp.asarray(
        rng.standard_normal((len(L.rel_keys), d)).astype(np.float32))
    adst = jnp.asarray(
        rng.standard_normal(L.n_rows_total).astype(np.float32))
    gmask = jnp.asarray(
        rng.standard_normal((L.n_rows_total, d)).astype(np.float32))

    def plain_fwd(x):
        msgs = gather_rows_csc(x, jnp.asarray(L.src), L.csc_perm,
                               L.csc_ids, L.csc_offsets, L.n_src_total,
                               False)
        return fused_gat_layer(msgs, att, adst, L.dst, L.row_offsets,
                               L.tile2rel, L.n_rows_total, 0.2, 1.0, False)

    def win_fwd(x):
        msgs = gather_rows_csc_win(
            x, jnp.asarray(L.src), tuple(eb), tuple(wl.local_perm),
            wl.ids, wl.desc, wl.desc_offsets, L.n_src_total, False)
        return fused_gat_layer(msgs, att, adst, L.dst, L.row_offsets,
                               L.tile2rel, L.n_rows_total, 0.2, 1.0, False)

    g_p = jax.jit(jax.grad(lambda x: jnp.vdot(plain_fwd(x), gmask)))
    g_w = jax.jit(jax.grad(lambda x: jnp.vdot(win_fwd(x), gmask)))

    def s_gp(acc):
        return acc + g_p(xs_all)[::4096].sum()
    report("grad_plain", slope(chain(s_gp)), e)

    def s_gw(acc):
        return acc + g_w(xs_all)[::4096].sum()
    report("grad_windowed", slope(chain(s_gw)), e)


if __name__ == "__main__":
    main()
