"""Per-window fixed-cost probe for the fused GAT kernels (VERDICT r3 item 5).

The BE/NBUF sweeps priced windows only indirectly (and the dyn128 FLOP
audit mispredicted by 6x), so this measures the per-window cost DIRECTLY:
single-relation graphs with FIXED edge count and swept dst-node count.
Each BN-row dst tile walks ceil(tile_edges/BE) windows of BE rows (one
[BE, D] DMA + mask/dot work per window), so at fixed E the window count
grows ~linearly with tile count while real rows stay constant — the slope
of step time vs window count IS the marginal window cost (DMA of one
BE-row window + scalar/control overhead). Compared against the measured
contiguous-copy bound (418 GB/s, scripts/exp_rowdma_scatter.py: BE x D x
4B = 0.61 us/window), the excess is the kernel's fixed per-window
overhead — the number the fragment-padding lever (read_amp 1.228 at
BE=512/BN=256) multiplies.

Run: python scripts/exp_window_cost.py   (TPU, ~5 min)
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from kgwas_tpu.graph import compile_graph
from kgwas_tpu.graph.schema import HeteroGraph
from kgwas_tpu.graph.merged_layout import build_merged_layouts
from kgwas_tpu.ops.pallas_gat_layer import fused_gat_layer
from kgwas_tpu.ops.pallas_segment import BN, BE, LANE

D = 128
E_TOTAL = 4_194_304
N_SRC = 16_384


def build(n_dst, rng):
    g = HeteroGraph()
    g.node_features["Gene"] = rng.random((N_SRC, D), dtype=np.float32)
    g.node_features["SNP"] = rng.random((n_dst, D), dtype=np.float32)
    src = rng.integers(0, N_SRC, E_TOTAL)
    dst = rng.integers(0, n_dst, E_TOTAL)
    g.edge_index[("Gene", "probe", "SNP")] = np.stack([src, dst]).astype(
        np.int64)
    cg = compile_graph(g, edge_pad_multiple=8192, node_pad_multiple=BN)
    L = build_merged_layouts(cg)["SNP"]
    return cg, L


def window_count(L):
    """Mirror of the kernel's per-tile chunk walk."""
    ro = np.asarray(L.row_offsets).astype(np.int64)
    n_tiles = L.n_rows_total // BN
    wins = 0
    empties = 0
    for i in range(n_tiles):
        start = ro[i * BN]
        end = ro[min((i + 1) * BN, len(ro) - 1)]
        if end <= start:
            empties += 1
            continue
        start_al = (start // LANE) * LANE
        wins += int(-(-(end - start_al) // BE))
    return wins, empties


def main():
    print(f"backend={jax.default_backend()} BN={BN} BE={BE} "
          f"E={E_TOTAL:,} n_src={N_SRC:,}", flush=True)
    rng = np.random.default_rng(0)
    rows = []
    for n_dst in (8_192, 32_768, 131_072, 524_288):
        cg, L = build(n_dst, rng)
        wins, empties = window_count(L)
        xs_all = jnp.asarray(
            rng.standard_normal((L.n_src_total, D)).astype(np.float32) * .1)
        att = jnp.asarray(
            rng.standard_normal((1, D)).astype(np.float32) * .1)
        a_dst_all = jnp.asarray(
            rng.standard_normal(L.n_rows_total).astype(np.float32) * .1)
        msgs = jnp.take(xs_all, jnp.asarray(L.src), axis=0)
        msgs = jax.block_until_ready(msgs)

        def fwd(m, a, ad):
            return fused_gat_layer(
                m, a, ad, L.dst, L.row_offsets, L.tile2rel,
                L.n_rows_total, 0.2, 1.0, False).sum()

        fj = jax.jit(fwd)
        gj = jax.jit(jax.grad(fwd, argnums=(0, 2)))
        _ = float(fj(msgs, att, a_dst_all))  # compile
        _ = jax.block_until_ready(gj(msgs, att, a_dst_all))

        def t_n(f, n):
            t0 = time.perf_counter()
            o = None
            for _ in range(n):
                o = f(msgs, att, a_dst_all)
            jax.tree_util.tree_map(
                lambda x: np.asarray(x.ravel()[0]), o)
            return time.perf_counter() - t0

        n1, n2 = 4, 16
        tf = (t_n(fj, n2) - t_n(fj, n1)) / (n2 - n1)
        tb = (t_n(gj, n2) - t_n(gj, n1)) / (n2 - n1)
        rows.append((n_dst, L.n_rows_total // BN, wins, empties, tf, tb))
        print(f"n_dst={n_dst:>7,} tiles={rows[-1][1]:>5} windows={wins:>6} "
              f"(empty tiles {empties}) fwd={tf*1e3:7.2f} ms "
              f"fwd+bwd={tb*1e3:7.2f} ms", flush=True)

    w = np.array([r[2] for r in rows], dtype=np.float64)
    tf = np.array([r[4] for r in rows])
    tb = np.array([r[5] for r in rows])
    sf = np.polyfit(w, tf, 1)
    sb = np.polyfit(w, tb, 1)
    dma_us = BE * D * 4 / 418e9 * 1e6
    print(f"\nfwd slope: {sf[0]*1e6:.3f} us/window "
          f"(DMA bound {dma_us:.3f} us => fixed overhead "
          f"{sf[0]*1e6-dma_us:.3f} us/window); intercept {sf[1]*1e3:.2f} ms")
    print(f"fwd+bwd slope: {sb[0]*1e6:.3f} us/window; "
          f"intercept {sb[1]*1e3:.2f} ms")
    amp = 1.228
    bench_rows = 6.9e6
    extra_wins = bench_rows * (amp - 1.0) / BE
    print(f"lever value: read_amp {amp} -> 1.0 at bench scale removes "
          f"~{extra_wins:,.0f} windows/step = "
          f"{extra_wins * sb[0] * 1e3:.2f} ms/step (fwd+bwd slope)")


if __name__ == "__main__":
    main()
