"""dyn128 A/B: fit fractions + isolated chunked-kernel timings at bench
scale. Run on TPU: python scripts/exp_dyn128.py [n_snp]"""
import sys, time
import numpy as np
import jax, jax.numpy as jnp

from kgwas_tpu.graph import compile_graph, make_synthetic_kg
from kgwas_tpu.ops.pallas_segment import BN as _TILE_BN

_NODE_PAD = max(256, _TILE_BN)  # follow the shipped tile default (BN=512)

from kgwas_tpu.graph.merged_layout import (get_chunked_stream,
                                           get_owned_plain_stream,
                                           EMITTER_FAST_ROWS)
from kgwas_tpu.ops.pallas_gat_layer import (
    _desc_base_np, _merged_forward_chunked, _merged_backward_chunked_split,
    _nonempty_desc, _prep_adst_tiles, _prep_att8)

n_snp = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
g = make_synthetic_kg(n_snp=n_snp, n_gene=n_snp // 10, n_go=max(n_snp // 17, 100),
                      snp_dim=20, gene_dim=128, go_dim=128, avg_degree=6, seed=0)
cg = compile_graph(g, edge_pad_multiple=8192, node_pad_multiple=_NODE_PAD)
interp = jax.default_backend() != "tpu"
rng = np.random.default_rng(0)

for dst_t, L in cg.merged_layouts().items():
    if L.n_src_total > EMITTER_FAST_ROWS:
        cs = get_chunked_stream(L, EMITTER_FAST_ROWS, pad_fragments=True)
        lay, tag = cs, "chunked"
        dst, desc, doff = cs.dst, cs.desc, cs.desc_offsets
        split_bases = tuple(int(b) for b in cs.chunk_edge_base)
    elif len(L.src) > EMITTER_FAST_ROWS:
        lay = get_owned_plain_stream(L)
        tag = "owned-plain"
        dst, desc, doff = lay.dst, lay.desc, lay.desc_offsets
        split_bases = tuple(int(b) for b in lay.cut_bases)
    else:
        print(f"{dst_t}: small group, skipped"); continue
    db = _desc_base_np(desc, doff, dst, L.n_rows_total)
    fit = float((db >= 0).mean())
    print(f"{dst_t} [{tag}]: windows={len(desc)} fit128={fit:.3f} "
          f"E={len(dst)} rows={L.n_rows_total}")

    d = 128
    msgs = jnp.asarray(rng.normal(size=(len(dst), d)).astype(np.float32))
    att = jnp.asarray(rng.normal(size=(len(L.rel_keys), d)).astype(np.float32))
    a_dst = jnp.asarray(rng.normal(size=(L.n_rows_total,)).astype(np.float32))
    gct = jnp.asarray(rng.normal(size=(L.n_rows_total, d)).astype(np.float32))
    att8, adst_tiles = _prep_att8(att), _prep_adst_tiles(a_dst, L.n_rows_total)
    args = (msgs, att8, adst_tiles, jnp.asarray(dst), jnp.asarray(doff),
            jnp.asarray(_nonempty_desc(desc)), jnp.asarray(db),
            jnp.asarray(L.tile2rel))
    kw = dict(n_rows=L.n_rows_total, negative_slope=0.2, temperature=1.0,
              interpret=interp)

    def slope(fn, n1=5, n2=25):
        # chained launches ended by ONE host sync (float()); the n2-n1
        # difference cancels relay dispatch latency (axon: block_until_ready
        # can return before execution — see benchmarks/RESULTS.md)
        def run_n(n):
            t0 = time.perf_counter()
            x = None
            for _ in range(n):
                x = fn(x)
            _ = float(x[0, 0])
            return time.perf_counter() - t0
        run_n(1)  # compile
        t1, t2 = run_n(n1), run_n(n2)
        return (t2 - t1) / (n2 - n1) * 1e3

    for dyn in (False, True):
        def fwd_fn(prev, dyn=dyn):
            a8 = att8 if prev is None else att8 + 0.0 * prev[0, 0]
            out, rmax, rsum = _merged_forward_chunked(
                msgs, a8, *args[2:], dyn128=dyn, pre_padded=True, **kw)
            return out
        fwd_ms = slope(fwd_fn)

        out, rmax, rsum = _merged_forward_chunked(
            *args, dyn128=dyn, pre_padded=True, **kw)

        def bwd_fn(prev, dyn=dyn, out=out, rmax=rmax, rsum=rsum):
            a8 = att8 if prev is None else att8 + 0.0 * prev[0, 0]
            bargs = (msgs, a8) + args[2:] + (rmax, rsum, out, gct)
            res = _merged_backward_chunked_split(
                *bargs, split_bases=split_bases, dyn128=dyn, **kw)
            return res[-1]
        bwd_ms = slope(bwd_fn)
        print(f"  dyn128={int(dyn)}: fwd {fwd_ms:7.2f} ms  bwd {bwd_ms:7.2f} ms",
              flush=True)
