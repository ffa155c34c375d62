"""Step-decomposition measurement at bench scale on the real TPU (round 2).

Round 1 established the merged path end-to-end number (bench.py: ~161.7
ms/step at 200k SNP / 3.36M edges, 2 layers) and that the per-edge cost is
gather-bound. This script times every piece of that step in isolation with
slope timing so round-2 kernel work attacks the actual largest term:

  per merged dst-type layout:
    fwd_take      jnp.take(xs_all, L.src)         (forward row gather)
    fwd_kernel    fused_gat_layer forward
    bwd_kernel    fused_gat_layer VJP (layer backward, incl. fwd residuals)
    perm_take     jnp.take(g, csc_perm)           (backward reorder gather)
    csc_segsum    pallas_segment_sum over CSC     (backward dx reduce)
  whole model:
    fwd_model     apply_hetero_gnn forward
    train_step    full optimizer step (the bench.py number)
  micro:
    onehot_win    windowed one-hot MXU gather over the real CSC stream
                  (prototype of a fused sorted-gather kernel)

Run: python scripts/exp_decomp.py  (TPU; ~10 min with compiles)
"""
import functools
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from kgwas_tpu.config import ModelConfig
from kgwas_tpu.ops.pallas_segment import BN as _TILE_BN

_NODE_PAD = max(256, _TILE_BN)  # follow the shipped tile default (BN=512)

from kgwas_tpu.engine.loop import build_optimizer, make_train_step
from kgwas_tpu.graph import compile_graph, make_synthetic_kg
from kgwas_tpu.models import init_hetero_gnn
from kgwas_tpu.models.hetero_gnn import apply_hetero_gnn
from kgwas_tpu.ops.pallas_gat_layer import fused_gat_layer
from kgwas_tpu.ops.pallas_segment import pallas_segment_sum


def slope(fn, n1=3, n2=10):
    fn(2)
    t0 = time.perf_counter(); fn(n1); t1 = time.perf_counter()
    fn(n2); t2 = time.perf_counter()
    return ((t2 - t1) - (t1 - t0)) / (n2 - n1)


def chain(step):
    """Build fn(k): run k chained iterations ending in one host sync."""
    def run(k):
        acc = jnp.zeros((), jnp.float32)
        for _ in range(k):
            acc = step(acc)
        float(acc)
    return run


def report(name, secs, rows, bytes_per_row=512):
    print(f"{name:28s} {secs*1e3:8.2f} ms  {rows/secs/1e6:8.1f} Mrow/s  "
          f"{secs/rows*1e9:6.2f} ns/row  {rows*bytes_per_row/secs/1e9:6.1f} GB/s",
          flush=True)


# ---------------------------------------------------------------------------
# windowed one-hot gather prototype: ids ascending, per-chunk table window
# ---------------------------------------------------------------------------

def make_window_gather(n_rows, e_pad, d, be, w, dtype):
    """out[i] = x[ids[i]] for ascending ids; chunk c reads x[ws[c]:ws[c]+w]."""
    def kernel(ws_ref, x_ref, ids_ref, out_ref, xwin, sems):
        c = pl.program_id(0)
        ws = ws_ref[c]
        pltpu.make_async_copy(
            x_ref.at[pl.ds(ws, w), :], xwin.at[0], sems.at[0]
        ).start()
        ids = ids_ref[...]                              # [BE] int32 in VMEM
        loc = ids - ws                                  # in [0, w)
        onehot = (loc[:, None] == jax.lax.broadcasted_iota(
            jnp.int32, (be, w), 1)).astype(dtype)
        pltpu.make_async_copy(
            x_ref.at[pl.ds(ws, w), :], xwin.at[0], sems.at[0]
        ).wait()
        out_ref[...] = jax.lax.dot(
            onehot, xwin[0], preferred_element_type=jnp.float32
        ).astype(out_ref.dtype)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(e_pad // be,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((be,), lambda c, ws: (c,),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((be, d), lambda c, ws: (c, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((1, w, d), dtype),
            pltpu.SemaphoreType.DMA((1,)),
        ],
    )
    return pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((e_pad, d), dtype),
    )


def bench_window_gather(xs_all, csc_ids, name, be=512, dtype=jnp.float32):
    ids = np.asarray(csc_ids)
    e = len(ids)
    e_pad = ((e + be - 1) // be) * be
    ids_p = np.pad(ids, (0, e_pad - e), mode="edge")
    # per-chunk window starts (8-aligned); W covers max spread
    starts = (ids_p[::be] // 8) * 8
    spread = ids_p.reshape(-1, be).max(1) - starts
    w = int(((spread.max() + 8 + 127) // 128) * 128)
    n_rows = xs_all.shape[0]
    w = min(w, n_rows)
    print(f"  [{name}] max window spread={int(spread.max())} -> W={w}")
    if w > 4096:
        print(f"  [{name}] window too large; skipping")
        return
    starts = np.minimum(starts, n_rows - w).astype(np.int32)
    x = xs_all.astype(dtype)
    ids_2d = jnp.asarray(ids_p, jnp.int32)
    ws = jnp.asarray(starts)
    f = make_window_gather(n_rows, e_pad, x.shape[1], be, w, dtype)
    fj = jax.jit(lambda x_, ids_, ws_: f(ws_, x_, ids_))
    out = fj(x, ids_2d, ws)
    ref = np.asarray(x)[ids_p[:256]]
    np.testing.assert_allclose(np.asarray(out[:256]), ref, rtol=1e-5,
                               atol=1e-5)

    def step(acc):
        o = fj(x, ids_2d, ws)
        return acc + o[::4096].sum().astype(jnp.float32)

    report(f"onehot_win {name}", slope(chain(step)), e,
           bytes_per_row=x.shape[1] * x.dtype.itemsize)


def main():
    print("backend:", jax.default_backend(), jax.devices(), flush=True)
    g = make_synthetic_kg(n_snp=200_000, n_gene=20_000, n_go=12_000,
                          snp_dim=20, gene_dim=128, go_dim=128,
                          avg_degree=6, seed=0)
    cg = compile_graph(g, edge_pad_multiple=8192, node_pad_multiple=_NODE_PAD)
    cfg = ModelConfig(gnn_hidden_dim=128, gnn_num_layers=2,
                      matmul_precision="highest", use_pallas=True)
    meta = cg.meta()
    params = init_hetero_gnn(jax.random.PRNGKey(0), cfg, meta, 20, 128, 128)
    arrays = jax.device_put(cg.arrays())
    rng = np.random.default_rng(0)

    print("== per merged dst-type layout ==", flush=True)
    d = 128
    for dst_t, L in meta["merged"].items():
        e = len(L.src)
        nsrc = L.n_src_total
        print(f"-- {dst_t}: E={e} n_src_total={nsrc} n_rows={L.n_rows_total}",
              flush=True)
        xs_all = jnp.asarray(
            rng.standard_normal((nsrc, d)).astype(np.float32))
        src = jnp.asarray(L.src)
        perm = jnp.asarray(L.csc_perm)
        csc_ids = jnp.asarray(L.csc_ids)
        csc_off = jnp.asarray(L.csc_offsets)
        att = jnp.asarray(
            rng.standard_normal((len(L.rel_keys), d)).astype(np.float32))
        adst = jnp.asarray(
            rng.standard_normal(L.n_rows_total).astype(np.float32))

        take_f = jax.jit(lambda x, i: jnp.take(x, i, axis=0))
        msgs = take_f(xs_all, src)

        def fwd_take_step(acc):
            o = take_f(xs_all, src)
            return acc + o[::4096].sum()
        report("fwd_take", slope(chain(fwd_take_step)), e)

        def perm_take_step(acc):
            o = take_f(msgs, perm)
            return acc + o[::4096].sum()
        report("perm_take (E-table)", slope(chain(perm_take_step)), e)

        seg_f = jax.jit(functools.partial(
            pallas_segment_sum, n_rows=int(nsrc), interpret=False))

        def segsum_step(acc):
            o = seg_f(msgs, csc_ids, csc_off)
            return acc + o[::4096].sum()
        report("csc_segsum", slope(chain(segsum_step)), e)

        layer_f = jax.jit(lambda m, a, ad: fused_gat_layer(
            m, a, ad, L.dst, L.row_offsets, L.tile2rel, L.n_rows_total,
            0.2, 1.0, False))

        def fwd_kernel_step(acc):
            o = layer_f(msgs, att, adst)
            return acc + o[::4096].sum()
        report("fwd_kernel", slope(chain(fwd_kernel_step)), e)

        gmask = jnp.asarray(
            rng.standard_normal((L.n_rows_total, d)).astype(np.float32))
        grad_f = jax.jit(jax.grad(
            lambda m: jnp.vdot(layer_f(m, att, adst), gmask)))

        def bwd_kernel_step(acc):
            o = grad_f(msgs)
            return acc + o[::4096].sum()
        report("fwd+bwd_kernel", slope(chain(bwd_kernel_step)), e)

        bench_window_gather(xs_all, L.csc_ids, dst_t)

    print("== whole model ==", flush=True)
    fwd = jax.jit(lambda p: apply_hetero_gnn(p, cfg, meta, arrays))

    def fwd_step(acc):
        return acc + fwd(params)[::1024].sum()
    e_trav = cg.total_real_edges() * 2
    report("fwd_model (2 layers)", slope(chain(fwd_step)), e_trav)

    optimizer = build_optimizer(1e-4, 5e-4)
    opt_state = optimizer.init(params)
    train_step = make_train_step(cfg, meta, optimizer)
    n_pad = cg.padded_nodes["SNP"]
    y = jnp.asarray(rng.random(n_pad, dtype=np.float32))
    wts = jnp.ones(n_pad, jnp.float32)
    bidx = jnp.asarray(rng.integers(0, cg.num_nodes["SNP"], 512), jnp.int32)

    state = {"p": params, "o": opt_state}

    def ts_run(k):
        p, o = state["p"], state["o"]
        for _ in range(k):
            p, o, loss = train_step(p, o, arrays, bidx, y, wts)
        float(loss)
        state["p"], state["o"] = p, o
    report("train_step", slope(ts_run), e_trav)


if __name__ == "__main__":
    main()
