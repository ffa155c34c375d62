"""Does a MATERIALIZED chunk table restore the fast gather emitter?

exp_win_bwd.py showed slicing the big cotangent does not (XLA fuses the
slice into the gather; optimization_barrier is elided too). Two probes:

  pre_split   chunks passed in as separate device arrays (ground truth:
              if this is slow too, the chunk-table theory is dead for
              random-permutation indices)
  pallas_copy chunks materialized inside the jit by a trivial Pallas copy
              kernel (Pallas outputs are real buffers XLA cannot fuse)

Run: python scripts/exp_split_take.py  (TPU)
"""
import functools
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from kgwas_tpu.graph import compile_graph, make_synthetic_kg
from kgwas_tpu.ops.pallas_segment import BN as _TILE_BN

_NODE_PAD = max(256, _TILE_BN)  # follow the shipped tile default (BN=512)

from kgwas_tpu.graph.merged_layout import build_csc_windows


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
    print(f"{name:22s} {secs*1e3:8.2f} ms  {secs/rows*1e9:6.2f} ns/row",
          flush=True)


def _copy_kernel(x_ref, o_ref):
    o_ref[:, :] = x_ref[:, :]


def pallas_copy(x):
    return pl.pallas_call(
        _copy_kernel,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        grid=(x.shape[0] // 1024,),
        in_specs=[pl.BlockSpec((1024, x.shape[1]), lambda i: (i, 0))],
        out_specs=pl.BlockSpec((1024, x.shape[1]), lambda i: (i, 0)),
    )(x)


def main():
    print("backend:", jax.default_backend(), jax.devices(), flush=True)
    g = make_synthetic_kg(n_snp=200_000, n_gene=20_000, n_go=12_000,
                          snp_dim=20, gene_dim=128, go_dim=128,
                          avg_degree=6, seed=0)
    cg = compile_graph(g, edge_pad_multiple=8192, node_pad_multiple=_NODE_PAD)
    L = cg.merged_layouts()["SNP"]
    wl = build_csc_windows(L)
    e = len(L.src)
    rng = np.random.default_rng(0)
    gvals = jnp.asarray(rng.standard_normal((e, 128)).astype(np.float32))
    eb = [int(b) for b in wl.edge_bounds]
    print(f"SNP E={e} chunks={wl.n_chunks}", flush=True)

    # ground truth: chunks as separate input arrays
    chunks = tuple(gvals[eb[c]:eb[c + 1]] for c in range(wl.n_chunks))
    chunks = jax.device_put(tuple(np.asarray(c) for c in chunks))
    lps = tuple(jnp.asarray(p) for p in wl.local_perm)

    presplit = jax.jit(lambda cs: jnp.concatenate(
        [jnp.take(t, p, axis=0) for t, p in zip(cs, lps)], axis=0))

    def s_pre(acc):
        o = presplit(chunks)
        return acc + o[::4096].sum()
    report("pre_split", slope(chain(s_pre)), e)

    # pallas-copy materialization inside one jit
    def body(g_):
        outs = []
        for c in range(wl.n_chunks):
            n = eb[c + 1] - eb[c]
            n_al = (n // 1024) * 1024
            t_main = pallas_copy(g_[eb[c]:eb[c] + n_al])
            tail = g_[eb[c] + n_al:eb[c + 1]]
            t = jnp.concatenate([t_main, tail], axis=0) if n > n_al else t_main
            outs.append(jnp.take(t, lps[c], axis=0))
        return jnp.concatenate(outs, axis=0)

    f_pc = jax.jit(body)
    np.testing.assert_allclose(
        np.asarray(f_pc(gvals))[:512], np.asarray(presplit(chunks))[:512],
        rtol=1e-6)

    def s_pc(acc):
        o = f_pc(gvals)
        return acc + o[::4096].sum()
    report("pallas_copy", slope(chain(s_pc)), e)


if __name__ == "__main__":
    main()
