"""Per-row-DMA cost microbenchmark: can the backward kernel emit its
d_msgs cotangents DIRECTLY in cut-grouped CSC order?

The remaining backward assembly cost (~7 ms/step cotangent takes+concat
at 200k bench scale) reorders stream-order d_msgs into CSC (src-sorted)
order for the segment-sum. Three XLA-side eliminations measured negative
(benchmarks/RESULTS.md). The last proposal (VERDICT r2 item 3) is
IN-KERNEL emission: the backward kernel writes each computed d_msgs row
straight to its CSC position via manual DMA. Because consecutive CSC
positions receive rows from arbitrary windows (degree ~6 graph: runs of
stream-order rows that stay adjacent in CSC order have expected length
~1), that is one [1, D] HBM DMA per EDGE.

This microbench measures exactly that primitive on-chip: one kernel
copies W x BE rows HBM->VMEM->HBM per window as ONE contiguous BE-row
DMA (the concat pass's unit of work), the other issues BE per-row DMAs
to permuted destinations (the scatter-emission unit). The ratio is the
per-row-DMA issue overhead that the in-kernel proposal would pay on
every edge.

Run on TPU: python scripts/exp_rowdma_scatter.py
"""
import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

D = 128
BE = 512
NSEM = 8  # outstanding scatter DMAs per window


def _contig_kernel(x_ref, o_ref, vmem, sems):
    i = pl.program_id(0)
    cp_in = pltpu.make_async_copy(
        x_ref.at[pl.ds(i * BE, BE), :], vmem, sems.at[0])
    cp_in.start()
    cp_in.wait()
    cp_out = pltpu.make_async_copy(vmem, o_ref.at[pl.ds(i * BE, BE), :],
                                   sems.at[1])
    cp_out.start()
    cp_out.wait()


def _scatter_kernel(perm_ref, x_ref, o_ref, vmem, sems):
    i = pl.program_id(0)
    cp_in = pltpu.make_async_copy(
        x_ref.at[pl.ds(i * BE, BE), :], vmem, sems.at[NSEM])
    cp_in.start()
    cp_in.wait()

    def row(r, _):
        slot = jax.lax.rem(r, NSEM)

        @pl.when(r >= NSEM)
        def _():
            # reclaim the slot's previous DMA before reuse
            pltpu.make_async_copy(
                vmem.at[pl.ds(0, 1), :],
                o_ref.at[pl.ds(perm_ref[i * BE + r - NSEM], 1), :],
                sems.at[slot],
            ).wait()

        pltpu.make_async_copy(
            vmem.at[pl.ds(r, 1), :],
            o_ref.at[pl.ds(perm_ref[i * BE + r], 1), :],
            sems.at[slot],
        ).start()
        return 0

    jax.lax.fori_loop(0, BE, row, 0)

    def drain(k, _):
        slot = jax.lax.rem(BE - NSEM + k, NSEM)
        pltpu.make_async_copy(
            vmem.at[pl.ds(0, 1), :],
            o_ref.at[pl.ds(perm_ref[i * BE + BE - NSEM + k], 1), :],
            sems.at[slot],
        ).wait()
        return 0

    jax.lax.fori_loop(0, NSEM, drain, 0)


@functools.partial(jax.jit, static_argnames=("n_win", "mode"))
def run(x, perm, n_win, mode):
    e = n_win * BE
    if mode == "contig":
        return pl.pallas_call(
            _contig_kernel,
            grid=(n_win,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            out_shape=jax.ShapeDtypeStruct((e, D), jnp.float32),
            scratch_shapes=[pltpu.VMEM((BE, D), jnp.float32),
                            pltpu.SemaphoreType.DMA((2,))],
        )(x)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_win,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[pltpu.VMEM((BE, D), jnp.float32),
                        pltpu.SemaphoreType.DMA((NSEM + 1,))],
    )
    return pl.pallas_call(
        _scatter_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((e, D), jnp.float32),
    )(perm, x)


def bench(fn, *args, reps=20):
    # slope timing with a host READ at each endpoint (bench_lib.py
    # caveats: block_until_ready can return early on relayed platforms,
    # and per-dispatch relay latency must be cancelled — run N1 then N2
    # launches and difference them; the serial device queue makes the
    # final read bound all launches)
    out = fn(*args)
    _ = float(out[0, 0])

    def run_n(n):
        t0 = time.perf_counter()
        for _ in range(n):
            o = fn(*args)
        _ = float(o[0, 0])
        return time.perf_counter() - t0, o

    n1 = max(reps // 4, 1)
    t1, _ = run_n(n1)
    t2, out = run_n(reps)
    return (t2 - t1) / (reps - n1), out


def main():
    print("backend:", jax.default_backend(), jax.devices(), flush=True)
    n_win = 256  # 131072 rows = 64 MB round trip
    e = n_win * BE
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(e, D)).astype(np.float32))
    perm_np = rng.permutation(e).astype(np.int32)
    perm = jnp.asarray(perm_np)

    t_c, out_c = bench(lambda: run(x, perm, n_win, "contig"))
    t_s, out_s = bench(lambda: run(x, perm, n_win, "scatter"))

    # correctness: scatter output at perm positions equals input rows
    oc = np.asarray(out_c)
    os_ = np.asarray(out_s)
    assert np.array_equal(oc, np.asarray(x))
    assert np.array_equal(os_[perm_np], np.asarray(x))

    bw_c = 2 * e * D * 4 / t_c / 1e9
    bw_s = 2 * e * D * 4 / t_s / 1e9
    per_row_ns = (t_s - t_c) / e * 1e9
    print(f"rows={e} D={D} BE={BE} NSEM={NSEM}")
    print(f"contiguous : {t_c*1e3:8.3f} ms  {bw_c:7.1f} GB/s")
    print(f"row-scatter: {t_s*1e3:8.3f} ms  {bw_s:7.1f} GB/s")
    print(f"ratio {t_s/t_c:.1f}x; marginal per-row DMA cost "
          f"{per_row_ns:.0f} ns/row")
    step_edges = 6.9e6  # bench-scale traversals/step needing reorder
    print(f"-> at bench scale ({step_edges:.1e} stream rows/step) in-kernel "
          f"scatter emission would add ~{per_row_ns*step_edges/1e6:.0f} "
          f"ms/step vs the ~7 ms concat pass it replaces")


if __name__ == "__main__":
    main()
