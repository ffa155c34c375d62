"""Row-gather strategy microbenchmark on the real TPU (round-2 perf item 1).

Round-1 measurement: every training path is gather-bound — XLA's [E,128] row
gather sustains ~145 GB/s of the v5e's 819 GB/s HBM (benchmarks/RESULTS.md,
ROADMAP.md). This experiment measures the candidate replacements:

  1. xla_random      jnp.take, uniform random indices (the status quo)
  2. xla_sorted      jnp.take, ascending indices (does locality help XLA?)
  3. pallas_vmem     Pallas kernel, full table resident in VMEM, per-tile
                     jnp.take from the VMEM ref (does Mosaic lower a
                     dynamic in-VMEM gather at all? how fast?)
  4. pallas_onehot   Pallas kernel, gather-as-matmul within a src window
                     (banded indices) — MXU cost model check
  5. bf16 variants   row payload halved

Timing: slope method (two chained-iteration counts, one host sync each) —
the only trustworthy timing through the axon relay (see
benchmarks/RESULTS.md round 1).

Run: python scripts/exp_gather.py [--quick]
"""
import argparse
import functools
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

E = 3_407_872          # edges (bench-scale; multiple of 2048)
D = 128


def slope_time(fn, n1=3, n2=13):
    """Per-iteration seconds via slope timing; fn(k) runs k chained iters."""
    fn(2)  # warmup/compile
    t0 = time.perf_counter(); fn(n1); t1 = time.perf_counter()
    fn(n2); t2 = time.perf_counter()
    return ((t2 - t1) - (t1 - t0)) / (n2 - n1)


def report(name, secs, e=E, d=D, dtype_bytes=4):
    gb = e * d * dtype_bytes / 1e9
    print(f"{name:24s} {secs*1e3:8.2f} ms  {gb/secs:7.1f} GB/s(out)  "
          f"{secs/e*1e9:6.2f} ns/row", flush=True)


# ---------------------------------------------------------------------------
# 1/2: XLA take
# ---------------------------------------------------------------------------

def bench_xla(x, idx, name):
    @jax.jit
    def step(acc, idx):
        out = jnp.take(x, idx, axis=0)
        return acc + out[::4096].sum(), idx

    def run(k):
        acc = jnp.zeros(())
        for _ in range(k):
            acc, idx2 = step(acc, idx)
        float(acc)

    report(name, slope_time(run), dtype_bytes=x.dtype.itemsize)


# ---------------------------------------------------------------------------
# 3: Pallas in-VMEM take
# ---------------------------------------------------------------------------

def make_vmem_take(n_rows, e, d, be, dtype, mode="take"):
    def kernel(tab_ref, idx_ref, out_ref):
        idx = idx_ref[...]            # [BE] int32 in VMEM
        tab = tab_ref[...]            # [n_rows, d] resident in VMEM
        if mode == "take":
            out_ref[...] = jnp.take(tab, idx, axis=0)
        else:  # onehot within full table (only for small tables)
            oh = (idx[:, None] == jax.lax.broadcasted_iota(
                jnp.int32, (be, n_rows), 1)).astype(dtype)
            out_ref[...] = jnp.dot(oh, tab,
                                   preferred_element_type=jnp.float32
                                   ).astype(dtype)

    grid = (e // be,)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((n_rows, d), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((be,), lambda i: (i,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((be, d), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((e, d), dtype),
    )


def bench_pallas_vmem(n_rows, dtype, mode, name, e=E, be=2048):
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((n_rows, D)), dtype=dtype)
    idx = jnp.asarray(
        np.random.default_rng(1).integers(0, n_rows, e), dtype=jnp.int32)
    try:
        f = make_vmem_take(n_rows, e, D, be, dtype, mode)
        fj = jax.jit(lambda idx: f(x, idx))

        @jax.jit
        def step(acc, idx):
            return acc + fj(idx)[::4096].sum(), idx

        def run(k):
            acc = jnp.zeros((), dtype=jnp.float32)
            for _ in range(k):
                acc, _ = step(acc, idx)
            float(acc)

        report(name, slope_time(run), e=e, dtype_bytes=x.dtype.itemsize)
    except Exception as ex:
        print(f"{name:24s} FAILED: {type(ex).__name__}: {str(ex)[:300]}",
              flush=True)


# ---------------------------------------------------------------------------
# 6: Pallas DMA-pipelined random gather (per-row async copies, NQ outstanding)
# ---------------------------------------------------------------------------

def make_dma_gather(e, d, be, nq, dtype, via_vmem=False):
    """out[i] = x[ids[i]] via per-row DMAs with a rolling window of nq
    outstanding copies. ids are a scalar-prefetch operand (SMEM), so e is
    limited to ~250k rows (1 MB SMEM). Measures the DMA issue rate — the
    viability question for replacing XLA's serial gather."""
    def kernel(ids_ref, x_ref, out_ref, sems):
        c = pl.program_id(0)
        base = c * be

        def get_copy(i):
            row = ids_ref[base + i]
            return pltpu.make_async_copy(
                x_ref.at[pl.ds(row, 1), :],
                out_ref.at[pl.ds(base + i, 1), :],
                sems.at[jax.lax.rem(i, nq)])

        def body(i, _):
            get_copy(i).start()

            @pl.when(i >= nq)
            def _():
                get_copy(i - nq).wait()
            return 0

        jax.lax.fori_loop(0, be, body, 0)

        def epi(q, _):
            get_copy(be - nq + q).wait()
            return 0

        jax.lax.fori_loop(0, nq, epi, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(e // be,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[pltpu.SemaphoreType.DMA((nq,))],
    )
    return pl.pallas_call(kernel, grid_spec=grid_spec,
                          out_shape=jax.ShapeDtypeStruct((e, d), dtype))


def bench_dma_gather(n_rows, e, nq, dtype, name, be=2048):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((n_rows, D)), dtype=dtype)
    ids = rng.integers(0, n_rows, e).astype(np.int32)
    idx = jnp.asarray(ids)
    try:
        f = make_dma_gather(e, D, be, nq, dtype)
        fj = jax.jit(lambda i_, x_: f(i_, x_))
        out = fj(idx, x)
        np.testing.assert_allclose(np.asarray(out[:128]),
                                   np.asarray(x)[ids[:128]], rtol=1e-6)

        @jax.jit
        def step(acc, idx):
            return acc + fj(idx, x)[::4096].sum().astype(jnp.float32), idx

        def run(k):
            acc = jnp.zeros((), jnp.float32)
            for _ in range(k):
                acc, _ = step(acc, idx)
            float(acc)

        report(name, slope_time(run), e=e, dtype_bytes=x.dtype.itemsize)
    except Exception as ex:
        print(f"{name:24s} FAILED: {type(ex).__name__}: {str(ex)[:300]}",
              flush=True)


def bench_scalar_take(n_rows, e, name):
    """Gather of [E] scalars from an [N] vector — is the cost per-row-fixed
    (index-rate-bound) or per-byte?"""
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(n_rows), jnp.float32)
    idx = jnp.asarray(rng.integers(0, n_rows, e), jnp.int32)

    @jax.jit
    def step(acc, idx):
        return acc + jnp.take(x, idx)[::4096].sum(), idx

    def run(k):
        acc = jnp.zeros(())
        for _ in range(k):
            acc, _ = step(acc, idx)
        float(acc)

    report(name, slope_time(run), e=e, d=1, dtype_bytes=4)


def bench_local_window(n_rows, e, span, name):
    """take from a BIG table with ids confined to per-chunk windows of
    `span` rows (chunk = 16k consecutive output rows). Distinguishes
    table-size effects from index-locality effects."""
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((n_rows, D)), jnp.float32)
    chunk = 16_384
    n_chunks = e // chunk
    starts = rng.integers(0, n_rows - span, n_chunks)
    ids = (starts[:, None] + rng.integers(0, span, (n_chunks, chunk))
           ).astype(np.int32).ravel()
    bench_xla(x, jnp.asarray(ids), name)


def bench_chunked_take(n_rows, e, chunk_rows, name, separate_arrays=True,
                       measure_concat=True):
    """The v2-layout candidate: edges pre-sorted by src chunk; per-chunk
    jnp.take from a <=32k-row table (the fast XLA emitter) producing
    contiguous output slices; concat -> [E, D] in (chunk-major) edge order.

    separate_arrays=False keeps the table as ONE array and slices it inside
    jit — tests whether XLA's slice+gather fusion still picks the fast
    emitter (if not, the layer must produce per-chunk projection outputs)."""
    rng = np.random.default_rng(0)
    n_chunks = (n_rows + chunk_rows - 1) // chunk_rows
    ids = rng.integers(0, n_rows, e).astype(np.int32)
    order = np.argsort(ids // chunk_rows, kind="stable")
    ids_sorted = ids[order]
    counts = np.bincount(ids // chunk_rows, minlength=n_chunks)
    # per-chunk local index vectors, padded to a multiple of 8 rows
    # (pad rows gather row 0 of the chunk — masked downstream in real use)
    locals_, bounds = [], np.concatenate([[0], np.cumsum(counts)])
    for c in range(n_chunks):
        li = ids_sorted[bounds[c]:bounds[c + 1]] - c * chunk_rows
        pad = (-len(li)) % 8
        locals_.append(np.pad(li, (0, pad)).astype(np.int32))
    x = rng.standard_normal((n_rows, D)).astype(np.float32)
    if separate_arrays:
        tabs = [jnp.asarray(x[c * chunk_rows:(c + 1) * chunk_rows])
                for c in range(n_chunks)]
    else:
        xbig = jnp.asarray(x)
    idx_dev = [jnp.asarray(li) for li in locals_]
    e_eff = sum(len(li) for li in locals_)

    @jax.jit
    def step(acc, idxs):
        if separate_arrays:
            parts = [jnp.take(t, i, axis=0) for t, i in zip(tabs, idxs)]
        else:
            parts = [jnp.take(
                jax.lax.slice_in_dim(xbig, c * chunk_rows,
                                     min((c + 1) * chunk_rows, n_rows)),
                i, axis=0) for c, i in enumerate(idxs)]
        if measure_concat:
            out = jnp.concatenate(parts, axis=0)
            return acc + out[::4096].sum(), idxs
        return acc + sum(p[::512].sum() for p in parts), idxs

    def run(k):
        acc = jnp.zeros(())
        for _ in range(k):
            acc, _ = step(acc, idx_dev)
        float(acc)

    report(name, slope_time(run), e=e_eff, dtype_bytes=4)


def bench_take_flags(n_rows, e, name):
    """lax.gather mode/unique/sorted flags on the big table — do any of
    them flip XLA to the fast emitter?"""
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((n_rows, D)), jnp.float32)
    ids = rng.integers(0, n_rows, e).astype(np.int32)
    for tag, kw in [
        ("inbounds", dict(mode="promise_in_bounds")),
        ("uniq+sort", dict(mode="promise_in_bounds", unique_indices=True,
                           indices_are_sorted=True)),
    ]:
        idx = jnp.asarray(np.sort(ids) if "sort" in tag else ids)

        @jax.jit
        def step(acc, idx):
            out = x.at[idx].get(**kw)
            return acc + out[::4096].sum(), idx

        def run(k):
            acc = jnp.zeros(())
            for _ in range(k):
                acc, _ = step(acc, idx)
            float(acc)

        report(f"{name} {tag}", slope_time(run), e=e, dtype_bytes=4)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--dma", action="store_true",
                    help="only the DMA-pipelined gather + scalar-take runs")
    ap.add_argument("--curve", action="store_true",
                    help="take ns/row vs table size and vs index locality")
    ap.add_argument("--chunked", action="store_true",
                    help="per-src-chunk take + concat (v2 layout candidate)")
    args = ap.parse_args()

    if args.chunked:
        print("backend:", jax.default_backend(), jax.devices(), flush=True)
        N = 458_752
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal((N, D)), jnp.float32)
        idx = jnp.asarray(rng.integers(0, N, E), jnp.int32)
        bench_xla(x, idx, "baseline_take N=448k")
        for cr in (16_384, 32_768):
            bench_chunked_take(N, E, cr, f"chunked sep cr={cr//1024}k")
            bench_chunked_take(N, E, cr, f"chunked sep nocat cr={cr//1024}k",
                               measure_concat=False)
            bench_chunked_take(N, E, cr, f"chunked slice cr={cr//1024}k",
                               separate_arrays=False)
        bench_take_flags(N, E, "flags N=448k")
        bench_scalar_take(3_407_872, E, "scalar_perm E=3.4M")
        return

    if args.curve:
        print("backend:", jax.default_backend(), jax.devices(), flush=True)
        rng = np.random.default_rng(0)
        for n_rows in (8_192, 16_384, 32_768, 65_536, 131_072, 262_144,
                       458_752):
            x = jnp.asarray(rng.standard_normal((n_rows, D)), jnp.float32)
            idx = jnp.asarray(rng.integers(0, n_rows, E), jnp.int32)
            bench_xla(x, idx, f"take_tab N={n_rows//1024}k")
        for span in (2_048, 16_384, 65_536):
            bench_local_window(458_752, E, span,
                               f"take_loc N=448k span={span//1024}k")
        return

    if args.dma:
        print("backend:", jax.default_backend(), jax.devices(), flush=True)
        e = 245_760  # 120 chunks of 2048; ids fit SMEM (983 kB)
        bench_scalar_take(456_704, E, "scalar_take N=456k")
        bench_scalar_take(16_384, E, "scalar_take N=16k")
        for nq in (4, 16, 64):
            bench_dma_gather(456_704, e, nq, jnp.float32,
                             f"dma_gather nq={nq} f32")
        bench_dma_gather(456_704, e, 16, jnp.bfloat16, "dma_gather nq=16 bf16")
        return

    print("backend:", jax.default_backend(), jax.devices(), flush=True)
    rng = np.random.default_rng(0)

    for n_rows in (16_384, 204_800):
        for dt in (jnp.float32, jnp.bfloat16):
            x = jnp.asarray(rng.standard_normal((n_rows, D)), dtype=dt)
            idx_r = jnp.asarray(rng.integers(0, n_rows, E), dtype=jnp.int32)
            idx_s = jnp.sort(idx_r)
            tag = f"N={n_rows//1024}k/{np.dtype(dt).name}"
            bench_xla(x, idx_r, f"xla_random {tag}")
            bench_xla(x, idx_s, f"xla_sorted {tag}")

    # Pallas in-VMEM take: table 16k rows = 8 MiB (f32). THE experiment.
    bench_pallas_vmem(16_384, jnp.float32, "take", "pallas_vmem_take 16k/f32")
    bench_pallas_vmem(16_384, jnp.bfloat16, "take", "pallas_vmem_take 16k/bf16")
    if not args.quick:
        # near-VMEM-limit table (bf16 80 MiB)
        bench_pallas_vmem(163_840, jnp.bfloat16, "take",
                          "pallas_vmem_take 160k/bf16")
        bench_pallas_vmem(65_536, jnp.float32, "take",
                          "pallas_vmem_take 64k/f32")
        # gather-as-matmul cost check (small window)
        bench_pallas_vmem(2_048, jnp.float32, "onehot",
                          "pallas_onehot 2k/f32", e=E // 4)


if __name__ == "__main__":
    main()
