"""Pallas TPU kernels: fused segment-softmax + weighted aggregation (GAT core).

Speed-of-light replacement for the XLA composite in ops/segment.py (itself
the replacement for torch_scatter CUDA kernels, reference
kgwas/conv.py:223,227-228). XLA lowers TPU scatter to a serial per-element
loop (~250 ms/step on the 1.7M-edge bench graph); these kernels stream the
destination-sorted edge list through VMEM once, accumulating with one-hot
MXU matmuls:

  * ONE pass per edge chunk, flash-attention-style online softmax: running
    row max with rescaling of the accumulated numerator/denominator
  * double-buffered chunk DMA (msgs/logits/dst) to hide HBM latency
  * empty dst-row tiles skip all work (load-bearing for sparse row spaces)
  * transposed one-hot [BN, BE] built by broadcast compare; per-edge softmax
    scaling folds into its columns so (onehotT*p) @ msgs does gather-reduce
    and scaling in one MXU shot; the backward is expressed entirely in
    lane-row form with no cross-lane reshapes or explicit transposes

Mosaic layout rules honored: feature dim D % 128 == 0; per-edge scalars live
in HBM as [E/128, 128] lane-rows, chunks DMA'd at 128-aligned starts
(out-of-tile lanes masked by the one-hot); residual outputs padded to
8-sublane blocks. Chunk windows of adjacent tiles may overlap by <128 edges;
the backward merges overlapping edge-gradient writes read-modify-write (the
sequential TPU grid makes the previous tile's writes visible).

The custom VJP recomputes alpha from saved (row_max, row_sum) residuals — no
[E] softmax array ever hits HBM. A plain segment-sum kernel + CSC-ordered
gather VJP (gather_rows_csc) route the source-feature gather's transpose
around XLA's serial scatter as well.
"""
from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_BIG = -1e9
EPS = 1e-16
EXP_CLAMP = 60.0  # clamp exp args: out-of-tile/empty-row lanes would overflow

import os as _os

LANE = 128
# dst rows per program. 512 is the shipped default: +6.6% step time over 256
# at bench scale (75.49+-0.13 vs 80.45+-0.50 ms/step, 3-run interleaved A/B,
# benchmarks/RESULTS.md round 4) and parity-gated on chip vs the XLA oracle
# (scripts/exp_bn_parity_tpu.py). KGWAS_PALLAS_BN=256 restores the old tile;
# 128 halves the one-hot VPU work per tile for experiments (fenced — see
# _check_bn_supported). Read once at import — layouts key off it.
BN = int(_os.environ.get("KGWAS_PALLAS_BN", "512"))
# BN > 256 requires every per-relation row block (and src block) to be a
# BN multiple — pass node_pad_multiple=BN to compile_graph (layouts assert)
assert BN % LANE == 0 and BN in (128, 256, 512), BN

_BN128_WARNED = False
# padded dst-row count above which a BN=128 op on the real TPU backend is a
# hard error (the probabilistic hang/INTERNAL regime starts around 25k
# SNPs; at graph scale every op's row space crosses this). Escape hatch:
# KGWAS_ALLOW_BN128=1 (for the staged repro harnesses, which exist to
# reproduce exactly that failure).
BN128_MAX_ROWS = 32_768


def _check_bn_supported(n_rows=None):
    """BN=128 composed programs fail PROBABILISTICALLY on real TPU above
    ~25-50k SNPs — a hang or an opaque 'TPU backend error (Internal)';
    the same binary program can pass or fail across runs. Every kernel
    passes deterministically in isolation at any scale, so this is a
    backend/runtime defect under multi-kernel composition, fully
    characterized by the staged harnesses scripts/debug_bn128_{distill,
    model_bisect,kernel_compose}.py (benchmarks/RESULTS.md). On the TPU
    backend: HARD ERROR above BN128_MAX_ROWS padded rows (a config that
    flakily wedges real runs must not be reachable by accident —
    KGWAS_ALLOW_BN128=1 is the explicit escape hatch for the repro
    harnesses), loud warning below it; CPU interpret experiments stay
    unaffected. BN=512 is parity-tested (tests/test_bn_variants.py) and
    requires node_pad_multiple=512."""
    global _BN128_WARNED
    if BN >= 256 or jax.default_backend() != "tpu":
        return
    if (n_rows is not None and n_rows > BN128_MAX_ROWS
            and _os.environ.get("KGWAS_ALLOW_BN128") != "1"):
        raise RuntimeError(
            f"KGWAS_PALLAS_BN={BN} on the TPU backend with n_rows={n_rows} "
            f"> {BN128_MAX_ROWS}: composed BN=128 programs at this scale "
            "hang or die with an opaque 'TPU backend error (Internal)' "
            "PROBABILISTICALLY (benchmarks/RESULTS.md; "
            "scripts/debug_bn128_*.py). Use BN>=256, or set "
            "KGWAS_ALLOW_BN128=1 to run the known-flaky config anyway.")
    if not _BN128_WARNED:
        _BN128_WARNED = True
        import warnings

        warnings.warn(
            f"KGWAS_PALLAS_BN={BN} composed programs fail probabilistically "
            "on the TPU backend above ~25k SNPs (hang or 'TPU backend error "
            "(Internal)'); use BN>=256 for real runs. See "
            "benchmarks/RESULTS.md and scripts/debug_bn128_*.py.",
            RuntimeWarning,
            stacklevel=3,
        )
# edges per inner chunk (multiple of LANE). 512 default; KGWAS_PALLAS_BE
# sweeps window size (larger amortizes DMA issue, smaller cuts window
# read-amplification on short fragments). Read once at import — layouts
# (graph/merged_layout.py) key off it.
BE = int(_os.environ.get("KGWAS_PALLAS_BE", "512"))

# MXU precision for the kernels' f32 dots. jax's global
# default_matmul_precision leaks into pallas dot_generals at trace time:
# "highest" (what parity-minded callers set globally) forces
# #tpu.contract_precision<fp32> multi-pass emulation on every one-hot
# aggregation (BN x D MACs/edge — the dominant kernel cost). Pinning
# DEFAULT decouples the kernels from the global setting and lets Mosaic
# pick its native f32 contract strategy. Mosaic lowers only
# DEFAULT/HIGHEST (jax/_src/pallas/mosaic/lowering.py), so "high" is not
# offered. Override with KGWAS_KERNEL_PRECISION=default|highest.
KERNEL_PRECISION = {
    "default": jax.lax.Precision.DEFAULT,
    "highest": jax.lax.Precision.HIGHEST,
}[_os.environ.get("KGWAS_KERNEL_PRECISION", "default")]
assert BE % LANE == 0 and BE > 0, BE
BR = BE // LANE
# chunk DMA buffering depth (2 = double buffering). KGWAS_PALLAS_NBUF=3
# trades VMEM for deeper prefetch when windows are short.
NBUF = int(_os.environ.get("KGWAS_PALLAS_NBUF", "2"))


def _tile_range(off_ref, i):
    # off_ref holds only the n_tiles+1 TILE-boundary offsets (SMEM is ~1MB;
    # full per-row offsets don't fit at scale and are never needed — the
    # one-hot routes edges within a tile)
    start = off_ref[i]
    end = off_ref[i + 1]
    start_al = (start // LANE) * LANE
    return start, end, start_al, pl.cdiv(end - start_al, BE)


def _lane_concat(block):
    """(BR, LANE) -> (1, BE) row via lane concatenation."""
    rows = [block[r : r + 1, :] for r in range(BR)]
    return jnp.concatenate(rows, axis=1)


def _row_to_block(row, dtype):
    """(1, BE) row -> (BR, LANE) by 128-aligned lane slices."""
    parts = [row[0:1, r * LANE : (r + 1) * LANE] for r in range(BR)]
    return jnp.concatenate(parts, axis=0).astype(dtype)


def _onehot_t(dst_row, row_base):
    """Transposed one-hot [BN, BE]: onehotT[n, e] = dst[e] == row_base + n."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (BN, BE), 0) + row_base
    return rows == dst_row  # (1, BE) broadcasts against (BN, BE)


def _in_tile_row(dst_row, row_base):
    """[1, BE] mask: edge's dst row lives in this tile. O(BE) range compare
    — replaces onehot_t.any(axis=0), an O(BN*BE) reduction."""
    return jnp.logical_and(dst_row >= row_base, dst_row < row_base + BN)


def dispatch_by_bases(s, bases, fn):
    """Run fn(k, s - bases[k]) for the unique k with bases[k] <= s <
    bases[k+1], via BINARY pl.when nesting — O(log K) executed scalar
    branches instead of the O(K) linear condition chain. Bases are static;
    K-chunk layouts reach K=50 at 400k-SNP scale, where the linear chain's
    per-DMA condition evaluation dominates kernel scalar work."""
    def rec(lo, hi):
        if hi - lo == 1:
            fn(lo, s - bases[lo])
            return
        mid = (lo + hi) // 2

        @pl.when(s < bases[mid])
        def _():
            rec(lo, mid)

        @pl.when(s >= bases[mid])
        def _():
            rec(mid, hi)

    # guard the whole tree: s outside [bases[0], bases[-1]) dispatches
    # nothing (matches the linear chain's behavior)
    @pl.when(jnp.logical_and(s >= bases[0], s < bases[-1]))
    def _():
        rec(0, len(bases) - 1)


def _chunk_dmas(start_al, c, slot, msgs_ref, msgs_vmem, ids_ref, ids_vmem,
                sems, logits_ref=None, logits_vmem=None):
    s = start_al + c * BE
    r = s // LANE
    dmas = [
        pltpu.make_async_copy(
            msgs_ref.at[pl.ds(s, BE), :], msgs_vmem.at[slot], sems.at[slot, 0]
        ),
        pltpu.make_async_copy(
            ids_ref.at[pl.ds(r, BR), :], ids_vmem.at[slot], sems.at[slot, 1]
        ),
    ]
    if logits_ref is not None:
        dmas.append(
            pltpu.make_async_copy(
                logits_ref.at[pl.ds(r, BR), :], logits_vmem.at[slot],
                sems.at[slot, 2],
            )
        )
    return dmas


# ---------------------------------------------------------------------------
# forward: online-softmax segment aggregation
# ---------------------------------------------------------------------------

def _fwd_kernel(
    off_ref,          # scalar prefetch: row offsets [N_pad + 1] (SMEM)
    msgs_ref,         # [E_pad, D] HBM
    logits_ref,       # [E_pad/LANE, LANE] HBM
    dst_ref,          # [E_pad/LANE, LANE] HBM (int32)
    out_ref,          # [BN, D] VMEM block
    max_ref,          # [8, BN] VMEM block (sublane 0 meaningful)
    sum_ref,          # [8, BN] VMEM block
    msgs_vmem,        # scratch [NBUF, BE, D]
    logits_vmem,      # scratch [NBUF, BR, LANE]
    dst_vmem,         # scratch [NBUF, BR, LANE] int32
    sems,             # DMA semaphores (NBUF, 3)
):
    i = pl.program_id(0)
    start, end, start_al, nchunks = _tile_range(off_ref, i)
    row_base = i * BN

    def start_chunk(c, slot):
        for dma in _chunk_dmas(start_al, c, slot, msgs_ref, msgs_vmem,
                               dst_ref, dst_vmem, sems, logits_ref,
                               logits_vmem):
            dma.start()

    def wait_chunk(c, slot):
        for dma in _chunk_dmas(start_al, c, slot, msgs_ref, msgs_vmem,
                               dst_ref, dst_vmem, sems, logits_ref,
                               logits_vmem):
            dma.wait()

    @pl.when(end > start)
    def _nonempty():
        start_chunk(0, 0)

        def body(c, carry):
            acc, row_sum, m_old = carry
            slot = jax.lax.rem(c, NBUF)

            @pl.when(c + 1 < nchunks)
            def _():
                start_chunk(c + 1, jax.lax.rem(c + 1, NBUF))

            wait_chunk(c, slot)

            dst_row = _lane_concat(dst_vmem.at[slot])
            onehot_t = _onehot_t(dst_row, row_base)
            l_row = _lane_concat(logits_vmem.at[slot])              # [1, BE]
            in_tile = _in_tile_row(dst_row, row_base)            # [1, BE]

            m_chunk = jnp.max(jnp.where(onehot_t, l_row, NEG_BIG), axis=1)
            m_new = jnp.maximum(m_old, m_chunk)                  # [BN]
            scale = jnp.exp(jnp.minimum(m_old - m_new, 0.0))     # [BN]
            acc = acc * scale[:, None]
            row_sum = row_sum * scale

            m_e = jnp.max(jnp.where(onehot_t, m_new[:, None], NEG_BIG),
                          axis=0, keepdims=True)                 # [1, BE]
            p_row = jnp.exp(jnp.minimum(l_row - m_e, EXP_CLAMP))
            p_row = jnp.where(in_tile, p_row, 0.0)
            w = onehot_t.astype(jnp.float32) * p_row             # [BN, BE]
            row_sum = row_sum + jnp.sum(w, axis=1)
            acc = acc + jax.lax.dot_general(
                w, msgs_vmem[slot],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=KERNEL_PRECISION,
            )
            return acc, row_sum, m_new

        acc, row_sum, row_max = jax.lax.fori_loop(
            0, nchunks, body,
            (
                jnp.zeros((BN, out_ref.shape[1]), dtype=jnp.float32),
                jnp.zeros((BN,), dtype=jnp.float32),
                jnp.full((BN,), NEG_BIG, dtype=jnp.float32),
            ),
        )
        out_ref[:, :] = acc / (row_sum + EPS)[:, None]
        max_ref[0:1, :] = row_max[None, :]
        sum_ref[0:1, :] = row_sum[None, :]

    @pl.when(end <= start)
    def _empty():
        out_ref[:, :] = jnp.zeros_like(out_ref)
        max_ref[0:1, :] = jnp.full((1, BN), NEG_BIG, dtype=jnp.float32)
        sum_ref[0:1, :] = jnp.zeros((1, BN), dtype=jnp.float32)


def _pad_edges(msgs, logits, dst, n_rows):
    """Pad edges so any chunk DMA stays in-bounds; reshape logits/dst to
    lane-rows. Pad dst = n_rows (outside every tile's row range)."""
    e = msgs.shape[0]
    e_pad = ((e + BE - 1) // BE) * BE + BE
    pad = e_pad - e
    msgs = jnp.pad(msgs, ((0, pad), (0, 0)))
    logits = jnp.pad(logits, ((0, pad),), constant_values=0.0)
    dst = jnp.pad(dst, ((0, pad),), constant_values=n_rows)
    return msgs, logits.reshape(-1, LANE), dst.reshape(-1, LANE)


@functools.partial(jax.jit, static_argnames=("n_rows", "interpret"))
def _fused_forward(msgs, logits, dst, row_offsets, n_rows, interpret=False):
    d = msgs.shape[1]
    assert d % LANE == 0, f"feature dim {d} must be a multiple of {LANE}"
    assert n_rows % BN == 0, f"n_rows {n_rows} must be a multiple of {BN}"
    n_tiles = n_rows // BN
    msgs_p, logits_p, dst_p = _pad_edges(msgs, logits, dst, n_rows)
    tile_starts = jnp.concatenate(
        [row_offsets[::BN], row_offsets[-1:]]
    )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec((BN, d), lambda i, off: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, BN), lambda i, off: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, BN), lambda i, off: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((NBUF, BE, d), jnp.float32),
            pltpu.VMEM((NBUF, BR, LANE), jnp.float32),
            pltpu.VMEM((NBUF, BR, LANE), jnp.int32),
            pltpu.SemaphoreType.DMA((NBUF, 3)),
        ],
    )
    out, row_max, row_sum = pl.pallas_call(
        _fwd_kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n_rows, d), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles * 8, BN), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles * 8, BN), jnp.float32),
        ],
        interpret=interpret,
    )(tile_starts, msgs_p, logits_p, dst_p)
    return out, row_max, row_sum


# ---------------------------------------------------------------------------
# backward
# ---------------------------------------------------------------------------

def _bwd_kernel(
    off_ref,
    msgs_ref,         # [E_pad, D] HBM
    logits_ref,       # [E_pad/LANE, LANE] HBM
    dst_ref,          # [E_pad/LANE, LANE] HBM
    rmax_ref,         # [8, BN] VMEM block
    rsum_ref,         # [8, BN] VMEM block
    out_ref,          # [BN, D] VMEM block (primal output)
    g_ref,            # [BN, D] VMEM block (cotangent)
    dmsgs_ref,        # [E_pad, D] HBM output
    dlogits_ref,      # [E_pad/LANE, LANE] HBM output
    msgs_vmem,        # [NBUF, BE, D]
    logits_vmem,      # [NBUF, BR, LANE]
    dst_vmem,         # [NBUF, BR, LANE]
    dmsgs_old,        # [NBUF, BE, D]
    dlog_old,         # [NBUF, BR, LANE]
    dmsgs_out_vmem,   # [BE, D]
    dlog_out_vmem,    # [BR, LANE]
    sems,             # (NBUF, 5)
    wsems,            # (2,) write semaphores
):
    i = pl.program_id(0)
    start, end, start_al, nchunks = _tile_range(off_ref, i)
    row_base = i * BN

    dot_r = jnp.sum(out_ref[:, :] * g_ref[:, :], axis=1)  # [BN]
    # per-row log-sum-exp: one masked extract per window instead of two
    lse_v = rmax_ref[0, :] + jnp.log(rsum_ref[0, :] + EPS)  # [BN]

    def is_boundary(c):
        s = start_al + c * BE
        return jnp.logical_or(s < start, s + BE > end)

    def start_chunk(c, slot):
        s = start_al + c * BE
        r = s // LANE
        for dma in _chunk_dmas(start_al, c, slot, msgs_ref, msgs_vmem,
                               dst_ref, dst_vmem, sems, logits_ref,
                               logits_vmem):
            dma.start()

        # merge reads only needed where the chunk window crosses the tile
        # boundary (<128-edge overlap with neighboring tiles)
        @pl.when(is_boundary(c))
        def _():
            pltpu.make_async_copy(
                dmsgs_ref.at[pl.ds(s, BE), :], dmsgs_old.at[slot],
                sems.at[slot, 3],
            ).start()
            pltpu.make_async_copy(
                dlogits_ref.at[pl.ds(r, BR), :], dlog_old.at[slot],
                sems.at[slot, 4],
            ).start()

    def wait_chunk(c, slot):
        s = start_al + c * BE
        r = s // LANE
        for dma in _chunk_dmas(start_al, c, slot, msgs_ref, msgs_vmem,
                               dst_ref, dst_vmem, sems, logits_ref,
                               logits_vmem):
            dma.wait()

        @pl.when(is_boundary(c))
        def _():
            pltpu.make_async_copy(
                dmsgs_ref.at[pl.ds(s, BE), :], dmsgs_old.at[slot],
                sems.at[slot, 3],
            ).wait()
            pltpu.make_async_copy(
                dlogits_ref.at[pl.ds(r, BR), :], dlog_old.at[slot],
                sems.at[slot, 4],
            ).wait()

    def write_dmas(c, slot):
        s = start_al + c * BE
        r = s // LANE
        return (
            pltpu.make_async_copy(
                dmsgs_out_vmem.at[slot], dmsgs_ref.at[pl.ds(s, BE), :],
                wsems.at[slot, 0],
            ),
            pltpu.make_async_copy(
                dlog_out_vmem.at[slot], dlogits_ref.at[pl.ds(r, BR), :],
                wsems.at[slot, 1],
            ),
        )

    @pl.when(end > start)
    def _nonempty():
        start_chunk(0, 0)

        def body(c, _):
            slot = jax.lax.rem(c, NBUF)

            @pl.when(c + 1 < nchunks)
            def _():
                start_chunk(c + 1, jax.lax.rem(c + 1, NBUF))

            wait_chunk(c, slot)

            # before overwriting this slot's output buffers, wait for the
            # write issued NBUF chunks ago
            @pl.when(c >= NBUF)
            def _():
                for wdma in write_dmas(c - NBUF, slot):
                    wdma.wait()

            dst_row = _lane_concat(dst_vmem.at[slot])
            onehot_t = _onehot_t(dst_row, row_base)
            ohf = onehot_t.astype(jnp.float32)
            in_tile = _in_tile_row(dst_row, row_base)            # [1, BE]
            l_row = _lane_concat(logits_vmem.at[slot])              # [1, BE]
            lse_e = jnp.max(jnp.where(onehot_t, lse_v[:, None], NEG_BIG),
                            axis=0, keepdims=True)
            p_row = jnp.exp(jnp.minimum(l_row - lse_e, EXP_CLAMP))
            p_row = jnp.where(in_tile, p_row, 0.0)
            w = ohf * p_row                                       # [BN, BE]

            # d_msgs[e] = p[e] * g[dst[e]] = w^T @ g
            new_dmsgs = jax.lax.dot_general(
                w, g_ref[:, :],
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=KERNEL_PRECISION,
            )                                                     # [BE, D]
            # d_logit[e] = p[e] * (msgs[e].g[dst[e]] - out[dst[e]].g[dst[e]])
            #            = sum_n w[n,e] * (M2[n,e] - dot_r[n])
            m2 = jax.lax.dot_general(
                g_ref[:, :], msgs_vmem[slot],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=KERNEL_PRECISION,
            )                                                     # [BN, BE]
            dlog_row = jnp.sum(w * (m2 - dot_r[:, None]), axis=0,
                               keepdims=True)                     # [1, BE]

            # merge with previous values on out-of-tile lanes (boundary
            # overlap with neighboring tiles' chunk windows)
            @pl.when(is_boundary(c))
            def _():
                in_col = jax.lax.dot_general(
                    ohf, jnp.ones((BN, 1), dtype=jnp.float32),
                    dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=KERNEL_PRECISION,
                )                                                 # [BE, 1]
                dmsgs_out_vmem[slot] = jnp.where(
                    in_col > 0.5, new_dmsgs, dmsgs_old[slot]
                )
                keep_block = _row_to_block(
                    in_tile.astype(jnp.float32), jnp.float32
                )
                dlog_out_vmem[slot] = jnp.where(
                    keep_block > 0.5, _row_to_block(dlog_row, jnp.float32),
                    dlog_old[slot],
                )

            @pl.when(jnp.logical_not(is_boundary(c)))
            def _():
                dmsgs_out_vmem[slot] = new_dmsgs
                dlog_out_vmem[slot] = _row_to_block(dlog_row, jnp.float32)

            for wdma in write_dmas(c, slot):
                wdma.start()
            return 0

        jax.lax.fori_loop(0, nchunks, body, 0)
        # drain outstanding writes
        for tail in range(NBUF):
            cc = nchunks - NBUF + tail

            @pl.when(cc >= 0)
            def _(cc=cc):
                for wdma in write_dmas(cc, jax.lax.rem(cc, NBUF)):
                    wdma.wait()


@functools.partial(jax.jit, static_argnames=("n_rows", "interpret"))
def _fused_backward(msgs, logits, dst, row_offsets, row_max, row_sum, out, g,
                    n_rows, interpret=False):
    d = msgs.shape[1]
    n_tiles = n_rows // BN
    msgs_p, logits_p, dst_p = _pad_edges(msgs, logits, dst, n_rows)
    e_pad = msgs_p.shape[0]
    tile_starts = jnp.concatenate(
        [row_offsets[::BN], row_offsets[-1:]]
    )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((8, BN), lambda i, off: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, BN), lambda i, off: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BN, d), lambda i, off: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BN, d), lambda i, off: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        scratch_shapes=[
            pltpu.VMEM((NBUF, BE, d), jnp.float32),
            pltpu.VMEM((NBUF, BR, LANE), jnp.float32),
            pltpu.VMEM((NBUF, BR, LANE), jnp.int32),
            pltpu.VMEM((NBUF, BE, d), jnp.float32),
            pltpu.VMEM((NBUF, BR, LANE), jnp.float32),
            pltpu.VMEM((NBUF, BE, d), jnp.float32),
            pltpu.VMEM((NBUF, BR, LANE), jnp.float32),
            pltpu.SemaphoreType.DMA((NBUF, 5)),
            pltpu.SemaphoreType.DMA((NBUF, 2)),
        ],
    )
    dmsgs, dlogits = pl.pallas_call(
        _bwd_kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((e_pad, d), jnp.float32),
            jax.ShapeDtypeStruct((e_pad // LANE, LANE), jnp.float32),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(
        tile_starts,
        msgs_p,
        logits_p,
        dst_p,
        row_max,
        row_sum,
        out,
        g,
    )
    e = msgs.shape[0]
    return dmsgs[:e], dlogits.reshape(-1)[:e]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def fused_segment_softmax_spmm(msgs, logits, dst, row_offsets_np, n_rows,
                               interpret=False):
    """out[r] = sum_{e: dst[e]=r} softmax_r(logits)[e] * msgs[e].

    msgs [E, D] float32 (edge-ordered, dst-sorted, D % 128 == 0),
    logits [E] float32, dst [E] int32 ascending.
    row_offsets_np: NUMPY int32 [n_rows+1] (static, scalar-prefetched).
    n_rows must be a multiple of 256 (BN).
    """
    _check_bn_supported(n_rows)
    out, _, _ = _fused_forward(
        msgs, logits, dst, jnp.asarray(row_offsets_np), n_rows, interpret
    )
    return out


def _fssp_fwd(msgs, logits, dst, row_offsets_np, n_rows, interpret):
    out, row_max, row_sum = _fused_forward(
        msgs, logits, dst, jnp.asarray(row_offsets_np), n_rows, interpret
    )
    return out, (msgs, logits, dst, row_max, row_sum, out)


def _fssp_bwd(row_offsets_np, n_rows, interpret, residuals, g):
    msgs, logits, dst, row_max, row_sum, out = residuals
    dmsgs, dlogits = _fused_backward(
        msgs, logits, dst, jnp.asarray(row_offsets_np), row_max, row_sum, out,
        g, n_rows, interpret,
    )
    return dmsgs, dlogits, None


fused_segment_softmax_spmm.defvjp(_fssp_fwd, _fssp_bwd)


# ---------------------------------------------------------------------------
# Plain segment-sum kernel + gather-with-Pallas-scatter VJP (CSC ordering)
#
# XLA lowers scatter-add on TPU to a per-element serial loop, which made the
# gather's transpose (d_x[src[e]] += d_msgs[e]) dominate the backward. This
# routes it through the same one-hot MXU accumulation over the CSC
# (source-sorted) edge ordering produced by the shard compiler.
# ---------------------------------------------------------------------------


def _segsum_kernel(
    off_ref,          # scalar prefetch: CSC row offsets (SMEM)
    vals_ref,         # [E_pad, D] HBM (src-sorted order)
    ids_ref,          # [E_pad/LANE, LANE] HBM (src ids, ascending)
    out_ref,          # [BN, D] VMEM block
    vals_vmem,        # [NBUF, BE, D]
    ids_vmem,         # [NBUF, BR, LANE]
    sems,             # (NBUF, 2)
):
    i = pl.program_id(0)
    start, end, start_al, nchunks = _tile_range(off_ref, i)
    row_base = i * BN

    def start_chunk(c, slot):
        for dma in _chunk_dmas(start_al, c, slot, vals_ref, vals_vmem,
                               ids_ref, ids_vmem, sems):
            dma.start()

    def wait_chunk(c, slot):
        for dma in _chunk_dmas(start_al, c, slot, vals_ref, vals_vmem,
                               ids_ref, ids_vmem, sems):
            dma.wait()

    @pl.when(end > start)
    def _nonempty():
        start_chunk(0, 0)

        def body(c, acc):
            slot = jax.lax.rem(c, NBUF)

            @pl.when(c + 1 < nchunks)
            def _():
                start_chunk(c + 1, jax.lax.rem(c + 1, NBUF))

            wait_chunk(c, slot)
            onehot_t = _onehot_t(_lane_concat(ids_vmem.at[slot]), row_base)
            return acc + jax.lax.dot_general(
                onehot_t.astype(vals_vmem.dtype),
                vals_vmem[slot],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=KERNEL_PRECISION,
            )

        acc = jax.lax.fori_loop(
            0, nchunks, body,
            jnp.zeros((BN, out_ref.shape[1]), dtype=jnp.float32),
        )
        out_ref[:, :] = acc

    @pl.when(end <= start)
    def _empty():
        out_ref[:, :] = jnp.zeros_like(out_ref)


def padded_stream_len(e: int) -> int:
    """Kernel stream length for e rows: BE roundup + one BE overread guard
    (chunk DMAs start LANE-aligned, so the last window can overrun the
    roundup by up to BE - LANE rows)."""
    return ((e + BE - 1) // BE) * BE + BE


def pad_stream_ids_np(ids_np, n_rows: int) -> np.ndarray:
    """Host-side ids pad to padded_stream_len (sentinel n_rows: outside
    every tile's row range, masked by the kernels' one-hot)."""
    ids_np = np.asarray(ids_np)
    out = np.full(padded_stream_len(len(ids_np)), n_rows, np.int32)
    out[: len(ids_np)] = ids_np
    return out


@functools.partial(jax.jit,
                   static_argnames=("n_rows", "interpret", "pre_padded"))
def pallas_segment_sum(vals, ids, row_offsets, n_rows, interpret=False,
                       pre_padded=False):
    """out[r] = sum_{e: ids[e]=r} vals[e]; ids ascending, n_rows % 256 == 0,
    D % 128 == 0. pre_padded: vals/ids already padded_stream_len long
    (sentinel ids = n_rows) — skips the [E, D] pad copy."""
    _check_bn_supported(n_rows)
    d = vals.shape[1]
    n_tiles = n_rows // BN
    if pre_padded:
        assert vals.shape[0] % BE == 0 and vals.shape[0] == ids.shape[0]
        vals_p, ids_p = vals, ids.reshape(-1, LANE)
    else:
        vals_p, _, ids_p = _pad_edges(vals, jnp.zeros(vals.shape[0]), ids,
                                      n_rows)
    tile_starts = jnp.concatenate(
        [row_offsets[::BN], row_offsets[-1:]]
    )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec((BN, d), lambda i, off: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((NBUF, BE, d), vals.dtype),
            pltpu.VMEM((NBUF, BR, LANE), jnp.int32),
            pltpu.SemaphoreType.DMA((NBUF, 2)),
        ],
    )
    (out,) = pl.pallas_call(
        _segsum_kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((n_rows, d), jnp.float32)],
        interpret=interpret,
    )(tile_starts, vals_p, ids_p)
    return out


# ---------------------------------------------------------------------------
# Fragment-windowed segment-sum (chunked-table cotangent permute)
#
# For SNP-shaped merged groups (small src space, huge E) the backward's
# [E, D] cotangent permute to CSC order is a take whose TABLE is the E-row
# cotangent itself — slow-emitter territory whenever E > EMITTER_FAST_ROWS.
# graph/merged_layout.build_csc_windows regroups the CSC stream
# (table_chunk major, src minor) so the permute becomes per-chunk
# fast-emitter takes; this kernel is pallas_segment_sum walking per-tile
# window descriptors over the grouped stream instead of contiguous rows.
# ---------------------------------------------------------------------------


def _make_segsum_win_kernel(split_bases=None):
    """split_bases: vals arrives as len(split_bases)-1 SEPARATE per-cut
    HBM buffers (graph/merged_layout.SplitCscGroup); the window's DMA
    source is branch-selected. Each block carries a BE slack window, so
    overreads stay inside the selected buffer."""
    n_split = 0 if split_bases is None else len(split_bases) - 1

    def kernel(
        doff_ref,         # scalar prefetch: per-src-tile desc ranges
        desc_ref,         # scalar prefetch: window start positions
        *rest,            # vals ref(s), ids ref, out, scratch
    ):
        if split_bases is None:
            vals_ref = rest[0]
            vals_refs = None
            rest = rest[1:]
        else:
            vals_refs = rest[:n_split]
            vals_ref = None
            rest = rest[n_split:]
        ids_ref, out_ref, vals_vmem, ids_vmem, sems = rest
        i = pl.program_id(0)
        dlo = doff_ref[i]
        nwin = doff_ref[i + 1] - dlo
        row_base = i * BN

        def win_op(c, slot, op):
            # LANE re-derivation: numeric no-op, gives Mosaic the
            # divisibility proof packed-dtype HBM tilings need
            s = (desc_ref[dlo + c] // LANE) * LANE
            if split_bases is None:
                dma = pltpu.make_async_copy(
                    vals_ref.at[pl.ds(s, BE), :], vals_vmem.at[slot],
                    sems.at[slot, 0],
                )
                dma.start() if op == "start" else dma.wait()
            else:
                def _go(k, off):
                    dma = pltpu.make_async_copy(
                        vals_refs[k].at[pl.ds(off // LANE * LANE, BE), :],
                        vals_vmem.at[slot], sems.at[slot, 0],
                    )
                    dma.start() if op == "start" else dma.wait()
                dispatch_by_bases(s, split_bases, _go)
            dma = pltpu.make_async_copy(
                ids_ref.at[pl.ds(s // LANE, BR), :], ids_vmem.at[slot],
                sems.at[slot, 1],
            )
            dma.start() if op == "start" else dma.wait()

        @pl.when(nwin > 0)
        def _nonempty():
            win_op(0, 0, "start")

            def body(c, acc):
                slot = jax.lax.rem(c, NBUF)

                @pl.when(c + 1 < nwin)
                def _():
                    win_op(c + 1, jax.lax.rem(c + 1, NBUF), "start")

                win_op(c, slot, "wait")
                # one-hot masks rows of foreign tiles inside the window
                onehot_t = _onehot_t(_lane_concat(ids_vmem.at[slot]),
                                     row_base)
                return acc + jax.lax.dot_general(
                    onehot_t.astype(vals_vmem.dtype),
                    vals_vmem[slot],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=KERNEL_PRECISION,
                )

            acc = jax.lax.fori_loop(
                0, nwin, body,
                jnp.zeros((BN, out_ref.shape[1]), dtype=jnp.float32),
            )
            out_ref[:, :] = acc

        @pl.when(nwin <= 0)
        def _empty():
            out_ref[:, :] = jnp.zeros_like(out_ref)

    return kernel


@functools.partial(jax.jit,
                   static_argnames=("n_rows", "interpret", "pre_padded",
                                    "split_bases"))
def segment_sum_windows(vals, ids, desc, desc_offsets, n_rows,
                        interpret=False, pre_padded=False,
                        split_bases=None):
    """out[r] = sum_{e: ids[e]=r} vals[e] over a fragment-windowed stream.

    vals/ids in graph/merged_layout.CscWindowLayout grouped order; desc /
    desc_offsets its per-src-tile window descriptors. Every stream position
    is covered by exactly one window of its own tile; window overreads hit
    foreign-tile rows, which the one-hot zeroes. n_rows % BN == 0.
    pre_padded: as in pallas_segment_sum. split_bases: vals is a TUPLE of
    per-cut buffers (graph/merged_layout.SplitCscGroup) — the window DMA
    source is branch-selected; no concat ever materializes."""
    _check_bn_supported(n_rows)
    n_tiles = n_rows // BN
    if split_bases is not None:
        d = vals[0].shape[1]
        dtype = vals[0].dtype
        assert ids.shape[0] == split_bases[-1]
        vals_args = tuple(vals)
        ids_p = ids.reshape(-1, LANE)
    elif pre_padded:
        d = vals.shape[1]
        dtype = vals.dtype
        assert vals.shape[0] % BE == 0 and vals.shape[0] == ids.shape[0]
        vals_args, ids_p = (vals,), ids.reshape(-1, LANE)
    else:
        d = vals.shape[1]
        dtype = vals.dtype
        vals_p, _, ids_p = _pad_edges(vals, jnp.zeros(vals.shape[0]), ids,
                                      n_rows)
        vals_args = (vals_p,)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_tiles,),
        in_specs=(
            [pl.BlockSpec(memory_space=pl.ANY)] * len(vals_args)
            + [pl.BlockSpec(memory_space=pl.ANY)]
        ),
        out_specs=[
            pl.BlockSpec((BN, d), lambda i, doff, dsc: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((NBUF, BE, d), dtype),
            pltpu.VMEM((NBUF, BR, LANE), jnp.int32),
            pltpu.SemaphoreType.DMA((NBUF, 2)),
        ],
    )
    (out,) = pl.pallas_call(
        _make_segsum_win_kernel(split_bases),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((n_rows, d), jnp.float32)],
        interpret=interpret,
    )(desc_offsets, desc, *vals_args, ids_p)
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6, 7, 8))
def gather_rows_csc_win(x, idx, edge_bounds_np, local_perm_np, ids_np,
                        desc_np, desc_off_np, n_src_rows, interpret=False):
    """jnp.take(x, idx) whose BACKWARD avoids the slow big-table permute.

    Plain-stream analog of gather_rows_chunked's backward trick for groups
    where the forward table is already fast but E > EMITTER_FAST_ROWS
    (SNP-shaped: small src space, huge edge count). Layout arrays from
    graph/merged_layout.build_csc_windows. Replaces the reference's
    torch_scatter transpose (reference kgwas/conv.py:227-228)."""
    return jnp.take(x, idx, axis=0)


def _grcw_fwd(x, idx, edge_bounds_np, local_perm_np, ids_np, desc_np,
              desc_off_np, n_src_rows, interpret):
    return jnp.take(x, idx, axis=0), None


def _grcw_bwd(edge_bounds_np, local_perm_np, ids_np, desc_np, desc_off_np,
              n_src_rows, interpret, _res, g):
    eb = [int(b) for b in edge_bounds_np]
    parts = [
        jnp.take(g[eb[c]:eb[c + 1]], jnp.asarray(local_perm_np[c]), axis=0)
        for c in range(len(local_perm_np))
    ]
    e = sum(len(p) for p in local_perm_np)
    parts.append(jnp.zeros((padded_stream_len(e) - e, g.shape[1]), g.dtype))
    gc = jnp.concatenate(parts, axis=0)
    dx = segment_sum_windows(
        gc,
        jnp.asarray(pad_stream_ids_np(ids_np, n_src_rows)),
        jnp.asarray(desc_np if len(desc_np) else np.zeros(1, np.int32)),
        jnp.asarray(desc_off_np),
        n_src_rows,
        interpret,
        pre_padded=True,
    )
    return dx, None


gather_rows_csc_win.defvjp(_grcw_fwd, _grcw_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def segment_sum_edges(vals, ids, row_offsets, n_rows, interpret=False):
    """Differentiable dst-sorted segment-sum over the Pallas kernel.

    vals [E, D] float (edge-ordered, dst-sorted), ids [E] int32 ascending,
    row_offsets [n_rows+1] int32 (traced is fine). Forward runs the tiled
    MXU accumulation kernel (XLA's TPU scatter is a serial per-element
    loop); backward is the transpose — a plain row gather d_vals = g[ids].
    Used by the sigmoid/raw GAT modes (models/convs.py), which weight
    messages per edge without softmax normalization (reference
    kgwas/conv.py:219-223)."""
    tile_starts = jnp.concatenate([row_offsets[::BN], row_offsets[-1:]])
    return _pallas_segment_sum_ts(vals, ids, tile_starts, n_rows, interpret)


def _sse_fwd(vals, ids, row_offsets, n_rows, interpret):
    return segment_sum_edges(vals, ids, row_offsets, n_rows, interpret), ids


def _sse_bwd(n_rows, interpret, ids, g):
    return jnp.take(g, ids, axis=0), None, None


segment_sum_edges.defvjp(_sse_fwd, _sse_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6))
def gather_rows_csc(x, idx, csc_perm_np, csc_ids_np, csc_offsets_np,
                    n_src_rows, interpret=False):
    """x[idx] with the transpose (scatter-add by idx) computed by the Pallas
    segment-sum over the CSC ordering instead of XLA's serial scatter.

    csc_perm_np[i] = dst-sorted edge position of the i-th src-sorted edge;
    csc_ids_np = src ids in ascending order; csc_offsets_np = CSC offsets.
    All numpy (static). n_src_rows % 256 == 0.
    """
    return jnp.take(x, idx, axis=0)


def _grc_fwd(x, idx, csc_perm_np, csc_ids_np, csc_offsets_np, n_src_rows,
             interpret):
    return jnp.take(x, idx, axis=0), None


def _grc_bwd(csc_perm_np, csc_ids_np, csc_offsets_np, n_src_rows, interpret,
             _res, g):
    # pad the STATIC perm so the take itself emits the kernel's padded
    # stream (pad rows reread g[0]; sentinel ids mask them) — avoids a
    # separate full-stream pad copy
    perm = np.asarray(csc_perm_np)
    perm_p = np.zeros(padded_stream_len(len(perm)), np.int32)
    perm_p[: len(perm)] = perm
    g_sorted = jnp.take(g, jnp.asarray(perm_p), axis=0)
    dx = pallas_segment_sum(
        g_sorted,
        jnp.asarray(pad_stream_ids_np(csc_ids_np, n_src_rows)),
        jnp.asarray(csc_offsets_np),
        n_src_rows,
        interpret,
        pre_padded=True,
    )
    return dx, None


gather_rows_csc.defvjp(_grc_fwd, _grc_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3, 4, 5, 6, 7))
def gather_rows_chunked(tabs, local_ids_np, local_perm_np,
                        chunk_edge_base_np, csc_ids_np, csc_offsets_np,
                        n_src_rows, interpret=False):
    """Chunked fast-emitter gather: concat of per-chunk jnp.take calls.

    tabs: tuple of [rows_c, D] arrays (relation-aligned slices of the
    logical concat projected-feature space, graph/merged_layout.py
    ChunkedStreamLayout); local_ids_np: per-chunk int32 index vectors.
    Output rows land in the chunked stream order (chunk-major). XLA's
    small-table gather emitter is ~3x faster per row than the big-table
    one (scripts/exp_emitter_probe.py), which is what this buys.

    Backward: the [E, D] cotangent permute to CSC (src-sorted) order is
    block-diagonal over chunks (ChunkedStreamLayout.local_perm), so it too
    decomposes into per-chunk fast-emitter takes; then the Pallas
    segment-sum reduces over the concat src space and splits per chunk —
    identical math to gather_rows_csc's backward.
    """
    parts = [jnp.take(t, jnp.asarray(ids), axis=0)
             for t, ids in zip(tabs, local_ids_np)]
    return jnp.concatenate(parts, axis=0) if len(parts) > 1 else parts[0]


def _grch_fwd(tabs, local_ids_np, local_perm_np, chunk_edge_base_np,
              csc_ids_np, csc_offsets_np, n_src_rows, interpret):
    out = gather_rows_chunked(tabs, local_ids_np, local_perm_np,
                              chunk_edge_base_np, csc_ids_np, csc_offsets_np,
                              n_src_rows, interpret)
    return out, tuple(t.shape[0] for t in tabs)


def _grch_bwd(local_ids_np, local_perm_np, chunk_edge_base_np, csc_ids_np,
              csc_offsets_np, n_src_rows, interpret, res, g):
    tab_rows = res
    ceb = [int(b) for b in chunk_edge_base_np]
    parts = [
        jnp.take(g[ceb[c]:ceb[c + 1]], jnp.asarray(local_perm_np[c]), axis=0)
        for c in range(len(local_perm_np))
    ]
    # zeros pad part rides the existing concat pass (sentinel ids mask it)
    e = sum(len(p) for p in local_perm_np)
    parts.append(jnp.zeros((padded_stream_len(e) - e, g.shape[1]), g.dtype))
    g_sorted = jnp.concatenate(parts, axis=0)
    dx = pallas_segment_sum(
        g_sorted,
        jnp.asarray(pad_stream_ids_np(csc_ids_np, n_src_rows)),
        jnp.asarray(csc_offsets_np),
        n_src_rows,
        interpret,
        pre_padded=True,
    )
    outs, o = [], 0
    for r in tab_rows:
        outs.append(dx[o:o + r])
        o += r
    return (tuple(outs),)


gather_rows_chunked.defvjp(_grch_fwd, _grch_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def gather_rows_csc_t(x, idx, csc_perm, csc_ids, csc_offsets, n_src_rows,
                      interpret=False):
    """gather_rows_csc with TRACED int layout arrays (shard_map variant)."""
    return jnp.take(x, idx, axis=0)


def _grct_fwd(x, idx, csc_perm, csc_ids, csc_offsets, n_src_rows, interpret):
    return jnp.take(x, idx, axis=0), (csc_perm, csc_ids, csc_offsets)


def _grct_bwd(n_src_rows, interpret, res, g):
    csc_perm, csc_ids, csc_offsets = res
    g_sorted = jnp.take(g, csc_perm, axis=0)
    tile_starts = jnp.concatenate([csc_offsets[::BN], csc_offsets[-1:]])
    dx = _pallas_segment_sum_ts(g_sorted, csc_ids, tile_starts, n_src_rows,
                                interpret)
    return dx, None, None, None, None


@functools.partial(jax.jit, static_argnames=("n_rows", "interpret"))
def _pallas_segment_sum_ts(vals, ids, tile_starts, n_rows, interpret=False):
    d = vals.shape[1]
    n_tiles = n_rows // BN
    vals_p, _, ids_p = _pad_edges(vals, jnp.zeros(vals.shape[0]), ids, n_rows)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec((BN, d), lambda i, off: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((NBUF, BE, d), vals.dtype),
            pltpu.VMEM((NBUF, BR, LANE), jnp.int32),
            pltpu.SemaphoreType.DMA((NBUF, 2)),
        ],
    )
    (out,) = pl.pallas_call(
        _segsum_kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((n_rows, d), jnp.float32)],
        interpret=interpret,
    )(tile_starts, vals_p, ids_p)
    return out


gather_rows_csc_t.defvjp(_grct_fwd, _grct_bwd)
