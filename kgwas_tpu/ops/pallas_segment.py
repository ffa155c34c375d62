"""Pallas TPU kernels: fused segment-softmax + weighted aggregation (GAT core).

This is the speed-of-light replacement for the XLA composite in
ops/segment.py (itself the replacement for torch_scatter CUDA kernels,
reference kgwas/conv.py:223,227-228). The XLA path materializes softmax
intermediates and runs separate scatter kernels; this kernel makes ONE pass
over the destination-sorted edge stream per phase:

  phase 1 (per dst-row tile): running max of logits per row
  phase 2: exp/accumulate numerator (one-hot MXU matmul onto the row tile)
           and denominator, then normalize

HBM traffic ~= read(msgs) + 2*read(logits) + write(out): the roofline for
this op.

TPU layout constraints honored here (Mosaic requires 128-lane-aligned
slices):
  * feature dim D must be a multiple of 128 (hidden=128 default)
  * logits/dst are stored as [E_pad/128, 128] so chunk DMAs slice whole
    lane-rows; chunk starts are rounded down to 128-edge boundaries and
    out-of-tile edges are masked via the dst one-hot
  * the backward writes edge-gradient chunks with read-modify-write merges:
    the sequential TPU grid makes the previous tile's trailing writes visible,
    so overlapping 128-edge boundary regions combine correctly

Custom VJP recomputes alpha from saved (row_max, row_sum) residuals — no [E]
softmax array ever hits HBM.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_BIG = -1e9
EPS = 1e-16
EXP_CLAMP = 60.0  # exp arg clamp: out-of-tile lanes would overflow otherwise

LANE = 128
BN = 256   # dst rows per program
BE = 512   # edges per inner chunk (multiple of LANE)
BR = BE // LANE


def _tile_range(off_ref, i):
    start = off_ref[i * BN]
    end = off_ref[(i + 1) * BN]
    start_al = (start // LANE) * LANE
    return start, end, start_al, pl.cdiv(end - start_al, BE)


def _onehot_for_chunk(dst_vmem, row_base):
    """dst chunk [BR, LANE] -> bool one-hot [BE, BN] vs this tile's rows."""
    local = dst_vmem[:, :].reshape(BE, 1) - row_base
    return local == jax.lax.broadcasted_iota(jnp.int32, (BE, BN), 1)


def _fwd_kernel(
    off_ref,          # scalar prefetch: row offsets [N_pad + 1] (SMEM)
    msgs_ref,         # [E_pad, D] HBM
    logits_ref,       # [E_pad/LANE, LANE] HBM
    dst_ref,          # [E_pad/LANE, LANE] HBM (int32)
    out_ref,          # [BN, D] VMEM block
    max_ref,          # [BN] VMEM block
    sum_ref,          # [BN] VMEM block
    msgs_vmem,        # scratch [BE, D]
    logits_vmem,      # scratch [BR, LANE]
    dst_vmem,         # scratch [BR, LANE] int32
    sems,             # DMA semaphores (3,)
):
    i = pl.program_id(0)
    start, end, start_al, nchunks = _tile_range(off_ref, i)
    row_base = i * BN

    def load_chunk(c):
        s = start_al + c * BE
        r = s // LANE
        cp1 = pltpu.make_async_copy(
            msgs_ref.at[pl.ds(s, BE), :], msgs_vmem, sems.at[0]
        )
        cp2 = pltpu.make_async_copy(
            logits_ref.at[pl.ds(r, BR), :], logits_vmem, sems.at[1]
        )
        cp3 = pltpu.make_async_copy(
            dst_ref.at[pl.ds(r, BR), :], dst_vmem, sems.at[2]
        )
        cp1.start(); cp2.start(); cp3.start()
        cp1.wait(); cp2.wait(); cp3.wait()

    # ---- phase 1: per-row max ----
    def max_body(c, row_max):
        load_chunk(c)
        onehot = _onehot_for_chunk(dst_vmem, row_base)              # [BE, BN]
        lg = logits_vmem[:, :].reshape(BE, 1)
        contrib = jnp.where(onehot, lg, NEG_BIG)
        return jnp.maximum(row_max, jnp.max(contrib, axis=0))

    row_max = jax.lax.fori_loop(
        0, nchunks, max_body, jnp.full((BN,), NEG_BIG, dtype=jnp.float32)
    )

    # ---- phase 2: accumulate numerator / denominator ----
    def acc_body(c, carry):
        acc, row_sum = carry
        load_chunk(c)
        onehot = _onehot_for_chunk(dst_vmem, row_base)
        in_tile = onehot.any(axis=1, keepdims=True)                  # [BE, 1]
        lg = logits_vmem[:, :].reshape(BE, 1)
        m_e = jnp.max(jnp.where(onehot, row_max[None, :], NEG_BIG), axis=1,
                      keepdims=True)
        p = jnp.exp(jnp.minimum(lg - m_e, EXP_CLAMP))
        p = jnp.where(in_tile, p, 0.0)                               # [BE, 1]
        row_sum = row_sum + jnp.sum(jnp.where(onehot, p, 0.0), axis=0)
        acc = acc + jax.lax.dot_general(
            onehot.astype(jnp.float32),
            msgs_vmem[:, :] * p,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return acc, row_sum

    acc, row_sum = jax.lax.fori_loop(
        0,
        nchunks,
        acc_body,
        (
            jnp.zeros((BN, out_ref.shape[1]), dtype=jnp.float32),
            jnp.zeros((BN,), dtype=jnp.float32),
        ),
    )
    out_ref[:, :] = acc / (row_sum + EPS)[:, None]
    max_ref[:] = row_max
    sum_ref[:] = row_sum


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
            pl.BlockSpec((BN,), lambda i, off: (i,), memory_space=pltpu.VMEM),
            pl.BlockSpec((BN,), lambda i, off: (i,), memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((BE, d), jnp.float32),
            pltpu.VMEM((BR, LANE), jnp.float32),
            pltpu.VMEM((BR, LANE), jnp.int32),
            pltpu.SemaphoreType.DMA((3,)),
        ],
    )
    out, row_max, row_sum = pl.pallas_call(
        _fwd_kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n_rows, d), jnp.float32),
            jax.ShapeDtypeStruct((n_rows,), jnp.float32),
            jax.ShapeDtypeStruct((n_rows,), jnp.float32),
        ],
        interpret=interpret,
    )(row_offsets, msgs_p, logits_p, dst_p)
    return out, row_max, row_sum


def _bwd_kernel(
    off_ref,
    msgs_ref,         # [E_pad, D] HBM
    logits_ref,       # [E_pad/LANE, LANE] HBM
    dst_ref,          # [E_pad/LANE, LANE] HBM
    rmax_ref,         # [BN] VMEM block
    rsum_ref,         # [BN] VMEM block
    out_ref,          # [BN, D] VMEM block (primal output)
    g_ref,            # [BN, D] VMEM block (cotangent)
    dmsgs_ref,        # [E_pad, D] HBM output
    dlogits_ref,      # [E_pad/LANE, LANE] HBM output
    msgs_vmem,
    logits_vmem,
    dst_vmem,
    dmsgs_vmem,
    dmsgs_old,
    dlogits_vmem,
    dlogits_old,
    sems,
):
    i = pl.program_id(0)
    start, end, start_al, nchunks = _tile_range(off_ref, i)
    row_base = i * BN

    dot_r = jnp.sum(out_ref[:, :] * g_ref[:, :], axis=1)  # [BN]
    inv_sum = 1.0 / (rsum_ref[:] + EPS)                   # [BN]

    def body(c, _):
        s = start_al + c * BE
        r = s // LANE
        cp1 = pltpu.make_async_copy(msgs_ref.at[pl.ds(s, BE), :], msgs_vmem,
                                    sems.at[0])
        cp2 = pltpu.make_async_copy(logits_ref.at[pl.ds(r, BR), :],
                                    logits_vmem, sems.at[1])
        cp3 = pltpu.make_async_copy(dst_ref.at[pl.ds(r, BR), :], dst_vmem,
                                    sems.at[2])
        # read current grads for merge (previous tile's trailing writes —
        # the sequential grid guarantees they landed already)
        cp6 = pltpu.make_async_copy(dmsgs_ref.at[pl.ds(s, BE), :], dmsgs_old,
                                    sems.at[3])
        cp7 = pltpu.make_async_copy(dlogits_ref.at[pl.ds(r, BR), :],
                                    dlogits_old, sems.at[4])
        cp1.start(); cp2.start(); cp3.start(); cp6.start(); cp7.start()
        cp1.wait(); cp2.wait(); cp3.wait(); cp6.wait(); cp7.wait()

        onehot = _onehot_for_chunk(dst_vmem, row_base)
        in_tile = onehot.any(axis=1, keepdims=True)
        ohf = onehot.astype(jnp.float32)
        lg = logits_vmem[:, :].reshape(BE, 1)
        m_e = jnp.max(jnp.where(onehot, rmax_ref[:][None, :], NEG_BIG), axis=1,
                      keepdims=True)
        inv_e = jax.lax.dot_general(
            ohf, inv_sum[:, None],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        p = jnp.exp(jnp.minimum(lg - m_e, EXP_CLAMP)) * inv_e
        p = jnp.where(in_tile, p, 0.0)

        g_e = jax.lax.dot_general(
            ohf, g_ref[:, :],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                  # [BE, D]
        dot_e = jax.lax.dot_general(
            ohf, dot_r[:, None],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                  # [BE, 1]

        new_dmsgs = p * g_e
        msg_dot_g = jnp.sum(msgs_vmem[:, :] * g_e, axis=1, keepdims=True)
        new_dlog = p * (msg_dot_g - dot_e)

        # merge: keep previous values for out-of-tile lanes
        dmsgs_vmem[:, :] = jnp.where(in_tile, new_dmsgs, dmsgs_old[:, :])
        dlogits_vmem[:, :] = jnp.where(
            in_tile.reshape(BR, LANE), new_dlog.reshape(BR, LANE),
            dlogits_old[:, :],
        )

        cp4 = pltpu.make_async_copy(dmsgs_vmem, dmsgs_ref.at[pl.ds(s, BE), :],
                                    sems.at[0])
        cp5 = pltpu.make_async_copy(dlogits_vmem,
                                    dlogits_ref.at[pl.ds(r, BR), :], sems.at[1])
        cp4.start(); cp5.start()
        cp4.wait(); cp5.wait()
        return 0

    jax.lax.fori_loop(0, nchunks, body, 0)


@functools.partial(jax.jit, static_argnames=("n_rows", "interpret"))
def _fused_backward(msgs, logits, dst, row_offsets, row_max, row_sum, out, g,
                    n_rows, interpret=False):
    d = msgs.shape[1]
    n_tiles = n_rows // BN
    msgs_p, logits_p, dst_p = _pad_edges(msgs, logits, dst, n_rows)
    e_pad = msgs_p.shape[0]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((BN,), lambda i, off: (i,), memory_space=pltpu.VMEM),
            pl.BlockSpec((BN,), lambda i, off: (i,), memory_space=pltpu.VMEM),
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
            pltpu.VMEM((BE, d), jnp.float32),
            pltpu.VMEM((BR, LANE), jnp.float32),
            pltpu.VMEM((BR, LANE), jnp.int32),
            pltpu.VMEM((BE, d), jnp.float32),
            pltpu.VMEM((BE, d), jnp.float32),
            pltpu.VMEM((BR, LANE), jnp.float32),
            pltpu.VMEM((BR, LANE), jnp.float32),
            pltpu.SemaphoreType.DMA((5,)),
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
        row_offsets,
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
