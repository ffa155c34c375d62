"""Pallas TPU kernels: fused segment-softmax + weighted aggregation (GAT core).

This is the speed-of-light replacement for the XLA composite in
ops/segment.py (itself the replacement for torch_scatter CUDA kernels,
reference kgwas/conv.py:223,227-228). The XLA path materializes softmax
intermediates and runs separate scatter kernels; this kernel makes ONE pass
over the destination-sorted edge stream per phase:

  phase 1 (per dst-row tile): running max of logits per row
  phase 2: exp/accumulate numerator + denominator, then normalize

HBM traffic ~= read(msgs) + 2*read(logits) + write(out): the roofline for
this op.

Mosaic layout rules shape the implementation:
  * feature dim D must be a multiple of 128 (hidden=128 default)
  * per-edge scalars (logits, dst) live in HBM as [E/128, 128] lane-rows;
    chunks are DMA'd as (BE/128, 128) blocks at 128-aligned starts and
    lane-concatenated to a (1, BE) row — no cross-lane reshapes
  * the one-hot is built TRANSPOSED: onehotT[n, e] = (dst[e] == row_base+n)
    via a (BN,1) x (1,BE) broadcast compare; per-edge softmax scaling folds
    into the one-hot columns, so the MXU matmul (onehotT*p) @ msgs does
    scatter-reduce and scaling in one shot
  * column<->row conversions go through an identity matmul (MXU transpose)
  * chunk windows of adjacent tiles can overlap by <128 edges; out-of-tile
    lanes are masked by the one-hot, and the backward merges overlapping
    edge-gradient writes read-modify-write (the sequential TPU grid makes
    the previous tile's writes visible)

The custom VJP recomputes alpha from saved (row_max, row_sum) residuals — no
[E] softmax array ever hits HBM.
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
EXP_CLAMP = 60.0  # out-of-tile lanes would overflow exp otherwise

LANE = 128
BN = 256   # dst rows per program
BE = 512   # edges per inner chunk (multiple of LANE)
BR = BE // LANE


def _tile_range(off_ref, i):
    start = off_ref[i * BN]
    end = off_ref[(i + 1) * BN]
    start_al = (start // LANE) * LANE
    return start, end, start_al, pl.cdiv(end - start_al, BE)


def _lane_concat(block_ref):
    """(BR, LANE) VMEM block -> (1, BE) row via lane concatenation."""
    rows = [block_ref[r : r + 1, :] for r in range(BR)]
    return jnp.concatenate(rows, axis=1)


def _row_to_block(row, dtype):
    """(1, BE) row -> (BR, LANE) by 128-aligned lane slices."""
    parts = [row[0:1, r * LANE : (r + 1) * LANE] for r in range(BR)]
    return jnp.concatenate(parts, axis=0).astype(dtype)


def _onehot_t(dst_row, row_base):
    """Transposed one-hot [BN, BE]: onehotT[n, e] = dst[e] == row_base + n."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (BN, BE), 0) + row_base
    return rows == dst_row  # (1, BE) broadcasts against (BN, BE)


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
        onehot_t = _onehot_t(_lane_concat(dst_vmem), row_base)   # [BN, BE]
        l_row = _lane_concat(logits_vmem)                        # [1, BE]
        contrib = jnp.where(onehot_t, l_row, NEG_BIG)            # [BN, BE]
        return jnp.maximum(row_max, jnp.max(contrib, axis=1))    # [BN]

    row_max = jax.lax.fori_loop(
        0, nchunks, max_body, jnp.full((BN,), NEG_BIG, dtype=jnp.float32)
    )

    # ---- phase 2: accumulate numerator / denominator ----
    def acc_body(c, carry):
        acc, row_sum = carry
        load_chunk(c)
        onehot_t = _onehot_t(_lane_concat(dst_vmem), row_base)
        l_row = _lane_concat(logits_vmem)
        # per-edge row max: project row_max through the one-hot
        m_row = jnp.max(jnp.where(onehot_t, row_max[:, None], NEG_BIG),
                        axis=0, keepdims=True)                   # [1, BE]
        in_tile = onehot_t.any(axis=0, keepdims=True)            # [1, BE]
        p_row = jnp.exp(jnp.minimum(l_row - m_row, EXP_CLAMP))
        p_row = jnp.where(in_tile, p_row, 0.0)                   # [1, BE]
        oh_p = onehot_t.astype(jnp.float32) * p_row              # [BN, BE]
        row_sum = row_sum + jnp.sum(oh_p, axis=1)                # [BN]
        acc = acc + jax.lax.dot_general(
            oh_p,
            msgs_vmem[:, :],
            dimension_numbers=(((1,), (0,)), ((), ())),          # [BN, D]
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
    max_ref[0:1, :] = row_max[None, :]
    sum_ref[0:1, :] = row_sum[None, :]


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
            pl.BlockSpec((8, BN), lambda i, off: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, BN), lambda i, off: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((BE, d), jnp.float32),
            pltpu.VMEM((BR, LANE), jnp.float32),
            pltpu.VMEM((BR, LANE), jnp.int32),
            pltpu.SemaphoreType.DMA((3,)),
        ],
    )
    # residuals padded to 8-sublane blocks (Mosaic block-shape rule); only
    # sublane 0 of each tile's block is meaningful
    out, row_max, row_sum = pl.pallas_call(
        _fwd_kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n_rows, d), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles * 8, BN), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles * 8, BN), jnp.float32),
        ],
        interpret=interpret,
    )(row_offsets, msgs_p, logits_p, dst_p)
    return out, row_max, row_sum


def _bwd_kernel(
    off_ref,
    msgs_ref,         # [E_pad, D] HBM
    logits_ref,       # [E_pad/LANE, LANE] HBM
    dst_ref,          # [E_pad/LANE, LANE] HBM
    ident_ref,        # [BE, BE] VMEM identity (col<->row MXU transpose)
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
    row_max_v = rmax_ref[0, :]                            # [BN]
    inv_sum = 1.0 / (rsum_ref[0, :] + EPS)                # [BN]

    def body(c, _):
        s = start_al + c * BE
        r = s // LANE
        cp1 = pltpu.make_async_copy(msgs_ref.at[pl.ds(s, BE), :], msgs_vmem,
                                    sems.at[0])
        cp2 = pltpu.make_async_copy(logits_ref.at[pl.ds(r, BR), :],
                                    logits_vmem, sems.at[1])
        cp3 = pltpu.make_async_copy(dst_ref.at[pl.ds(r, BR), :], dst_vmem,
                                    sems.at[2])
        cp6 = pltpu.make_async_copy(dmsgs_ref.at[pl.ds(s, BE), :], dmsgs_old,
                                    sems.at[3])
        cp7 = pltpu.make_async_copy(dlogits_ref.at[pl.ds(r, BR), :],
                                    dlogits_old, sems.at[4])
        cp1.start(); cp2.start(); cp3.start(); cp6.start(); cp7.start()
        cp1.wait(); cp2.wait(); cp3.wait(); cp6.wait(); cp7.wait()

        onehot_t = _onehot_t(_lane_concat(dst_vmem), row_base)   # [BN, BE]
        ohf = onehot_t.astype(jnp.float32)
        in_tile = onehot_t.any(axis=0, keepdims=True)            # [1, BE]
        l_row = _lane_concat(logits_vmem)                        # [1, BE]
        m_row = jnp.max(jnp.where(onehot_t, row_max_v[:, None], NEG_BIG),
                        axis=0, keepdims=True)
        inv_row = jax.lax.dot_general(
            inv_sum[None, :], ohf,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                         # [1, BE]
        p_row = jnp.exp(jnp.minimum(l_row - m_row, EXP_CLAMP)) * inv_row
        p_row = jnp.where(in_tile, p_row, 0.0)

        oh_p = ohf * p_row                                        # [BN, BE]
        # d_msgs[e] = p[e] * g[dst[e]] = (oh_p)^T @ g
        new_dmsgs = jax.lax.dot_general(
            oh_p, g_ref[:, :],
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                         # [BE, D]
        # per-edge gathered g rows (unscaled) for msgs . g
        g_e = jax.lax.dot_general(
            ohf, g_ref[:, :],
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                         # [BE, D]
        msg_dot_col = jnp.sum(msgs_vmem[:, :] * g_e, axis=1,
                              keepdims=True)                      # [BE, 1]
        msg_dot_row = jax.lax.dot_general(
            msg_dot_col, ident_ref[:, :],
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                         # [1, BE]
        dot_e_row = jax.lax.dot_general(
            dot_r[None, :], ohf,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                         # [1, BE]
        dlog_row = p_row * (msg_dot_row - dot_e_row)              # [1, BE]

        # merge with previous values for out-of-tile lanes
        in_tile_colv = jax.lax.dot_general(
            ident_ref[:, :], in_tile.astype(jnp.float32),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                         # [BE, 1]
        dmsgs_vmem[:, :] = jnp.where(
            in_tile_colv > 0.5, new_dmsgs, dmsgs_old[:, :]
        )
        dlog_block = _row_to_block(dlog_row, jnp.float32)
        keep_block = _row_to_block(in_tile.astype(jnp.float32), jnp.float32)
        dlogits_vmem[:, :] = jnp.where(
            keep_block > 0.5, dlog_block, dlogits_old[:, :]
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
    ident = jnp.eye(BE, dtype=jnp.float32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((BE, BE), lambda i, off: (0, 0),
                         memory_space=pltpu.VMEM),
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
        ident,
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


# ---------------------------------------------------------------------------
# Plain segment-sum kernel + gather-with-Pallas-scatter VJP
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
    vals_vmem,
    ids_vmem,
    sems,
):
    i = pl.program_id(0)
    start, end, start_al, nchunks = _tile_range(off_ref, i)
    row_base = i * BN

    def body(c, acc):
        s = start_al + c * BE
        r = s // LANE
        cp1 = pltpu.make_async_copy(vals_ref.at[pl.ds(s, BE), :], vals_vmem,
                                    sems.at[0])
        cp2 = pltpu.make_async_copy(ids_ref.at[pl.ds(r, BR), :], ids_vmem,
                                    sems.at[1])
        cp1.start(); cp2.start()
        cp1.wait(); cp2.wait()
        onehot_t = _onehot_t(_lane_concat(ids_vmem), row_base)
        return acc + jax.lax.dot_general(
            onehot_t.astype(jnp.float32),
            vals_vmem[:, :],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    acc = jax.lax.fori_loop(
        0, nchunks, body,
        jnp.zeros((BN, out_ref.shape[1]), dtype=jnp.float32),
    )
    out_ref[:, :] = acc


@functools.partial(jax.jit, static_argnames=("n_rows", "interpret"))
def pallas_segment_sum(vals, ids, row_offsets, n_rows, interpret=False):
    """out[r] = sum_{e: ids[e]=r} vals[e]; ids ascending, n_rows % 256 == 0,
    D % 128 == 0."""
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
            pltpu.VMEM((BE, d), jnp.float32),
            pltpu.VMEM((BR, LANE), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    (out,) = pl.pallas_call(
        _segsum_kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((n_rows, d), jnp.float32)],
        interpret=interpret,
    )(row_offsets, vals_p, ids_p)
    return out


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
    g_sorted = jnp.take(g, jnp.asarray(csc_perm_np), axis=0)
    dx = pallas_segment_sum(
        g_sorted,
        jnp.asarray(csc_ids_np),
        jnp.asarray(csc_offsets_np),
        n_src_rows,
        interpret,
    )
    return dx, None


gather_rows_csc.defvjp(_grc_fwd, _grc_bwd)
