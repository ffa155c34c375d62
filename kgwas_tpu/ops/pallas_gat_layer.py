"""Fused merged-relation GAT layer kernel.

One kernel call per destination node type per layer computes, over the
merged edge stream of ALL relations targeting that type
(graph/merged_layout.py):

    z_e   = att_r . msgs_e + a_dst[dst_e]          (attention logit;
                                                    att_r . xs_r[src] ==
                                                    a_src_r[src], reference
                                                    kgwas/conv.py:150-152)
    l_e   = leaky_relu(z_e, slope) / temperature   (conv.py:217,223)
    alpha = softmax_l over the dst segment          (per-relation: segments
                                                    live in disjoint row
                                                    blocks per relation)
    out   = sum_e alpha_e * msgs_e                  (conv.py:227-228)

compared to the per-relation pipeline this removes per-relation kernel
launches, ALL a_src/a_dst scalar gathers (logits are produced on the fly
from per-tile attention vectors — each 256-row tile belongs to exactly one
relation, selected via a scalar-prefetched tile2rel map in the BlockSpec
index functions), and the [E] logits arrays in HBM entirely.

Same Mosaic discipline as pallas_segment.py: lane-row scalars, transposed
one-hot, online softmax, double-buffered DMA, empty-tile skip, boundary
merges in the backward.
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_segment import (
    BE,
    BN,
    BR,
    EPS,
    EXP_CLAMP,
    KERNEL_PRECISION,
    LANE,
    NBUF,
    NEG_BIG,
    _check_bn_supported,
    _in_tile_row,
    _lane_concat,
    _onehot_t,
    _tile_range,
    dispatch_by_bases,
)

# ---------------------------------------------------------------------------
# dyn128: per-window half-height one-hot bands.
#
# The chunked kernels' dominant cost is the [BN, BE] one-hot MXU dots
# (BN*D MACs per edge vs the 128-MAC minimum). Measured at bench scale,
# 78-91% of windows' in-tile dst rows span <= 128 of the tile's 256 rows
# (benchmarks/RESULTS.md "Remaining headroom"), so each window gets a
# static 8-aligned base row (computed host-side from the static layout,
# packed /8 into a desc_base scalar-prefetch array; -1 = full-height
# fallback) and the big dots run at [HALF, BE] height. The online-softmax
# state moves to [BN, 1] COLUMN scratch so band updates are dynamic
# SUBLANE slices (dynamic lane-dim placement is not efficient on TPU);
# lane<->sublane transposes happen once per tile via exact identity-dot
# transposes on the MXU.
# ---------------------------------------------------------------------------
HALF = 128
DYN128 = (os.environ.get("KGWAS_DYN128", "1") == "1") and BN >= 2 * HALF


def _desc_base_np(desc_np, desc_off_np, dst_np, n_rows):
    """Static per-window dyn128 descriptor: (base_row // 8) if the window's
    in-tile dst rows fit a HALF-row band at that 8-aligned base, else -1
    (full-height fallback). Pure numpy over the static layout arrays,
    evaluated at trace time (slab-wise to bound transient memory)."""
    desc = np.asarray(desc_np, dtype=np.int64).reshape(-1)
    off = np.asarray(desc_off_np, dtype=np.int64).reshape(-1)
    dst = np.asarray(dst_np, dtype=np.int32).reshape(-1)
    nd = len(desc)
    if nd == 0:
        return np.full(1, -1, np.int32)
    need = int(desc.max()) + BE
    if len(dst) < need:  # non-owned streams: windows overrun into the pad
        dst = np.concatenate(
            [dst, np.full(need - len(dst), n_rows, np.int32)])
    tile = np.repeat(np.arange(len(off) - 1, dtype=np.int64), np.diff(off))
    out = np.empty(nd, np.int32)
    lane_iota = np.arange(BE, dtype=np.int64)
    for s0 in range(0, nd, 8192):
        s1 = min(s0 + 8192, nd)
        lanes = dst[desc[s0:s1, None] + lane_iota[None, :]].astype(np.int64)
        rel = lanes - (tile[s0:s1] * BN)[:, None]
        intile = (rel >= 0) & (rel < BN)
        lo = np.where(intile, rel, BN).min(axis=1)
        hi = np.where(intile, rel, -1).max(axis=1)
        b = np.minimum(lo - (lo % 8), BN - HALF)
        fits = hi < b + HALF  # empty windows (hi=-1) trivially fit
        out[s0:s1] = np.where(fits, b >> 3, -1).astype(np.int32)
    return out


# id-keyed memo for call sites that pass layout_obj=None (the chunked
# wrappers' fwd AND bwd retrace paths — advisor round 3: the O(E) numpy
# descriptor scan reran on every retrace). The stored array refs keep the
# keyed ids alive, so an id can't be recycled while its entry exists.
_DESC_BASE_MEMO: dict = {}


def _desc_base_cached(layout_obj, desc_np, desc_off_np, dst_np, n_rows):
    """_desc_base_np with the result stashed on the (static, identity-
    compared) layout object so repeated traces don't recompute it."""
    if not DYN128:
        return np.full(1, -1, np.int32)
    if layout_obj is None:
        key = (id(desc_np), id(desc_off_np), id(dst_np), int(n_rows))
        hit = _DESC_BASE_MEMO.get(key)
        if hit is not None:
            return hit[1]
        base = _desc_base_np(desc_np, desc_off_np, dst_np, n_rows)
        if len(_DESC_BASE_MEMO) >= 64:  # bounded: FIFO-evict the oldest
            _DESC_BASE_MEMO.pop(next(iter(_DESC_BASE_MEMO)))
        _DESC_BASE_MEMO[key] = ((desc_np, desc_off_np, dst_np), base)
        return base
    cached = getattr(layout_obj, "_dyn128_base", None)
    if cached is None:
        cached = _desc_base_np(desc_np, desc_off_np, dst_np, n_rows)
        layout_obj._dyn128_base = cached
    return cached


def _eye_bn():
    """[BN, BN] boolean identity mask for the masked-max transposes."""
    return (
        jax.lax.broadcasted_iota(jnp.int32, (BN, BN), 0)
        == jax.lax.broadcasted_iota(jnp.int32, (BN, BN), 1)
    )


def _row_to_col(row, eye):
    """[1, BN] lane-oriented row -> [BN, 1] sublane column via masked max
    over the identity mask (one VPU pass per tile). Pure SELECTION — moves
    the softmax state bit-exactly, unlike an identity dot (and Mosaic
    rejects multi-pass f32 dot accumulators in this vector lowering)."""
    return jnp.max(jnp.where(eye, row, -jnp.inf), axis=1, keepdims=True)


def _col_to_row(col, eye):
    """[BN, 1] column -> [1, BN] row (see _row_to_col)."""
    return jnp.max(jnp.where(eye, col, -jnp.inf), axis=0, keepdims=True)


def _edge_dmas_at(s, slot, msgs_ref, msgs_vmem, dst_ref, dst_vmem, sems):
    """DMAs for one BE-edge window at absolute LANE-aligned stream pos s."""
    r = s // LANE
    return [
        pltpu.make_async_copy(
            msgs_ref.at[pl.ds(s, BE), :], msgs_vmem.at[slot], sems.at[slot, 0]
        ),
        pltpu.make_async_copy(
            dst_ref.at[pl.ds(r, BR), :], dst_vmem.at[slot], sems.at[slot, 1]
        ),
    ]


def _edge_dmas(start_al, c, slot, msgs_ref, msgs_vmem, dst_ref, dst_vmem,
               sems):
    return _edge_dmas_at(start_al + c * BE, slot, msgs_ref, msgs_vmem,
                         dst_ref, dst_vmem, sems)


def _logits_row(msgs_block, att_ref, a_dst_row, onehot_t, negative_slope,
                temperature):
    """[1, BE] attention logits for one chunk.

    a_src part: att . msgs via MXU row-matmul; a_dst part: project the tile's
    per-row vector through the one-hot.
    """
    a_src_row = jax.lax.dot_general(
        att_ref[0:1, :].astype(msgs_block.dtype), msgs_block,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=KERNEL_PRECISION,
    )                                                       # [1, BE]
    a_dst_e = jax.lax.dot_general(
        a_dst_row, onehot_t.astype(jnp.float32),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=KERNEL_PRECISION,
    )                                                       # [1, BE]
    z = a_src_row + a_dst_e
    l = jnp.where(z >= 0, z, negative_slope * z)
    return z, l / temperature


def _unnorm_weight(l_row, temperature, mode):
    """Per-edge weight for the unnormalized GAT modes. l_row is the
    leaky-ReLU'd logit ALREADY divided by temperature (_logits_row):
    sigmoid gating uses sigmoid(l) directly; raw attention uses the
    undivided leaky logit (reference conv.py:219-223)."""
    if mode == "sigmoid":
        return jax.nn.sigmoid(l_row)
    assert mode == "raw", mode
    return l_row * temperature


def _make_fwd_kernel(negative_slope, temperature, mode="softmax"):
    def kernel(
        off_ref,          # prefetch: row offsets
        t2r_ref,          # prefetch: tile -> relation slot (used by index maps)
        msgs_ref,         # [E_pad, D] HBM
        dst_ref,          # [E_pad/LANE, LANE] HBM
        att_ref,          # [8, D] VMEM block (relation att vector, sublane 0)
        adst_ref,         # [8, BN] VMEM block (a_dst rows of this tile)
        out_ref,          # [BN, D] VMEM block
        max_ref,          # [8, BN]
        sum_ref,          # [8, BN]
        msgs_vmem,
        dst_vmem,
        sems,
    ):
        i = pl.program_id(0)
        start, end, start_al, nchunks = _tile_range(off_ref, i)
        row_base = i * BN
        a_dst_row = adst_ref[0:1, :]                        # [1, BN]

        def start_chunk(c, slot):
            for dma in _edge_dmas(start_al, c, slot, msgs_ref, msgs_vmem,
                                  dst_ref, dst_vmem, sems):
                dma.start()

        def wait_chunk(c, slot):
            for dma in _edge_dmas(start_al, c, slot, msgs_ref, msgs_vmem,
                                  dst_ref, dst_vmem, sems):
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
                in_tile = _in_tile_row(dst_row, row_base)
                _, l_row = _logits_row(
                    msgs_vmem[slot], att_ref, a_dst_row, onehot_t,
                    negative_slope, temperature,
                )

                if mode == "softmax":
                    m_chunk = jnp.max(jnp.where(onehot_t, l_row, NEG_BIG),
                                      axis=1)
                    m_new = jnp.maximum(m_old, m_chunk)
                    scale = jnp.exp(jnp.minimum(m_old - m_new, 0.0))
                    acc = acc * scale[:, None]
                    row_sum = row_sum * scale

                    m_e = jnp.max(
                        jnp.where(onehot_t, m_new[:, None], NEG_BIG),
                        axis=0, keepdims=True)
                    p_row = jnp.exp(jnp.minimum(l_row - m_e, EXP_CLAMP))
                    p_row = jnp.where(in_tile, p_row, 0.0)
                    w = onehot_t.astype(jnp.float32) * p_row
                    row_sum = row_sum + jnp.sum(w, axis=1)
                else:
                    # unnormalized modes (reference conv.py:219-223): the
                    # per-edge weight is elementwise — no softmax state
                    w_row = _unnorm_weight(l_row, temperature, mode)
                    w_row = jnp.where(in_tile, w_row, 0.0)
                    w = onehot_t.astype(jnp.float32) * w_row
                    m_new = m_old
                acc = acc + jax.lax.dot_general(
                    w.astype(msgs_vmem.dtype), msgs_vmem[slot],
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
            if mode == "softmax":
                out_ref[:, :] = acc / (row_sum + EPS)[:, None]
            else:
                out_ref[:, :] = acc
            max_ref[0:1, :] = row_max[None, :]
            sum_ref[0:1, :] = row_sum[None, :]

        @pl.when(end <= start)
        def _empty():
            out_ref[:, :] = jnp.zeros_like(out_ref)
            max_ref[0:1, :] = jnp.full((1, BN), NEG_BIG, dtype=jnp.float32)
            sum_ref[0:1, :] = jnp.zeros((1, BN), dtype=jnp.float32)

    return kernel


def _pad_edge_stream(msgs, dst, n_rows, pre_padded=False):
    # pre_padded: fully-owned (v3) streams are BE-multiples and their
    # windows never overrun — skip the pad, which XLA materializes as a
    # full [E, D] copy EVERY kernel call (~2.8 ms/call at bench scale,
    # scripts/exp_trace_step.py)
    if pre_padded:
        assert msgs.shape[0] % BE == 0 and msgs.shape[0] == dst.shape[0]
        return msgs, dst.reshape(-1, LANE)
    e = msgs.shape[0]
    e_pad = ((e + BE - 1) // BE) * BE + BE
    pad = e_pad - e
    if os.environ.get("KGWAS_TRACE_PADS"):
        import traceback
        print(f"[pad_edge_stream] E={e} pad={pad} caller="
              f"{traceback.extract_stack()[-2].name}", flush=True)
    msgs = jnp.pad(msgs, ((0, pad), (0, 0)))
    dst = jnp.pad(dst, ((0, pad),), constant_values=n_rows)
    return msgs, dst.reshape(-1, LANE)


@functools.partial(
    jax.jit,
    static_argnames=("n_rows", "negative_slope", "temperature", "interpret",
                     "mode"),
)
def _merged_forward(msgs, att8, adst_tiles, dst, tile_starts, tile2rel,
                    n_rows, negative_slope, temperature, interpret=False,
                    mode="softmax"):
    _check_bn_supported(n_rows)
    d = msgs.shape[1]
    n_tiles = n_rows // BN
    msgs_p, dst_p = _pad_edge_stream(msgs, dst, n_rows)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((8, d), lambda i, off, t2r: (t2r[i], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, BN), lambda i, off, t2r: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((BN, d), lambda i, off, t2r: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, BN), lambda i, off, t2r: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, BN), lambda i, off, t2r: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((NBUF, BE, d), msgs.dtype),
            pltpu.VMEM((NBUF, BR, LANE), jnp.int32),
            pltpu.SemaphoreType.DMA((NBUF, 2)),
        ],
    )
    out, row_max, row_sum = pl.pallas_call(
        _make_fwd_kernel(negative_slope, temperature, mode),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n_rows, d), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles * 8, BN), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles * 8, BN), jnp.float32),
        ],
        interpret=interpret,
    )(tile_starts, tile2rel, msgs_p, dst_p, att8, adst_tiles)
    return out, row_max, row_sum


def _make_bwd_kernel(negative_slope, temperature, e_pad_total,
                     mode="softmax"):
    def kernel(
        off_ref,
        t2r_ref,
        msgs_ref,         # [E_pad, D] HBM
        dst_ref,          # [E_pad/LANE, LANE] HBM
        att_ref,          # [8, D] block
        adst_ref,         # [8, BN] block
        rmax_ref,         # [8, BN] block
        rsum_ref,         # [8, BN] block
        out_ref,          # [BN, D] block (primal out)
        g_ref,            # [BN, D] block (cotangent)
        dmsgs_ref,        # [E_pad, D] HBM out
        dadst_ref,        # [8, BN] block out
        datt_ref,         # [8, D] block out (per tile; summed per rel outside)
        msgs_vmem,
        dst_vmem,
        dmsgs_old,
        dmsgs_out_vmem,   # [NBUF, BE, D]
        sems,             # (NBUF, 3)
        wsems,            # (NBUF,)
    ):
        i = pl.program_id(0)
        start, end, start_al, _ = _tile_range(off_ref, i)
        # the LAST tile's chunk loop extends through the padded edge tail so
        # pad rows of the gradient outputs are zero-filled, never left as
        # uninitialized memory. Cover only to e_pad - BE: start_al is LANE-
        # but not BE-aligned, so the final chunk can overrun its nominal end
        # by start_al % BE rows — the trailing BE rows are the DMA safety
        # margin (and lie beyond every caller's slice).
        cover_end = jnp.where(
            i == pl.num_programs(0) - 1, e_pad_total - BE, end
        )
        cover_end = jnp.maximum(cover_end, end)
        nchunks = pl.cdiv(cover_end - start_al, BE)
        row_base = i * BN
        a_dst_row = adst_ref[0:1, :]
        att_row = att_ref[0:1, :]

        dot_r = jnp.sum(out_ref[:, :] * g_ref[:, :], axis=1)   # [BN]
        # per-row log-sum-exp: folds the row-max and 1/row-sum masked
        # extracts (two O(BN*BE) passes per window) into ONE
        lse_v = rmax_ref[0, :] + jnp.log(rsum_ref[0, :] + EPS)

        def is_boundary(c):
            s = start_al + c * BE
            return jnp.logical_or(s < start, s + BE > end)

        def start_chunk(c, slot):
            s = start_al + c * BE
            for dma in _edge_dmas(start_al, c, slot, msgs_ref, msgs_vmem,
                                  dst_ref, dst_vmem, sems):
                dma.start()

            @pl.when(is_boundary(c))
            def _():
                pltpu.make_async_copy(
                    dmsgs_ref.at[pl.ds(s, BE), :], dmsgs_old.at[slot],
                    sems.at[slot, 2],
                ).start()

        def wait_chunk(c, slot):
            s = start_al + c * BE
            for dma in _edge_dmas(start_al, c, slot, msgs_ref, msgs_vmem,
                                  dst_ref, dst_vmem, sems):
                dma.wait()

            @pl.when(is_boundary(c))
            def _():
                pltpu.make_async_copy(
                    dmsgs_ref.at[pl.ds(s, BE), :], dmsgs_old.at[slot],
                    sems.at[slot, 2],
                ).wait()

        def write_dma(c, slot):
            s = start_al + c * BE
            return pltpu.make_async_copy(
                dmsgs_out_vmem.at[slot], dmsgs_ref.at[pl.ds(s, BE), :],
                wsems.at[slot],
            )

        run_tile = jnp.logical_or(end > start,
                                  i == pl.num_programs(0) - 1)

        @pl.when(run_tile)
        def _nonempty():
            start_chunk(0, 0)

            def body(c, carry):
                dadst_acc, datt_acc = carry
                slot = jax.lax.rem(c, NBUF)

                @pl.when(c + 1 < nchunks)
                def _():
                    start_chunk(c + 1, jax.lax.rem(c + 1, NBUF))

                wait_chunk(c, slot)

                @pl.when(c >= NBUF)
                def _():
                    write_dma(c - NBUF, slot).wait()

                dst_row = _lane_concat(dst_vmem.at[slot])
                onehot_t = _onehot_t(dst_row, row_base)
                ohf = onehot_t.astype(jnp.float32)
                in_tile = _in_tile_row(dst_row, row_base)
                z, l_row = _logits_row(
                    msgs_vmem[slot], att_ref, a_dst_row, onehot_t,
                    negative_slope, temperature,
                )
                m2 = jax.lax.dot_general(
                    g_ref[:, :].astype(msgs_vmem.dtype), msgs_vmem[slot],
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=KERNEL_PRECISION,
                )                                                # [BN, BE]
                leaky_d = jnp.where(z >= 0, 1.0, negative_slope)
                if mode == "softmax":
                    lse_e = jnp.max(
                        jnp.where(onehot_t, lse_v[:, None], NEG_BIG),
                        axis=0, keepdims=True,
                    )
                    p_row = jnp.exp(jnp.minimum(l_row - lse_e, EXP_CLAMP))
                    p_row = jnp.where(in_tile, p_row, 0.0)
                    w = ohf * p_row                              # [BN, BE]
                    # d_l (pre-softmax logit grad), then d_z via leaky/T
                    dl_row = jnp.sum(w * (m2 - dot_r[:, None]), axis=0,
                                     keepdims=True)              # [1, BE]
                    dz_row = dl_row * leaky_d / temperature
                else:
                    # unnormalized: d_w = g[dst_e] . msg_e, then through
                    # the elementwise weight and leaky/T
                    w_row = _unnorm_weight(l_row, temperature, mode)
                    w_row = jnp.where(in_tile, w_row, 0.0)
                    w = ohf * w_row
                    dw_row = jnp.sum(ohf * m2, axis=0,
                                     keepdims=True)              # [1, BE]
                    if mode == "sigmoid":
                        dz_row = (dw_row * w_row * (1.0 - w_row)
                                  * leaky_d / temperature)
                    else:                                        # raw
                        dz_row = dw_row * leaky_d
                dz_row = jnp.where(in_tile, dz_row, 0.0)

                # d_msgs = w^T @ g  +  dz^T att
                new_dmsgs = (jax.lax.dot_general(
                    w, g_ref[:, :],
                    dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=KERNEL_PRECISION,
                ) + jax.lax.dot_general(
                    dz_row, att_row,
                    dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=KERNEL_PRECISION,
                )).astype(dmsgs_out_vmem.dtype)                  # [BE, D]

                # d_a_dst[n] += sum_e onehot * dz — as an MXU dot (BN x BE
                # MACs) instead of an O(BN*BE) VPU multiply + reduce
                dadst_acc = dadst_acc + jax.lax.dot_general(
                    dz_row, ohf,
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=KERNEL_PRECISION,
                )                                                # [1, BN]
                # d_att += sum_e dz_e * msgs_e
                datt_acc = datt_acc + jax.lax.dot_general(
                    dz_row.astype(msgs_vmem.dtype), msgs_vmem[slot],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=KERNEL_PRECISION,
                )                                                # [1, D]

                # keep previous values ONLY for lanes owned by a NEIGHBORING
                # tile ([0,start) head / [end,..) tail of an interior tile);
                # pad lanes past the last tile's real end get fresh zeros.
                # Non-boundary chunks have an all-false mask, so the (unread,
                # garbage) dmsgs_old slot is never selected.
                sc = start_al + c * BE
                pos_col = jax.lax.broadcasted_iota(
                    jnp.int32, (BE, 1), 0
                ) + sc
                other_col = jnp.logical_or(
                    pos_col < start,
                    jnp.logical_and(pos_col >= end,
                                    i < pl.num_programs(0) - 1),
                )
                dmsgs_out_vmem[slot] = jnp.where(
                    other_col, dmsgs_old[slot], new_dmsgs
                )

                write_dma(c, slot).start()
                return dadst_acc, datt_acc

            dadst_acc, datt_acc = jax.lax.fori_loop(
                0, nchunks, body,
                (
                    jnp.zeros((1, BN), dtype=jnp.float32),
                    jnp.zeros((1, att_ref.shape[1]), dtype=jnp.float32),
                ),
            )
            for tail in range(NBUF):
                cc = nchunks - NBUF + tail

                @pl.when(cc >= 0)
                def _(cc=cc):
                    write_dma(cc, jax.lax.rem(cc, NBUF)).wait()
            dadst_ref[0:1, :] = dadst_acc
            datt_ref[0:1, :] = datt_acc

        @pl.when(jnp.logical_not(run_tile))
        def _empty():
            dadst_ref[0:1, :] = jnp.zeros((1, BN), dtype=jnp.float32)
            datt_ref[0:1, :] = jnp.zeros(
                (1, datt_ref.shape[1]), dtype=jnp.float32
            )

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("n_rows", "negative_slope", "temperature", "interpret",
                     "mode", "fold_tiles"),
)
def _merged_backward(msgs, att8, adst_tiles, dst, tile_starts, tile2rel,
                     row_max, row_sum, out, g, n_rows, negative_slope,
                     temperature, interpret=False, mode="softmax",
                     fold_tiles=0):
    d = msgs.shape[1]
    n_tiles = n_rows // BN
    msgs_p, dst_p = _pad_edge_stream(msgs, dst, n_rows)
    e_pad = msgs_p.shape[0]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((8, d), lambda i, off, t2r: (t2r[i], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, BN), lambda i, off, t2r: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, BN), lambda i, off, t2r: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, BN), lambda i, off, t2r: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BN, d), lambda i, off, t2r: (i, 0),
                         memory_space=pltpu.VMEM),
            # rel-folded cotangent (fold_tiles > 0): g is the [N_rel, D]
            # cotangent of the cross-relation SUM; merged rows are
            # rel-major, so tile i of the stream reads folded tile
            # i % fold_tiles — same values the [R*N, D] broadcast would
            # deliver, without XLA materializing the broadcast into a
            # buffer for the custom call
            pl.BlockSpec((BN, d),
                         (lambda i, off, t2r: (i % fold_tiles, 0))
                         if fold_tiles else
                         (lambda i, off, t2r: (i, 0)),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((8, BN), lambda i, off, t2r: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, d), lambda i, off, t2r: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((NBUF, BE, d), msgs.dtype),
            pltpu.VMEM((NBUF, BR, LANE), jnp.int32),
            pltpu.VMEM((NBUF, BE, d), msgs.dtype),
            pltpu.VMEM((NBUF, BE, d), msgs.dtype),
            pltpu.SemaphoreType.DMA((NBUF, 3)),
            pltpu.SemaphoreType.DMA((NBUF,)),
        ],
    )
    dmsgs, dadst_tiles, datt_tiles = pl.pallas_call(
        _make_bwd_kernel(negative_slope, temperature, e_pad, mode),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((e_pad, d), msgs.dtype),
            jax.ShapeDtypeStruct((n_tiles * 8, BN), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles * 8, d), jnp.float32),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(
        tile_starts, tile2rel, msgs_p, dst_p, att8, adst_tiles,
        row_max, row_sum, out, g,
    )
    e = msgs.shape[0]
    return dmsgs[:e], dadst_tiles, datt_tiles


def _prep_att8(att):
    """[R, D] -> [R*8, D] (8-sublane blocks, sublane 0 meaningful). Dense
    pad+reshape — XLA lowers strided scatter to a serial loop on TPU."""
    r, d = att.shape
    return jnp.pad(att[:, None, :], ((0, 0), (0, 7), (0, 0))).reshape(
        r * 8, d
    )


def _prep_adst_tiles(a_dst_all, n_rows):
    """[n_rows] -> [n_tiles*8, BN] (8-sublane blocks), scatter-free."""
    n_tiles = n_rows // BN
    tiles = a_dst_all.reshape(n_tiles, 1, BN)
    return jnp.pad(tiles, ((0, 0), (0, 7), (0, 0))).reshape(n_tiles * 8, BN)


def _rel_fold_out(out, rel_fold):
    """Cross-relation SUM of the merged [R*N, D] output -> [N, D]. Same op
    hetero_gnn's rel_stack.sum(axis=0) performed outside — moved inside the
    custom VJP so the backward receives the FOLDED [N, D] cotangent and the
    kernels read it with an `i % fold_tiles` index map, instead of XLA
    materializing the [R*N, D] broadcast into a buffer for the custom call
    (0.99 ms/step of pure repeated-row writes at 200k; at 2M SNPs the
    broadcast alone would be ~2 GiB of HBM)."""
    return out.reshape(rel_fold, -1, out.shape[1]).sum(axis=0)


def _rel_fold_tiles(n_rows, rel_fold):
    n_rel = n_rows // rel_fold
    # explicit raise (not assert): the `i % fold_tiles` cotangent index map
    # silently corrupts gradients if the per-relation block is not a BN
    # multiple, and asserts vanish under `python -O`
    if n_rows % rel_fold or n_rel % BN:
        raise ValueError(
            f"rel_fold={rel_fold} needs n_rows ({n_rows}) divisible by it "
            f"and the per-relation block ({n_rel}) to be a BN={BN} multiple")
    return n_rel // BN


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7, 8, 9, 10)
)
def fused_gat_layer(msgs, att, a_dst_all, dst_np, row_offsets_np, tile2rel_np,
                    n_rows, negative_slope, temperature, interpret=False,
                    rel_fold=0):
    """Merged GAT layer aggregation (see module docstring).

    msgs [E, D] (merged-gathered, D%128==0); att [R, D] per-relation
    attention vectors; a_dst_all [n_rows] per-row dst-attention scalars.
    dst_np/row_offsets_np/tile2rel_np: static numpy layout arrays.
    n_rows = R * N_pad, multiple of 256. Returns out_all [n_rows, D] —
    or, with rel_fold=R, the cross-relation sum [n_rows/R, D]
    (see _rel_fold_out).
    """
    ts = _tile_starts_np(row_offsets_np)
    out, _, _ = _merged_forward(
        msgs, _prep_att8(att), _prep_adst_tiles(a_dst_all, n_rows),
        jnp.asarray(dst_np), jnp.asarray(ts),
        jnp.asarray(tile2rel_np), n_rows, negative_slope, temperature,
        interpret,
    )
    return _rel_fold_out(out, rel_fold) if rel_fold else out


def _fgl_fwd(msgs, att, a_dst_all, dst_np, row_offsets_np, tile2rel_np,
             n_rows, negative_slope, temperature, interpret, rel_fold):
    att8 = _prep_att8(att)
    adst_tiles = _prep_adst_tiles(a_dst_all, n_rows)
    ts = _tile_starts_np(row_offsets_np)
    out, row_max, row_sum = _merged_forward(
        msgs, att8, adst_tiles, jnp.asarray(dst_np),
        jnp.asarray(ts), jnp.asarray(tile2rel_np), n_rows,
        negative_slope, temperature, interpret,
    )
    ret = _rel_fold_out(out, rel_fold) if rel_fold else out
    return ret, (msgs, att8, adst_tiles, row_max, row_sum, out, att.shape[0])


def _fgl_bwd(dst_np, row_offsets_np, tile2rel_np, n_rows, negative_slope,
             temperature, interpret, rel_fold, residuals, g):
    msgs, att8, adst_tiles, row_max, row_sum, out, n_rel = residuals
    ts = _tile_starts_np(row_offsets_np)
    dmsgs, dadst_tiles, datt_tiles = _merged_backward(
        msgs, att8, adst_tiles, jnp.asarray(dst_np),
        jnp.asarray(ts), jnp.asarray(tile2rel_np), row_max,
        row_sum, out, g, n_rows, negative_slope, temperature, interpret,
        fold_tiles=_rel_fold_tiles(n_rows, rel_fold) if rel_fold else 0,
    )
    d_a_dst, d_att = _tile_grads_to_rel(
        dadst_tiles, datt_tiles, tile2rel_np, n_rel, n_rows
    )
    return dmsgs, d_att, d_a_dst


fused_gat_layer.defvjp(_fgl_fwd, _fgl_bwd)


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7, 8, 9, 10, 11)
)
def fused_gat_layer_unnorm(msgs, att, a_dst_all, dst_np, row_offsets_np,
                           tile2rel_np, n_rows, negative_slope, temperature,
                           mode, interpret=False, rel_fold=0):
    """fused_gat_layer for the UNNORMALIZED GAT modes (reference
    conv.py:219-223): per-edge weight sigmoid(l) ("sigmoid" mode, the
    sigmoid_gat flag) or the raw leaky logit ("raw" mode) — elementwise,
    so the kernels skip the online-softmax state entirely. Same merged
    layout and tiling as the softmax op; backward recomputes the weights
    (no residual softmax stats needed)."""
    ts = _tile_starts_np(row_offsets_np)
    out, _, _ = _merged_forward(
        msgs, _prep_att8(att), _prep_adst_tiles(a_dst_all, n_rows),
        jnp.asarray(dst_np), jnp.asarray(ts),
        jnp.asarray(tile2rel_np), n_rows, negative_slope, temperature,
        interpret, mode=mode,
    )
    return _rel_fold_out(out, rel_fold) if rel_fold else out


def _fglu_fwd(msgs, att, a_dst_all, dst_np, row_offsets_np, tile2rel_np,
              n_rows, negative_slope, temperature, mode, interpret,
              rel_fold):
    att8 = _prep_att8(att)
    adst_tiles = _prep_adst_tiles(a_dst_all, n_rows)
    ts = _tile_starts_np(row_offsets_np)
    out, row_max, row_sum = _merged_forward(
        msgs, att8, adst_tiles, jnp.asarray(dst_np),
        jnp.asarray(ts), jnp.asarray(tile2rel_np), n_rows,
        negative_slope, temperature, interpret, mode=mode,
    )
    ret = _rel_fold_out(out, rel_fold) if rel_fold else out
    return ret, (msgs, att8, adst_tiles, row_max, row_sum, out, att.shape[0])


def _fglu_bwd(dst_np, row_offsets_np, tile2rel_np, n_rows, negative_slope,
              temperature, mode, interpret, rel_fold, residuals, g):
    msgs, att8, adst_tiles, row_max, row_sum, out, n_rel = residuals
    ts = _tile_starts_np(row_offsets_np)
    dmsgs, dadst_tiles, datt_tiles = _merged_backward(
        msgs, att8, adst_tiles, jnp.asarray(dst_np),
        jnp.asarray(ts), jnp.asarray(tile2rel_np), row_max,
        row_sum, out, g, n_rows, negative_slope, temperature, interpret,
        mode=mode,
        fold_tiles=_rel_fold_tiles(n_rows, rel_fold) if rel_fold else 0,
    )
    d_a_dst, d_att = _tile_grads_to_rel(
        dadst_tiles, datt_tiles, tile2rel_np, n_rel, n_rows
    )
    return dmsgs, d_att, d_a_dst


fused_gat_layer_unnorm.defvjp(_fglu_fwd, _fglu_bwd)


def _tile_grads_to_rel(dadst_tiles, datt_tiles, tile2rel_np, n_rel, n_rows):
    """Kernel per-tile (dadst [n_tiles*8, BN], datt [n_tiles*8, D]) grads
    -> (d_a_dst [n_rows], d_att [R, D]); the tile->relation reduction is a
    static 0/1 selector matmul. Shared by every merged bwd rule."""
    n_tiles = n_rows // BN
    d_a_dst = dadst_tiles[::8].reshape(n_rows)
    sel = np.zeros((n_rel, n_tiles), dtype=np.float32)
    sel[np.asarray(tile2rel_np), np.arange(n_tiles)] = 1.0
    d_att = jnp.asarray(sel) @ datt_tiles[::8]              # [R, D]
    return d_a_dst, d_att


def _tile_starts_np(row_offsets_np):
    ro = np.asarray(row_offsets_np)
    return np.concatenate([ro[::BN], ro[-1:]])


# ---------------------------------------------------------------------------
# Chunked-stream variant (src-chunk-major edge order, window descriptors)
#
# Consumes the ChunkedStreamLayout of graph/merged_layout.py: the edge
# stream is ordered (src_chunk major, dst_tile minor) so the [E, D] message
# gather runs as per-chunk fast takes; each dst tile's edges live in up to
# n_chunks fragments covered by BE-edge windows listed in `desc`
# (per-tile ranges in `desc_offsets`). The online softmax per dst row is
# order-invariant and the one-hot masks window overreads, so the math is
# identical to the contiguous kernels — only chunk addressing and the
# backward's write-merge change.
# ---------------------------------------------------------------------------


def _make_fwd_kernel_chunked(negative_slope, temperature,
                             split_bases=None, mode="softmax",
                             dyn128=False):
    """split_bases: static padded chunk-block boundaries — msgs arrives as
    len(split_bases)-1 SEPARATE per-chunk HBM buffers (the per-chunk
    fast-emitter takes, never concatenated); the DMA source is
    branch-selected per window. Desc windows are BE-aligned and the bases
    are BE multiples, so no window straddles a cut.

    dyn128: half-height one-hot bands per window (see module constant) —
    the desc_base prefetch array supplies each window's packed 8-aligned
    base row or -1 (full-height fallback); the online-softmax state lives
    in [BN, 1] column scratch so band updates are dynamic sublane slices.
    Out-of-band rows see scale == exp(0) == 1 and a zero dot contribution,
    so restricting the update to the band is bit-equivalent."""
    n_split = 0 if split_bases is None else len(split_bases) - 1

    def kernel(
        doff_ref,         # prefetch: per-tile desc ranges [n_tiles+1]
        desc_ref,         # prefetch: window start positions [ND]
        dbase_ref,        # prefetch: dyn128 window bases [ND] (or [1] dummy)
        t2r_ref,          # prefetch: tile -> relation slot
        *rest,            # msgs ref(s), dst, att, adst, outs, scratch
    ):
        if split_bases is None:
            msgs_ref = rest[0]
            msgs_refs = None
            rest = rest[1:]
        else:
            msgs_refs = rest[:n_split]
            msgs_ref = None
            rest = rest[n_split:]
        (dst_ref, att_ref, adst_ref, out_ref, max_ref, sum_ref,
         msgs_vmem, dst_vmem, sems) = rest[:9]
        if dyn128:
            m_col, s_col, adstc = rest[9:12]
        i = pl.program_id(0)
        dlo = doff_ref[i]
        nchunks = doff_ref[i + 1] - dlo
        row_base = i * BN
        a_dst_row = adst_ref[0:1, :]

        def _msgs_op(s, slot, op):
            if split_bases is None:
                dma = pltpu.make_async_copy(
                    msgs_ref.at[pl.ds(s, BE), :], msgs_vmem.at[slot],
                    sems.at[slot, 0],
                )
                dma.start() if op == "start" else dma.wait()
                return
            def _go(k, off):
                dma = pltpu.make_async_copy(
                    msgs_refs[k].at[pl.ds(off // LANE * LANE, BE), :],
                    msgs_vmem.at[slot], sems.at[slot, 0],
                )
                dma.start() if op == "start" else dma.wait()
            dispatch_by_bases(s, split_bases, _go)

        def _chunk_op(c, slot, op):
            # (s // LANE) * LANE is a numeric no-op (desc starts are
            # LANE-aligned by construction) but hands Mosaic the
            # divisibility proof its packed-dtype (bf16) HBM tiling needs
            s = (desc_ref[dlo + c] // LANE) * LANE
            _msgs_op(s, slot, op)
            dma = pltpu.make_async_copy(
                dst_ref.at[pl.ds(s // LANE, BR), :], dst_vmem.at[slot],
                sems.at[slot, 1],
            )
            dma.start() if op == "start" else dma.wait()

        def start_chunk(c, slot):
            _chunk_op(c, slot, "start")

        def wait_chunk(c, slot):
            _chunk_op(c, slot, "wait")

        if dyn128:
            eye = _eye_bn()

            @pl.when(nchunks > 0)
            def _nonempty_dyn():
                start_chunk(0, 0)
                out_ref[:, :] = jnp.zeros_like(out_ref)
                adstc[:, :] = _row_to_col(a_dst_row, eye)
                if mode == "softmax":
                    m_col[:, :] = jnp.full((BN, 1), NEG_BIG, jnp.float32)
                    s_col[:, :] = jnp.zeros((BN, 1), jnp.float32)

                def band(slot, b, hh):
                    dst_row = _lane_concat(dst_vmem.at[slot])
                    rows = jax.lax.broadcasted_iota(
                        jnp.int32, (hh, BE), 0) + (row_base + b)
                    onehot_h = rows == dst_row
                    ohf = onehot_h.astype(jnp.float32)
                    in_band = jnp.logical_and(
                        dst_row >= row_base + b,
                        dst_row < row_base + b + hh)
                    a_src_row = jax.lax.dot_general(
                        att_ref[0:1, :].astype(msgs_vmem.dtype),
                        msgs_vmem[slot],
                        dimension_numbers=(((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                        precision=KERNEL_PRECISION,
                    )                                            # [1, BE]
                    a_dst_e = jax.lax.dot_general(
                        adstc[pl.ds(b, hh), :], ohf,
                        dimension_numbers=(((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                        precision=KERNEL_PRECISION,
                    )                                            # [1, BE]
                    z = a_src_row + a_dst_e
                    l_row = jnp.where(z >= 0, z,
                                      negative_slope * z) / temperature
                    if mode == "softmax":
                        m_old = m_col[pl.ds(b, hh), :]           # [hh, 1]
                        m_chunk = jnp.max(
                            jnp.where(onehot_h, l_row, NEG_BIG),
                            axis=1, keepdims=True)
                        m_new = jnp.maximum(m_old, m_chunk)
                        scale = jnp.exp(jnp.minimum(m_old - m_new, 0.0))
                        m_col[pl.ds(b, hh), :] = m_new
                        m_e = jnp.max(
                            jnp.where(onehot_h, m_new, NEG_BIG),
                            axis=0, keepdims=True)
                        p_row = jnp.exp(jnp.minimum(l_row - m_e, EXP_CLAMP))
                        p_row = jnp.where(in_band, p_row, 0.0)
                        w = ohf * p_row
                        s_col[pl.ds(b, hh), :] = (
                            s_col[pl.ds(b, hh), :] * scale
                            + jnp.sum(w, axis=1, keepdims=True))
                    else:
                        w_row = _unnorm_weight(l_row, temperature, mode)
                        w_row = jnp.where(in_band, w_row, 0.0)
                        w = ohf * w_row
                        scale = None
                    agg = jax.lax.dot_general(
                        w.astype(msgs_vmem.dtype), msgs_vmem[slot],
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                        precision=KERNEL_PRECISION,
                    )                                            # [hh, D]
                    if mode == "softmax":
                        out_ref[pl.ds(b, hh), :] = (
                            out_ref[pl.ds(b, hh), :] * scale + agg)
                    else:
                        out_ref[pl.ds(b, hh), :] = (
                            out_ref[pl.ds(b, hh), :] + agg)

                def body(c, carry):
                    slot = jax.lax.rem(c, NBUF)

                    @pl.when(c + 1 < nchunks)
                    def _():
                        start_chunk(c + 1, jax.lax.rem(c + 1, NBUF))

                    wait_chunk(c, slot)
                    bb = dbase_ref[dlo + c]

                    @pl.when(bb >= 0)
                    def _half():
                        band(slot, bb * 8, HALF)

                    @pl.when(bb < 0)
                    def _full():
                        band(slot, 0, BN)

                    return carry

                jax.lax.fori_loop(0, nchunks, body, 0)
                if mode == "softmax":
                    s = s_col[:, :]
                    out_ref[:, :] = out_ref[:, :] / (s + EPS)
                    max_ref[0:1, :] = _col_to_row(m_col[:, :], eye)
                    sum_ref[0:1, :] = _col_to_row(s, eye)
                else:
                    max_ref[0:1, :] = jnp.full((1, BN), NEG_BIG,
                                               dtype=jnp.float32)
                    sum_ref[0:1, :] = jnp.zeros((1, BN), dtype=jnp.float32)

            @pl.when(nchunks <= 0)
            def _empty_dyn():
                out_ref[:, :] = jnp.zeros_like(out_ref)
                max_ref[0:1, :] = jnp.full((1, BN), NEG_BIG,
                                           dtype=jnp.float32)
                sum_ref[0:1, :] = jnp.zeros((1, BN), dtype=jnp.float32)

            return

        @pl.when(nchunks > 0)
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
                in_tile = _in_tile_row(dst_row, row_base)
                _, l_row = _logits_row(
                    msgs_vmem[slot], att_ref, a_dst_row, onehot_t,
                    negative_slope, temperature,
                )

                if mode == "softmax":
                    m_chunk = jnp.max(jnp.where(onehot_t, l_row, NEG_BIG),
                                      axis=1)
                    m_new = jnp.maximum(m_old, m_chunk)
                    scale = jnp.exp(jnp.minimum(m_old - m_new, 0.0))
                    acc = acc * scale[:, None]
                    row_sum = row_sum * scale

                    m_e = jnp.max(
                        jnp.where(onehot_t, m_new[:, None], NEG_BIG),
                        axis=0, keepdims=True)
                    p_row = jnp.exp(jnp.minimum(l_row - m_e, EXP_CLAMP))
                    p_row = jnp.where(in_tile, p_row, 0.0)
                    w = onehot_t.astype(jnp.float32) * p_row
                    row_sum = row_sum + jnp.sum(w, axis=1)
                else:
                    # unnormalized modes (reference conv.py:219-223): the
                    # per-edge weight is elementwise — no softmax state
                    w_row = _unnorm_weight(l_row, temperature, mode)
                    w_row = jnp.where(in_tile, w_row, 0.0)
                    w = onehot_t.astype(jnp.float32) * w_row
                    m_new = m_old
                acc = acc + jax.lax.dot_general(
                    w.astype(msgs_vmem.dtype), msgs_vmem[slot],
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
            if mode == "softmax":
                out_ref[:, :] = acc / (row_sum + EPS)[:, None]
            else:
                out_ref[:, :] = acc
            max_ref[0:1, :] = row_max[None, :]
            sum_ref[0:1, :] = row_sum[None, :]

        @pl.when(nchunks <= 0)
        def _empty():
            out_ref[:, :] = jnp.zeros_like(out_ref)
            max_ref[0:1, :] = jnp.full((1, BN), NEG_BIG, dtype=jnp.float32)
            sum_ref[0:1, :] = jnp.zeros((1, BN), dtype=jnp.float32)

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("n_rows", "negative_slope", "temperature", "interpret",
                     "pre_padded", "split_bases", "mode", "dyn128"),
)
def _merged_forward_chunked(msgs, att8, adst_tiles, dst, desc_offsets, desc,
                            desc_base, tile2rel, n_rows, negative_slope,
                            temperature, interpret=False, pre_padded=False,
                            split_bases=None, mode="softmax", dyn128=False):
    """split_bases: msgs is a TUPLE of per-chunk-block buffers (see
    _make_fwd_kernel_chunked); dst must already be the padded stream.
    desc_base: dyn128 per-window packed base rows (dummy [1] when off)."""
    _check_bn_supported(n_rows)
    if split_bases is None:
        d = msgs.shape[1]
        dtype = msgs.dtype
        msgs_p, dst_p = _pad_edge_stream(msgs, dst, n_rows, pre_padded)
        msgs_args = (msgs_p,)
    else:
        d = msgs[0].shape[1]
        dtype = msgs[0].dtype
        assert dst.shape[0] % BE == 0
        dst_p = dst.reshape(-1, LANE)
        msgs_args = tuple(msgs)
    n_tiles = n_rows // BN

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(n_tiles,),
        in_specs=(
            [pl.BlockSpec(memory_space=pl.ANY)] * len(msgs_args)
            + [
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec((8, d),
                             lambda i, doff, dsc, dbs, t2r: (t2r[i], 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((8, BN),
                             lambda i, doff, dsc, dbs, t2r: (i, 0),
                             memory_space=pltpu.VMEM),
            ]
        ),
        out_specs=[
            pl.BlockSpec((BN, d), lambda i, doff, dsc, dbs, t2r: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, BN), lambda i, doff, dsc, dbs, t2r: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, BN), lambda i, doff, dsc, dbs, t2r: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=(
            [
                pltpu.VMEM((NBUF, BE, d), dtype),
                pltpu.VMEM((NBUF, BR, LANE), jnp.int32),
                pltpu.SemaphoreType.DMA((NBUF, 2)),
            ]
            + ([
                pltpu.VMEM((BN, 1), jnp.float32),   # m state column
                pltpu.VMEM((BN, 1), jnp.float32),   # sum state column
                pltpu.VMEM((BN, 1), jnp.float32),   # a_dst column
            ] if dyn128 else [])
        ),
    )
    out, row_max, row_sum = pl.pallas_call(
        _make_fwd_kernel_chunked(negative_slope, temperature, split_bases,
                                 mode, dyn128),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n_rows, d), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles * 8, BN), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles * 8, BN), jnp.float32),
        ],
        interpret=interpret,
    )(desc_offsets, desc, desc_base, tile2rel, *msgs_args, dst_p, att8,
      adst_tiles)
    return out, row_max, row_sum


def _make_bwd_kernel_chunked(negative_slope, temperature, owned=False,
                             split_bases=None, read_bases=None,
                             mode="softmax", dyn128=False):
    """owned=True consumes a fully-owned (fragment-padded, v3) stream:
    every window's lanes belong to this tile or are sentinels, so dmsgs
    windows are written blind — no read-modify-write stream, no ownership
    select (graph/merged_layout.ChunkedStreamLayout.fully_owned).

    split_bases (requires owned): static padded chunk-block boundaries;
    dmsgs is emitted as len(split_bases)-1 SEPARATE per-chunk HBM buffers
    instead of one [E_pad, D] array. Window starts are BE-aligned and the
    bases are BE multiples, so no window straddles a cut; the write target
    is branch-selected per window. Separate buffers keep the downstream
    per-chunk cotangent takes on XLA's fast small-table gather emitter —
    slices of one big buffer get re-fused into big-table gathers
    (benchmarks/RESULTS.md, fragment-windowed negative result).

    read_bases (requires owned): msgs arrives as SEPARATE per-chunk-block
    buffers too (the forward's never-concatenated takes); the read DMA
    source is branch-selected per window like the write."""
    n_split = 0 if split_bases is None else len(split_bases) - 1
    n_read = 0 if read_bases is None else len(read_bases) - 1

    def kernel(
        doff_ref,
        desc_ref,
        dbase_ref,        # prefetch: dyn128 window bases [ND] (or [1] dummy)
        t2r_ref,
        *rest,            # msgs ref(s), dst..g, dmsgs out ref(s), scratch
    ):
        if read_bases is None:
            msgs_ref = rest[0]
            msgs_refs = None
            rest = rest[1:]
        else:
            msgs_refs = rest[:n_read]
            msgs_ref = None
            rest = rest[n_read:]
        (dst_ref, att_ref, adst_ref, rmax_ref, rsum_ref, out_ref,
         g_ref) = rest[:7]
        rest = rest[7:]
        if split_bases is None:
            dmsgs_ref, dadst_ref, datt_ref = rest[:3]
            dmsgs_refs = None
            scratch = rest[3:]
        else:
            dmsgs_refs = rest[:n_split]
            dadst_ref, datt_ref = rest[n_split:n_split + 2]
            dmsgs_ref = None
            scratch = rest[n_split + 2:]
        if dyn128:
            adstc, lsec, dotrc, dadstc, datt_s = scratch[-5:]
            scratch = scratch[:-5]
        if owned:
            msgs_vmem, dst_vmem, dmsgs_out_vmem, sems, wsems = scratch
            dmsgs_old = None
        else:
            (msgs_vmem, dst_vmem, dmsgs_old, dmsgs_out_vmem, sems,
             wsems) = scratch
        i = pl.program_id(0)
        dlo = doff_ref[i]
        nchunks = doff_ref[i + 1] - dlo
        row_base = i * BN
        a_dst_row = adst_ref[0:1, :]
        att_row = att_ref[0:1, :]

        if mode == "softmax" and not dyn128:
            dot_r = jnp.sum(out_ref[:, :] * g_ref[:, :], axis=1)   # [BN]
            # per-row log-sum-exp: folds the row-max and 1/row-sum masked
            # extracts (two O(BN*BE) passes per window) into ONE
            lse_v = rmax_ref[0, :] + jnp.log(rsum_ref[0, :] + EPS)

        def _msgs_read_op(s, slot, op):
            if read_bases is None:
                dma = pltpu.make_async_copy(
                    msgs_ref.at[pl.ds(s, BE), :], msgs_vmem.at[slot],
                    sems.at[slot, 0],
                )
                dma.start() if op == "start" else dma.wait()
                return
            def _go(k, off):
                dma = pltpu.make_async_copy(
                    msgs_refs[k].at[pl.ds(off // LANE * LANE, BE), :],
                    msgs_vmem.at[slot], sems.at[slot, 0],
                )
                dma.start() if op == "start" else dma.wait()
            dispatch_by_bases(s, read_bases, _go)

        def _read_op(c, slot, op):
            # LANE re-derivation gives Mosaic the divisibility proof for
            # packed-dtype HBM tilings (see _make_fwd_kernel_chunked)
            s = (desc_ref[dlo + c] // LANE) * LANE
            _msgs_read_op(s, slot, op)
            dma = pltpu.make_async_copy(
                dst_ref.at[pl.ds(s // LANE, BR), :], dst_vmem.at[slot],
                sems.at[slot, 1],
            )
            dma.start() if op == "start" else dma.wait()
            if not owned:
                # windows interleave foreign fragments: always read-merge
                dma = pltpu.make_async_copy(
                    dmsgs_ref.at[pl.ds(s, BE), :], dmsgs_old.at[slot],
                    sems.at[slot, 2],
                )
                dma.start() if op == "start" else dma.wait()

        def start_chunk(c, slot):
            _read_op(c, slot, "start")

        def wait_chunk(c, slot):
            _read_op(c, slot, "wait")

        def _write_op(c, slot, op):
            s = (desc_ref[dlo + c] // LANE) * LANE
            if split_bases is None:
                dma = pltpu.make_async_copy(
                    dmsgs_out_vmem.at[slot], dmsgs_ref.at[pl.ds(s, BE), :],
                    wsems.at[slot],
                )
                dma.start() if op == "start" else dma.wait()
                return
            def _go(k, off):
                dma = pltpu.make_async_copy(
                    dmsgs_out_vmem.at[slot],
                    dmsgs_refs[k].at[pl.ds(off // LANE * LANE, BE), :],
                    wsems.at[slot],
                )
                dma.start() if op == "start" else dma.wait()
            dispatch_by_bases(s, split_bases, _go)

        if dyn128:
            eye = _eye_bn()

            @pl.when(nchunks > 0)
            def _nonempty_dyn():
                start_chunk(0, 0)
                adstc[:, :] = _row_to_col(a_dst_row, eye)
                dadstc[:, :] = jnp.zeros((BN, 1), jnp.float32)
                datt_s[0:1, :] = jnp.zeros((1, datt_s.shape[1]),
                                           jnp.float32)
                if mode == "softmax":
                    dotrc[:, :] = jnp.sum(out_ref[:, :] * g_ref[:, :],
                                          axis=1, keepdims=True)
                    rmax_col = _row_to_col(rmax_ref[0:1, :], eye)
                    rsum_col = _row_to_col(rsum_ref[0:1, :], eye)
                    lsec[:, :] = rmax_col + jnp.log(rsum_col + EPS)

                def band(slot, b, hh):
                    dst_row = _lane_concat(dst_vmem.at[slot])
                    rows = jax.lax.broadcasted_iota(
                        jnp.int32, (hh, BE), 0) + (row_base + b)
                    onehot_h = rows == dst_row
                    ohf = onehot_h.astype(jnp.float32)
                    in_band = jnp.logical_and(
                        dst_row >= row_base + b,
                        dst_row < row_base + b + hh)
                    a_src_row = jax.lax.dot_general(
                        att_ref[0:1, :].astype(msgs_vmem.dtype),
                        msgs_vmem[slot],
                        dimension_numbers=(((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                        precision=KERNEL_PRECISION,
                    )
                    a_dst_e = jax.lax.dot_general(
                        adstc[pl.ds(b, hh), :], ohf,
                        dimension_numbers=(((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                        precision=KERNEL_PRECISION,
                    )
                    z = a_src_row + a_dst_e
                    l_row = jnp.where(z >= 0, z,
                                      negative_slope * z) / temperature
                    g_b = g_ref[pl.ds(b, hh), :]                 # [hh, D]
                    m2 = jax.lax.dot_general(
                        g_b.astype(msgs_vmem.dtype), msgs_vmem[slot],
                        dimension_numbers=(((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                        precision=KERNEL_PRECISION,
                    )                                            # [hh, BE]
                    leaky_d = jnp.where(z >= 0, 1.0, negative_slope)
                    if mode == "softmax":
                        lse_b = lsec[pl.ds(b, hh), :]
                        lse_e = jnp.max(
                            jnp.where(onehot_h, lse_b, NEG_BIG),
                            axis=0, keepdims=True)
                        p_row = jnp.exp(
                            jnp.minimum(l_row - lse_e, EXP_CLAMP))
                        p_row = jnp.where(in_band, p_row, 0.0)
                        w = ohf * p_row                          # [hh, BE]
                        dl_row = jnp.sum(
                            w * (m2 - dotrc[pl.ds(b, hh), :]),
                            axis=0, keepdims=True)               # [1, BE]
                        dz_row = dl_row * leaky_d / temperature
                    else:
                        w_row = _unnorm_weight(l_row, temperature, mode)
                        w_row = jnp.where(in_band, w_row, 0.0)
                        w = ohf * w_row
                        dw_row = jnp.sum(ohf * m2, axis=0,
                                         keepdims=True)          # [1, BE]
                        if mode == "sigmoid":
                            dz_row = (dw_row * w_row * (1.0 - w_row)
                                      * leaky_d / temperature)
                        else:                                    # raw
                            dz_row = dw_row * leaky_d
                    dz_row = jnp.where(in_band, dz_row, 0.0)

                    new_dmsgs = (jax.lax.dot_general(
                        w, g_b,
                        dimension_numbers=(((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                        precision=KERNEL_PRECISION,
                    ) + jax.lax.dot_general(
                        dz_row, att_row,
                        dimension_numbers=(((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                        precision=KERNEL_PRECISION,
                    )).astype(dmsgs_out_vmem.dtype)              # [BE, D]

                    dadstc[pl.ds(b, hh), :] = (
                        dadstc[pl.ds(b, hh), :] + jax.lax.dot_general(
                            ohf, dz_row,
                            dimension_numbers=(((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=KERNEL_PRECISION,
                        ))                                       # [hh, 1]
                    datt_s[0:1, :] = datt_s[0:1, :] + jax.lax.dot_general(
                        dz_row.astype(msgs_vmem.dtype), msgs_vmem[slot],
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                        precision=KERNEL_PRECISION,
                    )                                            # [1, D]
                    if owned:
                        dmsgs_out_vmem[slot] = new_dmsgs
                    else:
                        own_col = jax.lax.dot_general(
                            ohf, jnp.ones((hh, 1), dtype=jnp.float32),
                            dimension_numbers=(((0,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=KERNEL_PRECISION,
                        )                                        # [BE, 1]
                        dmsgs_out_vmem[slot] = jnp.where(
                            own_col > 0.0, new_dmsgs, dmsgs_old[slot]
                        )

                def body(c, carry):
                    slot = jax.lax.rem(c, NBUF)

                    @pl.when(c + 1 < nchunks)
                    def _():
                        start_chunk(c + 1, jax.lax.rem(c + 1, NBUF))

                    wait_chunk(c, slot)

                    @pl.when(c >= NBUF)
                    def _():
                        _write_op(c - NBUF, slot, "wait")

                    bb = dbase_ref[dlo + c]

                    @pl.when(bb >= 0)
                    def _half():
                        band(slot, bb * 8, HALF)

                    @pl.when(bb < 0)
                    def _full():
                        band(slot, 0, BN)

                    _write_op(c, slot, "start")
                    return carry

                jax.lax.fori_loop(0, nchunks, body, 0)
                for tail in range(NBUF):
                    cc = nchunks - NBUF + tail

                    @pl.when(cc >= 0)
                    def _(cc=cc):
                        _write_op(cc, jax.lax.rem(cc, NBUF), "wait")
                dadst_ref[0:1, :] = _col_to_row(dadstc[:, :], eye)
                datt_ref[0:1, :] = datt_s[0:1, :]

            @pl.when(nchunks <= 0)
            def _empty_dyn():
                dadst_ref[0:1, :] = jnp.zeros((1, BN), dtype=jnp.float32)
                datt_ref[0:1, :] = jnp.zeros(
                    (1, datt_ref.shape[1]), dtype=jnp.float32
                )

            return

        @pl.when(nchunks > 0)
        def _nonempty():
            start_chunk(0, 0)

            def body(c, carry):
                dadst_acc, datt_acc = carry
                slot = jax.lax.rem(c, NBUF)

                @pl.when(c + 1 < nchunks)
                def _():
                    start_chunk(c + 1, jax.lax.rem(c + 1, NBUF))

                wait_chunk(c, slot)

                @pl.when(c >= NBUF)
                def _():
                    _write_op(c - NBUF, slot, "wait")

                dst_row = _lane_concat(dst_vmem.at[slot])
                onehot_t = _onehot_t(dst_row, row_base)
                ohf = onehot_t.astype(jnp.float32)
                in_tile = _in_tile_row(dst_row, row_base)
                z, l_row = _logits_row(
                    msgs_vmem[slot], att_ref, a_dst_row, onehot_t,
                    negative_slope, temperature,
                )
                m2 = jax.lax.dot_general(
                    g_ref[:, :].astype(msgs_vmem.dtype), msgs_vmem[slot],
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=KERNEL_PRECISION,
                )                                                # [BN, BE]
                leaky_d = jnp.where(z >= 0, 1.0, negative_slope)
                if mode == "softmax":
                    lse_e = jnp.max(
                        jnp.where(onehot_t, lse_v[:, None], NEG_BIG),
                        axis=0, keepdims=True,
                    )
                    p_row = jnp.exp(jnp.minimum(l_row - lse_e, EXP_CLAMP))
                    p_row = jnp.where(in_tile, p_row, 0.0)
                    w = ohf * p_row                              # [BN, BE]
                    dl_row = jnp.sum(w * (m2 - dot_r[:, None]), axis=0,
                                     keepdims=True)              # [1, BE]
                    dz_row = dl_row * leaky_d / temperature
                else:
                    # unnormalized modes (reference conv.py:219-223): the
                    # weight is elementwise, no softmax stats needed
                    w_row = _unnorm_weight(l_row, temperature, mode)
                    w_row = jnp.where(in_tile, w_row, 0.0)
                    w = ohf * w_row
                    dw_row = jnp.sum(ohf * m2, axis=0,
                                     keepdims=True)              # [1, BE]
                    if mode == "sigmoid":
                        dz_row = (dw_row * w_row * (1.0 - w_row)
                                  * leaky_d / temperature)
                    else:                                        # raw
                        dz_row = dw_row * leaky_d
                dz_row = jnp.where(in_tile, dz_row, 0.0)

                new_dmsgs = (jax.lax.dot_general(
                    w, g_ref[:, :],
                    dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=KERNEL_PRECISION,
                ) + jax.lax.dot_general(
                    dz_row, att_row,
                    dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=KERNEL_PRECISION,
                )).astype(dmsgs_out_vmem.dtype)                  # [BE, D]

                dadst_acc = dadst_acc + jax.lax.dot_general(
                    dz_row, ohf,
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=KERNEL_PRECISION,
                )                                                # [1, BN]
                datt_acc = datt_acc + jax.lax.dot_general(
                    dz_row.astype(msgs_vmem.dtype), msgs_vmem[slot],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=KERNEL_PRECISION,
                )                                                # [1, D]

                if owned:
                    # fully-owned window: every lane is this tile's edge or
                    # a sentinel (new_dmsgs == 0 there via the one-hot)
                    dmsgs_out_vmem[slot] = new_dmsgs
                else:
                    # ownership column mask in [BE, 1] orientation: an edge
                    # in this window is owned iff its dst row lives in this
                    # tile (windows of one tile never overlap, so owned
                    # edges are written exactly once; foreign lanes keep
                    # the old value)
                    own_col = jax.lax.dot_general(
                        ohf, jnp.ones((BN, 1), dtype=jnp.float32),
                        dimension_numbers=(((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                        precision=KERNEL_PRECISION,
                    )                                            # [BE, 1]
                    dmsgs_out_vmem[slot] = jnp.where(
                        own_col > 0.0, new_dmsgs, dmsgs_old[slot]
                    )

                _write_op(c, slot, "start")
                return dadst_acc, datt_acc

            dadst_acc, datt_acc = jax.lax.fori_loop(
                0, nchunks, body,
                (
                    jnp.zeros((1, BN), dtype=jnp.float32),
                    jnp.zeros((1, att_ref.shape[1]), dtype=jnp.float32),
                ),
            )
            for tail in range(NBUF):
                cc = nchunks - NBUF + tail

                @pl.when(cc >= 0)
                def _(cc=cc):
                    _write_op(cc, jax.lax.rem(cc, NBUF), "wait")
            dadst_ref[0:1, :] = dadst_acc
            datt_ref[0:1, :] = datt_acc

        @pl.when(nchunks <= 0)
        def _empty():
            dadst_ref[0:1, :] = jnp.zeros((1, BN), dtype=jnp.float32)
            datt_ref[0:1, :] = jnp.zeros(
                (1, datt_ref.shape[1]), dtype=jnp.float32
            )

    return kernel


def _dyn128_scratch(d):
    """Extra VMEM scratch for the dyn128 backward: a_dst / lse / dot_r /
    d_a_dst state columns + the d_att accumulator row."""
    return [
        pltpu.VMEM((BN, 1), jnp.float32),   # a_dst column
        pltpu.VMEM((BN, 1), jnp.float32),   # lse column
        pltpu.VMEM((BN, 1), jnp.float32),   # dot_r column
        pltpu.VMEM((BN, 1), jnp.float32),   # d_a_dst accumulator column
        pltpu.VMEM((8, d), jnp.float32),    # d_att accumulator row
    ]


@functools.partial(
    jax.jit,
    static_argnames=("n_rows", "negative_slope", "temperature", "interpret",
                     "owned", "mode", "dyn128", "fold_tiles"),
)
def _merged_backward_chunked(msgs, att8, adst_tiles, dst, desc_offsets, desc,
                             desc_base, tile2rel, row_max, row_sum, out, g,
                             n_rows, negative_slope, temperature,
                             interpret=False, owned=False, mode="softmax",
                             dyn128=False, fold_tiles=0):
    d = msgs.shape[1]
    n_tiles = n_rows // BN
    # owned (fully fragment-padded) streams are exact BE multiples whose
    # windows tile the stream — skip the [E, D] pad copy
    msgs_p, dst_p = _pad_edge_stream(msgs, dst, n_rows, pre_padded=owned)
    e_pad = msgs_p.shape[0]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((8, d), lambda i, doff, dsc, dbs, t2r: (t2r[i], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, BN), lambda i, doff, dsc, dbs, t2r: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, BN), lambda i, doff, dsc, dbs, t2r: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, BN), lambda i, doff, dsc, dbs, t2r: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BN, d), lambda i, doff, dsc, dbs, t2r: (i, 0),
                         memory_space=pltpu.VMEM),
            # rel-folded cotangent — see _merged_backward
            pl.BlockSpec((BN, d),
                         (lambda i, doff, dsc, dbs, t2r:
                          (i % fold_tiles, 0))
                         if fold_tiles else
                         (lambda i, doff, dsc, dbs, t2r: (i, 0)),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((8, BN), lambda i, doff, dsc, dbs, t2r: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, d), lambda i, doff, dsc, dbs, t2r: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=(
            (
                [
                    pltpu.VMEM((NBUF, BE, d), msgs.dtype),
                    pltpu.VMEM((NBUF, BR, LANE), jnp.int32),
                    pltpu.VMEM((NBUF, BE, d), msgs.dtype),
                    pltpu.SemaphoreType.DMA((NBUF, 2)),
                    pltpu.SemaphoreType.DMA((NBUF,)),
                ] if owned else [
                    pltpu.VMEM((NBUF, BE, d), msgs.dtype),
                    pltpu.VMEM((NBUF, BR, LANE), jnp.int32),
                    pltpu.VMEM((NBUF, BE, d), msgs.dtype),
                    pltpu.VMEM((NBUF, BE, d), msgs.dtype),
                    pltpu.SemaphoreType.DMA((NBUF, 3)),
                    pltpu.SemaphoreType.DMA((NBUF,)),
                ]
            )
            + (_dyn128_scratch(d) if dyn128 else [])
        ),
    )
    dmsgs, dadst_tiles, datt_tiles = pl.pallas_call(
        _make_bwd_kernel_chunked(negative_slope, temperature, owned,
                                 mode=mode, dyn128=dyn128),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((e_pad, d), msgs.dtype),
            jax.ShapeDtypeStruct((n_tiles * 8, BN), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles * 8, d), jnp.float32),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(
        desc_offsets, desc, desc_base, tile2rel, msgs_p, dst_p, att8,
        adst_tiles, row_max, row_sum, out, g,
    )
    e = msgs.shape[0]
    return dmsgs[:e], dadst_tiles, datt_tiles


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13)
)
def fused_gat_layer_chunked(msgs, att, a_dst_all, dst_np, desc_np,
                            desc_off_np, tile2rel_np, n_rows, negative_slope,
                            temperature, interpret=False, owned=False,
                            mode="softmax", rel_fold=0):
    """fused_gat_layer over a chunked (src-chunk-major) edge stream.

    msgs [E, D] in ChunkedStreamLayout order (the concat of per-chunk fast
    takes); dst_np/desc_np/desc_off_np from graph/merged_layout.py
    `build_chunked_stream`. Math identical to fused_gat_layer — only the
    window addressing differs (see module comment above). owned=True
    requires a fully-owned fragment-padded stream (fully_owned layouts)
    and runs the zero-RMW backward kernel. mode selects the per-edge
    weight (softmax / sigmoid / raw — reference conv.py:217-223).
    """
    dbase = _desc_base_cached(None, desc_np, desc_off_np, dst_np, n_rows)
    out, _, _ = _merged_forward_chunked(
        msgs, _prep_att8(att), _prep_adst_tiles(a_dst_all, n_rows),
        jnp.asarray(dst_np), jnp.asarray(desc_off_np),
        jnp.asarray(_nonempty_desc(desc_np)), jnp.asarray(dbase),
        jnp.asarray(tile2rel_np), n_rows, negative_slope, temperature,
        interpret, pre_padded=owned, mode=mode, dyn128=DYN128,
    )
    return _rel_fold_out(out, rel_fold) if rel_fold else out


def _nonempty_desc(desc_np):
    d = np.asarray(desc_np)
    return d if len(d) else np.zeros(1, dtype=np.int32)


def _fglc_fwd(msgs, att, a_dst_all, dst_np, desc_np, desc_off_np,
              tile2rel_np, n_rows, negative_slope, temperature, interpret,
              owned, mode, rel_fold):
    att8 = _prep_att8(att)
    adst_tiles = _prep_adst_tiles(a_dst_all, n_rows)
    dbase = _desc_base_cached(None, desc_np, desc_off_np, dst_np, n_rows)
    out, row_max, row_sum = _merged_forward_chunked(
        msgs, att8, adst_tiles, jnp.asarray(dst_np),
        jnp.asarray(desc_off_np), jnp.asarray(_nonempty_desc(desc_np)),
        jnp.asarray(dbase), jnp.asarray(tile2rel_np), n_rows,
        negative_slope, temperature, interpret, pre_padded=owned, mode=mode,
        dyn128=DYN128,
    )
    ret = _rel_fold_out(out, rel_fold) if rel_fold else out
    return ret, (msgs, att8, adst_tiles, row_max, row_sum, out, att.shape[0])


def _fglc_bwd(dst_np, desc_np, desc_off_np, tile2rel_np, n_rows,
              negative_slope, temperature, interpret, owned, mode, rel_fold,
              residuals, g):
    msgs, att8, adst_tiles, row_max, row_sum, out, n_rel = residuals
    dbase = _desc_base_cached(None, desc_np, desc_off_np, dst_np, n_rows)
    dmsgs, dadst_tiles, datt_tiles = _merged_backward_chunked(
        msgs, att8, adst_tiles, jnp.asarray(dst_np),
        jnp.asarray(desc_off_np), jnp.asarray(_nonempty_desc(desc_np)),
        jnp.asarray(dbase), jnp.asarray(tile2rel_np), row_max, row_sum,
        out, g, n_rows, negative_slope, temperature, interpret, owned, mode,
        dyn128=DYN128,
        fold_tiles=_rel_fold_tiles(n_rows, rel_fold) if rel_fold else 0,
    )
    d_a_dst, d_att = _tile_grads_to_rel(
        dadst_tiles, datt_tiles, tile2rel_np, n_rel, n_rows
    )
    return dmsgs, d_att, d_a_dst


fused_gat_layer_chunked.defvjp(_fglc_fwd, _fglc_bwd)


@functools.partial(
    jax.jit,
    static_argnames=("n_rows", "negative_slope", "temperature", "interpret",
                     "split_bases", "read_bases", "mode", "dyn128",
                     "fold_tiles"),
)
def _merged_backward_chunked_split(msgs, att8, adst_tiles, dst, desc_offsets,
                                   desc, desc_base, tile2rel, row_max,
                                   row_sum, out, g, n_rows, negative_slope,
                                   temperature, split_bases, interpret=False,
                                   read_bases=None, mode="softmax",
                                   dyn128=False, fold_tiles=0):
    """_merged_backward_chunked (owned) emitting dmsgs as one SEPARATE HBM
    buffer per padded chunk block (split_bases: static BE-multiple cuts) —
    see _make_bwd_kernel_chunked. Empty blocks get a never-written BE-row
    placeholder (Mosaic rejects zero-row outputs). read_bases: msgs is a
    TUPLE of per-chunk-block buffers (the forward's never-concatenated
    takes)."""
    if read_bases is None:
        d = msgs.shape[1]
        dtype = msgs.dtype
        msgs_p, dst_p = _pad_edge_stream(msgs, dst, n_rows, pre_padded=True)
        msgs_args = (msgs_p,)
    else:
        d = msgs[0].shape[1]
        dtype = msgs[0].dtype
        assert dst.shape[0] % BE == 0
        dst_p = dst.reshape(-1, LANE)
        msgs_args = tuple(msgs)
    n_tiles = n_rows // BN
    n_split = len(split_bases) - 1

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(n_tiles,),
        in_specs=(
            [pl.BlockSpec(memory_space=pl.ANY)] * len(msgs_args)
            + [
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec((8, d),
                             lambda i, doff, dsc, dbs, t2r: (t2r[i], 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((8, BN),
                             lambda i, doff, dsc, dbs, t2r: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((8, BN),
                             lambda i, doff, dsc, dbs, t2r: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((8, BN),
                             lambda i, doff, dsc, dbs, t2r: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((BN, d),
                             lambda i, doff, dsc, dbs, t2r: (i, 0),
                             memory_space=pltpu.VMEM),
                # rel-folded cotangent — see _merged_backward
                pl.BlockSpec((BN, d),
                             (lambda i, doff, dsc, dbs, t2r:
                              (i % fold_tiles, 0))
                             if fold_tiles else
                             (lambda i, doff, dsc, dbs, t2r: (i, 0)),
                             memory_space=pltpu.VMEM),
            ]
        ),
        out_specs=(
            [pl.BlockSpec(memory_space=pl.ANY)] * n_split
            + [
                pl.BlockSpec((8, BN),
                             lambda i, doff, dsc, dbs, t2r: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((8, d),
                             lambda i, doff, dsc, dbs, t2r: (i, 0),
                             memory_space=pltpu.VMEM),
            ]
        ),
        scratch_shapes=(
            [
                pltpu.VMEM((NBUF, BE, d), dtype),
                pltpu.VMEM((NBUF, BR, LANE), jnp.int32),
                pltpu.VMEM((NBUF, BE, d), dtype),
                pltpu.SemaphoreType.DMA((NBUF, 2)),
                pltpu.SemaphoreType.DMA((NBUF,)),
            ]
            + (_dyn128_scratch(d) if dyn128 else [])
        ),
    )
    res = pl.pallas_call(
        _make_bwd_kernel_chunked(negative_slope, temperature, owned=True,
                                 split_bases=split_bases,
                                 read_bases=read_bases, mode=mode,
                                 dyn128=dyn128),
        grid_spec=grid_spec,
        out_shape=(
            [
                jax.ShapeDtypeStruct(
                    (max(split_bases[k + 1] - split_bases[k], BE), d),
                    dtype,
                )
                for k in range(n_split)
            ]
            + [
                jax.ShapeDtypeStruct((n_tiles * 8, BN), jnp.float32),
                jax.ShapeDtypeStruct((n_tiles * 8, d), jnp.float32),
            ]
        ),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(
        desc_offsets, desc, desc_base, tile2rel, *msgs_args, dst_p, att8,
        adst_tiles, row_max, row_sum, out, g,
    )
    return tuple(res[:n_split]), res[n_split], res[n_split + 1]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7, 8, 9))
def fused_gat_layer_gathered(tabs, att, a_dst_all, cs, aux, negative_slope,
                             temperature, interpret=False, mode="softmax",
                             rel_fold=0):
    """Gather + fused GAT layer in ONE custom-VJP op over a fully-owned
    chunked stream (graph/merged_layout.ChunkedStreamLayout,
    pad_fragments=True).

    tabs: tuple of per-chunk projected-feature tables (relation-aligned
    slices, <= EMITTER_FAST_ROWS rows each). Forward = per-chunk fast takes
    (output IS the padded stream) + the chunked fused layer kernel.
    Backward = the split-output layer kernel (one dmsgs buffer per padded
    chunk block) -> per-chunk fast-emitter takes to CSC order -> one Pallas
    segment-sum over the concat src space -> per-table grads. Fusing the
    two ops keeps the per-chunk buffers SEPARATE across the VJP boundary —
    as two ops, the cotangent would round-trip through one concatenated
    [E, D] array, whose slices XLA re-fuses into big-table gathers.

    aux: (csc_ids_np, csc_offsets_np, n_src_total, n_rows) from the parent
    MergedDstLayout. Replaces reference torch_scatter/torch_sparse use in
    kgwas/conv.py:227-228.
    """
    parts = _take_tab_parts(tabs, cs)
    dbase = _desc_base_cached(cs, cs.desc, cs.desc_offsets, cs.dst, aux[3])
    out, _, _ = _merged_forward_chunked(
        parts, _prep_att8(att), _prep_adst_tiles(a_dst_all, aux[3]),
        jnp.asarray(cs.dst), jnp.asarray(cs.desc_offsets),
        jnp.asarray(_nonempty_desc(cs.desc)), jnp.asarray(dbase),
        jnp.asarray(_aux_t2r(aux)), aux[3], negative_slope, temperature,
        interpret, split_bases=tuple(int(b) for b in cs.chunk_edge_base),
        mode=mode, dyn128=DYN128,
    )
    return _rel_fold_out(out, rel_fold) if rel_fold else out


def _take_tab_parts(tabs, cs):
    """Per-chunk fast takes, NEVER concatenated: the layer kernels read
    them as separate HBM buffers (split_bases/read_bases), so no [E, D]
    concat pass ever runs. Empty chunks get a never-read BE-row dummy
    (Mosaic rejects zero-row operands)."""
    return tuple(
        jnp.take(t, jnp.asarray(ids), axis=0) if len(ids)
        else jnp.zeros((BE, t.shape[1]), t.dtype)
        for t, ids in zip(tabs, cs.local_ids)
    )


def _aux_t2r(aux):
    return aux[4]


def _assemble_grouped_cotangents(bufs, perms, d, dtype):
    """Per-cut fast-emitter takes written into ONE preallocated grouped
    buffer via static-slice updates instead of a concatenate — XLA fuses
    each gather into its destination slice, eliminating the [E, D]
    concat copy pass (~7 ms/step in the 200k trace). Pad-tail rows keep
    the zeros init; the padded segsum ids route them to the trash row.
    Opt-in via KGWAS_DUS_ASSEMBLE (composed A/B decides the default)."""
    from .pallas_segment import padded_stream_len

    e = sum(len(p) for p in perms)
    out = jnp.zeros((padded_stream_len(e), d), dtype)
    o = 0
    for k, p in enumerate(perms):
        if not len(p):
            continue
        t = jnp.take(bufs[k], jnp.asarray(p), axis=0)
        out = jax.lax.dynamic_update_slice(out, t, (o, 0))
        o += len(p)
    return out


def _fglg_fwd(tabs, att, a_dst_all, cs, aux, negative_slope, temperature,
              interpret, mode, rel_fold):
    parts = _take_tab_parts(tabs, cs)
    att8 = _prep_att8(att)
    adst_tiles = _prep_adst_tiles(a_dst_all, aux[3])
    dbase = _desc_base_cached(cs, cs.desc, cs.desc_offsets, cs.dst, aux[3])
    out, row_max, row_sum = _merged_forward_chunked(
        parts, att8, adst_tiles, jnp.asarray(cs.dst),
        jnp.asarray(cs.desc_offsets), jnp.asarray(_nonempty_desc(cs.desc)),
        jnp.asarray(dbase), jnp.asarray(_aux_t2r(aux)), aux[3],
        negative_slope, temperature, interpret,
        split_bases=tuple(int(b) for b in cs.chunk_edge_base),
        mode=mode, dyn128=DYN128,
    )
    ret = _rel_fold_out(out, rel_fold) if rel_fold else out
    return ret, (parts, att8, adst_tiles, row_max, row_sum, out,
                 att.shape[0], tuple(t.shape[0] for t in tabs))


def _fglg_bwd(cs, aux, negative_slope, temperature, interpret, mode,
              rel_fold, residuals, g):
    from ..graph.merged_layout import get_chunked_split_group
    from .pallas_segment import segment_sum_windows

    (msg_parts, att8, adst_tiles, row_max, row_sum, out, n_rel,
     tab_rows) = residuals
    csc_ids_np, csc_offsets_np, n_src_total, n_rows, tile2rel_np = aux
    split_bases = tuple(int(b) for b in cs.chunk_edge_base)
    dbase = _desc_base_cached(cs, cs.desc, cs.desc_offsets, cs.dst, n_rows)
    bufs, dadst_tiles, datt_tiles = _merged_backward_chunked_split(
        msg_parts, att8, adst_tiles, jnp.asarray(cs.dst),
        jnp.asarray(cs.desc_offsets), jnp.asarray(_nonempty_desc(cs.desc)),
        jnp.asarray(dbase), jnp.asarray(tile2rel_np), row_max, row_sum,
        out, g, n_rows, negative_slope, temperature, split_bases, interpret,
        read_bases=split_bases, mode=mode, dyn128=DYN128,
        fold_tiles=_rel_fold_tiles(n_rows, rel_fold) if rel_fold else 0,
    )
    if os.environ.get("KGWAS_SPLIT_SEGSUM", "0") == "1":
        # per-chunk cotangent takes stay SEPARATE into the split-input
        # windowed segment-sum — no [E, D] concat pass. Measured ~2 ms/step
        # SLOWER than concat+plain segsum at bench scale (the per-
        # (chunk, src_tile) windows add read amplification the plain
        # contiguous walk doesn't have) — kept as an opt-in experiment.
        sg = get_chunked_split_group(cs, csc_ids_np, n_src_total)
        parts = tuple(
            jnp.take(bufs[c], jnp.asarray(sg.local_perm[c]), axis=0)
            for c in range(cs.n_chunks)
        )
        dx = segment_sum_windows(
            parts, jnp.asarray(sg.sum_ids),
            jnp.asarray(sg.sum_desc if len(sg.sum_desc)
                        else np.zeros(1, np.int32)),
            jnp.asarray(sg.sum_desc_offsets), n_src_total, interpret,
            split_bases=sg.sum_bases,
        )
    else:
        from .pallas_segment import (pad_stream_ids_np, padded_stream_len,
                                     pallas_segment_sum)

        # per-chunk cotangent takes (fast emitter) -> one CSC-ordered
        # grouped buffer -> plain contiguous segment-sum over the src
        # space. Assembly: concat pass, or DUS writes into one buffer
        # (KGWAS_DUS_ASSEMBLE=1 — no separate copy pass)
        d = msg_parts[0].shape[1]
        if any(len(p) for p in cs.local_perm):
            if os.environ.get("KGWAS_DUS_ASSEMBLE", "0") == "1":
                g_sorted = _assemble_grouped_cotangents(
                    bufs, cs.local_perm, d, msg_parts[0].dtype)
            else:
                parts = [
                    jnp.take(bufs[c], jnp.asarray(cs.local_perm[c]), axis=0)
                    for c in range(cs.n_chunks) if len(cs.local_perm[c])
                ]
                e = sum(len(p) for p in cs.local_perm)
                parts.append(jnp.zeros((padded_stream_len(e) - e, d),
                                       parts[0].dtype))
                g_sorted = jnp.concatenate(parts, axis=0)
            dx = pallas_segment_sum(
                g_sorted,
                jnp.asarray(pad_stream_ids_np(csc_ids_np, n_src_total)),
                jnp.asarray(csc_offsets_np), n_src_total, interpret,
                pre_padded=True,
            )
        else:
            dx = jnp.zeros((n_src_total, d), dtype=jnp.float32)
    dtabs, o = [], 0
    for r in tab_rows:
        dtabs.append(dx[o:o + r])
        o += r

    d_a_dst, d_att = _tile_grads_to_rel(
        dadst_tiles, datt_tiles, tile2rel_np, n_rel, n_rows
    )
    return tuple(dtabs), d_att, d_a_dst


fused_gat_layer_gathered.defvjp(_fglg_fwd, _fglg_bwd)


# ---------------------------------------------------------------------------
# Traced-layout variant of the gathered op: layout arrays as runtime
# OPERANDS instead of HLO literals.
#
# jax inlines every closed-over/np array as a stablehlo literal (measured:
# a 2M-element constant costs 16 MB of program text whether numpy or
# device array), so at full-KG scale the merged-layout index arrays
# (556 MiB at 2M SNPs) ballooned the serialized program past what the
# axon relay's /remote_compile endpoint survives (three broken-pipe
# failures, benchmarks/RESULTS.md round 4). Only genuine function
# ARGUMENTS lower as HLO parameters — this op takes the layout bundle
# as a primal pytree arg (zero cotangent), the same pattern as
# fused_gat_layer_t for the shard_map path. The kernels are UNTOUCHED:
# pallas_call always received these as operands; only the outer HLO
# changes (parameter vs literal).
# ---------------------------------------------------------------------------


# Single-buffer ceiling for the backward's concatenated CSC cotangent.
# The on-chip full-KG ladder (benchmarks/RESULTS.md round 5) passes at
# 1.5M SNPs (3.43 GB concat) and kills the relay's chipless TpuAotCompiler
# helper at 2M (4.56 GB) — consistent with a 2^32-byte per-buffer limit.
# Above this, the gathered backward switches to the split-input windowed
# segment-sum (SplitCscGroup): per-chunk cotangent buffers stay separate
# end-to-end, no [E, D] concat ever materializes.
CONCAT_COTANGENT_MAX_BYTES = 4_000_000_000


def _needs_split_segsum(e_real, d, dtype):
    from .pallas_segment import padded_stream_len

    return (padded_stream_len(int(e_real)) * int(d)
            * np.dtype(dtype).itemsize) > CONCAT_COTANGENT_MAX_BYTES


# Residual policy for the traced (_t) gathered ops: above this many bytes
# of [E, D] message stream, the forward saves the SMALL source tables and
# the backward recomputes the gather, instead of keeping the stream as a
# residual. Under per-layer remat every group's residuals coexist — at 2M
# SNPs the streams alone are ~8.6 GB bf16, which is what pushed the layer
# backward past the chip. Bench-scale groups (<1 GB) keep the saved-stream
# form (no recompute cost).
LOW_RESIDUAL_MIN_BYTES = 1_000_000_000

# Above this many bytes of [n_rows, D] f32 forward output, the traced ops
# also drop the out/row_max/row_sum residuals and RERUN the forward kernel
# inside the backward (deterministic kernels -> identical values). One
# extra stream pass per such group, ~GBs of residuals saved — the second
# full-KG fit lever (the SNP dst groups' out residuals alone are ~2 GB
# f32 at 2M).
OUT_RECOMPUTE_MIN_BYTES = 400_000_000


def _low_residual(stream_rows, d, dtype):
    return (int(stream_rows) * int(d)
            * np.dtype(dtype).itemsize) > LOW_RESIDUAL_MIN_BYTES


def _recompute_out(n_rows, d):
    return int(n_rows) * int(d) * 4 > OUT_RECOMPUTE_MIN_BYTES


def layout_operand_arrays(cs, aux, split_group=False):
    """Numpy bundle of the gathered path's layout arrays, to be device_put
    ONCE (ride the graph `arrays` pytree) and passed to
    fused_gat_layer_gathered_t as a traced argument. split_group: also
    include the SplitCscGroup arrays for the no-concat backward (required
    when the concatenated cotangent would exceed
    CONCAT_COTANGENT_MAX_BYTES)."""
    from .pallas_segment import pad_stream_ids_np

    csc_ids_np, csc_offsets_np, n_src_total, n_rows, tile2rel_np = aux
    dbase = _desc_base_cached(cs, cs.desc, cs.desc_offsets, cs.dst, n_rows)
    if split_group:
        from ..graph.merged_layout import get_chunked_split_group

        sg = get_chunked_split_group(cs, csc_ids_np, n_src_total)
        extra = {
            "split_local_perm": tuple(np.asarray(pm, np.int32)
                                      for pm in sg.local_perm),
            "sum_ids": np.asarray(sg.sum_ids, np.int32),
            "sum_desc": np.asarray(
                sg.sum_desc if len(sg.sum_desc) else np.zeros(1, np.int32),
                np.int32),
            "sum_desc_offsets": np.asarray(sg.sum_desc_offsets, np.int32),
        }
    else:
        extra = {}
    return {
        **extra,
        "local_ids": tuple(np.asarray(i, np.int32) for i in cs.local_ids),
        "local_perm": tuple(np.asarray(p, np.int32) for p in cs.local_perm),
        "dst": np.asarray(cs.dst, np.int32),
        "desc": np.asarray(_nonempty_desc(cs.desc), np.int32),
        "desc_offsets": np.asarray(cs.desc_offsets, np.int32),
        "desc_base": np.asarray(dbase, np.int32),
        "tile2rel": np.asarray(tile2rel_np, np.int32),
        "csc_ids_pad": np.asarray(
            pad_stream_ids_np(csc_ids_np, n_src_total), np.int32),
        "csc_offsets": np.asarray(csc_offsets_np, np.int32),
    }


def _check_layout_fingerprint(lay, cs):
    """Trace-time consistency check between a traced layout bundle and the
    static chunked-stream facts it must have been built from. The kernels
    index with TPU `take` (clamping) and the per-chunk zips would silently
    truncate, so a bundle built under a DIFFERENT cfg (gather_chunk_rows /
    pad_fragments) than the apply-time one would yield wrong numerics, not
    an error — catch it here via the bundle arrays' STATIC shapes."""
    def _fail(what, got, want):
        raise ValueError(
            "layout operand bundle does not match the apply-time chunked "
            f"stream ({what}: bundle has {got}, cs wants {want}) — it was "
            "built under a different cfg (gather_chunk_rows/pad_fragments); "
            "rebuild with models.hetero_gnn.build_layout_operands(cfg, meta)")
    if len(lay["local_ids"]) != cs.n_chunks:
        _fail("n_chunks", len(lay["local_ids"]), cs.n_chunks)
    for c in range(cs.n_chunks):
        if lay["local_ids"][c].shape[0] != len(cs.local_ids[c]):
            _fail(f"local_ids[{c}] len", lay["local_ids"][c].shape[0],
                  len(cs.local_ids[c]))
        if lay["local_perm"][c].shape[0] != len(cs.local_perm[c]):
            _fail(f"local_perm[{c}] len", lay["local_perm"][c].shape[0],
                  len(cs.local_perm[c]))
    for name, want in (("dst", np.asarray(cs.dst).shape),
                       ("desc", np.asarray(_nonempty_desc(cs.desc)).shape),
                       ("desc_offsets", np.asarray(cs.desc_offsets).shape)):
        if tuple(lay[name].shape) != tuple(want):
            _fail(f"{name} shape", tuple(lay[name].shape), tuple(want))


def _take_tab_parts_t(tabs, lay, lens):
    """_take_tab_parts with traced per-chunk id vectors (emptiness is
    static layout info, so the dummy-block decision stays static)."""
    return tuple(
        jnp.take(t, ids, axis=0) if n
        else jnp.zeros((BE, t.shape[1]), t.dtype)
        for t, ids, n in zip(tabs, lay["local_ids"], lens)
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8, 9, 10))
def fused_gat_layer_gathered_t(tabs, att, a_dst_all, lay, cs, aux,
                               negative_slope, temperature, interpret=False,
                               mode="softmax", rel_fold=0):
    """fused_gat_layer_gathered with the layout bundle as a TRACED operand
    (`lay` = device-put layout_operand_arrays(cs, aux)). Math identical;
    `cs` keeps only the static facts the trace needs (chunk lens, padded
    block boundaries, fully_owned). Backward: concat+plain-segsum by
    default; the split-input windowed segment-sum (no concat) is selected
    AUTOMATICALLY above CONCAT_COTANGENT_MAX_BYTES (the bundle must then
    carry the SplitCscGroup arrays — build_layout_operands handles it).
    The KGWAS_DUS_ASSEMBLE opt-in experiment is not mirrored here."""
    _check_layout_fingerprint(lay, cs)
    lens = tuple(len(i) for i in cs.local_ids)
    out, _, _ = _merged_forward_chunked(
        _take_tab_parts_t(tabs, lay, lens), _prep_att8(att),
        _prep_adst_tiles(a_dst_all, aux[3]), lay["dst"],
        lay["desc_offsets"], lay["desc"], lay["desc_base"], lay["tile2rel"],
        aux[3], negative_slope, temperature, interpret,
        split_bases=tuple(int(b) for b in cs.chunk_edge_base),
        mode=mode, dyn128=DYN128,
    )
    return _rel_fold_out(out, rel_fold) if rel_fold else out


def _fglgt_fwd(tabs, att, a_dst_all, lay, cs, aux, negative_slope,
               temperature, interpret, mode, rel_fold):
    _check_layout_fingerprint(lay, cs)
    lens = tuple(len(i) for i in cs.local_ids)
    parts = _take_tab_parts_t(tabs, lay, lens)
    att8 = _prep_att8(att)
    adst_tiles = _prep_adst_tiles(a_dst_all, aux[3])
    out, row_max, row_sum = _merged_forward_chunked(
        parts, att8, adst_tiles, lay["dst"], lay["desc_offsets"],
        lay["desc"], lay["desc_base"], lay["tile2rel"], aux[3],
        negative_slope, temperature, interpret,
        split_bases=tuple(int(b) for b in cs.chunk_edge_base),
        mode=mode, dyn128=DYN128,
    )
    ret = _rel_fold_out(out, rel_fold) if rel_fold else out
    low = _low_residual(cs.chunk_edge_base[-1], tabs[0].shape[1],
                        tabs[0].dtype)
    rec = _recompute_out(aux[3], tabs[0].shape[1])
    return ret, (tabs if low else parts, att8, adst_tiles,
                 None if rec else row_max, None if rec else row_sum,
                 None if rec else out, lay, att.shape[0],
                 tuple(t.shape[0] for t in tabs))


def _fglgt_bwd(cs, aux, negative_slope, temperature, interpret, mode,
               rel_fold, residuals, g):
    from .pallas_segment import (pallas_segment_sum, padded_stream_len)

    (msg_parts, att8, adst_tiles, row_max, row_sum, out, lay, n_rel,
     tab_rows) = residuals
    if _low_residual(cs.chunk_edge_base[-1], msg_parts[0].shape[1],
                     msg_parts[0].dtype):
        # low-residual form: msg_parts holds the SOURCE TABLES — recompute
        # the gathered stream here (same takes as the forward). The
        # optimization barrier stops XLA from CSE-ing the recompute with
        # the forward's identical takes — which would silently KEEP the
        # stream buffer alive and undo the residual saving entirely.
        msg_parts = jax.lax.optimization_barrier(msg_parts)
        lens = tuple(len(i) for i in cs.local_ids)
        msg_parts = _take_tab_parts_t(msg_parts, lay, lens)
    if _recompute_out(aux[3], msg_parts[0].shape[1]):
        msg_parts = jax.lax.optimization_barrier(msg_parts)
        # out-recompute form: rerun the forward kernel for out/row stats
        # (deterministic -> identical values; saves the f32 residuals)
        out, row_max, row_sum = _merged_forward_chunked(
            msg_parts, att8, adst_tiles, lay["dst"], lay["desc_offsets"],
            lay["desc"], lay["desc_base"], lay["tile2rel"], aux[3],
            negative_slope, temperature, interpret,
            split_bases=tuple(int(b) for b in cs.chunk_edge_base),
            mode=mode, dyn128=DYN128,
        )
    csc_ids_np, _, n_src_total, n_rows, _ = aux
    split_bases = tuple(int(b) for b in cs.chunk_edge_base)
    bufs, dadst_tiles, datt_tiles = _merged_backward_chunked_split(
        msg_parts, att8, adst_tiles, lay["dst"], lay["desc_offsets"],
        lay["desc"], lay["desc_base"], lay["tile2rel"], row_max, row_sum,
        out, g, n_rows, negative_slope, temperature, split_bases, interpret,
        read_bases=split_bases, mode=mode, dyn128=DYN128,
        fold_tiles=_rel_fold_tiles(n_rows, rel_fold) if rel_fold else 0,
    )
    d = msg_parts[0].shape[1]
    perm_lens = tuple(len(p) for p in cs.local_perm)
    e = sum(perm_lens)
    if e and _needs_split_segsum(e, d, msg_parts[0].dtype):
        # no-concat backward: the concatenated cotangent would exceed the
        # per-buffer ceiling (CONCAT_COTANGENT_MAX_BYTES) — per-chunk
        # buffers feed the split-input windowed segment-sum directly
        from .pallas_segment import segment_sum_windows
        from ..graph.merged_layout import get_chunked_split_group

        if "sum_ids" not in lay:
            raise ValueError(
                f"gathered backward needs the split segment-sum at this "
                f"scale ({e:,} edges x {d} cols exceeds "
                f"{CONCAT_COTANGENT_MAX_BYTES/1e9:.1f} GB concatenated) "
                "but the layout bundle lacks the SplitCscGroup arrays — "
                "rebuild with build_layout_operands (it includes them "
                "automatically at this scale)")
        sg = get_chunked_split_group(cs, csc_ids_np, n_src_total)
        if (len(lay["split_local_perm"]) != len(sg.local_perm)
                or any(lay["split_local_perm"][c].shape[0]
                       != len(sg.local_perm[c])
                       for c in range(len(sg.local_perm)))
                or lay["sum_ids"].shape[0] != len(sg.sum_ids)):
            raise ValueError(
                "split layout operand bundle does not match the apply-time "
                "SplitCscGroup — rebuild with build_layout_operands")
        parts = tuple(
            jnp.take(bufs[c], lay["split_local_perm"][c], axis=0)
            for c in range(cs.n_chunks)
        )
        dx = segment_sum_windows(
            parts, lay["sum_ids"], lay["sum_desc"],
            lay["sum_desc_offsets"], n_src_total, interpret,
            split_bases=sg.sum_bases,
        )
    elif e:
        parts = [
            jnp.take(bufs[c], lay["local_perm"][c], axis=0)
            for c in range(cs.n_chunks) if perm_lens[c]
        ]
        parts.append(jnp.zeros((padded_stream_len(e) - e, d),
                               parts[0].dtype))
        g_sorted = jnp.concatenate(parts, axis=0)
        dx = pallas_segment_sum(
            g_sorted, lay["csc_ids_pad"], lay["csc_offsets"], n_src_total,
            interpret, pre_padded=True,
        )
    else:
        dx = jnp.zeros((n_src_total, d), dtype=jnp.float32)
    dtabs, o = [], 0
    for r in tab_rows:
        dtabs.append(dx[o:o + r])
        o += r

    # _tile_grads_to_rel needs a STATIC tile2rel (numpy selector matmul);
    # with a traced tile2rel use the iota-compare form (fused_gat_layer_t)
    d_a_dst = dadst_tiles[::8].reshape(n_rows)
    n_tiles = n_rows // BN
    onehot = (
        jax.lax.broadcasted_iota(jnp.int32, (n_rel, n_tiles), 0)
        == lay["tile2rel"][None, :]
    ).astype(jnp.float32)
    d_att = onehot @ datt_tiles[::8]
    return tuple(dtabs), d_att, d_a_dst, None


fused_gat_layer_gathered_t.defvjp(_fglgt_fwd, _fglgt_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7, 8, 9))
def fused_gat_layer_plain_gathered(xs_all, att, a_dst_all, lay, aux,
                                   negative_slope, temperature,
                                   interpret=False, mode="softmax",
                                   rel_fold=0):
    """Gather + fused GAT layer in ONE custom-VJP op over an owned PLAIN
    stream (graph/merged_layout.OwnedPlainLayout) — for groups whose
    forward table xs_all is already fast (n_src_total <= EMITTER_FAST_ROWS)
    but whose [E, D] cotangent table is slow (E > EMITTER_FAST_ROWS;
    "SNP-shaped": small src space, huge edge count).

    Forward: one fast take over the per-tile BE-padded stream + the
    chunked-kernel forward (per-tile window descriptors). Backward: the
    split-output owned kernel emits one dmsgs buffer per uniform
    EMITTER_FAST_ROWS cut; per-cut fast-emitter takes to the cut-grouped
    CSC order; segment_sum_windows reduces over the src space. Supersedes
    the fragment-windowed opt-in (cfg.bwd_window_edges), whose takes XLA
    re-fused into big-table gathers — separate pallas output buffers are
    immune. Replaces reference torch_scatter use (kgwas/conv.py:227-228).

    aux: (n_src_total, n_rows, tile2rel_np).
    """
    msgs = jnp.take(xs_all, jnp.asarray(lay.src), axis=0)
    dbase = _desc_base_cached(lay, lay.desc, lay.desc_offsets, lay.dst,
                              aux[1])
    out, _, _ = _merged_forward_chunked(
        msgs, _prep_att8(att), _prep_adst_tiles(a_dst_all, aux[1]),
        jnp.asarray(lay.dst), jnp.asarray(lay.desc_offsets),
        jnp.asarray(_nonempty_desc(lay.desc)), jnp.asarray(dbase),
        jnp.asarray(aux[2]), aux[1], negative_slope, temperature, interpret,
        pre_padded=True, mode=mode, dyn128=DYN128,
    )
    return _rel_fold_out(out, rel_fold) if rel_fold else out


def _fglpg_fwd(xs_all, att, a_dst_all, lay, aux, negative_slope, temperature,
               interpret, mode, rel_fold):
    msgs = jnp.take(xs_all, jnp.asarray(lay.src), axis=0)
    att8 = _prep_att8(att)
    adst_tiles = _prep_adst_tiles(a_dst_all, aux[1])
    dbase = _desc_base_cached(lay, lay.desc, lay.desc_offsets, lay.dst,
                              aux[1])
    out, row_max, row_sum = _merged_forward_chunked(
        msgs, att8, adst_tiles, jnp.asarray(lay.dst),
        jnp.asarray(lay.desc_offsets), jnp.asarray(_nonempty_desc(lay.desc)),
        jnp.asarray(dbase), jnp.asarray(aux[2]), aux[1], negative_slope,
        temperature, interpret, pre_padded=True, mode=mode, dyn128=DYN128,
    )
    ret = _rel_fold_out(out, rel_fold) if rel_fold else out
    return ret, (msgs, att8, adst_tiles, row_max, row_sum, out, att.shape[0])


def _fglpg_bwd(lay, aux, negative_slope, temperature, interpret, mode,
               rel_fold, residuals, g):
    from .pallas_segment import segment_sum_windows

    msgs, att8, adst_tiles, row_max, row_sum, out, n_rel = residuals
    n_src_total, n_rows, tile2rel_np = aux
    split_bases = tuple(int(b) for b in lay.cut_bases)
    dbase = _desc_base_cached(lay, lay.desc, lay.desc_offsets, lay.dst,
                              n_rows)
    bufs, dadst_tiles, datt_tiles = _merged_backward_chunked_split(
        msgs, att8, adst_tiles, jnp.asarray(lay.dst),
        jnp.asarray(lay.desc_offsets), jnp.asarray(_nonempty_desc(lay.desc)),
        jnp.asarray(dbase), jnp.asarray(tile2rel_np), row_max, row_sum,
        out, g, n_rows, negative_slope, temperature, split_bases, interpret,
        mode=mode, dyn128=DYN128,
        fold_tiles=_rel_fold_tiles(n_rows, rel_fold) if rel_fold else 0,
    )
    if os.environ.get("KGWAS_SPLIT_SEGSUM", "0") == "1":
        # per-cut cotangent takes stay SEPARATE into the split-input
        # windowed segment-sum — no [E, D] concat pass. ~2 ms/step SLOWER
        # at bench scale (K-way branch-selected DMA per window + padded
        # per-cut blocks raise window read-amp) — opt-in experiment, see
        # _fglg_bwd.
        from ..graph.merged_layout import get_owned_split_group

        sg = get_owned_split_group(lay, n_src_total)
        parts = tuple(
            jnp.take(bufs[k], jnp.asarray(sg.local_perm[k]), axis=0)
            for k in range(len(bufs))
        )
        dx = segment_sum_windows(
            parts, jnp.asarray(sg.sum_ids),
            jnp.asarray(sg.sum_desc if len(sg.sum_desc)
                        else np.zeros(1, np.int32)),
            jnp.asarray(sg.sum_desc_offsets), n_src_total, interpret,
            split_bases=sg.sum_bases,
        )
    else:
        from .pallas_segment import pad_stream_ids_np, padded_stream_len

        # per-cut fast-emitter takes -> one cut-grouped buffer -> windowed
        # segment-sum. Assembly: concat pass, or DUS writes into one
        # buffer (KGWAS_DUS_ASSEMBLE=1 — no separate copy pass)
        if any(len(p) for p in lay.local_perm):
            if os.environ.get("KGWAS_DUS_ASSEMBLE", "0") == "1":
                gc = _assemble_grouped_cotangents(
                    bufs, lay.local_perm, msgs.shape[1], msgs.dtype)
            else:
                parts = [
                    jnp.take(bufs[k], jnp.asarray(lay.local_perm[k]), axis=0)
                    for k in range(len(bufs)) if len(lay.local_perm[k])
                ]
                e = sum(len(p) for p in lay.local_perm)
                parts.append(jnp.zeros((padded_stream_len(e) - e,
                                        parts[0].shape[1]), parts[0].dtype))
                gc = jnp.concatenate(parts, axis=0)
            dx = segment_sum_windows(
                gc, jnp.asarray(pad_stream_ids_np(lay.sum_ids, n_src_total)),
                jnp.asarray(lay.sum_desc if len(lay.sum_desc)
                            else np.zeros(1, np.int32)),
                jnp.asarray(lay.sum_desc_offsets), n_src_total, interpret,
                pre_padded=True,
            )
        else:
            dx = jnp.zeros((n_src_total, msgs.shape[1]),
                           dtype=jnp.float32)

    d_a_dst, d_att = _tile_grads_to_rel(
        dadst_tiles, datt_tiles, tile2rel_np, n_rel, n_rows
    )
    return dx, d_att, d_a_dst


fused_gat_layer_plain_gathered.defvjp(_fglpg_fwd, _fglpg_bwd)


# ---------------------------------------------------------------------------
# Traced-layout variant of the owned-plain op (same motivation as
# fused_gat_layer_gathered_t: layout index arrays as HLO PARAMETERS, not
# literals — at 2M SNPs the SNP/BP/CC/MF dst groups take this path after
# the CHUNK_READ_AMP_MAX guard, and their plain layouts alone would bake
# hundreds of MiB of literals into the program text).
# ---------------------------------------------------------------------------


def plain_layout_operand_arrays(lay, aux):
    """Numpy bundle of the owned-plain path's layout arrays, to be
    device_put ONCE (ride the graph `arrays` pytree) and passed to
    fused_gat_layer_plain_gathered_t as a traced argument."""
    from .pallas_segment import pad_stream_ids_np

    n_src_total, n_rows, _ = aux
    dbase = _desc_base_cached(lay, lay.desc, lay.desc_offsets, lay.dst,
                              n_rows)
    return {
        "src": np.asarray(lay.src, np.int32),
        "dst": np.asarray(lay.dst, np.int32),
        "desc": np.asarray(_nonempty_desc(lay.desc), np.int32),
        "desc_offsets": np.asarray(lay.desc_offsets, np.int32),
        "desc_base": np.asarray(dbase, np.int32),
        "local_perm": tuple(np.asarray(pm, np.int32)
                            for pm in lay.local_perm),
        "sum_ids_pad": np.asarray(
            pad_stream_ids_np(lay.sum_ids, n_src_total), np.int32),
        "sum_desc": np.asarray(
            lay.sum_desc if len(lay.sum_desc) else np.zeros(1, np.int32),
            np.int32),
        "sum_desc_offsets": np.asarray(lay.sum_desc_offsets, np.int32),
    }


def _check_plain_fingerprint(layt, lay):
    """Trace-time shape consistency between a traced plain-layout bundle
    and the apply-time OwnedPlainLayout (see _check_layout_fingerprint)."""
    def _fail(what, got, want):
        raise ValueError(
            "plain layout operand bundle does not match the apply-time "
            f"owned-plain layout ({what}: bundle has {got}, layout wants "
            f"{want}) — rebuild with "
            "models.hetero_gnn.build_layout_operands(cfg, meta)")
    if len(layt["local_perm"]) != len(lay.local_perm):
        _fail("n_cuts", len(layt["local_perm"]), len(lay.local_perm))
    for k in range(len(lay.local_perm)):
        if layt["local_perm"][k].shape[0] != len(lay.local_perm[k]):
            _fail(f"local_perm[{k}] len", layt["local_perm"][k].shape[0],
                  len(lay.local_perm[k]))
    for name, want in (("src", np.asarray(lay.src).shape),
                       ("dst", np.asarray(lay.dst).shape),
                       ("desc", np.asarray(_nonempty_desc(lay.desc)).shape),
                       ("desc_offsets", np.asarray(lay.desc_offsets).shape)):
        if tuple(layt[name].shape) != tuple(want):
            _fail(f"{name} shape", tuple(layt[name].shape), tuple(want))


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8, 9, 10))
def fused_gat_layer_plain_gathered_t(xs_all, att, a_dst_all, layt, lay, aux,
                                     negative_slope, temperature,
                                     interpret=False, mode="softmax",
                                     rel_fold=0):
    """fused_gat_layer_plain_gathered with the layout bundle as a TRACED
    operand (`layt` = device-put plain_layout_operand_arrays(lay, aux)).
    Math identical; `lay` keeps only the static facts (cut_bases, per-cut
    perm lengths). The KGWAS_SPLIT_SEGSUM / KGWAS_DUS_ASSEMBLE opt-in
    experiments are not mirrored here (the default concat backward is)."""
    _check_plain_fingerprint(layt, lay)
    msgs = jnp.take(xs_all, layt["src"], axis=0)
    out, _, _ = _merged_forward_chunked(
        msgs, _prep_att8(att), _prep_adst_tiles(a_dst_all, aux[1]),
        layt["dst"], layt["desc_offsets"], layt["desc"], layt["desc_base"],
        jnp.asarray(aux[2]), aux[1], negative_slope, temperature, interpret,
        pre_padded=True, mode=mode, dyn128=DYN128,
    )
    return _rel_fold_out(out, rel_fold) if rel_fold else out


def _fglpgt_fwd(xs_all, att, a_dst_all, layt, lay, aux, negative_slope,
                temperature, interpret, mode, rel_fold):
    _check_plain_fingerprint(layt, lay)
    msgs = jnp.take(xs_all, layt["src"], axis=0)
    att8 = _prep_att8(att)
    adst_tiles = _prep_adst_tiles(a_dst_all, aux[1])
    out, row_max, row_sum = _merged_forward_chunked(
        msgs, att8, adst_tiles, layt["dst"], layt["desc_offsets"],
        layt["desc"], layt["desc_base"], jnp.asarray(aux[2]), aux[1],
        negative_slope, temperature, interpret, pre_padded=True, mode=mode,
        dyn128=DYN128,
    )
    ret = _rel_fold_out(out, rel_fold) if rel_fold else out
    low = _low_residual(layt["src"].shape[0], xs_all.shape[1], xs_all.dtype)
    rec = _recompute_out(aux[1], xs_all.shape[1])
    return ret, (xs_all if low else msgs, att8, adst_tiles,
                 None if rec else row_max, None if rec else row_sum,
                 None if rec else out, layt, att.shape[0])


def _fglpgt_bwd(lay, aux, negative_slope, temperature, interpret, mode,
                rel_fold, residuals, g):
    from .pallas_segment import padded_stream_len, segment_sum_windows

    msgs, att8, adst_tiles, row_max, row_sum, out, layt, n_rel = residuals
    n_src_total, n_rows, tile2rel_np = aux
    if _low_residual(layt["src"].shape[0], msgs.shape[1], msgs.dtype):
        # low-residual form: msgs holds xs_all — recompute the gather
        # (barrier: see _fglgt_bwd — prevents CSE with the forward)
        msgs = jnp.take(jax.lax.optimization_barrier(msgs),
                        layt["src"], axis=0)
    if _recompute_out(n_rows, msgs.shape[1]):
        msgs = jax.lax.optimization_barrier(msgs)
        out, row_max, row_sum = _merged_forward_chunked(
            msgs, att8, adst_tiles,
            layt["dst"], layt["desc_offsets"], layt["desc"],
            layt["desc_base"], jnp.asarray(tile2rel_np), n_rows,
            negative_slope, temperature, interpret, pre_padded=True,
            mode=mode, dyn128=DYN128,
        )
    split_bases = tuple(int(b) for b in lay.cut_bases)
    bufs, dadst_tiles, datt_tiles = _merged_backward_chunked_split(
        msgs, att8, adst_tiles, layt["dst"], layt["desc_offsets"],
        layt["desc"], layt["desc_base"], jnp.asarray(tile2rel_np), row_max,
        row_sum, out, g, n_rows, negative_slope, temperature, split_bases,
        interpret, mode=mode, dyn128=DYN128,
        fold_tiles=_rel_fold_tiles(n_rows, rel_fold) if rel_fold else 0,
    )
    perm_lens = tuple(len(pm) for pm in lay.local_perm)
    if any(perm_lens):
        parts = [
            jnp.take(bufs[k], layt["local_perm"][k], axis=0)
            for k in range(len(bufs)) if perm_lens[k]
        ]
        e = sum(perm_lens)
        parts.append(jnp.zeros((padded_stream_len(e) - e, parts[0].shape[1]),
                               parts[0].dtype))
        gc = jnp.concatenate(parts, axis=0)
        dx = segment_sum_windows(
            gc, layt["sum_ids_pad"], layt["sum_desc"],
            layt["sum_desc_offsets"], n_src_total, interpret,
            pre_padded=True,
        )
    else:
        dx = jnp.zeros((n_src_total, msgs.shape[1]), dtype=jnp.float32)

    d_a_dst, d_att = _tile_grads_to_rel(
        dadst_tiles, datt_tiles, tile2rel_np, n_rel, n_rows
    )
    return dx, d_att, d_a_dst, None


fused_gat_layer_plain_gathered_t.defvjp(_fglpgt_fwd, _fglpgt_bwd)


# ---------------------------------------------------------------------------
# Traced-layout variant of the RAW path (gather_rows_csc + fused_gat_layer
# in one custom-VJP op, layout arrays as operands). The fallback kind for
# groups the chunked path rejects (fragment-padding amplification,
# CHUNK_READ_AMP_MAX) and the owned-plain path rejects (segsum
# sum_read_amp): at 2M SNPs that is the SNP/BP/CC/MF dst groups, whose
# plain layouts as literals alone exceed the relay's program ceiling.
# Path-choice neutral: identical math and kernels to the literal raw path.
# ---------------------------------------------------------------------------


def raw_layout_operand_arrays(L):
    """Numpy bundle of the raw path's layout arrays for one merged dst
    group (device_put once via the graph arrays pytree)."""
    from .pallas_segment import pad_stream_ids_np, padded_stream_len

    perm = np.asarray(L.csc_perm)
    perm_p = np.zeros(padded_stream_len(len(perm)), np.int32)
    perm_p[: len(perm)] = perm
    return {
        "src": np.asarray(L.src, np.int32),
        "dst": np.asarray(L.dst, np.int32),
        "tile_starts": np.asarray(_tile_starts_np(L.row_offsets), np.int32),
        "tile2rel": np.asarray(L.tile2rel, np.int32),
        "csc_perm_pad": perm_p,
        "csc_ids_pad": np.asarray(
            pad_stream_ids_np(L.csc_ids, L.n_src_total), np.int32),
        "csc_offsets": np.asarray(L.csc_offsets, np.int32),
    }


def _check_raw_fingerprint(layr, L):
    """Trace-time shape consistency between a traced raw bundle and the
    apply-time merged layout (see _check_layout_fingerprint)."""
    def _fail(what, got, want):
        raise ValueError(
            "raw layout operand bundle does not match the apply-time merged "
            f"layout ({what}: bundle has {got}, layout wants {want}) — "
            "rebuild with models.hetero_gnn.build_layout_operands(cfg, meta)")
    for name, want in (("src", np.asarray(L.src).shape),
                       ("dst", np.asarray(L.dst).shape),
                       ("tile2rel", np.asarray(L.tile2rel).shape)):
        if tuple(layr[name].shape) != tuple(want):
            _fail(f"{name} shape", tuple(layr[name].shape), tuple(want))
    # _tile_starts_np: row_offsets[::BN] (n_tiles+1 entries) + the final
    # offset appended again
    n_tiles = L.n_rows_total // BN
    if layr["tile_starts"].shape[0] != n_tiles + 2:
        _fail("tile_starts len", layr["tile_starts"].shape[0], n_tiles + 2)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8, 9))
def fused_gat_layer_raw_gathered_t(xs_all, att, a_dst_all, layr, L, aux,
                                   negative_slope, temperature,
                                   interpret=False, rel_fold=0):
    """gather_rows_csc + fused_gat_layer as ONE custom-VJP op with the
    layout bundle as a TRACED operand (`layr` = device-put
    raw_layout_operand_arrays(L)). Softmax mode only (the unnorm modes
    keep the literal path). aux: (n_src_total, n_rows)."""
    _check_raw_fingerprint(layr, L)
    msgs = jnp.take(xs_all, layr["src"], axis=0)
    out, _, _ = _merged_forward(
        msgs, _prep_att8(att), _prep_adst_tiles(a_dst_all, aux[1]),
        layr["dst"], layr["tile_starts"], layr["tile2rel"], aux[1],
        negative_slope, temperature, interpret,
    )
    return _rel_fold_out(out, rel_fold) if rel_fold else out


def _fglrgt_fwd(xs_all, att, a_dst_all, layr, L, aux, negative_slope,
                temperature, interpret, rel_fold):
    _check_raw_fingerprint(layr, L)
    msgs = jnp.take(xs_all, layr["src"], axis=0)
    att8 = _prep_att8(att)
    adst_tiles = _prep_adst_tiles(a_dst_all, aux[1])
    out, row_max, row_sum = _merged_forward(
        msgs, att8, adst_tiles, layr["dst"], layr["tile_starts"],
        layr["tile2rel"], aux[1], negative_slope, temperature, interpret,
    )
    ret = _rel_fold_out(out, rel_fold) if rel_fold else out
    low = _low_residual(layr["src"].shape[0], xs_all.shape[1], xs_all.dtype)
    rec = _recompute_out(aux[1], xs_all.shape[1])
    return ret, (xs_all if low else msgs, att8, adst_tiles,
                 None if rec else row_max, None if rec else row_sum,
                 None if rec else out, layr, att.shape[0])


def _fglrgt_bwd(L, aux, negative_slope, temperature, interpret, rel_fold,
                residuals, g):
    from .pallas_segment import pallas_segment_sum

    msgs, att8, adst_tiles, row_max, row_sum, out, layr, n_rel = residuals
    n_src_total, n_rows = aux
    if _low_residual(layr["src"].shape[0], msgs.shape[1], msgs.dtype):
        # low-residual form: msgs holds xs_all — recompute the gather
        # (barrier: see _fglgt_bwd — prevents CSE with the forward)
        msgs = jnp.take(jax.lax.optimization_barrier(msgs),
                        layr["src"], axis=0)
    if _recompute_out(n_rows, msgs.shape[1]):
        msgs = jax.lax.optimization_barrier(msgs)
        out, row_max, row_sum = _merged_forward(
            msgs, att8, adst_tiles, layr["dst"], layr["tile_starts"],
            layr["tile2rel"], n_rows, negative_slope, temperature,
            interpret,
        )
    dmsgs, dadst_tiles, datt_tiles = _merged_backward(
        msgs, att8, adst_tiles, layr["dst"], layr["tile_starts"],
        layr["tile2rel"], row_max, row_sum, out, g, n_rows, negative_slope,
        temperature, interpret,
        fold_tiles=_rel_fold_tiles(n_rows, rel_fold) if rel_fold else 0,
    )
    # scatter the edge cotangent to the src table: padded CSC take emits
    # the kernel stream directly (pad rows reread dmsgs[0]; sentinel ids
    # mask them — same trick as pallas_segment._grc_bwd)
    g_sorted = jnp.take(dmsgs, layr["csc_perm_pad"], axis=0)
    dx = pallas_segment_sum(
        g_sorted, layr["csc_ids_pad"], layr["csc_offsets"], n_src_total,
        interpret, pre_padded=True,
    )
    # traced tile2rel: iota-compare form (see _fglt_bwd)
    d_a_dst = dadst_tiles[::8].reshape(n_rows)
    n_tiles = n_rows // BN
    onehot = (
        jax.lax.broadcasted_iota(jnp.int32, (n_rel, n_tiles), 0)
        == layr["tile2rel"][None, :]
    ).astype(jnp.float32)
    d_att = onehot @ datt_tiles[::8]
    return dx, d_att, d_a_dst, None


fused_gat_layer_raw_gathered_t.defvjp(_fglrgt_fwd, _fglrgt_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9))
def fused_gat_layer_t(msgs, att, a_dst_all, dst, tile_starts, tile2rel,
                      n_rows, negative_slope, temperature, interpret=False):
    """fused_gat_layer with TRACED int layout arrays (dst, tile_starts,
    tile2rel) — required inside shard_map where layouts are per-device
    sharded operands. Semantics identical to fused_gat_layer."""
    out, _, _ = _merged_forward(
        msgs, _prep_att8(att), _prep_adst_tiles(a_dst_all, n_rows),
        dst, tile_starts, tile2rel, n_rows, negative_slope, temperature,
        interpret,
    )
    return out


def _fglt_fwd(msgs, att, a_dst_all, dst, tile_starts, tile2rel, n_rows,
              negative_slope, temperature, interpret):
    att8 = _prep_att8(att)
    adst_tiles = _prep_adst_tiles(a_dst_all, n_rows)
    out, row_max, row_sum = _merged_forward(
        msgs, att8, adst_tiles, dst, tile_starts, tile2rel, n_rows,
        negative_slope, temperature, interpret,
    )
    return out, (msgs, att8, adst_tiles, dst, tile_starts, tile2rel, row_max,
                 row_sum, out, att.shape[0])


def _fglt_bwd(n_rows, negative_slope, temperature, interpret, residuals, g):
    (msgs, att8, adst_tiles, dst, tile_starts, tile2rel, row_max, row_sum,
     out, n_rel) = residuals
    dmsgs, dadst_tiles, datt_tiles = _merged_backward(
        msgs, att8, adst_tiles, dst, tile_starts, tile2rel, row_max, row_sum,
        out, g, n_rows, negative_slope, temperature, interpret,
    )
    d_a_dst = dadst_tiles[::8].reshape(n_rows)
    n_tiles = n_rows // BN
    onehot = (
        jax.lax.broadcasted_iota(jnp.int32, (n_rel, n_tiles), 0)
        == tile2rel[None, :]
    ).astype(jnp.float32)
    d_att = onehot @ datt_tiles[::8]
    return dmsgs, d_att, d_a_dst, None, None, None


fused_gat_layer_t.defvjp(_fglt_fwd, _fglt_bwd)
