"""Segment primitives for relation-blocked message passing (pure XLA).

These are the TPU-native replacement for the torch_scatter/torch_sparse CUDA
kernels underneath PyG's MessagePassing (reference kgwas/conv.py:7-13,177-228)
and PyG's ``softmax`` utility (reference conv.py:223). Edges arrive
destination-sorted from the shard compiler, so every reduction is a sorted
segment op — XLA lowers these to efficient contiguous reductions, and the
Pallas kernels in pallas_segment.py swap in for the hot path.

Padding convention (shard_compile.py): pad edges sit at the tail with
dst = trash_row; validity is recovered from the static real-edge count via an
iota mask, so no mask array is stored in HBM.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

NEG_BIG = -1e9  # finite -inf stand-in: keeps pad lanes NaN-free in fwd and bwd


def edge_valid_mask(num_padded: int, num_real: int) -> jnp.ndarray:
    """Boolean [num_padded] mask of real edges; static, folded by XLA."""
    return jnp.arange(num_padded, dtype=jnp.int32) < num_real


def gather_rows(x: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """x[idx] along axis 0. Indices are in-range by construction."""
    return jnp.take(x, idx, axis=0, indices_are_sorted=False, unique_indices=False)


def segment_sum(
    data: jnp.ndarray, segment_ids: jnp.ndarray, num_segments: int
) -> jnp.ndarray:
    return jax.ops.segment_sum(
        data, segment_ids, num_segments=num_segments, indices_are_sorted=True
    )


def segment_max(
    data: jnp.ndarray, segment_ids: jnp.ndarray, num_segments: int
) -> jnp.ndarray:
    return jax.ops.segment_max(
        data, segment_ids, num_segments=num_segments, indices_are_sorted=True
    )


def segment_mean(
    data: jnp.ndarray,
    segment_ids: jnp.ndarray,
    num_segments: int,
    valid: jnp.ndarray,
) -> jnp.ndarray:
    """Mean over real edges per segment; empty segments -> 0 (matches
    torch_scatter reduce='mean' semantics used by SAGEConv)."""
    vf = valid.astype(data.dtype)
    data = data * vf.reshape((-1,) + (1,) * (data.ndim - 1))
    sums = segment_sum(data, segment_ids, num_segments)
    counts = segment_sum(vf, segment_ids, num_segments)
    return sums / jnp.maximum(counts, 1.0).reshape(
        (-1,) + (1,) * (sums.ndim - 1)
    )


def segment_softmax(
    logits: jnp.ndarray,
    segment_ids: jnp.ndarray,
    num_segments: int,
    valid: jnp.ndarray,
) -> jnp.ndarray:
    """Numerically-stable softmax over destination segments.

    Exactly mirrors PyG's ``softmax`` (max-shift, +1e-16 denominator) used at
    reference kgwas/conv.py:223, restricted to real edges; pad edges get 0.

    logits: [E, ...] with segment axis 0; valid: bool [E].
    """
    vshape = (-1,) + (1,) * (logits.ndim - 1)
    v = valid.reshape(vshape)
    masked = jnp.where(v, logits, NEG_BIG)
    seg_max = segment_max(masked, segment_ids, num_segments)
    seg_max = jnp.maximum(seg_max, NEG_BIG)  # empty segments: segment_max fill
    seg_max = jax.lax.stop_gradient(seg_max)
    # mask BEFORE exp so pad lanes contribute exact zeros in fwd AND bwd
    # (exp of an unmasked pad lane can overflow -> inf * 0 = NaN cotangents)
    shifted = jnp.where(v, logits - gather_rows(seg_max, segment_ids), 0.0)
    expd = jnp.where(v, jnp.exp(shifted), 0.0)
    denom = segment_sum(expd, segment_ids, num_segments) + 1e-16
    return expd / gather_rows(denom, segment_ids)


def leaky_relu(x: jnp.ndarray, negative_slope: float) -> jnp.ndarray:
    return jnp.where(x >= 0, x, negative_slope * x)


@partial(jax.jit, static_argnames=("num_segments",))
def coo_spmm(
    values: jnp.ndarray,
    src: jnp.ndarray,
    dst: jnp.ndarray,
    x: jnp.ndarray,
    num_segments: int,
) -> jnp.ndarray:
    """Sparse(COO, dst-sorted) @ dense: out[d] = sum_e values[e] * x[src[e]].

    values: [E] or [E, H]; x: [N_src, ...]. Standalone SpMM entry point used by
    benchmarks; the model path fuses this pattern inline so XLA can fuse the
    gather with the preceding attention math.
    """
    msgs = gather_rows(x, src)
    if values.ndim == 1:
        values = values.reshape((-1,) + (1,) * (msgs.ndim - 1))
    else:
        values = values.reshape(values.shape + (1,) * (msgs.ndim - values.ndim))
    return segment_sum(msgs * values, dst, num_segments)
