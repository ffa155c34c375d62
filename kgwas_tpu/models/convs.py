"""Per-relation graph convolutions (GAT / SAGE / GCN / SGC), pure functions.

TPU-native re-design of the reference's per-edge-type convs inside HeteroConv
(reference kgwas/model.py:34-48 and the forked GATConv in kgwas/conv.py):
dense transforms ride the MXU over *all* nodes of a type; per-edge work is
gather -> fused elementwise attention -> destination-sorted segment reduction.

All functions take node features for the relation's src/dst types, the
relation's padded dst-sorted edge arrays, and the static real edge count.
Outputs are [N_dst_pad, C_out]; the trash row absorbs pad-edge contributions.

GAT semantics mirrored exactly from reference kgwas/conv.py:122-228:
  * bipartite lin_src/lin_dst, att_src/att_dst dot-products
  * alpha = leaky_relu(a_src[src] + a_dst[dst], 0.2)
  * softmax(alpha / temperature) per dst segment  (PyG softmax w/ +1e-16)
  * sigmoid_gat option: alpha = sigmoid(alpha / temperature)  (conv.py:219-220)
  * raw-attention mode: softmax SKIPPED — raw alpha weights the messages
    (conv.py:222-223); used by interpretation (utils.py:452-458)
  * message = alpha * x_src'; scatter-add by dst; concat heads + bias
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops.segment import (
    edge_valid_mask,
    gather_rows,
    leaky_relu,
    segment_mean,
    segment_softmax,
    segment_sum,
)
from .init import glorot_att, glorot_weight, torch_linear_bias, torch_linear_weight, zeros


# ---------------------------------------------------------------------------
# GAT
# ---------------------------------------------------------------------------

def init_gat(
    key,
    in_src: int,
    in_dst: int,
    out: int,
    heads: int,
    dtype=jnp.float32,
    edge_dim: Optional[int] = None,
    pheno_condition=None,
    share_dst: bool = False,
):
    """GATConv parameters (reference kgwas/conv.py:70-120).

    share_dst: for HOMOGENEOUS relations (src_type == dst_type) PyG's
    HeteroConv passes a single Tensor, so the reference GATConv takes the
    `isinstance(x, Tensor)` branch (conv.py:136-138): x_src = x_dst =
    lin_src(x) — the lazy lin_dst is NEVER materialized and lin_src carries
    both projections (and both gradient paths). Set share_dst=True for those
    relations: no lin_dst is created and apply_gat falls back to lin_src.
    (Found by the verbatim-reference parity oracle,
    tests/test_reference_parity.py.)

    edge_dim: enables the edge-feature attention term (lin_edge + att_edge,
    reference conv.py:95-101).

    pheno_condition ('ATT' | 'MSG' | falsy): mirrors reference conv.py:70-77.
    These hooks only *create* parameters — the reference's edge_update/message
    never read pheno_emb, so the parameters are inert in the math; we create
    them anyway for checkpoint/state-dict parity. Reference quirk kept: with
    pheno_condition='ATT' *and* edge_dim set, the reference assigns att_edge
    twice and the edge_dim one wins (module attribute overwrite); either way
    exactly one att_edge exists and reset_parameters glorots it once.
    """
    ks = jax.random.split(key, 8)
    p = {
        "lin_src": {"w": glorot_weight(ks[0], in_src, heads * out, dtype)},
        "att_src": glorot_att(ks[2], heads, out, dtype),
        "att_dst": glorot_att(ks[3], heads, out, dtype),
        "bias": zeros((heads * out,), dtype),
    }
    if not share_dst:
        p["lin_dst"] = {"w": glorot_weight(ks[1], in_dst, heads * out, dtype)}
    if pheno_condition == "ATT":
        # reference conv.py:71-73: Linear(out_channels, H*out) + att_edge
        p["lin_edge_"] = {"w": glorot_weight(ks[4], out, heads * out, dtype)}
        p["att_edge"] = glorot_att(ks[5], heads, out, dtype)
    elif pheno_condition == "MSG":
        # reference conv.py:76-77: Linear(edge_dim, H*out)
        if edge_dim is None:
            raise ValueError("pheno_condition='MSG' requires edge_dim (reference conv.py:76)")
        p["pheno_mlp"] = {"w": glorot_weight(ks[6], edge_dim, heads * out, dtype)}
    if edge_dim is not None:
        p["lin_edge"] = {"w": glorot_weight(ks[7], edge_dim, heads * out, dtype)}
        p["att_edge"] = glorot_att(ks[5], heads, out, dtype)
    return p


def apply_gat(
    params,
    x_src: jnp.ndarray,
    x_dst: jnp.ndarray,
    src: jnp.ndarray,
    dst: jnp.ndarray,
    num_real_edges: int,
    num_dst_segments: int,
    heads: int,
    out_channels: int,
    negative_slope: float = 0.2,
    temperature: float = 1.0,
    sigmoid_gat: bool = False,
    raw_attention: bool = False,
    dropout_p: float = 0.0,
    dropout_rng=None,
    return_alpha: bool = False,
    use_pallas: bool = False,
    row_offsets=None,
    csc=None,
    num_src_segments: Optional[int] = None,
    edge_attr: Optional[jnp.ndarray] = None,
    stream_dtype=None,
    stream_f32_logits: bool = False,
) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
    H, C = heads, out_channels
    e_pad = src.shape[0]
    valid = edge_valid_mask(e_pad, num_real_edges)

    xs = x_src @ params["lin_src"]["w"]            # [Ns, H*C]
    xs_logit = xs
    if stream_dtype is not None:
        # message-stream rounding (ModelConfig.stream_dtype): the gathered
        # [E, D] stream and the logits derived from it run at this dtype
        # while activations/softmax state stay f32 — matches the merged
        # Pallas path, which computes logits in-kernel from the stream
        xs = xs.astype(jnp.dtype(stream_dtype))
        # stream_f32_logits probe (ModelConfig.stream_f32_logits): keep the
        # ATTENTION LOGITS at f32 and round only the aggregated message
        # stream — emulates a merged kernel carrying an f32 a_src
        # side-stream; used by scripts/exp_stream_gate.py to decide if that
        # kernel is worth building
        if not stream_f32_logits:
            xs_logit = xs
    # homogeneous relations share lin_src for the dst projection (reference
    # conv.py:136-138 Tensor branch; see init_gat share_dst)
    wd = params["lin_dst"]["w"] if "lin_dst" in params else params["lin_src"]["w"]
    xd = x_dst @ wd                                # [Nd, H*C]

    a_src = jnp.sum(
        xs_logit.reshape(-1, H, C) * params["att_src"], axis=-1
    )                                              # [Ns, H]
    a_dst = jnp.sum(xd.reshape(-1, H, C) * params["att_dst"], axis=-1)  # [Nd, H]

    alpha = gather_rows(a_src, src) + gather_rows(a_dst, dst)           # [E, H]
    if edge_attr is not None and "lin_edge" in params:
        # edge-feature attention term (reference conv.py:207-215): added to
        # alpha BEFORE the leaky_relu
        ea = edge_attr.reshape(e_pad, -1)          # dim-1 attrs -> [E, 1]
        ea = (ea @ params["lin_edge"]["w"]).reshape(e_pad, H, C)
        alpha = alpha + jnp.sum(ea * params["att_edge"], axis=-1)
    alpha = leaky_relu(alpha, negative_slope)

    # fused Pallas path: one-pass softmax+aggregate (softmax mode, 1 head,
    # no dropout, alpha not exported)
    if (
        use_pallas
        and H == 1
        and not sigmoid_gat
        and not raw_attention
        and not (dropout_p > 0.0 and dropout_rng is not None)
        and not return_alpha
        and row_offsets is not None
        and num_dst_segments % 256 == 0
        and (H * C) % 128 == 0  # Mosaic lane alignment
    ):
        from ..ops.pallas_segment import (
            fused_segment_softmax_spmm,
            gather_rows_csc,
        )

        interpret = jax.default_backend() != "tpu"  # CPU tests: interpret mode
        if (
            csc is not None
            and csc[0] is not None
            and num_src_segments is not None
            and num_src_segments % 256 == 0
        ):
            # gather whose transpose is a Pallas CSC scatter-add (XLA's
            # scatter lowers to a serial per-element loop on TPU)
            msgs = gather_rows_csc(
                xs, src, csc[0], csc[1], csc[2], num_src_segments, interpret
            )
        else:
            msgs = gather_rows(xs, src)                                 # [E, D]
        out = fused_segment_softmax_spmm(
            msgs, alpha[:, 0] / temperature, dst, row_offsets,
            num_dst_segments, interpret,
        )
        return out + params["bias"], None

    # fused Pallas path for the UNNORMALIZED modes (sigmoid gating / raw
    # attention, reference conv.py:219-223): per-edge weight is elementwise,
    # so the whole reduction is one tiled segment-sum kernel — replaces
    # XLA's serial TPU scatter (see benchmarks/RESULTS.md)
    if (
        use_pallas
        and H == 1
        and (sigmoid_gat or raw_attention)
        and not (dropout_p > 0.0 and dropout_rng is not None)
        and not return_alpha
        and row_offsets is not None
        and num_dst_segments % 256 == 0
        and (H * C) % 128 == 0
    ):
        from ..ops.pallas_segment import gather_rows_csc, segment_sum_edges

        interpret = jax.default_backend() != "tpu"
        a = (
            jax.nn.sigmoid(alpha[:, 0] / temperature)
            if sigmoid_gat
            else alpha[:, 0]
        )
        a = jnp.where(valid, a, 0.0)
        if (
            csc is not None
            and csc[0] is not None
            and num_src_segments is not None
            and num_src_segments % 256 == 0
        ):
            msgs = gather_rows_csc(
                xs, src, csc[0], csc[1], csc[2], num_src_segments, interpret
            )
        else:
            msgs = gather_rows(xs, src)
        out = segment_sum_edges(
            msgs * a[:, None], dst, jnp.asarray(row_offsets),
            num_dst_segments, interpret,
        )
        return out + params["bias"], None

    if sigmoid_gat:
        alpha = jax.nn.sigmoid(alpha / temperature)
    elif raw_attention:
        pass  # raw (pre-softmax) alpha weights the messages — conv.py:222-223
    else:
        alpha = segment_softmax(alpha / temperature, dst, num_dst_segments, valid)

    if dropout_p > 0.0 and dropout_rng is not None:
        keep = jax.random.bernoulli(dropout_rng, 1.0 - dropout_p, alpha.shape)
        alpha = jnp.where(keep, alpha / (1.0 - dropout_p), 0.0)

    alpha_m = jnp.where(valid[:, None], alpha, 0.0)
    msgs = gather_rows(xs, src).reshape(e_pad, H, C) * alpha_m[:, :, None]
    out = segment_sum(msgs.reshape(e_pad, H * C), dst, num_dst_segments)
    out = out + params["bias"]
    return (out, alpha) if return_alpha else (out, None)


# ---------------------------------------------------------------------------
# SAGE (PyG SAGEConv((-1,-1), C): mean-aggr raw x_j, lin_l on aggregate + bias,
# root transform lin_r without bias)
# ---------------------------------------------------------------------------

def init_sage(key, in_src: int, in_dst: int, out: int, dtype=jnp.float32):
    ks = jax.random.split(key, 3)
    return {
        "lin_l": {
            "w": torch_linear_weight(ks[0], in_src, out, dtype),
            "b": torch_linear_bias(ks[1], in_src, out, dtype),
        },
        "lin_r": {"w": torch_linear_weight(ks[2], in_dst, out, dtype)},
    }


def _maybe_csc_gather(x, src, csc, num_src_segments, use_pallas):
    """gather_rows with the CSC-routed custom-VJP backward when the layout
    permits (its transpose rides the Pallas segment-sum instead of XLA's
    scatter-add — same trick apply_gat uses). Falls back to jnp.take."""
    if (use_pallas and csc is not None and csc[0] is not None
            and num_src_segments is not None
            and num_src_segments % 256 == 0
            and x.shape[1] % 128 == 0):
        from ..ops.pallas_segment import gather_rows_csc

        interpret = jax.default_backend() != "tpu"
        return gather_rows_csc(x, src, csc[0], csc[1], csc[2],
                               num_src_segments, interpret)
    return gather_rows(x, src)


def apply_sage(
    params,
    x_src: jnp.ndarray,
    x_dst: jnp.ndarray,
    src: jnp.ndarray,
    dst: jnp.ndarray,
    num_real_edges: int,
    num_dst_segments: int,
    csc=None,
    num_src_segments=None,
    use_pallas: bool = False,
) -> jnp.ndarray:
    valid = edge_valid_mask(src.shape[0], num_real_edges)
    agg = segment_mean(
        _maybe_csc_gather(x_src, src, csc, num_src_segments, use_pallas),
        dst, num_dst_segments, valid)
    out = agg @ params["lin_l"]["w"] + params["lin_l"]["b"]
    return out + x_dst @ params["lin_r"]["w"]


# ---------------------------------------------------------------------------
# GCN / SGC (add_self_loops=False per reference model.py:44-46). For bipartite
# relations the symmetric norm generalizes to
# 1/sqrt(out_deg(src)) * 1/sqrt(in_deg(dst)); on homogeneous undirected
# relations (the reference's case after ToUndirected) this equals PyG gcn_norm.
# ---------------------------------------------------------------------------

def init_gcn(key, in_src: int, out: int, dtype=jnp.float32):
    ks = jax.random.split(key, 2)
    return {
        "lin": {"w": glorot_weight(ks[0], in_src, out, dtype)},
        "bias": zeros((out,), dtype),
    }


def _sym_norm(src, dst, valid, num_src_segments, num_dst_segments, dtype):
    ones = valid.astype(dtype)
    deg_dst = jax.ops.segment_sum(ones, dst, num_segments=num_dst_segments,
                                  indices_are_sorted=True)
    deg_src = jax.ops.segment_sum(ones, src, num_segments=num_src_segments,
                                  indices_are_sorted=False)
    dinv_dst = jnp.where(deg_dst > 0, jax.lax.rsqrt(jnp.maximum(deg_dst, 1.0)), 0.0)
    dinv_src = jnp.where(deg_src > 0, jax.lax.rsqrt(jnp.maximum(deg_src, 1.0)), 0.0)
    return gather_rows(dinv_src, src) * gather_rows(dinv_dst, dst) * ones


def apply_gcn(
    params,
    x_src: jnp.ndarray,
    src: jnp.ndarray,
    dst: jnp.ndarray,
    num_real_edges: int,
    num_src_segments: int,
    num_dst_segments: int,
    csc=None,
    use_pallas: bool = False,
) -> jnp.ndarray:
    valid = edge_valid_mask(src.shape[0], num_real_edges)
    xp = x_src @ params["lin"]["w"]
    norm = _sym_norm(src, dst, valid, num_src_segments, num_dst_segments, xp.dtype)
    msgs = _maybe_csc_gather(xp, src, csc, num_src_segments,
                             use_pallas) * norm[:, None]
    return segment_sum(msgs, dst, num_dst_segments) + params["bias"]


def init_sgc(key, in_src: int, out: int, dtype=jnp.float32):
    ks = jax.random.split(key, 2)
    return {
        "lin": {
            "w": torch_linear_weight(ks[0], in_src, out, dtype),
            "b": torch_linear_bias(ks[1], in_src, out, dtype),
        }
    }


def apply_sgc(
    params,
    x_src: jnp.ndarray,
    src: jnp.ndarray,
    dst: jnp.ndarray,
    num_real_edges: int,
    num_src_segments: int,
    num_dst_segments: int,
    csc=None,
    use_pallas: bool = False,
) -> jnp.ndarray:
    """SGConv K=1 (reference model.py:46 default): lin((norm A) x)."""
    valid = edge_valid_mask(src.shape[0], num_real_edges)
    norm = _sym_norm(src, dst, valid, num_src_segments, num_dst_segments, x_src.dtype)
    msgs = _maybe_csc_gather(x_src, src, csc, num_src_segments,
                             use_pallas) * norm[:, None]
    agg = segment_sum(msgs, dst, num_dst_segments)
    return agg @ params["lin"]["w"] + params["lin"]["b"]
