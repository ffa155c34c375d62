"""HeteroGNN: the flagship model (TPU re-design of reference kgwas/model.py:24-86).

Architecture (identical math, full-graph execution):
  1. per-type SimpleMLP encoders -> hidden (GO MLP shared by the 3 GO types,
     reference model.py:31,58-60)
  2. num_layers x hetero conv: one per-relation conv per edge type, aggregated
     across relations per destination type (aggr from config, reference
     model.py:47), then ReLU on every node type (model.py:75)
  3. scalar head: ReLU(Linear(h_SNP)) (or no ReLU, model.py:83-86)

Where the reference runs this over NeighborLoader subgraphs, we run it over
the compiled full graph: since the reference samples with
num_neighbors=[-1]*L (kgwas/kgwas.py:99-113), seed-node outputs of the two
formulations are mathematically identical; callers gather the seed rows.
"""
from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from ..config import ModelConfig
from .convs import (
    apply_gat,
    apply_gcn,
    apply_sage,
    apply_sgc,
    init_gat,
    init_gcn,
    init_sage,
    init_sgc,
)
from .init import torch_linear_bias, torch_linear_weight
from .mlp import apply_mlp, init_mlp

GO_TYPES = ("CellularComponent", "BiologicalProcess", "MolecularFunction")


def encoder_for(ntype: str) -> str:
    if ntype == "SNP":
        return "snp_feat_mlp"
    if ntype == "Gene":
        return "gene_feat_mlp"
    if ntype in GO_TYPES:
        return "go_feat_mlp"
    raise ValueError(f"unknown node type {ntype!r}")


def init_hetero_gnn(
    key,
    cfg: ModelConfig,
    meta: dict,
    snp_init_dim: int,
    gene_init_dim: int,
    go_init_dim: int,
):
    """meta: CompiledGraph.meta(). Returns the parameter pytree."""
    h = cfg.gnn_hidden_dim
    dtype = jnp.dtype(cfg.param_dtype)
    keys = jax.random.split(key, 4 + cfg.gnn_num_layers)

    params = {
        "snp_feat_mlp": init_mlp(keys[0], snp_init_dim, h, h, dtype),
        "go_feat_mlp": init_mlp(keys[1], go_init_dim, h, h, dtype),
        "gene_feat_mlp": init_mlp(keys[2], gene_init_dim, h, h, dtype),
        "convs": [],
        "lin": {},
    }

    rel_types = meta["rel_types"]
    # multi-head GAT concats heads (PyG GATConv concat=True): layer outputs
    # are H*h wide, so deeper layers and the head take H*h inputs. (The
    # reference declares the final Linear with fixed hidden_channels inputs,
    # reference model.py:50, so gat_num_head>1 dimension-errors there; this
    # framework sizes the stack correctly instead.)
    H = cfg.gat_num_head if cfg.gnn_backbone == "GAT" else 1
    for li in range(cfg.gnn_num_layers):
        layer = {}
        lin = h if li == 0 else H * h
        rel_keys = list(rel_types.keys())
        rkeys = jax.random.split(keys[3 + li], max(len(rel_keys), 1))
        for rk, rkey in zip(rel_keys, rkeys):
            if cfg.gnn_backbone == "GAT":
                src_t, _, dst_t = rel_types[rk]
                layer[rk] = init_gat(
                    rkey, lin, lin, h, cfg.gat_num_head, dtype,
                    edge_dim=cfg.edge_dim,
                    pheno_condition=cfg.pheno_condition,
                    share_dst=src_t == dst_t,
                )
            elif cfg.gnn_backbone == "SAGE":
                layer[rk] = init_sage(rkey, h, h, h, dtype)
            elif cfg.gnn_backbone == "GCN":
                layer[rk] = init_gcn(rkey, h, h, dtype)
            elif cfg.gnn_backbone == "SGC":
                layer[rk] = init_sgc(rkey, h, h, dtype)
            else:
                raise ValueError(f"unknown backbone {cfg.gnn_backbone!r}")
        params["convs"].append(layer)

    hk = jax.random.split(keys[3 + cfg.gnn_num_layers - 1 + 1], 2)
    head_in = H * h if cfg.gnn_num_layers > 0 else h
    params["lin"] = {
        "w": torch_linear_weight(hk[0], head_in, cfg.out_channels, dtype),
        "b": torch_linear_bias(hk[1], head_in, cfg.out_channels, dtype),
    }
    return params


def _apply_relation_conv(
    rp,
    cfg: ModelConfig,
    h: Dict[str, jnp.ndarray],
    src_t: str,
    dst_t: str,
    edges,
    num_real: int,
    padded_nodes: Dict[str, int],
    raw_attention: bool,
    return_alpha: bool,
    dropout_rng=None,
    training: bool = False,
    row_offsets=None,
    csc=None,
):
    src, dst = edges["src"], edges["dst"]
    nd = padded_nodes[dst_t]
    ns = padded_nodes[src_t]
    if cfg.gnn_backbone == "GAT":
        return apply_gat(
            rp,
            h[src_t],
            h[dst_t],
            src,
            dst,
            num_real,
            nd,
            heads=cfg.gat_num_head,
            out_channels=cfg.gnn_hidden_dim,
            negative_slope=cfg.negative_slope,
            temperature=cfg.temperature,
            sigmoid_gat=cfg.sigmoid_gat,
            raw_attention=raw_attention,
            dropout_p=cfg.dropout if training else 0.0,
            dropout_rng=dropout_rng,
            return_alpha=return_alpha,
            use_pallas=cfg.use_pallas,
            row_offsets=row_offsets,
            csc=csc,
            num_src_segments=ns,
            edge_attr=edges.get("edge_attr"),
            stream_dtype=getattr(cfg, "stream_dtype", None),
            stream_f32_logits=getattr(cfg, "stream_f32_logits", False),
        )
    if cfg.gnn_backbone == "SAGE":
        return apply_sage(rp, h[src_t], h[dst_t], src, dst, num_real, nd,
                          csc=csc, num_src_segments=ns,
                          use_pallas=cfg.use_pallas), None
    if cfg.gnn_backbone == "GCN":
        return apply_gcn(rp, h[src_t], src, dst, num_real, ns, nd,
                         csc=csc, use_pallas=cfg.use_pallas), None
    if cfg.gnn_backbone == "SGC":
        return apply_sgc(rp, h[src_t], src, dst, num_real, ns, nd,
                         csc=csc, use_pallas=cfg.use_pallas), None
    raise ValueError(cfg.gnn_backbone)


def _aggregate(outs, aggr: str):
    if len(outs) == 1:
        return outs[0]
    stacked = jnp.stack(outs, axis=0)
    if aggr == "sum":
        return jnp.sum(stacked, axis=0)
    if aggr == "mean":
        return jnp.mean(stacked, axis=0)
    if aggr == "max":
        return jnp.max(stacked, axis=0)
    if aggr == "min":
        return jnp.min(stacked, axis=0)
    raise ValueError(f"unknown hetero aggr {aggr!r}")


def apply_encoders(
    params,
    x: Dict[str, jnp.ndarray],
    h1_override: Optional[Dict[str, jnp.ndarray]] = None,
) -> Dict[str, jnp.ndarray]:
    """h1_override: per-type precomputed first-layer pre-activations (the
    streamed giant-feature path, ops/streaming.py) — those types skip fc1."""
    from .mlp import apply_mlp_tail

    out = {}
    for t, xt in x.items():
        enc = params[encoder_for(t)]
        if h1_override and t in h1_override:
            out[t] = apply_mlp_tail(enc, h1_override[t])
        else:
            out[t] = apply_mlp(enc, xt)
    return out


_MERGED_FALLBACK_WARNED: set = set()


def _merged_path_active(cfg: ModelConfig, meta: dict, raw_attention,
                        collect_alpha, training) -> bool:
    if not (cfg.use_pallas and cfg.pallas_mode == "merged"):
        return False
    reasons = []
    if cfg.gnn_backbone != "GAT":
        reasons.append(f"backbone={cfg.gnn_backbone} (need GAT)")
    if cfg.gnn_aggr not in ("sum", "mean"):
        reasons.append(
            f"aggr={cfg.gnn_aggr} (need sum/mean; max/min are not "
            "separable from the per-relation bias)"
        )
    # sigmoid_gat / raw_attention are fused via the unnormalized-mode
    # kernels (fused_gat_layer_unnorm) — no disqualification; alpha
    # EXPORT still needs the per-relation path
    if collect_alpha:
        reasons.append("collect_alpha")
    if training and cfg.dropout > 0.0:
        reasons.append(f"dropout={cfg.dropout}")
    if cfg.edge_dim is not None:
        reasons.append("edge_dim set")
    if cfg.gnn_hidden_dim % 128 != 0:
        reasons.append(f"hidden={cfg.gnn_hidden_dim} (need %128==0)")
    if meta.get("merged") is None:
        reasons.append("graph compiled without merged layouts")
    if not reasons:
        return True
    # the slow path is ~3x the fused one — tell the user why, once per cause
    key = tuple(reasons)
    if key not in _MERGED_FALLBACK_WARNED:
        _MERGED_FALLBACK_WARNED.add(key)
        import logging

        logging.getLogger(__name__).warning(
            "kgwas_tpu: merged Pallas fast path disabled (~3x slower XLA "
            "fallback in use): %s", "; ".join(reasons),
        )
    return False


def build_layout_operands(cfg: ModelConfig, meta: dict) -> dict:
    """Host-side numpy layout bundles for cfg.layout_operands: one entry
    per dst group that will take the GATHERED fast path under this cfg
    (same decision logic as apply_merged_gat_layer). Merge the result into
    the graph `arrays` pytree as arrays["merged_ops"] so the bundles enter
    jitted steps as ARGUMENTS (HLO parameters) instead of closed-over
    numpy (stablehlo literals — 556 MiB of program text at 2M SNPs, which
    broke the relay compile endpoint; benchmarks/RESULTS.md round 4)."""
    from ..graph.merged_layout import (CHUNK_READ_AMP_MAX,
                                       EMITTER_FAST_ROWS, get_chunked_stream,
                                       get_owned_plain_stream)
    from ..ops.pallas_gat_layer import (layout_operand_arrays,
                                        plain_layout_operand_arrays,
                                        raw_layout_operand_arrays)

    out = {}
    merged = meta.get("merged") or {}
    chunk_rows = (cfg.gather_chunk_rows if cfg.gather_chunk_rows is not None
                  else EMITTER_FAST_ROWS)
    pad_frags = (cfg.pad_fragments if cfg.pad_fragments is not None
                 else True)
    for dst_t, L in merged.items():
        # path decision MIRRORS apply_merged_gat_layer exactly (incl. the
        # CHUNK_READ_AMP_MAX guard) so the bundle inventory always matches
        # the apply-time choice; bundles are tagged by kind
        use_chunked = (chunk_rows > 0
                       and L.n_src_total > min(EMITTER_FAST_ROWS,
                                               2 * chunk_rows))
        cs = (get_chunked_stream(L, chunk_rows, pad_fragments=pad_frags)
              if use_chunked else None)
        if cs is not None and cs.read_amp > CHUNK_READ_AMP_MAX:
            cs = None
        if cs is not None and cs.fully_owned:
            from ..ops.pallas_gat_layer import _needs_split_segsum

            aux = (L.csc_ids, L.csc_offsets, L.n_src_total, L.n_rows_total,
                   L.tile2rel)
            # include the SplitCscGroup arrays when the backward's
            # concatenated cotangent would cross the per-buffer ceiling
            # (stream dtype if set, else f32 compute dtype)
            itemsize = (jnp.dtype(cfg.stream_dtype)
                        if getattr(cfg, "stream_dtype", None)
                        else jnp.dtype(cfg.compute_dtype))
            split = _needs_split_segsum(cs.num_real_edges,
                                        cfg.gnn_hidden_dim, itemsize)
            out[dst_t] = {"chunked": layout_operand_arrays(
                cs, aux, split_group=split)}
            continue
        if cs is not None:
            # chunked-but-not-fully-owned (pad_fragments=False): apply
            # takes the literal gather_rows_chunked path — emit nothing
            # (a raw bundle here would be dead device-resident weight)
            continue
        # fragment-windowed backward (cfg.bwd_window_edges): mirror
        # apply's wl decision — when wl engages, neither plain nor raw
        # traced paths are used
        win_edges = cfg.bwd_window_edges or 0
        if (win_edges > 0 and chunk_rows > 0
                and len(L.src) > min(EMITTER_FAST_ROWS, 2 * win_edges)):
            from ..graph.merged_layout import get_csc_windows

            wl = get_csc_windows(L, win_edges)
            if wl.read_amp <= 1.5:
                continue
        if (pad_frags and chunk_rows > 0
                and len(L.src) > EMITTER_FAST_ROWS):
            pl_lay = get_owned_plain_stream(L)
            if not (pl_lay.read_amp > 1.5 or pl_lay.sum_read_amp > 1.5):
                aux = (L.n_src_total, L.n_rows_total, L.tile2rel)
                out[dst_t] = {
                    "plain": plain_layout_operand_arrays(pl_lay, aux)}
                continue
        # raw fallback: any remaining big group gets the traced raw
        # bundle (softmax-only — the unnorm modes keep the literal path)
        if len(L.src) > EMITTER_FAST_ROWS and not cfg.sigmoid_gat:
            out[dst_t] = {"raw": raw_layout_operand_arrays(L)}
    return out


def apply_merged_gat_layer(
    layer_params,
    cfg: ModelConfig,
    meta: dict,
    h: Dict[str, jnp.ndarray],
    merged_kernel_fns: Optional[dict] = None,
    raw_attention: bool = False,
    layout_ops: Optional[dict] = None,
) -> Dict[str, jnp.ndarray]:
    """One hetero GAT layer over merged per-dst-type edge streams: one
    fused_gat_layer kernel + one CSC gather per destination type
    (ops/pallas_gat_layer.py, graph/merged_layout.py).

    merged_kernel_fns: optional dst_type -> f(xs_all, att, a_dst) -> out_all
    override — the multi-chip shard_map'd kernels
    (parallel/merged_shard.py) plug in here; default is the single-device
    gather + fused layer kernel."""
    import numpy as _np
    import jax as _jax

    from ..graph.merged_layout import (CHUNK_READ_AMP_MAX,
                                       EMITTER_FAST_ROWS, get_chunked_stream,
                                       get_csc_windows,
                                       get_owned_plain_stream)
    from ..ops.pallas_gat_layer import (fused_gat_layer,
                                        fused_gat_layer_chunked,
                                        fused_gat_layer_gathered,
                                        fused_gat_layer_gathered_t,
                                        fused_gat_layer_plain_gathered,
                                        fused_gat_layer_plain_gathered_t,
                                        fused_gat_layer_raw_gathered_t,
                                        fused_gat_layer_unnorm)
    from ..ops.pallas_segment import (gather_rows_csc, gather_rows_chunked,
                                      gather_rows_csc_win)

    interpret = _jax.default_backend() != "tpu"
    d = cfg.gnn_hidden_dim
    H = cfg.gat_num_head
    # unnormalized GAT modes (sigmoid_gat / raw_attention, reference
    # conv.py:217-223) ride the same chunked/owned gather acceleration as
    # softmax — every fused layer op takes a mode parameter
    mode = ("sigmoid" if cfg.sigmoid_gat
            else "raw" if raw_attention else "softmax")
    assert mode == "softmax" or merged_kernel_fns is None, (
        "shard_map merged kernels are softmax-only")
    chunk_rows = (cfg.gather_chunk_rows if cfg.gather_chunk_rows is not None
                  else EMITTER_FAST_ROWS)
    out_dict = {}
    for dst_t, L in meta["merged"].items():
        # src-chunked gather (graph/merged_layout.ChunkedStreamLayout) only
        # when the concat src table is in XLA's slow big-table gather regime
        # (> EMITTER_FAST_ROWS; chunking an already-fast table just pays
        # window read amplification in the fused kernel — measured neutral
        # to negative, scripts/exp_chunk_ab.py). Single-device only (the
        # shard_map kernels keep the plain stream).
        use_chunked = (merged_kernel_fns is None and chunk_rows > 0
                       and L.n_src_total > min(EMITTER_FAST_ROWS,
                                               2 * chunk_rows))
        pad_frags = (cfg.pad_fragments if cfg.pad_fragments is not None
                     else True)
        cs = (get_chunked_stream(L, chunk_rows, pad_fragments=pad_frags)
              if use_chunked else None)
        # fragment-padding amplification guard: groups with many dst tiles
        # x many chunks but few edges per (chunk, tile) fragment explode
        # under BE-padding (measured 32x on the 2M SNP dst group — a 107 GB
        # phantom stream). Such groups take the plain/owned paths instead.
        if cs is not None and cs.read_amp > CHUNK_READ_AMP_MAX:
            cs = None
        # fragment-windowed backward permute for plain-stream groups whose
        # E-row cotangent table is on the slow emitter while the forward
        # table is already fast (SNP-shaped: small src space, huge E).
        # OPT-IN (cfg.bwd_window_edges): XLA fuses the cotangent chunk
        # slices into the gathers, so the per-chunk takes never reach the
        # fast small-table emitter — measured neutral in isolation and -4%
        # composed on v5e (scripts/exp_win_bwd.py, benchmarks/RESULTS.md)
        win_edges = cfg.bwd_window_edges or 0
        wl = None
        if (cs is None and merged_kernel_fns is None and win_edges > 0
                and chunk_rows > 0
                and len(L.src) > min(EMITTER_FAST_ROWS, 2 * win_edges)):
            wl = get_csc_windows(L, win_edges)
            if wl.read_amp > 1.5:
                wl = None
        # owned plain stream (v3 split backward) for SNP-shaped groups:
        # forward table fast, E-row cotangent table slow. Padding cost
        # guard mirrors the wl one.
        pl_lay = None
        if (cs is None and wl is None and merged_kernel_fns is None
                and pad_frags and chunk_rows > 0
                and len(L.src) > EMITTER_FAST_ROWS):
            pl_lay = get_owned_plain_stream(L)
            if pl_lay.read_amp > 1.5 or pl_lay.sum_read_amp > 1.5:
                pl_lay = None
        # rel-fold: the single-device fused ops fold the cross-relation
        # sum into their custom VJP (ops/pallas_gat_layer._rel_fold_out) so
        # the backward never materializes the [R*N, D] cotangent broadcast.
        # The shard_map kernels (merged_kernel_fns) keep the unfolded [R*N,
        # D] output — their VJP plumbing is the mesh path's.
        n_rel = len(L.rel_keys)
        fold = n_rel if (cfg.rel_fold and merged_kernel_fns is None) else 0
        # multi-head runs one fused-layer kernel per head over the same
        # merged layout (heads are independent softmaxes; PyG concats them,
        # reference conv.py:122-131). Per-head slices of lin_src keep each
        # kernel at D == gnn_hidden_dim.
        head_outs = []
        bias_sum = None
        out_dtype = None
        for hh in range(H):
            att_rows, v_cols = [], []
            for slot, rk in enumerate(L.rel_keys):
                rp = layer_params[rk]
                att_rows.append(rp["att_src"][hh])
                # a_dst = (h @ W_dst) . att_dst == h @ (W_dst @ att_dst):
                # collapses the full dst projection into a matvec
                wd = rp["lin_dst"]["w"] if "lin_dst" in rp else rp["lin_src"]["w"]
                v_cols.append(wd[:, hh * d:(hh + 1) * d] @ rp["att_dst"][hh])
                if hh == 0:
                    b = rp["bias"]
                    bias_sum = b if bias_sum is None else bias_sum + b
            att = jnp.stack(att_rows, axis=0)
            # ONE [N, D] x [D, R] matmul instead of R matvecs — each matvec
            # re-reads the full h[dst_t] table from HBM
            # sub-layouts (split_merged_layout) read only their dst node
            # range of the hidden table; whole groups slice [0:N] (no-op)
            h_dst = h[L.base_type or dst_t][
                L.node_base:L.node_base + L.n_rows_per_rel]
            adst_mat = h_dst @ jnp.stack(v_cols, axis=1)        # [N, R]
            a_dst_all = adst_mat.T.reshape(-1)

            def _w_src(slot):
                rp = layer_params[L.rel_keys[slot]]
                return rp["lin_src"]["w"][:, hh * d:(hh + 1) * d]

            # message stream dtype: compute dtype, or cfg.stream_dtype
            # (bf16 streams halve the dominant [E, D] kernel DMA and run
            # the one-hot aggregation dot at native bf16 MXU rate while
            # params/activations/softmax state/optimizer stay f32);
            # per-row attention scalars and softmax state always float32
            sdt = (jnp.dtype(cfg.stream_dtype)
                   if getattr(cfg, "stream_dtype", None) else None)
            if cs is not None:
                # per-chunk tables: each chunk is a slice of exactly one
                # relation's src block, so its table is one small matmul
                tabs = []
                for c in range(cs.n_chunks):
                    b0 = int(cs.src_bounds[c])
                    b1 = int(cs.src_bounds[c + 1])
                    slot = int(_np.searchsorted(
                        _np.asarray(L.src_base), b0, side="right")) - 1
                    base = int(L.src_base[slot])
                    tabs.append(
                        h[L.src_types[slot]][b0 - base:b1 - base]
                        @ _w_src(slot)
                    )
                out_dtype = tabs[0].dtype
                if sdt is not None:
                    tabs = [t.astype(sdt) for t in tabs]
                if cs.fully_owned:
                    # one fused custom-VJP op: gather + layer; backward
                    # emits SEPARATE per-chunk cotangent buffers so the CSC
                    # takes ride the fast gather emitter
                    aux = (L.csc_ids, L.csc_offsets, L.n_src_total,
                           L.n_rows_total, L.tile2rel)
                    lay_t = (layout_ops.get(dst_t, {}).get("chunked")
                             if layout_ops else None)
                    if lay_t is not None:
                        # traced-layout variant: layout arrays ride the
                        # arrays pytree as HLO parameters (see
                        # build_layout_operands)
                        out_all = fused_gat_layer_gathered_t(
                            tuple(tabs), att.astype(jnp.float32),
                            a_dst_all.astype(jnp.float32), lay_t, cs, aux,
                            cfg.negative_slope, cfg.temperature, interpret,
                            mode, fold,
                        )
                    else:
                        out_all = fused_gat_layer_gathered(
                            tuple(tabs), att.astype(jnp.float32),
                            a_dst_all.astype(jnp.float32), cs, aux,
                            cfg.negative_slope, cfg.temperature, interpret,
                            mode, fold,
                        )
                else:
                    msgs = gather_rows_chunked(
                        tuple(tabs), tuple(cs.local_ids),
                        tuple(cs.local_perm),
                        tuple(int(b) for b in cs.chunk_edge_base),
                        L.csc_ids, L.csc_offsets, L.n_src_total, interpret,
                    )
                    out_all = fused_gat_layer_chunked(
                        msgs, att.astype(jnp.float32),
                        a_dst_all.astype(jnp.float32),
                        cs.dst, cs.desc, cs.desc_offsets, L.tile2rel,
                        L.n_rows_total, cfg.negative_slope, cfg.temperature,
                        interpret, cs.fully_owned, mode, fold,
                    )
            else:
                xs_all = jnp.concatenate(
                    [h[L.src_types[s]] @ _w_src(s)
                     for s in range(len(L.rel_keys))], axis=0)
                out_dtype = xs_all.dtype
                if sdt is not None:
                    xs_all = xs_all.astype(sdt)
                if merged_kernel_fns is not None:
                    out_all = merged_kernel_fns[dst_t](
                        xs_all, att.astype(jnp.float32),
                        a_dst_all.astype(jnp.float32),
                    )
                elif pl_lay is not None:
                    layp = (layout_ops.get(dst_t, {}).get("plain")
                            if layout_ops else None)
                    if layp is not None:
                        # traced-layout variant: plain layout arrays ride
                        # the arrays pytree as HLO parameters (see
                        # build_layout_operands)
                        out_all = fused_gat_layer_plain_gathered_t(
                            xs_all, att.astype(jnp.float32),
                            a_dst_all.astype(jnp.float32), layp, pl_lay,
                            (L.n_src_total, L.n_rows_total, L.tile2rel),
                            cfg.negative_slope, cfg.temperature, interpret,
                            mode, fold,
                        )
                    else:
                        out_all = fused_gat_layer_plain_gathered(
                            xs_all, att.astype(jnp.float32),
                            a_dst_all.astype(jnp.float32), pl_lay,
                            (L.n_src_total, L.n_rows_total, L.tile2rel),
                            cfg.negative_slope, cfg.temperature, interpret,
                            mode, fold,
                        )
                elif (layout_ops and mode == "softmax" and wl is None
                        and layout_ops.get(dst_t, {}).get("raw") is not None):
                    # traced-layout raw path: gather + layer in one op with
                    # the layout bundle as HLO parameters (see
                    # build_layout_operands)
                    out_all = fused_gat_layer_raw_gathered_t(
                        xs_all, att.astype(jnp.float32),
                        a_dst_all.astype(jnp.float32),
                        layout_ops[dst_t]["raw"], L,
                        (L.n_src_total, L.n_rows_total),
                        cfg.negative_slope, cfg.temperature, interpret,
                        fold,
                    )
                else:
                    if wl is not None:
                        msgs = gather_rows_csc_win(
                            xs_all, jnp.asarray(L.src),
                            tuple(int(b) for b in wl.edge_bounds),
                            tuple(wl.local_perm), wl.ids, wl.desc,
                            wl.desc_offsets, L.n_src_total, interpret,
                        )
                    else:
                        msgs = gather_rows_csc(
                            xs_all, jnp.asarray(L.src), L.csc_perm,
                            L.csc_ids, L.csc_offsets, L.n_src_total,
                            interpret,
                        )
                    if mode == "softmax":
                        out_all = fused_gat_layer(
                            msgs, att.astype(jnp.float32),
                            a_dst_all.astype(jnp.float32),
                            L.dst, L.row_offsets, L.tile2rel,
                            L.n_rows_total, cfg.negative_slope,
                            cfg.temperature, interpret, fold,
                        )
                    else:
                        out_all = fused_gat_layer_unnorm(
                            msgs, att.astype(jnp.float32),
                            a_dst_all.astype(jnp.float32),
                            L.dst, L.row_offsets, L.tile2rel,
                            L.n_rows_total, cfg.negative_slope,
                            cfg.temperature, mode, interpret, fold,
                        )
            # cross-relation aggregation over the merged rows. mean matches
            # the per-relation path's _aggregate: every relation output
            # participates (zeros for edge-less nodes included), and the
            # per-relation biases average (out_r + b_r averaged). max/min
            # are NOT merged-eligible: max(out_r + b_r) is not separable
            # into an aggregate plus a bias term. With rel_fold the SUM
            # already happened inside the fused op's VJP (same reshape+sum
            # op, just inside the custom_vjp boundary); mean divides after.
            if fold:
                head_outs.append(
                    out_all / n_rel if cfg.gnn_aggr == "mean" else out_all
                )
            else:
                rel_stack = out_all.reshape(n_rel, L.n_rows_per_rel, d)
                head_outs.append(
                    rel_stack.mean(axis=0) if cfg.gnn_aggr == "mean"
                    else rel_stack.sum(axis=0)
                )
        out = (head_outs[0] if H == 1
               else jnp.concatenate(head_outs, axis=-1))
        bias = (bias_sum / len(L.rel_keys) if cfg.gnn_aggr == "mean"
                else bias_sum)
        out = out.astype(out_dtype) + bias
        if L.base_type is None:
            out_dict[dst_t] = out
        else:
            # dst-range sub-layout: collect segments, concat in node order
            out_dict.setdefault(L.base_type, []).append((L.node_base, out))
    return {
        t: (v if not isinstance(v, list)
            else jnp.concatenate([o for _, o in sorted(v, key=lambda x:
                                                       x[0])], axis=0))
        for t, v in out_dict.items()
    }


def _merged_mp_active(cfg: ModelConfig, meta: dict) -> bool:
    """Merged fast path for the non-attention backbones (SAGE/GCN/SGC):
    one gather + one Pallas segment-sum per dst type instead of per
    relation."""
    return (
        cfg.use_pallas
        and cfg.pallas_mode == "merged"
        and cfg.gnn_backbone in ("SAGE", "GCN", "SGC")
        and cfg.gnn_aggr in ("sum", "mean")
        and cfg.gnn_hidden_dim % 128 == 0
        and meta.get("merged") is not None
    )


def _merged_mp_norms(L, backbone: str):
    """Static (degree-only) normalization arrays for one merged layout,
    cached on the layout object. Pad edges live on trash rows/src rows,
    so plain bincounts over the merged stream give real-row degrees."""
    import numpy as _np

    cached = getattr(L, "_mp_norms", None)
    if cached is None:
        deg_dst = _np.bincount(L.dst, minlength=L.n_rows_total
                               ).astype(_np.float32)
        inv_deg = _np.where(deg_dst > 0, 1.0 / _np.maximum(deg_dst, 1.0),
                            0.0)
        # sub-layouts carry the PARENT's src degrees (split_merged_layout)
        # — their own stream covers only one dst range
        deg_src = getattr(L, "parent_src_deg", None)
        if deg_src is None:
            deg_src = _np.bincount(L.src, minlength=L.n_src_total
                                   ).astype(_np.float32)
        dinv_dst = _np.where(deg_dst > 0,
                             1.0 / _np.sqrt(_np.maximum(deg_dst, 1.0)), 0.0)
        dinv_src = _np.where(deg_src > 0,
                             1.0 / _np.sqrt(_np.maximum(deg_src, 1.0)), 0.0)
        sym_e = (dinv_src[L.src] * dinv_dst[L.dst]).astype(_np.float32)
        cached = {"inv_deg": inv_deg, "sym_e": sym_e}
        L._mp_norms = cached
    return cached[{"SAGE": "inv_deg"}.get(backbone, "sym_e")]


def apply_merged_mp_layer(
    layer_params,
    cfg: ModelConfig,
    meta: dict,
    h: Dict[str, jnp.ndarray],
) -> Dict[str, jnp.ndarray]:
    """One SAGE/GCN/SGC hetero layer over merged per-dst-type streams.

    The per-relation convs (models/convs.py) each run a gather + segment
    reduction; merged, every dst type is ONE CSC-backed gather + ONE
    Pallas segment-sum over the concatenated relation stream (pad edges
    aggregate into trash rows — graph/shard_compile.py contract). The
    SAGE mean and the GCN/SGC symmetric norms depend only on degrees, so
    they are host-built STATIC constants (_merged_mp_norms). Math
    identical to the per-relation path + _aggregate
    (tests/test_pallas_kernels.py::test_model_pallas_mp_backbones...).
    """
    import jax as _jax

    from ..ops.pallas_segment import gather_rows_csc, segment_sum_edges

    interpret = _jax.default_backend() != "tpu"
    bb = cfg.gnn_backbone
    out_dict = {}
    for dst_t, L in meta["merged"].items():
        R = len(L.rel_keys)
        N = L.n_rows_per_rel
        if bb == "GCN":
            # GCN projects BEFORE aggregation: per-slot tables
            xs_all = jnp.concatenate(
                [h[L.src_types[r]] @ layer_params[L.rel_keys[r]]["lin"]["w"]
                 for r in range(R)], axis=0)
        else:
            # SAGE / SGC aggregate raw features
            xs_all = jnp.concatenate(
                [h[L.src_types[r]] for r in range(R)], axis=0)
        msgs = gather_rows_csc(
            xs_all, jnp.asarray(L.src), L.csc_perm, L.csc_ids,
            L.csc_offsets, L.n_src_total, interpret,
        )
        norm = _merged_mp_norms(L, bb)
        if bb in ("GCN", "SGC"):
            msgs = msgs * jnp.asarray(norm)[:, None]
        summed = segment_sum_edges(
            msgs, jnp.asarray(L.dst), jnp.asarray(L.row_offsets),
            L.n_rows_total, interpret,
        )
        if bb == "SAGE":
            summed = summed * jnp.asarray(norm)[:, None]     # mean
        rel = summed.reshape(R, N, -1)
        # dst-range sub-layouts (split_merged_layout): slice the dst
        # hidden table to the sub range and concat segments at the end —
        # same handling as apply_merged_gat_layer
        base_t = L.base_type or dst_t
        h_dst = h[base_t][L.node_base:L.node_base + N]
        outs = []
        for r, rk in enumerate(L.rel_keys):
            rp = layer_params[rk]
            if bb == "SAGE":
                outs.append(rel[r] @ rp["lin_l"]["w"] + rp["lin_l"]["b"]
                            + h_dst @ rp["lin_r"]["w"])
            elif bb == "GCN":
                outs.append(rel[r] + rp["bias"])
            else:                                            # SGC
                outs.append(rel[r] @ rp["lin"]["w"] + rp["lin"]["b"])
        out = _aggregate(outs, cfg.gnn_aggr)
        if L.base_type is None:
            out_dict[dst_t] = out
        else:
            out_dict.setdefault(base_t, []).append((L.node_base, out))
    return {
        t: (v if not isinstance(v, list)
            else jnp.concatenate([o for _, o in sorted(v, key=lambda x:
                                                       x[0])], axis=0))
        for t, v in out_dict.items()
    }


def apply_hetero_layer(
    layer_params,
    cfg: ModelConfig,
    meta: dict,
    h: Dict[str, jnp.ndarray],
    edges: Dict[str, dict],
    raw_attention: bool = False,
    collect_alpha: bool = False,
    dropout_rng=None,
    training: bool = False,
    merged_kernel_fns: Optional[dict] = None,
    layout_ops: Optional[dict] = None,
):
    """One HeteroConv application. Returns (out_dict, alpha_dict)."""
    # non-attention backbones dispatch first so the GAT gate's fallback
    # warning doesn't fire for configs the MP fast path covers
    if merged_kernel_fns is None and _merged_mp_active(cfg, meta):
        return apply_merged_mp_layer(layer_params, cfg, meta, h), {}
    if _merged_path_active(cfg, meta, raw_attention, collect_alpha, training):
        return (
            apply_merged_gat_layer(
                layer_params, cfg, meta, h, merged_kernel_fns,
                raw_attention=raw_attention, layout_ops=layout_ops,
            ),
            {},
        )
    rel_types = meta["rel_types"]
    num_edges = meta["num_edges"]
    padded_nodes = meta["padded_nodes"]
    row_offsets_all = meta.get("row_offsets", {})
    csc_all = meta.get("csc", {})
    per_dst: Dict[str, list] = {}
    alphas: Dict[str, jnp.ndarray] = {}
    for rk, rp in layer_params.items():
        src_t, _, dst_t = rel_types[rk]
        rng = None
        if dropout_rng is not None:
            dropout_rng, rng = jax.random.split(dropout_rng)
        out, alpha = _apply_relation_conv(
            rp,
            cfg,
            h,
            src_t,
            dst_t,
            edges[rk],
            num_edges[rk],
            padded_nodes,
            raw_attention,
            collect_alpha,
            dropout_rng=rng,
            training=training,
            row_offsets=row_offsets_all.get(rk),
            csc=csc_all.get(rk),
        )
        per_dst.setdefault(dst_t, []).append(out)
        if collect_alpha and alpha is not None:
            alphas[rk] = alpha
    out_dict = {t: _aggregate(outs, cfg.gnn_aggr) for t, outs in per_dst.items()}
    return out_dict, alphas


def apply_hetero_gnn(
    params,
    cfg: ModelConfig,
    meta: dict,
    graph_arrays: dict,
    training: bool = False,
    dropout_rng=None,
    return_hidden: bool = False,
    h1_override: Optional[Dict[str, jnp.ndarray]] = None,
    merged_kernel_fns: Optional[dict] = None,
):
    """Full-graph forward. Returns pred [N_snp_pad, out_channels] (all SNP
    rows; gather seed rows outside — the full-graph analog of the
    ``[:batch_size]`` seed slice at reference model.py:79-86)."""
    with jax.default_matmul_precision(cfg.matmul_precision):
        return _apply_hetero_gnn(
            params, cfg, meta, graph_arrays, training, dropout_rng,
            return_hidden, h1_override, merged_kernel_fns,
        )


def _apply_hetero_gnn(
    params,
    cfg: ModelConfig,
    meta: dict,
    graph_arrays: dict,
    training: bool = False,
    dropout_rng=None,
    return_hidden: bool = False,
    h1_override: Optional[Dict[str, jnp.ndarray]] = None,
    merged_kernel_fns: Optional[dict] = None,
):
    x = graph_arrays["x"]
    edges = graph_arrays["edges"]
    # traced layout bundles (cfg.layout_operands; build_layout_operands):
    # present in arrays -> the gathered fast path reads its index arrays
    # as HLO parameters instead of embedded literals
    layout_ops = (graph_arrays.get("merged_ops")
                  if getattr(cfg, "layout_operands", False) else None)
    if getattr(cfg, "layout_operands", False) and layout_ops is None:
        # the flag exists to keep layout index arrays out of the HLO text;
        # a silent literal-constant fallback would reproduce the exact
        # giant-program relay failure it guards against
        import logging

        logging.getLogger(__name__).warning(
            "kgwas_tpu: cfg.layout_operands=True but graph_arrays has no "
            "'merged_ops' entry — falling back to HLO-literal layout "
            "constants (giant program text at scale). Merge "
            "build_layout_operands(cfg, meta) into the arrays pytree.")
    compute_dtype = jnp.dtype(cfg.compute_dtype)
    if compute_dtype != jnp.float32:
        x = {t: v.astype(compute_dtype) for t, v in x.items()}
        params = jax.tree_util.tree_map(lambda p: p.astype(compute_dtype), params)
        if h1_override:
            h1_override = {
                t: v.astype(compute_dtype) for t, v in h1_override.items()
            }

    h = apply_encoders(params, x, h1_override)

    def layer_fn(h, layer_params, rng):
        out, _ = apply_hetero_layer(
            layer_params, cfg, meta, h, edges,
            dropout_rng=rng, training=training,
            merged_kernel_fns=merged_kernel_fns,
            layout_ops=layout_ops,
        )
        return {t: jax.nn.relu(v) for t, v in out.items()}

    for layer_params in params["convs"]:
        rng = None
        if dropout_rng is not None:
            dropout_rng, rng = jax.random.split(dropout_rng)
        if cfg.remat:
            h = jax.checkpoint(lambda hh, lp=layer_params, r=rng: layer_fn(hh, lp, r))(h)
        else:
            h = layer_fn(h, layer_params, rng)

    logits = h["SNP"] @ params["lin"]["w"] + params["lin"]["b"]
    pred = logits if cfg.no_relu else jax.nn.relu(logits)
    pred = pred.astype(jnp.float32)
    if return_hidden:
        return pred, h["SNP"].astype(jnp.float32)
    return pred


def apply_collect_attention(
    params,
    cfg: ModelConfig,
    meta: dict,
    graph_arrays: dict,
    raw: bool = True,
):
    """Interpretation forward (reference kgwas/utils.py:446-461): encoders,
    then conv layers collecting per-relation attention. Mirrors the reference
    quirks exactly: raw (pre-softmax) alpha weights the messages, and NO ReLU
    is applied between layers on this path.

    Returns list (per layer) of dicts relkey -> alpha [E_pad, H].
    """
    x = graph_arrays["x"]
    edges = graph_arrays["edges"]
    h = apply_encoders(params, x)
    all_layers = []
    for layer_params in params["convs"]:
        h, alphas = apply_hetero_layer(
            layer_params, cfg, meta, h, edges,
            raw_attention=raw, collect_alpha=True,
        )
        all_layers.append(alphas)
    return all_layers
