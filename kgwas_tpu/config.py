"""Dataclass configs for the TPU-native KGWAS framework.

The reference passes kwargs with defaults everywhere (reference kgwas/kgwas.py:52,85);
we centralize them in serializable dataclasses so checkpoints carry a complete,
reproducible description of the run (config.json next to weights).
"""
from __future__ import annotations

import dataclasses
import json
import os
import warnings
from dataclasses import dataclass
from typing import Optional


@dataclass(frozen=True)
class ModelConfig:
    """Model hyperparameters (mirrors reference KGWAS.initialize_model kwargs,
    reference kgwas/kgwas.py:52)."""

    gnn_num_layers: int = 2
    gnn_hidden_dim: int = 128
    gnn_backbone: str = "GAT"  # GAT | SAGE | GCN | SGC
    gnn_aggr: str = "sum"      # cross-relation aggregation: sum | mean | max | min
    gat_num_head: int = 1
    no_relu: bool = False
    # GAT extras mirrored from reference kgwas/conv.py:36-68
    negative_slope: float = 0.2
    dropout: float = 0.0
    sigmoid_gat: bool = False
    temperature: float = 1.0
    out_channels: int = 1
    # edge-feature attention (reference conv.py:95-101): dim of per-edge
    # features; enables lin_edge/att_edge and the alpha_edge term
    edge_dim: Optional[int] = None
    # pheno-conditioning hooks (reference conv.py:70-77): 'ATT' | 'MSG' |
    # None. The reference only *creates* parameters for these (pheno_emb is
    # never read in edge_update/message) — kept for state-dict parity.
    pheno_condition: Optional[str] = None
    # TPU-specific knobs (new; not in reference)
    param_dtype: str = "float32"
    compute_dtype: str = "float32"   # set "bfloat16" for MXU speed mode
    stream_dtype: Optional[str] = None  # dtype of the [E, D] edge message
                                     # STREAMS only (gather output + layer
                                     # kernel DMA); "bfloat16" halves the
                                     # dominant kernel DMA while params,
                                     # activations, softmax state, and the
                                     # optimizer stay f32 (78.6 vs 85.0
                                     # ms/step on the v5e bench). OPT-IN:
                                     # quality gate scored spearman 0.91 /
                                     # top-50 overlap 0.92 vs f32 (bar:
                                     # 0.95/0.9 — scripts/
                                     # exp_stream_gate.py), so f32 stays
                                     # the default. None = follow
                                     # compute_dtype
    stream_f32_logits: bool = False  # with stream_dtype set: keep attention
                                     # LOGITS at f32 and round only the
                                     # aggregated message stream (probe for
                                     # an f32 a_src side-stream kernel —
                                     # scored identical to full stream-bf16,
                                     # scripts/exp_stream_gate.py, so that
                                     # kernel was not built)
    matmul_precision: str = "highest"  # "highest" for parity; "default" lets
                                       # the TPU MXU use fast bf16 passes.
                                       # NOTE: does NOT govern the Pallas
                                       # kernels' in-kernel dots — those are
                                       # pinned to Mosaic DEFAULT (numerics
                                       # within rtol 5e-3 of the XLA path,
                                       # scripts/exp_tpu_numerics.py); set
                                       # KGWAS_KERNEL_PRECISION=highest
                                       # before import for strict kernel
                                       # parity runs
    remat: bool = False              # jax.checkpoint each conv layer
    use_pallas: bool = False         # fused segment-softmax-SpMM kernel for
                                     # the GAT aggregation (requires heads=1,
                                     # softmax mode, node_pad_multiple=BN)
    pallas_mode: str = "merged"      # "merged": one kernel per dst type per
                                     # layer over concatenated relation
                                     # streams (fastest); "relation": one
                                     # kernel per relation
    bwd_window_edges: Optional[int] = None  # fragment-windowed backward
                                     # permute for plain-stream groups with
                                     # E > 131072 but a fast forward table
                                     # (SNP-shaped). Max cotangent-table
                                     # rows per chunk. OFF by default
                                     # (None): measured NEUTRAL in
                                     # isolation and -4% composed on v5e —
                                     # XLA fuses the chunk slice into the
                                     # gather, so the cotangent chunks
                                     # never hit the fast small-table
                                     # emitter (scripts/exp_win_bwd.py).
                                     # Set an int to experiment; see
                                     # graph/merged_layout.build_csc_windows
    pad_fragments: Optional[bool] = None  # fragment-padded chunked stream
                                     # (v3): BE-pad (chunk, tile) fragments
                                     # with sentinel edges so every backward
                                     # window is fully owned -> zero-RMW
                                     # backward kernel (drops 1 of 3 BE x D
                                     # DMA streams). None = auto (on when
                                     # the chunked gather engages); False
                                     # forces the read-merge kernel
    rel_fold: bool = True            # fold the cross-relation sum/mean into
                                     # the fused layer ops' custom VJP: the
                                     # backward kernels read the [N, D]
                                     # cotangent with an `i % tiles` index
                                     # map instead of XLA materializing the
                                     # [R*N, D] broadcast for the custom
                                     # call (identical math; ~1 ms/step at
                                     # 200k and ~2 GiB HBM at 2M SNPs).
                                     # DEFAULT ON since round 5: the
                                     # documented hardware gate
                                     # (scripts/exp_bn_parity_tpu.py,
                                     # BN_PARITY_FOLD=1) passed on v5e —
                                     # fold variants at BN=256 AND BN=512
                                     # matched the XLA oracle over 8
                                     # composed steps (loss rel-err
                                     # <=8.4e-5, final params <=5.3e-4)
                                     # (benchmarks/RESULTS.md round 4); the
                                     # full gate was cut short by relay
                                     # claim stalls, not a failure.
    layout_operands: bool = False    # thread the gathered path's layout
                                     # index arrays through the graph
                                     # `arrays` pytree as TRACED args (HLO
                                     # parameters) instead of closed-over
                                     # numpy (stablehlo literals). Shrinks
                                     # the serialized program by the full
                                     # layout size (556 MiB at 2M SNPs —
                                     # above ~400k the literal form broke
                                     # the relay's /remote_compile). Caller
                                     # must merge
                                     # models.hetero_gnn.build_layout_operands(cfg, meta)
                                     # into arrays as arrays["merged_ops"].
                                     # Identical kernels and math — only
                                     # the outer HLO changes.
    gather_chunk_rows: Optional[int] = None  # src-chunked message gather:
                                     # max table rows per chunk (None ->
                                     # EMITTER_FAST_ROWS = 131072; 0
                                     # disables). Applies to merged layouts
                                     # whose concat src space is in XLA's
                                     # slow big-table gather regime
                                     # (> 131072 rows); see
                                     # graph/merged_layout.ChunkedStreamLayout

    def __post_init__(self):
        # KGWAS_STREAM_F32_LOGITS predates the stream_f32_logits field; honor
        # it as a fallback so older probe scripts don't silently run with
        # rounded logits (advisor round 3), but warn toward the config field.
        env = os.environ.get("KGWAS_STREAM_F32_LOGITS")
        if env is not None and not self.stream_f32_logits:
            warnings.warn(
                "KGWAS_STREAM_F32_LOGITS env var is deprecated; set "
                "ModelConfig(stream_f32_logits=True) instead "
                "(env value honored this run)",
                DeprecationWarning,
                stacklevel=2,
            )
            object.__setattr__(self, "stream_f32_logits", env == "1")

    def to_dict(self):
        return dataclasses.asdict(self)

    @classmethod
    def from_dict(cls, d):
        known = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in d.items() if k in known})


@dataclass(frozen=True)
class TrainConfig:
    """Training hyperparameters (mirrors reference KGWAS.train kwargs,
    reference kgwas/kgwas.py:85-87)."""

    batch_size: int = 512
    lr: float = 1e-4
    weight_decay: float = 5e-4   # torch-Adam coupled L2 semantics (not AdamW)
    epoch: int = 10
    save_best_model: bool = True
    shuffle: bool = False        # reference NeighborLoader defaults to shuffle=False
    eval_batch_size: int = 512
    # TPU-specific
    full_batch: bool = False     # one optimizer step per epoch over all train SNPs
    data_parallel_devices: int = 1

    def to_dict(self):
        return dataclasses.asdict(self)

    @classmethod
    def from_dict(cls, d):
        known = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in d.items() if k in known})


@dataclass(frozen=True)
class MeshConfig:
    """Device-mesh layout for pjit/shard_map distributed runs (new; the
    reference has no distributed runtime — SURVEY.md section 2.3)."""

    data_axis: int = 1    # node/edge partition axis size
    model_axis: int = 1   # feature-dim (TP) axis size for giant input embeddings
    axis_names: tuple = ("data", "model")

    def to_dict(self):
        return dataclasses.asdict(self)


def save_config(path: str, model_cfg: ModelConfig, extra: Optional[dict] = None):
    payload = {"model": model_cfg.to_dict()}
    if extra:
        payload.update(extra)
    with open(path, "w") as f:
        json.dump(payload, f, indent=2, default=str)


def load_config(path: str) -> dict:
    with open(path) as f:
        return json.load(f)
