"""Heterogeneous graph schema (host-side, numpy).

Replaces PyG ``HeteroData`` (reference kgwas/kgwas_data.py:129) with a plain
numpy container designed to be *compiled* into static-shape device shards
(see shard_compile.py) rather than sampled.

Relation keys are ``(src_type, rel_name, dst_type)`` tuples, string-joined as
``src__rel__dst`` when a flat string key is needed (param dicts, checkpoints).
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Tuple

import numpy as np

EdgeType = Tuple[str, str, str]

SEP = "__"


def edge_key(et: EdgeType) -> str:
    return SEP.join(et)


def parse_edge_key(key: str) -> EdgeType:
    parts = key.split(SEP)
    if len(parts) != 3:
        raise ValueError(f"bad edge key {key!r}")
    return tuple(parts)  # type: ignore


@dataclass
class HeteroGraph:
    """In-memory heterogeneous graph.

    node_features: node type -> float32 [N_t, D_t]
    edge_index:    (src_type, rel, dst_type) -> int64/int32 [2, E] (row 0 = src,
                   row 1 = dst), matching the reference's COO layout
                   (reference kgwas/kgwas_data.py:259-270).
    """

    node_features: Dict[str, np.ndarray] = field(default_factory=dict)
    edge_index: Dict[EdgeType, np.ndarray] = field(default_factory=dict)
    node_labels: Dict[str, np.ndarray] = field(default_factory=dict)

    @property
    def node_types(self) -> List[str]:
        return list(self.node_features.keys())

    @property
    def edge_types(self) -> List[EdgeType]:
        return list(self.edge_index.keys())

    def num_nodes(self, ntype: str) -> int:
        return int(self.node_features[ntype].shape[0])

    def num_edges(self, et: EdgeType) -> int:
        return int(self.edge_index[et].shape[1])

    @property
    def total_edges(self) -> int:
        return sum(self.num_edges(et) for et in self.edge_types)

    def feature_dim(self, ntype: str) -> int:
        return int(self.node_features[ntype].shape[1])

    def validate(self):
        for et, ei in self.edge_index.items():
            src_t, _, dst_t = et
            if src_t not in self.node_features or dst_t not in self.node_features:
                raise ValueError(f"edge type {et} references unknown node type")
            if ei.ndim != 2 or ei.shape[0] != 2:
                raise ValueError(f"edge_index for {et} must be [2, E], got {ei.shape}")
            if ei.shape[1]:
                if ei[0].max(initial=-1) >= self.num_nodes(src_t) or ei[0].min(initial=0) < 0:
                    raise ValueError(f"src index out of range for {et}")
                if ei[1].max(initial=-1) >= self.num_nodes(dst_t) or ei[1].min(initial=0) < 0:
                    raise ValueError(f"dst index out of range for {et}")
        return self

    def summary(self) -> str:
        lines = ["HeteroGraph:"]
        for nt in self.node_types:
            lines.append(f"  [node] {nt}: N={self.num_nodes(nt)} D={self.feature_dim(nt)}")
        for et in self.edge_types:
            lines.append(f"  [edge] {edge_key(et)}: E={self.num_edges(et)}")
        return "\n".join(lines)
