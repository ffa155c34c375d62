"""Shard compiler: HeteroGraph -> static-shape, device-ready arrays.

This is the TPU replacement for PyG's ``NeighborLoader`` + torch_scatter
machinery (reference kgwas/kgwas.py:99-113, kgwas/conv.py:7-13). Instead of
sampling neighborhoods on CPU workers per batch, we compile the whole KG once
into padded, destination-sorted COO shards with static shapes, so a jitted
full-graph forward computes every edge exactly once per step.

Layout per relation (src_type, rel, dst_type):
  * ``src`` int32 [E_pad]  — source node indices, destination-sorted order
  * ``dst`` int32 [E_pad]  — destination node indices, ascending
  * pads at the tail: dst = trash_row(dst_type), src = 0
  * ``row_offsets`` int32 [N_pad+1] — CSR offsets over dst (for Pallas kernels)

Layout per node type:
  * ``x`` float32 [N_pad, D] — features, zero-padded rows
  * trash_row = N (real nodes are [0, N)); N_pad >= N+1 rounded to 8

Pad edges aggregate into the trash row which is never read by real nodes and
never a source of real edges, so forward/backward are exact. Hot loops
(dst-sort, CSR build) go through the native C++ extension when built
(kgwas_tpu/native), with a numpy fallback.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Optional, Tuple

import numpy as np

from .schema import HeteroGraph, EdgeType, edge_key
from ..native import shardops


def round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@dataclass
class RelationShard:
    key: str
    src_type: str
    rel: str
    dst_type: str
    src: np.ndarray          # int32 [E_pad]
    dst: np.ndarray          # int32 [E_pad]
    num_edges: int           # real edge count (static)
    row_offsets: Optional[np.ndarray] = None  # int32 [N_dst_pad + 1]
    # CSC view (source-sorted) for the Pallas scatter-add transpose of the
    # source-feature gather: perm maps src-sorted position -> dst-sorted edge
    # index; pad edges route to the source-side trash row
    csc_perm: Optional[np.ndarray] = None       # int32 [E_pad]
    csc_src_sorted: Optional[np.ndarray] = None  # int32 [E_pad]
    csc_offsets: Optional[np.ndarray] = None     # int32 [N_src_pad + 1]


@dataclass
class CompiledGraph:
    """Static-shape compiled KG. ``arrays()`` returns the jit-traversable
    pytree; everything else is static Python metadata."""

    node_x: Dict[str, np.ndarray]            # ntype -> [N_pad, D]
    num_nodes: Dict[str, int]                # real N per type
    padded_nodes: Dict[str, int]             # N_pad per type
    relations: Dict[str, RelationShard]      # edge_key -> shard
    edge_types: Tuple[EdgeType, ...]

    @property
    def trash_row(self) -> Dict[str, int]:
        return {t: n for t, n in self.num_nodes.items()}

    def total_real_edges(self) -> int:
        return sum(r.num_edges for r in self.relations.values())

    def arrays(self) -> dict:
        """The dynamic pytree fed into jitted functions."""
        return {
            "x": dict(self.node_x),
            "edges": {
                k: {"src": r.src, "dst": r.dst} for k, r in self.relations.items()
            },
        }

    def meta(self) -> dict:
        """Static metadata captured by closure at trace time. row_offsets are
        numpy (jit constants) — the Pallas kernel takes them as scalar-prefetch
        operands that must not be traced."""
        return {
            "num_nodes": dict(self.num_nodes),
            "padded_nodes": dict(self.padded_nodes),
            "num_edges": {k: r.num_edges for k, r in self.relations.items()},
            "rel_types": {
                k: (r.src_type, r.rel, r.dst_type) for k, r in self.relations.items()
            },
            "row_offsets": {
                k: r.row_offsets for k, r in self.relations.items()
            },
            "csc": {
                k: (r.csc_perm, r.csc_src_sorted, r.csc_offsets)
                for k, r in self.relations.items()
            },
            "merged": self.merged_layouts(),
        }

    _merged_cache = None

    def merged_layouts(self):
        """Per-dst-type merged edge layouts (graph/merged_layout.py), built
        lazily and cached; None when CSR wasn't built or node padding isn't
        kernel-tile aligned (node_pad_multiple = BN, 512 default)."""
        if not self.relations:
            return None
        if next(iter(self.relations.values())).row_offsets is None:
            return None
        from ..ops.pallas_segment import BN

        if any(n % BN != 0 for n in self.padded_nodes.values()):
            # not kernel-tile aligned (e.g. a 256-padded graph under the
            # BN=512 default) -> graceful per-relation fallback, NOT an
            # assert inside build_merged_layouts
            return None
        if self._merged_cache is None:
            from .merged_layout import build_merged_layouts

            self._merged_cache = build_merged_layouts(self, tile_rows=BN)
        return self._merged_cache


def compile_graph(
    g: HeteroGraph,
    edge_pad_multiple: int = 512,
    node_pad_multiple: int = 8,
    build_csr: bool = True,
    feature_dtype=np.float32,
) -> CompiledGraph:
    """feature_dtype: storage dtype for node features. ml_dtypes.bfloat16
    halves HBM for giant embedding tables (pops 57k-dim, reference
    kgwas_data.py:244); the encoder matmul upcasts per ModelConfig."""
    g.validate()
    num_nodes = {t: g.num_nodes(t) for t in g.node_types}
    padded_nodes = {t: round_up(n + 1, node_pad_multiple) for t, n in num_nodes.items()}

    node_x = {}
    for t in g.node_types:
        x = np.asarray(g.node_features[t], dtype=feature_dtype)
        n_pad = padded_nodes[t]
        if n_pad > x.shape[0]:
            x = np.concatenate(
                [x, np.zeros((n_pad - x.shape[0], x.shape[1]), dtype=x.dtype)], axis=0
            )
        node_x[t] = x

    relations = {}
    for et in g.edge_types:
        src_t, rel, dst_t = et
        ei = np.asarray(g.edge_index[et])
        e = int(ei.shape[1])
        e_pad = max(round_up(e, edge_pad_multiple), edge_pad_multiple)
        trash = num_nodes[dst_t]

        src_sorted, dst_sorted = shardops.sort_edges_by_dst(
            ei[0].astype(np.int64), ei[1].astype(np.int64)
        )

        src_arr = np.zeros(e_pad, dtype=np.int32)
        dst_arr = np.full(e_pad, trash, dtype=np.int32)
        src_arr[:e] = src_sorted
        dst_arr[:e] = dst_sorted

        row_offsets = None
        csc_perm = csc_src_sorted = csc_offsets = None
        if build_csr:
            row_offsets = shardops.build_csr_offsets(
                dst_arr.astype(np.int64), padded_nodes[dst_t]
            ).astype(np.int32)
            # CSC: stable-sort edge positions by source (pads keyed to the
            # source-side trash row so they cluster at the tail)
            src_key = src_arr.astype(np.int64).copy()
            src_key[e:] = num_nodes[src_t]
            csc_perm = np.argsort(src_key, kind="stable").astype(np.int32)
            csc_src_sorted = src_key[csc_perm].astype(np.int32)
            csc_offsets = shardops.build_csr_offsets(
                csc_src_sorted.astype(np.int64), padded_nodes[src_t]
            ).astype(np.int32)

        relations[edge_key(et)] = RelationShard(
            key=edge_key(et),
            src_type=src_t,
            rel=rel,
            dst_type=dst_t,
            src=src_arr,
            dst=dst_arr,
            num_edges=e,
            row_offsets=row_offsets,
            csc_perm=csc_perm,
            csc_src_sorted=csc_src_sorted,
            csc_offsets=csc_offsets,
        )

    return CompiledGraph(
        node_x=node_x,
        num_nodes=num_nodes,
        padded_nodes=padded_nodes,
        relations=relations,
        edge_types=tuple(g.edge_types),
    )
