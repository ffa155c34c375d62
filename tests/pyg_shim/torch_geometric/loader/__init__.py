"""torch_geometric.loader.NeighborLoader — faithful for FULL fan-out.

The reference only ever constructs NeighborLoader with
num_neighbors=[-1] * num_layers (kgwas.py:99-113): every hop takes ALL
in-neighbors, so each batch is the exact induced L-hop (reversed-edge)
neighborhood of its seed slice and the model's outputs at the seeds equal
the full-graph forward restricted to those rows. This shim implements
exactly that case (it asserts on any other fan-out): seeds first in the
input type's local order, deduplicated BFS frontier expansion per edge
type, per-batch edge relabeling, attribute subsetting (x, y, n_id),
`batch_size` on the input type. Iteration order is the input-node order
(PyG default shuffle=False), sliced into batch_size chunks; drop_last
drops the trailing partial batch — matching the reference's train/eval
loader kwargs (kgwas.py:92-93).
"""
from typing import Dict, List, Optional, Tuple

import numpy as np
import torch

from ..data import Batch, HeteroData

__all__ = ["NeighborLoader"]


class NeighborLoader:
    def __init__(self, data: HeteroData, num_neighbors: List[int],
                 input_nodes: Tuple[str, np.ndarray], batch_size: int = 1,
                 num_workers: int = 0, drop_last: bool = False,
                 shuffle: bool = False, sampler=None, **kwargs):
        assert all(n == -1 for n in num_neighbors), (
            "shim NeighborLoader implements full fan-out only "
            "(the reference always uses [-1] * num_layers)")
        assert sampler is None and not shuffle
        self.data = data
        self.num_hops = len(num_neighbors)
        self.input_type, ids = input_nodes
        self.input_ids = np.asarray(
            ids.cpu() if isinstance(ids, torch.Tensor) else ids
        ).astype(np.int64)
        self.batch_size = batch_size
        self.drop_last = drop_last
        # reversed-edge CSR per edge type: dst -> positions of edges INTO it
        # (message passing is src -> dst; expanding a dst frontier pulls all
        # src neighbors, i.e. full fan-out "sampling")
        self._rev: Dict[tuple, tuple] = {}
        for et in data.edge_types:
            ei = data[et].edge_index.cpu().numpy()
            n_dst = int(data[et[2]].x.shape[0])
            order = np.argsort(ei[1], kind="stable")
            indptr = np.zeros(n_dst + 1, dtype=np.int64)
            np.add.at(indptr, ei[1] + 1, 1)
            np.cumsum(indptr, out=indptr)
            self._rev[et] = (indptr, order, ei)

    def __len__(self):
        n = len(self.input_ids)
        return n // self.batch_size if self.drop_last else (
            (n + self.batch_size - 1) // self.batch_size)

    def __iter__(self):
        for b in range(len(self)):
            seeds = self.input_ids[b * self.batch_size:
                                   (b + 1) * self.batch_size]
            yield self._sample(seeds)

    def _sample(self, seeds: np.ndarray) -> Batch:
        data = self.data
        # per type: local order of sampled globals + global -> local map
        local: Dict[str, Dict[int, int]] = {t: {} for t in data.node_types}
        order: Dict[str, List[int]] = {t: [] for t in data.node_types}

        def add(t, g) -> bool:
            m = local[t]
            if g in m:
                return False
            m[g] = len(order[t])
            order[t].append(g)
            return True

        for g in seeds.tolist():
            add(self.input_type, g)
        frontier = {self.input_type: list(seeds.tolist())}
        edges: Dict[tuple, List[np.ndarray]] = {
            et: [] for et in data.edge_types}

        for _ in range(self.num_hops):
            nxt: Dict[str, List[int]] = {}
            for et in data.edge_types:
                s_t, _, d_t = et
                front = frontier.get(d_t)
                if not front:
                    continue
                indptr, pos_order, ei = self._rev[et]
                fa = np.asarray(front, dtype=np.int64)
                counts = indptr[fa + 1] - indptr[fa]
                if counts.sum() == 0:
                    continue
                pos = np.concatenate(
                    [pos_order[indptr[v]:indptr[v + 1]] for v in front])
                edges[et].append(pos)
                for u in ei[0][pos].tolist():
                    if add(s_t, u):
                        nxt.setdefault(s_t, []).append(u)
            frontier = nxt

        # PyG batches carry EVERY node/edge type, empty where unsampled —
        # the reference model iterates all 5 types (model.py:56-60) and
        # HeteroConv produces zero-message outputs for edge-less relations,
        # which is how dst types with no sampled in-edges survive a layer
        batch = Batch()
        for t in data.node_types:
            n_id = torch.tensor(order[t], dtype=torch.long)
            st = batch[t]
            st.n_id = n_id
            for attr, val in data[t].items():
                if isinstance(val, torch.Tensor) and val.shape[:1] == (
                        data[t].x.shape[0],):
                    st[attr] = val[n_id]
        batch[self.input_type].batch_size = len(seeds)
        for et, parts in edges.items():
            s_t, _, d_t = et
            if parts:
                pos = np.concatenate(parts)
                _, _, ei = self._rev[et]
                src = np.array([local[s_t][u] for u in ei[0][pos].tolist()],
                               dtype=np.int64)
                dst = np.array([local[d_t][v] for v in ei[1][pos].tolist()],
                               dtype=np.int64)
                edge_index = torch.tensor(np.stack([src, dst]),
                                          dtype=torch.long)
            else:
                edge_index = torch.zeros(2, 0, dtype=torch.long)
            batch[et].edge_index = edge_index
        return batch
