"""torch_geometric.data.HeteroData — faithful minimal implementation.

PyG public semantics (documented API, re-implemented from scratch):
`data['SNP'].x = ...` creates/accesses a node storage; `data[(s, r, d)]`
(or `data['s', 'r', 'd']`) an edge storage; storages hold arbitrary tensor
attributes with attribute AND item access (the reference uses both:
`batch['SNP'].y` and `batch['SNP']['n_id']`, kgwas.py:140-142).
`x_dict` / `edge_index_dict` collect the per-storage `x` / `edge_index`
attributes; `node_types` / `edge_types` list storage keys; `.to(device)`
moves every tensor attribute. Graph-level attributes (train_mask, ...)
live directly on the HeteroData object (kgwas_data.py:541-544).
"""
from typing import Dict, List, Tuple, Union

import torch
from torch import Tensor

EdgeType = Tuple[str, str, str]


class Storage:
    """Node/edge storage: dict of tensors with attribute access."""

    def __init__(self):
        object.__setattr__(self, "_store", {})

    def __setattr__(self, key, value):
        self._store[key] = value

    def __getattr__(self, key):
        try:
            return object.__getattribute__(self, "_store")[key]
        except KeyError:
            raise AttributeError(key) from None

    def __setitem__(self, key, value):
        self._store[key] = value

    def __getitem__(self, key):
        return self._store[key]

    def __contains__(self, key):
        return key in self._store

    def keys(self):
        return self._store.keys()

    def items(self):
        return self._store.items()

    def to(self, device):
        for k, v in self._store.items():
            if isinstance(v, Tensor):
                self._store[k] = v.to(device)
        return self


class HeteroData:
    def __init__(self):
        object.__setattr__(self, "_node", {})
        object.__setattr__(self, "_edge", {})
        object.__setattr__(self, "_global", {})

    @staticmethod
    def _is_edge_key(key) -> bool:
        return isinstance(key, tuple) and len(key) == 3

    def __getitem__(self, key) -> Storage:
        store = self._edge if self._is_edge_key(key) else self._node
        if key not in store:
            store[key] = Storage()
        return store[key]

    def __setattr__(self, key, value):
        self._global[key] = value

    def __getattr__(self, key):
        if key.endswith("_dict"):
            attr = key[: -len("_dict")]
            out = {}
            for k, s in {**self._node, **self._edge}.items():
                if attr in s:
                    out[k] = s[attr]
            return out
        try:
            return object.__getattribute__(self, "_global")[key]
        except KeyError:
            raise AttributeError(key) from None

    @property
    def node_types(self) -> List[str]:
        return list(self._node.keys())

    @property
    def edge_types(self) -> List[EdgeType]:
        return list(self._edge.keys())

    def to(self, device, *args):
        for s in self._node.values():
            s.to(device)
        for s in self._edge.values():
            s.to(device)
        for k, v in self._global.items():
            if isinstance(v, Tensor):
                self._global[k] = v.to(device)
        return self


class Batch(HeteroData):
    """NeighborLoader output — a HeteroData whose input-type storage also
    carries `batch_size` (seed count; seeds come first, model.py:79-86)."""
