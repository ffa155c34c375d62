"""torch_geometric.nn.conv.MessagePassing — faithful minimal implementation.

PyG collection protocol (flow='source_to_target', edge_index a [2, E] Tensor):
j = source = edge_index[0], i = target = edge_index[1]. Arguments of the
user-defined message/edge_update functions are resolved by name: `name_j`
gathers `name` (or `name[0]` for (src, dst) pairs) along node_dim by
edge_index[0]; `name_i` gathers `name[1]` by edge_index[1]; `index` is the
target row per edge; `ptr` is None for COO input; `size_i`/`size_j` are the
target/source node counts. Aggregation is a dense scatter by target.
"""
import inspect
from typing import Optional

import torch
from torch import Tensor

from ...utils import scatter


class MessagePassing(torch.nn.Module):
    def __init__(self, aggr: Optional[str] = "add",
                 flow: str = "source_to_target", node_dim: int = -2,
                 **kwargs):
        super().__init__()
        assert flow == "source_to_target"
        self.aggr = aggr
        self.flow = flow
        self.node_dim = node_dim

    # -- argument collection ------------------------------------------------
    def _resolve(self, fn, edge_index: Tensor, size, kwargs):
        src_idx, dst_idx = edge_index[0], edge_index[1]
        size = [None, None] if size is None else list(size)

        def note_size(pos, t):
            if t is not None and size[pos] is None:
                size[pos] = t.size(self.node_dim if self.node_dim >= 0 else 0)

        # first pass: infer sizes from every pair/basic tensor argument
        for name, val in kwargs.items():
            if isinstance(val, tuple):
                note_size(0, val[0] if isinstance(val[0], Tensor) else None)
                note_size(1, val[1] if isinstance(val[1], Tensor) else None)

        out = {}
        params = inspect.signature(fn).parameters
        for name in params:
            if name == "index":
                out[name] = dst_idx
            elif name == "ptr":
                out[name] = None
            elif name == "size_i":
                out[name] = size[1] if size[1] is not None else size[0]
            elif name == "size_j":
                out[name] = size[0] if size[0] is not None else size[1]
            elif name.endswith("_j") or name.endswith("_i"):
                base, pos = name[:-2], (0 if name.endswith("_j") else 1)
                val = kwargs.get(base)
                if isinstance(val, tuple):
                    val = val[pos]
                if val is None:
                    out[name] = None
                else:
                    note_size(pos, val)
                    idx = src_idx if pos == 0 else dst_idx
                    out[name] = val.index_select(
                        self.node_dim if self.node_dim >= 0 else 0, idx)
            else:
                out[name] = kwargs.get(name)
        return out, size

    # -- public protocol ----------------------------------------------------
    def edge_updater(self, edge_index: Tensor, **kwargs):
        fn_kwargs, _ = self._resolve(self.edge_update, edge_index, None, kwargs)
        return self.edge_update(**fn_kwargs)

    def propagate(self, edge_index: Tensor, size=None, **kwargs):
        fn_kwargs, size = self._resolve(self.message, edge_index, size, kwargs)
        msgs = self.message(**fn_kwargs)
        dim_size = size[1] if size[1] is not None else size[0]
        reduce = {"add": "sum"}.get(self.aggr, self.aggr)
        out = self.aggregate(msgs, edge_index[1], dim_size=dim_size,
                             reduce=reduce)
        return self.update(out)

    def aggregate(self, inputs: Tensor, index: Tensor,
                  dim_size: Optional[int] = None, reduce: str = "sum"):
        return scatter(inputs, index,
                       dim=self.node_dim if self.node_dim >= 0 else 0,
                       dim_size=dim_size, reduce=reduce)

    def message(self, x_j: Tensor) -> Tensor:  # default PyG message
        return x_j

    def update(self, inputs: Tensor) -> Tensor:
        return inputs
