"""torch_geometric.utils: softmax / add_self_loops / remove_self_loops.

Faithful to PyG: softmax subtracts a detached per-segment max, exps, and
normalizes by the per-segment sum + 1e-16 (this epsilon is the one the
reference's GAT softmax inherits — kgwas/conv.py:223)."""
from typing import Optional, Union

import torch
from torch import Tensor


def maybe_num_nodes(index: Tensor, num_nodes: Optional[int] = None) -> int:
    if num_nodes is not None:
        return num_nodes
    return int(index.max()) + 1 if index.numel() > 0 else 0


def scatter(src: Tensor, index: Tensor, dim: int = 0,
            dim_size: Optional[int] = None, reduce: str = "sum") -> Tensor:
    """Segment reduction along dim (PyG's torch_scatter replacement)."""
    dim = dim if dim >= 0 else src.dim() + dim
    if dim_size is None:
        dim_size = maybe_num_nodes(index)
    shape = list(src.shape)
    shape[dim] = dim_size
    idx = index
    if reduce in ("sum", "add"):
        out = torch.zeros(shape, dtype=src.dtype, device=src.device)
        return out.index_add_(dim, idx, src)
    if reduce == "mean":
        out = torch.zeros(shape, dtype=src.dtype, device=src.device)
        out.index_add_(dim, idx, src)
        cnt = torch.zeros(dim_size, dtype=src.dtype, device=src.device)
        cnt.index_add_(0, idx, torch.ones_like(idx, dtype=src.dtype))
        cnt = cnt.clamp(min=1)
        view = [1] * src.dim()
        view[dim] = dim_size
        return out / cnt.view(view)
    if reduce in ("max", "amax"):
        out = torch.full(shape, float("-inf"), dtype=src.dtype, device=src.device)
        expand_idx = idx
        if src.dim() > 1:
            view = [1] * src.dim()
            view[dim] = -1
            expand_idx = idx.view(view).expand_as(src)
        out.scatter_reduce_(dim, expand_idx, src, reduce="amax",
                            include_self=True)
        return out
    if reduce in ("min", "amin"):
        out = torch.full(shape, float("inf"), dtype=src.dtype, device=src.device)
        expand_idx = idx
        if src.dim() > 1:
            view = [1] * src.dim()
            view[dim] = -1
            expand_idx = idx.view(view).expand_as(src)
        out.scatter_reduce_(dim, expand_idx, src, reduce="amin",
                            include_self=True)
        return out
    raise ValueError(reduce)


def softmax(src: Tensor, index: Optional[Tensor],
            ptr: Optional[Tensor] = None,
            num_nodes: Optional[int] = None, dim: int = 0) -> Tensor:
    N = maybe_num_nodes(index, num_nodes)
    src_max = scatter(src.detach(), index, dim, dim_size=N, reduce="max")
    src_max = src_max.index_select(dim, index)
    out = (src - src_max).exp()
    out_sum = scatter(out, index, dim, dim_size=N, reduce="sum") + 1e-16
    out_sum = out_sum.index_select(dim, index)
    return out / out_sum


def remove_self_loops(edge_index: Tensor, edge_attr: Optional[Tensor] = None):
    mask = edge_index[0] != edge_index[1]
    edge_index = edge_index[:, mask]
    if edge_attr is not None:
        edge_attr = edge_attr[mask]
    return edge_index, edge_attr


def add_self_loops(edge_index: Tensor, edge_attr: Optional[Tensor] = None,
                   fill_value: Union[float, Tensor, str, None] = None,
                   num_nodes: Optional[int] = None):
    N = maybe_num_nodes(edge_index, num_nodes)
    loop_index = torch.arange(N, dtype=edge_index.dtype,
                              device=edge_index.device)
    loop_index = loop_index.unsqueeze(0).repeat(2, 1)
    if edge_attr is not None:
        if fill_value is None:
            loop_attr = edge_attr.new_ones((N,) + edge_attr.shape[1:])
        elif isinstance(fill_value, (int, float)):
            loop_attr = edge_attr.new_full((N,) + edge_attr.shape[1:],
                                           fill_value)
        elif isinstance(fill_value, Tensor):
            loop_attr = fill_value.to(edge_attr.device, edge_attr.dtype)
            if loop_attr.dim() != edge_attr.dim():
                loop_attr = loop_attr.unsqueeze(0)
            loop_attr = loop_attr.expand((N,) + edge_attr.shape[1:])
        elif isinstance(fill_value, str):
            # PyG: reduce the existing edge features onto their target node
            loop_attr = scatter(edge_attr, edge_index[1], dim=0, dim_size=N,
                                reduce=fill_value)
        else:
            raise AttributeError("No valid 'fill_value' provided")
        edge_attr = torch.cat([edge_attr, loop_attr], dim=0)
    edge_index = torch.cat([edge_index, loop_index], dim=1)
    return edge_index, edge_attr
