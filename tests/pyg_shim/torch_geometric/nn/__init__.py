"""torch_geometric.nn: HeteroConv / SAGEConv / GCNConv / SGConv / Linear,
plus name-only stubs (Sequential, to_hetero) that the reference imports but
never calls (reference kgwas/model.py:1)."""
from typing import Optional, Tuple, Union

import torch
from torch import Tensor

from ..utils import scatter
from .conv import MessagePassing
from .dense.linear import Linear  # noqa: F401


def group(xs, aggr):
    """HeteroConv per-dst-type grouping. Matches the version the reference
    was developed against (quoted verbatim in its own conv.py:17-31
    docstring): tuple outputs (attention-weight returns) pass through as the
    raw list; tensor outputs stack + reduce."""
    if len(xs) == 0:
        return None
    elif aggr is None:
        return torch.stack(xs, dim=1)
    elif len(xs) == 1:
        return xs[0]
    elif isinstance(xs[0], tuple):
        return xs
    else:
        out = torch.stack(xs, dim=0)
        out = getattr(torch, aggr)(out, dim=0)
        out = out[0] if isinstance(out, tuple) else out
        return out


class HeteroConv(torch.nn.Module):
    """Per-edge-type conv container (PyG semantics): bipartite relations get
    (x_src, x_dst) tuples; kwargs ending in '_dict' are routed per edge
    type; outputs grouped per destination type with `aggr`."""

    def __init__(self, convs: dict, aggr: Optional[str] = "sum"):
        super().__init__()
        self.convs = torch.nn.ModuleDict(
            {"__".join(k): v for k, v in convs.items()})
        self.aggr = aggr

    def forward(self, x_dict, edge_index_dict, **kwargs_dict):
        out_dict: dict = {}
        for edge_type, edge_index in edge_index_dict.items():
            src, rel, dst = edge_type
            str_edge_type = "__".join(edge_type)
            if str_edge_type not in self.convs:
                continue
            kwargs = {}
            for arg, value_dict in kwargs_dict.items():
                if not arg.endswith("_dict"):
                    raise ValueError(
                        "keyword arguments in HeteroConv need to end with "
                        "'_dict'")
                if edge_type in value_dict:
                    kwargs[arg[:-5]] = value_dict[edge_type]
            conv = self.convs[str_edge_type]
            if src == dst:
                out = conv(x_dict[src], edge_index, **kwargs)
            else:
                out = conv((x_dict[src], x_dict[dst]), edge_index, **kwargs)
            out_dict.setdefault(dst, []).append(out)
        return {k: group(v, self.aggr) for k, v in out_dict.items()}


class SAGEConv(MessagePassing):
    """PyG SAGEConv defaults: aggr='mean' over raw neighbor features,
    lin_l (with bias) on the aggregate, root transform lin_r without bias."""

    def __init__(self, in_channels: Union[int, Tuple[int, int]],
                 out_channels: int, aggr: str = "mean",
                 root_weight: bool = True, bias: bool = True, **kwargs):
        super().__init__(aggr=aggr, node_dim=0, **kwargs)
        if isinstance(in_channels, int):
            in_channels = (in_channels, in_channels)
        self.lin_l = Linear(in_channels[0], out_channels, bias=bias)
        self.lin_r = (Linear(in_channels[1], out_channels, bias=False)
                      if root_weight else None)

    def forward(self, x, edge_index, size=None):
        if isinstance(x, Tensor):
            x = (x, x)
        out = self.propagate(edge_index, x=x, size=size)
        out = self.lin_l(out)
        x_r = x[1]
        if self.lin_r is not None and x_r is not None:
            out = out + self.lin_r(x_r)
        return out

    def message(self, x_j: Tensor) -> Tensor:
        return x_j


class GCNConv(MessagePassing):
    """PyG GCNConv (normalize=True). Homogeneous input only — PyG raises on
    bipartite (x_src, x_dst) tuples, which means the reference's GCN
    backbone cannot run on hetero relations with src_type != dst_type."""

    def __init__(self, in_channels: int, out_channels: int,
                 add_self_loops: bool = True, bias: bool = True, **kwargs):
        super().__init__(aggr="add", node_dim=0, **kwargs)
        self.add_self_loops = add_self_loops
        self.lin = Linear(in_channels, out_channels, bias=False,
                          weight_initializer="glorot")
        if bias:
            self.bias = torch.nn.Parameter(torch.zeros(out_channels))
        else:
            self.register_parameter("bias", None)

    def _norm(self, edge_index, num_nodes, dtype):
        if self.add_self_loops:
            from ..utils import add_self_loops as asl

            edge_index, _ = asl(edge_index, num_nodes=num_nodes)
        row, col = edge_index[0], edge_index[1]
        ones = torch.ones(edge_index.size(1), dtype=dtype)
        deg = scatter(ones, col, dim=0, dim_size=num_nodes, reduce="sum")
        dis = deg.pow(-0.5)
        dis[dis == float("inf")] = 0
        return edge_index, dis[row] * dis[col]

    def forward(self, x, edge_index):
        if not isinstance(x, Tensor):
            raise ValueError("GCNConv does not support bipartite input")
        edge_index, norm = self._norm(edge_index, x.size(0), x.dtype)
        x = self.lin(x)
        out = self.propagate(edge_index, x=(x, x), norm=norm)
        if self.bias is not None:
            out = out + self.bias
        return out

    def message(self, x_j: Tensor, norm: Tensor) -> Tensor:
        return norm.view(-1, 1) * x_j


class SGConv(MessagePassing):
    """PyG SGConv, K=1 default: lin((D^-1/2 A D^-1/2) x). Homogeneous only,
    like GCNConv."""

    def __init__(self, in_channels: int, out_channels: int, K: int = 1,
                 add_self_loops: bool = True, bias: bool = True, **kwargs):
        super().__init__(aggr="add", node_dim=0, **kwargs)
        self.K = K
        self.add_self_loops = add_self_loops
        self.lin = Linear(in_channels, out_channels, bias=bias)

    def forward(self, x, edge_index):
        if not isinstance(x, Tensor):
            raise ValueError("SGConv does not support bipartite input")
        gcn = GCNConv.__new__(GCNConv)  # reuse the norm computation
        gcn.add_self_loops = self.add_self_loops
        edge_index, norm = GCNConv._norm(gcn, edge_index, x.size(0), x.dtype)
        for _ in range(self.K):
            x = self.propagate(edge_index, x=(x, x), norm=norm)
        return self.lin(x)

    def message(self, x_j: Tensor, norm: Tensor) -> Tensor:
        return norm.view(-1, 1) * x_j


def Sequential(*args, **kwargs):  # imported by reference model.py, never used
    raise NotImplementedError("pyg_shim: Sequential is a name-only stub")


def to_hetero(*args, **kwargs):  # imported by reference model.py, never used
    raise NotImplementedError("pyg_shim: to_hetero is a name-only stub")
