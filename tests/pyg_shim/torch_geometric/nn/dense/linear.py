"""torch_geometric.nn.dense.Linear: weight [out, in] (y = x W^T + b), lazy
initialization when in_channels <= 0 (materialized on first forward — PyG's
(-1, -1) hetero idiom), weight_initializer='glorot' supported."""
import math
from typing import Optional

import torch
import torch.nn.functional as F

from ..inits import glorot, zeros


class Linear(torch.nn.Module):
    def __init__(self, in_channels: int, out_channels: int, bias: bool = True,
                 weight_initializer: Optional[str] = None,
                 bias_initializer: Optional[str] = None):
        super().__init__()
        self.in_channels = in_channels
        self.out_channels = out_channels
        self.weight_initializer = weight_initializer
        self.bias_initializer = bias_initializer

        if in_channels > 0:
            self.weight = torch.nn.Parameter(
                torch.empty(out_channels, in_channels))
        else:
            self.weight = None
        if bias:
            self.bias = torch.nn.Parameter(torch.empty(out_channels))
        else:
            self.register_parameter("bias", None)
        self.reset_parameters()

    def reset_parameters(self):
        if self.weight is None:
            return
        if self.weight_initializer == "glorot":
            glorot(self.weight)
        elif self.weight_initializer == "zeros":
            zeros(self.weight)
        else:  # PyG default: kaiming_uniform(fan=in, a=sqrt(5))
            torch.nn.init.kaiming_uniform_(self.weight, a=math.sqrt(5))
        if self.bias is not None:
            if self.bias_initializer == "zeros" or self.in_channels <= 0:
                zeros(self.bias)
            else:
                bound = 1.0 / math.sqrt(self.in_channels)
                torch.nn.init.uniform_(self.bias, -bound, bound)

    def forward(self, x: torch.Tensor) -> torch.Tensor:
        if self.weight is None:  # lazy materialization
            self.in_channels = x.size(-1)
            self.weight = torch.nn.Parameter(
                torch.empty(self.out_channels, self.in_channels))
            self.reset_parameters()
        return F.linear(x, self.weight, self.bias)

    def __repr__(self):
        return (f"Linear({self.in_channels}, {self.out_channels}, "
                f"bias={self.bias is not None})")
