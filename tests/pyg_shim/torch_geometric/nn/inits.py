"""torch_geometric.nn.inits: glorot / zeros (PyG semantics: fan from the
last two dims; in-place; None tolerated)."""
import math

import torch


def glorot(value):
    if value is None:
        return
    if isinstance(value, torch.nn.Parameter) or isinstance(value, torch.Tensor):
        stdv = math.sqrt(6.0 / (value.size(-2) + value.size(-1)))
        value.data.uniform_(-stdv, stdv)


def zeros(value):
    if value is not None:
        value.data.fill_(0.0)


def ones(value):
    if value is not None:
        value.data.fill_(1.0)
