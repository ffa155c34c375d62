"""Type aliases mirroring torch_geometric.typing."""
from typing import Optional, Tuple, Union

from torch import Tensor

NoneType = type(None)
Adj = Union[Tensor, "SparseTensor"]  # noqa: F821 — SparseTensor lives in torch_sparse
OptTensor = Optional[Tensor]
OptPairTensor = Tuple[Tensor, Optional[Tensor]]
PairTensor = Tuple[Tensor, Tensor]
Size = Optional[Tuple[int, int]]
