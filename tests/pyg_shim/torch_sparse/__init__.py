"""torch_sparse shim: the reference imports SparseTensor/set_diag
(kgwas/conv.py:7) but the KGWAS pipeline only ever passes [2, E] Tensor
edge indices, so these exist for isinstance checks / import success only."""


class SparseTensor:  # never instantiated by the KGWAS call paths
    def __init__(self, *a, **k):
        raise NotImplementedError("pyg_shim: SparseTensor is a stub")


def set_diag(*a, **k):
    raise NotImplementedError("pyg_shim: set_diag is a stub")
