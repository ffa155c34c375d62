from .mlp import init_mlp, apply_mlp
from .convs import (
    init_gat,
    apply_gat,
    init_sage,
    apply_sage,
    init_gcn,
    apply_gcn,
    init_sgc,
    apply_sgc,
)
from .hetero_gnn import (
    init_hetero_gnn,
    apply_hetero_gnn,
    apply_hetero_layer,
    apply_collect_attention,
    apply_encoders,
    GO_TYPES,
)
