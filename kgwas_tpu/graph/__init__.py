from .schema import HeteroGraph, EdgeType, edge_key, parse_edge_key
from .transforms import to_undirected, add_self_loops, standard_kg_transforms
from .shard_compile import CompiledGraph, RelationShard, compile_graph
from .synthetic import (
    make_synthetic_kg,
    make_synthetic_sumstats,
    make_synthetic_ld_scores,
)
