"""Graph schema, transforms (PyG-semantics), and shard compiler tests."""
import numpy as np
import pytest

from kgwas_tpu.graph import (
    HeteroGraph,
    add_self_loops,
    compile_graph,
    edge_key,
    make_synthetic_kg,
    standard_kg_transforms,
    to_undirected,
)
from kgwas_tpu.graph.transforms import coalesce


def tiny_graph():
    g = HeteroGraph()
    g.node_features["SNP"] = np.zeros((4, 3), dtype=np.float32)
    g.node_features["Gene"] = np.zeros((3, 2), dtype=np.float32)
    g.edge_index[("SNP", "TSS", "Gene")] = np.array([[0, 1, 2], [0, 1, 2]])
    g.edge_index[("Gene", "Gene-PPI-Gene", "Gene")] = np.array([[0, 1, 0], [1, 2, 1]])
    return g


def test_coalesce_dedupes_and_sorts():
    ei = np.array([[1, 0, 1, 0], [0, 2, 0, 2]])
    out = coalesce(ei, 3, 3)
    assert out.shape == (2, 2)
    assert out.tolist() == [[0, 1], [2, 0]]


def test_to_undirected_bipartite_creates_rev():
    g = to_undirected(tiny_graph())
    assert ("Gene", "rev_TSS", "SNP") in g.edge_index
    rev = g.edge_index[("Gene", "rev_TSS", "SNP")]
    orig = g.edge_index[("SNP", "TSS", "Gene")]
    assert np.array_equal(rev, orig[::-1])


def test_to_undirected_homogeneous_symmetrizes_in_place():
    g = to_undirected(tiny_graph())
    assert ("Gene", "rev_Gene-PPI-Gene", "Gene") not in g.edge_index
    ppi = g.edge_index[("Gene", "Gene-PPI-Gene", "Gene")]
    # edges {(0,1),(1,2),(0,1)} + flipped {(1,0),(2,1),(1,0)} -> dedup = 4
    assert ppi.shape[1] == 4
    s = set(map(tuple, ppi.T.tolist()))
    assert s == {(0, 1), (1, 0), (1, 2), (2, 1)}


def test_add_self_loops_homogeneous_only():
    g = add_self_loops(to_undirected(tiny_graph()))
    ppi = g.edge_index[("Gene", "Gene-PPI-Gene", "Gene")]
    assert ppi.shape[1] == 4 + 3  # 3 self loops appended
    tss = g.edge_index[("SNP", "TSS", "Gene")]
    assert tss.shape[1] == 3  # bipartite untouched


def test_synthetic_kg_valid_and_has_rev():
    g = make_synthetic_kg(n_snp=50, n_gene=20, n_go=10, seed=1)
    assert ("Gene", "rev_TSS", "SNP") in g.edge_index
    assert ("Gene", "rev_Enhancer-eQTL-Gene", "SNP") in g.edge_index
    g.validate()


def test_compile_graph_layout():
    g = standard_kg_transforms(tiny_graph())
    cg = compile_graph(g, edge_pad_multiple=8, node_pad_multiple=8)
    for k, r in cg.relations.items():
        # dst ascending, pads at the tail pointing at the trash row
        assert np.all(np.diff(r.dst) >= 0)
        trash = cg.num_nodes[r.dst_type]
        assert np.all(r.dst[r.num_edges:] == trash)
        assert r.src.dtype == np.int32 and r.dst.dtype == np.int32
        # CSR offsets consistent
        assert r.row_offsets[-1] == len(r.dst)
        counts = np.diff(r.row_offsets)
        assert counts.sum() == len(r.dst)
    # padded node arrays strictly larger than real count (trash row exists)
    for t in cg.num_nodes:
        assert cg.padded_nodes[t] > cg.num_nodes[t]
        assert cg.node_x[t].shape[0] == cg.padded_nodes[t]


def test_compile_preserves_edge_multiset():
    g = make_synthetic_kg(n_snp=40, n_gene=15, n_go=8, seed=3)
    cg = compile_graph(g)
    for et in g.edge_types:
        r = cg.relations[edge_key(et)]
        orig = set(zip(g.edge_index[et][0].tolist(), g.edge_index[et][1].tolist()))
        compiled = set(
            zip(r.src[: r.num_edges].tolist(), r.dst[: r.num_edges].tolist())
        )
        assert orig == compiled


def test_validate_catches_out_of_range():
    g = tiny_graph()
    g.edge_index[("SNP", "TSS", "Gene")] = np.array([[0], [99]])
    with pytest.raises(ValueError):
        g.validate()
