"""attention_tables parity vs a naive global-drop_duplicates oracle
(reference kgwas/utils.py:437-494 tail), on graphs WITH parallel edges.

Locks two paths to identical outputs:
- the per-group packed-int64 dedup fast path (rel names unique), and
- the global drop_duplicates fallback (duplicate rel names across keys —
  including a duplicate name that appears only via a non-layer-0 key set,
  the gate the advisor flagged).
"""
import dataclasses

import jax
import numpy as np
import pandas as pd

from kgwas_tpu.config import ModelConfig
from kgwas_tpu.graph import compile_graph, make_synthetic_kg
from kgwas_tpu.interpret.attention import attention_tables
from kgwas_tpu.models import apply_collect_attention, init_hetero_gnn


def _naive_tables(params, cfg, meta, arrays, relations):
    """Literal restatement of the reference tail: per-(relation, layer)
    object-dtype frames, pd.concat, one GLOBAL drop_duplicates."""
    layers = apply_collect_attention(params, cfg, meta, arrays, raw=True)
    frames = []
    for li, alphas in enumerate(layers):
        for rk, alpha in alphas.items():
            rel = relations[rk]
            e = rel.num_edges
            a = np.asarray(alpha)[:e]
            if a.ndim == 2:
                a = a.mean(axis=1)
            frames.append(
                pd.DataFrame(
                    {
                        "h_idx": rel.src[:e].astype(np.int64),
                        "t_idx": rel.dst[:e].astype(np.int64),
                        "weight": a.astype(np.float64),
                        "h_type": rel.src_type,
                        "rel_type": rel.rel,
                        "t_type": rel.dst_type,
                        "layer": f"l{li + 1}",
                    }
                )
            )
    df = pd.concat(frames, ignore_index=True)
    return df.drop_duplicates(["h_idx", "t_idx", "rel_type", "layer"])


def _graph_with_parallel_edges(seed=0):
    g = make_synthetic_kg(n_snp=30, n_gene=12, n_go=6, seed=seed)
    et = next(iter(g.edge_index))
    ei = g.edge_index[et]
    dup = ei[:, : max(3, ei.shape[1] // 4)]
    g.edge_index[et] = np.concatenate([ei, dup], axis=1)
    return g


def _assert_tables_equal(got, want):
    key = ["layer", "rel_type", "h_type", "t_type", "h_idx", "t_idx"]
    frames = []
    for df in (got, want):
        df = df.copy()
        for c in ["h_type", "rel_type", "t_type", "layer"]:
            df[c] = df[c].astype(str)
        frames.append(df.sort_values(key).reset_index(drop=True))
    got, want = frames
    assert len(got) == len(want)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def _setup(seed):
    g = _graph_with_parallel_edges(seed=seed)
    cg = compile_graph(g)
    cfg = ModelConfig(gnn_hidden_dim=8, gnn_num_layers=2)
    meta = cg.meta()
    params = init_hetero_gnn(jax.random.PRNGKey(seed), cfg, meta, 20, 32, 16)
    return cg, cfg, meta, params


def test_attention_tables_match_global_dedup_fast_path():
    cg, cfg, meta, params = _setup(0)
    arrays = cg.arrays()
    got = attention_tables(params, cfg, meta, arrays, cg.relations)
    want = _naive_tables(params, cfg, meta, arrays, cg.relations)
    # fast path must have actually deduped the injected parallel edges
    assert not got.duplicated(["h_idx", "t_idx", "rel_type", "layer"]).any()
    _assert_tables_equal(got, want)


def test_attention_tables_duplicate_rel_names_fallback():
    cg, cfg, meta, params = _setup(1)
    arrays = cg.arrays()
    rels = dict(cg.relations)
    keys = sorted(rels)
    # two different relation KEYS carrying the same rel NAME: the per-group
    # fast path would be wrong here, so the global fallback must engage
    rels[keys[1]] = dataclasses.replace(rels[keys[1]], rel=rels[keys[0]].rel)
    got = attention_tables(params, cfg, meta, arrays, rels)
    want = _naive_tables(params, cfg, meta, arrays, rels)
    _assert_tables_equal(got, want)
