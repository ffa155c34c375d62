"""Attention-weight export: model -> per-edge weight table.

Mirror of reference kgwas/utils.py:437-494 (get_network_weight). The
reference re-runs encoder MLPs + convs on CPU with a monkey-patched PyG
HeteroConv to extract raw attention; here it's a first-class forward mode
(models/hetero_gnn.apply_collect_attention) running jitted on device, with
the same two quirks preserved: raw (pre-softmax) alpha weights the messages,
and no inter-layer ReLU on this path.
"""
from __future__ import annotations

import numpy as np
import pandas as pd

from ..models.hetero_gnn import apply_collect_attention
from ..utils import print_sys


def attention_tables(params, model_cfg, meta, arrays, relations) -> pd.DataFrame:
    """Run the interpretation forward and produce the edge-weight DataFrame
    with columns h_idx, t_idx, weight, h_type, rel_type, t_type, layer."""
    layers = apply_collect_attention(params, model_cfg, meta, arrays, raw=True)

    # parallel-edge dedup (reference utils.py:493 drop_duplicates) done
    # per (relation, layer) group with a packed-int64 numpy key keeping the
    # FIRST occurrence — a global pandas drop_duplicates over the full
    # mixed-dtype table was 20+ s of the measured 33 s at 200k-SNP scale
    # (scripts/exp_interpret_bench.py). Per-group dedup is equivalent when
    # rel_type strings are unique per group; the rare collision case falls
    # back to the global pass.
    frames = []
    rel_names = [relations[rk].rel for rk in
                 (layers[0].keys() if layers else [])]
    names_unique = len(set(rel_names)) == len(rel_names)
    for li, alphas in enumerate(layers):
        layer_name = f"l{li + 1}"
        for rk, alpha in alphas.items():
            rel = relations[rk]
            e = rel.num_edges
            a = np.asarray(alpha)[:e]
            if a.ndim == 2:  # [E, H] -> mean over heads (reference is H=1)
                a = a.mean(axis=1)
            h = rel.src[:e].astype(np.int64)
            t = rel.dst[:e].astype(np.int64)
            if names_unique:
                _, first = np.unique((h << 32) | t, return_index=True)
                first.sort()  # drop_duplicates keeps first, original order
                h, t, a = h[first], t[first], a[first]
            frames.append(
                pd.DataFrame(
                    {
                        "h_idx": h,
                        "t_idx": t,
                        "weight": a.astype(np.float64),
                        "h_type": rel.src_type,
                        "rel_type": rel.rel,
                        "t_type": rel.dst_type,
                        "layer": layer_name,
                    }
                )
            )
    df = pd.concat(frames, ignore_index=True)
    if not names_unique:  # reference dedupes parallel edges (utils.py:493)
        df = df.drop_duplicates(["h_idx", "t_idx", "rel_type", "layer"])
    return df


def get_network_weight(run, data) -> pd.DataFrame:
    """run: a KGWAS engine with best_params/model_cfg/meta."""
    import jax

    print_sys("Retrieving weights...")
    cg = data.compile()
    arrays = jax.device_put(cg.arrays())
    return attention_tables(
        run.best_params, run.model_cfg, run.meta, arrays, cg.relations
    )
