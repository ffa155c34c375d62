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
    import jax.numpy as jnp

    layers = apply_collect_attention(params, model_cfg, meta, arrays, raw=True)

    # parallel-edge dedup (reference utils.py:493 drop_duplicates) done
    # per (relation, layer) group with a packed-int64 numpy key keeping the
    # FIRST occurrence — a global pandas drop_duplicates over the full
    # mixed-dtype table was 20+ s of the measured 33 s at 200k-SNP scale
    # (scripts/exp_interpret_bench.py). Per-group dedup is equivalent only
    # when rel_type strings are unique across the UNION of all layers'
    # relation keys; the rare collision case falls back to the global pass.
    all_keys: set = set()
    for alphas in layers:
        all_keys.update(alphas.keys())
    rel_names = [relations[rk].rel for rk in all_keys]
    names_unique = len(set(rel_names)) == len(rel_names)

    # ONE dispatch + ONE batched device->host transfer: slice off edge
    # padding, head-mean, and concat fused under a single jit, then a single
    # host read. The previous form did one np.asarray per (relation, layer)
    # — 60 transfers of PADDED arrays — and even eager per-relation
    # slice/mean ops cost ~19 s of relay round-trips at 200k-SNP scale.
    specs = [(li, rk, relations[rk].num_edges)
             for li, alphas in enumerate(layers) for rk in alphas]
    if not specs:
        return pd.DataFrame(
            columns=["h_idx", "t_idx", "weight", "h_type", "rel_type",
                     "t_type", "layer"]
        )

    import jax

    def _flatten(layer_list):
        chunks = []
        for li, rk, e in specs:
            a = layer_list[li][rk][:e]
            if a.ndim == 2:  # [E, H] -> mean over heads (reference is H=1)
                a = a.mean(axis=1)
            chunks.append(a.astype(jnp.float32))
        return jnp.concatenate(chunks)

    flat_w = np.asarray(jax.jit(_flatten)(layers), dtype=np.float64)

    # numpy-native assembly: index/weight columns concatenated once; the
    # four constant-per-group string columns become categoricals built from
    # np.repeat'ed codes (no object-dtype intermediate frames, no pd.concat).
    hs, ts, ws = [], [], []
    groups = []  # (h_type, rel, t_type, layer_name, rows)
    off = 0
    for li, rk, e in specs:
        rel = relations[rk]
        a = flat_w[off:off + e]
        off += e
        h = rel.src[:e].astype(np.int64)
        t = rel.dst[:e].astype(np.int64)
        if names_unique:
            _, first = np.unique((h << 32) | t, return_index=True)
            first.sort()  # drop_duplicates keeps first, original order
            h, t, a = h[first], t[first], a[first]
        hs.append(h)
        ts.append(t)
        ws.append(a)
        groups.append((rel.src_type, rel.rel, rel.dst_type, f"l{li + 1}",
                       len(h)))

    lengths = np.array([g[4] for g in groups], dtype=np.int64)

    def _cat(col: int) -> pd.Categorical:
        vals = [g[col] for g in groups]
        cats = list(dict.fromkeys(vals))
        idx = {v: i for i, v in enumerate(cats)}
        codes = np.repeat(
            np.array([idx[v] for v in vals], dtype=np.int32), lengths
        )
        return pd.Categorical.from_codes(codes, categories=cats)

    df = pd.DataFrame(
        {
            "h_idx": np.concatenate(hs),
            "t_idx": np.concatenate(ts),
            "weight": np.concatenate(ws),
            "h_type": _cat(0),
            "rel_type": _cat(1),
            "t_type": _cat(2),
            "layer": _cat(3),
        }
    )
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
