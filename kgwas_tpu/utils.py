"""Shared utilities (host-side): logging, pickle IO, metrics.

Mirrors the semantics of reference kgwas/utils.py:20-45,181-233 without torch.
"""
from __future__ import annotations

import os
import pickle
import sys

import numpy as np


def print_sys(s):
    """stderr logging (reference kgwas/utils.py:227-233)."""
    print(s, flush=True, file=sys.stderr)


_CACHE_ENABLED = False


def enable_persistent_compilation_cache(path=None):
    """Point XLA's persistent compilation cache at a local directory so
    repeat runs skip the 1-4 min first-compile of the training step.

    OPT-IN since round 5 (KGWAS_TPU_CACHE_DIR must be set): XLA:CPU AOT
    artifacts cached under one machine-feature set segfault when LOADED
    on a host whose features differ (cpu_aot_loader warns about exactly
    this, and two full-suite runs crashed inside
    backend_compile_and_load on cache hits). On the relayed TPU the
    cache was measured ineffective anyway (compiles are server-side,
    benchmarks/RESULTS.md round 4), so the default is now off."""
    global _CACHE_ENABLED
    if _CACHE_ENABLED:
        return
    if path is None:
        path = os.environ.get("KGWAS_TPU_CACHE_DIR", "")
    if not path:
        return
    try:
        import jax

        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        # Cache everything that took meaningful compile time; tiny programs
        # aren't worth the disk round trip.
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        _CACHE_ENABLED = True
    except Exception:  # cache flags unavailable or dir not writable
        pass


def save_dict(path, obj):
    with open(path, "wb") as f:
        pickle.dump(obj, f, pickle.HIGHEST_PROTOCOL)


def load_dict(path):
    with open(path, "rb") as f:
        return pickle.load(f)


def compute_metrics(results: dict, binary=False, coverage=None,
                    uncertainty_reg=1, loss_fct=None) -> dict:
    """MSE + Pearson r on pred/truth arrays (reference kgwas/utils.py:41-45).
    Extra args accepted for reference signature parity; unused there too."""
    from scipy.stats import pearsonr

    pred = np.asarray(results["pred"], dtype=np.float64)
    truth = np.asarray(results["truth"], dtype=np.float64)
    mse = float(np.mean((pred - truth) ** 2))
    if np.std(pred) == 0 or np.std(truth) == 0:
        r = float("nan")
    else:
        r = float(pearsonr(pred, truth)[0])
    return {"mse": mse, "pearsonr": r}


def find_nearest(array, value):
    """reference kgwas/utils.py:313-316."""
    array = np.asarray(array)
    idx = (np.abs(array - value)).argmin()
    return array[idx]


def flatten(list_of_lists):
    return [item for sublist in list_of_lists for item in sublist]


def ensure_dir(path):
    os.makedirs(path, exist_ok=True)
    return path


def find_connected_components_details(edges):
    """Connected components with per-component node and edge lists
    (reference kgwas/utils.py:353-390), iterative DFS."""
    graph = {}
    for u, v in edges:
        graph.setdefault(u, []).append(v)
        graph.setdefault(v, []).append(u)

    def dfs(vertex):
        visited_nodes = set()
        visited_edges = set()
        stack = [vertex]
        while stack:
            current = stack.pop()
            if current in visited_nodes:
                continue
            visited_nodes.add(current)
            for neighbor in graph[current]:
                stack.append(neighbor)
                if (current, neighbor) not in visited_edges and (
                    neighbor,
                    current,
                ) not in visited_edges:
                    visited_edges.add((current, neighbor))
        return list(visited_nodes), list(visited_edges)

    visited = set()
    components = []
    for vertex in graph:
        if vertex not in visited:
            nodes, comp_edges = dfs(vertex)
            components.append({"nodes": nodes, "edges": comp_edges})
            visited.update(nodes)
    return components
