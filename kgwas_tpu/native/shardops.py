"""shardops: edge sorting / CSR building, native-accelerated with numpy fallback."""
from __future__ import annotations

import numpy as np

try:
    from . import _shardops as _C  # type: ignore

    HAVE_NATIVE = True
except ImportError:  # pragma: no cover - exercised when ext not built
    _C = None
    HAVE_NATIVE = False


def sort_edges_by_dst(src: np.ndarray, dst: np.ndarray):
    """Stable-sort the COO edge list by destination. Returns (src, dst) int64.

    Stability preserves the reference's within-destination edge order, which
    matters for bitwise-reproducible float accumulation order in tests.
    """
    src = np.ascontiguousarray(src, dtype=np.int64)
    dst = np.ascontiguousarray(dst, dtype=np.int64)
    if HAVE_NATIVE:
        return _C.sort_edges_by_dst(src, dst)
    order = np.argsort(dst, kind="stable")
    return src[order], dst[order]


def build_csr_offsets(sorted_dst: np.ndarray, num_rows: int) -> np.ndarray:
    """CSR row offsets [num_rows+1] from an ascending destination array."""
    sorted_dst = np.ascontiguousarray(sorted_dst, dtype=np.int64)
    if HAVE_NATIVE:
        return _C.build_csr_offsets(sorted_dst, int(num_rows))
    counts = np.bincount(sorted_dst, minlength=num_rows)
    if len(counts) > num_rows:
        raise ValueError("dst index exceeds num_rows")
    offsets = np.zeros(num_rows + 1, dtype=np.int64)
    np.cumsum(counts, out=offsets[1:])
    return offsets


def coalesce_edges(src: np.ndarray, dst: np.ndarray, num_dst: int):
    """Sort by (src, dst) and drop duplicate edges. Returns (src, dst) int64."""
    src = np.ascontiguousarray(src, dtype=np.int64)
    dst = np.ascontiguousarray(dst, dtype=np.int64)
    if HAVE_NATIVE:
        return _C.coalesce_edges(src, dst, int(num_dst))
    key = src * int(num_dst) + dst
    order = np.argsort(key, kind="stable")
    key_sorted = key[order]
    keep = np.ones(len(key_sorted), dtype=bool)
    if len(keep):
        keep[1:] = key_sorted[1:] != key_sorted[:-1]
    sel = order[keep]
    return src[sel], dst[sel]
