"""shard_map'd merged GAT layer: the multi-chip version of the fused kernels.

The GSPMD path (parallel/shard.py) partitions the XLA segment ops
automatically but cannot partition Pallas kernels. This module hand-schedules
the merged per-dst-type layer (ops/pallas_gat_layer.py) over the 'data' mesh
axis:

  * kernel row tiles are split contiguously across devices (device d owns
    rows [d*rows_dev, (d+1)*rows_dev) of the merged row space) together with
    exactly the edges targeting those rows
  * halo exchange: each device all-gathers the projected source features
    xs_all over ICI (the standard 1-D row-sharded SpMM formulation), then
    runs the SAME single-device kernel on its local edge shard
  * backward: jax.lax.all_gather's transpose (psum_scatter) produces the
    d_xs reduction across devices automatically; the CSC scatter-add kernel
    runs per device over its local edge shard against the full source space

Per-device layouts are static numpy, built once (build_device_layouts).
"""
from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
try:
    from jax import shard_map
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map

from ..graph.merged_layout import MergedDstLayout
from ..ops.pallas_gat_layer import fused_gat_layer_t
from ..ops.pallas_segment import BE, BN, gather_rows_csc_t

TILE = BN


@dataclass
class DeviceMergedLayout:
    """Static per-device slices of a MergedDstLayout (leading axis = device)."""

    n_dev: int
    rows_per_dev: int            # rows owned per device
    e_dev: int                   # padded edges per device (common)
    src: np.ndarray              # int32 [n_dev, e_dev] (full src space ids)
    dst_local: np.ndarray        # int32 [n_dev, e_dev] (device-local rows)
    tile_starts: np.ndarray      # int32 [n_dev, tiles_per_dev + 1] (local)
    tile2rel: np.ndarray         # int32 [n_dev, tiles_per_dev]
    csc_perm: np.ndarray         # int32 [n_dev, e_dev]
    csc_ids: np.ndarray          # int32 [n_dev, e_dev]
    csc_offsets: np.ndarray      # int32 [n_dev, n_src_total + 1]
    n_src_total: int
    n_rows_total: int


def build_device_layouts(L: MergedDstLayout, n_dev: int) -> DeviceMergedLayout:
    n_tiles = L.n_rows_total // TILE
    assert n_tiles % n_dev == 0, (n_tiles, n_dev)
    tpd = n_tiles // n_dev
    rows_per_dev = L.n_rows_total // n_dev
    starts = L.row_offsets[::TILE]
    starts = np.concatenate([starts, L.row_offsets[-1:]])  # [n_tiles + 1]

    per_dev_edges = [
        int(starts[(d + 1) * tpd] - starts[d * tpd]) for d in range(n_dev)
    ]
    e_dev = max(max(per_dev_edges), BE)
    e_dev = ((e_dev + BE - 1) // BE) * BE

    src = np.zeros((n_dev, e_dev), dtype=np.int32)
    dst_local = np.full((n_dev, e_dev), rows_per_dev, dtype=np.int32)
    tile_starts = np.zeros((n_dev, tpd + 1), dtype=np.int32)
    tile2rel = np.zeros((n_dev, tpd), dtype=np.int32)
    csc_perm = np.zeros((n_dev, e_dev), dtype=np.int32)
    csc_ids = np.zeros((n_dev, e_dev), dtype=np.int32)
    csc_offsets = np.zeros((n_dev, L.n_src_total + 1), dtype=np.int32)

    for d in range(n_dev):
        lo, hi = int(starts[d * tpd]), int(starts[(d + 1) * tpd])
        e = hi - lo
        src[d, :e] = L.src[lo:hi]
        dst_local[d, :e] = L.dst[lo:hi] - d * rows_per_dev
        tile_starts[d] = starts[d * tpd : (d + 1) * tpd + 1] - lo
        # pads beyond e: extend the final tile's range? no — tile_starts covers
        # only real edges; pad rows of the edge arrays are never visited
        tile2rel[d] = L.tile2rel[d * tpd : (d + 1) * tpd]
        # per-device CSC over the full source space: pads keyed to the last
        # source row so they cluster at the tail
        key = np.full(e_dev, L.n_src_total - 1, dtype=np.int64)
        key[:e] = src[d, :e]
        perm = np.argsort(key, kind="stable").astype(np.int32)
        csc_perm[d] = perm
        csc_ids[d] = key[perm].astype(np.int32)
        counts = np.bincount(csc_ids[d].astype(np.int64),
                             minlength=L.n_src_total)
        np.cumsum(counts, out=csc_offsets[d, 1:])

    return DeviceMergedLayout(
        n_dev=n_dev,
        rows_per_dev=rows_per_dev,
        e_dev=e_dev,
        src=src,
        dst_local=dst_local,
        tile_starts=tile_starts,
        tile2rel=tile2rel,
        csc_perm=csc_perm,
        csc_ids=csc_ids,
        csc_offsets=csc_offsets,
        n_src_total=L.n_src_total,
        n_rows_total=L.n_rows_total,
    )


def make_sharded_merged_layer(
    mesh: Mesh,
    DL: DeviceMergedLayout,
    negative_slope: float,
    temperature: float,
    interpret: bool = False,
):
    """Returns f(xs_all_rowshard, att, a_dst_rowshard) -> out rowshard, where
    row-sharded args are split over the 'data' axis on axis 0.

    xs_all: [n_src_total, D] sharded by rows; att: [R, D] replicated;
    a_dst_all: [n_rows_total] sharded. Output [n_rows_total, D] sharded.
    Differentiable: all_gather's transpose psum-scatters d_xs automatically.
    """
    n_dev = DL.n_dev

    def body(xs_local, att, a_dst_local, src_d, dstl_d, ts_d, t2r_d,
             perm_d, ids_d, off_d):
        # halo exchange over ICI: every device needs all source rows
        xs_full = jax.lax.all_gather(xs_local, "data", axis=0, tiled=True)
        # [1, ...] leading device axis from sharded static arrays
        src = src_d[0]
        msgs = gather_rows_csc_t(
            xs_full, src, perm_d[0], ids_d[0], off_d[0],
            DL.n_src_total, interpret,
        )
        out_local = fused_gat_layer_t(
            msgs, att, a_dst_local, dstl_d[0], ts_d[0], t2r_d[0],
            DL.rows_per_dev, negative_slope, temperature, interpret,
        )
        return out_local

    # NOTE on gather_rows_csc/fused_gat_layer static args: numpy arrays are
    # fine inside shard_map (closed over as constants per device program) but
    # here they differ per device — pass them as sharded int arrays instead
    # and read the device-local slice ([0]) inside the body.
    def body_wrapped(xs_local, att, a_dst_local, src_d, dstl_d, ts_d, t2r_d,
                     perm_d, ids_d, off_d):
        return body(xs_local, att, a_dst_local, src_d, dstl_d, ts_d, t2r_d,
                    perm_d, ids_d, off_d)

    smapped = shard_map(
        body_wrapped,
        mesh=mesh,
        in_specs=(
            P("data"),       # xs rows
            P(),             # att replicated
            P("data"),       # a_dst rows
            P("data"),       # per-device layout arrays (leading axis)
            P("data"),
            P("data"),
            P("data"),
            P("data"),
            P("data"),
            P("data"),
        ),
        out_specs=P("data"),
        check_vma=False,
    )

    layout_args = tuple(
        jnp.asarray(a)
        for a in (DL.src, DL.dst_local, DL.tile_starts, DL.tile2rel,
                  DL.csc_perm, DL.csc_ids, DL.csc_offsets)
    )

    def f(xs_all, att, a_dst_all):
        return smapped(xs_all, att, a_dst_all, *layout_args)

    return f


def sharded_merged_eligible(meta: dict, mesh: Mesh) -> bool:
    """True when every merged dst-type layout splits evenly over the mesh's
    'data' axis (tiles divisible by n_dev) and no tensor-parallel 'model'
    axis is in play (the fused kernels own the full feature dim)."""
    merged = meta.get("merged")
    if not merged:
        return False
    if mesh.shape.get("model", 1) != 1:
        return False
    n_dev = mesh.shape["data"]
    for L in merged.values():
        if (L.n_rows_total // TILE) % n_dev != 0:
            return False
        if L.n_src_total % n_dev != 0:
            return False
    return True


def make_sharded_merged_kernel_fns(
    mesh: Mesh,
    meta: dict,
    negative_slope: float,
    temperature: float,
    interpret: bool = False,
) -> dict:
    """dst_type -> shard_map'd merged-layer kernel, pluggable into
    models.hetero_gnn.apply_merged_gat_layer(merged_kernel_fns=...). Builds
    the static per-device layouts once per mesh size."""
    n_dev = mesh.shape["data"]
    fns = {}
    for dst_t, L in meta["merged"].items():
        DL = build_device_layouts(L, n_dev)
        fns[dst_t] = make_sharded_merged_layer(
            mesh, DL, negative_slope, temperature, interpret
        )
    return fns
