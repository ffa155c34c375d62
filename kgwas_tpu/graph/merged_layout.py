"""Merged per-destination-type edge layout for the fused GAT layer kernel.

The per-relation execution pays fixed costs (kernel launches, gathers, XLA
glue) ~30x per layer. This layout batches every relation targeting the same
destination node type into ONE edge stream per type:

  * row space = concatenation of each relation's padded dst row block
    (rel slot r owns rows [r*N_pad, (r+1)*N_pad)) — per-relation softmax
    segments never cross relation boundaries, and since N_pad % 256 == 0,
    every 256-row kernel tile belongs to exactly ONE relation (tile2rel)
  * edge stream = concatenation of the per-relation dst-sorted streams;
    src indices offset into the concatenated projected-feature space
    xs_all = concat([x_srctype @ W_r for r in relations])
  * the hetero 'sum' aggregation collapses to
    out_all.reshape(R, N_pad, D).sum(0) — a dense reduction
  * merged CSC over the concatenated source space drives the Pallas
    scatter-add transpose of the single merged gather

Everything here is static numpy, built once at shard-compile time.
"""
from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Dict, List

import numpy as np

from .shard_compile import CompiledGraph, RelationShard


@dataclass
class MergedDstLayout:
    """Merged layout for one destination node type."""

    dst_type: str
    rel_keys: List[str]            # relation order (slot r)
    src_types: List[str]           # per slot
    n_rows_per_rel: int            # N_dst_pad (same for all slots)
    n_rows_total: int              # R * N_dst_pad
    # edge stream (concatenated, per-relation dst-sorted)
    src: np.ndarray                # int32 [E_tot] into concat src space
    dst: np.ndarray                # int32 [E_tot] into concat row space
    row_offsets: np.ndarray        # int32 [n_rows_total + 1]
    tile2rel: np.ndarray           # int32 [n_rows_total / 256] tile -> slot
    num_edges: int                 # total real edges
    # concat src space: slot r owns rows [src_base[r], src_base[r+1])
    src_base: np.ndarray           # int32 [R + 1]
    n_src_total: int
    # CSC (source-sorted) over the concat src space
    csc_perm: np.ndarray           # int32 [E_tot]
    csc_ids: np.ndarray            # int32 [E_tot]
    csc_offsets: np.ndarray        # int32 [n_src_total + 1]
    # per-relation edge slices in the merged stream
    edge_base: np.ndarray          # int32 [R + 1]
    # dst-range SUB-layout bookkeeping (split_merged_layout): sub-layouts
    # cover dst node rows [node_base, node_base + n_rows_per_rel) of
    # base_type's padded node space; base_type is None for whole groups
    base_type: "str | None" = None
    node_base: int = 0


@dataclass(eq=False)  # identity compare: instances are passed as static
class ChunkedStreamLayout:     # args through custom-VJP boundaries
    """Source-chunked reordering of a MergedDstLayout's edge stream.

    XLA's TPU row-gather emitter is ~3.4 ns/row when the table operand is
    <= 32k rows but ~11.5 ns/row above (scripts/exp_gather.py --curve) — and
    the training step is gather-bound (benchmarks/RESULTS.md). This layout
    reorders the merged edge stream to (src_chunk major, dst_tile minor) so
    the [E, D] message gather decomposes into one fast `jnp.take` per
    <=chunk_rows-row table chunk with CONTIGUOUS output (concat = stream).

    The fused kernel consumes the reordered stream via per-tile window
    descriptors: each 256-row dst tile's edges now live in up to n_chunks
    contiguous fragments; windows of `be` edges cover the fragments
    (LANE-aligned starts, deduped per tile so tile windows never overlap
    each other), and the kernel's one-hot dst masking makes overreads into
    neighboring fragments harmless. Within a tile the online softmax is
    order-invariant, so fragment order needs no kernel math changes. The
    backward write-merges per window with a dst-ownership column mask
    (onehot^T @ 1), so no positional ownership metadata is needed.
    """

    n_chunks: int
    src_bounds: np.ndarray     # int64 [n_chunks+1] concat-space row cuts
                               # (relation-aligned: each chunk lies inside
                               # exactly one relation slot's block)
    order: np.ndarray          # int32 [E_tot]: new stream pos -> old pos
    src: np.ndarray            # int32 [E_tot] concat-space src, new order
    dst: np.ndarray            # int32 [E_tot] row ids, new order
    chunk_edge_base: np.ndarray  # int64 [n_chunks+1] stream offsets per chunk
    local_ids: List[np.ndarray]  # per chunk: src - src_bounds[c]
    desc: np.ndarray           # int32 [ND] window start positions
    desc_offsets: np.ndarray   # int32 [n_tiles+1] per-tile desc ranges
    # CSC permutation over the new stream order (backward scatter path);
    # csc_ids/csc_offsets are unchanged from the parent layout
    csc_perm: np.ndarray       # int32 [E_tot] new-order positions, src-sorted
    # Block-diagonal split of csc_perm: because the stream is chunk-major
    # over CONTIGUOUS src ranges, CSC (globally src-sorted) positions for
    # chunk c are exactly [chunk_edge_base[c], chunk_edge_base[c+1]) and
    # point only into that chunk's stream block — so the backward's [E, D]
    # cotangent permute decomposes into per-chunk small-table takes on the
    # fast emitter, same trick as the forward.
    local_perm: List[np.ndarray]  # per chunk: csc_perm slice - edge base
    read_amp: float            # diagnostic: window rows / real stream rows
    # fragment-padded variant (v3): every (chunk, tile) fragment is padded
    # to a BE multiple with sentinel edges (dst = n_rows_total, owned by no
    # tile), so every BE window is FULLY owned by its tile — the backward
    # kernel can write dmsgs windows blind, dropping the read-modify-write
    # stream and the ownership select. When True, len(src) == padded stream
    # length, chunk_edge_base holds PADDED block boundaries, local_ids have
    # padded length (sentinels gather an arbitrary in-chunk row), and
    # local_perm values index into the padded blocks (real edges only).
    fully_owned: bool = False
    num_real_edges: int = 0    # real (unpadded) stream rows


# Largest table the fast XLA gather emitter handles: measured ~3.7 ns/row
# up to 131072 rows, ~11.4 ns/row from 262144 (scripts/exp_emitter_probe.py,
# v5e). Chunk EDGE counts are capped by the same number so the backward's
# per-chunk cotangent tables (see local_perm) also ride the fast emitter.
EMITTER_FAST_ROWS = 131072

# Max tolerated stream amplification (padded/window rows over real edges)
# for the chunked gathered path. Groups over the cap (e.g. the 2M-SNP dst
# group: ~7.8k dst tiles x hundreds of chunks, a few edges per fragment,
# 32x once BE-padded) fall back to the plain/owned paths in
# models.hetero_gnn.apply_merged_gat_layer. Mirrors the 1.5 guard on the
# window/owned-plain layouts.
CHUNK_READ_AMP_MAX = 1.5


def _chunk_bounds(L: MergedDstLayout, max_chunk_rows: int,
                  max_chunk_edges: int = EMITTER_FAST_ROWS) -> np.ndarray:
    """Relation-aligned chunk cuts: each relation slot's src block is split
    greedily into 256-aligned pieces of <= max_chunk_rows src rows AND
    <= max_chunk_edges edges (both caps keep the forward table takes and
    the backward per-chunk perm takes on the fast gather emitter), so every
    chunk's table is a slice of ONE relation's projected features."""
    csc_off = np.asarray(L.csc_offsets, dtype=np.int64)
    bounds = [0]
    for r in range(len(L.rel_keys)):
        b0, b1 = int(L.src_base[r]), int(L.src_base[r + 1])
        start = b0
        while start < b1:
            nxt = min(start + max_chunk_rows, b1)
            if csc_off[nxt] - csc_off[start] > max_chunk_edges:
                # largest 256-aligned cut with <= max_chunk_edges edges
                hi = int(np.searchsorted(
                    csc_off, csc_off[start] + max_chunk_edges, side="right"
                )) - 1
                nxt = max(start + 256, ((hi - start) // 256) * 256 + start)
                nxt = min(nxt, b1)
            if nxt > bounds[-1]:
                bounds.append(nxt)
            start = nxt
        if b1 > bounds[-1]:
            bounds.append(b1)
    return np.asarray(bounds, dtype=np.int64)


def _build_windows(go: np.ndarray, n_chunks: int, n_tiles: int, be: int,
                   lane: int):
    """Per-tile BE-edge window descriptors over a (chunk major, tile minor)
    grouped stream. go: [n_chunks*n_tiles+1] group boundary positions.
    Invariant: every stream position is covered by EXACTLY ONE window of
    its own tile (LANE-aligned starts; a window overrunning a later
    fragment of the same tile suppresses that fragment's own windows)."""
    desc_parts = []
    off = np.zeros(n_tiles + 1, dtype=np.int64)
    for t in range(n_tiles):
        covered = 0
        wins = []
        for c in range(n_chunks):
            s = go[c * n_tiles + t]
            e = go[c * n_tiles + t + 1]
            if e <= s:
                continue
            w = max((s // lane) * lane, covered)
            while w < e:
                wins.append(w)
                w += be
            covered = max(covered, w)
        desc_parts.append(np.asarray(wins, dtype=np.int64))
        off[t + 1] = off[t] + len(wins)
    desc = (np.concatenate(desc_parts) if desc_parts
            else np.zeros(0, dtype=np.int64))
    return desc, off


def build_chunked_stream(L: MergedDstLayout,
                         max_chunk_rows: int = EMITTER_FAST_ROWS,
                         be: int = None, lane: int = 128,
                         tile_rows: int = None,
                         max_chunk_edges: int = EMITTER_FAST_ROWS,
                         pad_fragments: bool = False
                         ) -> ChunkedStreamLayout:
    """Build the (src_chunk, dst_tile)-ordered stream for one merged layout.

    Window invariant: every edge position is covered by EXACTLY ONE window
    of its own tile. Windows of one tile are non-overlapping and increasing
    (a window may overrun into foreign fragments — masked by dst in-kernel;
    if the overrun covers a later fragment of the SAME tile, that fragment
    emits no window of its own). Windows of different tiles may overlap.

    pad_fragments=True builds the fully-owned (v3) variant: fragments are
    BE-padded with sentinel edges so every window is fully owned by its
    tile (see ChunkedStreamLayout.fully_owned). The per-chunk backward
    cotangent tables then hold PADDED block lengths, so the edge cap is
    iteratively tightened until the largest padded block fits
    max_chunk_edges (keeps the backward takes on the fast gather emitter).
    """
    if be is None:
        from ..ops.pallas_segment import BE as be
    if tile_rows is None:
        from ..ops.pallas_segment import BN as tile_rows
    cap = max_chunk_edges
    for _ in range(4):
        out = _build_chunked_stream_once(
            L, max_chunk_rows, be, lane, tile_rows, cap, pad_fragments)
        if not pad_fragments:
            return out
        pceb = np.asarray(out.chunk_edge_base)
        worst = int(np.max(np.diff(pceb))) if len(pceb) > 1 else 0
        if worst <= max_chunk_edges or cap <= be:
            return out
        cap = max(be, int(cap * max_chunk_edges / worst) // lane * lane)
    return out


def _build_chunked_stream_once(L: MergedDstLayout, max_chunk_rows: int,
                               be: int, lane: int, tile_rows: int,
                               max_chunk_edges: int, pad_fragments: bool
                               ) -> ChunkedStreamLayout:
    bounds = _chunk_bounds(L, max_chunk_rows, max_chunk_edges)
    n_chunks = len(bounds) - 1
    n_tiles = L.n_rows_total // tile_rows

    chunk_of_src = (np.searchsorted(bounds, L.src, side="right") - 1
                    ).astype(np.int64)
    group = chunk_of_src * n_tiles + (L.dst.astype(np.int64) // tile_rows)
    order = np.argsort(group, kind="stable")
    src = L.src[order]
    dst = L.dst[order]
    counts = np.bincount(group[order], minlength=n_chunks * n_tiles)
    go = np.zeros(n_chunks * n_tiles + 1, dtype=np.int64)
    np.cumsum(counts, out=go[1:])
    assert go[-1] == len(src)
    inv_order = np.empty_like(order)
    inv_order[order] = np.arange(len(order))
    e_tot = max(len(src), 1)

    if pad_fragments:
        # v3: BE-pad every (chunk, tile) fragment with sentinel edges so
        # each window is fully owned by its tile. Sentinels carry
        # dst = n_rows_total (in no tile's one-hot range -> masked out of
        # all kernel math) and src = the chunk's first row (any valid
        # gather target; its value never escapes the mask).
        frag = np.diff(go)                              # [n_chunks*n_tiles]
        pfrag = -(-frag // be) * be
        pgo = np.zeros_like(go)
        np.cumsum(pfrag, out=pgo[1:])
        ep = int(pgo[-1])
        grp_of_j = np.repeat(np.arange(len(frag)), frag)
        pos_map = (np.arange(len(src), dtype=np.int64)
                   - go[grp_of_j] + pgo[grp_of_j])      # grouped j -> padded
        src_p = np.repeat(bounds[np.arange(len(frag)) // n_tiles], pfrag)
        dst_p = np.full(ep, L.n_rows_total, dtype=np.int64)
        src_p[pos_map] = src
        dst_p[pos_map] = dst
        pceb = pgo[::n_tiles].copy()                    # padded chunk bases

        local_ids = [
            (src_p[pceb[c]:pceb[c + 1]] - bounds[c]).astype(np.int32)
            for c in range(n_chunks)
        ]
        # windows exactly tile each padded fragment, emitted (tile major,
        # chunk minor) to match desc_offsets' per-tile ranges
        nw = pfrag // be
        by_tile = np.arange(n_chunks * n_tiles, dtype=np.int64).reshape(
            n_chunks, n_tiles).T.reshape(-1)
        reps = nw[by_tile]
        cum = np.zeros(len(reps) + 1, dtype=np.int64)
        np.cumsum(reps, out=cum[1:])
        intra = (np.arange(int(cum[-1]), dtype=np.int64)
                 - np.repeat(cum[:-1], reps))
        desc = np.repeat(pgo[by_tile], reps) + intra * be
        off = np.zeros(n_tiles + 1, dtype=np.int64)
        np.cumsum(nw.reshape(n_chunks, n_tiles).sum(axis=0), out=off[1:])

        csc_perm = pos_map[inv_order[L.csc_perm]].astype(np.int32)
        ceb_real = go[::n_tiles]                        # CSC-stream slices
        local_perm = [
            (csc_perm[ceb_real[c]:ceb_real[c + 1]] - pceb[c]).astype(np.int32)
            for c in range(n_chunks)
        ]
        for c, lp in enumerate(local_perm):  # block-diagonality invariant
            assert len(lp) == 0 or (
                lp.min() >= 0 and lp.max() < pceb[c + 1] - pceb[c]), c

        return ChunkedStreamLayout(
            src_bounds=bounds,
            n_chunks=n_chunks,
            order=order.astype(np.int32),
            src=src_p.astype(np.int32),
            dst=dst_p.astype(np.int32),
            chunk_edge_base=pceb,
            local_ids=local_ids,
            desc=desc.astype(np.int32),
            desc_offsets=off.astype(np.int32),
            csc_perm=csc_perm,
            local_perm=local_perm,
            read_amp=float(ep) / e_tot,
            fully_owned=True,
            num_real_edges=len(src),
        )

    chunk_edge_base = go[::n_tiles].copy()

    local_ids = [
        (src[chunk_edge_base[c]:chunk_edge_base[c + 1]]
         - bounds[c]).astype(np.int32)
        for c in range(n_chunks)
    ]
    desc, off = _build_windows(go, n_chunks, n_tiles, be, lane)

    csc_perm = inv_order[L.csc_perm].astype(np.int32)
    local_perm = [
        (csc_perm[chunk_edge_base[c]:chunk_edge_base[c + 1]]
         - chunk_edge_base[c]).astype(np.int32)
        for c in range(n_chunks)
    ]
    for c, lp in enumerate(local_perm):  # block-diagonality invariant
        assert len(lp) == 0 or (lp.min() >= 0 and lp.max() < len(lp)), c

    return ChunkedStreamLayout(
        src_bounds=bounds,
        n_chunks=n_chunks,
        order=order.astype(np.int32),
        src=src.astype(np.int32),
        dst=dst.astype(np.int32),
        chunk_edge_base=chunk_edge_base,
        local_ids=local_ids,
        desc=desc.astype(np.int32),
        desc_offsets=off.astype(np.int32),
        csc_perm=csc_perm,
        local_perm=local_perm,
        read_amp=float(len(desc) * be) / e_tot,
        fully_owned=False,
        num_real_edges=len(src),
    )


def get_chunked_stream(L: MergedDstLayout,
                       max_chunk_rows: int = EMITTER_FAST_ROWS,
                       pad_fragments: bool = False) -> ChunkedStreamLayout:
    """Cached accessor: builds the chunked stream once per layout object.

    Per-chunk EDGE cap: larger caps mean fewer chunks (less split-buffer
    branching, fewer window fragments) but push the backward per-chunk
    cotangent tables past the fast gather emitter. The optimum is
    scale-dependent (v5e sweep, benchmarks/RESULTS.md): EMITTER_FAST_ROWS
    wins at 200k SNPs (1.8M-edge group -> ~90k-edge chunks, fast takes),
    while at 400k SNPs the 50-chunk fragmentation costs more than slow
    takes save — so the default scales as max(EMITTER_FAST_ROWS, E/16),
    which leaves the 200k regime untouched and recovers most of the
    +5% measured at 400k. KGWAS_CHUNK_EDGE_CAP overrides."""
    import os as _os

    env_cap = _os.environ.get("KGWAS_CHUNK_EDGE_CAP")
    edge_cap = (int(env_cap) if env_cap
                else max(EMITTER_FAST_ROWS, len(L.src) // 16))
    key = (max_chunk_rows, pad_fragments, edge_cap)
    cached = getattr(L, "_chunked", None)
    if cached is None or getattr(L, "_chunked_key", None) != key:
        cached = build_chunked_stream(L, max_chunk_rows,
                                      max_chunk_edges=edge_cap,
                                      pad_fragments=pad_fragments)
        L._chunked = cached
        L._chunked_key = key
    return cached


@dataclass
class CscWindowLayout:
    """Chunked-table decomposition of the backward cotangent permute for a
    PLAIN (dst-tile-major) merged stream, consumed by a fragment-windowed
    segment-sum kernel (ops/pallas_segment.segment_sum_windows).

    The backward of the [E, D] message gather permutes the per-edge
    cotangent to CSC (src-sorted) order — a take whose TABLE is the E-row
    cotangent itself, which is on XLA's slow gather emitter whenever
    E > EMITTER_FAST_ROWS (SNP-shaped groups: small src space, huge E).
    Cutting the E-row table into <= max_chunk_edges stream-position ranges
    and regrouping the CSC stream (table_chunk major, src minor) turns the
    permute into per-chunk fast-emitter takes; the segment-sum then walks
    per-src-tile window descriptors instead of contiguous CSC rows.
    Worth it exactly when the fragment count stays low — i.e. few src
    tiles: read_amp here is ~(n_src_tiles * n_chunks * BE) / E.
    """

    n_chunks: int
    edge_bounds: np.ndarray      # int64 [n_chunks+1] stream-position cuts
    local_perm: List[np.ndarray]  # per chunk: table-local row indices
    ids: np.ndarray              # int32 [E] src ids, grouped order
    desc: np.ndarray             # int32 [ND] window starts (grouped stream)
    desc_offsets: np.ndarray     # int32 [n_src_tiles+1]
    read_amp: float


def build_csc_windows(L: MergedDstLayout,
                      max_chunk_edges: int = EMITTER_FAST_ROWS,
                      be: int = None, lane: int = 128,
                      tile_rows: int = None) -> CscWindowLayout:
    if be is None:
        from ..ops.pallas_segment import BE as be
    if tile_rows is None:
        from ..ops.pallas_segment import BN as tile_rows
    e_tot = len(L.csc_perm)
    n_src_tiles = -(-L.n_src_total // tile_rows)
    step = max(lane, (max_chunk_edges // lane) * lane)
    bounds = np.append(np.arange(0, max(e_tot, 1), step, dtype=np.int64),
                       np.int64(e_tot))
    n_chunks = len(bounds) - 1

    # regroup CSC positions (table_chunk major, src minor): stable sort of
    # the CSC stream by the chunk its table row (= stream position) lives in
    chunk_of = (np.searchsorted(bounds, L.csc_perm, side="right") - 1
                ).astype(np.int64)
    grp = np.argsort(chunk_of, kind="stable")
    ids = L.csc_ids[grp].astype(np.int32)
    perm_g = L.csc_perm[grp]
    counts = np.bincount(chunk_of, minlength=n_chunks)
    ceb = np.zeros(n_chunks + 1, dtype=np.int64)
    np.cumsum(counts, out=ceb[1:])
    local_perm = [
        (perm_g[ceb[c]:ceb[c + 1]] - bounds[c]).astype(np.int32)
        for c in range(n_chunks)
    ]

    # per-(chunk, src_tile) fragments are contiguous (CSC order within each
    # chunk group is src-sorted); reuse the window builder
    group = chunk_of[grp] * n_src_tiles + (ids.astype(np.int64) // tile_rows)
    counts2 = np.bincount(group, minlength=n_chunks * n_src_tiles)
    go = np.zeros(n_chunks * n_src_tiles + 1, dtype=np.int64)
    np.cumsum(counts2, out=go[1:])
    desc, off = _build_windows(go, n_chunks, n_src_tiles, be, lane)

    return CscWindowLayout(
        n_chunks=n_chunks,
        edge_bounds=bounds,
        local_perm=local_perm,
        ids=ids,
        desc=desc.astype(np.int32),
        desc_offsets=off.astype(np.int32),
        read_amp=float(len(desc) * be) / max(e_tot, 1),
    )


def get_csc_windows(L: MergedDstLayout,
                    max_chunk_edges: int = EMITTER_FAST_ROWS
                    ) -> CscWindowLayout:
    """Cached accessor: builds the CSC window layout once per layout."""
    cached = getattr(L, "_csc_win", None)
    if cached is None or getattr(L, "_csc_win_edges", None) != max_chunk_edges:
        cached = build_csc_windows(L, max_chunk_edges)
        L._csc_win = cached
        L._csc_win_edges = max_chunk_edges
    return cached


@dataclass(eq=False)
class OwnedPlainLayout:
    """Per-tile BE-padded PLAIN (dst-sorted) stream with split backward cuts.

    For groups whose forward table is already fast (n_src_total <=
    EMITTER_FAST_ROWS) but whose [E, D] backward cotangent table is slow
    (E > EMITTER_FAST_ROWS) — "SNP-shaped". Padding each dst tile's
    contiguous edge range to a BE multiple (sentinel dst = n_rows_total)
    makes every BE window fully owned by its tile, expressed as per-tile
    window descriptors consumable by the SAME owned/split chunked kernels
    (ops/pallas_gat_layer.py). The backward then emits dmsgs as one buffer
    per `cut_bases` block (uniform EMITTER_FAST_ROWS cuts, BE multiples so
    windows never straddle); the cotangent takes ride the fast emitter and
    a fragment-windowed segment-sum (segment_sum_windows) reduces the
    cut-grouped CSC stream over the src space.
    """

    src: np.ndarray            # int32 [Ep] padded stream src (sentinel 0)
    dst: np.ndarray            # int32 [Ep] padded stream dst
    desc: np.ndarray           # int32 [ND] layer-kernel window starts
    desc_offsets: np.ndarray   # int32 [n_tiles+1]
    cut_bases: np.ndarray      # int64 [K+1] backward buffer cuts
    local_perm: List[np.ndarray]  # per cut: buffer-local CSC take indices
    sum_ids: np.ndarray        # int32 [E] src ids, cut-grouped order
    sum_desc: np.ndarray       # int32 segsum window starts (grouped stream)
    sum_desc_offsets: np.ndarray  # int32 [n_src_tiles+1]
    num_real_edges: int
    read_amp: float            # padded stream rows / real rows
    sum_read_amp: float        # segsum window rows / real rows


@dataclass(eq=False)
class SplitCscGroup:
    """Cut-grouped CSC consume with PER-CUT padded blocks.

    The per-cut cotangent takes stay SEPARATE buffers end-to-end — no
    [E, D] concat pass ever materializes. ops/pallas_segment
    .segment_sum_windows reads them via split_bases branch-selected DMA.
    Each cut's block is padded to a BE multiple plus one BE slack window,
    so a segsum window anchored near a block's end overreads into its OWN
    buffer's sentinel slack, never into another cut's buffer. Within a
    cut, rows are src-ascending, so each (cut, src_tile) group is a single
    contiguous run — windows never need cross-fragment suppression.
    """

    local_perm: List[np.ndarray]   # per cut: PADDED buffer-local take idx
    sum_ids: np.ndarray            # int32 [bases[-1]] padded grouped ids
    sum_desc: np.ndarray           # int32 window starts (padded coords)
    sum_desc_offsets: np.ndarray   # int32 [n_src_tiles+1]
    sum_bases: tuple               # int [K+1] padded block bounds
    sum_read_amp: float            # window rows / real rows


def build_split_csc_group(ids_per_cut, perm_per_cut, n_src_rows: int,
                          be: int, lane: int, tile_rows: int
                          ) -> SplitCscGroup:
    """ids_per_cut[k]: src ids of cut k's rows, ASCENDING; perm_per_cut[k]:
    matching buffer-local take indices."""
    K = len(ids_per_cut)
    n_tiles = n_src_rows // tile_rows
    counts = np.array([len(x) for x in ids_per_cut], dtype=np.int64)
    P = -(-counts // be) * be + be                   # padded + BE slack
    bases = np.zeros(K + 1, dtype=np.int64)
    np.cumsum(P, out=bases[1:])

    sum_ids = np.full(int(bases[-1]), n_src_rows, np.int32)
    local_perm = []
    for k in range(K):
        sum_ids[bases[k]:bases[k] + counts[k]] = ids_per_cut[k]
        pp = np.zeros(P[k], dtype=np.int32)
        pp[: counts[k]] = perm_per_cut[k]
        local_perm.append(pp)

    # (cut, tile) group bounds in padded coordinates, then per-tile windows
    starts = np.empty(K * n_tiles, dtype=np.int64)
    ends = np.empty(K * n_tiles, dtype=np.int64)
    for k in range(K):
        ids_k = np.asarray(ids_per_cut[k], dtype=np.int64)
        tb = np.searchsorted(ids_k, np.arange(n_tiles + 1) * tile_rows)
        starts[k * n_tiles:(k + 1) * n_tiles] = bases[k] + tb[:-1]
        ends[k * n_tiles:(k + 1) * n_tiles] = bases[k] + tb[1:]
    s_al = (starts // lane) * lane
    nw = np.where(ends > starts, -(-(ends - s_al) // be), 0)
    # t-major ordering for per-tile desc ranges
    nwf = nw.reshape(K, n_tiles).T.reshape(-1)
    sf = s_al.reshape(K, n_tiles).T.reshape(-1)
    total = int(nwf.sum())
    cum = np.zeros(len(nwf) + 1, dtype=np.int64)
    np.cumsum(nwf, out=cum[1:])
    intra = np.arange(total, dtype=np.int64) - np.repeat(cum[:-1], nwf)
    desc = np.repeat(sf, nwf) + intra * be
    soff = np.zeros(n_tiles + 1, dtype=np.int64)
    np.cumsum(nwf.reshape(n_tiles, K).sum(axis=1), out=soff[1:])

    er = max(int(counts.sum()), 1)
    return SplitCscGroup(
        local_perm=local_perm,
        sum_ids=sum_ids,
        sum_desc=desc.astype(np.int32),
        sum_desc_offsets=soff.astype(np.int32),
        sum_bases=tuple(int(b) for b in bases),
        sum_read_amp=float(total * be) / er,
    )


def get_chunked_split_group(cs, csc_ids_np, n_src_total: int
                            ) -> SplitCscGroup:
    """SplitCscGroup for a fully-owned ChunkedStreamLayout's backward:
    cuts = source chunks (cs.local_perm is already buffer-local per
    chunk), ids = the chunk's slice of the global CSC id stream (chunks
    partition the src space contiguously, so chunk segments are
    contiguous src-ascending runs of the CSC stream)."""
    cached = getattr(cs, "_split_group", None)
    if cached is None:
        from ..ops.pallas_segment import BE, BN, LANE

        csc_ids = np.asarray(csc_ids_np, dtype=np.int64)
        cut = np.searchsorted(csc_ids,
                              np.asarray(cs.src_bounds, dtype=np.int64))
        ids_per_cut = [csc_ids[cut[k]:cut[k + 1]]
                       for k in range(len(cut) - 1)]
        cached = build_split_csc_group(
            ids_per_cut, list(cs.local_perm), n_src_total, BE, LANE, BN,
        )
        cs._split_group = cached
    return cached


def build_owned_plain_stream(L: MergedDstLayout,
                             split_edges: int = EMITTER_FAST_ROWS,
                             be: int = None, lane: int = 128,
                             tile_rows: int = None) -> OwnedPlainLayout:
    if be is None:
        from ..ops.pallas_segment import BE as be
    if tile_rows is None:
        from ..ops.pallas_segment import BN as tile_rows
    n_tiles = L.n_rows_total // tile_rows
    ro = np.asarray(L.row_offsets, dtype=np.int64)
    tb = ro[::tile_rows]                             # [n_tiles+1] tile cuts
    assert len(tb) == n_tiles + 1 and tb[-1] == ro[-1]
    e_tot = int(tb[-1])

    frag = np.diff(tb)
    pfrag = -(-frag // be) * be
    pgo = np.zeros_like(tb)
    np.cumsum(pfrag, out=pgo[1:])
    ep = int(pgo[-1])
    grp_of_j = np.repeat(np.arange(n_tiles), frag)
    pos_map = (np.arange(e_tot, dtype=np.int64)
               - tb[grp_of_j] + pgo[grp_of_j])       # old pos -> padded pos
    src_p = np.zeros(ep, dtype=np.int64)             # sentinel: row 0
    dst_p = np.full(ep, L.n_rows_total, dtype=np.int64)
    src_p[pos_map] = L.src
    dst_p[pos_map] = L.dst

    # layer-kernel windows: consecutive BE windows tiling each padded range
    nw = pfrag // be
    cum = np.zeros(n_tiles + 1, dtype=np.int64)
    np.cumsum(nw, out=cum[1:])
    intra = (np.arange(int(cum[-1]), dtype=np.int64)
             - np.repeat(cum[:-1], nw))
    desc = np.repeat(pgo[:-1], nw) + intra * be

    # backward cuts: uniform BE-multiple blocks over the padded stream
    step = max(be, (split_edges // be) * be)
    bases = np.append(np.arange(0, max(ep, 1), step, dtype=np.int64),
                      np.int64(ep))
    bases = np.unique(bases)
    K = len(bases) - 1

    # cut-grouped CSC consume: group src-sorted padded positions by cut
    # (stable sort keeps src ascending within each cut)
    csc_pad = pos_map[np.asarray(L.csc_perm, dtype=np.int64)]
    cut_of = (np.searchsorted(bases, csc_pad, side="right") - 1)
    grp = np.argsort(cut_of, kind="stable")
    sum_ids = np.asarray(L.csc_ids)[grp].astype(np.int32)
    perm_g = csc_pad[grp]
    counts = np.bincount(cut_of, minlength=K)
    ceb = np.zeros(K + 1, dtype=np.int64)
    np.cumsum(counts, out=ceb[1:])
    local_perm = [
        (perm_g[ceb[k]:ceb[k + 1]] - bases[k]).astype(np.int32)
        for k in range(K)
    ]
    n_src_tiles = L.n_src_total // tile_rows
    group = cut_of[grp] * n_src_tiles + (sum_ids.astype(np.int64)
                                         // tile_rows)
    counts2 = np.bincount(group, minlength=K * n_src_tiles)
    go = np.zeros(K * n_src_tiles + 1, dtype=np.int64)
    np.cumsum(counts2, out=go[1:])
    sdesc, soff = _build_windows(go, K, n_src_tiles, be, lane)

    er = max(e_tot, 1)
    return OwnedPlainLayout(
        src=src_p.astype(np.int32),
        dst=dst_p.astype(np.int32),
        desc=desc.astype(np.int32),
        desc_offsets=cum.astype(np.int32),
        cut_bases=bases,
        local_perm=local_perm,
        sum_ids=sum_ids,
        sum_desc=sdesc.astype(np.int32),
        sum_desc_offsets=soff.astype(np.int32),
        num_real_edges=e_tot,
        read_amp=float(ep) / er,
        sum_read_amp=float(len(sdesc) * be) / er,
    )


def get_owned_split_group(lay: OwnedPlainLayout, n_src_total: int
                          ) -> SplitCscGroup:
    """Lazily-built SplitCscGroup for an OwnedPlainLayout (the opt-in
    KGWAS_SPLIT_SEGSUM backward — see ops/pallas_gat_layer._fglpg_bwd)."""
    cached = getattr(lay, "_split_cache", None)
    if cached is None:
        from ..ops.pallas_segment import BE, BN, LANE

        counts = [len(p) for p in lay.local_perm]
        ceb = np.zeros(len(counts) + 1, dtype=np.int64)
        np.cumsum(counts, out=ceb[1:])
        ids_per_cut = [lay.sum_ids[ceb[k]:ceb[k + 1]]
                       for k in range(len(counts))]
        cached = build_split_csc_group(
            ids_per_cut, list(lay.local_perm), n_src_total, BE, LANE, BN,
        )
        lay._split_cache = cached
    return cached


def get_owned_plain_stream(L: MergedDstLayout,
                           split_edges: int = EMITTER_FAST_ROWS
                           ) -> OwnedPlainLayout:
    """Cached accessor: builds the owned plain stream once per layout."""
    cached = getattr(L, "_owned_plain", None)
    if cached is None or getattr(L, "_owned_plain_edges", None) != split_edges:
        cached = build_owned_plain_stream(L, split_edges)
        L._owned_plain = cached
        L._owned_plain_edges = split_edges
    return cached


def build_merged_layouts(cg: CompiledGraph, tile_rows: int = None
                         ) -> Dict[str, MergedDstLayout]:
    """One MergedDstLayout per destination node type of the compiled graph.
    tile_rows defaults to the kernels' BN tile (ops/pallas_segment.py) —
    tile2rel and the tile-boundary offsets must agree with it."""
    if tile_rows is None:
        from ..ops.pallas_segment import BN as tile_rows
    by_dst: Dict[str, List[RelationShard]] = {}
    for r in cg.relations.values():
        by_dst.setdefault(r.dst_type, []).append(r)

    layouts = {}
    for dst_t, rels in by_dst.items():
        rels = sorted(rels, key=lambda r: r.key)  # deterministic slot order
        n_pad = cg.padded_nodes[dst_t]
        assert n_pad % tile_rows == 0, (dst_t, n_pad)
        R = len(rels)

        src_base = np.zeros(R + 1, dtype=np.int64)
        for i, r in enumerate(rels):
            src_base[i + 1] = src_base[i] + cg.padded_nodes[r.src_type]
        n_src_total = int(src_base[-1])
        assert n_src_total % tile_rows == 0

        edge_base = np.zeros(R + 1, dtype=np.int64)
        for i, r in enumerate(rels):
            edge_base[i + 1] = edge_base[i] + len(r.src)

        src_parts, dst_parts, off_parts = [], [], []
        tile2rel = []
        for i, r in enumerate(rels):
            src_parts.append(r.src.astype(np.int64) + src_base[i])
            # pad edges of relation i point at its trash row within slot i
            dst_parts.append(r.dst.astype(np.int64) + i * n_pad)
            # row offsets of slot i: relation offsets shifted by edge_base
            off_parts.append(r.row_offsets[:-1].astype(np.int64) + edge_base[i])
            tile2rel += [i] * (n_pad // tile_rows)
        src = np.concatenate(src_parts)
        dst = np.concatenate(dst_parts)
        row_offsets = np.concatenate(
            off_parts + [np.asarray([edge_base[-1]], dtype=np.int64)]
        )
        n_rows_total = R * n_pad

        # CSC over the concatenated source space; pad edges already carry
        # per-relation trash src? relation shards store pad src = 0, so key
        # them to the slot's trash row for clean clustering
        src_key = src.copy()
        for i, r in enumerate(rels):
            e_real = r.num_edges
            lo, hi = edge_base[i], edge_base[i + 1]
            pad_slice = slice(lo + e_real, hi)
            src_key[pad_slice] = src_base[i] + cg.num_nodes[r.src_type]
        csc_perm = np.argsort(src_key, kind="stable").astype(np.int32)
        csc_ids = src_key[csc_perm].astype(np.int32)
        counts = np.bincount(csc_ids, minlength=n_src_total)
        csc_offsets = np.zeros(n_src_total + 1, dtype=np.int64)
        np.cumsum(counts, out=csc_offsets[1:])

        layouts[dst_t] = MergedDstLayout(
            dst_type=dst_t,
            rel_keys=[r.key for r in rels],
            src_types=[r.src_type for r in rels],
            n_rows_per_rel=n_pad,
            n_rows_total=int(n_rows_total),
            src=src_key.astype(np.int32),
            dst=dst.astype(np.int32),
            row_offsets=row_offsets.astype(np.int32),
            tile2rel=np.asarray(tile2rel, dtype=np.int32),
            num_edges=int(sum(r.num_edges for r in rels)),
            src_base=src_base.astype(np.int32),
            n_src_total=n_src_total,
            csc_perm=csc_perm,
            csc_ids=csc_ids,
            csc_offsets=csc_offsets.astype(np.int32),
            edge_base=edge_base.astype(np.int32),
        )

    spec = os.environ.get("KGWAS_MERGED_MAX_EDGES", "0")
    if spec and spec != "0":
        layouts = split_oversized_layouts(layouts, _parse_max_edges(spec),
                                          tile_rows)
    return layouts


def split_merged_layout(L: MergedDstLayout, n_parts: int,
                        tile_rows: int) -> List[MergedDstLayout]:
    """Split one merged layout into n_parts dst-node-range SUB-layouts.

    Attention softmax is per dst row, so partitioning edges by dst node
    is exact: sub k covers nodes [k*n_sub, (k+1)*n_sub) of the padded dst
    space (n_sub a tile multiple), with the SAME concat src space (each
    sub's backward contributes an additive cotangent to the shared source
    tables). Bounds the per-group [E, D] stream/cotangent transients —
    the full-KG fit lever at 2M SNPs where one group's backward buffers
    alone exceeded the chip (benchmarks/RESULTS.md round 5)."""
    N = L.n_rows_per_rel
    R = len(L.rel_keys)
    n_sub = ((N + n_parts - 1) // n_parts + tile_rows - 1
             ) // tile_rows * tile_rows
    bases = list(range(0, N, n_sub))
    rel_of_edge = L.dst.astype(np.int64) // N
    node = L.dst.astype(np.int64) - rel_of_edge * N
    # GCN/SGC symmetric normalization needs GLOBAL source degrees — a
    # sub-layout's own stream only sees its dst-range's edges (models.
    # hetero_gnn._merged_mp_norms reads this attribute when present)
    parent_src_deg = np.bincount(
        L.src, minlength=L.n_src_total).astype(np.float32)
    subs = []
    for k, b in enumerate(bases):
        hi = min(b + n_sub, N)
        rows = hi - b
        assert rows % tile_rows == 0, (rows, tile_rows)
        mask = (node >= b) & (node < hi)
        # parent stream is rel-major, dst-ascending per relation, so the
        # masked stream is already sorted under the remapped row index
        sub_src = L.src[mask]
        sub_rel = rel_of_edge[mask]
        sub_dst = (sub_rel * rows + (node[mask] - b)).astype(np.int64)
        assert (np.diff(sub_dst) >= 0).all()
        n_rows_total = R * rows
        counts = np.bincount(sub_dst, minlength=n_rows_total)
        row_offsets = np.zeros(n_rows_total + 1, dtype=np.int64)
        np.cumsum(counts, out=row_offsets[1:])
        edge_base = np.zeros(R + 1, dtype=np.int64)
        np.cumsum(np.bincount(sub_rel, minlength=R), out=edge_base[1:])
        csc_perm = np.argsort(sub_src, kind="stable").astype(np.int32)
        csc_ids = sub_src[csc_perm].astype(np.int32)
        ccounts = np.bincount(csc_ids, minlength=L.n_src_total)
        csc_offsets = np.zeros(L.n_src_total + 1, dtype=np.int64)
        np.cumsum(ccounts, out=csc_offsets[1:])
        subs.append(MergedDstLayout(
            dst_type=f"{L.dst_type}@{k}",
            rel_keys=list(L.rel_keys),
            src_types=list(L.src_types),
            n_rows_per_rel=rows,
            n_rows_total=int(n_rows_total),
            src=sub_src.astype(np.int32),
            dst=sub_dst.astype(np.int32),
            row_offsets=row_offsets.astype(np.int32),
            tile2rel=np.repeat(np.arange(R, dtype=np.int32),
                               rows // tile_rows),
            num_edges=int(mask.sum()),
            src_base=np.asarray(L.src_base, np.int32),
            n_src_total=L.n_src_total,
            csc_perm=csc_perm,
            csc_ids=csc_ids,
            csc_offsets=csc_offsets.astype(np.int32),
            edge_base=edge_base.astype(np.int32),
            base_type=L.base_type or L.dst_type,
            node_base=L.node_base + b,
        ))
        subs[-1].parent_src_deg = parent_src_deg
    return subs


def _parse_max_edges(spec: str):
    """KGWAS_MERGED_MAX_EDGES: either one int (global cap) or
    'Type:edges,Type2:edges,default:edges' — splitting is CHEAP for raw-
    path groups (tiny per-sub residuals) but duplicates the chunked
    groups' per-sub source tables, so asymmetric caps pay at full-KG."""
    if ":" not in spec:
        n = int(spec)
        return lambda t: n
    table = {}
    for part in spec.split(","):
        k, v = part.split(":")
        table[k.strip()] = int(v)
    default = table.get("default", 0)
    return lambda t: table.get(t, default)


def split_oversized_layouts(layouts: Dict[str, MergedDstLayout],
                            cap_fn, tile_rows: int
                            ) -> Dict[str, MergedDstLayout]:
    """Replace any layout whose stream exceeds its cap with dst-range
    sub-layouts (KGWAS_MERGED_MAX_EDGES — the full-KG fit lever)."""
    if isinstance(cap_fn, int):
        n = cap_fn
        cap_fn = lambda t: n  # noqa: E731 — direct-call convenience
    out: Dict[str, MergedDstLayout] = {}
    for dst_t, L in layouts.items():
        max_edges = cap_fn(dst_t)
        if max_edges <= 0 or len(L.src) <= max_edges:
            out[dst_t] = L
            continue
        n_parts = -(-len(L.src) // max_edges)
        n_parts = min(n_parts, L.n_rows_per_rel // tile_rows)
        for sub in split_merged_layout(L, n_parts, tile_rows):
            out[sub.dst_type] = sub
    return out
