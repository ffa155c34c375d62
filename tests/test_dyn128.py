"""dyn128 half-height one-hot bands (ops/pallas_gat_layer.py).

The chunked fused-GAT kernels run their big one-hot MXU dots at [128, BE]
height for windows whose in-tile dst rows fit a 128-row band (desc_base
prefetch array; -1 = full-height fallback). Restricting the online-softmax
update to the band is bit-equivalent: out-of-band rows see scale ==
exp(0) == 1 and a zero dot contribution. These tests pin (1) the
desc_base descriptor invariants and (2) bitwise forward/backward parity
of the dyn128 kernels against the full-height kernels, in CPU interpret
mode. Replaces reference torch_scatter use (kgwas/conv.py:227-228).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from kgwas_tpu.graph import compile_graph, make_synthetic_kg
from kgwas_tpu.ops.pallas_segment import BN as _TILE_BN

# node row spaces follow the shipped kernel tile (BN=512 default; 256/128 via env)
_NODE_PAD = max(256, _TILE_BN)

from kgwas_tpu.graph.merged_layout import (get_chunked_stream,
                                           get_owned_plain_stream)
from kgwas_tpu.ops.pallas_gat_layer import (
    BE,
    BN,
    HALF,
    _desc_base_np,
    _merged_backward_chunked,
    _merged_backward_chunked_split,
    _merged_forward_chunked,
    _nonempty_desc,
    _prep_adst_tiles,
    _prep_att8,
)


@pytest.fixture(scope="module")
def world():
    g = make_synthetic_kg(n_snp=900, n_gene=300, n_go=120, seed=23)
    cg = compile_graph(g, edge_pad_multiple=256, node_pad_multiple=_NODE_PAD)
    return g, cg


def _layouts(cg):
    for dst_t, L in cg.merged_layouts().items():
        cs = get_chunked_stream(L, max_chunk_rows=512, pad_fragments=False)
        yield dst_t, L, cs


def test_desc_base_invariants(world):
    """base >= 0 -> every in-tile lane of the window lies inside the
    8-aligned HALF-row band; base == -1 -> the span genuinely exceeds
    HALF rows."""
    _, cg = world
    any_fit = False
    for dst_t, L, cs in _layouts(cg):
        db = _desc_base_np(cs.desc, cs.desc_offsets, cs.dst, L.n_rows_total)
        assert len(db) == len(cs.desc)
        dstp = np.concatenate(
            [cs.dst, np.full(BE, L.n_rows_total, cs.dst.dtype)])
        tile = np.repeat(np.arange(len(cs.desc_offsets) - 1),
                         np.diff(cs.desc_offsets))
        for w, s in enumerate(cs.desc):
            lanes = dstp[s:s + BE]
            rel = lanes - tile[w] * BN
            rel = rel[(rel >= 0) & (rel < BN)]
            if db[w] >= 0:
                b = int(db[w]) * 8
                assert b % 8 == 0 and 0 <= b <= BN - HALF
                if len(rel):
                    assert rel.min() >= b and rel.max() < b + HALF, (
                        dst_t, w)
                    any_fit = True
            else:
                assert len(rel) and rel.max() - (rel.min() & ~7) >= HALF, (
                    dst_t, w)
    assert any_fit, "no window ever took the half-height path"


@pytest.mark.parametrize("mode", ["softmax", "sigmoid", "raw"])
def test_dyn128_chunked_bitwise_vs_full(world, mode):
    """Forward + backward (read-merge, non-owned) dyn128 kernels match the
    full-height kernels bitwise in interpret mode."""
    _, cg = world
    rng = np.random.default_rng(5)
    for dst_t, L, cs in _layouts(cg):
        d = 128
        n_rel = len(L.rel_keys)
        msgs = jnp.asarray(
            rng.normal(size=(len(cs.src), d)).astype(np.float32))
        att = jnp.asarray(rng.normal(size=(n_rel, d)).astype(np.float32))
        a_dst = jnp.asarray(
            rng.normal(size=(L.n_rows_total,)).astype(np.float32))
        g = jnp.asarray(
            rng.normal(size=(L.n_rows_total, d)).astype(np.float32))
        att8 = _prep_att8(att)
        adst_tiles = _prep_adst_tiles(a_dst, L.n_rows_total)
        db = _desc_base_np(cs.desc, cs.desc_offsets, cs.dst, L.n_rows_total)
        args = (msgs, att8, adst_tiles, jnp.asarray(cs.dst),
                jnp.asarray(cs.desc_offsets),
                jnp.asarray(_nonempty_desc(cs.desc)), jnp.asarray(db),
                jnp.asarray(L.tile2rel))
        kw = dict(n_rows=L.n_rows_total, negative_slope=0.2,
                  temperature=1.0, interpret=True, mode=mode)
        out_f, rmax_f, rsum_f = _merged_forward_chunked(
            *args, dyn128=False, **kw)
        out_d, rmax_d, rsum_d = _merged_forward_chunked(
            *args, dyn128=True, **kw)
        np.testing.assert_array_equal(np.asarray(out_d), np.asarray(out_f),
                                      err_msg=f"{dst_t} fwd {mode}")
        np.testing.assert_array_equal(np.asarray(rmax_d), np.asarray(rmax_f))
        np.testing.assert_array_equal(np.asarray(rsum_d), np.asarray(rsum_f))

        bargs = args + (rmax_f, rsum_f, out_f, g)
        dm_f, da_f, dt_f = _merged_backward_chunked(
            *bargs, dyn128=False, owned=False, **kw)
        dm_d, da_d, dt_d = _merged_backward_chunked(
            *bargs, dyn128=True, owned=False, **kw)
        np.testing.assert_array_equal(np.asarray(dm_d), np.asarray(dm_f),
                                      err_msg=f"{dst_t} bwd dmsgs {mode}")
        np.testing.assert_array_equal(np.asarray(da_d), np.asarray(da_f))
        np.testing.assert_array_equal(np.asarray(dt_d), np.asarray(dt_f))


def test_dyn128_owned_split_bitwise_vs_full(world):
    """The owned split-output backward (the bench-scale hot path) matches
    full-height bitwise too."""
    _, cg = world
    rng = np.random.default_rng(7)
    for dst_t, L in cg.merged_layouts().items():
        lay = get_owned_plain_stream(L)
        d = 128
        n_rel = len(L.rel_keys)
        msgs = jnp.asarray(
            rng.normal(size=(len(lay.src), d)).astype(np.float32))
        att = jnp.asarray(rng.normal(size=(n_rel, d)).astype(np.float32))
        a_dst = jnp.asarray(
            rng.normal(size=(L.n_rows_total,)).astype(np.float32))
        g = jnp.asarray(
            rng.normal(size=(L.n_rows_total, d)).astype(np.float32))
        att8 = _prep_att8(att)
        adst_tiles = _prep_adst_tiles(a_dst, L.n_rows_total)
        db = _desc_base_np(lay.desc, lay.desc_offsets, lay.dst,
                           L.n_rows_total)
        args = (msgs, att8, adst_tiles, jnp.asarray(lay.dst),
                jnp.asarray(lay.desc_offsets),
                jnp.asarray(_nonempty_desc(lay.desc)), jnp.asarray(db),
                jnp.asarray(L.tile2rel))
        kw = dict(n_rows=L.n_rows_total, negative_slope=0.2,
                  temperature=1.0, interpret=True)
        out_f, rmax_f, rsum_f = _merged_forward_chunked(
            *args, dyn128=False, pre_padded=True, **kw)
        out_d, _, _ = _merged_forward_chunked(
            *args, dyn128=True, pre_padded=True, **kw)
        np.testing.assert_array_equal(np.asarray(out_d), np.asarray(out_f))

        split_bases = tuple(int(b) for b in lay.cut_bases)
        bargs = args + (rmax_f, rsum_f, out_f, g)
        bufs_f, da_f, dt_f = _merged_backward_chunked_split(
            *bargs, split_bases=split_bases, dyn128=False, **kw)
        bufs_d, da_d, dt_d = _merged_backward_chunked_split(
            *bargs, split_bases=split_bases, dyn128=True, **kw)
        for k, (bf, bd) in enumerate(zip(bufs_f, bufs_d)):
            np.testing.assert_array_equal(np.asarray(bd), np.asarray(bf),
                                          err_msg=f"{dst_t} buf {k}")
        np.testing.assert_array_equal(np.asarray(da_d), np.asarray(da_f))
        np.testing.assert_array_equal(np.asarray(dt_d), np.asarray(dt_f))
