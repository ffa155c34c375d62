"""Segment op correctness vs dense numpy references (the correctness oracle
for the scatter/softmax kernels — SURVEY.md section 4 test pyramid level 1)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from kgwas_tpu.ops import (
    coo_spmm,
    edge_valid_mask,
    segment_mean,
    segment_softmax,
    segment_sum,
)


def random_edges(rng, n_src, n_dst, e, e_pad):
    src = rng.integers(0, n_src, size=e)
    dst = np.sort(rng.integers(0, n_dst, size=e))
    src_p = np.zeros(e_pad, dtype=np.int32)
    dst_p = np.full(e_pad, n_dst, dtype=np.int32)  # trash row = n_dst
    src_p[:e] = src
    dst_p[:e] = dst
    return src_p, dst_p


@pytest.mark.parametrize("e,e_pad", [(37, 64), (64, 64), (1, 8)])
def test_segment_softmax_matches_dense(e, e_pad):
    rng = np.random.default_rng(0)
    n_dst = 11
    src, dst = random_edges(rng, 5, n_dst, e, e_pad)
    logits = rng.standard_normal((e_pad, 2)).astype(np.float32)
    valid = edge_valid_mask(e_pad, e)
    out = np.asarray(
        segment_softmax(jnp.asarray(logits), jnp.asarray(dst), n_dst + 1, valid)
    )
    # dense reference per segment (PyG softmax formula incl. 1e-16)
    expected = np.zeros_like(logits)
    for d in range(n_dst):
        m = (dst[:e] == d)
        if not m.any():
            continue
        seg = logits[:e][m]
        seg = np.exp(seg - seg.max(axis=0, keepdims=True))
        expected_rows = seg / (seg.sum(axis=0, keepdims=True) + 1e-16)
        expected[np.where(m)[0]] = expected_rows
    np.testing.assert_allclose(out[:e], expected[:e], rtol=1e-5, atol=1e-6)
    # pad edges must be exactly zero
    np.testing.assert_array_equal(out[e:], 0.0)
    # rows sum to ~1 per non-empty segment
    for d in range(n_dst):
        m = (dst[:e] == d)
        if m.any():
            np.testing.assert_allclose(out[:e][m].sum(axis=0), 1.0, rtol=1e-5)


def test_segment_softmax_grads_finite():
    rng = np.random.default_rng(1)
    e, e_pad, n_dst = 20, 32, 7
    src, dst = random_edges(rng, 4, n_dst, e, e_pad)
    logits = jnp.asarray(rng.standard_normal((e_pad,)).astype(np.float32))
    valid = edge_valid_mask(e_pad, e)

    def loss(lg):
        a = segment_softmax(lg, jnp.asarray(dst), n_dst + 1, valid)
        return jnp.sum(a[:e] ** 2)

    g = jax.grad(loss)(logits)
    assert np.all(np.isfinite(np.asarray(g)))
    np.testing.assert_array_equal(np.asarray(g)[e:], 0.0)


def test_segment_mean_empty_segments_zero():
    rng = np.random.default_rng(2)
    e, e_pad, n_dst = 10, 16, 6
    src, dst = random_edges(rng, 5, n_dst, e, e_pad)
    data = jnp.asarray(rng.standard_normal((e_pad, 3)).astype(np.float32))
    valid = edge_valid_mask(e_pad, e)
    out = np.asarray(segment_mean(data, jnp.asarray(dst), n_dst + 1, valid))
    for d in range(n_dst):
        m = dst[:e] == d
        if m.any():
            np.testing.assert_allclose(
                out[d], np.asarray(data)[:e][m].mean(axis=0), rtol=1e-5, atol=1e-6
            )
        else:
            np.testing.assert_array_equal(out[d], 0.0)


def test_coo_spmm_matches_dense():
    rng = np.random.default_rng(3)
    n_src, n_dst, e, e_pad = 9, 7, 25, 32
    src, dst = random_edges(rng, n_src, n_dst, e, e_pad)
    x = rng.standard_normal((n_src + 1, 4)).astype(np.float32)
    vals = np.zeros(e_pad, dtype=np.float32)
    vals[:e] = rng.standard_normal(e).astype(np.float32)
    out = np.asarray(
        coo_spmm(jnp.asarray(vals), jnp.asarray(src), jnp.asarray(dst),
                 jnp.asarray(x), n_dst + 1)
    )
    dense = np.zeros((n_dst + 1, 4), dtype=np.float32)
    for i in range(e):
        dense[dst[i]] += vals[i] * x[src[i]]
    np.testing.assert_allclose(out, dense, rtol=1e-4, atol=1e-5)


def test_segment_sum_sorted_matches_unsorted_semantics():
    rng = np.random.default_rng(4)
    e_pad, n_dst = 64, 9
    dst = np.sort(rng.integers(0, n_dst, size=e_pad)).astype(np.int32)
    data = rng.standard_normal((e_pad, 2)).astype(np.float32)
    out = np.asarray(segment_sum(jnp.asarray(data), jnp.asarray(dst), n_dst))
    expected = np.zeros((n_dst, 2), dtype=np.float32)
    np.add.at(expected, dst, data)
    np.testing.assert_allclose(out, expected, rtol=1e-5, atol=1e-6)
