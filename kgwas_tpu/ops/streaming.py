"""Host->HBM streamed matmul for bigger-than-HBM embedding tables.

The full-mode config uses PoPS gene features (57,742-dim, reference
kgwas_data.py:244) and pops_expression (40,546-dim) — at full KG scale these
can exceed a single chip's HBM. The features are frozen inputs
(requires_grad=False in the reference, kgwas_data.py:136), so only the first
encoder layer touches them:

  h1 = X @ W1 + b1          (forward: stream X column-chunks host->device)
  dW1 = X^T @ dh1, db1=sum  (backward: second streamed pass; dX never needed)

Everything downstream of h1 stays inside the jitted full-graph step
(engine/streamed.py splits the encoder accordingly). The feature matrix
stays host-side (numpy or np.memmap); each chunk is transferred once per
pass with the matmul overlapped by JAX async dispatch.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


@partial(jax.jit, donate_argnums=(0,))
def _acc_matmul(acc, xc, wc):
    return acc + xc @ wc


def streamed_matmul(
    x_host: np.ndarray,
    w,
    bias=None,
    col_chunk: int = 8192,
    row_sharding=None,
    row_pad_to=None,
):
    """h = x_host @ w (+ bias). x_host: [N, D] host array/memmap; w: [D, H]
    device array. Streams D in chunks of col_chunk columns.

    row_sharding: optional NamedSharding (e.g. P('data', None)) — each host
    chunk and the accumulator are row-sharded over the mesh, so the streamed
    matmul's memory AND flops distribute across the data axis (the
    streamed-features x mesh composition, VERDICT round-1 item 6).

    row_pad_to: pad the OUTPUT row count (zero feature rows, so padded h1
    rows equal the bias — the in-HBM pad-row semantics). Padding happens per
    column chunk, never on the full host table."""
    n, d = x_host.shape
    h = w.shape[1]
    n_out = row_pad_to if row_pad_to is not None else n
    acc = jnp.zeros((n_out, h), dtype=w.dtype)
    if row_sharding is not None:
        acc = jax.device_put(acc, row_sharding)
    for c0 in range(0, d, col_chunk):
        c1 = min(c0 + col_chunk, d)
        xc = np.ascontiguousarray(x_host[:, c0:c1], dtype=np.float32)
        if n_out > n:
            xc = np.concatenate(
                [xc, np.zeros((n_out - n, c1 - c0), dtype=np.float32)], axis=0)
        xc = (jax.device_put(xc, row_sharding) if row_sharding is not None
              else jax.device_put(xc))
        acc = _acc_matmul(acc, xc, jax.lax.slice(w, (c0, 0), (c1, h)))
    if bias is not None:
        acc = acc + bias
    return acc


def streamed_grad_w(
    x_host: np.ndarray,
    dh,
    col_chunk: int = 8192,
    row_sharding=None,
    row_pad_to=None,
):
    """dW = x_host^T @ dh, streamed over column chunks. Returns [D, H].

    row_sharding: shard each chunk's rows like dh so the contraction runs
    row-parallel (GSPMD inserts the psum over the data axis). row_pad_to:
    zero-pad chunk rows to dh's (padded, mesh-divisible) row count — pad
    rows are zero so dW is unaffected."""
    n, d = x_host.shape
    hdim = dh.shape[1]
    n_rows = row_pad_to if row_pad_to is not None else n
    parts = []
    for c0 in range(0, d, col_chunk):
        c1 = min(c0 + col_chunk, d)
        xc = np.ascontiguousarray(x_host[:, c0:c1], dtype=np.float32)
        if n_rows > n:
            xc = np.concatenate(
                [xc, np.zeros((n_rows - n, c1 - c0), dtype=np.float32)],
                axis=0)
        xc = (jax.device_put(xc, row_sharding) if row_sharding is not None
              else jax.device_put(xc))
        parts.append(np.asarray(jnp.matmul(xc.T, dh)))
    return jnp.asarray(np.concatenate(parts, axis=0))
