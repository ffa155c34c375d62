"""Optimizer matching torch.optim.Adam semantics exactly.

The reference trains with ``optim.Adam(params, lr, weight_decay)``
(reference kgwas/kgwas.py:116). torch Adam *couples* weight decay into the
gradient BEFORE the moment updates (g <- g + wd * p) — unlike AdamW — and
decays every parameter including biases. The optax chain below reproduces
that bit-for-bit: add_decayed_weights -> scale_by_adam(eps outside sqrt,
bias-corrected like torch) -> -lr.
"""
from __future__ import annotations

import optax


def torch_adam(
    lr: float,
    weight_decay: float = 0.0,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
) -> optax.GradientTransformation:
    parts = []
    if weight_decay:
        parts.append(optax.add_decayed_weights(weight_decay))
    parts.append(optax.scale_by_adam(b1=b1, b2=b2, eps=eps))
    parts.append(optax.scale(-lr))
    return optax.chain(*parts)
