"""LDSC regression weights (host-side numpy).

Algorithmic mirror of reference kgwas/utils.py:397-434 — parity of the final
KGWAS p-values depends on this being numerically identical.
"""
from __future__ import annotations

import numpy as np


def ldsc_regression_weights(ld, w_ld, N, M, hsq, intercept=None):
    """Approximate reciprocal of the conditional variance function.

    ld, w_ld: [n_snp] LD scores; N: sample size (scalar or [n_snp]);
    M: number of SNPs used for LD-score estimation; hsq: heritability.
    """
    M = float(M)
    if intercept is None:
        intercept = 1
    hsq = max(hsq, 0.0)
    hsq = min(hsq, 1.0)
    ld = np.fmax(ld, 1.0)
    w_ld = np.fmax(w_ld, 1.0)
    c = hsq * N / M
    het_w = 1.0 / (2 * np.square(intercept + np.multiply(c, ld)))
    oc_w = 1.0 / w_ld
    return np.multiply(het_w, oc_w)
